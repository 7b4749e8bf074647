"""HTTP serving daemon (vit_cpp_tpu/server.py).

End-to-end over a real socket on the CPU backend: classification parity
with the engine, micro-batch coalescing, error paths, and the ViTSTR
recognize route.
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


def _png_bytes(seed: int, size=(40, 30)) -> bytes:
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (size[1], size[0], 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def vit_server(tmp_path_factory):
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.server import create_server

    root = tmp_path_factory.mktemp("server")
    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=5,
        patch_size=8,
        img_size=32,
    )
    model = str(root / "m.gguf")
    write_synthetic_model(model, hp, ftype=1, seed=3)
    engine = VitEngine(model, verbose=False)
    httpd, batcher = create_server(engine, port=0, batch=4, max_wait_ms=20.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_port}"
    yield engine, base, batcher
    httpd.shutdown()
    httpd.server_close()
    batcher.close()


def _post(url: str, data: bytes):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


class TestVitServer:
    def test_healthz(self, vit_server):
        _, base, _ = vit_server
        code, body = _get(f"{base}/healthz")
        assert code == 200 and body["ok"] and body["model"] == "vit"

    def test_classify_matches_engine(self, vit_server):
        engine, base, _ = vit_server
        png = _png_bytes(0)
        code, body = _post(f"{base}/v1/classify?topk=3", png)
        assert code == 200 and len(body["topk"]) == 3
        # parity with the engine's own path on the same pixels
        img = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
        probs = np.asarray(
            engine.predict_probs_batch(engine.preprocess_image(img)[None])
        )[0]
        want = int(np.argsort(-probs, kind="stable")[0])
        assert body["topk"][0]["id"] == want
        np.testing.assert_allclose(
            body["topk"][0]["prob"], probs[want], atol=1e-5
        )

    def test_concurrent_requests_coalesce(self, vit_server):
        engine, base, batcher = vit_server
        n0_req, n0_batch = batcher.n_requests, batcher.n_batches
        pngs = [_png_bytes(i) for i in range(8)]
        results = [None] * 8

        def hit(i):
            results[i] = _post(f"{base}/v1/classify?topk=1", pngs[i])

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(code == 200 for code, _ in results)
        # every image classified independently and correctly
        for i, (_, body) in enumerate(results):
            img = np.asarray(Image.open(io.BytesIO(pngs[i])).convert("RGB"))
            probs = np.asarray(
                engine.predict_probs_batch(engine.preprocess_image(img)[None])
            )[0]
            assert body["topk"][0]["id"] == int(np.argmax(probs))
        # 8 requests went through in fewer than 8 device batches
        assert batcher.n_requests - n0_req == 8
        assert batcher.n_batches - n0_batch < 8

    def test_embed_route_matches_engine_features(self, vit_server):
        """POST /v1/embed returns the final-LN pooled feature vector —
        identical to the engine's own features_batch on the same pixels."""
        engine, base, _ = vit_server
        png = _png_bytes(4)
        code, body = _post(f"{base}/v1/embed", png)
        assert code == 200
        assert body["shape"] == [engine.hp.hidden_size]
        img = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
        want = np.asarray(
            engine.features_batch(engine.preprocess_image(img)[None])
        )[0]
        np.testing.assert_allclose(
            np.asarray(body["embedding"], np.float32), want, atol=1e-5
        )

    def test_embed_file_matches_features_batch(self, vit_server, tmp_path):
        """VitEngine.embed_file = decode + preprocess + features."""
        engine, _, _ = vit_server
        png = _png_bytes(5)
        p = tmp_path / "img.png"
        p.write_bytes(png)
        feat = engine.embed_file(str(p))
        assert feat.shape == (engine.hp.hidden_size,)
        img = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
        want = np.asarray(
            engine.features_batch(engine.preprocess_image(img)[None])
        )[0]
        np.testing.assert_allclose(feat, want, atol=1e-6)

    def test_bad_image_400(self, vit_server):
        _, base, _ = vit_server
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{base}/v1/classify", b"not an image")
        assert e.value.code == 400

    def test_unknown_route_404(self, vit_server):
        _, base, _ = vit_server
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(f"{base}/nope")
        assert e.value.code == 404

    def test_stats(self, vit_server):
        _, base, _ = vit_server
        code, body = _get(f"{base}/stats")
        assert code == 200 and body["requests"] >= 1
        assert body["predict_seconds"] > 0 and "padded_rows" in body

    def test_metrics_prometheus_format(self, vit_server):
        import urllib.request

        _, base, _ = vit_server
        with urllib.request.urlopen(f"{base}/metrics", timeout=30) as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert "# TYPE vit_requests_total counter" in text
        assert "# TYPE vit_queue_depth gauge" in text
        line = next(
            ln for ln in text.splitlines()
            if ln.startswith('vit_requests_total{model="default",route="classify"}')
        )
        assert float(line.rsplit(" ", 1)[1]) >= 1
        assert 'vit_predict_seconds_total{model="default",route="classify"}' in text


def test_embed_route_on_sharded_engine(tmp_path):
    """/v1/embed on a mesh-sharded daemon: the B=1 request must be
    broadcast to the data axis (batch 1 does not divide dp) and match the
    unsharded embedding."""
    import jax

    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.parallel.mesh import make_mesh
    from vit_cpp_tpu.server import create_server

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=5,
        patch_size=8,
        img_size=32,
    )
    model = str(tmp_path / "m.gguf")
    write_synthetic_model(model, hp, ftype=1, seed=6)
    plain = VitEngine(model, verbose=False)
    engine = VitEngine(model, verbose=False).shard(make_mesh(dp=4, tp=2))
    httpd, batcher = create_server(engine, port=0, batch=4, max_wait_ms=5.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        png = _png_bytes(7)
        code, body = _post(
            f"http://127.0.0.1:{httpd.server_port}/v1/embed", png
        )
        assert code == 200 and body["shape"] == [64]
        img = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
        want = np.asarray(
            plain.features_batch(plain.preprocess_image(img)[None])
        )[0]
        np.testing.assert_allclose(
            np.asarray(body["embedding"], np.float32), want, atol=1e-5
        )
    finally:
        httpd.shutdown()
        httpd.server_close()
        batcher.close()


def test_microbatcher_overload_rejects_fast():
    """max_queue bounds the backlog: with the device worker blocked,
    submits beyond the bound fail immediately with OverloadedError (the
    handler's 503) instead of waiting out the request timeout; queued
    work still completes once the device frees up."""
    import threading

    from vit_cpp_tpu.server import MicroBatcher, OverloadedError

    gate = threading.Event()
    entered = threading.Event()

    def slow_predict(x):
        entered.set()
        gate.wait(10.0)
        return np.zeros((1, 3), np.float32)

    b = MicroBatcher(slow_predict, batch=1, max_wait_ms=0.0, max_queue=2)
    px = np.zeros((3, 8, 8), np.float32)
    first = b.submit(px)  # the worker picks this up and blocks in predict
    assert entered.wait(5.0)
    queued = [b.submit(px), b.submit(px)]  # fills the backlog bound
    rejected = b.submit(px)  # 3rd queued submit exceeds max_queue=2
    with pytest.raises(OverloadedError, match="overloaded"):
        rejected.result(timeout=1.0)
    gate.set()
    for f in [first, *queued]:
        assert f.result(timeout=10.0).shape == (3,)
    b.close()


def test_microbatcher_buckets_pad_to_next_power_of_two():
    """buckets=True: a lone request runs the batch-1 program, a burst of
    3 runs batch-4, a full batch runs the full program — each waiter gets
    its own (correct) row."""
    import threading

    from vit_cpp_tpu.server import MicroBatcher

    shapes = []
    lock = threading.Lock()
    gate = threading.Event()
    gate.set()

    def predict(x):
        gate.wait(10.0)
        with lock:
            shapes.append(x.shape[0])
        return np.asarray(x)[:, :, 0, 0]  # row-identifying reduction

    # max_wait 0: each flush takes exactly what is already queued, so the
    # gate choreography below is deterministic
    b = MicroBatcher(predict, batch=8, max_wait_ms=0.0, buckets=True)
    assert b.bucket_sizes() == [1, 2, 4, 8]
    px = [np.full((3, 4, 4), i, np.float32) for i in range(8)]
    assert b.submit(px[0]).result(timeout=10.0)[0] == 0.0
    assert shapes == [1]
    # hold the worker inside a sacrificial flush while all 3 land in the
    # queue, so they deterministically coalesce into one bucket-4 flush
    gate.clear()
    sacrificial = b.submit(px[7])
    futs = [b.submit(p) for p in px[:3]]
    gate.set()
    assert sacrificial.result(timeout=10.0)[0] == 7.0
    out = [f.result(timeout=10.0) for f in futs]
    assert shapes[-1] == 4 and [o[0] for o in out] == [0.0, 1.0, 2.0]
    b.close()
    # non-power-of-2 batch keeps the true batch as the last bucket
    b12 = MicroBatcher(predict, batch=12, max_wait_ms=0.0, buckets=True)
    assert b12.bucket_sizes() == [1, 2, 4, 8, 12]
    b12.close()
    # explicit size lists (multi-batch .vitx) are validated
    blist = MicroBatcher(predict, batch=8, max_wait_ms=0.0, buckets=[1, 8])
    assert blist.bucket_sizes() == [1, 8]
    blist.close()
    with pytest.raises(ValueError, match="end at batch"):
        MicroBatcher(predict, batch=8, buckets=[1, 4])


def test_bucketed_daemon_serves_and_warms_all_buckets(tmp_path):
    """End-to-end: create_server(buckets=True) warms every bucket program
    before binding, /healthz reports the bucket set, and a single request
    is served by the smallest bucket."""
    import urllib.request

    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.server import create_server

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=5,
        patch_size=8,
        img_size=32,
    )
    path = str(tmp_path / "m.gguf")
    write_synthetic_model(path, hp, ftype=1, seed=3)
    engine = VitEngine(path, verbose=False)
    seen = []
    real = engine.predict_probs_batch
    engine.predict_probs_batch = lambda x: (seen.append(x.shape[0]), real(x))[1]
    httpd, batcher = create_server(
        engine, port=0, batch=4, max_wait_ms=1.0, buckets=True
    )
    assert sorted(set(seen)) == [1, 2, 4]  # every bucket warmed
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["buckets"] == [1, 2, 4]
        img = _png_bytes(0)
        req = urllib.request.Request(
            f"{base}/v1/classify?topk=1", data=img, method="POST"
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200
        assert seen[-1] == 1  # lone request rode the batch-1 bucket
    finally:
        httpd.shutdown()
        httpd.server_close()
        batcher.close()


def test_bucketed_sharded_engine_constrains_to_data_axis(tmp_path):
    """buckets=True on a mesh-sharded engine must not emit bucket sizes
    the data axis cannot split (review r3): dp=4, batch 8 -> [4, 8], and
    warmup + a lone request run without sharding errors."""
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.parallel.mesh import make_mesh
    from vit_cpp_tpu.server import create_server

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=16,
        patch_size=8,
        img_size=32,
    )
    path = str(tmp_path / "m.gguf")
    write_synthetic_model(path, hp, ftype=1, seed=4)
    engine = VitEngine(path, verbose=False).shard(make_mesh(dp=4, tp=2))
    httpd, batcher = create_server(engine, port=0, batch=8, buckets=True)
    try:
        assert batcher.bucket_sizes() == [4, 8]
        fut = batcher.submit(np.zeros((3, 32, 32), np.float32))
        assert fut.result(timeout=60.0).shape == (16,)
    finally:
        httpd.server_close()
        batcher.close()
    # dp with no power-of-2 multiple below batch -> unbucketed, no crash
    engine3 = VitEngine(path, verbose=False).shard(make_mesh(dp=8, tp=1))
    httpd3, b3 = create_server(engine3, port=0, batch=8, buckets=True)
    try:
        assert b3.bucket_sizes() == [8]
    finally:
        httpd3.server_close()
        b3.close()
    # explicit non-divisible bucket lists are rejected, not crashed later
    with pytest.raises(ValueError, match="data axis"):
        create_server(engine3, port=0, batch=8, buckets=[1, 8])


def test_prometheus_label_escaping():
    from vit_cpp_tpu.server import MicroBatcher, _Model, _prometheus_metrics

    class _Eng:
        class hp:
            seq_len = None
            hidden_size = 4
            img_size = 8

    b = MicroBatcher(lambda x: np.zeros((1, 4)), batch=1, max_wait_ms=0.0)
    try:
        m = _Model('evil"name\\x', _Eng(), b)
        text = _prometheus_metrics([m])
    finally:
        b.close()
    assert 'model="evil\\"name\\\\x"' in text


def test_vitstr_recognize_route(tmp_path):
    from vit_cpp_tpu.engine import VitstrEngine
    from vit_cpp_tpu.models.vitstr import vitstr_id2label
    from vit_cpp_tpu.server import create_server

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=96,
        patch_size=8,
        img_size=32,
        in_chans=1,
        seq_len=5,
    )
    model = str(tmp_path / "s.gguf")
    write_synthetic_model(model, hp, ftype=1, seed=4, id2label=vitstr_id2label())
    engine = VitstrEngine(model, verbose=False)
    httpd, batcher = create_server(engine, port=0, batch=2, max_wait_ms=5.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_port}"
    try:
        png = _png_bytes(7)
        code, body = _post(f"{base}/v1/recognize", png)
        assert code == 200 and isinstance(body["text"], str)
        img = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
        from vit_cpp_tpu.models.vitstr import greedy_decode

        probs = np.asarray(
            engine.predict_probs_batch(engine.preprocess_image(img)[None])
        )[0]
        want_text, want_conf = greedy_decode(probs, engine.id2label)
        assert body["text"] == want_text
        np.testing.assert_allclose(body["confidence"], want_conf, atol=1e-5)
        # classify route is rejected on a vitstr model
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{base}/v1/classify", png)
        assert e.value.code == 404
    finally:
        httpd.shutdown()
        httpd.server_close()
        batcher.close()


def test_multi_model_daemon(tmp_path):
    """One daemon serving a classifier AND a ViTSTR model: per-model
    routes, healthz/stats per model, wrong route 404s with the route list."""
    import urllib.request

    from vit_cpp_tpu.engine import VitEngine, VitstrEngine
    from vit_cpp_tpu.models.vitstr import vitstr_id2label
    from vit_cpp_tpu.server import create_multi_server

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
    cls_path = str(tmp_path / "c.gguf")
    str_path = str(tmp_path / "s.gguf")
    write_synthetic_model(cls_path, cls_hp, ftype=1, seed=1)
    write_synthetic_model(
        str_path, str_hp, ftype=1, seed=2, id2label=vitstr_id2label()
    )
    engines = {
        "cls": VitEngine(cls_path, verbose=False),
        "ocr": VitstrEngine(str_path, verbose=False),
    }
    httpd, batchers = create_multi_server(
        engines, port=0, batch={"cls": 3, "ocr": 2}, max_wait_ms=5.0
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and set(health["models"]) == {"cls", "ocr"}
        assert health["models"]["cls"]["model"] == "vit"
        assert health["models"]["ocr"]["model"] == "vitstr"
        assert health["models"]["cls"]["batch"] == 3

        png = _png_bytes(11)
        code, body = _post(f"{base}/v1/cls/classify?topk=2", png)
        assert code == 200 and len(body["topk"]) == 2
        code, body = _post(f"{base}/v1/ocr/recognize", png)
        assert code == 200 and isinstance(body["text"], str)

        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{base}/v1/classify", png)
        assert e.value.code == 404
        assert "/v1/cls/classify" in json.loads(e.value.read())["error"]

        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["cls"]["requests"] == 1 and stats["ocr"]["requests"] == 1
    finally:
        httpd.shutdown()
        httpd.server_close()
        for b in batchers.values():
            b.close()


def test_multi_model_img_size_skips_vitx(tmp_path, capsys, monkeypatch):
    """--img-size on a mixed gguf/.vitx multi-model daemon applies to the
    gguf and is skipped (with a notice) for the baked artifact instead of
    aborting the whole server (review r3)."""
    import vit_cpp_tpu.cli.server as srv_cli
    from vit_cpp_tpu.cli.common import build_engine
    from vit_cpp_tpu.aot import save_engine

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=5,
        patch_size=8,
        img_size=32,
    )
    model = str(tmp_path / "m.gguf")
    write_synthetic_model(model, hp, ftype=1, seed=1)
    vitx = str(tmp_path / "m.vitx")
    eng, _ = build_engine(model, dtype="f32", mm="xla", attn="xla")
    save_engine(eng, vitx, batch=[2])

    captured = {}

    class _FakeHttpd:
        server_port = 0

        def serve_forever(self):
            raise KeyboardInterrupt  # exit main's serve loop immediately

        def server_close(self):
            pass

    def _fake_create(engines, **kw):
        captured["engines"] = engines
        return _FakeHttpd(), {}

    import vit_cpp_tpu.server as srv_mod

    monkeypatch.setattr(srv_mod, "create_multi_server", _fake_create)
    rc = srv_cli.main(
        [
            "-m", f"g={model}", "-m", f"a={vitx}",
            "--img-size", "48", "--dtype", "f32", "--mm", "xla",
            "--attn", "xla", "--no-warmup",
        ]
    )
    assert rc == 0
    err = capsys.readouterr().err
    assert "ignoring --img-size" in err
    assert captured["engines"]["g"].hp.img_size == 48  # gguf got the override
    assert captured["engines"]["a"].hp.img_size == 32  # artifact untouched


def test_multi_model_cli_parses_specs(tmp_path, capsys):
    """CLI spec errors: bare path in multi mode, duplicate names."""
    from vit_cpp_tpu.cli.server import main

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=5,
        patch_size=8,
        img_size=32,
    )
    model = str(tmp_path / "m.gguf")
    write_synthetic_model(model, hp, ftype=1, seed=1)
    assert main(["-m", model, "-m", model]) == 1
    assert "name=path" in capsys.readouterr().err
    assert main(["-m", f"a={model}", "-m", f"a={model}"]) == 1
    assert "duplicate" in capsys.readouterr().err

    # an '=' inside a plain path must NOT hijack single-model mode
    from vit_cpp_tpu.cli.common import model_spec

    assert model_spec("/data/run=3/model.gguf") is None
    assert model_spec("./cls=weird.gguf") is None  # escape hatch
    assert model_spec(f"cls={model}") == ("cls", model)


def test_device_failure_returns_500():
    """A raising predict resolves waiters with the exception and the
    handler returns JSON 500 instead of dropping the socket."""
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.server import create_server
    import tempfile, os

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=5,
        patch_size=8,
        img_size=32,
    )
    with tempfile.TemporaryDirectory() as d:
        model = os.path.join(d, "m.gguf")
        write_synthetic_model(model, hp, ftype=1, seed=5)
        engine = VitEngine(model, verbose=False)
        httpd, batcher = create_server(engine, port=0, batch=2, max_wait_ms=2.0)
        # break the device path AFTER warmup
        batcher._predict = lambda x: (_ for _ in ()).throw(RuntimeError("chip gone"))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{httpd.server_port}"
        try:
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(f"{base}/v1/classify", _png_bytes(1))
            assert e.value.code == 500
            assert "chip gone" in json.loads(e.value.read())["error"]
        finally:
            httpd.shutdown()
            httpd.server_close()
            batcher.close()


class TestServerHardening:
    def test_bad_topk_query_400(self, vit_server):
        _, base, _ = vit_server
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{base}/v1/classify?topk=abc", _png_bytes(2))
        assert e.value.code == 400

    def test_oversized_body_413(self, vit_server):
        _, base, _ = vit_server
        req = urllib.request.Request(
            f"{base}/v1/classify", data=b"x", method="POST",
            headers={"Content-Length": str(64 * 1024 * 1024)},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 413

    def test_varied_image_sizes_one_program_per_bucket(self, vit_server):
        """Different source (H, W) must NOT each compile a new preprocess
        program — the daemon uses the canvas-bucketed path."""
        engine, base, _ = vit_server
        for seed, size in enumerate([(40, 30), (55, 70), (100, 90), (130, 40)]):
            code, body = _post(
                f"{base}/v1/classify?topk=1", _png_bytes(seed, size=size)
            )
            assert code == 200 and len(body["topk"]) == 1


def test_submit_after_close_fails_fast():
    """ADVICE r2: a submit() racing close() must resolve immediately with
    an error, not hang until the handler's request timeout."""
    from vit_cpp_tpu.server import MicroBatcher

    mb = MicroBatcher(lambda x: np.zeros((8, 4)), batch=8, max_wait_ms=1.0)
    mb.close()
    fut = mb.submit(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(RuntimeError, match="shutting down"):
        fut.result(timeout=1.0)


def test_handler_drain_preserves_shutdown_sentinel():
    """Review r3: a handler-side drain (submit racing close) must NOT
    consume the worker's shutdown sentinel — dropping it left the worker
    blocked in _q.get() forever and close() hanging its full join
    timeout. The preserving drain re-enqueues it."""
    import queue as _queue
    from concurrent.futures import Future

    from vit_cpp_tpu.server import MicroBatcher

    mb = MicroBatcher.__new__(MicroBatcher)  # no worker thread: direct test
    mb._q = _queue.SimpleQueue()
    mb._closed = True
    fut = Future()
    mb._q.put(mb._SENTINEL)  # close() enqueued shutdown first
    mb._q.put((None, fut))  # then the racing handler's item
    mb._drain_failed(preserve_sentinel=True)
    # the sentinel survives for the worker (re-enqueued behind the item);
    # the future is not resolved here — the worker or close()'s
    # post-join drain owns it
    items = [mb._q.get_nowait(), mb._q.get_nowait()]
    assert mb._SENTINEL in items
    assert not fut.done()
    for it in items:
        mb._q.put(it)
    # the non-preserving drain (close()'s post-join path) consumes both
    mb._drain_failed()
    with pytest.raises(_queue.Empty):
        mb._q.get_nowait()
    with pytest.raises(RuntimeError, match="shutting down"):
        fut.result(timeout=0)


def test_embed_rides_its_own_batcher(tmp_path):
    """/v1/embed goes through a MicroBatcher (not direct handler-thread
    dispatch): it shares the admission/timeout machinery, shows up under
    /stats "embed", and its batcher closes in cascade with the main one."""
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.server import create_server

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=5,
        patch_size=8,
        img_size=32,
    )
    model = str(tmp_path / "m.gguf")
    write_synthetic_model(model, hp, ftype=1, seed=0)
    engine = VitEngine(model, verbose=False)
    httpd, batcher = create_server(
        engine, port=0, batch=2, max_wait_ms=2.0, max_queue=4
    )
    assert batcher.child is not None  # embed batcher exists, unwarmed
    assert batcher.child.n_batches == 0
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        code, body = _post(f"{base}/v1/embed", _png_bytes(9))
        assert code == 200 and body["shape"] == [hp.hidden_size]
        code, stats = _get(f"{base}/stats")
        assert stats["embed"]["requests"] == 1
        assert stats["embed"]["batches"] >= 1
        assert stats["requests"] == 0  # classify batcher untouched
    finally:
        httpd.shutdown()
        httpd.server_close()
        batcher.close()
    # cascade close: the embed batcher rejects new work immediately
    fut = batcher.child.submit(np.zeros((3, 32, 32), np.float32))
    with pytest.raises(RuntimeError, match="shutting down"):
        fut.result(timeout=1.0)
