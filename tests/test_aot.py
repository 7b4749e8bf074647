"""AOT serving artifacts (vit_cpp_tpu/aot.py): export -> file -> serve
without gguf or re-trace; parity with the live engine."""

import numpy as np
import pytest

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.testing.synthetic import write_synthetic_model


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=7,
        patch_size=8,
        img_size=32,
    )
    p = tmp_path_factory.mktemp("aot") / "m.gguf"
    write_synthetic_model(str(p), hp, ftype=1, seed=11)
    return str(p)


def _pixels(n, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((n, 3, 32, 32)), jnp.float32)


def test_export_load_parity(model_path, tmp_path):
    from vit_cpp_tpu.aot import AotEngine, save_engine
    from vit_cpp_tpu.engine import VitEngine

    engine = VitEngine(model_path, mm_impl="int8", fold_ln=True, verbose=False)
    out = str(tmp_path / "m.vitx")
    meta = save_engine(engine, out, batch=4)
    assert meta["batch"] == 4 and meta["mm_impl"] == "int8"

    aot = AotEngine(out)
    assert aot.id2label == engine.id2label
    x = _pixels(4)
    want = np.asarray(engine.predict_probs_batch(x))
    got = np.asarray(aot.predict_probs_batch(x))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_wrong_batch_rejected(model_path, tmp_path):
    from vit_cpp_tpu.aot import AotEngine, save_engine
    from vit_cpp_tpu.engine import VitEngine

    out = str(tmp_path / "m.vitx")
    save_engine(VitEngine(model_path, verbose=False), out, batch=2)
    aot = AotEngine(out)
    with pytest.raises(ValueError, match="compiled for batch 2"):
        aot.predict_probs_batch(_pixels(3))


def test_multi_batch_artifact(model_path, tmp_path):
    """One artifact, several batch programs (vit-export -b 1,4): every
    exported size serves with exact parity, the single-image front end
    runs the SMALLEST (latency) program, and unexported sizes fail with
    the batch list."""
    from vit_cpp_tpu.aot import AotEngine, save_engine
    from vit_cpp_tpu.engine import VitEngine

    engine = VitEngine(model_path, verbose=False)
    out = str(tmp_path / "m.vitx")
    meta = save_engine(engine, out, batch=[4, 1])
    assert meta["batches"] == [1, 4] and meta["batch"] == 4

    aot = AotEngine(out)
    assert aot.batches == [1, 4] and aot.batch == 4
    for b in (1, 4):
        x = _pixels(b)
        np.testing.assert_allclose(
            np.asarray(aot.predict_probs_batch(x)),
            np.asarray(engine.predict_probs_batch(x)),
            atol=1e-5,
            rtol=1e-5,
        )
    with pytest.raises(ValueError, match="batches 1/4"):
        aot.predict_probs_batch(_pixels(2))

    # single-image path: identical result whether the artifact also
    # carries the big batch (it must pick b=1, not broadcast to 4)
    from PIL import Image

    rng = np.random.default_rng(0)
    img = tmp_path / "i.png"
    Image.fromarray(
        rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    ).save(img)
    got = aot.classify_file(str(img), topk=1, verbose=False)[0]
    b4only = str(tmp_path / "m4.vitx")
    save_engine(engine, b4only, batch=4)
    want = AotEngine(b4only).classify_file(str(img), topk=1, verbose=False)[0]
    assert got[0] == want[0]
    np.testing.assert_allclose(got[1], want[1], atol=1e-5)


@pytest.mark.slow
def test_static_scale_export(model_path, tmp_path, capsys):
    """vit-export --act static --calib-dir bakes calibrated activation
    scales into the artifact: meta records act=static, and the artifact
    matches the live statically-calibrated engine exactly."""
    from PIL import Image

    from vit_cpp_tpu.aot import AotEngine, read_meta
    from vit_cpp_tpu.cli.common import build_engine, calibrate_engine_from_paths
    from vit_cpp_tpu.cli.export_aot import main

    calib = tmp_path / "calib"
    calib.mkdir()
    rng = np.random.default_rng(2)
    for i in range(6):
        Image.fromarray(
            rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        ).save(calib / f"c{i}.png")

    out = str(tmp_path / "m.vitx")
    rc = main(
        [model_path, out, "-b", "4", "--attn", "xla", "--act", "static",
         "--calib-dir", str(calib)]
    )
    err = capsys.readouterr().err
    if rc != 0:  # the guardrail legitimately may reject synthetic weights
        assert "calibration rejected" in err
        pytest.skip("guardrail rejected static scales on synthetic weights")
    assert read_meta(out)["act"] == "static"

    live, _ = build_engine(model_path, attn="xla", act="static")
    assert calibrate_engine_from_paths(live, str(calib))
    x = _pixels(4)
    np.testing.assert_allclose(
        np.asarray(AotEngine(out).predict_probs_batch(x)),
        np.asarray(live.predict_probs_batch(x)),
        atol=1e-5,
        rtol=1e-5,
    )


def test_static_export_requires_calib(model_path, tmp_path, capsys):
    from vit_cpp_tpu.cli.export_aot import main

    rc = main([model_path, str(tmp_path / "m.vitx"), "--act", "static"])
    assert rc == 1
    assert "--calib-dir" in capsys.readouterr().err


def test_bad_magic_rejected(tmp_path):
    from vit_cpp_tpu.aot import AotEngine

    p = tmp_path / "junk.vitx"
    p.write_bytes(b"not an artifact")
    with pytest.raises(ValueError, match="bad magic"):
        AotEngine(str(p))


def test_truncated_artifact_clean_error(model_path, tmp_path):
    """Interrupted writes fail with the designed ValueError, not a raw
    struct/json traceback (is_vitx says True for these, so the serving
    CLIs route them to AotEngine)."""
    from vit_cpp_tpu.aot import MAGIC, AotEngine, read_meta, save_engine
    from vit_cpp_tpu.engine import VitEngine

    full = str(tmp_path / "m.vitx")
    save_engine(VitEngine(model_path, verbose=False), full, batch=2)
    with open(full, "rb") as f:
        data = f.read()

    cut_header = tmp_path / "h.vitx"
    cut_header.write_bytes(MAGIC + b"\x00")  # truncated inside json_len
    cut_meta = tmp_path / "meta.vitx"
    cut_meta.write_bytes(data[: len(MAGIC) + 4 + 10])  # truncated metadata
    for p in (cut_header, cut_meta):
        with pytest.raises(ValueError, match="VITX"):
            AotEngine(str(p))
        with pytest.raises(ValueError, match="VITX"):
            read_meta(str(p))


def test_serve_files_with_aot_engine(model_path, tmp_path):
    """The artifact drops into the file-serving pipeline."""
    from PIL import Image

    from vit_cpp_tpu.aot import AotEngine, save_engine
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.serve import serve_files

    engine = VitEngine(model_path, verbose=False)
    out = str(tmp_path / "m.vitx")
    save_engine(engine, out, batch=3)
    aot = AotEngine(out)

    rng = np.random.default_rng(1)
    paths = []
    for i in range(5):
        p = tmp_path / f"i{i}.png"
        Image.fromarray(
            rng.integers(0, 256, (30 + i, 40, 3), dtype=np.uint8)
        ).save(p)
        paths.append(str(p))
    results = list(serve_files(aot, paths, batch=aot.batch))
    assert [r.path for r in results] == paths
    for r in results:
        want = engine.classify_file(r.path, topk=1, verbose=False)[0]
        assert r.top1 == want[0]
        np.testing.assert_allclose(r.prob, want[1], atol=1e-5)


def test_serve_cli_accepts_vitx(model_path, tmp_path, capsys):
    """`vit-serve -m model.vitx`: artifact auto-detected by magic; the
    artifact's compiled batch size wins over -b; --mesh is rejected."""
    from PIL import Image

    from vit_cpp_tpu.aot import save_engine
    from vit_cpp_tpu.cli.serve import main
    from vit_cpp_tpu.engine import VitEngine

    engine = VitEngine(model_path, verbose=False)
    vitx = str(tmp_path / "m.vitx")
    save_engine(engine, vitx, batch=2)

    rng = np.random.default_rng(7)
    paths = []
    for i in range(3):
        p = tmp_path / f"i{i}.png"
        Image.fromarray(
            rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        ).save(p)
        paths.append(str(p))

    assert main(["-m", vitx, "-b", "64", *paths]) == 0
    out, err = capsys.readouterr()
    lines = [l for l in out.strip().splitlines() if l]
    assert len(lines) == 3
    assert "compiled for batch 2" in err and "AOT artifact" in err
    for line, p in zip(lines, paths):
        want = engine.classify_file(p, topk=1, verbose=False)[0]
        path, label, prob = line.split("\t")
        assert path == p and label == engine.id2label[want[0]]
        np.testing.assert_allclose(float(prob), want[1], atol=5e-3)

    assert main(["-m", vitx, "--mesh", "2x1", *paths]) == 1
    assert "not supported for .vitx" in capsys.readouterr().err


def test_vit_cli_accepts_vitx(model_path, tmp_path, capsys):
    """The reference-parity vit CLI serves a .vitx artifact: single image
    broadcast to the artifact batch, same top-k lines."""
    from PIL import Image

    from vit_cpp_tpu.aot import save_engine
    from vit_cpp_tpu.cli.vit import main
    from vit_cpp_tpu.engine import VitEngine

    engine = VitEngine(model_path, verbose=False)
    vitx = str(tmp_path / "m.vitx")
    save_engine(engine, vitx, batch=2)
    img = str(tmp_path / "x.png")
    Image.fromarray(
        np.random.default_rng(3).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    ).save(img)

    assert main(["vit", "-m", vitx, "-i", img, "-k", "2"]) == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith(" > ")]
    assert len(lines) == 2
    # top-1 label parity with the live engine (canvas preprocess on both
    # sides: compare against the AotEngine's own classify)
    from vit_cpp_tpu.aot import AotEngine

    want = AotEngine(vitx).classify_file(img, topk=1, verbose=False)[0]
    assert lines[0] == f" > {want[2]} : {want[1]:.2f}"


def test_vitstr_artifact_recognize(tmp_path):
    """ViTSTR checkpoints export too: the artifact drives recognize_files
    and matches the live engine's decoded text."""
    from vit_cpp_tpu.aot import AotEngine, save_engine
    from vit_cpp_tpu.engine import VitstrEngine
    from vit_cpp_tpu.models.vitstr import vitstr_id2label
    from vit_cpp_tpu.serve import recognize_files

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=96,
        patch_size=16,
        img_size=96,
        in_chans=1,
        seq_len=25,
    )
    gguf = str(tmp_path / "s.gguf")
    write_synthetic_model(gguf, hp, ftype=1, seed=5, id2label=vitstr_id2label())
    engine = VitstrEngine(gguf, verbose=False)
    vitx = str(tmp_path / "s.vitx")
    save_engine(engine, vitx, batch=2)
    aot = AotEngine(vitx)
    assert aot.hp.seq_len == engine.hp.seq_len is not None

    from PIL import Image

    rng = np.random.default_rng(2)
    paths = []
    for i in range(3):
        p = tmp_path / f"w{i}.png"
        Image.fromarray(
            rng.integers(0, 256, (24, 64, 3), dtype=np.uint8)
        ).save(p)
        paths.append(str(p))
    got = list(recognize_files(aot, paths, batch=aot.batch))
    want = list(recognize_files(engine, paths, batch=aot.batch))
    assert [(r.path, r.text) for r in got] == [(r.path, r.text) for r in want]
    np.testing.assert_allclose(
        [r.confidence for r in got], [r.confidence for r in want], atol=1e-5
    )

    # the vitstr CLI serves the artifact too
    from vit_cpp_tpu.cli.vitstr import main

    assert main(["vitstr", "-m", vitx, "-i", paths[0]]) == 0


def test_http_daemon_serves_artifact(model_path, tmp_path):
    """The micro-batched HTTP daemon runs on an AotEngine (server.py
    routes by hp, pads to the artifact's fixed batch)."""
    import io
    import json
    import threading
    import urllib.request

    from PIL import Image

    from vit_cpp_tpu.aot import AotEngine, save_engine
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.server import create_server

    engine = VitEngine(model_path, verbose=False)
    vitx = str(tmp_path / "m.vitx")
    save_engine(engine, vitx, batch=4)
    aot = AotEngine(vitx)
    httpd, batcher = create_server(aot, port=0, batch=aot.batch, max_wait_ms=5.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{httpd.server_port}/v1/classify?topk=3",
            data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200
            top = json.loads(r.read())["topk"]
        assert len(top) == 3
        # parity with the live engine through the same canvas preprocess
        from vit_cpp_tpu.ops.preprocess import preprocess_batch

        pixels = preprocess_batch([img], engine.hp.img_size)[0]
        import jax.numpy as jnp

        want = np.asarray(
            engine.predict_probs_batch(jnp.stack([pixels] * 4))
        )[0]
        assert top[0]["id"] == int(want.argmax())
        np.testing.assert_allclose(top[0]["prob"], want.max(), atol=1e-5)
    finally:
        httpd.shutdown()
        httpd.server_close()
        batcher.close()


def test_platform_mismatch_rejected_at_load(model_path, tmp_path):
    """An artifact lowered only for another platform fails at load with a
    clear message (not per-request deep inside jax.export)."""
    import json as _json
    import struct

    from vit_cpp_tpu.aot import MAGIC, AotEngine, save_engine
    from vit_cpp_tpu.engine import VitEngine

    out = str(tmp_path / "m.vitx")
    save_engine(VitEngine(model_path, verbose=False), out, batch=2)
    # rewrite the recorded platforms to something this process is not
    with open(out, "rb") as f:
        data = f.read()
    (n,) = struct.unpack_from("<I", data, len(MAGIC))
    off = len(MAGIC) + 4
    meta = _json.loads(data[off : off + n])
    meta["platforms"] = ["rocm"]
    mj = _json.dumps(meta).encode()
    with open(out, "wb") as f:
        f.write(MAGIC + struct.pack("<I", len(mj)) + mj + data[off + n :])
    with pytest.raises(ValueError, match="exported for platforms"):
        AotEngine(out)


def test_cross_platform_export(model_path, tmp_path):
    """--platforms cross-lowers: a cpu+tpu artifact loads and runs on the
    cpu backend (the tpu half is exercised on real hardware in
    tools/ — xla knobs, Pallas can't cross-lower)."""
    from vit_cpp_tpu.aot import AotEngine, save_engine
    from vit_cpp_tpu.engine import VitEngine

    engine = VitEngine(model_path, verbose=False, attn_impl="xla", mm_impl="xla")
    out = str(tmp_path / "m.vitx")
    meta = save_engine(engine, out, batch=2, platforms=["cpu", "tpu"])
    assert sorted(meta["platforms"]) == ["cpu", "tpu"]
    aot = AotEngine(out)
    x = _pixels(2)
    np.testing.assert_allclose(
        np.asarray(aot.predict_probs_batch(x)),
        np.asarray(engine.predict_probs_batch(x)),
        atol=1e-5,
        rtol=1e-5,
    )


def test_cli_export_and_info(model_path, tmp_path, capsys):
    from vit_cpp_tpu.cli.export_aot import main

    out = str(tmp_path / "m.vitx")
    assert main([model_path, out, "-b", "2", "--dtype", "f32", "--mm", "xla",
                 "--attn", "xla"]) == 0
    assert main(["--info", out]) == 0
    import json

    meta = json.loads(capsys.readouterr().out)
    assert meta["batch"] == 2 and meta["hparams"]["hidden_size"] == 64


def test_meta_hparams_compat(model_path, tmp_path):
    """Artifact meta stays readable across hparams evolution: standard
    geometries omit optional overrides (pre-override VitHParams(**d)
    readers keep working) and the reader drops unknown keys from newer
    writers instead of raising TypeError."""
    import json
    import struct

    from vit_cpp_tpu.aot import MAGIC, AotEngine, read_meta, save_engine
    from vit_cpp_tpu.engine import VitEngine

    out = str(tmp_path / "m.vitx")
    save_engine(VitEngine(model_path, verbose=False), out, batch=2)
    meta = read_meta(out)
    assert "mlp_hidden" not in meta["hparams"]  # 4x family: omitted

    # simulate a FUTURE writer adding an unknown optional hparam field
    with open(out, "rb") as f:
        data = f.read()
    (mlen,) = struct.unpack("<I", data[len(MAGIC) : len(MAGIC) + 4])
    start = len(MAGIC) + 4
    meta2 = json.loads(data[start : start + mlen])
    meta2["hparams"]["field_from_the_future"] = 7
    mj = json.dumps(meta2).encode()
    patched = tmp_path / "future.vitx"
    patched.write_bytes(
        MAGIC + struct.pack("<I", len(mj)) + mj + data[start + mlen :]
    )
    aot = AotEngine(str(patched))  # must not TypeError
    assert aot.hp.hidden_size == meta["hparams"]["hidden_size"]
