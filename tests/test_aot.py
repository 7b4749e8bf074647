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


def test_bad_magic_rejected(tmp_path):
    from vit_cpp_tpu.aot import AotEngine

    p = tmp_path / "junk.vitx"
    p.write_bytes(b"not an artifact")
    with pytest.raises(ValueError, match="bad magic"):
        AotEngine(str(p))


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


def test_cli_export_and_info(model_path, tmp_path, capsys):
    from vit_cpp_tpu.cli.export_aot import main

    out = str(tmp_path / "m.vitx")
    assert main([model_path, out, "-b", "2", "--dtype", "f32", "--mm", "xla",
                 "--attn", "xla"]) == 0
    assert main(["--info", out]) == 0
    import json

    meta = json.loads(capsys.readouterr().out)
    assert meta["batch"] == 2 and meta["hparams"]["hidden_size"] == 64
