"""SigLIP vision towers: HF converter remap + attention-pooling (MAP)
head. The parity authority is transformers itself — SiglipVisionModel
with random weights runs offline, so the remap, the forward and the
numpy oracle are all pinned to the real implementation (not to each
other)."""

import dataclasses

import numpy as np
import pytest

pytest.importorskip("transformers")

from vit_cpp_tpu.cli.convert import infer_hparams, remap_hf_siglip
from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import params_from_state_dict
from vit_cpp_tpu.models.vit import forward
from vit_cpp_tpu.testing.ref_numpy import forward_numpy
from vit_cpp_tpu.testing.synthetic import random_state_dict, write_synthetic_model

HP_MAP = VitHParams(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_classes=0,
    patch_size=8,
    img_size=32,
    num_prefix_tokens=0,
    global_pool="map",
    pixel_norm="unit",
)


def _hf_model(seed=0):
    import torch
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(seed)
    cfg = SiglipVisionConfig(
        hidden_size=64,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
    )
    return SiglipVisionModel(cfg).eval()


def _images(n=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 3, 32, 32)).astype(np.float32)


def test_remap_and_forward_match_transformers():
    """The end-to-end authority test: HF state dict -> remap -> our
    forward == SiglipVisionModel's pooler_output (f32 noise only); the
    f64 numpy oracle agrees too."""
    import torch

    m = _hf_model()
    state = {k: v.numpy() for k, v in m.state_dict().items()}
    ours = remap_hf_siglip(state)
    hp = infer_hparams(ours, heads=4)
    assert hp.global_pool == "map" and hp.num_classes == 0
    assert hp.pixel_norm == "unit" and hp.num_prefix_tokens == 0
    x = _images()
    with torch.no_grad():
        want = m(pixel_values=torch.from_numpy(x)).pooler_output.numpy()
    params = params_from_state_dict(ours, hp)
    got = np.asarray(forward(params, x, hp, features=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        forward_numpy(ours, hp, x), want, atol=2e-5, rtol=1e-4
    )
    assert remap_hf_siglip({"not": np.zeros(1)}) is None


def test_convert_cli_roundtrip(tmp_path):
    """torch.save(HF SiglipVisionModel) -> vit-convert (auto-detected) ->
    gguf -> engine serves embeddings matching transformers."""
    import torch

    from vit_cpp_tpu.cli.convert import convert
    from vit_cpp_tpu.engine import VitEngine

    m = _hf_model(seed=1)
    ckpt = tmp_path / "siglip.pth"
    torch.save(m.state_dict(), ckpt)
    out = convert(
        checkpoint=str(ckpt), output_dir=str(tmp_path), ftype=0,
        heads=4, verbose=False,
    )
    eng = VitEngine(out, verbose=False)
    assert eng.hp.global_pool == "map" and eng.hp.pixel_norm == "unit"
    x = _images(seed=2)
    with torch.no_grad():
        want = m(pixel_values=torch.from_numpy(x)).pooler_output.numpy()
    got = np.asarray(eng.features_batch(x))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    # classify without a head raises the headless error
    with pytest.raises(ValueError, match="headless encoder"):
        eng.predict_probs_batch(x)


def test_unit_pixel_norm_in_preprocess(tmp_path):
    """MAP models preprocess to [-1, 1] (SigLIP's processor), not
    ImageNet mean/std: a constant-v image maps to (v/255 - 0.5)/0.5."""
    from vit_cpp_tpu.engine import VitEngine

    p = tmp_path / "map.gguf"
    write_synthetic_model(str(p), HP_MAP, ftype=0, seed=3)
    eng = VitEngine(str(p), verbose=False)
    img = np.full((32, 32, 3), 200, dtype=np.uint8)
    pix = np.asarray(eng.preprocess_image(img))
    np.testing.assert_allclose(pix, (200 / 255 - 0.5) / 0.5, atol=1e-6)


@pytest.mark.slow
def test_synthetic_file_roundtrip_and_stack(tmp_path):
    """Synthetic MAP checkpoints run the whole production stack: detect,
    W8A8 + attn_pool quantized leaves, export round trip, mesh sharding,
    fine-tune head attach."""
    import jax.numpy as jnp

    from vit_cpp_tpu.engine import VitEngine, detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.export import save_params
    from vit_cpp_tpu.models.params import load_params
    from vit_cpp_tpu.parallel.mesh import make_mesh

    p = tmp_path / "map.gguf"
    state = write_synthetic_model(str(p), HP_MAP, ftype=1, seed=4)
    mf = read_model(str(p))
    assert len(mf.tensors) == HP_MAP.expected_tensor_count()
    hp = detect_hparams(mf)
    assert hp.global_pool == "map"
    params = load_params(mf, hparams=hp)
    x = _images(n=8, seed=5)
    want = forward_numpy(state, HP_MAP, x)
    got = np.asarray(forward(params, x, hp, features=True))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)
    # W8A8 + fold (final norm stays unfolded for map)
    ref = np.asarray(VitEngine(str(p), verbose=False).features_batch(x))
    w8 = VitEngine(str(p), mm_impl="int8", fold_ln=True, verbose=False)
    f8 = np.asarray(w8.features_batch(x))
    cos = (f8 * ref).sum() / (np.linalg.norm(f8) * np.linalg.norm(ref))
    assert cos > 0.99
    # quantize CLI: attn_pool kernels quantize like block kernels
    from vit_cpp_tpu.cli.quantize import main as quantize_main

    q8 = tmp_path / "map-q8.gguf"
    assert quantize_main([str(p), str(q8), "8"]) == 0
    fq = np.asarray(VitEngine(str(q8), verbose=False).features_batch(x))
    cosq = (fq * ref).sum() / (np.linalg.norm(fq) * np.linalg.norm(ref))
    assert cosq > 0.99
    # export round trip
    out = tmp_path / "map2.gguf"
    save_params(str(out), params, hp, ftype=0)
    mf2 = read_model(str(out))
    assert "attn_pool.probe" in mf2.tensors
    p2 = load_params(mf2, hparams=detect_hparams(mf2))
    np.testing.assert_allclose(
        np.asarray(forward(p2, x, hp, features=True)), got,
        atol=1e-5, rtol=1e-5,
    )
    # mesh sharding (attn_pool replicates)
    mesh = make_mesh(dp=4, tp=2)
    sh = VitEngine(str(p), verbose=False).shard(mesh)
    with mesh:
        got_sh = np.asarray(sh.features_batch(jnp.asarray(x)))
    np.testing.assert_allclose(got_sh, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_finetune_attaches_head_to_siglip(tmp_path):
    """Fine-tuning a MAP tower attaches a classifier on the pooled
    output — the standard SigLIP-probe transfer recipe."""
    from PIL import Image

    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.finetune import finetune
    from vit_cpp_tpu.models.export import save_params

    p = tmp_path / "map.gguf"
    write_synthetic_model(str(p), HP_MAP, ftype=1, seed=6)
    rng = np.random.default_rng(7)
    for cls, lo, hi in (("aa_dark", 0, 40), ("bb_bright", 210, 255)):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(8):
            Image.fromarray(
                rng.integers(lo, hi, (32, 32, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
    params, hp, classes, losses = finetune(
        str(p), str(tmp_path / "train"), epochs=3, batch=4, lr=1e-3,
        log=lambda m: None,
    )
    assert hp.num_classes == 2 and losses[-1] < losses[0]
    out = tmp_path / "ft.gguf"
    save_params(str(out), params, hp, id2label=dict(enumerate(classes)))
    eng = VitEngine(str(out), verbose=False)
    assert eng.hp.global_pool == "map" and eng.hp.num_classes == 2
    import jax.numpy as jnp

    dark = rng.integers(0, 40, (2, 32, 32, 3), dtype=np.uint8)
    pix = jnp.stack([eng.preprocess_image(im) for im in dark])
    probs = np.asarray(eng.predict_probs_batch(pix))
    assert (probs.argmax(-1) == classes.index("aa_dark")).all()


def test_invalid_map_combinations(tmp_path):
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.gguf.writer import write_model
    from vit_cpp_tpu.models.params import load_params
    from vit_cpp_tpu.testing.synthetic import state_dict_records

    hp = dataclasses.replace(
        HP_MAP, num_prefix_tokens=2, num_classes=8
    )
    state = random_state_dict(hp, seed=8)
    p = tmp_path / "bad.gguf"
    write_model(str(p), hp, {}, state_dict_records(state, 0), 0)
    with pytest.raises(ValueError, match="not a supported configuration"):
        load_params(read_model(str(p)))