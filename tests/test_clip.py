"""CLIP vision towers: HF converter remap + QuickGELU + CLIP pixel norm.
Parity authority: transformers CLIPVisionModel with random weights
(offline). The `meta.clip` marker tensor persists the two hparams no
real tensor's presence can declare (hidden_act, pixel_norm) plus the
family's 1e-5 LayerNorm eps."""

import numpy as np
import pytest

pytest.importorskip("transformers")

from vit_cpp_tpu.cli.convert import infer_hparams, remap_hf_clip, remap_hf_siglip
from vit_cpp_tpu.models import params_from_state_dict
from vit_cpp_tpu.models.vit import forward
from vit_cpp_tpu.testing.ref_numpy import forward_numpy


def _hf_model(seed=0):
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(seed)
    cfg = CLIPVisionConfig(
        hidden_size=64,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
    )
    return CLIPVisionModel(cfg).eval()


def _images(n=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 3, 32, 32)).astype(np.float32)


@pytest.mark.slow
def test_remap_and_forward_match_transformers():
    import torch

    m = _hf_model()
    state = {k: v.numpy() for k, v in m.state_dict().items()}
    assert remap_hf_siglip(state) is None  # CLIP is not mis-detected
    ours = remap_hf_clip(state)
    assert "meta.clip" in ours and "norm_pre.weight" in ours
    hp = infer_hparams(ours, heads=4)
    assert hp.hidden_act == "quick_gelu" and hp.pixel_norm == "clip"
    assert hp.norm_pre and hp.num_classes == 0 and hp.eps == 1e-5
    x = _images()
    with torch.no_grad():
        want = m(pixel_values=torch.from_numpy(x)).pooler_output.numpy()
    params = params_from_state_dict(ours, hp)
    got = np.asarray(forward(params, x, hp, features=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        forward_numpy(ours, hp, x), want, atol=2e-5, rtol=1e-4
    )
    assert remap_hf_clip({"not": np.zeros(1)}) is None


def test_convert_cli_roundtrip_and_marker_persistence(tmp_path):
    """torch.save(CLIPVisionModel) -> vit-convert -> gguf: the marker
    survives the file round trip, so a fresh engine picks QuickGELU +
    clip pixel norm + 1e-5 eps and matches transformers."""
    import torch

    from vit_cpp_tpu.cli.convert import convert
    from vit_cpp_tpu.engine import VitEngine

    m = _hf_model(seed=1)
    ckpt = tmp_path / "clip.pth"
    torch.save(m.state_dict(), ckpt)
    out = convert(
        checkpoint=str(ckpt), output_dir=str(tmp_path), ftype=0,
        heads=4, verbose=False,
    )
    eng = VitEngine(out, verbose=False)
    assert eng.hp.hidden_act == "quick_gelu"
    assert eng.hp.pixel_norm == "clip" and eng.hp.eps == 1e-5
    x = _images(seed=2)
    with torch.no_grad():
        want = m(pixel_values=torch.from_numpy(x)).pooler_output.numpy()
    got = np.asarray(eng.features_batch(x))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    # preprocess uses CLIP constants: constant-v image maps exactly
    img = np.full((32, 32, 3), 100, dtype=np.uint8)
    pix = np.asarray(eng.preprocess_image(img))
    np.testing.assert_allclose(
        pix[0], (100 - 255 * 0.48145466) / (255 * 0.26862954), atol=1e-5
    )
    # export round trip re-writes the marker
    from vit_cpp_tpu.engine import detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.export import save_params
    from vit_cpp_tpu.models.params import load_params

    out2 = tmp_path / "clip2.gguf"
    save_params(str(out2), eng.params, eng.hp, ftype=0)
    mf2 = read_model(str(out2))
    assert "meta.clip" in mf2.tensors
    hp2 = detect_hparams(mf2)
    assert hp2.hidden_act == "quick_gelu"
    p2 = load_params(mf2, hparams=hp2)
    np.testing.assert_allclose(
        np.asarray(forward(p2, x, hp2, features=True)), got,
        atol=1e-5, rtol=1e-5,
    )


def test_quick_gelu_actually_differs(tmp_path):
    """Guard against the marker being silently ignored: the same weights
    with and without meta.clip produce different features."""
    import dataclasses

    m = _hf_model(seed=3)
    state = {k: v.numpy() for k, v in m.state_dict().items()}
    ours = remap_hf_clip(state)
    hp = infer_hparams(ours, heads=4)
    x = _images(seed=4)
    with_marker = forward_numpy(ours, hp, x)
    hp_tanh = dataclasses.replace(hp, hidden_act="gelu_tanh")
    without = forward_numpy(ours, hp_tanh, x)
    assert np.abs(with_marker - without).max() > 1e-4


def test_clip_serves_production_stack(tmp_path):
    """W8A8 + fold, quantize CLI and mesh sharding on a converted CLIP
    tower (norm_pre models fold blocks but keep norm_pre; headless)."""
    import jax.numpy as jnp
    import torch

    from vit_cpp_tpu.cli.convert import convert
    from vit_cpp_tpu.cli.quantize import main as quantize_main
    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.parallel.mesh import make_mesh

    m = _hf_model(seed=5)
    ckpt = tmp_path / "clip.pth"
    torch.save(m.state_dict(), ckpt)
    out = convert(
        checkpoint=str(ckpt), output_dir=str(tmp_path), ftype=1,
        heads=4, verbose=False,
    )
    x = _images(n=8, seed=6)
    ref = np.asarray(VitEngine(out, verbose=False).features_batch(x))
    w8 = VitEngine(out, mm_impl="int8", fold_ln=True, verbose=False)
    f8 = np.asarray(w8.features_batch(x))
    cos = (f8 * ref).sum() / (np.linalg.norm(f8) * np.linalg.norm(ref))
    assert cos > 0.99
    q8 = tmp_path / "clip-q8.gguf"
    assert quantize_main([out, str(q8), "8"]) == 0
    fq = np.asarray(VitEngine(str(q8), verbose=False).features_batch(x))
    cosq = (fq * ref).sum() / (np.linalg.norm(fq) * np.linalg.norm(ref))
    assert cosq > 0.99
    mesh = make_mesh(dp=4, tp=2)
    sh = VitEngine(out, verbose=False).shard(mesh)
    with mesh:
        got = np.asarray(sh.features_batch(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)