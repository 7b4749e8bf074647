"""Positional-embedding resolution resampling (models/resample.py).

Serving/fine-tuning a checkpoint at a non-native image size interpolates
the pos_embed grid with timm `resample_abs_pos_embed` semantics. The
authority for the interpolation itself is torch
`F.interpolate(align_corners=False)` — matched bit-for-bit-in-f32 here —
and the timm prefix-handling is re-expressed inline as a torch oracle.
The reference has no equivalent (vit.cpp serves the trained resolution
only)."""

import dataclasses
import math

import numpy as np
import pytest

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import params_from_state_dict
from vit_cpp_tpu.models.resample import (
    resample_params,
    resample_pos_embed,
    torch_resize_matrix,
)
from vit_cpp_tpu.models.vit import forward
from vit_cpp_tpu.testing.synthetic import random_state_dict, write_synthetic_model

HP = VitHParams(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_classes=10,
    patch_size=8,
    img_size=32,
)


@pytest.mark.parametrize("mode", ["bicubic", "bilinear"])
@pytest.mark.parametrize("antialias", [False, True])
@pytest.mark.parametrize("n_in,n_out", [(14, 24), (24, 14), (7, 16), (16, 7)])
def test_resize_matrix_matches_torch(mode, antialias, n_in, n_out):
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 3, n_in, n_in)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(img),
        size=(n_out, n_out),
        mode=mode,
        align_corners=False,
        antialias=antialias,
    ).numpy()
    w = torch_resize_matrix(n_in, n_out, mode=mode, antialias=antialias)
    got = np.einsum("Oi,bcij,Pj->bcOP", w, img, w)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def _timm_resample_oracle(pos, n_prefix, new_side, mode="bicubic", aa=True):
    """timm resample_abs_pos_embed re-expressed with torch directly."""
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.asarray(pos, dtype=np.float32))[None]
    prefix, grid = t[:, :n_prefix], t[:, n_prefix:]
    side = math.isqrt(grid.shape[1])
    g = grid.reshape(1, side, side, -1).permute(0, 3, 1, 2)
    g = F.interpolate(
        g, size=(new_side, new_side), mode=mode, antialias=aa,
        align_corners=False,
    )
    g = g.permute(0, 2, 3, 1).reshape(1, new_side * new_side, -1)
    return torch.cat([prefix, g], dim=1)[0].numpy()


@pytest.mark.parametrize(
    "n_prefix,no_embed_class", [(1, False), (2, False), (0, False), (1, True)]
)
@pytest.mark.parametrize("new_side", [7, 4, 3])
def test_pos_embed_matches_timm_oracle(n_prefix, no_embed_class, new_side):
    hp = dataclasses.replace(
        HP,
        num_prefix_tokens=n_prefix,
        no_embed_class=no_embed_class,
        global_pool="avg" if n_prefix == 0 else "token",
    )
    rng = np.random.default_rng(3)
    pos = rng.standard_normal((hp.n_pos_tokens, 64)).astype(np.float32)
    grid_prefix = 0 if no_embed_class else n_prefix
    want = _timm_resample_oracle(pos, grid_prefix, new_side)
    got = resample_pos_embed(pos, hp, new_side)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
    assert got.shape == (new_side * new_side + grid_prefix, 64)


def test_identity_is_exact():
    rng = np.random.default_rng(4)
    pos = rng.standard_normal((HP.n_tokens, 64)).astype(np.float32)
    got = resample_pos_embed(pos, HP, HP.n_patches_side)
    np.testing.assert_array_equal(got, pos)


def test_resample_params_validation():
    state = random_state_dict(HP, seed=5)
    params = params_from_state_dict(state, HP)
    with pytest.raises(ValueError, match="multiple of patch_size"):
        resample_params(params, HP, 50)
    hp_str = dataclasses.replace(HP, seq_len=4, num_classes=8)
    with pytest.raises(ValueError, match="ViTSTR"):
        resample_params(params, hp_str, 64)
    p2, hp2 = resample_params(params, HP, HP.img_size)
    assert p2 is params and hp2 is HP  # no-op shares everything


def test_resampled_forward_runs_and_uses_position():
    """A 32->48 resample serves 48x48 inputs; the resampled pos_embed is
    really applied (perturbing it changes logits)."""
    state = random_state_dict(HP, seed=6)
    params = params_from_state_dict(state, HP)
    p2, hp2 = resample_params(params, HP, 48)
    assert hp2.img_size == 48 and p2["pos_embed"].shape == (37, 64)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 3, 48, 48)).astype(np.float32)
    out = np.asarray(forward(p2, x, hp2))
    assert out.shape == (2, 10) and np.isfinite(out).all()
    p3 = dict(p2)
    p3["pos_embed"] = p2["pos_embed"] + 0.3 * np.asarray(
        rng.standard_normal(p2["pos_embed"].shape), dtype=np.float32
    )
    assert np.abs(np.asarray(forward(p3, x, hp2)) - out).max() > 1e-3


def test_matches_checkpoint_resampled_before_conversion(tmp_path):
    """Loading + resample_params == converting a checkpoint whose
    pos_embed was already resampled through timm (the other deployment
    route). Same logits to f32 noise."""
    from vit_cpp_tpu.engine import detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.gguf.writer import write_model
    from vit_cpp_tpu.models.params import load_params
    from vit_cpp_tpu.testing.synthetic import state_dict_records

    state = random_state_dict(HP, seed=8)
    # route A: load the 32px checkpoint, resample in-engine
    params = params_from_state_dict(state, HP)
    pa, hpa = resample_params(params, HP, 48)
    # route B: timm-style pre-resampled checkpoint -> file -> load
    state_b = dict(state)
    state_b["pos_embed"] = _timm_resample_oracle(
        state["pos_embed"][0], 1, 6
    )[None]
    hp_b = dataclasses.replace(HP, img_size=48)
    p = tmp_path / "pre.gguf"
    write_model(str(p), hp_b, {}, state_dict_records(state_b, 0), 0)
    mf = read_model(str(p))
    pb = load_params(mf, hparams=detect_hparams(mf))
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 3, 48, 48)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(forward(pa, x, hpa)),
        np.asarray(forward(pb, x, hpa)),
        atol=1e-5,
        rtol=1e-5,
    )


def test_engine_img_size_override(tmp_path):
    from vit_cpp_tpu.engine import VitEngine

    p = tmp_path / "m.gguf"
    write_synthetic_model(str(p), HP, ftype=1, seed=10)
    eng = VitEngine(str(p), img_size=48, verbose=False)
    assert eng.hp.img_size == 48
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 3, 48, 48)).astype(np.float32)
    probs = np.asarray(eng.predict_probs_batch(x))
    assert probs.shape == (2, 10) and np.isfinite(probs).all()
    # preprocess path produces the new geometry end-to-end
    img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
    pix = eng.preprocess_image(img)
    assert pix.shape == (3, 48, 48)


def test_build_engine_img_size_and_vitx_rejection(tmp_path):
    """The shared CLI builder threads --img-size to gguf engines and
    refuses it for .vitx artifacts (geometry baked at export)."""
    import pytest as _pytest

    from vit_cpp_tpu.aot import save_engine
    from vit_cpp_tpu.cli.common import build_engine

    p = tmp_path / "m.gguf"
    write_synthetic_model(str(p), HP, ftype=1, seed=14)
    eng, is_vitstr = build_engine(
        str(p), dtype="f32", mm="xla", attn="xla", img_size=48
    )
    assert not is_vitstr and eng.hp.img_size == 48
    vitx = tmp_path / "m.vitx"
    save_engine(eng, str(vitx), batch=[2])
    with _pytest.raises(ValueError, match="do not apply"):
        build_engine(str(vitx), img_size=48)
    with _pytest.raises(ValueError, match="do not apply"):
        build_engine(str(vitx), patch_size=4)
    # exported-with-override artifact bakes the new geometry
    from vit_cpp_tpu.aot import AotEngine

    aot = AotEngine(str(vitx))
    assert aot.hp.img_size == 48


def test_engine_img_size_with_production_path(tmp_path):
    """img-size override composes with the W8A8 + fold-ln serving stack
    and with sharded serving on the CPU mesh."""
    import jax.numpy as jnp

    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.parallel.mesh import make_mesh

    hp = dataclasses.replace(HP, num_classes=16)
    p = tmp_path / "m.gguf"
    write_synthetic_model(str(p), hp, ftype=1, seed=12)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((8, 3, 48, 48)).astype(np.float32))
    ref = np.asarray(
        VitEngine(str(p), img_size=48, verbose=False).predict_probs_batch(x)
    )
    w8 = VitEngine(
        str(p), img_size=48, mm_impl="int8", fold_ln=True, verbose=False
    )
    got = np.asarray(w8.predict_probs_batch(x))
    assert (got.argmax(-1) == ref.argmax(-1)).mean() >= 0.75
    mesh = make_mesh(dp=4, tp=2)
    sh = VitEngine(str(p), img_size=48, verbose=False).shard(mesh)
    with mesh:
        got_sh = np.asarray(sh.predict_probs_batch(x))
    np.testing.assert_allclose(got_sh, ref, atol=2e-5, rtol=1e-4)


# ---- FlexiViT patch-size resampling (pi_resize_factor / --patch-size) ----
#
# The patch-embedding kernel is pseudo-inverse-resized (FlexiViT, Beyer
# et al. 2023; timm resample_patch_embed semantics). Two oracles pin it:
# the DEFINING property (patch-token inner products are preserved
# exactly under upsampling, since B has full column rank), and the
# full-matrix pinv construction timm uses (the separable per-axis
# factors equal pinv(kron(B, B)) by the Kronecker pseudo-inverse
# identity).


@pytest.mark.parametrize("mode", ["bicubic", "bilinear"])
@pytest.mark.parametrize("p_new", [12, 16])
def test_pi_resize_preserves_inner_products(mode, p_new):
    from vit_cpp_tpu.models.resample import resample_patch_embed

    hp = dataclasses.replace(HP, hidden_size=64, patch_size=8)
    rng = np.random.default_rng(20)
    kernel = rng.standard_normal((3 * 8 * 8, 64)).astype(np.float32)
    new = resample_patch_embed(kernel, hp, p_new, mode=mode)
    assert new.shape == (3 * p_new * p_new, 64)
    b1 = torch_resize_matrix(8, p_new, mode=mode, antialias=True)
    for trial in range(3):
        x = rng.standard_normal((3, 8, 8)).astype(np.float32)
        # the input-patch resize the factor inverts: per-axis torch AA
        xr = np.einsum("Oi,cij,Pj->cOP", b1, x, b1)
        native = x.reshape(-1) @ kernel
        resized = xr.reshape(-1) @ new
        np.testing.assert_allclose(resized, native, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("p_old,p_new", [(8, 16), (8, 4), (6, 10)])
def test_pi_resize_matches_full_matrix_pinv(p_old, p_new):
    """Separable per-axis factors == pinv of the full 2-D resize matrix
    (the timm construction): pinv(kron(A, A)) = kron(pinv(A), pinv(A))."""
    from vit_cpp_tpu.models.resample import resample_patch_embed

    hp = dataclasses.replace(HP, patch_size=p_old)
    rng = np.random.default_rng(21)
    kernel = rng.standard_normal((3 * p_old * p_old, 64)).astype(np.float32)
    got = resample_patch_embed(kernel, hp, p_new)
    b1 = torch_resize_matrix(p_old, p_new, antialias=True).astype(np.float64)
    b_full = np.kron(b1, b1)  # row-major (y, x) flatten
    p_full = np.linalg.pinv(b_full).T  # (p_new^2, p_old^2)
    k = kernel.reshape(3, p_old * p_old, 64).astype(np.float64)
    want = np.einsum("OI,cIh->cOh", p_full, k).reshape(
        3 * p_new * p_new, 64
    )
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-5,
                               rtol=1e-5)


def test_patch_resample_identity_and_validation():
    state = random_state_dict(HP, seed=22)
    params = params_from_state_dict(state, HP)
    p2, hp2 = resample_params(params, HP, None, patch_size=HP.patch_size)
    assert p2 is params and hp2 is HP  # no-op shares everything
    with pytest.raises(ValueError, match="not a multiple"):
        resample_params(params, HP, None, patch_size=5)  # 32 % 5 != 0
    hp_str = dataclasses.replace(HP, seq_len=4, num_classes=8)
    with pytest.raises(ValueError, match="ViTSTR"):
        resample_params(params, hp_str, None, patch_size=4)


@pytest.mark.parametrize("p_new,img", [(4, None), (16, None), (8, 48)])
def test_patch_resampled_forward_runs(p_new, img):
    """Patch override (alone and with an img-size override) produces a
    working model at the new token geometry, and the resampled
    patch_embed is really applied (perturbing it changes logits)."""
    state = random_state_dict(HP, seed=23)
    params = params_from_state_dict(state, HP)
    p2, hp2 = resample_params(params, HP, img, patch_size=p_new)
    assert hp2.patch_size == p_new
    side = hp2.img_size // p_new
    assert p2["pos_embed"].shape == (side * side + 1, 64)
    assert p2["patch_embed"]["kernel"].shape == (3 * p_new * p_new, 64)
    rng = np.random.default_rng(24)
    x = rng.standard_normal((2, 3, hp2.img_size, hp2.img_size)).astype(
        np.float32
    )
    out = np.asarray(forward(p2, x, hp2))
    assert out.shape == (2, 10) and np.isfinite(out).all()
    p3 = dict(p2)
    pe = dict(p2["patch_embed"])
    pe["kernel"] = p2["patch_embed"]["kernel"] + 0.3 * np.asarray(
        rng.standard_normal(p2["patch_embed"]["kernel"].shape),
        dtype=np.float32,
    )
    p3["patch_embed"] = pe
    assert np.abs(np.asarray(forward(p3, x, hp2)) - out).max() > 1e-3


def test_engine_patch_size_override_and_vitx_bake(tmp_path):
    from vit_cpp_tpu.aot import AotEngine, save_engine
    from vit_cpp_tpu.cli.common import build_engine
    from vit_cpp_tpu.engine import VitEngine

    p = tmp_path / "m.gguf"
    write_synthetic_model(str(p), HP, ftype=1, seed=25)
    eng = VitEngine(str(p), patch_size=4, verbose=False)
    assert eng.hp.patch_size == 4 and eng.hp.img_size == 32
    rng = np.random.default_rng(26)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    probs = np.asarray(eng.predict_probs_batch(x))
    assert probs.shape == (2, 10) and np.isfinite(probs).all()
    # the shared CLI builder threads --patch-size; export bakes it
    eng2, _ = build_engine(
        str(p), dtype="f32", mm="xla", attn="xla", patch_size=16
    )
    assert eng2.hp.patch_size == 16
    vitx = tmp_path / "m.vitx"
    save_engine(eng2, str(vitx), batch=[2])
    assert AotEngine(str(vitx)).hp.patch_size == 16


def test_engine_patch_size_with_production_path(tmp_path):
    """Patch override composes with the W8A8 + fold-ln serving stack and
    with sharded serving on the CPU mesh."""
    import jax.numpy as jnp

    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.parallel.mesh import make_mesh

    hp = dataclasses.replace(HP, num_classes=16)
    p = tmp_path / "m.gguf"
    write_synthetic_model(str(p), hp, ftype=1, seed=27)
    rng = np.random.default_rng(28)
    x = jnp.asarray(rng.standard_normal((8, 3, 32, 32)).astype(np.float32))
    ref = np.asarray(
        VitEngine(str(p), patch_size=4, verbose=False).predict_probs_batch(x)
    )
    w8 = VitEngine(
        str(p), patch_size=4, mm_impl="int8", fold_ln=True, verbose=False
    )
    got = np.asarray(w8.predict_probs_batch(x))
    assert (got.argmax(-1) == ref.argmax(-1)).mean() >= 0.75
    mesh = make_mesh(dp=4, tp=2)
    sh = VitEngine(str(p), patch_size=4, verbose=False).shard(mesh)
    with mesh:
        got_sh = np.asarray(sh.predict_probs_batch(x))
    np.testing.assert_allclose(got_sh, ref, atol=2e-5, rtol=1e-4)
