"""Pallas kernel correctness vs the jnp reference paths.

Runs in interpreter mode on the CPU test mesh (conftest pins JAX to CPU);
the same kernels compile for TPU via the mosaic pipeline. Reference
semantics per SURVEY.md §2.1: unmasked f32-softmax attention, and
dequantize-inside-matmul for the ggml block formats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cpp_tpu.gguf.dtypes import GGMLDType
from vit_cpp_tpu.ops.core import attention
from vit_cpp_tpu.ops.flash_attention import attention_qkv, flash_attention
from vit_cpp_tpu.ops.pallas_qmatmul import pallas_quant_matmul
from vit_cpp_tpu.ops.qmatmul import quant_matmul
from vit_cpp_tpu.quant.blocks import quantize
from vit_cpp_tpu.quant.qlinear import QuantLinear, _quant_linear_from_record
from vit_cpp_tpu.gguf.reader import TensorRecord


def _qkv(b, h, t, d, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, h, t, d)).astype(np.float32), dtype=dtype
    )
    return mk(), mk(), mk()


class TestFlashAttention:
    @pytest.mark.parametrize("t", [197, 785])
    def test_matches_xla_f32(self, t):
        q, k, v = _qkv(1, 3, t, 64)
        ref = attention(q, k, v, impl="xla")
        out = flash_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_matches_xla_bf16(self):
        q, k, v = _qkv(2, 4, 197, 64, dtype=jnp.bfloat16)
        ref = attention(q, k, v, impl="xla").astype(jnp.float32)
        out = flash_attention(q, k, v).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)

    def test_aligned_t(self):
        # T already a lane multiple: no padding path.
        q, k, v = _qkv(1, 2, 128, 64)
        ref = attention(q, k, v, impl="xla")
        out = flash_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_attention_qkv_fused_layout(self):
        # (B, T, 3h) serving path == split-head reference path
        b, t, nh, d = 2, 197, 3, 64
        rng = np.random.default_rng(7)
        qkv5 = rng.standard_normal((b, t, 3, nh, d)).astype(np.float32)
        q, k, v = (
            jnp.asarray(qkv5[:, :, i]).transpose(0, 2, 1, 3) for i in range(3)
        )
        ref = attention(q, k, v, impl="xla").transpose(0, 2, 1, 3).reshape(b, t, nh * d)
        out = attention_qkv(jnp.asarray(qkv5.reshape(b, t, 3 * nh * d)), nh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_attention_qkv_d80_vit_huge_head_width(self):
        # ViT-H's d=80 heads: 128 % 80 != 0 so neither the pair nor the
        # lane kernel is eligible — the generic full-block kernel carves
        # 80-lane head slices. Must match the split-head XLA reference.
        b, t, nh, d = 2, 60, 2, 80
        rng = np.random.default_rng(29)
        qkv5 = rng.standard_normal((b, t, 3, nh, d))
        q, k, v = (
            jnp.asarray(qkv5[:, :, i].transpose(0, 2, 1, 3)) for i in range(3)
        )
        ref = attention(q, k, v, impl="xla").transpose(0, 2, 1, 3).reshape(b, t, nh * d)
        for fast in (False, True):
            out = attention_qkv(
                jnp.asarray(qkv5.reshape(b, t, 3 * nh * d)), nh, fast=fast
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5
            )

    def test_attention_qkv_d88_vit_giant_head_width(self):
        # ViT-g's d=88 heads (1408/16): like d=80, no pair/lane kernel is
        # eligible; the full-block kernel carves 88-lane head slices.
        b, t, nh, d = 2, 60, 2, 88
        rng = np.random.default_rng(31)
        qkv5 = rng.standard_normal((b, t, 3, nh, d))
        q, k, v = (
            jnp.asarray(qkv5[:, :, i].transpose(0, 2, 1, 3)) for i in range(3)
        )
        ref = attention(q, k, v, impl="xla").transpose(0, 2, 1, 3).reshape(b, t, nh * d)
        for fast in (False, True):
            out = attention_qkv(
                jnp.asarray(qkv5.reshape(b, t, 3 * nh * d)), nh, fast=fast
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5
            )

    @pytest.mark.parametrize("nh,d", [(2, 64), (2, 32), (3, 64), (2, 80)])
    @pytest.mark.slow
    def test_attention_qkv_train_grad_matches_xla(self, nh, d):
        """The custom-VJP training attention: value AND gradient parity
        with the composed-XLA-ops path (which JAX differentiates itself)."""
        from vit_cpp_tpu.ops.flash_attention import attention_qkv_train

        b, t, h = 2, 37, nh * d
        rng = np.random.default_rng(11)
        qkv = jnp.asarray(rng.standard_normal((b, t, 3 * h)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)

        def ref_fn(x):
            xs = x.reshape(b, t, 3, nh, d)
            q, k, v = (xs[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
            o = attention(q, k, v, impl="xla")
            return jnp.sum(o.transpose(0, 2, 1, 3).reshape(b, t, h) * w)

        def pal_fn(x):
            return jnp.sum(attention_qkv_train(x, nh) * w)

        np.testing.assert_allclose(
            float(pal_fn(qkv)), float(ref_fn(qkv)), rtol=1e-5
        )
        g_ref = np.asarray(jax.grad(ref_fn)(qkv))
        g_pal = np.asarray(jax.grad(pal_fn)(qkv))
        np.testing.assert_allclose(g_pal, g_ref, atol=3e-5, rtol=1e-4)

    @pytest.mark.parametrize(
        "nh,d,t",
        [(2, 64, 37), (3, 64, 29), (2, 32, 37), (2, 80, 23), (6, 64, 181),
         # lane-plan shape: h % 128 == 0 at a T where 'full' overflows
         (8, 64, 700)],
    )
    @pytest.mark.slow
    def test_attention_qkv_train_sizes_grad_matches_xla(self, nh, d, t):
        """The sizes-aware custom-VJP (ToMe proportional attention on the
        training path, r4): value AND qkv-gradient parity with an
        explicit biased-softmax XLA reference across the pair (d=64),
        carve (d=32/80), odd-head-tail (nh=3), merged-T (181) and
        lane-plan (T=700, h=1024 won't fit a full block in f32) kernel
        dispatches; sizes receive a zero cotangent (stop-gradient'd
        matching upstream, models/vit.py::tome_block)."""
        from vit_cpp_tpu.ops.flash_attention import (
            _grad_plan,
            attention_qkv_train,
        )

        b, h = 2, nh * d
        rng = np.random.default_rng(13)
        qkv = jnp.asarray(rng.standard_normal((b, t, 3 * h)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
        sizes = jnp.asarray(rng.uniform(1.0, 5.0, (b, t)), jnp.float32)
        if t == 700:
            assert _grad_plan(t, h, d, 4) == "lane"

        def ref_fn(x):
            xs = x.reshape(b, t, 3, nh, d)
            q, k, v = (xs[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (d**0.5)
            logits = logits + jnp.log(sizes)[:, None, None, :]
            o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)
            return jnp.sum(o.transpose(0, 2, 1, 3).reshape(b, t, h) * w)

        def pal_fn(x):
            return jnp.sum(attention_qkv_train(x, nh, sizes=sizes) * w)

        np.testing.assert_allclose(
            float(pal_fn(qkv)), float(ref_fn(qkv)), rtol=1e-5
        )
        g_ref = np.asarray(jax.grad(ref_fn)(qkv))
        g_pal = np.asarray(jax.grad(pal_fn)(qkv))
        np.testing.assert_allclose(g_pal, g_ref, atol=3e-5, rtol=1e-4)
        # sizes cotangent is exactly zero (constant bias by construction)
        gs = np.asarray(
            jax.grad(lambda s: jnp.sum(attention_qkv_train(qkv, nh, sizes=s)))(
                sizes
            )
        )
        np.testing.assert_array_equal(gs, np.zeros_like(gs))

    @pytest.mark.parametrize("nh", [2, 3, 4])
    def test_grad_pair_kernel_bit_exact_vs_carve(self, nh):
        """The masked-pair backward (d=64 default) matches the carve
        backward bit-for-bit — masked lanes contribute exact zeros."""
        from vit_cpp_tpu.ops.flash_attention import _attention_qkv_grad

        b, t, d = 2, 29, 64
        rng = np.random.default_rng(17)
        qkv = jnp.asarray(rng.standard_normal((b, t, 3 * nh * d)), jnp.float32)
        do = jnp.asarray(rng.standard_normal((b, t, nh * d)), jnp.float32)
        carve = np.asarray(_attention_qkv_grad(qkv, do, nh, pair=False))
        paired = np.asarray(_attention_qkv_grad(qkv, do, nh, pair=True))
        np.testing.assert_array_equal(paired, carve)

    @pytest.mark.parametrize("nh", [2, 4])
    def test_grad_pair_pipe_bit_exact(self, nh):
        """The interleaved two-half backward schedule (default since r4:
        +23% kernel rate, tools/attn_grad_anatomy.py) is a pure
        instruction reorder — bit-exact vs the sequential order."""
        from vit_cpp_tpu.ops.flash_attention import _attention_qkv_grad

        b, t, d = 2, 29, 64
        rng = np.random.default_rng(19)
        qkv = jnp.asarray(rng.standard_normal((b, t, 3 * nh * d)), jnp.float32)
        do = jnp.asarray(rng.standard_normal((b, t, nh * d)), jnp.float32)
        seq = np.asarray(_attention_qkv_grad(qkv, do, nh, pair=True, pipe=False))
        pip = np.asarray(_attention_qkv_grad(qkv, do, nh, pair=True, pipe=True))
        np.testing.assert_array_equal(pip, seq)

    @pytest.mark.parametrize("nh,d", [(2, 64), (1, 128)])
    def test_grad_lane_kernel_matches_carve(self, nh, d):
        """The lane-block backward (large T x wide h plan) matches the
        carve backward within f32 chunk-reassociation tolerance."""
        from vit_cpp_tpu.ops.flash_attention import (
            _attention_qkv_grad,
            _attention_qkv_grad_lane,
        )

        b, t = 2, 29
        rng = np.random.default_rng(23)
        qkv = jnp.asarray(rng.standard_normal((b, t, 3 * nh * d)), jnp.float32)
        do = jnp.asarray(rng.standard_normal((b, t, nh * d)), jnp.float32)
        want = np.asarray(_attention_qkv_grad(qkv, do, nh, pair=False))
        got = np.asarray(_attention_qkv_grad_lane(qkv, do, nh, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    @pytest.mark.slow
    def test_attention_qkv_train_plan_dispatch(self):
        """_grad_plan: B/16 -> full block; B/8 and L@384 -> lane; long-T
        lane-ineligible hidden sizes -> None (XLA fallback, still
        differentiable)."""
        from vit_cpp_tpu.ops.flash_attention import (
            _grad_plan,
            attention_qkv_train,
        )

        assert _grad_plan(197, 768, 64, 4) == "full"  # ViT-B/16 training
        assert _grad_plan(785, 768, 64, 2) == "lane"  # ViT-B/8, bf16
        assert _grad_plan(577, 1024, 64, 4) == "lane"  # ViT-L/16@384, f32
        assert _grad_plan(785, 768, 64, 4) is None  # B/8 f32: panels too fat
        assert _grad_plan(1408, 96, 32, 4) is None  # h % 128 != 0, long T

        b, t, nh, d = 1, 1408, 3, 32
        rng = np.random.default_rng(3)
        qkv = jnp.asarray(rng.standard_normal((b, t, 3 * nh * d)), jnp.float32)
        g = jax.grad(lambda x: jnp.sum(attention_qkv_train(x, nh) ** 2))(qkv)
        assert np.isfinite(np.asarray(g)).all()
        with pytest.raises(ValueError, match="not divisible"):
            attention_qkv_train(qkv[:, :, : 3 * 100], 7)

    @pytest.mark.slow
    def test_train_forward_grad_through_model(self):
        """cross_entropy_loss (pallas-train attention + remat + unroll)
        grads match the plain-XLA forward's grads on a tiny model."""
        from vit_cpp_tpu.hparams import VitHParams
        from vit_cpp_tpu.models import params_from_state_dict
        from vit_cpp_tpu.models.vit import forward
        from vit_cpp_tpu.parallel.train import cross_entropy_loss
        from vit_cpp_tpu.testing.synthetic import random_state_dict

        hp = VitHParams(
            hidden_size=128,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_classes=5,
            patch_size=8,
            img_size=32,
        )
        params = params_from_state_dict(random_state_dict(hp, seed=2), hp)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 5, (2,)), jnp.int32)

        def ref_loss(p):
            logits = forward(p, x, hp)  # plain XLA graph
            logp = jax.nn.log_softmax(logits, axis=-1)
            return jnp.mean(-jnp.take_along_axis(logp, y[:, None], axis=-1))

        l_ref, g_ref = jax.value_and_grad(ref_loss)(params)
        l_tr, g_tr = jax.value_and_grad(
            lambda p: cross_entropy_loss(p, x, y, hp)
        )(params)
        np.testing.assert_allclose(float(l_tr), float(l_ref), rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3
            ),
            g_tr,
            g_ref,
        )

    def test_model_forward_selects_pallas(self):
        from vit_cpp_tpu.hparams import VitHParams
        from vit_cpp_tpu.models import params_from_state_dict
        from vit_cpp_tpu.models.vit import forward
        from vit_cpp_tpu.testing.synthetic import random_state_dict

        hp = VitHParams(
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_classes=10,
            patch_size=8,
            img_size=32,
        )
        params = params_from_state_dict(random_state_dict(hp, seed=0), hp)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 3, 32, 32)),
            dtype=jnp.float32,
        )
        ref = forward(params, x, hp, attn_impl="xla")
        out = forward(params, x, hp, attn_impl="pallas")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def _qlinear(n, k, qt, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.2
    blocks = quantize(w, qt)
    rec = TensorRecord("w", (n, k), qt, np.frombuffer(blocks.tobytes(), np.uint8))
    return _quant_linear_from_record(rec)


class TestPallasQuantMatmul:
    @pytest.mark.parametrize(
        "qt",
        [
            GGMLDType.Q4_0,
            GGMLDType.Q4_1,
            GGMLDType.Q5_0,
            GGMLDType.Q5_1,
            GGMLDType.Q8_0,
        ],
    )
    def test_matches_xla_dequant(self, qt):
        ql = _qlinear(96, 160, qt)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((7, 160)),
            dtype=jnp.float32,
        )
        ref = quant_matmul(x, ql, impl="xla")
        out = pallas_quant_matmul(x, ql)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
        )

    def test_batched_leading_dims(self):
        ql = _qlinear(64, 96, GGMLDType.Q8_0)
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((2, 5, 96)),
            dtype=jnp.float32,
        )
        ref = quant_matmul(x, ql, impl="xla")
        out = pallas_quant_matmul(x, ql)
        assert out.shape == (2, 5, 64)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
        )

    def test_large_tiles_and_padding(self):
        # M, N, K all non-multiples of the tile sizes.
        ql = _qlinear(300, 224, GGMLDType.Q4_1)
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal((130, 224)),
            dtype=jnp.float32,
        )
        ref = quant_matmul(x, ql, impl="xla")
        out = pallas_quant_matmul(x, ql)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
        )

    def test_bf16_activations(self):
        ql = _qlinear(128, 128, GGMLDType.Q8_0)
        x = jnp.asarray(
            np.random.default_rng(4).standard_normal((16, 128)),
            dtype=jnp.bfloat16,
        )
        ref = quant_matmul(x, ql, impl="xla").astype(jnp.float32)
        out = pallas_quant_matmul(x, ql).astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-2, rtol=5e-2
        )

    def test_forward_with_pallas_mm(self):
        """Whole quantized model forward with mm_impl='pallas'."""
        import tempfile

        from vit_cpp_tpu.cli.quantize import quantize_model_file
        from vit_cpp_tpu.gguf import read_model
        from vit_cpp_tpu.hparams import VitHParams
        from vit_cpp_tpu.models import load_params
        from vit_cpp_tpu.models.vit import forward
        from vit_cpp_tpu.testing.synthetic import write_synthetic_model

        hp = VitHParams(
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_classes=10,
            patch_size=8,
            img_size=32,
        )
        with tempfile.TemporaryDirectory() as d:
            write_synthetic_model(f"{d}/m.gguf", hp, ftype=0, seed=0)
            quantize_model_file(f"{d}/m.gguf", f"{d}/q.gguf", 8, verbose=False)
            params = load_params(read_model(f"{d}/q.gguf"))
        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((2, 3, 32, 32)),
            dtype=jnp.float32,
        )
        ref = forward(params, x, hp, mm_impl="xla")
        out = forward(params, x, hp, mm_impl="pallas")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3
        )


class TestFastSoftmax:
    def test_fast_matches_safe(self):
        b, t, nh, d = 2, 197, 12, 64
        rng = np.random.default_rng(11)
        qkv = jnp.asarray(
            rng.standard_normal((b, t, 3 * nh * d)).astype(np.float32)
        )
        safe = attention_qkv(qkv, nh, fast=False)
        fast = attention_qkv(qkv, nh, fast=True)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(safe), atol=2e-5
        )

    def test_fast_matches_safe_with_large_scores(self):
        # logits up to ~70 (well past normal but inside the documented
        # clamp domain): fast mode must stay finite and match safe softmax
        b, t, nh, d = 1, 64, 2, 64
        rng = np.random.default_rng(12)
        qkv = jnp.asarray(
            (rng.standard_normal((b, t, 3 * nh * d)) * 2.6).astype(np.float32)
        )
        safe = np.asarray(attention_qkv(qkv, nh, fast=False))
        fast = np.asarray(attention_qkv(qkv, nh, fast=True))
        assert np.isfinite(fast).all()
        np.testing.assert_allclose(fast, safe, atol=1e-4)


class TestMaskedPairKernel:
    """The masked head-pair kernel (d=64): 128-lane-aligned loads/stores,
    per-head scores via lane-masked K/V (see _qkv_pair_kernel). Must be
    numerically identical to the per-head carve kernel."""

    @pytest.mark.parametrize(
        "t,h,nh",
        [
            (197, 768, 12),  # ViT-B/16
            (197, 1024, 16),  # ViT-L/16
            (50, 192, 3),  # ViT-tiny (odd head count -> tail path)
            (577, 1024, 16),  # ViT-L/16 @384 (q-chunked, raised VMEM limit)
        ],
    )
    @pytest.mark.slow
    def test_pair_matches_carve(self, t, h, nh):
        rng = np.random.default_rng(42)
        qkv = jnp.asarray(rng.standard_normal((2, t, 3 * h)), dtype=jnp.float32)
        for fast in (False, True):
            ref = attention_qkv(qkv, nh, fast=fast, pair=False, group=1)
            got = attention_qkv(qkv, nh, fast=fast, pair=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5
            )

    @pytest.mark.parametrize(
        "t,h,nh",
        [
            (785, 768, 12),  # ViT-B/8: the geometry the lane path exists for
            (197, 768, 12),  # d=64: two masked heads per 128-lane block
            (64, 256, 8),  # d=32: four masked heads per block
            (64, 256, 2),  # d=128: single head fills the block (no mask)
        ],
    )
    @pytest.mark.slow
    def test_masked_lane_kernel_matches_carve(self, t, h, nh):
        # group=0 forces the lane-block dispatch; must equal the per-head
        # carve kernel bit-for-bit in f32 (masked lanes add exact zeros)
        rng = np.random.default_rng(3)
        qkv = jnp.asarray(rng.standard_normal((1, t, 3 * h)), dtype=jnp.float32)
        for fast in (False, True):
            ref = attention_qkv(qkv, nh, fast=fast, pair=False, group=1)
            got = attention_qkv(qkv, nh, fast=fast, pair=False, group=0)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5
            )

    @pytest.mark.parametrize("w", [2, 3, 6, 4])  # 4 -> snaps down to 3
    def test_masked_lane_kernel_wide_panels(self, w):
        # multi-panel lane blocks (fewer grid steps at B/8) must stay
        # bit-identical to one-panel blocks (direct call: the jitted
        # attention_qkv caches env knobs at trace time)
        from vit_cpp_tpu.ops.flash_attention import _attention_qkv_lane

        rng = np.random.default_rng(5)
        qkv = jnp.asarray(rng.standard_normal((1, 197, 3 * 768)), dtype=jnp.float32)
        wide = _attention_qkv_lane(qkv, 12, False, True, width=w)
        one = _attention_qkv_lane(qkv, 12, False, True, width=1)
        np.testing.assert_array_equal(np.asarray(wide), np.asarray(one))

    def test_pair_requires_d64(self):
        # d=32 (h=256, nh=8): pair dispatch must fall back, still correct
        rng = np.random.default_rng(7)
        qkv = jnp.asarray(rng.standard_normal((1, 64, 3 * 256)), dtype=jnp.float32)
        ref = attention_qkv(qkv, 8, pair=False, group=1)
        got = attention_qkv(qkv, 8, pair=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


class TestPipelinedKernels:
    """VIT_ATTN_PIPE / pipe=True: software-pipelined instruction order
    (chain i+1's score dot before chain i's softmax+PV) must be bit-exact
    vs the sequential order — only scheduling changes."""

    @pytest.mark.parametrize("fast", [False, True])
    def test_pair_pipe_bit_exact(self, fast):
        rng = np.random.default_rng(13)
        qkv = jnp.asarray(
            rng.standard_normal((2, 197, 3 * 768)), dtype=jnp.float32
        )
        seq = attention_qkv(qkv, 12, fast=fast, pair=True, pipe=False)
        pip = attention_qkv(qkv, 12, fast=fast, pair=True, pipe=True)
        np.testing.assert_array_equal(np.asarray(seq), np.asarray(pip))

    @pytest.mark.parametrize(
        "t,h,nh", [(785, 768, 12), (64, 256, 2)]  # masked subs / single-head
    )
    def test_lane_pipe_bit_exact(self, t, h, nh):
        from vit_cpp_tpu.ops.flash_attention import _attention_qkv_lane

        rng = np.random.default_rng(17)
        qkv = jnp.asarray(
            rng.standard_normal((1, t, 3 * h)), dtype=jnp.float32
        )
        for fast in (False, True):
            seq = _attention_qkv_lane(qkv, nh, fast, True, pipe=False)
            pip = _attention_qkv_lane(qkv, nh, fast, True, pipe=True)
            np.testing.assert_array_equal(np.asarray(seq), np.asarray(pip))


class TestMxuSumKernels:
    """VIT_ATTN_MXUSUM / mxusum=True: the softmax row-sum rides the PV
    dot — a ones column in a dead (masked-out) lane of each V copy makes
    the MXU emit sum_j p_ij alongside PV, deleting the (qc, T) VPU sum
    reduce (the costliest softmax stage in the B/8 anatomy). Numerically
    a reassociated f32 sum vs the VPU reduce — not bit-exact, but the
    same error scale; these tests bound it against the carve kernel."""

    @pytest.mark.parametrize(
        "t,h,nh", [(197, 768, 12), (50, 192, 3)]  # even pairs / odd tail
    )
    def test_pair_mxusum_matches_carve(self, t, h, nh):
        rng = np.random.default_rng(23)
        qkv = jnp.asarray(rng.standard_normal((2, t, 3 * h)), jnp.float32)
        for fast in (False, True):
            ref = attention_qkv(qkv, nh, fast=fast, pair=False, group=1)
            got = attention_qkv(qkv, nh, fast=fast, pair=True, mxusum=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5
            )

    @pytest.mark.parametrize(
        "t,h,nh",
        [
            (785, 768, 12),  # B/8: the geometry the sum pass dominates
            (197, 768, 12),
            (64, 256, 8),  # d=32: four masked heads per block
            (64, 256, 2),  # d=128: no dead lane -> mxusum self-disables
        ],
    )
    def test_lane_mxusum_matches_carve(self, t, h, nh):
        from vit_cpp_tpu.ops.flash_attention import _attention_qkv_lane

        rng = np.random.default_rng(29)
        qkv = jnp.asarray(rng.standard_normal((1, t, 3 * h)), jnp.float32)
        for fast in (False, True):
            ref = attention_qkv(qkv, nh, fast=fast, pair=False, group=1)
            got = _attention_qkv_lane(qkv, nh, fast, True, mxusum=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5
            )

    def test_lane_mxusum_with_key_mask(self):
        # token-padded serving: pad keys must still carry zero weight and
        # the MXU-carried sum must cover only the real keys
        from vit_cpp_tpu.ops.flash_attention import _attention_qkv_lane

        rng = np.random.default_rng(31)
        t, kv, h, nh = 200, 197, 768, 12
        qkv = np.zeros((1, t, 3 * h), np.float32)
        qkv[:, :kv] = rng.standard_normal((1, kv, 3 * h))
        qkv = jnp.asarray(qkv)
        ref = attention_qkv(qkv[:, :kv], nh, fast=True, pair=False, group=1)
        got = _attention_qkv_lane(qkv, nh, True, True, kv=kv, mxusum=True)
        np.testing.assert_allclose(
            np.asarray(got)[:, :kv], np.asarray(ref), atol=2e-5, rtol=1e-5
        )


class TestBf16ExpKernels:
    """VIT_ATTN_BF16EXP / bf16exp=True: the clamped (fast) or
    max-subtracted (safe) scores downcast to bf16 BEFORE exp2, so every
    remaining VPU pass over the (qc, T) workspace runs 2x-packed; the
    row-sum accumulates f32. NOT bit-exact — softmax weights round to
    bf16 (~2^-9 relative), which bounds the attention output (a convex
    combination of V rows) at ~|V|*2^-8. These tests pin that bound
    against the f32-softmax carve kernel."""

    ATOL = 3e-2  # |V| ~ N(0,1), T up to 785: measured max err ~1e-2

    @pytest.mark.parametrize("fast", [False, True])
    def test_pair_bf16exp_error_bounded(self, fast):
        rng = np.random.default_rng(37)
        qkv = jnp.asarray(rng.standard_normal((2, 197, 3 * 768)), jnp.float32)
        ref = attention_qkv(qkv, 12, fast=fast, pair=False, group=1)
        got = attention_qkv(qkv, 12, fast=fast, pair=True, bf16exp=True)
        err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
        assert err < self.ATOL, err
        assert err > 1e-6  # sanity: the knob actually engaged

    @pytest.mark.parametrize(
        "t,h,nh", [(785, 768, 12), (64, 256, 8)]  # B/8 geometry / d=32
    )
    def test_lane_bf16exp_error_bounded(self, t, h, nh):
        from vit_cpp_tpu.ops.flash_attention import _attention_qkv_lane

        rng = np.random.default_rng(41)
        qkv = jnp.asarray(rng.standard_normal((1, t, 3 * h)), jnp.float32)
        for fast in (False, True):
            ref = attention_qkv(qkv, nh, fast=fast, pair=False, group=1)
            got = _attention_qkv_lane(qkv, nh, fast, True, bf16exp=True)
            err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
            assert err < self.ATOL, (fast, err)

    def test_lane_bf16exp_composes_with_mxusum(self):
        # both knobs together: sum rides the PV dot on bf16 weights
        from vit_cpp_tpu.ops.flash_attention import _attention_qkv_lane

        rng = np.random.default_rng(43)
        qkv = jnp.asarray(rng.standard_normal((1, 197, 3 * 768)), jnp.float32)
        ref = attention_qkv(qkv, 12, fast=True, pair=False, group=1)
        got = _attention_qkv_lane(
            qkv, 12, True, True, bf16exp=True, mxusum=True
        )
        err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
        assert err < self.ATOL, err


class TestLaneVmemPlan:
    """ADVICE r2 medium: the f32 safe-softmax lane forward at T=785 sized
    the whole (785, 785) score workspace (est 14.7 MB > the 13 MB
    calibrated budget) and would OOM Mosaic's scoped VMEM. The planner
    must shrink qc mode/dtype-aware, and fall back to composed XLA when
    no chunk fits."""

    def test_f32_785_safe_shrinks_qc_and_matches(self):
        from vit_cpp_tpu.ops.flash_attention import _attention_qkv_lane

        rng = np.random.default_rng(19)
        qkv = jnp.asarray(
            rng.standard_normal((1, 785, 3 * 768)), dtype=jnp.float32
        )
        out = _attention_qkv_lane(qkv, 12, False, True)
        assert out is not None  # qc shrink keeps it on the fused kernel
        ref = attention_qkv(qkv, 12, fast=False, pair=False, group=1)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
        )

    def test_unfittable_geometry_falls_back_to_xla(self):
        # T=4096 f32: the in/out lane blocks alone (2*4*T*128*4 = 16.8 MB
        # at w=1) exceed the budget regardless of qc, so the planner must
        # return None and the public entry point must take the XLA path
        from vit_cpp_tpu.ops import flash_attention as fa

        big = jnp.zeros((1, 4096, 3 * 768), jnp.float32)
        assert fa._attention_qkv_lane(big, 12, False, True) is None
        out = attention_qkv(big, 12, fast=False, group=0)
        assert out.shape == (1, 4096, 768)


class TestPaddedTokens:
    """forward(pad_tokens=True): activations at a sublane-aligned T with
    key-masked attention must match the unpadded forward exactly — the
    pad rows are garbage-but-unread and their keys carry zero softmax
    weight (r3: +10% int8 GEMM rate from aligned row groups)."""

    @pytest.mark.parametrize(
        "h,nh,group",
        [
            (128, 2, 1),   # d=64: masked-pair kernel
            (256, 8, 1),   # d=32: full-block carve kernel
            (256, 8, 0),   # d=32 lane-block dispatch (group=0)
        ],
    )
    @pytest.mark.slow
    def test_padded_matches_unpadded(self, h, nh, group, monkeypatch):
        from vit_cpp_tpu.hparams import VitHParams
        from vit_cpp_tpu.models import params_from_state_dict
        from vit_cpp_tpu.models.vit import forward
        from vit_cpp_tpu.testing.synthetic import random_state_dict

        if group == 0:
            monkeypatch.setenv("VIT_ATTN_GROUP", "0")
        hp = VitHParams(
            hidden_size=h, num_hidden_layers=2, num_attention_heads=nh,
            num_classes=8, patch_size=8, img_size=40,  # T = 26 -> pads to 32
        )
        params = params_from_state_dict(random_state_dict(hp, seed=0), hp)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 3, 40, 40)),
            jnp.float32,
        )
        for impl in ("pallas", "pallas-fast"):
            a = forward(params, x, hp, attn_impl=impl)
            b = forward(params, x, hp, attn_impl=impl, pad_tokens=True)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            )

    @pytest.mark.parametrize(
        "t,h,nh,group",
        [
            (200, 768, 12, 1),  # masked-pair kernel
            (200, 768, 12, 0),  # lane kernel
            (200, 256, 8, 1),   # d=32 carve kernel (_sdpa path)
        ],
    )
    def test_pad_garbage_cannot_nan_safe_softmax(self, t, h, nh, group):
        # review r3: safe softmax took the row max over ALL key columns
        # including masked pads — garbage pad scores far above the real
        # maximum pushed every real weight into exp2 underflow, yielding
        # l = 0 and 0/0 = NaN in REAL rows. Pad scores are now masked
        # out before the max, so the padded math IS the unpadded math.
        kv = 197
        rng = np.random.default_rng(47)
        qkv = np.zeros((1, t, 3 * h), np.float32)
        qkv[:, :kv] = rng.standard_normal((1, kv, 3 * h))
        qkv[:, kv:] = 1e4  # adversarial pad rows: scores >> real max
        qkv = jnp.asarray(qkv)
        ref = attention_qkv(
            qkv[:, :kv], nh, fast=False, pair=False, group=1
        )
        got = attention_qkv(qkv, nh, fast=False, kv=kv, group=group)
        real = np.asarray(got)[:, :kv]
        assert np.isfinite(real).all()
        np.testing.assert_allclose(
            real, np.asarray(ref), atol=2e-5, rtol=1e-5
        )

    def test_pad_tokens_rejects_non_pallas(self):
        from vit_cpp_tpu.hparams import VitHParams
        from vit_cpp_tpu.models import params_from_state_dict
        from vit_cpp_tpu.models.vit import forward
        from vit_cpp_tpu.testing.synthetic import random_state_dict

        hp = VitHParams(
            hidden_size=64, num_hidden_layers=1, num_attention_heads=2,
            num_classes=4, patch_size=8, img_size=40,
        )
        params = params_from_state_dict(random_state_dict(hp, seed=1), hp)
        x = jnp.zeros((1, 3, 40, 40), jnp.float32)
        with pytest.raises(ValueError, match="pad_tokens requires"):
            forward(params, x, hp, attn_impl="xla", pad_tokens=True)
