"""On-device TPU validation: kernel parity + family-geometry compile checks.

The pytest suite runs on virtual CPU devices (tests/conftest.py); this
script is the real-hardware companion, run manually on a TPU host:

    python tools/tpu_checks.py

Checks (each prints a max-abs error vs the XLA reference path):
  1. fused attention (both entry points) on ViT-B/16 shapes;
  2. dequant-in-kernel matmul for all five ggml block formats, including
     non-tile-multiple shapes (partial-block clipping);
  3. W8A8 int8 matmul;
  4. full forward pallas-vs-xla across the family geometries that stress
     the kernel dispatch: ViT-B/8@224 (785 tokens -> lane-block variant),
     ViT-L/16@384 (577 tokens), ViT-tiny/16@224 (non-128-multiple hidden).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def check_attention():
    from vit_cpp_tpu.ops.core import attention
    from vit_cpp_tpu.ops.flash_attention import attention_qkv, flash_attention

    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((2, 197, 3, 12, 64)), dtype=jnp.bfloat16)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    ref = attention(q, k, v).astype(jnp.float32)
    out = (
        attention_qkv(qkv.reshape(2, 197, 3 * 12 * 64), 12)
        .reshape(2, 197, 12, 64)
        .transpose(0, 2, 1, 3)
        .astype(jnp.float32)
    )
    print("attention_qkv    max err:", float(jnp.max(jnp.abs(out - ref))))
    fast = (
        attention_qkv(qkv.reshape(2, 197, 3 * 12 * 64), 12, fast=True)
        .reshape(2, 197, 12, 64)
        .transpose(0, 2, 1, 3)
        .astype(jnp.float32)
    )
    print("attn fast-softmax max err:", float(jnp.max(jnp.abs(fast - ref))))
    o2 = flash_attention(q, k, v).astype(jnp.float32)
    print("flash_attention  max err:", float(jnp.max(jnp.abs(o2 - ref))))
    # masked head-pair kernel (the d=64 default) vs the carve kernel
    flat = qkv.reshape(2, 197, 3 * 12 * 64)
    carve = attention_qkv(flat, 12, fast=True, pair=False).astype(jnp.float32)
    paired = attention_qkv(flat, 12, fast=True, pair=True).astype(jnp.float32)
    print("attn pair-vs-carve max err:", float(jnp.max(jnp.abs(paired - carve))))


def check_pipe_and_f32_lane():
    """r3: (a) software-pipelined kernel order (pipe=True) must match the
    sequential order bit-for-bit on device; (b) the f32 safe-softmax lane
    forward at T=785 must compile and match XLA (ADVICE r2 medium: the
    planner now shrinks qc mode/dtype-aware instead of emitting a kernel
    whose (785, 785) f32 workspaces overflow scoped VMEM)."""
    from vit_cpp_tpu.ops.flash_attention import _attention_qkv_xla, attention_qkv

    rng = np.random.default_rng(9)
    flat = jnp.asarray(rng.standard_normal((2, 197, 3 * 768)), jnp.bfloat16)
    a = attention_qkv(flat, 12, fast=True, pair=True, pipe=False)
    b = attention_qkv(flat, 12, fast=True, pair=True, pipe=True)
    print(
        "pair pipe-vs-seq  max err:",
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
    )
    lane = jnp.asarray(rng.standard_normal((1, 785, 3 * 768)), jnp.bfloat16)
    a = attention_qkv(lane, 12, fast=True, group=0, pipe=False)
    b = attention_qkv(lane, 12, fast=True, group=0, pipe=True)
    print(
        "lane pipe-vs-seq  max err:",
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
    )
    lane32 = jnp.asarray(rng.standard_normal((1, 785, 3 * 768)), jnp.float32)
    got = attention_qkv(lane32, 12, fast=False, group=0)
    ref = _attention_qkv_xla(lane32, 12)
    print(
        "f32 safe lane T=785 max err:",
        float(jnp.max(jnp.abs(got - ref))),
    )
    # (c) MXU-carried row-sum (mxusum): reassociated f32 sum, not
    # bit-exact — bound it at the kernels' own bf16 rounding scale
    a = attention_qkv(flat, 12, fast=True, pair=True, mxusum=False)
    b = attention_qkv(flat, 12, fast=True, pair=True, mxusum=True)
    print(
        "pair mxusum-vs-sum max err:",
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
    )
    a = attention_qkv(lane, 12, fast=True, group=0, mxusum=False)
    b = attention_qkv(lane, 12, fast=True, group=0, mxusum=True)
    print(
        "lane mxusum-vs-sum max err:",
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
    )
    # (d) bf16 softmax weights (bf16exp): bounded ~|V|*2^-8, not bit-exact
    a = attention_qkv(flat, 12, fast=True, pair=True, bf16exp=False)
    b = attention_qkv(flat, 12, fast=True, pair=True, bf16exp=True)
    print(
        "pair bf16exp-vs-f32 max err:",
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
    )
    a = attention_qkv(lane, 12, fast=True, group=0, bf16exp=False)
    b = attention_qkv(lane, 12, fast=True, group=0, bf16exp=True)
    print(
        "lane bf16exp-vs-f32 max err:",
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
    )


def check_attention_vjp():
    """Training kernel pair (attention_qkv_train): value + gradient parity
    vs the composed-XLA path, ON DEVICE (the pytest grad checks run in
    interpret mode on CPU)."""
    from vit_cpp_tpu.ops.core import attention
    from vit_cpp_tpu.ops.flash_attention import attention_qkv_train

    b, t, nh, d = 2, 197, 12, 64
    h = nh * d
    rng = np.random.default_rng(5)
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * h)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)

    def ref_fn(x):
        xs = x.reshape(b, t, 3, nh, d)
        q, k, v = (xs[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        o = attention(q, k, v, impl="xla")
        return jnp.sum(o.transpose(0, 2, 1, 3).reshape(b, t, h) * w)

    def pal_fn(x):
        return jnp.sum(attention_qkv_train(x, nh) * w)

    v_ref, v_pal = float(ref_fn(qkv)), float(pal_fn(qkv))
    g_ref = jax.grad(ref_fn)(qkv)
    g_pal = jax.grad(pal_fn)(qkv)
    gerr = float(jnp.max(jnp.abs(g_pal - g_ref)))
    print(
        f"attention VJP     val rel err: {abs(v_pal - v_ref) / abs(v_ref):.2e}"
        f"  grad max err: {gerr:.2e}"
    )

    # lane-block backward (the B/8 / L@384 training plan, T=785) vs the
    # XLA-differentiated composed path, on device. bf16 inputs: expect
    # ~1e-2 abs (bf16 dot accumulation differences, grads O(10)).
    b2, t2 = 1, 785
    qkv2 = jnp.asarray(rng.standard_normal((b2, t2, 3 * h)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((b2, t2, h)), jnp.bfloat16)

    def ref2(x):
        xs = x.reshape(b2, t2, 3, nh, d)
        q, k, v = (xs[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        o = attention(q, k, v, impl="xla")
        return jnp.sum(
            o.transpose(0, 2, 1, 3).reshape(b2, t2, h)
            * w2.astype(jnp.float32)
        )

    def pal2(x):
        return jnp.sum(
            attention_qkv_train(x, nh).astype(jnp.float32)
            * w2.astype(jnp.float32)
        )

    g2_ref = jax.grad(ref2)(qkv2).astype(jnp.float32)
    g2_lane = jax.grad(pal2)(qkv2).astype(jnp.float32)
    print(
        "grad lane-vs-xla (T=785) max err:",
        float(jnp.max(jnp.abs(g2_lane - g2_ref))),
    )

    # sizes-aware VJP (ToMe proportional attention on the train path,
    # r4) vs an explicit biased-softmax XLA reference, on device — at a
    # merged odd T (the shapes vit-finetune --tome actually runs)
    t3 = 181
    qkv3 = jnp.asarray(rng.standard_normal((b, t3, 3 * h)), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((b, t3, h)), jnp.float32)
    sizes = jnp.asarray(rng.uniform(1.0, 5.0, (b, t3)), jnp.float32)

    def ref3(x):
        xs = x.reshape(b, t3, 3, nh, d)
        q, k, v = (xs[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (d**0.5)
        logits = logits + jnp.log(sizes)[:, None, None, :]
        o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)
        return jnp.sum(o.transpose(0, 2, 1, 3).reshape(b, t3, h) * w3)

    def pal3(x):
        return jnp.sum(attention_qkv_train(x, nh, sizes=sizes) * w3)

    g3_ref = jax.grad(ref3)(qkv3)
    g3_pal = jax.grad(pal3)(qkv3)
    print(
        "sizes-VJP (tome, T=181) grad max err:",
        float(jnp.max(jnp.abs(g3_pal - g3_ref))),
    )


def check_quant_matmuls():
    from vit_cpp_tpu.gguf.dtypes import GGMLDType
    from vit_cpp_tpu.gguf.reader import TensorRecord
    from vit_cpp_tpu.ops.pallas_int8_matmul import w8a8_matmul
    from vit_cpp_tpu.ops.pallas_qmatmul import pallas_quant_matmul
    from vit_cpp_tpu.ops.qmatmul import quant_matmul
    from vit_cpp_tpu.quant.blocks import quantize
    from vit_cpp_tpu.quant.int8 import from_quant_linear
    from vit_cpp_tpu.quant.qlinear import _quant_linear_from_record

    rng = np.random.default_rng(1)
    for qt in (
        GGMLDType.Q4_0,
        GGMLDType.Q4_1,
        GGMLDType.Q5_0,
        GGMLDType.Q5_1,
        GGMLDType.Q8_0,
    ):
        w = rng.standard_normal((704, 768)).astype(np.float32) * 0.2
        blocks = quantize(w, qt)
        ql = _quant_linear_from_record(
            TensorRecord("w", (704, 768), qt, np.frombuffer(blocks.tobytes(), np.uint8))
        )
        x = jnp.asarray(rng.standard_normal((197, 768)), dtype=jnp.bfloat16)
        o = pallas_quant_matmul(x, ql)
        r = quant_matmul(x, ql, impl="xla")
        print(
            f"qmatmul {qt.name:5s}    max err:",
            float(jnp.max(jnp.abs(o.astype(jnp.float32) - r.astype(jnp.float32)))),
        )
    ql8 = _quant_linear_from_record(
        TensorRecord(
            "w",
            (704, 768),
            GGMLDType.Q8_0,
            np.frombuffer(
                quantize(w, GGMLDType.Q8_0).tobytes(), np.uint8
            ),
        )
    )
    i8 = from_quant_linear(ql8)
    x = jnp.asarray(rng.standard_normal((197, 768)), dtype=jnp.bfloat16)
    got = np.asarray(w8a8_matmul(x, i8)).astype(np.float32)
    want = np.asarray(quant_matmul(x, ql8, impl="xla")).astype(np.float32)
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    print("w8a8             rel err:", float(rel))


def check_geometries():
    from vit_cpp_tpu.hparams import VitHParams
    from vit_cpp_tpu.models import params_from_state_dict
    from vit_cpp_tpu.models.vit import forward
    from vit_cpp_tpu.testing.synthetic import random_state_dict

    confs = [
        ("ViT-B/8@224", VitHParams(hidden_size=768, num_hidden_layers=12,
                                   num_attention_heads=12, num_classes=1000,
                                   patch_size=8, img_size=224)),
        ("ViT-L/16@384", VitHParams(hidden_size=1024, num_hidden_layers=24,
                                    num_attention_heads=16, num_classes=1000,
                                    patch_size=16, img_size=384)),
        ("ViT-tiny/16@224", VitHParams(hidden_size=192, num_hidden_layers=12,
                                       num_attention_heads=3, num_classes=1000,
                                       patch_size=16, img_size=224)),
        # long sequence x non-128-multiple hidden: exercises the full-block
        # kernel at T=785 where the lane variant is unavailable
        ("ViT-tiny/8@224", VitHParams(hidden_size=192, num_hidden_layers=12,
                                      num_attention_heads=3, num_classes=1000,
                                      patch_size=8, img_size=224)),
        # d=80 heads (not 64, not a divisor of 128): neither the pair nor
        # the lane kernel is eligible — the generic full-block kernel
        # carves 80-lane head slices (T=257, 1.97 MB in-block)
        ("ViT-H/14@224", VitHParams(hidden_size=1280, num_hidden_layers=32,
                                    num_attention_heads=16, num_classes=1000,
                                    patch_size=14, img_size=224)),
        # ViT-g/14: d=88 heads (another non-64/non-128-divisor head class)
        # AND a non-4x MLP (6144 on 1408, ratio 48/11) — exercises the
        # full-block kernel's 88-lane head slices and the mlp_hidden
        # override through the whole jitted forward. 8 layers (not the
        # paper's 40): geometry coverage, not a throughput run
        ("ViT-g/14@224 (8L)", VitHParams(hidden_size=1408,
                                         num_hidden_layers=8,
                                         num_attention_heads=16,
                                         num_classes=1000, patch_size=14,
                                         img_size=224, mlp_hidden=6144)),
    ]
    rng = np.random.default_rng(0)
    for name, hp in confs:
        params = params_from_state_dict(
            random_state_dict(hp, seed=0), hp, dtype=jnp.bfloat16
        )
        x = jnp.asarray(
            rng.standard_normal((8, 3, hp.img_size, hp.img_size)),
            dtype=jnp.bfloat16,
        )
        t0 = time.time()
        a = forward(params, x, hp, attn_impl="pallas").astype(jnp.float32)
        b = forward(params, x, hp, attn_impl="xla").astype(jnp.float32)
        err = float(jnp.max(jnp.abs(a - b)))
        print(
            f"{name}: tokens={hp.n_tokens} pallas-vs-xla max err "
            f"{err:.4f} ({time.time() - t0:.0f}s)"
        )


def check_gap_and_resample():
    """GAP head path + resampled pos_embed on the real kernels: a CLS-less
    avg-pool ViT-B/16 resampled 224 -> 384 (T=576, sublane-aligned) runs
    the fused attention and matches the XLA path."""
    from vit_cpp_tpu.hparams import VitHParams
    from vit_cpp_tpu.models import params_from_state_dict
    from vit_cpp_tpu.models.resample import resample_params
    from vit_cpp_tpu.models.vit import forward
    from vit_cpp_tpu.testing.synthetic import random_state_dict

    hp = VitHParams(hidden_size=768, num_hidden_layers=12,
                    num_attention_heads=12, num_classes=1000,
                    patch_size=16, img_size=224,
                    num_prefix_tokens=0, global_pool="avg")
    params = params_from_state_dict(
        random_state_dict(hp, seed=0), hp, dtype=jnp.bfloat16
    )
    params, hp384 = resample_params(params, hp, 384)
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.standard_normal((8, 3, 384, 384)), dtype=jnp.bfloat16
    )
    t0 = time.time()
    a = forward(params, x, hp384, attn_impl="pallas").astype(jnp.float32)
    b = forward(params, x, hp384, attn_impl="xla").astype(jnp.float32)
    err = float(jnp.max(jnp.abs(a - b)))
    print(
        f"GAP ViT-B/16 resampled 224->384: tokens={hp384.n_tokens} "
        f"pallas-vs-xla max err {err:.4f} ({time.time() - t0:.0f}s)"
    )
    assert err < 0.05, f"GAP/resample parity off: {err}"


def check_moe():
    """V-MoE on device: sparse upcycling is function-preserving — the
    routed forward (one-hot dispatch/combine GEMMs on the MXU, GShard
    capacity machinery, ops/moe.py) matches the dense forward at init
    (identical experts + renormalized top-k gates; capacity 8.0 makes
    drops impossible, cap == k*T). f32 end to end so the comparison
    budget is reassociation noise, not bf16 rounding."""
    import dataclasses

    from vit_cpp_tpu.hparams import VitHParams
    from vit_cpp_tpu.models import params_from_state_dict
    from vit_cpp_tpu.models.vit import forward
    from vit_cpp_tpu.ops.moe import upcycle_params
    from vit_cpp_tpu.testing.synthetic import random_state_dict

    hp = VitHParams(hidden_size=192, num_hidden_layers=12,
                    num_attention_heads=3, num_classes=1000,
                    patch_size=16, img_size=224)
    layers = tuple(range(1, 12, 2))
    params = params_from_state_dict(random_state_dict(hp, seed=0), hp)
    up = upcycle_params(params, hp, 8, layers)
    hp_moe = dataclasses.replace(
        hp, num_experts=8, moe_layers=layers, moe_top_k=2, moe_capacity=8.0
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 3, 224, 224)), jnp.float32)
    t0 = time.time()
    # true-f32 matmuls: at the TPU default precision f32 dots run as
    # bf16 MXU passes and the two graphs' different reassociations
    # diverge to ~1.5e-2 on logits (measured) — the engine's f32 parity
    # path pins 'highest' for exactly this reason (engine.py)
    with jax.default_matmul_precision("highest"):
        dense = forward(params, x, hp)
        routed = forward(up, x, hp_moe)
    err = float(jnp.max(jnp.abs(dense - routed)))
    print(
        f"V-MoE upcycled-vs-dense (E=8 top-2, f32) max err {err:.6f} "
        f"({time.time() - t0:.0f}s)"
    )
    assert err < 1e-3, f"MoE function preservation off on device: {err}"


if __name__ == "__main__":
    print("devices:", jax.devices())
    check_attention()
    check_pipe_and_f32_lane()
    check_attention_vjp()
    check_quant_matmuls()
    check_geometries()
    check_gap_and_resample()
    check_moe()
    print("ALL CHECKS DONE")
