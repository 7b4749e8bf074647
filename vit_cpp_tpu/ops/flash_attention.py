"""Fused multi-head attention as a Pallas TPU kernel.

TPU-native replacement for the reference's attention subgraph (KQ matmul ->
scale -> softmax -> KQV matmul -> merge, vit.cpp:848-866). ViT sequences
are short (197 tokens for /16@224, 785 for /8@224 — SURVEY.md §5
"long-context: absent by construction"), so a whole (T, T) score matrix per
head fits in VMEM (785^2 f32 ~= 2.5 MB) and the speed-of-light design is
NOT an online-softmax flash loop: one fused block per (batch, head) runs
QK^T, f32 softmax (ggml_soft_max parity, vit.cpp:856) and PV back-to-back
with zero HBM traffic for the logits.

Two entry points:

- `attention_qkv(qkv)` — the serving path. Takes the fused QKV projection
  output in its natural (B, T, 3, H, D) layout and reads the Q/K/V slices
  via three BlockSpec views of the SAME array, writing (B, T, H, D). This
  eliminates every transpose/reshape copy the unfused path materializes in
  HBM around the attention (q/k/v head-split transposes and the merge —
  pure bandwidth on the usual TPU bottleneck).
- `flash_attention(q, k, v)` — drop-in for ops.core.attention(impl="xla"),
  (B, H, T, D) in/out. Used by tests and any caller with pre-split heads.

No host-side padding: blocks carry the true (T, D) extents and Mosaic pads
VMEM tiles internally, so there are no padded copies of q/k/v in HBM and no
key mask is needed (every key column is real).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sdpa(q, k, v, out_dtype):
    """(T, D) f-dim attention math shared by both kernels; f32 softmax."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l
    return jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _qkv_kernel(x_ref, o_ref, *, nh: int):
    """One batch element: x is (1, T, 3h) — [q|k|v] x heads on the feature
    axis (timm fused-QKV order); writes all heads of the (1, T, h) output.

    The per-head Q/K/V carves are static lane slices of the VMEM-resident
    projection output (the in-kernel analogue of the reference's
    ggml_view_3d carves, vit.cpp:826-846) — no HBM-side head-split or
    merge transposes exist anywhere on this path. Mosaic block constraints
    force the full (T, 3h) trailing block, which also keeps VMEM usage
    flat in H.
    """
    x = x_ref[0]
    h = x.shape[1] // 3
    d = h // nh
    for i in range(nh):
        q = x[:, i * d : (i + 1) * d]
        k = x[:, h + i * d : h + (i + 1) * d]
        v = x[:, 2 * h + i * d : 2 * h + (i + 1) * d]
        o_ref[0, :, i * d : (i + 1) * d] = _sdpa(q, k, v, o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def attention_qkv(
    qkv: jax.Array, num_heads: int, *, interpret: bool | None = None
) -> jax.Array:
    """(B, T, 3h) fused-projection output -> (B, T, h) attention output."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, three_h = qkv.shape
    h = three_h // 3
    out = pl.pallas_call(
        functools.partial(_qkv_kernel, nh=num_heads),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, t, three_h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, t, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * t * t * h,
            bytes_accessed=4 * b * t * h * qkv.dtype.itemsize,
            transcendentals=b * t * t * num_heads,
        ),
        interpret=interpret,
    )(qkv)
    return out


def _bhtd_kernel(q_ref, k_ref, v_ref, o_ref):
    """Blocks of (B, H, T, D) arrays: refs are (1, 1, T, D)."""
    o_ref[0, 0] = _sdpa(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Full (unmasked) attention over (B, H, T, D) -> (B, H, T, D)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, t, d = q.shape
    spec = pl.BlockSpec(
        (1, 1, t, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _bhtd_kernel,
        grid=(b, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * t * t * d,
            bytes_accessed=4 * b * h * t * d * q.dtype.itemsize,
            transcendentals=b * h * t * t,
        ),
        interpret=interpret,
    )(q, k, v)
