"""Fused multi-head attention as a Pallas TPU kernel.

TPU-native replacement for the reference's 5-node ggml attention subgraph
(KQ matmul -> scale -> softmax -> KQV matmul -> merge, vit.cpp:848-866).
ViT sequences are short (197 tokens for /16@224, 785 for /8@224 — SURVEY.md
§5 "long-context: absent by construction"), so the whole (T, T) score matrix
for one head fits comfortably in VMEM (785^2 f32 ~= 2.5 MB). The
speed-of-light design is therefore NOT an online-softmax flash loop but a
single fused block per (batch, head): QK^T, masked softmax and PV run
back-to-back out of VMEM with zero HBM traffic for the intermediates. The
softmax runs in f32 (parity with ggml's f32 ggml_soft_max, vit.cpp:856)
while both matmuls hit the MXU in the activation dtype.

Padding: T is padded up to a multiple of 128 lanes by the wrapper; padded
key columns are masked to -inf before the softmax, padded query rows produce
garbage that the wrapper slices off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int, scale: float):
    """One (batch*head) slice: q/k/v refs are (1, Tp, D) blocks in VMEM."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale

    tp = q.shape[0]
    if t_real != tp:
        col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), dimension=1)
        s = jnp.where(col < t_real, s, -jnp.inf)

    # Numerically-stable softmax in f32 (ggml_soft_max parity, vit.cpp:856).
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(l, 1e-30)

    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Full (unmasked) attention over (B, H, T, D) -> (B, H, T, D).

    Drop-in replacement for ops.core.attention(impl="xla"); selected with
    attn_impl="pallas". On non-TPU backends the kernel runs in interpreter
    mode so tests exercise the same code path on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, t, d = q.shape
    tp = _round_up(t, 128)
    dp = _round_up(d, 128)

    def prep(x):
        x = x.reshape(b * h, t, d)
        return jnp.pad(x, ((0, 0), (0, tp - t), (0, dp - d)))

    qf, kf, vf = prep(q), prep(k), prep(v)

    kernel = functools.partial(
        _attn_kernel, t_real=t, scale=1.0 / (d**0.5)
    )
    spec = pl.BlockSpec((1, tp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, tp, dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * tp * tp * dp,
            bytes_accessed=4 * b * h * tp * dp * q.dtype.itemsize,
            transcendentals=b * h * tp * tp,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :t, :d].reshape(b, h, t, d)
