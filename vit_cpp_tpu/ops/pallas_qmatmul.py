"""Dequantize-inside-matmul Pallas TPU kernel for ggml block formats.

The reference's quantized path dequantizes Q4/Q5/Q8 blocks inside its CPU
dot kernels (ggml vec_dot, SURVEY.md §2.8) — the packed weights are never
materialized as floats in memory. This kernel is the TPU-native analogue:
integer codes stream HBM -> VMEM as int8 (4x/2x less HBM traffic than f32
weights — the usual TPU bottleneck, HBM bandwidth), are expanded to
`(code - offset) * scale [+ min]` on the VPU one (K, TN) tile at a time,
and immediately fed to the MXU.

Layout: QuantLinear stores codes (in, out) and scales (in//32, out) —
matmul orientation — so the per-block scale expansion is a broadcast over
the two *leading* (sublane) dims followed by a leading-dim-merge reshape,
which Mosaic lowers as a no-op relayout. (The transposed formulation needs
a lane-dim split, which Mosaic rejects: "unsupported shape cast".)

Grid: (M tiles x N tiles), full K per block — every matrix in the ViT
family has K <= 4096, so a (K, TN) int8 code tile is at most 2 MB of VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_cpp_tpu.gguf.dtypes import QK
from vit_cpp_tpu.quant.qlinear import QuantLinear


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _qmm_kernel(
    x_ref, codes_ref, scales_ref, o_ref, *, offset: int, has_min: bool
):
    """x: (TM, K); codes: (K, TN) int8; scales: ([2,] K//QK, TN) f32."""
    k, tn = codes_ref.shape
    c = codes_ref[...].astype(jnp.float32)
    if offset:
        c = c - float(offset)

    def expand(s):  # (K//QK, TN) -> (K, TN) along sublanes
        return jnp.broadcast_to(s[:, None, :], (k // QK, QK, tn)).reshape(k, tn)

    if has_min:
        w = c * expand(scales_ref[0]) + expand(scales_ref[1])
    else:
        w = c * expand(scales_ref[...])
    x = x_ref[...]
    o_ref[...] = jnp.dot(
        x, w.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("offset", "has_min", "block_m", "block_n", "interpret"),
)
def _qmm_2d(
    x: jax.Array,
    codes: jax.Array,
    scales: jax.Array,
    *,
    offset: int,
    has_min: bool,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """(M, K) @ dequant((K, N)) -> (M, N)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, k = x.shape
    n = codes.shape[1]
    # No host-side padding: K stays a full-dim block (always covered, so
    # no garbage enters the contraction) and partial tail blocks along
    # M/N produce out-of-range rows/columns that Pallas clips on write.
    # (Explicit jnp.pad copies were measured at several ms per layer —
    # TPU retiling of activation-sized buffers.)
    block_m = min(block_m, _round_up(m, 16))
    block_n = min(block_n, _round_up(n, 128))

    kernel = functools.partial(_qmm_kernel, offset=offset, has_min=has_min)
    if has_min:
        s_spec = pl.BlockSpec(
            (2, k // QK, block_n),
            lambda i, j: (0, 0, j),
            memory_space=pltpu.VMEM,
        )
    else:
        s_spec = pl.BlockSpec(
            (k // QK, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM
        )
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(m, block_m), pl.cdiv(n, block_n)),
        in_specs=[
            pl.BlockSpec(
                (block_m, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            s_spec,
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + n * k + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, codes, scales)


def pallas_quant_matmul(x: jax.Array, w: QuantLinear) -> jax.Array:
    """y = x @ dequant(w), x: (..., K) -> (..., N), dequant fused in-kernel."""
    *lead, k = x.shape
    if w.in_features != k:
        raise ValueError(
            f"quant matmul: x K={k} != weight in_features={w.in_features}"
        )
    scales = w.scales
    has_min = w.mins is not None
    if has_min:
        scales = jnp.stack([w.scales, w.mins], axis=0)
    x2 = x.reshape(-1, k)
    y = _qmm_2d(
        x2,
        w.codes,
        scales.astype(jnp.float32),
        offset=w.offset,
        has_min=has_min,
    )
    return y.reshape(*lead, w.out_features)
