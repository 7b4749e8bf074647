"""W8A8 matmul Pallas kernel: dynamic per-token activation quantization +
int8 x int8 -> int32 MXU dots.

The v5e MXU runs int8 at twice the bf16 FLOP rate, and the dense bf16
forward is already at the matmul roofline (see bench history), so the only
way past it for quantized serving is genuine int8 arithmetic. Per tile:

    sx[m]   = absmax(x[m, :]) / 127          (VPU, f32)
    xq      = round(x / sx)                  (int8)
    acc     = xq @ wq                        (MXU, int32)
    y       = acc * sx[m] * scale[n]         (rank-1 f32 epilogue)

Weights come from quant/int8.Int8Linear (channelwise requantized ggml
blocks). Activation quantization is per token (row), recomputed per tile —
VPU work fully overlapped with the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_cpp_tpu.quant.int8 import Int8Linear


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _w8a8_kernel(x_ref, codes_ref, scale_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    sx = absmax * (1.0 / 127.0)
    inv = jnp.where(sx > 0, 1.0 / sx, 0.0)
    xq = jnp.round(x * inv).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        codes_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (acc.astype(jnp.float32) * sx * scale_ref[...]).astype(
        o_ref.dtype
    )


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "interpret")
)
def _w8a8_2d(
    x: jax.Array,
    codes: jax.Array,
    scale: jax.Array,
    *,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, k = x.shape
    n = codes.shape[1]
    block_m = min(block_m, _round_up(m, 32))  # int8 sublane tile = 32
    mp = _round_up(m, block_m)
    block_n = min(block_n, _round_up(n, 128))
    np_ = _round_up(n, block_n)
    kp = _round_up(k, 128)
    xf = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    cf = jnp.pad(codes, ((0, kp - k), (0, np_ - n)))
    sf = jnp.pad(scale.reshape(1, n), ((0, 0), (0, np_ - n)))
    out = pl.pallas_call(
        _w8a8_kernel,
        grid=(mp // block_m, np_ // block_n),
        in_specs=[
            pl.BlockSpec(
                (block_m, kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (kp, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * x.dtype.itemsize + np_ * kp + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, cf, sf)
    return out[:m, :n]


def _w8a8_xla(x: jax.Array, w: Int8Linear) -> jax.Array:
    """XLA-native W8A8: measured 286 TOP/s vs 166 TFLOP/s bf16 on v5e
    (1.7x — the int8 MXU mode), with the activation quantization and the
    rank-1 rescale fused into the GEMM's prologue/epilogue by XLA. This
    outperformed the handwritten Pallas tile kernel (which paid VPU
    quantization per N-tile plus HBM pad/slice copies), so it is the
    default; the Pallas variant stays for kernels research.
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = absmax * (1.0 / 127.0)
    xq = jnp.round(xf * jnp.where(sx > 0, 1.0 / sx, 0.0)).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        w.codes,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * sx * w.scale).astype(x.dtype)


def w8a8_matmul(x: jax.Array, w: Int8Linear, impl: str = "xla") -> jax.Array:
    """y = x @ (codes * scale) with int8 MXU arithmetic; x: (..., K)."""
    *lead, k = x.shape
    if w.in_features != k:
        raise ValueError(
            f"w8a8 matmul: x K={k} != weight in_features={w.in_features}"
        )
    if impl == "xla":
        return _w8a8_xla(x, w)
    y = _w8a8_2d(x.reshape(-1, k), w.codes, w.scale)
    return y.reshape(*lead, w.out_features)
