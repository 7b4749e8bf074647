"""W8A8 matmul: dynamic per-token activation quantization + int8 x int8 ->
int32 MXU dots, expressed for XLA.

The v5e MXU runs int8 at twice the bf16 FLOP rate, and the dense bf16
forward is already at the matmul roofline (docs/TUNING.md), so the only way
past it for quantized serving is genuine int8 arithmetic:

    sx[m]   = absmax(x[m, :]) / 127          (f32, per token)
    xq      = round(x / sx)                  (int8)
    acc     = xq @ wq                        (MXU, int32)
    y       = acc * sx[m] * scale[n]         (rank-1 f32 epilogue)

Weights come from quant/int8.Int8Linear (channelwise-requantized ggml
blocks or dynamically quantized dense checkpoints). XLA fuses the
activation quantization into the GEMM prologue and the rank-1 rescale into
its epilogue with no HBM materialization of the int8 codes — measured 286
TOP/s vs 166 TFLOP/s bf16 (1.7x). A handwritten Pallas tile kernel was
built and measured at 2,088 img/s vs 4,596 for this path (per-N-tile VPU
requantization + HBM pad/slice copies); it was deleted per the r1 review —
the record lives in docs/TUNING.md ("Quantized matmuls").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vit_cpp_tpu.quant.int8 import Int8Linear


def _w8a8_xla(x: jax.Array, w: Int8Linear) -> jax.Array:
    xf = x.astype(jnp.float32)
    if w.act_scale is not None:
        # static calibrated scale: quantize is elementwise (fuses into the
        # producer epilogue) — no absmax read of the activations
        sx = w.act_scale
        xq = jnp.round(jnp.clip(xf / sx, -127.0, 127.0)).astype(jnp.int8)
    else:
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


def w8a8_matmul(x: jax.Array, w: Int8Linear) -> jax.Array:
    """y = x @ (codes * scale) with int8 MXU arithmetic; x: (..., K)."""
    k = x.shape[-1]
    if w.in_features != k:
        raise ValueError(
            f"w8a8 matmul: x K={k} != weight in_features={w.in_features}"
        )
    return _w8a8_xla(x, w)
