"""Dequantize-inside-matmul for block-quantized weights.

The reference dequantizes ggml block formats inside its CPU dot kernels
(SURVEY.md §2.8: quant kernels -> dequant-in-kernel matmul). Here:

- `impl="xla"`: dequantize the weight tile-free in jnp and let XLA fuse the
  (codes - offset) * scale expansion into the matmul epilogue. Correctness
  reference used by tests and the CPU path.
- `impl="pallas"`: Pallas TPU kernel that streams packed codes HBM->VMEM and
  dequantizes per-tile in VMEM before hitting the MXU (see
  vit_cpp_tpu/ops/pallas_qmatmul.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vit_cpp_tpu.quant.qlinear import QuantLinear


def quant_matmul(x: jax.Array, w: QuantLinear, *, impl: str = "xla") -> jax.Array:
    if impl == "pallas":
        from vit_cpp_tpu.ops.pallas_qmatmul import pallas_quant_matmul

        return pallas_quant_matmul(x, w)
    kernel = w.dequantize(dtype=x.dtype)
    return jnp.dot(x, kernel, preferred_element_type=jnp.float32).astype(x.dtype)
