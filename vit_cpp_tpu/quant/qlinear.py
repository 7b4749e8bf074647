"""QuantLinear: a packed block-quantized weight matrix as a JAX pytree node.

Used by the params loader for 2-D `.*weight` tensors stored in the ggml
block formats, and consumed by the dequantize-in-matmul kernels
(vit_cpp_tpu/ops/qmatmul.py). See SURVEY.md §2.2 for the formats.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vit_cpp_tpu.gguf.dtypes import QK, GGMLDType
from vit_cpp_tpu.gguf.reader import TensorRecord
from vit_cpp_tpu.quant.blocks import CODE_OFFSET, unpack_soa


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantLinear:
    """A packed block-quantized weight matrix.

    Stored transposed to matmul orientation — the on-disk blocks run along
    the torch (out, in) contiguous axis, but the pytree keeps everything
    (in, out) so both the XLA and the Pallas dequant-in-matmul paths compute
    `x @ w` with zero runtime transposes, and the in-kernel scale expansion
    broadcasts over *leading* (sublane) dims, which Mosaic lowers cheaply
    (a lane-dim split reshape is unsupported on TPU):

      codes:  (in, out)        int8  (Q8_0 signed; Q4/Q5 codes 0..15/0..31)
      scales: (in // 32, out)  f32
      mins:   (in // 32, out)  f32   (only for Q4_1/Q5_1, else None)

    Dequantization: w = (codes - offset) * scale [+ min], with the static
    `offset` from the format (8 for Q4_0, 16 for Q5_0, 0 otherwise).
    """

    codes: jax.Array
    scales: jax.Array
    mins: Optional[jax.Array] = None
    qtype: int = dataclasses.field(
        default=int(GGMLDType.Q8_0), metadata=dict(static=True)
    )

    @property
    def offset(self) -> int:
        return CODE_OFFSET[GGMLDType(self.qtype)]

    @property
    def out_features(self) -> int:
        return self.codes.shape[-1]

    @property
    def in_features(self) -> int:
        return self.codes.shape[-2]

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        """Materialize the dense (in, out) kernel (jnp fallback path)."""
        c = self.codes.astype(jnp.float32)
        if self.offset:
            c = c - self.offset
        expand = lambda a: jnp.repeat(a, QK, axis=-2)
        w = c * expand(self.scales)
        if self.mins is not None:
            w = w + expand(self.mins)
        return w.astype(dtype)


def _quant_linear_from_record(rec: TensorRecord) -> QuantLinear:
    out_f, in_f = rec.shape
    soa = unpack_soa(rec.data, rec.n_elements, rec.dtype)
    codes = np.ascontiguousarray(
        soa["codes"].astype(np.int8).reshape(out_f, in_f).T
    )
    scales = np.ascontiguousarray(soa["d"].reshape(out_f, in_f // QK).T)
    mins = soa.get("m")
    if mins is not None:
        mins = np.ascontiguousarray(mins.reshape(out_f, in_f // QK).T)
    return QuantLinear(
        codes=jnp.asarray(codes),
        scales=jnp.asarray(scales),
        mins=None if mins is None else jnp.asarray(mins),
        qtype=int(rec.dtype),
    )
