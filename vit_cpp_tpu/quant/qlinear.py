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

    Logical weight is (out, in) torch-orientation; `codes` are the integer
    quantization codes and `scales`/`mins` the per-32-element-block
    parameters laid out along the input dimension:

      codes:  (out, in)        int8  (Q8_0 signed; Q4/Q5 codes 0..15/0..31)
      scales: (out, in // 32)  f32
      mins:   (out, in // 32)  f32   (only for Q4_1/Q5_1, else None)

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
        return self.codes.shape[-2]

    @property
    def in_features(self) -> int:
        return self.codes.shape[-1]

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        """Materialize the dense (in, out) kernel (jnp fallback path)."""
        c = self.codes.astype(jnp.float32)
        if self.offset:
            c = c - self.offset
        expand = lambda a: jnp.repeat(a, QK, axis=-1)
        w = c * expand(self.scales)
        if self.mins is not None:
            w = w + expand(self.mins)
        return jnp.swapaxes(w, -1, -2).astype(dtype)


def _quant_linear_from_record(rec: TensorRecord) -> QuantLinear:
    out_f, in_f = rec.shape
    soa = unpack_soa(rec.data, rec.n_elements, rec.dtype)
    codes = soa["codes"].astype(np.int8).reshape(out_f, in_f)
    scales = soa["d"].reshape(out_f, in_f // QK)
    mins = soa.get("m")
    if mins is not None:
        mins = mins.reshape(out_f, in_f // QK)
    return QuantLinear(
        codes=jnp.asarray(codes),
        scales=jnp.asarray(scales),
        mins=None if mins is None else jnp.asarray(mins),
        qtype=int(rec.dtype),
    )
