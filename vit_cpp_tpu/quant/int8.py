"""Channelwise int8 weights for the W8A8 MXU fast path.

The ggml block formats (quant/blocks.py) carry one scale per 32 input
elements — faithful to the reference's files, but a scale that varies along
the contraction axis cannot be factored out of a single int8 matmul. For
the TPU's int8 MXU mode (2x the bf16 FLOP rate on v5e) the serving path
requantizes Q8_0/Q4/Q5 weights once at load time to per-OUTPUT-CHANNEL
scales:

    w[k, n] ~= codes[k, n] * scale[n]        codes int8, scale f32

so the whole contraction runs as one int8 x int8 -> int32 dot and the
rescale is a rank-1 epilogue (activation scale x channel scale). The extra
quantization error on top of the block formats is small (second int8 pass
over already-8-bit-ish values); this path is selected explicitly
(mm_impl="int8"), never for the f16 parity path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from vit_cpp_tpu.quant.qlinear import QuantLinear


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Int8Linear:
    """codes: (in, out) int8; scale: (out,) f32. w = codes * scale.

    act_scale (optional, ([L,] 1, 1) f32): STATIC activation scale from
    offline calibration (quant/calibrate.py). When present, the W8A8
    matmul quantizes its input as round(x / act_scale) with no per-token
    absmax reduce — the quantize becomes a pure elementwise op that XLA
    folds into the producer, deleting one full activation read per GEMM.
    None = dynamic per-token quantization (the accuracy-safest default).
    """

    codes: jax.Array
    scale: jax.Array
    act_scale: jax.Array | None = None

    @property
    def in_features(self) -> int:
        return self.codes.shape[-2]

    @property
    def out_features(self) -> int:
        return self.codes.shape[-1]

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        return (
            self.codes.astype(jnp.float32) * self.scale[..., None, :]
        ).astype(dtype)


def channelwise_int8(w: jax.Array) -> Int8Linear:
    """Quantize a dense ([L,] in, out) weight to per-output-channel int8."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = (absmax / 127.0).astype(jnp.float32)
    inv = jnp.where(scale > 0, 1.0 / scale, 0.0)
    codes = jnp.clip(jnp.round(wf * inv), -127, 127).astype(jnp.int8)
    return Int8Linear(codes=codes, scale=scale[..., 0, :])


def from_quant_linear(ql: QuantLinear) -> Int8Linear:
    """Requantize block-scaled codes to channelwise int8 (runs once on
    device at load; never materializes f32 weights in HBM for longer than
    the conversion)."""
    return channelwise_int8(ql.dequantize(jnp.float32))


def convert_params_to_int8(params: Dict[str, Any]) -> Dict[str, Any]:
    """Rewrite a param pytree for W8A8 serving.

    QuantLinear leaves (block-quantized checkpoints) are requantized to
    channelwise int8. Dense f16/f32 kernels are dynamically quantized at
    the SAME tensor positions the reference quantizer targets (the 2-D
    `.*weight` rule, quantize.cpp:207-223): blocks.{qkv,proj,fc1,fc2} and
    the head — so mm_impl="int8" serves f16 checkpoints on the int8 MXU
    too instead of silently no-oping. patch_embed / biases / norms stay
    in the float path, as in quantized reference files.
    """
    out = dict(params)
    blocks = dict(params["blocks"])
    for name in ("qkv", "proj", "fc1", "fc2"):
        leaf = dict(blocks[name])
        k = leaf["kernel"]
        if isinstance(k, QuantLinear):
            leaf["kernel"] = from_quant_linear(k)
        elif not isinstance(k, Int8Linear):
            leaf["kernel"] = channelwise_int8(k)
        blocks[name] = leaf
    out["blocks"] = blocks
    heads = ("head", "head_dist") if "head_dist" in params else ("head",)
    for name in heads:
        if name not in params:  # headless encoder (num_classes=0)
            continue
        head = dict(params[name])
        hk = head["kernel"]
        if isinstance(hk, QuantLinear):
            head["kernel"] = from_quant_linear(hk)
        elif not isinstance(hk, Int8Linear):
            head["kernel"] = channelwise_int8(hk)
        out[name] = head
    return out


def params_have_static_scales(params: Dict[str, Any]) -> bool:
    """True when any Int8Linear leaf carries calibrated static activation
    scales (act_scale set by quant/calibrate.calibrate_act_scales) — the
    signal that an engine/artifact serves the static-scale path."""
    import jax

    return any(
        isinstance(l, Int8Linear) and l.act_scale is not None
        for l in jax.tree.leaves(
            params, is_leaf=lambda x: isinstance(x, Int8Linear)
        )
    )
