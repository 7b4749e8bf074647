"""Load-time folding of LayerNorm affines into the following matmuls.

    LN(x) @ W + b  ==  n(x) @ (gamma[:, None] * W)  +  (beta @ W + b)

where n(x) is the pure normalization. The gamma/beta elementwise pass over
every (B, T, h) activation disappears from the compiled program (the
layernorm op keeps only mean/var/rsqrt); the folded weights are computed
once at load. Applies to ln1 -> qkv, ln2 -> fc1 and the final norm -> head
(every LN in the ViT feeds exactly one matmul; the residual stream reads
the LN *input*, which folding does not touch).

Serving-mode optimization (engine fold_ln=True / bench --fold-ln): the
numerics change only by f32 re-association, but the parity path keeps the
reference op order, and export/save always uses unfolded params.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from vit_cpp_tpu.quant.int8 import Int8Linear, from_quant_linear
from vit_cpp_tpu.quant.qlinear import QuantLinear


def _fold_into(kernel, bias, gamma, beta, *, int8: bool):
    """Returns (kernel', bias') with the LN affine absorbed.

    A folded weight no longer matches its ggml block codes, so a
    QuantLinear must be re-represented: as channelwise Int8Linear when the
    caller serves on the int8 MXU path, otherwise as a DENSE kernel in the
    bias dtype — never silently switching the matmul implementation the
    caller selected (ADVICE r1)."""
    g = jnp.asarray(gamma, jnp.float32)
    bt = jnp.asarray(beta, jnp.float32)
    if isinstance(kernel, QuantLinear):
        if int8:
            kernel = from_quant_linear(kernel)
        else:
            kernel = kernel.dequantize(bias.dtype)
    if isinstance(kernel, Int8Linear):
        w = kernel.dequantize(jnp.float32)
        wf = w * g[..., :, None]
        absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
        scale = (absmax / 127.0).astype(jnp.float32)
        inv = jnp.where(scale > 0, 1.0 / scale, 0.0)
        codes = jnp.clip(jnp.round(wf * inv), -127, 127).astype(jnp.int8)
        new_kernel = Int8Linear(codes=codes, scale=scale[..., 0, :])
        new_bias = (
            jnp.einsum("...k,...kn->...n", bt, w) + bias.astype(jnp.float32)
        ).astype(bias.dtype)
        return new_kernel, new_bias
    w = kernel.astype(jnp.float32)
    wf = (w * g[..., :, None]).astype(kernel.dtype)
    new_bias = (
        jnp.einsum("...k,...kn->...n", bt, w) + bias.astype(jnp.float32)
    ).astype(bias.dtype)
    return wf, new_bias


def fold_layernorms(
    params: Dict[str, Any], mm_impl: str = "int8"
) -> Dict[str, Any]:
    """Return a new param pytree with LN affines folded; folded LN nodes
    carry scale=None/bias=None, which ops.core.layernorm compiles as pure
    normalization. `mm_impl` is the matmul path the caller serves with —
    it decides how folded QuantLinear weights are re-represented (int8
    codes for the W8A8 path, dense otherwise)."""
    int8 = mm_impl == "int8"
    p = dict(params)
    blocks = dict(params["blocks"])

    def fold_pair(ln_key, lin_key):
        ln = blocks[ln_key]
        lin = dict(blocks[lin_key])
        lin["kernel"], lin["bias"] = _fold_into(
            lin["kernel"], lin["bias"], ln["scale"], ln["bias"], int8=int8
        )
        blocks[lin_key] = lin
        blocks[ln_key] = {"scale": None, "bias": None}

    fold_pair("ln1", "qkv")
    if "moe" not in params:
        # MoE models keep ln2 real: its output feeds BOTH the router and
        # the expert fc1s (per MoE layer), and the stacked dense fc1
        # covers only the dense-MLP layers — there is no single matmul
        # to absorb the affine into (models/vit.moe_block).
        fold_pair("ln2", "fc1")
    p["blocks"] = blocks

    # The final norm feeds every classifier reading the pooled tokens:
    # the CLS head, and for DeiT-distilled pytrees also head_dist (both
    # consume the same LN output, models/vit.py forward).
    if "head" in params and "attn_pool" not in params:
        # (map-pooled models' final norm feeds the attention pool's kv —
        # not the head — so it cannot fold even when a head exists)
        for hk in (
            ("head", "head_dist") if "head_dist" in params else ("head",)
        ):
            head = dict(params[hk])
            head["kernel"], head["bias"] = _fold_into(
                head["kernel"],
                head["bias"],
                params["norm"]["scale"],
                params["norm"]["bias"],
                int8=int8,
            )
            p[hk] = head
        p["norm"] = {"scale": None, "bias": None}
    # headless encoders keep the final norm affine: there is no following
    # matmul to absorb it into (the pooled features ARE the output)
    # norm_pre (when present) is NOT foldable: its output IS the residual
    # stream entering block 0, so its affine cannot be absorbed into any
    # single downstream matmul. It stays a real LN.
    return p
