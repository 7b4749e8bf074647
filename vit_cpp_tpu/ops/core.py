"""Core forward-pass ops: layernorm, linear (dense or quantized), attention.

These are the jnp reference implementations — pure functions that XLA fuses
well on TPU. Pallas-fused variants (attention, dequantizing matmul) live in
sibling modules and are selected via the `impl` arguments; numerics contracts
here mirror the reference graph (SURVEY.md §2.1):

- layernorm = ggml_norm (f32 mean/var, eps inside rsqrt) then scale+shift
  (vit.cpp:806-813);
- GELU is the tanh approximation (ggml_gelu, vit.cpp:893);
- attention is full bidirectional softmax(QK^T/sqrt(hd))V, no masking
  (vit.cpp:848-858).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vit_cpp_tpu.quant.qlinear import QuantLinear


def layernorm(x: jax.Array, scale, bias, eps: float) -> jax.Array:
    """LayerNorm in f32 regardless of activation dtype (parity with the
    reference's f32 ggml_norm). scale=None means the affine was folded
    into the following matmul at load (models/fold.py): emit pure
    normalization only."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


def gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


def quick_gelu(x: jax.Array) -> jax.Array:
    """OpenAI CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def mlp_act(hidden_act: str):
    """Block-MLP activation for an hparams.hidden_act value."""
    if hidden_act == "quick_gelu":
        return quick_gelu
    if hidden_act == "gelu_tanh":
        return gelu_tanh
    raise ValueError(
        f"hidden_act must be gelu_tanh|quick_gelu, got {hidden_act!r}"
    )


def linear(
    x: jax.Array,
    kernel,
    bias: Optional[jax.Array] = None,
    *,
    impl: str = "xla",
    act_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """y = x @ kernel (+ bias). kernel is a dense (in, out) array, a
    QuantLinear whose codes are dequantized inside the matmul, or an
    Int8Linear running W8A8 on the int8 MXU path."""
    from vit_cpp_tpu.quant.int8 import Int8Linear

    if isinstance(kernel, Int8Linear):
        from vit_cpp_tpu.ops.pallas_int8_matmul import w8a8_matmul

        y = w8a8_matmul(x, kernel)
    elif isinstance(kernel, QuantLinear):
        from vit_cpp_tpu.ops.qmatmul import quant_matmul

        y = quant_matmul(x, kernel, impl=impl)
    else:
        if impl == "qat":
            # QAT training (quant/qat.py): the kernel was already
            # fake-quantized by fake_quant_params; simulate the W8A8
            # matmul's activation quantization here with a
            # straight-through gradient — per-token dynamic by default,
            # or the static per-tensor qdq+clip when an act_scale rides
            # the block dict (--qat-act static, inject_act_scales).
            # Named so the "dots+attn" remat policy can SAVE the qdq'd
            # activations: the backward needs them for every dW GEMM,
            # and recomputing the absmax reduce + round chain inside the
            # backward fusions is the measured QAT slowdown (TUNING
            # "Quantization-aware training")
            from jax.ad_checkpoint import checkpoint_name

            from vit_cpp_tpu.quant.qat import (
                fake_quant_act,
                fake_quant_act_static,
            )

            if act_scale is not None:
                x = fake_quant_act_static(x, act_scale)
            else:
                x = fake_quant_act(x)
            x = checkpoint_name(x, "act_q")
        y = jnp.dot(
            x, kernel.astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    impl: str = "xla",
) -> jax.Array:
    """Full (unmasked) multi-head attention.

    q, k, v: (B, heads, T, head_dim). Returns (B, heads, T, head_dim).
    Softmax runs in f32 (reference: f32 ggml_soft_max, vit.cpp:856).
    """
    if impl == "pallas":
        from vit_cpp_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
