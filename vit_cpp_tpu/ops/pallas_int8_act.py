"""Fused producer+quantize Pallas kernels for the W8A8 serving path.

On the int8 path every matmul input gets dynamically quantized per token.
Left to XLA, the producer (layernorm / gelu / attention output) and the
quantization (absmax reduce + round) compile to separate HBM passes; these
kernels emit int8 codes + per-token scales in the SAME pass that computes
the producer, halving the activation HBM traffic around every quantized
matmul:

    ln_quantize:    x -> normalize (f32, ggml_norm parity) [-> *g+b] -> q8
    gelu_quantize:  x -> tanh-GELU -> q8
    quantize_act:   x -> q8                     (plain, for attention out)

Outputs pair with quant.int8.int8_dot (XLA-native int8 GEMM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _quantize(y):
    """f32 (TM, K) -> int8 codes + (TM, 1) f32 scale."""
    absmax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    sx = absmax * (1.0 / 127.0)
    inv = jnp.where(sx > 0, 1.0 / sx, 0.0)
    return jnp.round(y * inv).astype(jnp.int8), sx


def _ln_quant_kernel(x_ref, g_ref, b_ref, c_ref, s_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    if g_ref is not None:
        y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    c_ref[...], s_ref[...] = _quantize(y)


def _gelu_quant_kernel(x_ref, c_ref, s_ref):
    y = jax.nn.gelu(x_ref[...].astype(jnp.float32), approximate=True)
    c_ref[...], s_ref[...] = _quantize(y)


def _quant_kernel(x_ref, c_ref, s_ref):
    c_ref[...], s_ref[...] = _quantize(x_ref[...].astype(jnp.float32))


def _call(kernel, x, n_extra, extras, interpret, block_m=512):
    """Run `kernel` over (..., K) without reshaping the operand: a host
    reshape of a (B, T, K) activation to 2-D forces a TPU retiling copy
    whenever T % 8 != 0 (and int8 retiles are worse) — measured at several
    ms per layer. Instead the grid walks the natural layout: (B,) blocks
    of (1, T, K) for 3-D inputs, row tiles for 2-D."""
    if x.ndim == 3:
        b, t, k = x.shape
        grid = (b,)
        x_spec = pl.BlockSpec(
            (1, t, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        e_spec = pl.BlockSpec(
            (1, 1, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        out_specs = (
            pl.BlockSpec((1, t, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((b, t, k), jnp.int8),
            jax.ShapeDtypeStruct((b, t, 1), jnp.float32),
        )
    else:
        m, k = x.shape
        block_m = min(block_m, _round_up(m, 32))
        grid = (pl.cdiv(m, block_m),)
        x_spec = pl.BlockSpec(
            (block_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        e_spec = pl.BlockSpec(
            (1, k), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        out_specs = (
            pl.BlockSpec((block_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((m, k), jnp.int8),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        )
    in_specs = [x_spec] + [e_spec] * n_extra
    codes, sx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(x, *extras)
    return codes, sx


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def ln_quantize(x, gamma, beta, eps: float, *, interpret: bool | None = None):
    """(..., K) -> (codes int8, (..., 1) f32 scale); LN fused with quant.

    gamma=None means the affine was folded (models/fold.py): emits pure
    normalization + quant.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, k = x.shape
    if x.ndim > 3:
        x = x.reshape(-1, x.shape[-2], k)
    if gamma is None:

        def kern(x_ref, c_ref, s_ref):
            _ln_quant_kernel(x_ref, None, None, c_ref, s_ref, eps=eps)

        codes, sx = _call(kern, x, 0, (), interpret)
    else:
        kern = functools.partial(_ln_quant_kernel, eps=eps)
        eshape = (1, k) if x.ndim == 2 else (1, 1, k)
        codes, sx = _call(
            kern,
            x,
            2,
            (gamma.reshape(eshape), beta.reshape(eshape)),
            interpret,
        )
    return codes.reshape(*lead, k), sx.reshape(*lead, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gelu_quantize(x, *, interpret: bool | None = None):
    """(..., K) -> tanh-GELU then per-token int8 quant, one pass."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, k = x.shape
    if x.ndim > 3:
        x = x.reshape(-1, x.shape[-2], k)
    codes, sx = _call(_gelu_quant_kernel, x, 0, (), interpret)
    return codes.reshape(*lead, k), sx.reshape(*lead, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_act(x, *, interpret: bool | None = None):
    """(..., K) -> per-token int8 quant."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, k = x.shape
    if x.ndim > 3:
        x = x.reshape(-1, x.shape[-2], k)
    codes, sx = _call(_quant_kernel, x, 0, (), interpret)
    return codes.reshape(*lead, k), sx.reshape(*lead, 1)
