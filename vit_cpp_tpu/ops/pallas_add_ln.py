"""Fused residual-add + LayerNorm Pallas kernel.

In the unfused program every LN reads back the activation the residual add
just wrote (XLA keeps them separate fusions — the LN's mean/var reduce
can't join the add's epilogue). This kernel emits both in one pass:

    x = a + b                 (the residual sum, written for the stream)
    y = LN(x) [* gamma + beta]  (what the next matmul consumes)

saving one full (B, T, h) HBM read per LN. The forward's deferred-residual
scan (models/vit.py, ln_impl="pallas") arranges for EVERY layernorm to sit
after a pending residual add so all 2L+0 of them take this path. 3-D
blocks, no host reshapes (see docs/TUNING.md on retiling copies).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _add_ln_kernel(a_ref, b_ref, g_ref, bt_ref, x_ref, y_ref, *, eps: float):
    x = a_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    x_ref[...] = x.astype(x_ref.dtype)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    if g_ref is not None:
        y = y * g_ref[...].astype(jnp.float32) + bt_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def add_ln(
    a: jax.Array,
    b: jax.Array,
    gamma,
    beta,
    eps: float,
    *,
    interpret: bool | None = None,
):
    """(B, T, K) a, b -> (x = a + b, y = LN(x)*gamma+beta), one HBM pass.

    gamma=None emits pure normalization (folded affines, models/fold.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bdim, t, k = a.shape
    spec = pl.BlockSpec((1, t, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec(
        (1, 1, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    if gamma is None:

        def kern(a_ref, b_ref, x_ref, y_ref):
            _add_ln_kernel(a_ref, b_ref, None, None, x_ref, y_ref, eps=eps)

        in_specs = [spec, spec]
        operands = (a, b)
    else:
        kern = functools.partial(_add_ln_kernel, eps=eps)
        in_specs = [spec, spec, e_spec, e_spec]
        operands = (a, b, gamma.reshape(1, 1, k), beta.reshape(1, 1, k))
    return pl.pallas_call(
        kern,
        grid=(bdim,),
        in_specs=in_specs,
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((bdim, t, k), a.dtype),
            jax.ShapeDtypeStruct((bdim, t, k), a.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(*operands)
