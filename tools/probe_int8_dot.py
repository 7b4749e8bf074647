"""Feasibility probe: int8 x int8 -> int32 dot inside a Pallas kernel.

Decides whether the attention kernels can run their score/PV dots on the
int8 MXU mode (2x bf16 rate on v5e) with rank-1 rescales, the same trick
the W8A8 GEMM path uses at the XLA level. Run on the real TPU:

    python tools/probe_int8_dot.py
"""

import sys

sys.path.append("/root/repo")

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _int8_dot_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...],
        b_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _bf16_dot_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...],
        b_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def run(m=512, k=512, n=512, iters=200):
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)

    f = pl.pallas_call(
        _int8_dot_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = np.asarray(jax.jit(f)(a8, b8))
    want = np.asarray(a8, np.int32) @ np.asarray(b8, np.int32)
    ok = np.array_equal(out, want)
    print(f"int8 pallas dot: exact={ok}")

    # timing: chain to avoid dispatch noise
    @jax.jit
    def chain_int8(a, b):
        def body(c, _):
            c = f(a + c.astype(jnp.int8) * 0, b)[:, :k] * 0 + c
            return c, ()
        c0 = jnp.zeros((m, k), jnp.int32)
        c, _ = jax.lax.scan(body, c0, None, length=iters)
        return c.sum()

    bf = pl.pallas_call(
        _bf16_dot_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    a16, b16 = a8.astype(jnp.bfloat16), b8.astype(jnp.bfloat16)

    def timed(fn, *args):
        fn(*args)  # compile+warm
        t0 = time.perf_counter()
        float(fn(*args))
        return time.perf_counter() - t0

    @jax.jit
    def chain_bf16(a, b):
        def body(c, _):
            c = bf(a + c * 0, b)[:, :k] * 0 + c
            return c, ()
        c0 = jnp.zeros((m, k), jnp.float32)
        c, _ = jax.lax.scan(body, c0, None, length=iters)
        return c.sum()

    dt8 = timed(chain_int8, a8, b8)
    dt16 = timed(chain_bf16, a16, b16)
    flops = 2 * m * k * n * iters
    print(f"int8: {flops/dt8/1e12:.1f} TOP/s   bf16: {flops/dt16/1e12:.1f} TFLOP/s   ratio {dt16/dt8:.2f}x")


if __name__ == "__main__":
    print("devices:", jax.devices())
    run()
