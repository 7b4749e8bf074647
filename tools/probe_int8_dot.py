"""Feasibility probe: int8 x int8 -> int32 dot inside a Pallas kernel.

Decides whether the attention kernels can run their score/PV dots on the
int8 MXU mode (2x bf16 rate on v5e at the XLA level: 286 TOP/s probe vs
202 TFLOP/s) with rank-1 rescales. Checks exactness and the in-kernel
rate ratio. Run on the real TPU:

    python tools/probe_int8_dot.py
"""

import sys

sys.path.append("/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = K = N = 1024
ITERS = 2000


def _dot_kernel(a_ref, b_ref, o_ref, *, acc):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...],
        b_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc,
    )


def _mk(dtype, acc):
    import functools

    return pl.pallas_call(
        functools.partial(_dot_kernel, acc=acc),
        out_shape=jax.ShapeDtypeStruct((M, N), acc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def _time_chain(f, a, b, acc):
    @jax.jit
    def chain(a, b):
        def body(c, _):
            # real data dependency: the next a depends on the previous out
            a2 = a + (c[:1, :1] % 2).astype(a.dtype)
            return f(a2, b)[:, : a.shape[1]], ()

        c0 = jnp.zeros((M, K), acc)
        c, _ = jax.lax.scan(body, c0, None, length=ITERS)
        return (c.astype(jnp.float32)[0, 0] + 0.0).astype(jnp.float32)

    float(chain(a, b))  # compile + warm
    t0 = time.perf_counter()
    float(chain(a, b))
    return time.perf_counter() - t0


def run():
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)

    f8 = _mk(jnp.int8, jnp.int32)
    out = np.asarray(jax.jit(f8)(a8, b8))
    want = np.asarray(a8, np.int32) @ np.asarray(b8, np.int32)
    print(f"int8 pallas dot: exact={np.array_equal(out, want)}")

    fb = _mk(jnp.bfloat16, jnp.float32)
    dt8 = _time_chain(f8, a8, b8, jnp.int32)
    dtb = _time_chain(fb, a8.astype(jnp.bfloat16), b8.astype(jnp.bfloat16), jnp.float32)
    flops = 2 * M * K * N * ITERS
    print(
        f"in-kernel rates: int8 {flops/dt8/1e12:.0f} TOP/s | "
        f"bf16 {flops/dtb/1e12:.0f} TFLOP/s | ratio {dtb/dt8:.2f}x"
    )


if __name__ == "__main__":
    print("devices:", jax.devices())
    run()
