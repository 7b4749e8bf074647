"""int4 MXU rate probe (VERDICT r3 next #8): does int4 double the
K-bound int8 serving rate, or inherit the pipeline-depth limit?

The int8 serving ceiling is the K=768 shallow-contraction rate (~175-210
TOP/s measured, docs/TUNING.md int8-GEMM section); v5e advertises 2x the
int8 rate for int4. This measures XLA dots at the REAL serving shapes
for every operand combination the quantizers could feed:

  - int8 x int8 -> int32 (the production W8A8 baseline, for delta)
  - int4 x int4 -> int32 (W4A4: Q4_0 weights + 4-bit activations)
  - int8 x int4 -> int32 (W4A8: Q4_0 weights, 8-bit activations)

Run on the TPU host: python tools/probe_int4.py
Productize only if the probe says int4 beats the int8 rate at the
serving shapes (Q4_0 checkpoints already exist to feed it).
"""

from __future__ import annotations

import sys
import time

sys.path.append("/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 400


def rate(m, k, n, adt, bdt):
    # I/O stays int8: int4 BUFFERS recurse in the axon plugin's host
    # transfer path (r4 repro: asarray/where/devget on an int4 array all
    # RecursionError, while an in-graph astype(int4) -> dot -> int32
    # computes fine). The conversions sit outside the timed scan.
    rng = np.random.default_rng(0)
    lo, hi = -7, 7  # int4 range (and a valid int8 subrange)
    a = jnp.asarray(rng.integers(lo, hi, (m, k)), jnp.int8)
    a_alt = jnp.asarray(rng.integers(lo, hi, (m, k)), jnp.int8)
    b = jnp.asarray(rng.integers(lo, hi, (k, n)), jnp.int8)
    scale = jnp.asarray(rng.standard_normal((n,)).astype(np.float32)) * 1e-4

    @jax.jit
    def chain(a, a_alt, b):
        ac, aac, bc = a.astype(adt), a_alt.astype(adt), b.astype(bdt)

        # loop-carried dependency via a select between two PREBUILT
        # operands (int4 scalar arithmetic recurses in dtype promotion;
        # select keeps the operand dtype untouched and un-hoistable)
        def body(c, _):
            a2 = jnp.where(c, ac, aac)
            o = jax.lax.dot_general(
                a2,
                bc,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            of = o.astype(jnp.float32) * scale
            dep = of.reshape(-1)[0] > 0
            return dep, ()

        c, _ = jax.lax.scan(body, jnp.bool_(True), None, length=ITERS)
        return c.astype(jnp.float32)

    float(chain(a, a_alt, b))  # compile + warm
    t0 = time.perf_counter()
    float(chain(a, a_alt, b))
    dt = time.perf_counter() - t0
    return 2 * m * k * n * ITERS / dt / 1e12


def main():
    print("devices:", jax.devices())
    B, T, H = 128, 197, 768
    shapes = [
        ("probe 1024^3", 1024, 1024, 1024),
        ("qkv  (B*T, 768)x(768, 2304)", B * T, H, 3 * H),
        ("fc1  (B*T, 768)x(768, 3072)", B * T, H, 4 * H),
        ("fc2  (B*T, 3072)x(3072, 768)", B * T, 4 * H, H),
    ]
    combos = [
        ("w8a8", jnp.int8, jnp.int8),
        ("w4a4", jnp.int4, jnp.int4),
        ("w4a8", jnp.int4, jnp.int8),  # weights int4 (b), acts int8 (a)
    ]
    for label, m, k, n in shapes:
        row = [f"{label:32s}"]
        for cname, wdt, adt in combos:
            try:
                r = rate(m, k, n, adt, wdt)
                row.append(f"{cname} {r:7.1f}")
            except Exception as e:
                row.append(f"{cname} FAIL:{type(e).__name__}")
        print("  ".join(row) + "  TOP/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
