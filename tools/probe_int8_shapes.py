"""int8 GEMM rate vs shape (VERDICT r2 #6): are the serving contractions
capped below the 1024^3 probe's 286 TOP/s by their SHAPES?

The flagship W8A8 profile pins int8 GEMMs at 15.3 ms/batch128 — ~73% of
the 394 TOP/s nominal and ~100% of the 286 TOP/s the 1024^3 XLA probe
reached. This measures the XLA int8 dot (the exact serving lowering:
int8 x int8 -> int32 with rank-1 f32 rescale fused on the output) at the
REAL serving shapes and at padded variants, so the remaining 27% is
either claimed (a better shape exists -> reshape at load time) or
documented as a shape-bound ceiling. Run on the TPU host:

    python tools/probe_int8_shapes.py
"""

from __future__ import annotations

import sys
import time

sys.path.append("/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 400


def rate(m, k, n, batch3d=None):
    """TOP/s of an int8 x int8 -> int32 (+f32 rescale) dot at (m,k,n).

    batch3d: if set, run as (batch3d, m, k) x (k, n) — the 3-D layout the
    forward actually uses on (B, T, h) activations."""
    rng = np.random.default_rng(0)
    if batch3d:
        a = jnp.asarray(
            rng.integers(-127, 127, (batch3d, m, k)), jnp.int8
        )
    else:
        a = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
    scale = jnp.asarray(rng.standard_normal((n,)).astype(np.float32)) * 1e-4

    @jax.jit
    def chain(a, b):
        def body(c, _):
            a2 = (a + c).astype(jnp.int8)
            o = jax.lax.dot_general(
                a2,
                b,
                dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            o = o.astype(jnp.float32) * scale
            # next iteration's int8 carry depends on this output
            dep = o.reshape(-1)[0] % 2
            return dep.astype(jnp.int8).reshape((1,) * a.ndim), ()

        c, _ = jax.lax.scan(
            body, jnp.zeros((1,) * a.ndim, jnp.int8), None, length=ITERS
        )
        return c.astype(jnp.float32).sum()

    float(chain(a, b))  # compile + warm
    t0 = time.perf_counter()
    float(chain(a, b))
    dt = time.perf_counter() - t0
    ops = 2 * (batch3d or 1) * m * k * n * ITERS
    return ops / dt / 1e12


def main():
    print("devices:", jax.devices())
    B, T, H = 128, 197, 768
    shapes = [
        # label, m, k, n, batch3d
        ("probe 1024^3 (r1 reference point)", 1024, 1024, 1024, None),
        ("qkv  (B*T, 768)x(768, 2304) flat", B * T, H, 3 * H, None),
        ("proj (B*T, 768)x(768, 768)  flat", B * T, H, H, None),
        ("fc1  (B*T, 768)x(768, 3072) flat", B * T, H, 4 * H, None),
        ("fc2  (B*T, 3072)x(3072, 768) flat", B * T, 4 * H, H, None),
        ("qkv  3-D (128, 197, 768)x(768, 2304)", T, H, 3 * H, B),
        ("fc1  3-D (128, 197, 768)x(768, 3072)", T, H, 4 * H, B),
        ("qkv  M-pad T=200 (128, 200, 768)", 200, H, 3 * H, B),
        ("qkv  M-pad T=208 (128, 208, 768)", 208, H, 3 * H, B),
        ("qkv  flat M-pad (25344, 768)", 25344, H, 3 * H, None),
        ("fc2  K-pad (B*T, 3072+0)x bigger-N", B * T, 4 * H, 1024, None),
        ("square-ish big (4096, 768)x(768, 2304)", 4096, H, 3 * H, None),
        ("wide-N (B*T, 768)x(768, 4096)", B * T, H, 4096, None),
    ]
    for label, m, k, n, b3 in shapes:
        try:
            r = rate(m, k, n, b3)
            print(f"{label:45s} {r:7.1f} TOP/s")
        except Exception as e:
            print(f"{label:45s} FAILED: {type(e).__name__}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
