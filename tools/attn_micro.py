"""Attention-kernel microbench: time ONE fused-attention dispatch shape.

Iterates far faster than full-forward benches (one small program per
variant) for the B/8 serialization experiments (VERDICT r2 #1): measures
ms per attention_qkv call and the effective MXU rate of its score+PV
dots, for the sequential vs pipelined instruction orders and any
qc/width override.

    python tools/attn_micro.py --t 785 --h 768 --nh 12 --b 8 [--fast]
        [--pipe] [--group 0] [--iters 50]

The dot floor printed is nominal-FLOPs / peak (the masked full-width
kernels issue 2x nominal for d=64 heads — wall-clock free only if the
idle systolic columns really are free; the measured rate says)."""

from __future__ import annotations

import argparse
import sys
import time

sys.path.append("/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=785)
    ap.add_argument("--h", type=int, default=768)
    ap.add_argument("--nh", type=int, default=12)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--fast", action="store_true", default=True)
    ap.add_argument("--no-fast", dest="fast", action="store_false")
    ap.add_argument("--pipe", action="store_true")
    ap.add_argument("--group", type=int, default=0, help="0 = lane kernel")
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    args = ap.parse_args()

    from vit_cpp_tpu.ops.flash_attention import attention_qkv

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.standard_normal((args.b, args.t, 3 * args.h)), dtype=dtype
    )

    @jax.jit
    def chain(x):
        def body(c, _):
            x2 = x + (c * 1e-30).astype(x.dtype)
            o = attention_qkv(
                x2, args.nh, fast=args.fast, group=args.group, pipe=args.pipe
            )
            return o[0, 0, 0].astype(x.dtype), ()

        c, _ = jax.lax.scan(
            body, jnp.zeros((), x.dtype), None, length=args.iters
        )
        return c.astype(jnp.float32)

    trivial = jax.jit(lambda x: x[0, 0, 0])
    _ = np.asarray(trivial(qkv))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(trivial(qkv))
    rtt = (time.perf_counter() - t0) / 5

    _ = np.asarray(chain(qkv))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(chain(qkv))
        times.append(time.perf_counter() - t0)
    dt = max(1e-9, float(np.median(times)) - rtt)
    ms_per_call = dt / args.iters * 1e3
    nominal = 2 * 2 * args.b * args.t * args.t * args.h  # score + PV
    d = args.h // args.nh
    issued = nominal * (2 if (128 % d == 0 and d < 128) else 1)
    peak = 197e12 if args.dtype == "bf16" else 99e12
    print(
        f"t={args.t} h={args.h} b={args.b} fast={args.fast} "
        f"pipe={args.pipe} group={args.group}: {ms_per_call:.3f} ms/call  "
        f"nominal {nominal / (dt / args.iters) / 1e12:.1f} TFLOP/s "
        f"({nominal / (dt / args.iters) / peak * 100:.0f}% peak; issued-"
        f"FLOPs rate {issued / (dt / args.iters) / 1e12:.1f})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
