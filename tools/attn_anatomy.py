"""Decompose the lane-kernel attention time by stage (VERDICT r2 #1).

The B/8 profile says attention runs ~1.6x over its masked-dot floor and
blames "VPU/MXU serialization between the score and PV dots"; the
pipelining experiment (VIT_ATTN_PIPE) measured NEUTRAL, so this measures
where the time actually goes: a standalone replica of the production
lane kernel (_qkv_lane_kernel's structure: w 128-lane panels, masked
full-width dots, whole-score-block chunks) with stages individually
disabled. Variants (same grid, same blocks, same stores):

    full      score dot + exp2 softmax + PV dot + /sum   (production)
    noexp     exp2 replaced by the clamp only            (VPU transcendental cost)
    nosoftmax P := S (both dots + masks, no VPU pass)    (pure dot+mask floor)
    noclamp   exp2 kept, clamp and /sum skipped          (exp2-itself cost)
    nomask    nosoftmax minus the mask multiplies        (pure dot floor)
    onedot    score dot only, stored directly            (half the MXU work)
    mxusum    full, but the softmax row-sum rides the PV dot: a ones
              column planted in a DEAD (masked-out) lane of the V copy
              makes the MXU produce sum_j p_ij alongside PV, deleting
              the (T, T) VPU sum pass; the (T, 128) result is divided
              by its dead-lane column and the residue masked off
    bf16exp   full, but exp2 runs on bf16 scores (clamp + downcast
              first); row-sum still accumulates f32 — the parked
              "halve the VPU passes" lever from the r3 anatomy

(A "bf16score" variant — the score dot EMITTING bf16 so the whole
(T, T) workspace halves — is unimplementable: Mosaic requires 32-bit
matmul accumulators ('tpu.matmul op Expected matmul acc to be 32-bit'),
so bf16exp's downcast-after-f32-dot is the narrowest legal form.)

Run on the TPU host:
    python tools/attn_anatomy.py --t 785 --h 768 --b 8 --w 3

--kernel pair replicates the masked head-PAIR kernel instead (the
flagship shape: T=197, full (T, 3h) blocks, per-pair masked full-width
dots) so the 5.2 ms-vs-3.7-floor flagship gap gets the same stage
decomposition:
    python tools/attn_anatomy.py --kernel pair --t 197 --h 768 --b 128
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.append("/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, d: int, variant: str):
    t = q_ref.shape[1]
    nsub = 128 // d
    scale = 1.4426950408889634 / (d**0.5)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    masks = [((lanes >= s * d) & (lanes < (s + 1) * d)) for s in range(nsub)]
    for p0 in range(0, q_ref.shape[2], 128):
        pp = slice(p0, p0 + 128)
        q, k, v = q_ref[0, :, pp], k_ref[0, :, pp], v_ref[0, :, pp]
        if variant == "nomask" or nsub == 1:
            kms = [k] * nsub
            vms = [v] * nsub
        else:
            kms = [k * m.astype(k.dtype) for m in masks]
            vms = [v * m.astype(v.dtype) for m in masks]
        if variant == "mxusum" and nsub > 1:
            deads = [((s + 1) * d) % 128 for s in range(nsub)]
            vms = [
                vm + (lanes == dd).astype(vm.dtype)
                for vm, dd in zip(vms, deads)
            ]
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        acc = None
        for s in range(nsub):
            sm = jax.lax.dot_general(
                qs, kms[s],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if variant == "onedot":
                term = sm[:, :128]
            else:
                if variant in ("full", "mxusum"):
                    p = jnp.exp2(jnp.minimum(sm, 120.0))
                elif variant == "bf16exp":
                    p = jnp.exp2(
                        jnp.minimum(sm, 120.0).astype(jnp.bfloat16)
                    )
                elif variant == "noclamp":
                    p = jnp.exp2(sm)  # exp2 kept, min pass skipped, no /sum
                elif variant == "noexp":
                    p = jnp.minimum(sm, 120.0)
                else:  # nosoftmax / nomask
                    p = sm
                term = jax.lax.dot_general(
                    p.astype(v.dtype), vms[s],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if variant == "full":
                    term = term / jnp.sum(p, axis=-1, keepdims=True)
                elif variant == "bf16exp":
                    term = term / jnp.sum(
                        p, axis=-1, keepdims=True, dtype=jnp.float32
                    )
                elif variant == "mxusum" and nsub > 1:
                    dd = deads[s]
                    term = (term / term[:, dd : dd + 1]) * masks[s].astype(
                        jnp.float32
                    )
            acc = term if acc is None else acc + term
        o_ref[0, :, pp] = acc.astype(o_ref.dtype)


def _pair_kernel(x_ref, o_ref, *, nh: int, variant: str):
    """Stage-toggled replica of _qkv_pair_kernel (flagship d=64 shape):
    one (1, T, 3h) block, per-pair lane-masked full-width dots."""
    t = x_ref.shape[1]
    h = x_ref.shape[2] // 3
    d = h // nh
    x = x_ref[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * d), 1)
    mask_lo = (lanes < d).astype(x.dtype)
    mask_hi = (lanes >= d).astype(x.dtype)
    scale = 1.4426950408889634 / (d**0.5)

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    for i in range(0, nh - 1, 2):
        kp = x[:, h + i * d : h + (i + 2) * d]
        vp = x[:, 2 * h + i * d : 2 * h + (i + 2) * d]
        if variant == "nomask":
            k_lo = k_hi = kp
            v_lo = v_hi = vp
        else:
            k_lo, k_hi = kp * mask_lo, kp * mask_hi
            v_lo, v_hi = vp * mask_lo, vp * mask_hi
        if variant == "mxusum":
            v_lo = v_lo + (lanes == d).astype(x.dtype)
            v_hi = v_hi + (lanes == 0).astype(x.dtype)
        qp = (x[:, i * d : (i + 2) * d].astype(jnp.float32) * scale).astype(
            x.dtype
        )
        s_lo, s_hi = dot(qp, k_lo, ((1,), (1,))), dot(qp, k_hi, ((1,), (1,)))
        if variant == "onedot":
            o_ref[0, :, i * d : (i + 2) * d] = s_lo[:, : 2 * d].astype(
                o_ref.dtype
            )
            continue

        def soft(s):
            if variant in ("full", "mxusum"):
                return jnp.exp2(jnp.minimum(s, 120.0))
            if variant == "bf16exp":
                return jnp.exp2(jnp.minimum(s, 120.0).astype(jnp.bfloat16))
            if variant == "noclamp":
                return jnp.exp2(s)
            if variant == "noexp":
                return jnp.minimum(s, 120.0)
            return s  # nosoftmax / nomask

        p_lo, p_hi = soft(s_lo), soft(s_hi)
        t_lo = dot(p_lo.astype(x.dtype), v_lo, ((1,), (0,)))
        t_hi = dot(p_hi.astype(x.dtype), v_hi, ((1,), (0,)))
        if variant == "mxusum":
            o_pair = (t_lo / t_lo[:, d : d + 1]) * mask_lo.astype(
                jnp.float32
            ) + (t_hi / t_hi[:, 0:1]) * mask_hi.astype(jnp.float32)
        elif variant in ("full", "bf16exp"):
            o_pair = t_lo / jnp.sum(
                p_lo, axis=-1, keepdims=True, dtype=jnp.float32
            ) + t_hi / jnp.sum(
                p_hi, axis=-1, keepdims=True, dtype=jnp.float32
            )
        else:  # noclamp / noexp / nosoftmax / nomask: no /sum pass
            o_pair = t_lo + t_hi
        o_ref[0, :, i * d : (i + 2) * d] = o_pair.astype(o_ref.dtype)


def run_pair_variant(qkv, variant, nh):
    b, t, three_h = qkv.shape
    h = three_h // 3
    f = pl.pallas_call(
        functools.partial(_pair_kernel, nh=nh, variant=variant),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, t, three_h), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, t, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )
    return _time_chain(lambda x: f(x), qkv)


def run_variant(qkv, variant, d, width):
    b, t, three_h = qkv.shape
    h = three_h // 3
    hb = h // 128
    wb = hb // width

    def sec_spec(section):
        return pl.BlockSpec(
            (1, t, 128 * width),
            lambda i, j, s=section: (i, 0, s * wb + j),
            memory_space=pltpu.VMEM,
        )

    f = pl.pallas_call(
        functools.partial(_kernel, d=d, variant=variant),
        grid=(b, wb),
        in_specs=[sec_spec(0), sec_spec(1), sec_spec(2)],
        out_specs=pl.BlockSpec(
            (1, t, 128 * width), lambda i, j: (i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )

    return _time_chain(lambda x: f(x, x, x), qkv)


def _time_chain(call, qkv):
    iters = 400

    @jax.jit
    def chain(x):
        def body(c, _):
            o = call(x + (c * 1e-30).astype(x.dtype))
            return o[0, 0, 0].astype(x.dtype), ()

        c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=iters)
        return c.astype(jnp.float32)

    trivial = jax.jit(lambda x: x[0, 0, 0])
    _ = np.asarray(trivial(qkv))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(trivial(qkv))
    rtt = (time.perf_counter() - t0) / 5
    _ = np.asarray(chain(qkv))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(chain(qkv))
        ts.append(time.perf_counter() - t0)
    return (max(1e-9, float(np.median(ts)) - rtt)) / iters * 1e3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=785)
    ap.add_argument("--h", type=int, default=768)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--w", type=int, default=3)
    ap.add_argument("--kernel", choices=["lane", "pair"], default="lane")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    # q/k/v passed as the same array thrice (the production lane kernel
    # reads three section views of one (B,T,3h) buffer; timing-equivalent)
    qkv = jnp.asarray(
        rng.standard_normal((args.b, args.t, 3 * args.h)), jnp.bfloat16
    )
    issued = 2 * 2 * 2 * args.b * args.t * args.t * args.h  # masked 2x
    for v in (
        "full", "mxusum", "bf16exp",
        "noclamp", "noexp", "nosoftmax", "nomask", "onedot",
    ):
        if args.kernel == "pair":
            ms = run_pair_variant(qkv, v, args.h // args.d)
        else:
            ms = run_variant(qkv, v, args.d, args.w)
        flops = issued / 2 if v == "onedot" else issued
        print(
            f"{v:10s} {ms:7.3f} ms/call   issued-dot rate "
            f"{flops / (ms / 1e3) / 1e12:6.1f} TFLOP/s"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
