"""Decompose the attention-VJP kernel time by stage (VERDICT r3 #4).

The r3 train-step attribution put the backward kernel at 64.8 issued
TFLOP/s vs the forward's 101.6 — the one below-rate family, worth ~5%
of a train step. This is the stage-toggled anatomy that settled the
forward question (tools/attn_anatomy.py), pointed at the 5-dependent-dot
VJP chain: a standalone replica of the production pair backward
(_qkv_grad_pair_kernel: per-pair lane-masked full-width dots) with
stages individually disabled, 400-call chains, tunnel RTT subtracted.

Variants (same grid, same blocks, same stores):

    full       s dot + softmax + dv/dp dots + dsoftmax + dq/dk dots
    bf16exp    softmax exp2 on bf16 scores (f32 row-sum)
    nosoftmax  pn := s                  (drops exp/max/sum/div VPU pass)
    nodsoft    ds := dp                 (drops r row-sum + pn*(dp-r))
    dotsonly   both VPU chains off      (the 5-dot floor + masks + stores)
    onedot     s dot only, stored       (1/5 of the MXU work)
    pipe       both mask-halves' chains interleaved stage-by-stage
               (s_lo+s_hi, then both softmaxes, then both dv/dp, ...) —
               gives the scheduler independent MXU work during each VPU
               pass. The forward pipe knob measured neutral; the
               backward's VPU chain is 2x longer, so re-measure.

Note the "two-kernel split" idea from the r3 verdict (dv/dp kernel +
ds->dq/dk kernel "interleaving with dW GEMMs") cannot overlap anything
on a TPU core: fusions and custom calls execute serially per core, and
a split would either re-run the s dot + softmax (7 dots total) or
round-trip (T, T) probabilities through HBM — the exact traffic the
fused design deletes. The in-kernel schedule is the only lever; this
tool measures it.

Run on the TPU host (flagship train shape):
    python tools/attn_grad_anatomy.py --t 197 --h 768 --b 64
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


def _grad_pair_kernel(x_ref, do_ref, dx_ref, *, nh: int, variant: str):
    t = x_ref.shape[1]
    h = x_ref.shape[2] // 3
    d = h // nh
    x = x_ref[0]
    do = do_ref[0]
    scale = 1.4426950408889634 / (d**0.5)
    nat = 1.0 / (d**0.5)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * d), 1)
    m_lo = (lanes < d).astype(x.dtype)
    m_hi = (lanes >= d).astype(x.dtype)

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    def softmax(s):
        if variant in ("nosoftmax", "dotsonly", "onedot"):
            return s
        if variant == "bf16exp":
            p = jnp.exp2(
                (s - jnp.max(s, axis=-1, keepdims=True)).astype(jnp.bfloat16)
            )
            return p / jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
        p = jnp.exp2(s - jnp.max(s, axis=-1, keepdims=True))
        return p / jnp.sum(p, axis=-1, keepdims=True)

    def dsoft(pn, dp):
        if variant in ("nodsoft", "dotsonly"):
            return dp.astype(x.dtype)
        r = jnp.sum(dp * pn, axis=-1, keepdims=True)
        return (pn * (dp - r)).astype(x.dtype)

    if variant == "pipe2":
        # interleave TWO head-pairs' chains (4 independent masked
        # chains): deeper MXU work per VPU pass than pipe's 2
        for i in range(0, nh - 3, 4):
            chains = []  # (qs, km, qm, vp, dom) per chain
            pair_slices = []
            for j in (i, i + 2):
                qp = x[:, j * d : (j + 2) * d]
                kp = x[:, h + j * d : h + (j + 2) * d]
                vp = x[:, 2 * h + j * d : 2 * h + (j + 2) * d]
                dop = do[:, j * d : (j + 2) * d]
                qs = (qp.astype(jnp.float32) * scale).astype(x.dtype)
                pair_slices.append(j)
                for m in (m_lo, m_hi):
                    chains.append((qs, kp * m, qp * m, vp, dop * m))
            ss = [dot(qs, km, ((1,), (1,))) for qs, km, _, _, _ in chains]
            pns = [softmax(s) for s in ss]
            dvs = [
                dot(pn.astype(x.dtype), c[4], ((0,), (0,)))
                for pn, c in zip(pns, chains)
            ]
            dps = [dot(c[4], c[3], ((1,), (1,))) for c in chains]
            dss = [dsoft(pn, dp) for pn, dp in zip(pns, dps)]
            dqs = [
                dot(ds, c[1], ((1,), (0,))) * nat for ds, c in zip(dss, chains)
            ]
            dks = [
                dot(ds, c[2], ((0,), (0,))) * nat for ds, c in zip(dss, chains)
            ]
            for pi, j in enumerate(pair_slices):
                lo, hi2 = 2 * pi, 2 * pi + 1
                dx_ref[0, :, j * d : (j + 2) * d] = (dqs[lo] + dqs[hi2]).astype(
                    dx_ref.dtype
                )
                dx_ref[0, :, h + j * d : h + (j + 2) * d] = (
                    dks[lo] + dks[hi2]
                ).astype(dx_ref.dtype)
                dx_ref[0, :, 2 * h + j * d : 2 * h + (j + 2) * d] = (
                    dvs[lo] + dvs[hi2]
                ).astype(dx_ref.dtype)
        return

    for i in range(0, nh - 1, 2):
        qp = x[:, i * d : (i + 2) * d]
        kp = x[:, h + i * d : h + (i + 2) * d]
        vp = x[:, 2 * h + i * d : 2 * h + (i + 2) * d]
        dop = do[:, i * d : (i + 2) * d]
        qs = (qp.astype(jnp.float32) * scale).astype(x.dtype)

        if variant == "pipe":
            kms = (kp * m_lo, kp * m_hi)
            qms = (qp * m_lo, qp * m_hi)
            doms = (dop * m_lo, dop * m_hi)
            ss = [dot(qs, km, ((1,), (1,))) for km in kms]
            pns = [softmax(s) for s in ss]
            pncs = [pn.astype(x.dtype) for pn in pns]
            dvs = [dot(pnc, dom, ((0,), (0,))) for pnc, dom in zip(pncs, doms)]
            dps = [dot(dom, vp, ((1,), (1,))) for dom in doms]
            dss = [dsoft(pn, dp) for pn, dp in zip(pns, dps)]
            dqs = [dot(ds, km, ((1,), (0,))) * nat for ds, km in zip(dss, kms)]
            dks = [dot(ds, qm, ((0,), (0,))) * nat for ds, qm in zip(dss, qms)]
            dq_pair = dqs[0] + dqs[1]
            dk_pair = dks[0] + dks[1]
            dv_pair = dvs[0] + dvs[1]
        else:
            dq_pair = dk_pair = dv_pair = None
            for m in (m_lo, m_hi):
                km, qm = kp * m, qp * m
                dom = dop * m
                s = dot(qs, km, ((1,), (1,)))
                if variant == "onedot":
                    dq = s[:, : 2 * d]
                    dk = dv = dq
                else:
                    pn = softmax(s)
                    pnc = pn.astype(x.dtype)
                    dv = dot(pnc, dom, ((0,), (0,)))
                    dp = dot(dom, vp, ((1,), (1,)))
                    ds = dsoft(pn, dp)
                    dq = dot(ds, km, ((1,), (0,))) * nat
                    dk = dot(ds, qm, ((0,), (0,))) * nat
                if dq_pair is None:
                    dq_pair, dk_pair, dv_pair = dq, dk, dv
                else:
                    dq_pair = dq_pair + dq
                    dk_pair = dk_pair + dk
                    dv_pair = dv_pair + dv
        dx_ref[0, :, i * d : (i + 2) * d] = dq_pair.astype(dx_ref.dtype)
        dx_ref[0, :, h + i * d : h + (i + 2) * d] = dk_pair.astype(
            dx_ref.dtype
        )
        dx_ref[0, :, 2 * h + i * d : 2 * h + (i + 2) * d] = dv_pair.astype(
            dx_ref.dtype
        )


def run_variant(qkv, do, variant, nh):
    b, t, three_h = qkv.shape
    h = three_h // 3
    f = pl.pallas_call(
        functools.partial(_grad_pair_kernel, nh=nh, variant=variant),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, t, three_h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, t, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, t, three_h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, three_h), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )

    iters = 400

    @jax.jit
    def chain(x, g):
        def body(c, _):
            o = f(x + (c * 1e-30).astype(x.dtype), g)
            return o[0, 0, 0].astype(x.dtype), ()

        c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=iters)
        return c.astype(jnp.float32)

    trivial = jax.jit(lambda x: x[0, 0, 0])
    _ = np.asarray(trivial(qkv))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(trivial(qkv))
    rtt = (time.perf_counter() - t0) / 5
    _ = np.asarray(chain(qkv, do))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(chain(qkv, do))
        ts.append(time.perf_counter() - t0)
    return (max(1e-9, float(np.median(ts)) - rtt)) / iters * 1e3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=197)
    ap.add_argument("--h", type=int, default=768)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--b", type=int, default=64)
    args = ap.parse_args()
    nh = args.h // args.d
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(
        rng.standard_normal((args.b, args.t, 3 * args.h)), jnp.bfloat16
    )
    do = jnp.asarray(
        rng.standard_normal((args.b, args.t, args.h)), jnp.bfloat16
    )
    # issued dot FLOPs: per pair, per mask half: 5 dots x 2*T*T*128
    pairs = nh // 2
    issued5 = args.b * pairs * 2 * 5 * 2 * args.t * args.t * (2 * args.d)
    for v in (
        "full", "pipe", "pipe2", "bf16exp", "nosoftmax", "nodsoft",
        "dotsonly", "onedot",
    ):
        ms = run_variant(qkv, do, v, nh)
        flops = issued5 / 5 if v == "onedot" else issued5
        print(
            f"{v:10s} {ms:7.3f} ms/call   issued-dot rate "
            f"{flops / (ms / 1e3) / 1e12:6.1f} TFLOP/s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
