"""Fused multi-head attention as a Pallas TPU kernel.

TPU-native replacement for the reference's attention subgraph (KQ matmul ->
scale -> softmax -> KQV matmul -> merge, vit.cpp:848-866). ViT sequences
are short (197 tokens for /16@224, 785 for /8@224 — SURVEY.md §5
"long-context: absent by construction"), so a whole (T, T) score matrix per
head fits in VMEM (785^2 f32 ~= 2.5 MB) and the speed-of-light design is
NOT an online-softmax flash loop: one fused block per (batch, head) runs
QK^T, f32 softmax (ggml_soft_max parity, vit.cpp:856) and PV back-to-back
with zero HBM traffic for the logits.

Two entry points:

- `attention_qkv(qkv, num_heads)` — the serving path. Takes the raw
  (B, T, 3h) fused-projection output and carves per-head Q/K/V as static
  lane slices inside VMEM, writing (B, T, h) directly. This eliminates
  every transpose/reshape copy the unfused path materializes in HBM around
  the attention (q/k/v head-split transposes and the merge — pure
  bandwidth on the usual TPU bottleneck). Two kernel shapes, dispatched by
  VMEM footprint: full (T, 3h) blocks (fastest at ViT-B/16 sizes) and
  128-lane head-pair blocks (fits the scoped budget at 785 x 2304).
- `flash_attention(q, k, v)` — drop-in for ops.core.attention(impl="xla"),
  (B, H, T, D) in/out. Used by tests and any caller with pre-split heads.

No host-side padding: blocks carry the true (T, D) extents and Mosaic pads
VMEM tiles internally, so there are no padded copies of q/k/v in HBM and no
key mask is needed (every key column is real). Measured tuning history:
docs/TUNING.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _query_chunk(t: int) -> int:
    """Query-row chunk for the (qc, T) score workspace.

    t <= 256 runs unchunked. Above that, prefer the WHOLE query range when
    the f32 score matrix stays modest (t*t*4 <= ~2.5 MB): fewer, larger
    MXU dots and one softmax pass instead of several, and no degenerate
    tail chunk (785 = 3x256 + 17 left a 17-row dot per head per step —
    the B/8 profile showed the chunked kernel 2.6x over its dot floor).
    Larger sequences split into balanced halves/thirds (ceil division)
    rather than fixed 256s so the tail chunk stays full-sized.
    Env override for experiments: VIT_ATTN_QC."""
    import os as _os

    env = _os.environ.get("VIT_ATTN_QC")
    if env:
        qc = int(env)  # raises with the env text on a non-integer
        if qc < 1:
            raise ValueError(f"VIT_ATTN_QC must be >= 1, got {env!r}")
        return min(t, qc)
    if t <= 256 or t * t * 4 <= 2_500_000:
        return t
    n = -(-t * t * 4 // 2_500_000)  # chunks needed to fit the budget
    return -(-t // n)


def _env_flag(name: str) -> bool:
    """Trace-time kernel A/B knobs (docs/TUNING.md records each verdict):

    VIT_ATTN_MXUSUM — MXU-carried softmax row-sum: a ones column in a
    dead lane of each masked V copy makes the PV dot emit sum_j p_ij,
    deleting the (qc, T) VPU sum pass. Lane/pair kernels only.
    VIT_ATTN_BF16EXP — bf16 softmax weights: downcast the clamped /
    max-subtracted scores to bf16 BEFORE exp2 (2x-packed VPU passes;
    f32 row-sum). NOT bit-exact (~2^-9 weight rounding, tests bound it).
    All kernel shapes.
    VIT_ATTN_PIPE — software-pipelined instruction order: chain i+1's
    MXU score dot issues before chain i's VPU softmax + PV dot.
    Bit-exact. Lane/pair kernels only.

    All three measured NEUTRAL end-to-end (the in-model kernels hide
    their VPU work behind the masked dots — TUNING "bf16exp" section);
    they stay as opt-in experiment knobs, default off."""
    import os

    return os.environ.get(name, "0") != "0"


def _mxusum_enabled() -> bool:
    return _env_flag("VIT_ATTN_MXUSUM")


def _bf16exp_enabled() -> bool:
    return _env_flag("VIT_ATTN_BF16EXP")


def _pipe_enabled() -> bool:
    return _env_flag("VIT_ATTN_PIPE")


def _grad_pipe_enabled() -> bool:
    """Backward pair kernel's interleaved two-half schedule — default ON
    (unlike the forward pipe knob, which measured neutral): the VJP's
    VPU chain is 2x the forward's and was the one below-issued-rate
    fusion family (r3 attribution); the stage-toggled anatomy measured
    the interleave at 0.679 -> 0.552 ms/call at flagship/bs-64 shape
    (tools/attn_grad_anatomy.py, docs/TUNING.md r4). Bit-exact.
    VIT_ATTN_GRAD_PIPE=0 restores the sequential order."""
    import os

    return os.environ.get("VIT_ATTN_GRAD_PIPE", "1") != "0"


def _key_mask(t: int, kv: int | None):
    """(1, t) f32 0/1 key-column mask for token-padded serving; None when
    every key is real (the default — zero extra VPU work)."""
    if kv is None or kv >= t:
        return None
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    return (lanes < kv).astype(jnp.float32)


def _attention_qkv_xla(qkv, num_heads: int, kv: int | None = None,
                       sizes=None):
    """Composed-XLA fallback for geometries no fused kernel shape fits
    (e.g. f32 safe-softmax at T=785, where even qc=64 lane chunks exceed
    scoped VMEM — ADVICE r2 medium). Token-padded inputs (kv < T) run the
    real rows and zero-fill the pad rows' outputs. `sizes` (B, T) f32
    turns on ToMe proportional attention (softmax(z + log s))."""
    from vit_cpp_tpu.ops.core import attention

    b, t, three_h = qkv.shape
    h = three_h // 3
    d = h // num_heads
    if kv is not None and kv < t:
        o = _attention_qkv_xla(qkv[:, :kv], num_heads)
        return jnp.concatenate(
            [o, jnp.zeros((b, t - kv, h), qkv.dtype)], axis=1
        )
    qkv_s = qkv.reshape(b, t, 3, num_heads, d)
    q, k, v = (qkv_s[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    if sizes is not None:
        scale = 1.0 / (d**0.5)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale + jnp.log(sizes.astype(jnp.float32))[:, None, None, :]
        w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        o = jnp.einsum(
            "bhqk,bhkd->bhqd", w, v, preferred_element_type=jnp.float32
        ).astype(q.dtype)
    else:
        o = attention(q, k, v, impl="xla")
    return o.transpose(0, 2, 1, 3).reshape(b, t, h)


def _sdpa(q, k, v, out_dtype, fast: bool = False, kmask=None,
          bf16exp: bool = False, srow=None):
    """(T, D) f-dim attention math shared by both kernels; f32 softmax.

    The 1/sqrt(D) scale is folded into Q (T x D elements) rather than the
    (T x T) score matrix — same math, ~T/D fewer VPU multiplies — together
    with log2(e), so the softmax runs on the VPU's native exp2 without the
    per-element ln2 rescale inside exp.

    `kmask` (1, T) f32 0/1 zeroes PAD key columns (token-padded serving:
    activations run at a sublane-aligned T so the GEMMs hit their best
    MXU rate, and attention ignores the pad tokens here — the only
    cross-token op in the network).

    `srow` (1, T) f32 per-key positive weights — ToMe proportional
    attention (ops/tome.py): softmax(z + log s) realised as p*s before
    the row-sum, riding the same multiply slot as kmask. Mutually
    exclusive with kmask (pad_tokens and tome never co-occur).
    """
    scale = 1.4426950408889634 / (q.shape[-1] ** 0.5)  # log2(e)/sqrt(D)
    s = jax.lax.dot_general(
        (q.astype(jnp.float32) * scale).astype(q.dtype),
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if fast:
        # "fast" softmax: unnormalized exp2 with a constant clamp — skips
        # the (T, T) max reduce + subtract (the most expensive softmax
        # passes at ViT sizes; ~5% of the whole forward). Exact — bit-equal
        # to safe softmax up to the shared division — whenever the max
        # attention score*log2(e) <= 120, i.e. logits <= ~83; real ViT
        # attention logits top out around 50-80 even with outlier heads.
        # Beyond that the clamp ties saturated scores instead of
        # overflowing p. Opt-in via attn_impl="pallas-fast"; the parity
        # path keeps the reference's exact max-subtracted softmax.
        # (A Cauchy-Schwarz row-max bound over (T, D) was tried and is
        # overflow-proof for any input, but measured slower than the true
        # (T, T) max on v5e — norm/sqrt/scalar-broadcast lowering.)
        sc = jnp.minimum(s, 120.0)
    else:
        if kmask is not None:
            # mask PAD scores before the row max: a garbage pad score
            # above the real maximum would shift every real weight into
            # exp2 underflow (l = 0 -> NaN for a REAL row); masked, the
            # padded math is exactly the unpadded math
            s = jnp.where(kmask > 0.0, s, -1e30)
        sc = s - jnp.max(s, axis=-1, keepdims=True)
    if bf16exp:
        sc = sc.astype(jnp.bfloat16)
    p = jnp.exp2(sc)
    if kmask is not None:
        p = p * kmask.astype(p.dtype)  # pad keys: exactly zero weight
    if srow is not None:
        p = p * srow.astype(p.dtype)  # ToMe proportional attention
    l = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
    # normalize AFTER the PV matmul: divides (T, D) instead of (T, T)
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (o / l).astype(out_dtype)


def _qkv_kernel(
    x_ref, *rest, nh: int, group: int, fast: bool = False,
    kv: int | None = None, bf16exp: bool = False,
):
    """`group` batch elements per grid step: x is (G, T, 3h) — [q|k|v] x
    heads on the feature axis (timm fused-QKV order); writes all heads of
    the (G, T, h) output.

    The per-head Q/K/V carves are static lane slices of the VMEM-resident
    projection output (the in-kernel analogue of the reference's
    ggml_view_3d carves, vit.cpp:826-846) — no HBM-side head-split or
    merge transposes exist anywhere on this path. Mosaic block constraints
    force the full (T, 3h) trailing block, which also keeps VMEM usage
    flat in H. Grouping several images per step amortizes the per-step
    pipeline overhead of the grid (ViT-B/16 has B*12 small dots to issue).

    `rest` is (o_ref,) or (sizes_ref, o_ref) — sizes is a (G, 1, T) f32
    block of ToMe token sizes for proportional attention."""
    sizes_ref, o_ref = (None, rest[0]) if len(rest) == 1 else rest
    t = x_ref.shape[1]
    h = x_ref.shape[2] // 3
    d = h // nh
    # Chunk the query rows for long sequences (ViT-B/8 is 785 tokens) so
    # the (qc, T) score workspace stays inside scoped VMEM; K/V always fit
    # whole, so no online-softmax rescaling is ever needed.
    qc = _query_chunk(t)
    kmask = _key_mask(t, kv)
    for g in range(group):
        x = x_ref[g]
        srow = None if sizes_ref is None else sizes_ref[g]
        for i in range(nh):
            k = x[:, h + i * d : h + (i + 1) * d]
            v = x[:, 2 * h + i * d : 2 * h + (i + 1) * d]
            for q0 in range(0, t, qc):
                q1 = min(q0 + qc, t)
                q = x[q0:q1, i * d : (i + 1) * d]
                o_ref[g, q0:q1, i * d : (i + 1) * d] = _sdpa(
                    q, k, v, o_ref.dtype, fast=fast, kmask=kmask,
                    bf16exp=bf16exp, srow=srow,
                )


def _qkv_lane_kernel(
    q_ref, k_ref, v_ref, *rest, d: int, fast: bool,
    qc: int | None = None, pipe: bool = False, kv: int | None = None,
    mxusum: bool = False, bf16exp: bool = False,
):
    """Lane-block variant: refs are (1, T, w*128) lane blocks of the fused
    projection — w 128-lane panels, 128//d heads per panel. Smaller blocks
    than the full (T, 3h) variant at identical total HBM traffic, and the
    only shape that fits scoped VMEM at T=785 x h=768 (ViT-B/8), where the
    full-block kernel's stack is ~2x the 16 MB budget. The panel count w
    trades per-grid-step overhead against VMEM (the B/8 profile showed
    768 one-panel steps paying ~40% of kernel time in per-step overhead);
    panel carves at multiples of 128 lanes are register-aligned — free.

    Within a panel, d < 128 per-head carves would sit at 64-lane offsets —
    cross-lane relayouts on the VPU, the exact overhead the masked-pair
    kernel (_qkv_pair_kernel) removes for the full-block shape. Same fix
    here: each head's scores come from a full-width dot against a
    lane-MASKED copy of the K panel (S_s = Q_pan · (K_pan ⊙ mask_s)^T —
    the zeroed lanes annihilate the other heads' contraction terms, and a
    d-wide dot wastes the idle systolic columns anyway so the full-width
    dot is wall-clock free), and the masked-V PV terms occupy disjoint
    lanes, so their sum assembles the aligned (qc, 128) output in ONE
    aligned store. Bit-exact vs carved slices (the masked lanes contribute
    exact-zero products to the f32 accumulation).

    pipe=True software-pipelines the independent per-(panel, chunk, head)
    chains: chain i+1's MXU score dot is issued BEFORE chain i's VPU
    softmax + PV dot, giving the scheduler explicit independent MXU work
    to overlap each softmax with (the serialization named in the B/8
    profile). Bit-exact — only instruction order changes; costs one extra
    pending (qc, T) f32 score workspace.

    mxusum=True moves the softmax row-sum from the VPU to the MXU: a
    ones column planted in a DEAD (masked-out) lane of each V copy makes
    the PV dot produce sum_j p_ij alongside PV (the zeroed lanes of the
    masked copies are free carriers), deleting the (qc, T) VPU sum
    reduce — the costliest remaining softmax pass (tools/attn_anatomy).
    The (qc, 128) result is divided by its dead-lane column and the
    residue masked off. Denominator and numerator then use the SAME
    p (as cast for the dot) under one f32 MXU accumulation — numerically
    a reassociated sum vs the VPU f32 reduce (not bit-exact; same error
    scale, tests bound it).

    `rest` is (o_ref,) or (sizes_ref, o_ref) — sizes is a (1, 1, T) f32
    block of ToMe token sizes for proportional attention."""
    sizes_ref, o_ref = (None, rest[0]) if len(rest) == 1 else rest
    srow = None if sizes_ref is None else sizes_ref[0]
    t = q_ref.shape[1]
    if qc is None:
        qc = _query_chunk(t)
    nsub = 128 // d
    scale = 1.4426950408889634 / (d**0.5)  # log2(e)/sqrt(d)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    masks = [
        ((lanes >= s * d) & (lanes < (s + 1) * d)) for s in range(nsub)
    ]
    mxusum = mxusum and nsub > 1  # needs a dead lane to carry the sum
    deads = [((s + 1) * d) % 128 for s in range(nsub)]

    # One work item per (panel, query chunk, sub-head): a score dot (MXU)
    # plus a finish stage (VPU softmax, MXU PV dot, accumulate/store).
    items = []  # (key, store_slices, sub_index, qs, km, vm)
    for p0 in range(0, q_ref.shape[2], 128):
        pp = slice(p0, p0 + 128)
        q, k, v = q_ref[0, :, pp], k_ref[0, :, pp], v_ref[0, :, pp]
        if nsub == 1:
            kms, vms = [k], [v]
        else:
            kms = [k * m.astype(k.dtype) for m in masks]
            vms = [v * m.astype(v.dtype) for m in masks]
            if mxusum:
                vms = [
                    vm + (lanes == dd).astype(vm.dtype)
                    for vm, dd in zip(vms, deads)
                ]
        for q0 in range(0, t, qc):
            q1 = min(q0 + qc, t)
            qs = (q[q0:q1].astype(jnp.float32) * scale).astype(q.dtype)
            for s in range(nsub):
                items.append(
                    ((p0, q0), (q0, q1, pp), s, qs, kms[s], vms[s])
                )

    acc: dict = {}

    def start(it):
        _, _, _, qs, km, _ = it
        return jax.lax.dot_general(
            qs, km,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    kmask = _key_mask(t, kv)

    def finish(it, sm):
        key, (q0, q1, pp), s, _, _, vm = it
        if fast:
            sc = jnp.minimum(sm, 120.0)
        else:
            if kmask is not None:
                # pad scores must not win the row max (see _sdpa)
                sm = jnp.where(kmask > 0.0, sm, -1e30)
            sc = sm - jnp.max(sm, axis=-1, keepdims=True)
        if bf16exp:
            sc = sc.astype(jnp.bfloat16)
        p = jnp.exp2(sc)
        if kmask is not None:
            p = p * kmask.astype(p.dtype)
        if srow is not None:
            p = p * srow.astype(p.dtype)
        term = jax.lax.dot_general(
            p.astype(vm.dtype), vm,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if mxusum:
            dd = deads[s]
            term = (term / term[:, dd : dd + 1]) * masks[s].astype(
                jnp.float32
            )
        else:
            term = term / jnp.sum(
                p, axis=-1, keepdims=True, dtype=jnp.float32
            )
        prev = acc.pop(key, None)
        term = term if prev is None else prev + term
        if s == nsub - 1:
            o_ref[0, q0:q1, pp] = term.astype(o_ref.dtype)
        else:
            acc[key] = term

    if pipe:
        pending = None
        for it in items:
            sm = start(it)
            if pending is not None:
                finish(*pending)
            pending = (it, sm)
        finish(*pending)
    else:
        for it in items:
            finish(it, start(it))


def _attention_qkv_lane(
    qkv, num_heads, fast, interpret,
    width: int | None = None, pipe: bool | None = None,
    kv: int | None = None, mxusum: bool | None = None,
    bf16exp: bool | None = None, sizes=None,
):
    b, t, three_h = qkv.shape
    h = three_h // 3
    hb = h // 128  # lane panels per q/k/v section
    qc = _query_chunk(t)
    nsub = 128 // (h // num_heads)
    if pipe is None:
        pipe = _pipe_enabled()
    if mxusum is None:
        mxusum = _mxusum_enabled()
    if bf16exp is None:
        bf16exp = _bf16exp_enabled()

    def est(w):
        """Scoped-VMEM estimate: double-buffered in/out blocks, the f32
        (qc, T) score workspaces (safe softmax needs ~2x of fast for the
        max/subtract temporaries; pipelining holds one extra pending score
        block), and the per-panel masked K/V copies (built per unrolled
        loop iteration — scales with w). Reads the enclosing qc, which
        the chunk-shrink loop below mutates. The 13 MB threshold is
        calibrated on measured points: safe/T=785 fits at w=1 (est 12.3
        MB) and OOMs at w=3 (est 17.1, real 20.5 vs the 16 MB limit);
        fast/785 w=3 (12.1) and safe/577 w=4 (12.4) fit."""
        blocks = 2 * 4 * t * 128 * w * qkv.dtype.itemsize
        tmps = ((4 if not fast else 2) + (1 if pipe else 0)) * qc * t * 4
        masked = (
            w * 2 * nsub * t * 128 * qkv.dtype.itemsize if nsub > 1 else 0
        )
        return blocks + tmps + masked

    if width is None:
        import os as _os

        env = _os.environ.get("VIT_ATTN_LANE_W")
        if env:
            # explicit override for sweeps: must be a divisor of hb so the
            # measured width IS the requested width (silent snapping once
            # mislabeled a sweep point — ADVICE r2)
            width = int(env)  # raises with the env text on a non-integer
            if width < 1 or width > hb or hb % width:
                raise ValueError(
                    f"VIT_ATTN_LANE_W={env!r} must be a divisor of the "
                    f"panel count {hb} (sweeps must measure the width they "
                    f"claim)"
                )
        else:
            # Device sweeps: B/8 q8_0 (hb=6) w=3 best — 937.7 img/s vs
            # 914.9/919.3/923.0 for w=1/2/6; L@384 safe (hb=8) w=4 —
            # 456.6 vs 445.7 w=1. Pick the divisor of hb nearest 3
            # (ties -> larger), then shrink while the VMEM estimate says
            # it can't fit (tpu_checks caught w=3 safe/T=785 OOMing after
            # the fast-mode sweep moved the default off w=1).
            width = min(
                (w for w in range(1, hb + 1) if hb % w == 0),
                key=lambda w: (abs(w - 3), -w),
            )
            while width > 1 and est(width) > 13_000_000:
                width -= 1
                while hb % width:
                    width -= 1
    width = max(1, min(width, hb))
    while hb % width:  # panel count must tile the section evenly
        width -= 1
    # Mode/dtype-aware chunk shrink (ADVICE r2 medium): at w=1 the width
    # loop is out of levers, but the (qc, T) score workspaces still scale
    # with qc — e.g. f32 safe-softmax at T=785 sizes the score block whole
    # (est 14.7 MB) and would OOM Mosaic's scoped VMEM. Split qc into
    # balanced ceil-chunks until the estimate fits; if even qc=64 cannot
    # fit (block+masked terms dominate), signal the caller to fall back.
    # An explicit VIT_ATTN_QC override is honored verbatim (sweeps must
    # measure the chunk they claim; Mosaic errors loudly if it can't fit).
    import os as _os

    if not _os.environ.get("VIT_ATTN_QC"):
        while est(width) > 13_000_000 and qc > 64:
            n = -(-t // qc) + 1  # one more balanced chunk
            qc = -(-t // n)
        if est(width) > 13_000_000:
            return None
    wb = hb // width  # blocks per section

    def sec_spec(section):
        return pl.BlockSpec(
            (1, t, 128 * width),
            lambda i, j, s=section: (i, 0, s * wb + j),
            memory_space=pltpu.VMEM,
        )

    in_specs = [sec_spec(0), sec_spec(1), sec_spec(2)]
    operands = [qkv, qkv, qkv]
    if sizes is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, t), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(sizes.astype(jnp.float32).reshape(b, 1, t))
    return pl.pallas_call(
        functools.partial(
            _qkv_lane_kernel, d=h // num_heads, fast=fast, qc=qc, pipe=pipe,
            kv=kv, mxusum=mxusum, bf16exp=bf16exp,
        ),
        grid=(b, wb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, t, 128 * width), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * t * t * h,
            bytes_accessed=4 * b * t * h * qkv.dtype.itemsize,
            transcendentals=b * t * t * num_heads,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "group", "fast", "pair", "interpret", "pipe", "kv",
        "mxusum", "bf16exp",
    ),
)
def attention_qkv(
    qkv: jax.Array,
    num_heads: int,
    *,
    group: int | None = None,
    fast: bool = False,
    pair: bool | None = None,
    interpret: bool | None = None,
    pipe: bool | None = None,
    kv: int | None = None,
    mxusum: bool | None = None,
    bf16exp: bool | None = None,
    sizes: jax.Array | None = None,
) -> jax.Array:
    """(B, T, 3h) fused-projection output -> (B, T, h) attention output.

    `kv` (static): number of REAL tokens when the caller runs activations
    at a padded, sublane-aligned T (forward(pad_tokens=True)); the
    kernels zero the pad keys' softmax weights, the pad rows' outputs
    are garbage-but-unread.

    `sizes` (B, T) f32: ToMe merged-token counts — turns on proportional
    attention (softmax weights multiplied by the key's size before
    normalization, ops/tome.py). Mutually exclusive with `kv`."""
    if sizes is not None and kv is not None:
        raise ValueError("sizes (tome) and kv (pad_tokens) are exclusive")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if pipe is None:
        pipe = _pipe_enabled()
    if mxusum is None:
        mxusum = _mxusum_enabled()
    if bf16exp is None:
        bf16exp = _bf16exp_enabled()
    if pair is None:
        import os as _os

        pair = _os.environ.get("VIT_ATTN_PAIR", "1") != "0"
    b, t, three_h = qkv.shape
    h = three_h // 3
    if group is None:
        import os

        env = os.environ.get("VIT_ATTN_GROUP")
        if env:
            group = max(0, int(env))
        else:
            # one image per step measured fastest on v5e at 3966 img/s
            # (grouped blocks: 3861 @G=2, 3798 @G=4; lane-block head-pair
            # variant: 3692 — deeper grids pay more per-step overhead than
            # they recover in pipelining). Knob for other topologies:
            # VIT_ATTN_GROUP=N images/step, 0 = lane-block variant.
            group = 1
    lane_ok = h % 128 == 0 and 128 % (h // num_heads) == 0
    # Masked-pair kernel dispatch: d=64 geometries up to T<=600. Its VMEM
    # stack carries ViT-L/16@384 (T=577, 3.54 MB blocks — measured 467.7
    # img/s) in fast-softmax mode, but the safe softmax's extra (qc, T)
    # max/subtract temporaries push T=577 to 20.8 MB and Mosaic's stack
    # accounting blows past the 16 MB scoped limit at ViT-B/8 outright
    # (T=785: 31.8 MB). Those cases fall back to the lane-block variant
    # below, exactly as in round 1.
    pair = (
        pair
        and h // num_heads == 64
        and num_heads >= 2
        and t <= 600
        and (fast or t <= 512)
    )
    # large T x wide h: the full-block kernel's VMEM stack (~2 x in-block +
    # scores) blows the scoped budget; the lane variant is the shape that
    # fits (ViT-B/8: 785 tokens x 2304 features).
    limit = (4.5 if pair else 2) * 1024 * 1024
    big = t * three_h * qkv.dtype.itemsize > limit
    if lane_ok and (group == 0 or big):
        out = _attention_qkv_lane(
            qkv, num_heads, fast, interpret, pipe=pipe, kv=kv,
            mxusum=mxusum, bf16exp=bf16exp, sizes=sizes,
        )
        if out is not None:
            return out
        return _attention_qkv_xla(qkv, num_heads, kv=kv, sizes=sizes)
    if pair:
        kern = functools.partial(
            _qkv_pair_kernel, nh=num_heads, fast=fast, pipe=pipe, kv=kv,
            mxusum=mxusum, bf16exp=bf16exp,
        )
        group = 1
    else:
        group = max(1, group)
        while b % group:
            group -= 1
        kern = functools.partial(
            _qkv_kernel, nh=num_heads, group=group, fast=fast, kv=kv,
            bf16exp=bf16exp,
        )
    in_specs = [
        pl.BlockSpec(
            (group, t, three_h),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    operands = [qkv]
    if sizes is not None:
        in_specs.append(
            pl.BlockSpec(
                (group, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(sizes.astype(jnp.float32).reshape(b, 1, t))
    out = pl.pallas_call(
        kern,
        grid=(b // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (group, t, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * t * t * h,
            bytes_accessed=4 * b * t * h * qkv.dtype.itemsize,
            transcendentals=b * t * t * num_heads,
        ),
        interpret=interpret,
    )(*operands)
    return out


def _qkv_pair_kernel(
    x_ref, *rest, nh: int, fast: bool, pipe: bool = False,
    kv: int | None = None, mxusum: bool = False, bf16exp: bool = False,
):
    """Masked head-pair variant of _qkv_kernel for head_dim == 64.

    Every 64-lane head carve in _qkv_kernel at an odd multiple of 64 costs
    a cross-lane relayout (half the heads). Here Q/K/V are loaded as
    128-lane PAIRS (always register-aligned) and each head's scores come
    from a full-width dot against a lane-masked copy of the pair:

        S_i = Q_pair · (K_pair ⊙ mask_i)^T

    — the zeroed half kills the other head's contribution, the contraction
    runs the MXU at full 128-lane width (a d=64 dot wastes half the
    systolic array, so the nominal 2x FLOPs are wall-clock free), and the
    (T, 128) output pair stores are aligned. Two VPU mask-multiplies per
    pair replace two relayouts.

    pipe=True issues the NEXT pair's two MXU score dots before this pair's
    VPU softmax + PV dots (software pipelining over the independent
    per-pair chains — the VERDICT-r2 serialization experiment). Bit-exact:
    only instruction order changes.

    mxusum=True plants a ones column in the DEAD half of each masked V
    copy (lane d for the lo head, lane 0 for the hi head) so the PV dot
    carries sum_j p_ij alongside PV, deleting both (qc, T) VPU sum
    reduces; the (qc, 128) result is divided by its dead-lane column
    and the residue masked off (see _qkv_lane_kernel).

    `rest` is (o_ref,) or (sizes_ref, o_ref) — sizes is a (1, 1, T) f32
    block of ToMe token sizes for proportional attention."""
    sizes_ref, o_ref = (None, rest[0]) if len(rest) == 1 else rest
    srow = None if sizes_ref is None else sizes_ref[0]
    t = x_ref.shape[1]
    h = x_ref.shape[2] // 3
    d = h // nh
    x = x_ref[0]
    qc = _query_chunk(t)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * d), 1)
    mask_lo = (lanes < d).astype(x.dtype)
    mask_hi = (lanes >= d).astype(x.dtype)
    ones_lo = (lanes == d).astype(x.dtype)  # dead lane for the lo head
    ones_hi = (lanes == 0).astype(x.dtype)  # dead lane for the hi head
    scale = 1.4426950408889634 / (d**0.5)

    def raw_scores(qp, kp):
        return jax.lax.dot_general(
            qp,
            kp,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    kmask = _key_mask(t, kv)

    def softmax(s):
        if fast:
            s = jnp.minimum(s, 120.0)
        else:
            if kmask is not None:
                # pad scores must not win the row max (see _sdpa)
                s = jnp.where(kmask > 0.0, s, -1e30)
            s = s - jnp.max(s, axis=-1, keepdims=True)
        if bf16exp:
            s = s.astype(jnp.bfloat16)  # 2x-packed VPU exp2 (opt-in)
        return jnp.exp2(s)

    # one item per (head pair, query chunk): start = the two MXU score
    # dots; finish = softmax (VPU) + the two PV dots + aligned pair store
    items = []
    for i in range(0, nh - 1, 2):
        kp = x[:, h + i * d : h + (i + 2) * d]
        vp = x[:, 2 * h + i * d : 2 * h + (i + 2) * d]
        k_lo, k_hi = kp * mask_lo, kp * mask_hi
        v_lo, v_hi = vp * mask_lo, vp * mask_hi
        if mxusum:
            v_lo, v_hi = v_lo + ones_lo, v_hi + ones_hi
        for q0 in range(0, t, qc):
            q1 = min(q0 + qc, t)
            qp = (x[q0:q1, i * d : (i + 2) * d].astype(jnp.float32) * scale).astype(
                x.dtype
            )
            items.append((i, q0, q1, qp, k_lo, k_hi, v_lo, v_hi))

    def start(it):
        _, _, _, qp, k_lo, k_hi, _, _ = it
        return raw_scores(qp, k_lo), raw_scores(qp, k_hi)

    def finish(it, s_pair):
        i, q0, q1, _, _, _, v_lo, v_hi = it
        p_lo, p_hi = softmax(s_pair[0]), softmax(s_pair[1])
        if kmask is not None:
            km = kmask.astype(p_lo.dtype)
            p_lo, p_hi = p_lo * km, p_hi * km
        if srow is not None:
            sw = srow.astype(p_lo.dtype)
            p_lo, p_hi = p_lo * sw, p_hi * sw
        # normalize AFTER PV, on (qc, 128) instead of (qc, T); the
        # masked V halves make the two normalized terms disjoint on
        # the lane axis, so the sum assembles the aligned output pair
        t_lo = jax.lax.dot_general(
            p_lo.astype(x.dtype),
            v_lo,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t_hi = jax.lax.dot_general(
            p_hi.astype(x.dtype),
            v_hi,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if mxusum:
            o_pair = (t_lo / t_lo[:, d : d + 1]) * mask_lo.astype(
                jnp.float32
            ) + (t_hi / t_hi[:, 0:1]) * mask_hi.astype(jnp.float32)
        else:
            o_pair = t_lo / jnp.sum(
                p_lo, axis=-1, keepdims=True, dtype=jnp.float32
            ) + t_hi / jnp.sum(
                p_hi, axis=-1, keepdims=True, dtype=jnp.float32
            )
        o_ref[0, q0:q1, i * d : (i + 2) * d] = o_pair.astype(o_ref.dtype)

    if pipe:
        pending = None
        for it in items:
            s_pair = start(it)
            if pending is not None:
                finish(*pending)
            pending = (it, s_pair)
        finish(*pending)
    else:
        for it in items:
            finish(it, start(it))
    if nh % 2:  # odd head count (ViT-tiny nh=3): last head the plain way
        i = nh - 1
        k = x[:, h + i * d : h + (i + 1) * d]
        v = x[:, 2 * h + i * d : 2 * h + (i + 1) * d]
        for q0 in range(0, t, qc):
            q1 = min(q0 + qc, t)
            q = x[q0:q1, i * d : (i + 1) * d]
            o_ref[0, q0:q1, i * d : (i + 1) * d] = _sdpa(
                q, k, v, o_ref.dtype, fast=fast, kmask=kmask,
                bf16exp=bf16exp, srow=srow,
            )


# NOTE (kernels research record, r2): a fused attention+proj+residual
# kernel was built here — per-head outputs fed MXU dots against (64, h)
# proj-weight rows instead of 64-offset VMEM stores, and the (B, T, h)
# attention output never touched HBM. Measured SLOWER on both flagship
# configs (Q8_0 W8A8 4,495 vs 4,810; bf16 dense 3,507 vs 4,188): moving
# the proj GEMM in-kernel forfeits the int8 MXU rate (W8A8) and the d=64
# contraction ran at half MXU width (bf16), costing more than the o-tensor
# round trip saved. Deleted; the masked head-pair kernel above recovers
# the relayout overhead without touching the proj GEMM (docs/TUNING.md).


def _qkv_grad_kernel(x_ref, do_ref, *rest, nh: int):
    """Backward of the fused-QKV attention: one batch element per grid
    step; x is the (1, T, 3h) projection block, do the (1, T, h) output
    cotangent, dx the (1, T, 3h) input cotangent.

    Everything lives in VMEM: scores are RECOMPUTED from x (one extra
    QK^T per head — MXU time, not HBM), so the (T, T) probability and
    score-grad matrices never exist in HBM in either direction. The XLA
    attention backward materializes S, P and dS per layer per direction —
    at ViT-B/16 batch 32 that is ~180 MB of HBM round trips per layer
    that this kernel deletes. Safe softmax only (training is the parity
    graph). Per-head math lives in _qkv_grad_head (shared with the pair
    kernel's odd-head tail).

    `rest` is (dx_ref,) or (sizes_ref, dx_ref) — sizes is a (1, 1, T) f32
    block of ToMe token sizes: the recomputed probabilities get the same
    per-key proportional weighting as the forward (p * s before the row
    sum); the bias is constant wrt q/k/v so every cotangent formula is
    unchanged (vit-finetune --tome trains on this kernel)."""
    sizes_ref, dx_ref = (None, rest[0]) if len(rest) == 1 else rest
    srow = None if sizes_ref is None else sizes_ref[0]  # (1, T)
    h = x_ref.shape[2] // 3
    d = h // nh
    x = x_ref[0]
    do = do_ref[0]
    for i in range(nh):
        _qkv_grad_head(x, do, dx_ref, i, h, d, srow=srow)

def _qkv_grad_pair_kernel(
    x_ref, do_ref, *rest, nh: int, pipe: bool = True
):
    """Masked head-pair variant of _qkv_grad_kernel for head_dim == 64.

    Per-head d=64 carves at odd 64-lane offsets are cross-lane relayouts
    (the exact overhead the forward pair kernel removes); here Q/K/V/dO
    load as aligned 128-lane PAIRS and every per-head contraction runs
    full-width against a lane-MASKED copy — the zeroed half contributes
    exact-zero products, the idle systolic columns make the 2x nominal
    FLOPs wall-clock free, and dq/dk/dv pair stores are aligned.
    Bit-exact vs the carve kernel (tested). `rest` as in
    _qkv_grad_kernel: optional (1, 1, T) ToMe sizes weight the
    recomputed probabilities per key."""
    sizes_ref, dx_ref = (None, rest[0]) if len(rest) == 1 else rest
    srow = None if sizes_ref is None else sizes_ref[0]  # (1, T)
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

    for i in range(0, nh - 1, 2):
        qp = x[:, i * d : (i + 2) * d]
        kp = x[:, h + i * d : h + (i + 2) * d]
        vp = x[:, 2 * h + i * d : 2 * h + (i + 2) * d]
        dop = do[:, i * d : (i + 2) * d]
        qs = (qp.astype(jnp.float32) * scale).astype(x.dtype)
        if pipe:
            # interleave the two mask-halves' dependent chains stage by
            # stage, handing Mosaic independent MXU work during every
            # VPU pass (softmax, dsoftmax). The forward pipe knob
            # measured neutral (its VPU chain hides behind the dots)
            # but the backward's VPU chain is 2x longer and was the one
            # below-rate fusion family: the stage-toggled anatomy
            # (tools/attn_grad_anatomy.py, r4) measured 0.679 -> 0.552
            # ms/call (56.2 -> 69.1 issued TFLOP/s, vs the 5-dot
            # dotsonly floor at 81.2). Bit-exact: each half's math and
            # the lo-then-hi accumulation order are unchanged.
            kms = (kp * m_lo, kp * m_hi)
            qms = (qp * m_lo, qp * m_hi)
            doms = (dop * m_lo, dop * m_hi)
            ss = [dot(qs, km, ((1,), (1,))) for km in kms]
            pns = []
            for s in ss:
                p = jnp.exp2(s - jnp.max(s, axis=-1, keepdims=True))
                if srow is not None:
                    p = p * srow.astype(p.dtype)
                pns.append(p / jnp.sum(p, axis=-1, keepdims=True))
            dvs = [
                dot(pn.astype(x.dtype), dom, ((0,), (0,)))
                for pn, dom in zip(pns, doms)
            ]
            dps = [dot(dom, vp, ((1,), (1,))) for dom in doms]
            dss = []
            for pn, dp in zip(pns, dps):
                r = jnp.sum(dp * pn, axis=-1, keepdims=True)
                dss.append((pn * (dp - r)).astype(x.dtype))
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
                s = dot(qs, km, ((1,), (1,)))  # masked K kills the other head
                p = jnp.exp2(s - jnp.max(s, axis=-1, keepdims=True))
                if srow is not None:
                    p = p * srow.astype(p.dtype)
                pn = p / jnp.sum(p, axis=-1, keepdims=True)
                pnc = pn.astype(x.dtype)
                dv = dot(pnc, dom, ((0,), (0,)))  # lanes of the masked half
                dp = dot(dom, vp, ((1,), (1,)))  # masked dO kills hi-lane terms
                r = jnp.sum(dp * pn, axis=-1, keepdims=True)
                ds = (pn * (dp - r)).astype(x.dtype)
                dq = dot(ds, km, ((1,), (0,))) * nat
                dk = dot(ds, qm, ((0,), (0,))) * nat
                if dq_pair is None:
                    dq_pair, dk_pair, dv_pair = dq, dk, dv
                else:
                    dq_pair, dk_pair, dv_pair = (
                        dq_pair + dq,
                        dk_pair + dk,
                        dv_pair + dv,
                    )
        dx_ref[0, :, i * d : (i + 2) * d] = dq_pair.astype(dx_ref.dtype)
        dx_ref[0, :, h + i * d : h + (i + 2) * d] = dk_pair.astype(dx_ref.dtype)
        dx_ref[0, :, 2 * h + i * d : 2 * h + (i + 2) * d] = dv_pair.astype(
            dx_ref.dtype
        )
    if nh % 2:  # odd head count: last head the plain carve way
        i = nh - 1
        _qkv_grad_head(x, do, dx_ref, i, h, d, srow=srow)


def _qkv_grad_head(x, do, dx_ref, i, h, d, srow=None):
    """One head's backward by direct carves (shared by the carve kernel
    and the pair kernel's odd-head tail). `srow` (1, T): optional ToMe
    proportional-attention key weights applied to the recomputed
    probabilities (matches the forward's p * s placement)."""
    scale = 1.4426950408889634 / (d**0.5)
    nat = 1.0 / (d**0.5)
    q = x[:, i * d : (i + 1) * d]
    k = x[:, h + i * d : h + (i + 1) * d]
    v = x[:, 2 * h + i * d : 2 * h + (i + 1) * d]
    do_h = do[:, i * d : (i + 1) * d]
    s = jax.lax.dot_general(
        (q.astype(jnp.float32) * scale).astype(q.dtype),
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = jnp.exp2(s - jnp.max(s, axis=-1, keepdims=True))
    if srow is not None:
        p = p * srow.astype(p.dtype)
    pn = p / jnp.sum(p, axis=-1, keepdims=True)
    dv = jax.lax.dot_general(
        pn.astype(x.dtype), do_h,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do_h, v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    r = jnp.sum(dp * pn, axis=-1, keepdims=True)
    ds = (pn * (dp - r)).astype(x.dtype)
    dq = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * nat
    dk = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * nat
    dx_ref[0, :, i * d : (i + 1) * d] = dq.astype(dx_ref.dtype)
    dx_ref[0, :, h + i * d : h + (i + 1) * d] = dk.astype(dx_ref.dtype)
    dx_ref[0, :, 2 * h + i * d : 2 * h + (i + 1) * d] = dv.astype(dx_ref.dtype)


def _qkv_grad_lane_kernel(
    q_ref, k_ref, v_ref, do_ref, *rest, d: int
):
    """Lane-block backward: refs are (1, T, w*128) panels of the q/k/v
    sections plus the matching dO / dQ / dK / dV panels. The same
    head-locality that makes the forward lane kernel possible holds for
    every backward contraction (dQ, dK, dV of a head touch only that
    head's lanes), so large T x wide h geometries (ViT-B/8, ViT-L@384)
    train on the fused VJP instead of the composed-XLA fallback. Query
    chunking bounds the (qc, T) score/grad workspaces; per-head carves
    use the masked full-width trick of the pair/lane kernels
    (exact-zero products, aligned stores).

    `rest` is (dq, dk, dv) refs, optionally preceded by a (1, 1, T) f32
    ToMe sizes block weighting the recomputed probabilities per key."""
    sizes_ref = rest[0] if len(rest) == 4 else None
    dq_ref, dk_ref, dv_ref = rest[-3:]
    srow = None if sizes_ref is None else sizes_ref[0]  # (1, T)
    t = q_ref.shape[1]
    qc = _grad_query_chunk(t)
    nsub = 128 // d
    scale = 1.4426950408889634 / (d**0.5)
    nat = 1.0 / (d**0.5)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    masks = [((lanes >= s * d) & (lanes < (s + 1) * d)) for s in range(nsub)]

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    for p0 in range(0, q_ref.shape[2], 128):
        pp = slice(p0, p0 + 128)
        q, k, v = q_ref[0, :, pp], k_ref[0, :, pp], v_ref[0, :, pp]
        do = do_ref[0, :, pp]
        dk_acc = jnp.zeros((t, 128), jnp.float32)
        dv_acc = jnp.zeros((t, 128), jnp.float32)
        sub = (
            [(None, k, v)]
            if nsub == 1
            else [(m.astype(q.dtype), None, None) for m in masks]
        )
        for q0 in range(0, t, qc):
            q1 = min(q0 + qc, t)
            qch = (q[q0:q1].astype(jnp.float32) * scale).astype(q.dtype)
            doch = do[q0:q1]
            dq_acc = None
            for m, _, _ in sub:
                km = k if m is None else k * m
                vm = v if m is None else v * m
                dom = doch if m is None else doch * m
                qm = q[q0:q1] if m is None else q[q0:q1] * m
                s = dot(qch if m is None else qch * m, km, ((1,), (1,)))
                p = jnp.exp2(s - jnp.max(s, axis=-1, keepdims=True))
                if srow is not None:
                    p = p * srow.astype(p.dtype)
                pn = p / jnp.sum(p, axis=-1, keepdims=True)
                pnc = pn.astype(q.dtype)
                dv_acc = dv_acc + dot(pnc, dom, ((0,), (0,)))
                dp = dot(dom, vm, ((1,), (1,)))
                r = jnp.sum(dp * pn, axis=-1, keepdims=True)
                ds = (pn * (dp - r)).astype(q.dtype)
                dq = dot(ds, km, ((1,), (0,))) * nat
                dk_acc = dk_acc + dot(ds, qm, ((0,), (0,))) * nat
                dq_acc = dq if dq_acc is None else dq_acc + dq
            dq_ref[0, q0:q1, pp] = dq_acc.astype(dq_ref.dtype)
        dk_ref[0, :, pp] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0, :, pp] = dv_acc.astype(dv_ref.dtype)


def _attention_qkv_grad_lane(
    qkv, do, num_heads: int, interpret: bool, sizes=None
):
    b, t, three_h = qkv.shape
    h = three_h // 3
    hb = h // 128
    d = h // num_heads
    # one panel per step: the backward's (qc, T) f32 workspaces already
    # dominate VMEM at the geometries this kernel exists for
    wb = hb

    def sec_spec(section):
        return pl.BlockSpec(
            (1, t, 128),
            lambda i, j, s=section: (i, 0, s * wb + j),
            memory_space=pltpu.VMEM,
        )

    out_spec = pl.BlockSpec(
        (1, t, 128), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    in_specs = [sec_spec(0), sec_spec(1), sec_spec(2), out_spec]
    operands = [qkv, qkv, qkv, do]
    if sizes is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, t), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(sizes.astype(jnp.float32).reshape(b, 1, t))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_qkv_grad_lane_kernel, d=d),
        grid=(b, hb),
        in_specs=in_specs,
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((b, t, h), qkv.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * t * t * h,
            bytes_accessed=8 * b * t * h * qkv.dtype.itemsize,
            transcendentals=b * t * t * num_heads,
        ),
        interpret=interpret,
    )(*operands)
    return jnp.concatenate([dq, dk, dv], axis=-1)


def _grad_query_chunk(t: int) -> int:
    """Query chunk for the lane BACKWARD: five (qc, T) f32 workspaces
    (s, p, dp, ds + softmax temporaries) live at once vs the forward's
    two, so cap their sum at ~8 MB with balanced ceil-split chunks."""
    qc = _query_chunk(t)
    limit = max(1, 8_000_000 // (5 * 4 * t))
    if qc > limit:
        n = -(-t // limit)
        qc = -(-t // n)
    return qc


def _grad_plan(t: int, h: int, d: int, itemsize: int):
    """Which backward kernel fits scoped VMEM: 'full' (one (T, 3h)
    block), 'lane' (128-lane panels + query chunking), or None (composed
    XLA ops own the backward)."""
    full = 4 * (2 * t * 3 * h + t * h) + 5 * 4 * t * t
    if d == 64:
        full += 8 * t * 128 * 4  # pair variant's extra masked buffers
    if full <= 13_000_000:
        return "full"
    if h % 128 == 0 and 128 % d == 0:
        qc = _grad_query_chunk(t)
        lane = (
            5 * qc * t * 4  # score/grad workspaces
            + 2 * 7 * t * 128 * itemsize  # double-buffered in/out panels
            + 2 * t * 128 * 4  # dk/dv f32 accumulators
            + 4 * t * 128 * itemsize  # masked copies
        )
        if lane <= 13_000_000:
            return "lane"
    return None


def _attention_qkv_grad(
    qkv,
    do,
    num_heads: int,
    interpret: bool | None = None,
    pair: bool | None = None,
    pipe: bool | None = None,
    sizes=None,
):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, three_h = qkv.shape
    h = three_h // 3
    if _grad_plan(t, h, h // num_heads, qkv.dtype.itemsize) == "lane":
        return _attention_qkv_grad_lane(
            qkv, do, num_heads, interpret, sizes=sizes
        )
    if pair is None:
        import os as _os

        pair = (
            _os.environ.get("VIT_ATTN_GRAD_PAIR", "1") != "0"
            and h // num_heads == 64
            and num_heads >= 2
        )
    if pipe is None:
        pipe = _grad_pipe_enabled()
    kern = (
        functools.partial(_qkv_grad_pair_kernel, pipe=pipe)
        if pair
        else _qkv_grad_kernel
    )
    in_specs = [
        pl.BlockSpec(
            (1, t, three_h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, t, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    ]
    operands = [qkv, do]
    if sizes is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(sizes.astype(jnp.float32).reshape(b, 1, t))
    return pl.pallas_call(
        functools.partial(kern, nh=num_heads),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, t, three_h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, three_h), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * t * t * h,
            bytes_accessed=8 * b * t * h * qkv.dtype.itemsize,
            transcendentals=b * t * t * num_heads,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _attention_qkv_cv(qkv, num_heads: int, sizes=None):
    return attention_qkv(qkv, num_heads, fast=False, sizes=sizes)


def _attention_qkv_cv_fwd(qkv, num_heads: int, sizes=None):
    # residual = the projection output itself; the backward recomputes
    # scores in VMEM (recompute costs one QK^T dot; saving P would cost a
    # (B, nh, T, T) HBM tensor — the thing this kernel family exists to
    # avoid)
    return _attention_qkv_cv(qkv, num_heads, sizes), (qkv, sizes)


def _attention_qkv_cv_bwd(num_heads: int, res, do):
    qkv, sizes = res
    dqkv = _attention_qkv_grad(qkv, do, num_heads, sizes=sizes)
    # sizes derive from stop_gradient'd ToMe matching (ops/tome.py):
    # their true cotangent through the upstream graph is zero by
    # construction, so a zero cotangent here is exact, not an
    # approximation
    dsizes = None if sizes is None else jnp.zeros_like(sizes)
    return (dqkv, dsizes)


_attention_qkv_cv.defvjp(_attention_qkv_cv_fwd, _attention_qkv_cv_bwd)


def attention_qkv_train(
    qkv: jax.Array, num_heads: int, sizes: jax.Array | None = None
) -> jax.Array:
    """Differentiable fused attention for the training path.

    Forward = the serving kernel (safe softmax); backward = a Pallas
    kernel that recomputes scores in VMEM — neither direction
    materializes a (B, nh, T, T) tensor in HBM. Kernel shape by VMEM
    plan (_grad_plan): one (T, 3h) block for B/16-family geometries,
    128-lane panels with query chunking for large T x wide h (ViT-B/8's
    785 tokens, ViT-L/16@384's 577 x 3072 blocks); composed XLA ops own
    the backward only when neither fits (e.g. lane-ineligible hidden
    sizes like ViT-tiny's 192 at long T).

    `sizes` (B, T) f32: ToMe proportional attention (vit-finetune
    --tome) — the forward weights probabilities by merged-token count
    and the backward recomputes them with the same weighting; the bias
    is constant wrt q/k/v (matching is stop_gradient'd), so the kernel
    cotangent math is unchanged and sizes get a zero cotangent."""
    b, t, three_h = qkv.shape
    h = three_h // 3
    if h % num_heads:
        raise ValueError(f"hidden {h} not divisible by num_heads {num_heads}")
    d = h // num_heads
    if _grad_plan(t, h, d, qkv.dtype.itemsize) is None:
        # differentiable by construction; XLA owns the backward
        if sizes is not None:
            return _attention_qkv_xla(qkv, num_heads, sizes=sizes)
        from vit_cpp_tpu.ops.core import attention

        qkv_s = qkv.reshape(b, t, 3, num_heads, d)
        q, k, v = (qkv_s[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        o = attention(q, k, v, impl="xla")
        return o.transpose(0, 2, 1, 3).reshape(b, t, h)
    return _attention_qkv_cv(qkv, num_heads, sizes)


def _bhtd_kernel(q_ref, k_ref, v_ref, o_ref):
    """Blocks of (B, H, T, D) arrays: refs are (1, 1, T, D)."""
    o_ref[0, 0] = _sdpa(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Full (unmasked) attention over (B, H, T, D) -> (B, H, T, D)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, t, d = q.shape
    spec = pl.BlockSpec(
        (1, 1, t, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _bhtd_kernel,
        grid=(b, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * t * t * d,
            bytes_accessed=4 * b * h * t * d * q.dtype.itemsize,
            transcendentals=b * h * t * t,
        ),
        interpret=interpret,
    )(q, k, v)
