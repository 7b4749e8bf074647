"""Mixture-of-experts MLP (V-MoE) as batched one-hot GEMMs.

Beyond-reference capability (the reference's graph is dense-only,
vit.cpp:791-894): sparse expert MLPs for ViT — V-MoE (Riquelme et al.,
NeurIPS 2021) — built the TPU way:

- routing, dispatch, and combine are expressed as batched one-hot GEMMs
  on the MXU; no gather/scatter ever touches the (B, T, h) activations
  (the ToMe merge-matrix lesson, docs/TUNING.md "ToMe token merging":
  per-token index ops fragment XLA fusions and drag the main GEMMs);
- routing groups are per-example (the V-MoE recipe): the dispatch
  one-hot is (B, T, E*C) after summing out the k routing slots (exact —
  destination slots are unique, and the combine sums over k anyway) —
  a few MB at flagship shape — instead of the gigabytes a global
  one-hot over all B*T tokens would cost; slot positions come from a
  strictly-triangular GEMM, not a cumsum (reduce-window measured 4.5%
  of the train step, TUNING "V-MoE");
- capacity is STATIC: C = ceil(k*T*capacity/E) rounded up to 8, so the
  whole layer is fixed-shape under jit. Overflow tokens are dropped
  deterministically in slot-major, token-order priority (GShard
  semantics) and pass through the residual unchanged (zero MLP delta);
- gates renormalize over the top-k (softmax over the k selected logits,
  Mixtral-style): with IDENTICAL experts the combine reproduces the
  dense MLP — sum_j gate_j * out == out — which makes sparse
  upcycling (Komatsuzaki et al., ICLR 2023; vit-finetune --moe)
  function-preserving at init (up to f32 reassociation in the expert
  einsums) and gives tests/test_moe.py its dense oracle.

Expert parallelism rides the existing ('data', 'model') mesh: the
stacked (E, ...) expert kernels shard E over "model"
(parallel/sharding.py), and GSPMD inserts the all-to-alls around the
expert GEMMs — the scaling-book recipe (annotate, don't hand-roll).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def moe_capacity(n_tokens: int, num_experts: int, top_k: int,
                 factor: float) -> int:
    """Static per-example expert capacity: ceil(k*T*factor/E), rounded up
    to a multiple of 8 (sublane alignment), capped at k*T (a larger
    buffer could never fill)."""
    c = math.ceil(top_k * n_tokens * factor / num_experts)
    c = -(-c // 8) * 8
    return min(c, top_k * n_tokens)


def moe_mlp(
    y: jax.Array,
    mp: Dict[str, Any],
    hp,
    act: Callable[[jax.Array], jax.Array],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One MoE MLP layer. `y` is the LN'd block input (B, T, h); `mp` is
    a single layer's params: router.kernel (h, E), fc1.kernel (E, h, m),
    fc1.bias (E, m), fc2.kernel (E, m, h), fc2.bias (E, h).

    Returns (out (B, T, h), aux) where out is the gate-weighted sum of
    the selected experts' MLP outputs (zero for capacity-dropped tokens,
    so the caller's residual add passes them through unchanged) and aux
    holds f32 training diagnostics:

    - load_balance: Switch-Transformer balance loss E * sum_e(f_e * P_e)
      (Fedus et al. 2022 eq. 4-6; == 1 at perfect balance) over top-1
      assignment fractions f and mean router probs P;
    - router_z: mean squared logsumexp of the router logits (V-MoE /
      ST-MoE z-loss — keeps logits from drifting into f32 saturation);
    - dropped_frac: fraction of (token, slot) assignments that overflowed
      expert capacity this batch.

    Serving discards aux; XLA dead-code-eliminates its ops.
    """
    b, t, h = y.shape
    e, k = hp.num_experts, hp.moe_top_k
    cap = moe_capacity(t, e, k, hp.moe_capacity)

    # Router in TRUE f32: the decision boundaries are argmax-fragile and
    # the matmul is tiny ((T, h) x (h, E) — E lanes), so precision is
    # free. HIGHEST is load-bearing on TPU — at the default precision an
    # f32 dot runs as bf16 passes, silently routing on bf16 logits.
    logits = jnp.einsum(
        "bth,he->bte",
        y.astype(jnp.float32),
        mp["router"]["kernel"].astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    vals, idx = jax.lax.top_k(logits, k)  # (B, T, k)
    gates = jax.nn.softmax(vals, axis=-1)  # renormalized over the top-k

    # Slot-major priority (GShard): every token's first choice claims
    # capacity before any token's second choice. Entries are ordered
    # [slot 0: tokens 0..T-1, slot 1: tokens 0..T-1, ...].
    idx_sm = jnp.swapaxes(idx, 1, 2).reshape(b, k * t)  # (B, kT)
    oh = jax.nn.one_hot(idx_sm, e, dtype=jnp.float32)  # (B, kT, E)
    # positions-within-expert as a strictly-lower-triangular GEMM, not a
    # cumsum: XLA lowers cumsum to reduce-window, measured 4.8 ms/step
    # (4.5%) in the bs64 MoE train profile vs ~10 us for the (kT, kT)
    # triangular matmul (TUNING "V-MoE"). HIGHEST precision keeps f32
    # exact for integer counts (values <= kT << 2^24; the TPU-default
    # bf16 passes round integers above 256).
    tri = jnp.tril(jnp.ones((k * t, k * t), jnp.float32), k=-1)
    pos_before = jnp.einsum(
        "st,bte->bse", tri, oh, precision=jax.lax.Precision.HIGHEST
    )
    posn = jnp.sum(pos_before * oh, axis=-1).astype(jnp.int32)  # (B, kT)
    keep = posn < cap
    dest = idx_sm * cap + posn  # flat (expert, slot) id

    # Dispatch one-hot — applied to activations as ONE batched GEMM per
    # direction; entries for dropped tokens are zero. The k slot copies
    # FOLD OUT of both GEMMs: y_sm[(slot, t)] == y[t] and the combine
    # sums over k anyway, so contracting with the k-summed (B, T, E*C)
    # matrices is exact — destination slots are unique per (token, slot),
    # so the sum stays 0/1 — and halves the one-hot GEMM FLOPs while
    # deleting the (B, kT, h) activation replication (a measured 5%
    # copy family in the serving profile).
    disp = jax.nn.one_hot(dest, e * cap, dtype=y.dtype)
    disp = disp * keep[..., None].astype(y.dtype)
    disp4 = disp.reshape(b, k, t, e * cap)
    xe = jnp.einsum("btc,bth->bch", disp4.sum(axis=1), y)
    xe = xe.reshape(b, e, cap, h)

    # Expert MLPs: batched over E on the MXU. Empty capacity slots run
    # garbage (bias + act of zero rows) that the combine GEMM zeroes.
    f1 = (
        jnp.einsum("bech,ehm->becm", xe, mp["fc1"]["kernel"])
        + mp["fc1"]["bias"][None, :, None, :]
    )
    f2 = (
        jnp.einsum("becm,emh->bech", act(f1), mp["fc2"]["kernel"])
        + mp["fc2"]["bias"][None, :, None, :]
    )

    # Combine = gate-weighted transpose of the dispatch one-hot, k-summed
    # (the output token sums its k experts' contributions regardless).
    gates_sm = jnp.swapaxes(gates, 1, 2).reshape(b, k, t)
    comb = (disp4 * gates_sm[..., None].astype(y.dtype)).sum(axis=1)
    out = jnp.einsum("btc,bch->bth", comb, f2.reshape(b, e * cap, h))

    probs = jax.nn.softmax(logits, axis=-1)  # (B, T, E) f32
    f_top1 = jnp.mean(
        jax.nn.one_hot(idx[..., 0], e, dtype=jnp.float32), axis=(0, 1)
    )
    p_mean = jnp.mean(probs, axis=(0, 1))
    aux = {
        "load_balance": e * jnp.sum(f_top1 * p_mean),
        "router_z": jnp.mean(
            jax.scipy.special.logsumexp(logits, axis=-1) ** 2
        ),
        "dropped_frac": 1.0 - jnp.mean(keep.astype(jnp.float32)),
    }
    return out, aux


def upcycle_params(
    params: Dict[str, Any],
    hp,
    num_experts: int,
    moe_layers: Tuple[int, ...],
    seed: int = 0,
    router_std: float = 1e-3,
) -> Dict[str, Any]:
    """Sparse upcycling (Komatsuzaki et al., ICLR 2023): turn a DENSE
    param pytree into an MoE pytree by replicating each MoE layer's
    fc1/fc2 into `num_experts` identical experts and initializing a
    near-zero random router. With renormalized top-k gating the upcycled
    model computes the dense model's function at init (identical
    experts, gates summing to 1; equal up to f32 reassociation) whenever
    capacity drops nothing — training then differentiates the experts.

    `params` must be a dense-kernel pytree (f32/bf16 fine-tune source —
    quantized serving pytrees cannot be upcycled; dequantize first).
    Returns a new pytree: blocks.fc1/fc2 restacked over the remaining
    dense layers, plus a "moe" subtree stacked over `moe_layers`.
    """
    from vit_cpp_tpu.quant.int8 import Int8Linear
    from vit_cpp_tpu.quant.qlinear import QuantLinear

    for leaf in jax.tree.leaves(
        params["blocks"],
        is_leaf=lambda x: isinstance(x, (QuantLinear, Int8Linear)),
    ):
        if isinstance(leaf, (QuantLinear, Int8Linear)):
            raise ValueError(
                "upcycling needs dense kernels — load the checkpoint "
                "unquantized (f16/f32) to fine-tune into an MoE"
            )
    n_layers = hp.num_hidden_layers
    bad = [l for l in moe_layers if not 0 <= l < n_layers]
    if bad:
        raise ValueError(f"moe layers {bad} out of range [0, {n_layers})")
    if len(set(moe_layers)) != len(moe_layers):
        raise ValueError(f"duplicate moe layers: {moe_layers}")
    if len(moe_layers) >= n_layers:
        raise ValueError(
            "at least one dense-MLP layer is required (every-layer MoE "
            "is not a V-MoE configuration)"
        )
    moe_set = set(moe_layers)
    dense_layers = [l for l in range(n_layers) if l not in moe_set]

    blocks = dict(params["blocks"])
    fc1, fc2 = blocks["fc1"], blocks["fc2"]

    def rows(node, layers):
        sel = jnp.asarray(layers, jnp.int32)
        return jax.tree.map(lambda a: a[sel], node)

    moe_order = sorted(moe_layers)
    rng = jax.random.PRNGKey(seed)

    def replicate(node):
        # (Lm, in, out) -> (Lm, E, in, out): identical experts at init
        return jax.tree.map(
            lambda a: jnp.broadcast_to(
                a[:, None], (a.shape[0], num_experts) + a.shape[1:]
            ).copy(),
            node,
        )

    moe = {
        "router": {
            "kernel": router_std
            * jax.random.normal(
                rng,
                (len(moe_order), hp.hidden_size, num_experts),
                jnp.float32,
            )
        },
        "fc1": replicate(rows(fc1, moe_order)),
        "fc2": replicate(rows(fc2, moe_order)),
    }
    blocks["fc1"] = rows(fc1, dense_layers)
    blocks["fc2"] = rows(fc2, dense_layers)
    out = dict(params)
    out["blocks"] = blocks
    out["moe"] = moe
    return out
