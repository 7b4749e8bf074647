"""ToMe token merging — inference acceleration by shrinking T per layer.

Bolya et al., "Token Merging: Your ViT But Faster" (ICLR 2023): between
the attention and MLP halves of every block, merge the `r` most similar
token pairs, so layer l runs on T - l*r tokens. Attention cost falls
quadratically and GEMM cost linearly in the merged count, which attacks
the end-to-end time from the one direction the kernel work cannot: the
fused attention is measured at 83-86% of its issued-dot roofline and the
int8 GEMMs are K-bound (docs/TUNING.md), so fewer tokens is the remaining
lever. This is the TPU-shaped counterpart of the reference's CPU thread
scaling (vit.cpp README benchmarks sweep threads; here we sweep FLOPs).

TPU-first design decisions:
- Every shape is static: `r` is a trace-time constant, layer l's token
  count is T - l*r, and the merge itself is expressed as one-hot MXU
  matmuls plus a fixed-size argsort gather — no dynamic shapes, no
  host sync, jit/AOT-exportable like every other path.
- Merging is SIZE-WEIGHTED (the paper's "weighted average" mode) and the
  per-token size vector feeds PROPORTIONAL ATTENTION: softmax weights
  are multiplied by the key's size before normalization, exactly the
  paper's `softmax(QK^T/sqrt(d) + log s)`. The fused Pallas kernels
  already normalize after a maskable weight pass (the `kmask` machinery,
  ops/flash_attention.py), so sizes ride the same multiply.
- The bipartite matching protects ALL prefix tokens (CLS, DeiT dist,
  DINOv2 registers) by excluding them from the candidate set entirely —
  the official implementation's class-token protection (scores[0] =
  -inf + sorted unmerged indices) generalized to every prefix layout
  this repo serves. Unmerged tokens keep their original relative order
  (the official code's class-token branch does the same sort).

The reference has no counterpart (vit.cpp's graph is fixed-T by
construction); this is a beyond-reference serving feature, opt-in via
`tome=r` on the engine/CLIs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def tome_schedule(n_patches: int, num_layers: int, r: int) -> list[int]:
    """Per-layer merge counts: layer l merges min(r, remaining // 2)
    pairs (the official implementation's clamp — at most half the
    remaining patch tokens per layer, so at least one patch always
    survives)."""
    if r < 1:
        raise ValueError(f"tome r must be >= 1, got {r}")
    rs = []
    t = n_patches
    for _ in range(num_layers):
        rl = min(r, t // 2)
        rs.append(rl)
        t -= rl
    return rs


def _merge_one(x, metric, sizes, r: int):
    """Single-example bipartite soft matching + size-weighted merge.

    x: (Tp, h) patch tokens, metric: (Tp, d) similarity features (mean
    attention key over heads), sizes: (Tp,) f32 merged-token counts.
    Returns (x', sizes') with Tp - r rows. Set A = even indices,
    set B = odd indices; each A token matches its most similar B token;
    the r highest-similarity A tokens merge into their match.
    """
    tp = x.shape[0]
    ta = (tp + 1) // 2
    tb = tp // 2
    m = metric.astype(jnp.float32)
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-6)
    ma, mb = m[0::2], m[1::2]
    xa, xb = x[0::2], x[1::2]
    sa, sb = sizes[0::2], sizes[1::2]

    scores = ma @ mb.T  # (Ta, Tb) cosine similarity
    node_max = jnp.max(scores, axis=-1)
    node_idx = jnp.argmax(scores, axis=-1)  # (Ta,) best B partner

    # r most-similar A tokens are the merge sources
    _, src = jax.lax.top_k(node_max, r)  # (r,) indices into A
    merged = jnp.sum(jax.nn.one_hot(src, ta, dtype=jnp.float32), axis=0)

    # size-weighted scatter of the sources into their B destinations,
    # as one-hot MXU matmuls (static shapes; ~2*Ta*Tb*h FLOPs — <2% of
    # a block at ViT geometries)
    assign = jax.nn.one_hot(node_idx, tb, dtype=jnp.float32)  # (Ta, Tb)
    w = (merged * sa)[:, None] * assign  # (Ta, Tb) source weights
    num = sb[:, None] * xb.astype(jnp.float32) + w.T @ xa.astype(jnp.float32)
    den = sb + jnp.sum(w, axis=0)
    xb_new = (num / den[:, None]).astype(x.dtype)

    # unmerged A tokens, original relative order: rank kept indices first
    order = jnp.argsort(jnp.where(merged > 0, ta + jnp.arange(ta), jnp.arange(ta)))
    keep = order[: ta - r]
    return (
        jnp.concatenate([xa[keep], xb_new], axis=0),
        jnp.concatenate([sa[keep], den], axis=0),
    )


@functools.partial(jax.jit, static_argnames=("r", "n_prefix"))
def tome_merge(
    x: jax.Array,
    metric: jax.Array,
    sizes: jax.Array,
    r: int,
    n_prefix: int,
) -> tuple[jax.Array, jax.Array]:
    """Merge the r most similar patch-token pairs of every batch element.

    x: (B, T, h) tokens, metric: (B, T, d) similarity features, sizes:
    (B, T) f32 per-token merged counts. The first `n_prefix` tokens
    (CLS/dist/registers) are protected — never merged, never merge
    targets. Returns (x', sizes') with T - r tokens.
    """
    if r == 0:
        return x, sizes
    xp, mp, sp = x[:, n_prefix:], metric[:, n_prefix:], sizes[:, n_prefix:]
    if r > xp.shape[1] // 2:
        raise ValueError(
            f"tome r={r} exceeds the {xp.shape[1]} patch tokens' smaller "
            "bipartite set"
        )
    xn, sn = jax.vmap(lambda a, b, c: _merge_one(a, b, c, r))(xp, mp, sp)
    return (
        jnp.concatenate([x[:, :n_prefix], xn], axis=1),
        jnp.concatenate([sizes[:, :n_prefix], sn], axis=1),
    )
