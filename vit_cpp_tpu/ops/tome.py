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


def _merge_matrix(metric, sizes, r: int, n_prefix: int):
    """Batched bipartite soft matching as a merge MATRIX.

    Returns (M, sizes') where M is (B, T-r, T) f32 row-normalized merge
    weights and sizes' = S @ sizes the new per-token counts. Row layout:
    [prefix identity | kept-A one-hots (original order) | size-weighted
    B rows]. Applying x' = M @ x is then ONE batched GEMM that never
    slices, gathers, or concatenates the (B, T, h) activations — the r4
    profile measured the split/gather/concat formulation spending ~17%
    of device time in sub-1-TFLOP/s copy/slice/reshape/reduce fusions
    AND dragging the main GEMM-fusion family to 143 TFLOP/s (vs 176
    with this form) through fragmentation (docs/TUNING.md "ToMe token
    merging"); all index machinery here runs on (T, T)-scale arrays.

    metric: (B, T, d) similarity features, sizes: (B, T) f32 counts.
    Set A = even patch indices, B = odd; each A token matches its most
    similar B token; the r highest-similarity A tokens merge into their
    match (the official implementation's matching, prefix-protected).
    """
    bsz, t = sizes.shape
    tp = t - n_prefix
    ta = (tp + 1) // 2
    tb = tp // 2
    # matching is non-differentiable by design (the official
    # implementation runs bipartite_soft_matching under torch.no_grad):
    # gradients flow through the merge GEMM's weights as constants, not
    # through the similarity scores — this is what makes tome trainable
    # (vit-finetune --tome)
    metric = jax.lax.stop_gradient(metric)
    sizes = jax.lax.stop_gradient(sizes)
    m = metric[:, n_prefix:].astype(jnp.float32)
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-6)
    ma, mb = m[:, 0::2], m[:, 1::2]

    scores = jnp.einsum("bad,bcd->bac", ma, mb)  # (B, Ta, Tb) cosine
    node_max = jnp.max(scores, axis=-1)
    node_idx = jnp.argmax(scores, axis=-1)  # (B, Ta) best B partner

    # r most-similar A tokens are the merge sources
    _, src = jax.lax.top_k(node_max, r)  # (B, r) indices into A
    merged = jnp.sum(jax.nn.one_hot(src, ta, dtype=jnp.float32), axis=1)

    # unmerged A tokens, original relative order: rank kept indices first
    ar = jnp.arange(ta)
    order = jnp.argsort(jnp.where(merged > 0, ta + ar, ar), axis=-1)
    keep = order[:, : ta - r]  # (B, Ta - r)

    # structural one-hot matrix S (B, T-r, T): original column of A_i is
    # n_prefix + 2i, of B_j is n_prefix + 2j + 1
    rows_prefix = jnp.broadcast_to(
        jax.nn.one_hot(jnp.arange(n_prefix), t, dtype=jnp.float32)[None],
        (bsz, n_prefix, t),
    )
    rows_keep = jax.nn.one_hot(n_prefix + 2 * keep, t, dtype=jnp.float32)
    assign = jax.nn.one_hot(node_idx, tb, dtype=jnp.float32)
    assign = assign * merged[..., None]  # (B, Ta, Tb) merged sources only
    e_a = jax.nn.one_hot(
        n_prefix + 2 * jnp.arange(ta), t, dtype=jnp.float32
    )  # (Ta, T) constant source->column map
    scatter = jnp.einsum("xab,at->xbt", assign, e_a)  # (B, Tb, T)
    rows_b = (
        jax.nn.one_hot(
            n_prefix + 2 * jnp.arange(tb) + 1, t, dtype=jnp.float32
        )[None]
        + scatter
    )
    s_mat = jnp.concatenate([rows_prefix, rows_keep, rows_b], axis=1)

    sizes_new = jnp.einsum("bqt,bt->bq", s_mat, sizes)
    mm = s_mat * sizes[:, None, :] / sizes_new[..., None]
    return mm, sizes_new


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
    tp = x.shape[1] - n_prefix
    if r > tp // 2:
        raise ValueError(
            f"tome r={r} exceeds the {tp} patch tokens' smaller "
            "bipartite set"
        )
    mm, sizes_new = _merge_matrix(metric, sizes, r, n_prefix)
    # the ONE op that touches the activations: a batched GEMM on the MXU
    # (f32 accumulate; M cast to the activation dtype so bf16 serving
    # runs at the bf16 MXU rate — weights 0/1 on prefix+kept rows stay
    # exact through the cast)
    x_new = jnp.einsum(
        "bqt,bth->bqh",
        mm.astype(x.dtype),
        x,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return x_new, sizes_new
