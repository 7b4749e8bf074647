"""Attention-map extraction and attention rollout (interpretability).

The production forward never materializes attention probabilities (the
fused kernels keep scores in VMEM — ops/flash_attention.py), so this
module re-runs the encoder on the XLA path capturing every layer's
softmax weights, and computes the classic attention-rollout saliency
(Abnar & Zuidema, "Quantifying Attention Flow in Transformers", 2020):
per layer A = normalize(0.5 * mean_heads(P) + 0.5 * I), rolled out as
R = A_L @ ... @ A_1; the readout row's patch columns, reshaped to the
patch grid, are the input-attribution heatmap.

The reference has no equivalent surface (its graph emits logits only,
vit.cpp:718-941). This is a debug/analysis path: correctness over
throughput — it shares the block math with models/vit.py through the
same layernorm/linear/gelu ops and is tested for logit-equivalence
against the production forward (tests/test_attention_maps.py).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models.vit import embed, slice_block_params
from vit_cpp_tpu.ops.core import layernorm, linear, mlp_act


def _block_with_probs(
    x: jax.Array, bp: Dict[str, Any], hp: VitHParams
) -> Tuple[jax.Array, jax.Array]:
    """transformer_block (models/vit.py) with the attention probabilities
    returned instead of kept internal. XLA attention only — f32 softmax."""
    b, t, h = x.shape
    nh, hd = hp.num_attention_heads, hp.head_dim
    y = layernorm(x, bp["ln1"]["scale"], bp["ln1"]["bias"], hp.eps)
    qkv = linear(y, bp["qkv"]["kernel"], bp["qkv"]["bias"])
    qkv = qkv.reshape(b, t, 3, nh, hd)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    # f32 logits like ops/core.attention — a bf16 einsum would round the
    # scores to 8 mantissa bits before the softmax (review r3)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(scores * (1.0 / np.sqrt(hd)), axis=-1)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, h)
    x = x + linear(o, bp["proj"]["kernel"], bp["proj"]["bias"])
    y = layernorm(x, bp["ln2"]["scale"], bp["ln2"]["bias"], hp.eps)
    y = linear(y, bp["fc1"]["kernel"], bp["fc1"]["bias"])
    y = mlp_act(hp.hidden_act)(y)
    y = linear(y, bp["fc2"]["kernel"], bp["fc2"]["bias"])
    return x + y, probs


def attention_maps(
    params: Dict[str, Any], images: jax.Array, hp: VitHParams
) -> Tuple[jax.Array, jax.Array]:
    """(B, C, S, S) images -> ((B, L, H, T, T) f32 attention probabilities,
    (B, T, h) final block output). Python-unrolled over layers (a debug
    path; the maps dominate memory anyway: L*H*T*T f32)."""
    x = embed(params, images, hp)
    probs_all = []
    for i in range(hp.num_hidden_layers):
        bp = slice_block_params(params["blocks"], i)
        x, probs = _block_with_probs(x, bp, hp)
        probs_all.append(probs)
    return jnp.stack(probs_all, axis=1), x


def head_logits(
    params: Dict[str, Any], final: jax.Array, hp: VitHParams
) -> jax.Array:
    """The classifier-head section of models/vit.py::forward applied to a
    final block output — lets one maps forward serve both the rollout and
    the top-k print (vit-explain runs the encoder once). Classification
    heads only (vit-explain rejects sequence heads)."""
    if "head_dist" in params and hp.seq_len is None:
        pooled = layernorm(
            final[:, :2], params["norm"]["scale"], params["norm"]["bias"],
            hp.eps,
        )
        return 0.5 * (
            linear(pooled[:, 0], params["head"]["kernel"], params["head"]["bias"])
            + linear(
                pooled[:, 1],
                params["head_dist"]["kernel"],
                params["head_dist"]["bias"],
            )
        )
    if hp.global_pool == "map":
        from vit_cpp_tpu.models.vit import attention_pool

        y = layernorm(
            final, params["norm"]["scale"], params["norm"]["bias"], hp.eps
        )
        pooled = attention_pool(params["attn_pool"], y, hp)
    elif hp.global_pool == "avg":
        pooled = jnp.mean(final[:, hp.n_prefix :], axis=1)
        pooled = layernorm(
            pooled, params["norm"]["scale"], params["norm"]["bias"], hp.eps
        )
    else:
        pooled = final[:, 0]
        pooled = layernorm(
            pooled, params["norm"]["scale"], params["norm"]["bias"], hp.eps
        )
    if "head" not in params:  # headless encoder: no logits to derive
        raise ValueError(
            "checkpoint is a headless encoder — no classifier to explain; "
            "the rollout saliency is still available (attention_rollout)"
        )
    return linear(pooled, params["head"]["kernel"], params["head"]["bias"])


def attention_rollout(
    probs: jax.Array | np.ndarray,
    hp: VitHParams,
    head_fuse: str = "mean",
) -> np.ndarray:
    """(B, L, H, T, T) attention probabilities -> (B, side, side) f32
    saliency over the patch grid, normalized to max 1 per image.

    Rollout composes per-layer attention with the residual identity
    (0.5 P + 0.5 I, row-renormalized) across depth; the readout row is
    the CLS query (token-pooled models; distilled readouts average the
    CLS and dist rows) or the patch-query mean for avg-pool models.
    """
    p = np.asarray(probs, dtype=np.float32)
    if head_fuse == "mean":
        a = p.mean(axis=2)
    elif head_fuse == "max":
        a = p.max(axis=2)
    elif head_fuse == "min":
        a = p.min(axis=2)
    else:
        raise ValueError(f"head_fuse must be mean|max|min, got {head_fuse!r}")
    b, n_layers, t, _ = a.shape
    eye = np.eye(t, dtype=np.float32)
    a = 0.5 * a + 0.5 * eye
    a = a / a.sum(axis=-1, keepdims=True)
    roll = np.broadcast_to(eye, (b, t, t)).copy()
    for layer in range(n_layers):
        roll = a[:, layer] @ roll
    # readout rows: the head-semantic prefix tokens (CLS, or CLS+dist) —
    # register tokens (hp.num_reg_tokens) are never a readout; grid
    # columns start after ALL prefix tokens incl. registers
    n_readout = hp.num_prefix_tokens
    total_prefix = hp.n_prefix
    if n_readout:
        readout = roll[:, :n_readout].mean(axis=1)
    else:
        # CLS-less avg-pool model: the head pools patch tokens uniformly
        readout = roll[:, total_prefix:].mean(axis=1)
    grid = readout[:, total_prefix:]
    side = hp.n_patches_side
    grid = grid.reshape(b, side, side)
    peak = grid.max(axis=(1, 2), keepdims=True)
    return grid / np.maximum(peak, 1e-12)


def saliency_to_png(
    grid: np.ndarray, path: str, upscale_to: int | None = None
) -> None:
    """One (side, side) [0,1] saliency -> grayscale PNG (optionally
    nearest-upscaled to the input resolution for overlaying)."""
    from PIL import Image

    img = Image.fromarray(
        np.clip(np.asarray(grid) * 255.0, 0, 255).astype(np.uint8), mode="L"
    )
    if upscale_to:
        img = img.resize((upscale_to, upscale_to), Image.NEAREST)
    img.save(path)
