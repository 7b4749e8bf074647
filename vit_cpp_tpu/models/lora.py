"""LoRA fine-tuning: low-rank adapters on the block GEMMs.

The reference is inference-only; the full fine-tune loop (finetune.py)
trains every weight, which carries 12 bytes/param of AdamW state —
~1 GB for ViT-B, ~12 GB for ViT-g (docs/TUNING.md "FSDP training
state"). LoRA (Hu et al. 2021) freezes the pretrained weights and
trains rank-r deltas on the quantized-at-serve GEMM kernels instead:

    kernel_eff = kernel + (alpha / r) * a @ b      a: (in, r), b: (r, out)

`b` starts at zero, so step 0 is exactly the pretrained model. Only
{adapters, head} carry gradients and optimizer state (the head is
re-initialized for the target taxonomy anyway); the backward still
propagates dx through every layer but skips the full-width dW GEMMs —
less state AND less compute than full fine-tuning.

TPU-first shape choices: adapters stay STACKED (L, in, r) / (L, r, out)
like every block param, the merge is one batched einsum per site (MXU
work, no per-layer Python), and the merged tree feeds the unchanged
`forward` — scan/unroll, remat, fused-VJP attention, ToMe and QAT all
compose because the merge happens before them in the loss
(parallel/train.py train_step_lora). Export folds the adapters into
dense kernels (`merge_lora`), so SERVING is byte-identical machinery to
a full fine-tune — no adapter runtime, no extra latency.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

LORA_SITES = ("qkv", "proj", "fc1", "fc2")


def init_lora(
    params: Dict[str, Any], rank: int, seed: int = 0
) -> Dict[str, Any]:
    """Zero-effect adapters for every block GEMM: a ~ N(0, 1/r) (the
    paper's Gaussian init scaled for stable a@b magnitude), b = 0."""
    if rank <= 0:
        raise ValueError(f"lora rank must be >= 1, got {rank}")
    key = jax.random.PRNGKey(seed)
    out: Dict[str, Any] = {"blocks": {}}
    for i, name in enumerate(LORA_SITES):
        k = params["blocks"][name]["kernel"]
        if k.ndim != 3:
            raise ValueError(
                f"init_lora expects stacked (L, in, out) kernels, got "
                f"{k.shape} for blocks.{name}"
            )
        layers, in_f, out_f = k.shape
        a = jax.random.normal(
            jax.random.fold_in(key, i), (layers, in_f, rank), jnp.float32
        ) * (1.0 / rank)
        b = jnp.zeros((layers, rank, out_f), jnp.float32)
        out["blocks"][name] = {"a": a, "b": b}
    return out


def lora_trainable(
    params: Dict[str, Any], rank: int, seed: int = 0
) -> Dict[str, Any]:
    """The tree the optimizer sees: fresh adapters + the (re-initialized)
    classifier head(s) — everything else stays frozen in `params`."""
    out: Dict[str, Any] = {"lora": init_lora(params, rank, seed)}
    for name in ("head", "head_dist"):
        if name in params:
            out[name] = params[name]
    return out


def merge_lora(
    params: Dict[str, Any], trainable: Dict[str, Any], alpha: float
) -> Dict[str, Any]:
    """Fold adapters (+ the trained head) into a full param tree.

    Used in the LoRA loss every step (the merged kernels feed the
    unchanged forward) and once at export (the served gguf is a plain
    dense checkpoint — zero adapter machinery at inference)."""
    out = dict(params)
    blocks = dict(params["blocks"])
    for name in LORA_SITES:
        ab = trainable["lora"]["blocks"][name]
        a, b = ab["a"], ab["b"]
        rank = a.shape[-1]
        delta = jnp.einsum(
            "lir,lro->lio", a, b, preferred_element_type=jnp.float32
        ) * (alpha / rank)
        leaf = dict(blocks[name])
        leaf["kernel"] = (leaf["kernel"] + delta.astype(leaf["kernel"].dtype))
        blocks[name] = leaf
    out["blocks"] = blocks
    for name in ("head", "head_dist"):
        if name in trainable:
            out[name] = trainable[name]
    return out


def lora_state_bytes(trainable: Dict[str, Any]) -> int:
    """Trainable bytes (the AdamW state is 3x this in f32) — the number
    tools/fsdp_memory.py-style comparisons quote."""
    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(trainable)
    )
