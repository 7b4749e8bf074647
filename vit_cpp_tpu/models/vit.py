"""The ViT forward pass as a pure jittable function.

TPU-native re-design of the reference's graph builder (`vit_encode_image`,
vit.cpp:718-941): the entire statically-built ggml graph — patch conv, CLS +
positional embedding, L transformer blocks, CLS pooling, final LN, head,
softmax — collapses into one pure function under `jax.jit`, batched over a
leading batch axis (the reference hardcodes B=1; here B is first-class,
SURVEY.md §7). The L blocks are executed with `lax.scan` over stacked
parameters: one compiled block body for any depth.

Numerics contract (SURVEY.md §2.1):
- patch embedding == ggml_conv_2d_sk_p0 with stride=kernel=patch, realised
  as reshape/transpose + a single (p*p*c, h) matmul (design per §7);
- per block: LN -> fused QKV matmul -> scaled softmax attention -> proj ->
  residual; LN -> fc1 -> tanh-GELU -> fc2 -> residual;
- head: CLS token (or first seq_len tokens for ViTSTR) -> LN -> linear ->
  softmax probabilities.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.ops.core import (
    attention,
    gelu_tanh,
    layernorm,
    linear,
    mlp_act,
)


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """(B, C, H, W) -> (B, n_patches, C*p*p) patch vectors.

    Token order is row-major over the patch grid and the per-patch feature
    order is [c, py, px], matching the flattened conv weight (h, c, p, p) of
    the checkpoint so `patches @ kernel` equals the reference's
    ggml_conv_2d_sk_p0 (vit.cpp:772-779).
    """
    b, c, hh, ww = images.shape
    gh, gw = hh // patch, ww // patch
    x = images.reshape(b, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, gh, gw, c, p, p)
    return x.reshape(b, gh * gw, c * patch * patch)


def embed(params: Dict[str, Any], images: jax.Array, hp: VitHParams) -> jax.Array:
    """Patch-embed + prefix token(s) + positional embeddings -> (B, T, h).

    Prefix is the CLS token (vit.cpp:794-795), plus the distillation token
    for DeiT-distilled checkpoints (params carry 'dist_token'; timm orders
    it [cls, dist, patches...])."""
    dtype = params["patch_embed"]["kernel"].dtype
    patches = patchify(images.astype(dtype), hp.patch_size)
    x = linear(patches, params["patch_embed"]["kernel"], params["patch_embed"]["bias"])
    b = x.shape[0]
    prefix = []
    if "cls_token" in params:  # absent on CLS-less avg-pool models
        prefix.append(
            jnp.broadcast_to(
                params["cls_token"].astype(dtype), (b, 1, hp.hidden_size)
            )
        )
    if "dist_token" in params:
        prefix.append(
            jnp.broadcast_to(
                params["dist_token"].astype(dtype), (b, 1, hp.hidden_size)
            )
        )
    if "reg_token" in params:
        # DINOv2-style registers: after CLS, before the patches (timm
        # reg_token order); excluded from every pooling readout
        reg = params["reg_token"].astype(dtype)
        prefix.append(
            jnp.broadcast_to(reg[None], (b, reg.shape[0], hp.hidden_size))
        )
    # pos_embed is stored f32 in the checkpoint (converter rule); add in
    # the activation dtype. no_embed_class models (timm) position-embed
    # the patch grid only, BEFORE the prefix concat.
    pos = params["pos_embed"].astype(dtype)[None]
    if hp.no_embed_class:
        x = x + pos
        if prefix:
            x = jnp.concatenate(prefix + [x], axis=1)
    else:
        if prefix:
            x = jnp.concatenate(prefix + [x], axis=1)
        x = x + pos
    if "norm_pre" in params:
        # CLIP-style pre-norm between embeddings and the first block — the
        # tensors the reference converter drops (convert-pth-to-ggml.py:
        # 117-120); supporting them is a deliberate fix of that quirk
        # (SURVEY.md §2.5).
        x = layernorm(
            x, params["norm_pre"]["scale"], params["norm_pre"]["bias"], hp.eps
        )
    return x


# NOTE (kernels research record): two opt-in block variants were built,
# measured, and deleted per the r1 review's "win somewhere or go" rule:
# - "int8-fused" (producer+quant Pallas passes: LN+quant, GELU+quant,
#   quant before every int8 GEMM): 4,442 vs 4,810 img/s at ViT-B/16 — XLA
#   already folds activation quantization into the GEMM pipeline without
#   materializing codes in HBM — and VMEM-OOMs outright at ViT-L/16@384
#   (the (64, 577, 4096) gelu+quant block wants 23.4 MB of scoped VMEM).
# - deferred-residual add+LN scan (fused residual-sum + normalize,
#   ln_impl="pallas"): 4,793 vs 4,810 at ViT-B/16, 467.3 vs 467.7 at
#   ViT-L/16@384 — the kernel saves the LN's re-read of the residual sum
#   but must materialize its output, which XLA otherwise streams straight
#   into the next GEMM's input pipeline. Neutral everywhere, deleted.
# Measurements in docs/TUNING.md.


def _attn_half(
    x: jax.Array,
    bp: Dict[str, Any],
    hp: VitHParams,
    *,
    attn_impl: str,
    mm_impl: str,
    tap=None,
    kv: int | None = None,
) -> jax.Array:
    """The LN1 -> QKV -> attention -> proj -> residual half of a block,
    shared by the dense and MoE block bodies."""
    b, t, h = x.shape
    nh, hd = hp.num_attention_heads, hp.head_dim

    y = layernorm(x, bp["ln1"]["scale"], bp["ln1"]["bias"], hp.eps)
    if tap is not None:
        tap("qkv_in", y)
    qkv = linear(
        y, bp["qkv"]["kernel"], bp["qkv"]["bias"], impl=mm_impl,
        act_scale=bp["qkv"].get("act_scale"),
    )
    # (B, T, 3h): fused QKV with q|k|v contiguous on the feature axis
    # (timm layout; reference carves the same three views, vit.cpp:826-846).
    if attn_impl in ("pallas", "pallas-fast"):
        # fused kernel computes whole heads inside VMEM and writes
        # (B, T, h) directly — no head-split/merge transposes in HBM;
        # "pallas-fast" additionally skips the softmax max-subtract
        from vit_cpp_tpu.ops.flash_attention import attention_qkv

        o = attention_qkv(qkv, nh, fast=attn_impl == "pallas-fast", kv=kv)
    elif attn_impl == "pallas-train":
        # differentiable fused kernel (custom_vjp): forward = the serving
        # kernel, backward recomputes scores in VMEM — the training path
        from vit_cpp_tpu.ops.flash_attention import attention_qkv_train

        o = attention_qkv_train(qkv, nh)
        # named for the "dots+attn" remat policy: saving this output keeps
        # the recompute pass from RE-RUNNING the fused attention kernel
        # (the dots policy only saves dot_general results, and the pallas
        # custom call is not one) — identity outside jax.checkpoint
        from jax.ad_checkpoint import checkpoint_name

        o = checkpoint_name(o, "attn_out")
    else:
        qkv = qkv.reshape(b, t, 3, nh, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        o = attention(q, k, v, impl=attn_impl)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, h)
    if tap is not None:
        tap("proj_in", o)
    return x + linear(
        o, bp["proj"]["kernel"], bp["proj"]["bias"], impl=mm_impl,
        act_scale=bp["proj"].get("act_scale"),
    )


def transformer_block(
    x: jax.Array,
    bp: Dict[str, Any],
    hp: VitHParams,
    *,
    attn_impl: str,
    mm_impl: str,
    tap=None,
    kv: int | None = None,
) -> jax.Array:
    """One encoder block. `tap(name, array)`, when given, observes every
    matmul input ('qkv_in'/'proj_in'/'fc1_in'/'fc2_in') — used by the
    static-activation-scale calibrator (quant/calibrate.py); None (the
    jitted serving path) compiles it away entirely."""
    x = _attn_half(
        x, bp, hp, attn_impl=attn_impl, mm_impl=mm_impl, tap=tap, kv=kv
    )

    y = layernorm(x, bp["ln2"]["scale"], bp["ln2"]["bias"], hp.eps)
    if tap is not None:
        tap("fc1_in", y)
    y = linear(
        y, bp["fc1"]["kernel"], bp["fc1"]["bias"], impl=mm_impl,
        act_scale=bp["fc1"].get("act_scale"),
    )
    y = mlp_act(hp.hidden_act)(y)
    if tap is not None:
        tap("fc2_in", y)
    y = linear(
        y, bp["fc2"]["kernel"], bp["fc2"]["bias"], impl=mm_impl,
        act_scale=bp["fc2"].get("act_scale"),
    )
    return x + y


def moe_block(
    x: jax.Array,
    bp: Dict[str, Any],
    mp: Dict[str, Any],
    hp: VitHParams,
    *,
    attn_impl: str,
    mm_impl: str,
    kv: int | None = None,
) -> tuple[jax.Array, Dict[str, jax.Array]]:
    """One V-MoE encoder block (ops/moe.py): the attention half of
    `transformer_block`, then a routed expert MLP in place of the dense
    fc1/fc2. Returns (x', aux) with the layer's router diagnostics
    (load_balance / router_z / dropped_frac — serving discards them and
    XLA dead-code-eliminates the computation)."""
    from vit_cpp_tpu.ops.moe import moe_mlp

    x = _attn_half(x, bp, hp, attn_impl=attn_impl, mm_impl=mm_impl, kv=kv)
    y = layernorm(x, bp["ln2"]["scale"], bp["ln2"]["bias"], hp.eps)
    out, aux = moe_mlp(y, mp, hp, mlp_act(hp.hidden_act))
    return x + out, aux


def tome_block(
    x: jax.Array,
    sizes: jax.Array,
    bp: Dict[str, Any],
    hp: VitHParams,
    r: int,
    *,
    attn_impl: str,
    mm_impl: str,
) -> tuple[jax.Array, jax.Array]:
    """One encoder block with ToMe token merging (ops/tome.py): the same
    op sequence as `transformer_block`, plus (a) proportional attention —
    softmax weights scaled by each key's merged-token count `sizes` —
    and (b) a size-weighted bipartite merge of the r most similar token
    pairs between the attention and MLP halves, using the mean attention
    key over heads as the similarity metric (Bolya et al., ICLR 2023).
    Returns (x', sizes') with r fewer tokens."""
    b, t, h = x.shape
    nh, hd = hp.num_attention_heads, hp.head_dim

    y = layernorm(x, bp["ln1"]["scale"], bp["ln1"]["bias"], hp.eps)
    qkv = linear(
        y, bp["qkv"]["kernel"], bp["qkv"]["bias"], impl=mm_impl,
        act_scale=bp["qkv"].get("act_scale"),
    )
    if attn_impl in ("pallas", "pallas-fast"):
        from vit_cpp_tpu.ops.flash_attention import attention_qkv

        o = attention_qkv(
            qkv, nh, fast=attn_impl == "pallas-fast", sizes=sizes
        )
    elif attn_impl == "pallas-train":
        # sizes-aware fused custom-VJP (r4): proportional attention in
        # VMEM both directions — the merged train step stops paying the
        # XLA backward's materialized (B, nh, T, T) score round trips
        from vit_cpp_tpu.ops.flash_attention import attention_qkv_train

        o = attention_qkv_train(qkv, nh, sizes=sizes)
        # named for the "dots+attn" remat policy (see transformer_block)
        from jax.ad_checkpoint import checkpoint_name

        o = checkpoint_name(o, "attn_out")
    else:
        from vit_cpp_tpu.ops.flash_attention import _attention_qkv_xla

        o = _attention_qkv_xla(qkv, nh, sizes=sizes)
    x = x + linear(
        o, bp["proj"]["kernel"], bp["proj"]["bias"], impl=mm_impl,
        act_scale=bp["proj"].get("act_scale"),
    )

    if r:
        from vit_cpp_tpu.ops.tome import tome_merge

        # similarity metric: the mean attention key over heads (the
        # paper's choice — keys already summarize what each token offers).
        # Computed as one small GEMM (tiled-eye head-sum matrix) instead
        # of reshape+mean: the reshape form materialized a full f32
        # (B, T, h) intermediate plus a layout copy per layer (~2 ms/iter
        # of pure HBM traffic in the r4 profile); the GEMM emits the
        # (B, T, head_dim) metric directly. The /nh mean scaling is
        # dropped — cosine similarity is norm-invariant.
        head_sum = jnp.tile(jnp.eye(hd, dtype=qkv.dtype), (nh, 1))
        metric = jax.lax.dot_general(
            qkv[:, :, h : 2 * h],
            head_sum,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        x, sizes = tome_merge(x, metric, sizes, r, hp.n_prefix)

    y = layernorm(x, bp["ln2"]["scale"], bp["ln2"]["bias"], hp.eps)
    y = linear(
        y, bp["fc1"]["kernel"], bp["fc1"]["bias"], impl=mm_impl,
        act_scale=bp["fc1"].get("act_scale"),
    )
    y = mlp_act(hp.hidden_act)(y)
    y = linear(
        y, bp["fc2"]["kernel"], bp["fc2"]["bias"], impl=mm_impl,
        act_scale=bp["fc2"].get("act_scale"),
    )
    return x + y, sizes


def attention_pool(
    ap: Dict[str, Any], x: jax.Array, hp: VitHParams, mm_impl: str = "xla",
    sizes: jax.Array | None = None,
) -> jax.Array:
    """SigLIP-style attention pooling (HF
    SiglipMultiheadAttentionPoolingHead, verified bit-for-bit-in-f32
    against transformers in tests/test_siglip.py): a learned probe
    cross-attends over the (already final-normed) tokens, then a
    residual MLP. x: (B, T, h) -> (B, h)."""
    if mm_impl == "qat":
        # the serving int8 path never quantizes attn_pool leaves
        # (quant/int8.convert_params_to_int8 targets blocks + head only),
        # so QAT must not fake-quantize its activations either
        mm_impl = "xla"
    b, t, h = x.shape
    nh, hd = hp.num_attention_heads, hp.head_dim
    dtype = x.dtype
    # packed in_proj [q;k;v]: q from the probe, k/v from the tokens —
    # both run the FULL packed projection and slice the output (the
    # kernel may be a QuantLinear/Int8Linear leaf, which cannot be
    # column-sliced; the extra third on a (T, 3h) GEMM is negligible)
    kern, bias = ap["qkv"]["kernel"], ap["qkv"]["bias"]
    probe = jnp.broadcast_to(ap["probe"].astype(dtype), (b, 1, h))
    q = linear(probe, kern, bias, impl=mm_impl)[:, :, :h]
    kv = linear(x, kern, bias, impl=mm_impl)
    k, v = kv[:, :, h : 2 * h], kv[:, :, 2 * h :]
    q = q.reshape(b, 1, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    if sizes is not None:
        # ToMe proportional cross-attention: each merged token counts
        # `sizes` times in the probe's softmax (ops/tome.py)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / (hd**0.5) + jnp.log(sizes.astype(jnp.float32))[:, None, None, :]
        w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        o = jnp.einsum(
            "bhqk,bhkd->bhqd", w, v, preferred_element_type=jnp.float32
        ).astype(q.dtype)
    else:
        o = attention(q, k, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, 1, h)
    o = linear(o, ap["proj"]["kernel"], ap["proj"]["bias"], impl=mm_impl)
    y = layernorm(o, ap["norm"]["scale"], ap["norm"]["bias"], hp.eps)
    y = linear(y, ap["fc1"]["kernel"], ap["fc1"]["bias"], impl=mm_impl)
    y = gelu_tanh(y)
    y = linear(y, ap["fc2"]["kernel"], ap["fc2"]["bias"], impl=mm_impl)
    return (o + y)[:, 0]


def forward(
    params: Dict[str, Any],
    images: jax.Array,
    hp: VitHParams,
    *,
    attn_impl: str = "xla",
    mm_impl: str = "xla",
    unroll: int = 1,
    remat: bool = False,
    pad_tokens: bool = False,
    features: bool = False,
    tome: int = 0,
    moe_aux: bool = False,
) -> jax.Array:
    """Images (B, C, H, W), preprocessed/normalized -> logits.

    Returns (B, num_classes) for classification, or (B, seq_len, num_classes)
    when hp.seq_len is set (ViTSTR sequence head).

    `features=True` stops before the classifier head and returns the
    final-LN pooled representation instead — (B, hidden) for classifiers,
    (B, seq_len, hidden) for sequence heads. This is the encoder output
    the reference's `vit_encode_image` name promises (the CLS pool +
    final LN stage, vit.cpp:903-920, minus head+softmax) and the
    embedding a retrieval/similarity deployment serves.

    `unroll` forwards to lax.scan over the stacked blocks: >1 trades
    compile time for fewer scan-carry copies between layers. `remat`
    wraps each block in jax.checkpoint so the backward pass recomputes
    block activations instead of storing all L layers' intermediates —
    training ViT-B/16 at batch 128 needs 23.5 GB of stored activations
    on a 16 GB v5e without it (measured OOM); with it the same step fits.
    remat=True recomputes everything; remat="dots" keeps each block's
    GEMM outputs (the expensive part of the recompute) and recomputes
    only the cheap elementwise chain (~4 GB extra residency at
    batch 128; measured numbers in docs/TUNING.md); remat="dots+attn"
    additionally saves the fused attention outputs (checkpoint_name
    "attn_out") so the recompute pass never re-enters the Pallas
    attention kernel — (B, T, h) per layer, ~19 MB/layer at batch 64.
    Inference never needs any of them (no backward).

    `pad_tokens=True` (serving-only; requires a fused pallas attention)
    zero-pads the token axis to a multiple of 8 after the embed: every
    GEMM then runs with sublane-aligned row groups (measured +10% int8
    rate on the K=768 contractions at T=197 -> 200,
    tools/probe_int8_shapes.py) and only attention — the network's one
    cross-token op — needs to know, via a key mask that zeroes the pad
    tokens' softmax weights. The pad rows carry deterministic garbage
    (LN of zeros = bias) that nothing reads: the head pools row 0 /
    the first seq_len rows.

    `tome=r` turns on ToMe token merging (ops/tome.py): each layer
    merges the r most similar patch-token pairs between its attention
    and MLP halves, so layer l runs on ~T - l*r tokens — attention cost
    falls quadratically, GEMM cost linearly. Layers unroll (each has
    its own static token count); pooling readouts are size-weighted.
    Measured accuracy/throughput rows: docs/TUNING.md "ToMe token
    merging". Training composes (vit-finetune --tome — the paper's
    train-with-merging recipe): matching is stop_gradient'd (official
    no_grad semantics), attention runs the sizes-aware fused custom-VJP
    (proportional weights recomputed in VMEM both directions, r4), and
    remat wraps each merged block with the same dots+attn policy as the
    unmerged scan. Opt-in everywhere."""
    x = embed(params, images, hp)
    kv = None
    if pad_tokens:
        if attn_impl not in ("pallas", "pallas-fast"):
            raise ValueError(
                "pad_tokens requires a fused pallas attention (the XLA "
                "and training paths run unpadded)"
            )
        t = x.shape[1]
        tp = -(-t // 8) * 8
        if tp != t:
            kv = t
            x = jnp.concatenate(
                [x, jnp.zeros((x.shape[0], tp - t, x.shape[2]), x.dtype)],
                axis=1,
            )

    sizes = None
    if tome:
        if hp.num_experts:
            raise ValueError(
                "tome + MoE is not supported (both re-plan the layer loop)"
            )
        if hp.seq_len is not None:
            raise ValueError(
                "tome is incompatible with sequence heads (ViTSTR reads "
                "every token position)"
            )
        if pad_tokens:
            raise ValueError("tome and pad_tokens are exclusive")
        from vit_cpp_tpu.ops.tome import tome_schedule

        # ToMe TRAINS too (vit-finetune --tome; the paper's
        # train-with-merging recipe): the merge GEMM differentiates
        # (matching indices are stop_gradient'd, ops/tome.py — official
        # no_grad semantics), and with attn_impl="pallas-train" the
        # merged layers run the sizes-aware fused custom-VJP (r4):
        # proportional attention stays in VMEM both directions, so the
        # backward never materializes (B, nh, T, T) scores even before
        # the per-layer T shrink starts paying.

        def _tome_layer(x, sizes, bp, rl):
            return tome_block(
                x, sizes, bp, hp, rl, attn_impl=attn_impl, mm_impl=mm_impl
            )

        if remat == "dots+attn" and attn_impl == "pallas-train":
            # same policy as the unmerged scan: save GEMM outputs AND the
            # fused attention outputs so the recompute pass never re-runs
            # the attention kernel
            blk = jax.checkpoint(
                _tome_layer,
                policy=jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                    # "act_q": QAT's qdq'd GEMM inputs (ops/core.py) — saved
                    # so the backward dW GEMMs read them instead of
                    # recomputing the absmax+round chain (no-op when dense)
                    jax.checkpoint_policies.save_only_these_names(
                        "attn_out", "act_q"
                    ),
                ),
                static_argnums=(3,),
            )
        elif remat in ("dots", "dots+attn"):
            # no "attn_out" checkpoint name on the XLA attention path —
            # the dots policy already saves the attention GEMM outputs
            blk = jax.checkpoint(
                _tome_layer,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                static_argnums=(3,),
            )
        elif remat:
            blk = jax.checkpoint(_tome_layer, static_argnums=(3,))
        else:
            blk = _tome_layer

        rs = tome_schedule(hp.n_patches, hp.num_hidden_layers, tome)
        sizes = jnp.ones((x.shape[0], x.shape[1]), jnp.float32)
        for l, rl in enumerate(rs):
            bp = {
                k2: slice_block_params(v2, l)
                for k2, v2 in params["blocks"].items()
            }
            x, sizes = blk(x, sizes, bp, rl)
        return _head(params, x, hp, features, mm_impl, kv, sizes)

    if hp.num_experts:
        # V-MoE (ops/moe.py): like ToMe, the layer loop unrolls — MoE and
        # dense blocks have different param structures, so one scanned
        # body cannot serve both. Aux router diagnostics are averaged
        # over the MoE layers and returned when moe_aux=True (training);
        # serving ignores them and XLA deletes the dead ops.
        if tome:
            raise ValueError(
                "tome + MoE is not supported (both re-plan the layer loop)"
            )
        if pad_tokens:
            raise ValueError(
                "pad_tokens + MoE is not supported (pad rows would claim "
                "expert capacity)"
            )
        if mm_impl == "qat":
            raise ValueError(
                "QAT through MoE experts is not implemented (the expert "
                "einsum path has no fake-quant leaves)"
            )

        def _dense_layer(x, bp):
            return transformer_block(
                x, bp, hp, attn_impl=attn_impl, mm_impl=mm_impl, kv=kv
            )

        def _moe_layer(x, bp, mp):
            return moe_block(
                x, bp, mp, hp, attn_impl=attn_impl, mm_impl=mm_impl, kv=kv
            )

        if remat == "dots+attn" and attn_impl == "pallas-train":
            pol = jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "act_q"
                ),
            )
            _dense_layer = jax.checkpoint(_dense_layer, policy=pol)
            _moe_layer = jax.checkpoint(_moe_layer, policy=pol)
        elif remat in ("dots", "dots+attn"):
            pol = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            _dense_layer = jax.checkpoint(_dense_layer, policy=pol)
            _moe_layer = jax.checkpoint(_moe_layer, policy=pol)
        elif remat:
            _dense_layer = jax.checkpoint(_dense_layer)
            _moe_layer = jax.checkpoint(_moe_layer)

        moe_set = set(hp.moe_layers)
        aux_sum: Dict[str, jax.Array] = {}
        di = mi = 0
        for l in range(hp.num_hidden_layers):
            bp = {
                k: slice_block_params(params["blocks"][k], l)
                for k in ("ln1", "qkv", "proj", "ln2")
            }
            if l in moe_set:
                mp = slice_block_params(params["moe"], mi)
                mi += 1
                x, aux = _moe_layer(x, bp, mp)
                for k, v in aux.items():
                    aux_sum[k] = aux_sum.get(k, 0.0) + v
            else:
                bp["fc1"] = slice_block_params(params["blocks"]["fc1"], di)
                bp["fc2"] = slice_block_params(params["blocks"]["fc2"], di)
                di += 1
                x = _dense_layer(x, bp)
        out = _head(params, x, hp, features, mm_impl, kv, None)
        if moe_aux:
            n = len(hp.moe_layers)
            return out, {k: v / n for k, v in aux_sum.items()}
        return out
    if moe_aux:
        raise ValueError("moe_aux requires an MoE model (hp.num_experts)")

    def body(carry, bp):
        return (
            transformer_block(
                carry, bp, hp, attn_impl=attn_impl, mm_impl=mm_impl, kv=kv
            ),
            None,
        )

    if remat == "dots":
        body = jax.checkpoint(
            body, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )
    elif remat == "dots+attn":
        body = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "act_q"
                ),
            ),
        )
    elif remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["blocks"], unroll=unroll)
    return _head(params, x, hp, features, mm_impl, kv, None)


def _head(params, x, hp, features, mm_impl, kv, sizes):
    """Pooling readout + classifier head, shared by the scan forward and
    the ToMe unrolled forward. `sizes` (B, T) f32, when given, weights
    every readout over merged tokens (avg pool becomes a size-weighted
    mean; the MAP probe runs proportional cross-attention)."""
    if "head_dist" in params and hp.seq_len is None:
        # DeiT distilled: final LN over both prefix tokens; inference
        # averages the two heads' outputs (timm
        # VisionTransformerDistilled.forward_head — pre_logits averages the
        # token representations, logits average the two classifiers).
        pooled = layernorm(
            x[:, :2], params["norm"]["scale"], params["norm"]["bias"], hp.eps
        )
        if features:
            return (pooled[:, 0] + pooled[:, 1]) * 0.5
        logits = linear(
            pooled[:, 0], params["head"]["kernel"], params["head"]["bias"],
            impl=mm_impl, act_scale=params["head"].get("act_scale"),
        )
        logits_dist = linear(
            pooled[:, 1],
            params["head_dist"]["kernel"],
            params["head_dist"]["bias"],
            impl=mm_impl,
            act_scale=params["head_dist"].get("act_scale"),
        )
        return (logits + logits_dist) * 0.5
    if hp.global_pool == "map" and hp.seq_len is None:
        # SigLIP attention pooling: the final norm applies to ALL tokens
        # (HF post_layernorm), THEN the probe cross-attends over them —
        # the reverse order of every other head (pool first, norm after)
        end = kv if kv is not None else x.shape[1]
        y = layernorm(
            x[:, :end], params["norm"]["scale"], params["norm"]["bias"],
            hp.eps,
        )
        pooled = attention_pool(
            params["attn_pool"], y, hp, mm_impl=mm_impl,
            sizes=None if sizes is None else sizes[:, :end],
        )
        if features:
            return pooled
        if "head" not in params:
            raise ValueError(
                "checkpoint is a headless encoder (no classifier head) — "
                "serve embeddings (features=True / embed surfaces) or "
                "fine-tune to attach a head"
            )
        return linear(
            pooled, params["head"]["kernel"], params["head"]["bias"],
            impl=mm_impl, act_scale=params["head"].get("act_scale"),
        )
    if hp.seq_len is not None:
        pooled = x[:, : hp.seq_len]  # ViTSTR 25-token readout
    elif hp.global_pool == "avg":
        # mean over the patch tokens (prefix incl. registers excluded),
        # normalized by fc_norm — loaded into the 'norm' slot (timm
        # avg-pool semantics); under pad_tokens, kv is the real token
        # count so the pad rows never enter the mean
        end = kv if kv is not None else x.shape[1]
        if sizes is not None:
            # ToMe: each merged token stands for `sizes` originals, so
            # the patch mean weights by size (lossless when merged
            # tokens were identical)
            s = sizes[:, hp.n_prefix : end]
            pooled = (
                jnp.sum(
                    x[:, hp.n_prefix : end].astype(jnp.float32)
                    * s[..., None],
                    axis=1,
                )
                / jnp.sum(s, axis=1, keepdims=True)
            ).astype(x.dtype)
        else:
            pooled = jnp.mean(x[:, hp.n_prefix : end], axis=1)
    else:
        pooled = x[:, 0]  # CLS token only (ggml_get_rows, vit.cpp:910-911)
    pooled = layernorm(pooled, params["norm"]["scale"], params["norm"]["bias"], hp.eps)
    if features:
        return pooled
    if "head" not in params:
        raise ValueError(
            "checkpoint is a headless encoder (no classifier head) — "
            "serve embeddings (features=True / embed surfaces) or "
            "fine-tune to attach a head"
        )
    logits = linear(
        pooled, params["head"]["kernel"], params["head"]["bias"],
        impl=mm_impl, act_scale=params["head"].get("act_scale"),
    )
    return logits


def predict_probs(params, images, hp, **kw) -> jax.Array:
    """Forward + softmax, the reference's graph output (vit.cpp:931)."""
    logits = forward(params, images, hp, **kw)
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def slice_block_params(tree, i: int):
    """Layer i's params out of a stacked blocks subtree (the Python-loop
    analogue of what lax.scan does per step); handles dense arrays plus
    QuantLinear / Int8Linear leaves."""
    from vit_cpp_tpu.quant.int8 import Int8Linear
    from vit_cpp_tpu.quant.qlinear import QuantLinear

    def slice_leaf(a):
        if isinstance(a, QuantLinear):
            return QuantLinear(
                codes=a.codes[i],
                scales=a.scales[i],
                mins=None if a.mins is None else a.mins[i],
                qtype=a.qtype,
            )
        if isinstance(a, Int8Linear):
            return Int8Linear(
                codes=a.codes[i],
                scale=a.scale[i],
                act_scale=None if a.act_scale is None else a.act_scale[i],
            )
        return a[i]

    return jax.tree.map(
        slice_leaf,
        tree,
        is_leaf=lambda x: isinstance(x, (QuantLinear, Int8Linear)),
    )


def forward_debug(
    params: Dict[str, Any], images: jax.Array, hp: VitHParams, **kw
) -> Dict[str, jax.Array]:
    """Forward pass that captures every stage's activations.

    The analogue of the reference's print_t_f32 parity-debugging hook
    (vit.cpp:54-84, call sites vit.cpp:1038 — SURVEY.md §4.5): returns
    {'embed', 'block_0'.., 'pooled', 'logits', 'probs'} for stage-by-stage
    diffing against an oracle. Python loop instead of lax.scan — debug
    path, compile time does not matter here.
    """
    acts: Dict[str, jax.Array] = {}
    x = embed(params, images, hp)
    acts["embed"] = x
    for i in range(hp.num_hidden_layers):
        bp = {k: slice_block_params(v, i) for k, v in params["blocks"].items()}
        x = transformer_block(
            x,
            bp,
            hp,
            attn_impl=kw.get("attn_impl", "xla"),
            mm_impl=kw.get("mm_impl", "xla"),
        )
        acts[f"block_{i}"] = x
    if "head_dist" in params and hp.seq_len is None:
        pooled = layernorm(
            x[:, :2], params["norm"]["scale"], params["norm"]["bias"], hp.eps
        )
        logits = (
            linear(pooled[:, 0], params["head"]["kernel"], params["head"]["bias"])
            + linear(
                pooled[:, 1],
                params["head_dist"]["kernel"],
                params["head_dist"]["bias"],
            )
        ) * 0.5
    else:
        if hp.seq_len is not None:
            pooled = x[:, : hp.seq_len]
        elif hp.global_pool == "avg":
            pooled = jnp.mean(x[:, hp.n_prefix :], axis=1)
        else:
            pooled = x[:, 0]
        pooled = layernorm(
            pooled, params["norm"]["scale"], params["norm"]["bias"], hp.eps
        )
        if "head" not in params:  # headless encoder: stop at the features
            acts["pooled"] = pooled
            return acts
        logits = linear(pooled, params["head"]["kernel"], params["head"]["bias"])
    acts["pooled"] = pooled
    acts["logits"] = logits
    acts["probs"] = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return acts


def print_t(name: str, t, n: int = 10) -> None:
    """Console dump in the reference's print_t_f32 shape: first/last n
    values + full-tensor sum (vit.cpp:54-84)."""
    import numpy as np

    a = np.asarray(t, dtype=np.float32).reshape(-1)
    head = " ".join(f"{v:.5f}" for v in a[:n])
    tail = " ".join(f"{v:.5f}" for v in a[-n:])
    print(f"{name}: [{head} ... {tail}], sum = {a.sum():.5f}")
