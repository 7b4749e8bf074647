"""Independent numpy golden implementation of the ViT forward pass.

Computes the same function as vit_cpp_tpu.models.vit.forward, written
directly against the torch-layout state dict in float64 — an independent
oracle for parity tests (the analogue of diffing per-stage activations
against the reference's print_t_f32 dumps, SURVEY.md §4)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from vit_cpp_tpu.hparams import VitHParams


def _ln(x, w, b, eps):
    mean = x.mean(-1, keepdims=True)
    xc = x - mean
    var = (xc * xc).mean(-1, keepdims=True)
    return xc / np.sqrt(var + eps) * w + b


def _gelu_tanh(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def _quick_gelu(x):
    return x / (1.0 + np.exp(-1.702 * x))


def _act(hp):
    return _quick_gelu if hp.hidden_act == "quick_gelu" else _gelu_tanh


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _embed_np(state, hp, x, b, h):
    """Prefix tokens + positional embeddings + optional norm_pre — the
    oracle half of models.vit.embed (incl. timm no_embed_class ordering:
    pos over the patch grid BEFORE the prefix concat)."""
    f = lambda n: state[n].astype(np.float64)
    prefix = []
    if "cls_token" in state:
        prefix.append(np.broadcast_to(f("cls_token").reshape(1, 1, h), (b, 1, h)))
    if "dist_token" in state:
        prefix.append(np.broadcast_to(f("dist_token").reshape(1, 1, h), (b, 1, h)))
    if "reg_token" in state:  # DINOv2 registers: after CLS, before patches
        reg = f("reg_token").reshape(1, -1, h)
        prefix.append(np.broadcast_to(reg, (b, reg.shape[1], h)))
    pos = f("pos_embed").reshape(1, -1, h)
    if prefix and pos.shape[1] == x.shape[1]:  # no_embed_class layout
        x = np.concatenate(prefix + [x + pos], axis=1)
    else:
        if prefix:
            x = np.concatenate(prefix + [x], axis=1)
        x = x + pos
    if "norm_pre.weight" in state:
        x = _ln(x, f("norm_pre.weight"), f("norm_pre.bias"), hp.eps)
    return x


def forward_numpy(
    state: Dict[str, np.ndarray], hp: VitHParams, images: np.ndarray
) -> np.ndarray:
    """images: (B, C, H, W) f32 preprocessed -> logits (B, classes) f64
    (or (B, seq_len, classes) for ViTSTR)."""
    f = lambda n: state[n].astype(np.float64)
    h, p = hp.hidden_size, hp.patch_size
    b, c, hh, ww = images.shape
    gh, gw = hh // p, ww // p

    x = images.astype(np.float64).reshape(b, c, gh, p, gw, p)
    patches = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * p * p)
    pe_w = f("patch_embed.proj.weight").reshape(h, -1)
    x = patches @ pe_w.T + f("patch_embed.proj.bias").reshape(h)

    x = _embed_np(state, hp, x, b, h)

    nh, hd = hp.num_attention_heads, hp.head_dim
    for i in range(hp.num_hidden_layers):
        pref = f"blocks.{i}."
        y = _ln(x, f(pref + "norm1.weight"), f(pref + "norm1.bias"), hp.eps)
        qkv = y @ f(pref + "attn.qkv.weight").T + f(pref + "attn.qkv.bias")
        qkv = qkv.reshape(b, -1, 3, nh, hd)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        logits = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        o = np.einsum("bhqk,bhkd->bhqd", _softmax(logits), v)
        o = o.transpose(0, 2, 1, 3).reshape(b, -1, h)
        x = x + o @ f(pref + "attn.proj.weight").T + f(pref + "attn.proj.bias")

        y = _ln(x, f(pref + "norm2.weight"), f(pref + "norm2.bias"), hp.eps)
        y = y @ f(pref + "mlp.fc1.weight").T + f(pref + "mlp.fc1.bias")
        y = _act(hp)(y)
        y = y @ f(pref + "mlp.fc2.weight").T + f(pref + "mlp.fc2.bias")
        x = x + y

    if "attn_pool.probe" in state and hp.seq_len is None:
        # SigLIP attention pooling: final norm over ALL tokens, then the
        # probe cross-attends (models/vit.py attention_pool; authority:
        # transformers SiglipMultiheadAttentionPoolingHead)
        h_ = hp.hidden_size
        y = _ln(x, f("norm.weight"), f("norm.bias"), hp.eps)
        w_in, b_in = f("attn_pool.qkv.weight"), f("attn_pool.qkv.bias")
        probe = f("attn_pool.probe").reshape(1, 1, h_)
        q = probe @ w_in[:h_].T + b_in[:h_]
        k = y @ w_in[h_ : 2 * h_].T + b_in[h_ : 2 * h_]
        v = y @ w_in[2 * h_ :].T + b_in[2 * h_ :]
        nh_, hd_ = hp.num_attention_heads, hp.head_dim
        q = np.broadcast_to(q, (b, 1, h_)).reshape(b, 1, nh_, hd_)
        q = q.transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, nh_, hd_).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, nh_, hd_).transpose(0, 2, 1, 3)
        logits = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd_)
        o = np.einsum("bhqk,bhkd->bhqd", _softmax(logits), v)
        o = o.transpose(0, 2, 1, 3).reshape(b, 1, h_)
        o = o @ f("attn_pool.proj.weight").T + f("attn_pool.proj.bias")
        z = _ln(o, f("attn_pool.norm.weight"), f("attn_pool.norm.bias"), hp.eps)
        z = z @ f("attn_pool.mlp.fc1.weight").T + f("attn_pool.mlp.fc1.bias")
        z = _gelu_tanh(z)
        z = z @ f("attn_pool.mlp.fc2.weight").T + f("attn_pool.mlp.fc2.bias")
        pooled = (o + z)[:, 0]
        if "head.weight" not in state:
            return pooled
        return pooled @ f("head.weight").T + f("head.bias")
    if "fc_norm.weight" in state and hp.seq_len is None:
        pooled = x[:, hp.n_prefix :].mean(axis=1)
        pooled = _ln(pooled, f("fc_norm.weight"), f("fc_norm.bias"), hp.eps)
        if "head.weight" not in state:  # headless encoder: features
            return pooled
        return pooled @ f("head.weight").T + f("head.bias")
    if "head_dist.weight" in state and hp.seq_len is None:
        pooled = _ln(x[:, :2], f("norm.weight"), f("norm.bias"), hp.eps)
        return (
            pooled[:, 0] @ f("head.weight").T
            + f("head.bias")
            + pooled[:, 1] @ f("head_dist.weight").T
            + f("head_dist.bias")
        ) * 0.5
    if hp.seq_len is None:
        pooled = x[:, 0]
    else:
        pooled = x[:, : hp.seq_len]
    pooled = _ln(pooled, f("norm.weight"), f("norm.bias"), hp.eps)
    if "head.weight" not in state:  # headless encoder: features
        return pooled
    return pooled @ f("head.weight").T + f("head.bias")


def probs_numpy(state, hp, images):
    return _softmax(forward_numpy(state, hp, images))


def forward_numpy_debug(
    state: Dict[str, np.ndarray], hp: VitHParams, images: np.ndarray
) -> Dict[str, np.ndarray]:
    """Per-stage f64 activations, keyed like models.vit.forward_debug
    ({'embed', 'block_i', 'pooled', 'logits', 'probs'}) — the oracle half
    of the print_t_f32-style parity harness (vit.cpp:54-84, SURVEY §4)."""
    f = lambda n: state[n].astype(np.float64)
    h, p = hp.hidden_size, hp.patch_size
    b, c, hh, ww = images.shape
    gh, gw = hh // p, ww // p
    acts: Dict[str, np.ndarray] = {}

    x = images.astype(np.float64).reshape(b, c, gh, p, gw, p)
    patches = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * p * p)
    pe_w = f("patch_embed.proj.weight").reshape(h, -1)
    x = patches @ pe_w.T + f("patch_embed.proj.bias").reshape(h)
    x = _embed_np(state, hp, x, b, h)
    acts["embed"] = x

    nh, hd = hp.num_attention_heads, hp.head_dim
    for i in range(hp.num_hidden_layers):
        pref = f"blocks.{i}."
        y = _ln(x, f(pref + "norm1.weight"), f(pref + "norm1.bias"), hp.eps)
        qkv = y @ f(pref + "attn.qkv.weight").T + f(pref + "attn.qkv.bias")
        qkv = qkv.reshape(b, -1, 3, nh, hd)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        logits = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        o = np.einsum("bhqk,bhkd->bhqd", _softmax(logits), v)
        o = o.transpose(0, 2, 1, 3).reshape(b, -1, h)
        x = x + o @ f(pref + "attn.proj.weight").T + f(pref + "attn.proj.bias")
        y = _ln(x, f(pref + "norm2.weight"), f(pref + "norm2.bias"), hp.eps)
        y = y @ f(pref + "mlp.fc1.weight").T + f(pref + "mlp.fc1.bias")
        y = _act(hp)(y)
        y = y @ f(pref + "mlp.fc2.weight").T + f(pref + "mlp.fc2.bias")
        x = x + y
        acts[f"block_{i}"] = x

    if "fc_norm.weight" in state and hp.seq_len is None:
        pooled = x[:, hp.n_prefix :].mean(axis=1)
        pooled = _ln(pooled, f("fc_norm.weight"), f("fc_norm.bias"), hp.eps)
        acts["pooled"] = pooled
        if "head.weight" not in state:  # headless: features are the output
            return acts
        acts["logits"] = pooled @ f("head.weight").T + f("head.bias")
    elif "head_dist.weight" in state and hp.seq_len is None:
        pooled = _ln(x[:, :2], f("norm.weight"), f("norm.bias"), hp.eps)
        acts["pooled"] = pooled
        acts["logits"] = (
            pooled[:, 0] @ f("head.weight").T
            + f("head.bias")
            + pooled[:, 1] @ f("head_dist.weight").T
            + f("head_dist.bias")
        ) * 0.5
    else:
        pooled = x[:, 0] if hp.seq_len is None else x[:, : hp.seq_len]
        pooled = _ln(pooled, f("norm.weight"), f("norm.bias"), hp.eps)
        acts["pooled"] = pooled
        if "head.weight" not in state:  # headless CLS-pool encoder
            return acts
        acts["logits"] = pooled @ f("head.weight").T + f("head.bias")
    acts["probs"] = _softmax(acts["logits"])
    return acts
