"""Parameter pytree construction from model-file tensor records.

The reference allocates named ggml tensors into an arena and streams file
records into them (vit_model_load, vit.cpp:478-695). Here the checkpoint
becomes a frozen JAX pytree shaped for TPU execution:

- linear kernels are stored transposed to (in, out) so the forward pass is
  `x @ kernel` with no runtime transpose;
- the L transformer blocks are stacked on a leading axis so the forward can
  `lax.scan` over them (one compiled block body regardless of depth);
- quantized 2-D weights stay packed as integer codes + per-block scales in a
  `QuantLinear` pytree node — never materialized to f32 in HBM; dequant
  happens inside the matmul kernel (SURVEY.md §7 design stance).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vit_cpp_tpu.gguf.dtypes import GGMLDType
from vit_cpp_tpu.gguf.reader import ModelFile, TensorRecord
from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.quant.qlinear import QuantLinear, _quant_linear_from_record


def _stack(leaves):
    if isinstance(leaves[0], QuantLinear):
        return QuantLinear(
            codes=jnp.stack([l.codes for l in leaves]),
            scales=jnp.stack([l.scales for l in leaves]),
            mins=(
                None
                if leaves[0].mins is None
                else jnp.stack([l.mins for l in leaves])
            ),
            qtype=leaves[0].qtype,
        )
    return jnp.stack(leaves)


def infer_moe_hparams(hp: VitHParams, tensors) -> VitHParams:
    """V-MoE family inference (ops/moe.py), shared by load_params and
    engine.detect_hparams: MoE layer placement is declared by
    blocks.{i}.moe.* tensor presence, the expert count by the per-expert
    tensor names, and top_k/capacity by the `meta.moe` marker's VALUES
    (unlike meta.clip, whose presence alone is the signal)."""
    import dataclasses
    import re

    moe_layers = sorted(
        int(m.group(1))
        for name in tensors
        if (m := re.fullmatch(r"blocks\.(\d+)\.moe\.router\.weight", name))
    )
    if not moe_layers or hp.num_experts:
        return hp
    l0 = moe_layers[0]
    n_exp = len(
        [
            n
            for n in tensors
            if re.fullmatch(
                rf"blocks\.{l0}\.moe\.experts\.\d+\.fc1\.weight", n
            )
        ]
    )
    if n_exp < 2:
        raise ValueError(
            f"MoE layer {l0} declares {n_exp} experts — need >= 2"
        )
    meta = tensors.get("meta.moe")
    if meta is None:
        raise ValueError(
            "checkpoint has blocks.*.moe tensors but no meta.moe "
            "marker (top_k/capacity) — truncated or mis-converted"
        )
    mv = meta.as_f32().reshape(-1)
    if mv.size != 2:
        raise ValueError(
            f"meta.moe must hold [top_k, capacity], got {mv.size} values"
        )
    hp = dataclasses.replace(
        hp,
        num_experts=n_exp,
        moe_layers=tuple(moe_layers),
        moe_top_k=int(mv[0]),
        moe_capacity=float(mv[1]),
    )
    if not 1 <= hp.moe_top_k <= n_exp:
        raise ValueError(
            f"meta.moe top_k {hp.moe_top_k} not in [1, {n_exp}]"
        )
    if hp.moe_capacity <= 0:
        raise ValueError(f"meta.moe capacity {hp.moe_capacity} <= 0")
    return hp


class _RecordSet:
    """Name-checked access over tensor records, mirroring the reference
    loader's strictness (unknown name / shape mismatch is an error,
    vit.cpp:618-641)."""

    def __init__(self, tensors: Dict[str, TensorRecord], dtype):
        self.tensors = dict(tensors)
        self.used = set()
        self.dtype = dtype

    def rec(self, name: str) -> TensorRecord:
        if name not in self.tensors:
            # ValueError, not KeyError: the loader's fail-fast convention
            # (reference: fprintf + early-exit, vit.cpp:618-622)
            raise ValueError(f"checkpoint missing tensor '{name}'")
        self.used.add(name)
        return self.tensors[name]

    def dense(self, name: str, shape: tuple) -> jax.Array:
        r = self.rec(name)
        arr = r.as_f32().reshape(shape)
        return jnp.asarray(arr, dtype=self.dtype)

    def kernel(self, name: str, out_f: int, in_f: int):
        """2-D linear weight -> (in, out) dense kernel or QuantLinear."""
        r = self.rec(name)
        if r.shape != (out_f, in_f):
            raise ValueError(
                f"tensor '{name}': shape {r.shape} != expected {(out_f, in_f)}"
            )
        if r.dtype.is_quantized:
            return _quant_linear_from_record(r)
        return jnp.asarray(r.as_f32().T, dtype=self.dtype)

    def check_all_used(self):
        unused = set(self.tensors) - self.used
        if unused:
            raise ValueError(f"unexpected tensors in checkpoint: {sorted(unused)}")


def load_params(
    mf: ModelFile,
    dtype=jnp.float32,
    hparams: Optional[VitHParams] = None,
) -> Dict[str, Any]:
    """Build the forward-pass parameter pytree from a parsed model file.

    `dtype` is the storage dtype for dense weights (f32 for parity,
    bfloat16 for throughput). Quantized weights keep their packed codes.
    """
    hp = hparams or mf.hparams
    h, L = hp.hidden_size, hp.num_hidden_layers

    # The legacy hparam block carries no MLP width (the reference family is
    # always 4x, vit.cpp:556-560). Non-4x checkpoints (ViT-g: 6144 on
    # hidden 1408) declare it through their fc1 tensor shape — trust that
    # when it is internally consistent, keep strict validation otherwise.
    if L > 0 and hp.mlp_hidden is None:
        fc1 = mf.tensors.get("blocks.0.mlp.fc1.weight")
        if (
            fc1 is not None
            and len(fc1.shape) == 2
            and fc1.shape[1] == h
            and fc1.shape[0] != hp.mlp_dim
        ):
            import dataclasses

            hp = dataclasses.replace(hp, mlp_hidden=int(fc1.shape[0]))

    # Family extensions declared by tensor presence (hparams.py): the
    # distillation token (DeiT) and the pre-blocks LayerNorm (CLIP-style).
    # The legacy hparam block cannot carry them, so like in_chans /
    # mlp_hidden they are re-inferred wherever the file is opened.
    import dataclasses

    if "dist_token" in mf.tensors and hp.num_prefix_tokens == 1:
        hp = dataclasses.replace(hp, num_prefix_tokens=2)
    if "cls_token" not in mf.tensors and hp.num_prefix_tokens == 1:
        # CLS-less avg-pool models (timm class_token=False, e.g. some
        # MAE/SigLIP-style encoders)
        hp = dataclasses.replace(hp, num_prefix_tokens=0)
    if "norm_pre.weight" in mf.tensors and not hp.norm_pre:
        hp = dataclasses.replace(hp, norm_pre=True)
    reg = mf.tensors.get("reg_token")
    if reg is not None and not hp.num_reg_tokens:
        # DINOv2-style registers: the (1, R, h) tensor declares R
        n_reg = int(np.prod(reg.shape)) // h
        hp = dataclasses.replace(hp, num_reg_tokens=n_reg)
    if "head.weight" not in mf.tensors and hp.num_classes:
        # genuinely headless files are WRITTEN with num_classes=0 in the
        # header (converter/save_params); a header that declares classes
        # while the head tensors are missing is corruption — fail fast
        # instead of silently serving embeddings (review r3)
        raise ValueError(
            f"header declares {hp.num_classes} classes but head.weight "
            "is missing — truncated or mis-converted checkpoint "
            "(headless encoders are written with num_classes=0)"
        )
    if "fc_norm.weight" in mf.tensors:
        if "norm.weight" in mf.tensors:
            raise ValueError(
                "checkpoint has both norm.weight and fc_norm.weight — "
                "timm ViTs carry exactly one (the other is Identity)"
            )
        if hp.global_pool != "avg":
            hp = dataclasses.replace(hp, global_pool="avg")
    if "attn_pool.probe" in mf.tensors and hp.global_pool != "map":
        # SigLIP family: attention pooling (hparams.py global_pool) +
        # [-1,1] pixel normalization at preprocess
        hp = dataclasses.replace(hp, global_pool="map", pixel_norm="unit")
    if "meta.clip" in mf.tensors and hp.hidden_act != "quick_gelu":
        # CLIP family marker (hparams.py hidden_act): QuickGELU block
        # MLPs + OpenAI CLIP pixel normalization — the one extension
        # hparam no real tensor's presence can declare
        hp = dataclasses.replace(
            hp, hidden_act="quick_gelu", pixel_norm="clip", eps=1e-5
        )
    pos = mf.tensors.get("pos_embed")
    if pos is not None and hp.n_prefix and not hp.no_embed_class:
        n_rows = int(np.prod(pos.shape)) // h
        if n_rows == hp.n_patches:
            # pos_embed covers the patch grid only (timm no_embed_class)
            hp = dataclasses.replace(hp, no_embed_class=True)
    if hp.num_prefix_tokens == 2 and hp.seq_len is not None:
        raise ValueError(
            "distilled checkpoints (dist_token) cannot carry a ViTSTR "
            "sequence head — the distillation token would shift the "
            "seq_len readout window"
        )
    if hp.global_pool == "avg" and hp.seq_len is not None:
        raise ValueError(
            "avg-pool checkpoints (fc_norm) cannot carry a ViTSTR "
            "sequence head — the readout needs per-token rows"
        )
    if hp.global_pool == "avg" and hp.num_prefix_tokens == 2:
        raise ValueError(
            "distilled checkpoints are token-pooled; fc_norm + dist_token "
            "is not a timm configuration"
        )
    if hp.num_prefix_tokens == 0 and hp.global_pool not in ("avg", "map"):
        raise ValueError(
            "checkpoint has no cls_token and no fc_norm — nothing to pool"
        )
    if hp.global_pool == "map" and hp.seq_len is not None:
        raise ValueError(
            "attention-pooled checkpoints (attn_pool) cannot carry a "
            "ViTSTR sequence head — the probe collapses the token axis"
        )
    if hp.global_pool == "map" and hp.num_prefix_tokens == 2:
        raise ValueError(
            "distilled checkpoints are token-pooled; attn_pool + "
            "dist_token is not a supported configuration"
        )
    if hp.num_reg_tokens and hp.num_prefix_tokens == 2:
        raise ValueError(
            "reg_token + dist_token is not a timm configuration "
            "(registers pair with plain or avg-pool ViTs)"
        )
    if hp.num_reg_tokens and hp.seq_len is not None:
        raise ValueError(
            "register tokens would shift the ViTSTR seq_len readout "
            "window — not a supported combination"
        )
    if hp.num_classes == 0 and hp.seq_len is not None:
        raise ValueError(
            "sequence-head checkpoints cannot be headless (the head IS "
            "the decoder)"
        )

    hp = infer_moe_hparams(hp, mf.tensors)
    if hp.num_experts and len(hp.moe_layers) >= L:
        raise ValueError(
            "every-layer MoE is not supported — at least one dense-MLP "
            "layer is required (V-MoE places experts in alternate blocks)"
        )

    rs = _RecordSet(mf.tensors, dtype)
    if "meta.clip" in mf.tensors:
        rs.rec("meta.clip")  # consume the marker (value unused)

    pe_w = rs.rec("patch_embed.proj.weight")
    expect_pe = (h, hp.in_chans, hp.patch_size, hp.patch_size)
    if pe_w.shape != expect_pe:
        raise ValueError(
            f"patch_embed.proj.weight: shape {pe_w.shape} != {expect_pe}"
        )
    # Non-overlapping patch conv == one matmul over flattened [c, py, px]
    # patch vectors (SURVEY.md §7 'Patch conv'); reference keeps this weight
    # f16 on disk (vit.cpp:515).
    pe_kernel = jnp.asarray(
        pe_w.as_f32().reshape(h, -1).T, dtype=dtype
    )

    params: Dict[str, Any] = {
        "pos_embed": rs.dense("pos_embed", (hp.n_pos_tokens, h)),
        "patch_embed": {
            "kernel": pe_kernel,
            "bias": rs.dense("patch_embed.proj.bias", (h,)),
        },
    }
    if hp.num_prefix_tokens >= 1:
        params["cls_token"] = rs.dense("cls_token", (h,))
    if hp.num_prefix_tokens == 2:
        params["dist_token"] = rs.dense("dist_token", (h,))
    if hp.num_reg_tokens:
        params["reg_token"] = rs.dense("reg_token", (hp.num_reg_tokens, h))
    if hp.norm_pre:
        params["norm_pre"] = {
            "scale": rs.dense("norm_pre.weight", (h,)),
            "bias": rs.dense("norm_pre.bias", (h,)),
        }

    moe_set = set(hp.moe_layers)
    blocks = []
    mlps = []  # dense-MLP layers' fc1/fc2 (all layers unless MoE)
    moes = []  # MoE layers' router + stacked experts
    for i in range(L):
        p = f"blocks.{i}."
        blocks.append(
            {
                "ln1": {
                    "scale": rs.dense(p + "norm1.weight", (h,)),
                    "bias": rs.dense(p + "norm1.bias", (h,)),
                },
                "qkv": {
                    "kernel": rs.kernel(p + "attn.qkv.weight", 3 * h, h),
                    "bias": rs.dense(p + "attn.qkv.bias", (3 * h,)),
                },
                "proj": {
                    "kernel": rs.kernel(p + "attn.proj.weight", h, h),
                    "bias": rs.dense(p + "attn.proj.bias", (h,)),
                },
                "ln2": {
                    "scale": rs.dense(p + "norm2.weight", (h,)),
                    "bias": rs.dense(p + "norm2.bias", (h,)),
                },
            }
        )
        if i in moe_set:
            # expert kernels dequantize to DENSE at load (the expert
            # einsum path is bf16; quantized files still shrink on disk)
            ek1, eb1, ek2, eb2 = [], [], [], []
            for ex in range(hp.num_experts):
                ep = f"{p}moe.experts.{ex}."
                r1 = rs.rec(ep + "fc1.weight")
                if r1.shape != (hp.mlp_dim, h):
                    raise ValueError(
                        f"tensor '{ep}fc1.weight': shape {r1.shape} != "
                        f"{(hp.mlp_dim, h)}"
                    )
                ek1.append(jnp.asarray(r1.as_f32().T, dtype=dtype))
                eb1.append(rs.dense(ep + "fc1.bias", (hp.mlp_dim,)))
                r2 = rs.rec(ep + "fc2.weight")
                if r2.shape != (h, hp.mlp_dim):
                    raise ValueError(
                        f"tensor '{ep}fc2.weight': shape {r2.shape} != "
                        f"{(h, hp.mlp_dim)}"
                    )
                ek2.append(jnp.asarray(r2.as_f32().T, dtype=dtype))
                eb2.append(rs.dense(ep + "fc2.bias", (h,)))
            rr = rs.rec(p + "moe.router.weight")
            if rr.shape != (hp.num_experts, h):
                raise ValueError(
                    f"tensor '{p}moe.router.weight': shape {rr.shape} != "
                    f"{(hp.num_experts, h)}"
                )
            moes.append(
                {
                    # router stays f32: tiny, argmax-fragile (ops/moe.py)
                    "router": {"kernel": jnp.asarray(rr.as_f32().T)},
                    "fc1": {"kernel": jnp.stack(ek1), "bias": jnp.stack(eb1)},
                    "fc2": {"kernel": jnp.stack(ek2), "bias": jnp.stack(eb2)},
                }
            )
        else:
            mlps.append(
                {
                    "fc1": {
                        "kernel": rs.kernel(p + "mlp.fc1.weight", hp.mlp_dim, h),
                        "bias": rs.dense(p + "mlp.fc1.bias", (hp.mlp_dim,)),
                    },
                    "fc2": {
                        "kernel": rs.kernel(p + "mlp.fc2.weight", h, hp.mlp_dim),
                        "bias": rs.dense(p + "mlp.fc2.bias", (h,)),
                    },
                }
            )
    stack_trees = lambda ts: jax.tree.map(
        lambda *ls: _stack(list(ls)),
        *ts,
        is_leaf=lambda x: isinstance(x, QuantLinear),
    )
    params["blocks"] = stack_trees(blocks)
    # fc1/fc2 stack over the DENSE-MLP layers only (leading dim L - Lm);
    # the MoE forward unrolls by layer index so the split is invisible
    # to it, and the scan path never runs for MoE models.
    params["blocks"].update(stack_trees(mlps))
    if moes:
        params["moe"] = stack_trees(moes)
        if "meta.moe" in rs.tensors:
            # consume the marker (values read above; explicit-hparams
            # callers — synthetic state dicts — may omit it)
            rs.rec("meta.moe")
    # avg-pool models normalize the pooled mean with fc_norm; it plays the
    # exact role of the final norm (LN after pooling), so it loads into
    # the same slot and the forward stays single-pathed.
    norm_name = "fc_norm" if hp.global_pool == "avg" else "norm"
    params["norm"] = {
        "scale": rs.dense(norm_name + ".weight", (h,)),
        "bias": rs.dense(norm_name + ".bias", (h,)),
    }
    if hp.global_pool == "map":
        # SigLIP attention-pooling head (attention_pool, models/vit.py):
        # probe + packed qkv + out-proj + residual MLP; kernels load like
        # block kernels so quantized files serve through the same leaves
        m = hp.mlp_dim
        params["attn_pool"] = {
            "probe": rs.dense("attn_pool.probe", (h,)),
            "qkv": {
                "kernel": rs.kernel("attn_pool.qkv.weight", 3 * h, h),
                "bias": rs.dense("attn_pool.qkv.bias", (3 * h,)),
            },
            "proj": {
                "kernel": rs.kernel("attn_pool.proj.weight", h, h),
                "bias": rs.dense("attn_pool.proj.bias", (h,)),
            },
            "norm": {
                "scale": rs.dense("attn_pool.norm.weight", (h,)),
                "bias": rs.dense("attn_pool.norm.bias", (h,)),
            },
            "fc1": {
                "kernel": rs.kernel("attn_pool.mlp.fc1.weight", m, h),
                "bias": rs.dense("attn_pool.mlp.fc1.bias", (m,)),
            },
            "fc2": {
                "kernel": rs.kernel("attn_pool.mlp.fc2.weight", h, m),
                "bias": rs.dense("attn_pool.mlp.fc2.bias", (h,)),
            },
        }
    if hp.num_classes:
        params["head"] = {
            "kernel": rs.kernel("head.weight", hp.num_classes, h),
            "bias": rs.dense("head.bias", (hp.num_classes,)),
        }
    if hp.num_prefix_tokens == 2:
        # the distilled head pairs with dist_token; rs.rec raises the
        # loader's fail-fast ValueError if the checkpoint has one without
        # the other
        params["head_dist"] = {
            "kernel": rs.kernel("head_dist.weight", hp.num_classes, h),
            "bias": rs.dense("head_dist.bias", (hp.num_classes,)),
        }
    rs.check_all_used()
    return params


def params_from_state_dict(
    state: Dict[str, np.ndarray], hp: VitHParams, dtype=jnp.float32
) -> Dict[str, Any]:
    """Build params directly from an f32 state dict (testing / training)."""
    tensors = {
        name: TensorRecord(name, arr.shape, GGMLDType.F32, arr.astype(np.float32))
        for name, arr in state.items()
    }
    mf = ModelFile(hparams=hp, id2label={}, tensors=tensors)
    return load_params(mf, dtype=dtype, hparams=hp)
