"""Export a parameter pytree back to the model file format.

Inverse of models/params.load_params: turns the (possibly fine-tuned, see
parallel/train.py) forward-pass pytree back into the reference tensor-name
schema (SURVEY.md §2.4) and writes a gguf file the reference engine — or
this one — can load. The reference has no C++ writer besides the
quantizer's stream rewriter (quantize.cpp:110-151); training was out of its
scope, so this closes the fine-tune -> serve loop the TPU build adds.

Quantized pytrees are exported by materializing dense f32 weights first
(use cli/quantize.py afterwards to re-quantize; round-tripping packed
codes directly would invent data the formats can't represent).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from vit_cpp_tpu.gguf.writer import write_model
from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.quant.qlinear import QuantLinear
from vit_cpp_tpu.testing.synthetic import state_dict_records


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _kernel_to_torch(kernel) -> np.ndarray:
    """(in, out) pytree kernel -> torch-order (out, in) f32."""
    if isinstance(kernel, QuantLinear):
        return _np(kernel.dequantize()).T
    return _np(kernel).T


def params_to_state_dict(
    params: Dict[str, Any], hp: VitHParams
) -> Dict[str, np.ndarray]:
    """Forward-pass pytree -> reference-schema torch-order state dict."""
    h = hp.hidden_size
    pos = _np(params["pos_embed"])
    out: Dict[str, np.ndarray] = {
        # row count from the array itself: hp may predate the loader's
        # prefix-token inference (distilled models carry n_patches + 2
        # rows; no_embed_class models carry n_patches)
        "pos_embed": pos.reshape(1, pos.shape[-2], h),
        # pytree stores the flattened (p*p*c, h) matmul kernel; the file
        # stores the conv layout (h, c, p, p) (vit.cpp:515)
        "patch_embed.proj.weight": _np(params["patch_embed"]["kernel"])
        .T.reshape(h, hp.in_chans, hp.patch_size, hp.patch_size),
        "patch_embed.proj.bias": _np(params["patch_embed"]["bias"]).reshape(
            1, h, 1, 1
        ),
    }
    if "head" in params:  # headless encoders carry no classifier
        out["head.weight"] = _kernel_to_torch(params["head"]["kernel"])
        out["head.bias"] = _np(params["head"]["bias"])
    if "cls_token" in params:
        out["cls_token"] = _np(params["cls_token"]).reshape(1, 1, h)
    if "reg_token" in params:
        reg = _np(params["reg_token"])
        out["reg_token"] = reg.reshape(1, reg.shape[-2], h)
    # avg-pool pytrees hold fc_norm in the 'norm' slot (models/params.py)
    norm_name = "fc_norm" if hp.global_pool == "avg" else "norm"
    out[norm_name + ".weight"] = _np(params["norm"]["scale"])
    out[norm_name + ".bias"] = _np(params["norm"]["bias"])
    # Optional family extensions (models/params.py): pre-norm LN,
    # distillation token + head. Folded pytrees (scale=None) cannot be
    # exported — save_params callers always hold unfolded params.
    if "norm_pre" in params:
        out["norm_pre.weight"] = _np(params["norm_pre"]["scale"])
        out["norm_pre.bias"] = _np(params["norm_pre"]["bias"])
    if "dist_token" in params:
        out["dist_token"] = _np(params["dist_token"]).reshape(1, 1, h)
    if "head_dist" in params:
        out["head_dist.weight"] = _kernel_to_torch(params["head_dist"]["kernel"])
        out["head_dist.bias"] = _np(params["head_dist"]["bias"])
    if hp.hidden_act == "quick_gelu":
        # CLIP family marker: hparams no tensor's presence can declare
        out["meta.clip"] = np.ones((1,), np.float32)
    if "attn_pool" in params:  # SigLIP attention-pooling head
        ap = params["attn_pool"]
        out["attn_pool.probe"] = _np(ap["probe"]).reshape(1, 1, h)
        out["attn_pool.qkv.weight"] = _kernel_to_torch(ap["qkv"]["kernel"])
        out["attn_pool.qkv.bias"] = _np(ap["qkv"]["bias"])
        out["attn_pool.proj.weight"] = _kernel_to_torch(ap["proj"]["kernel"])
        out["attn_pool.proj.bias"] = _np(ap["proj"]["bias"])
        out["attn_pool.norm.weight"] = _np(ap["norm"]["scale"])
        out["attn_pool.norm.bias"] = _np(ap["norm"]["bias"])
        out["attn_pool.mlp.fc1.weight"] = _kernel_to_torch(ap["fc1"]["kernel"])
        out["attn_pool.mlp.fc1.bias"] = _np(ap["fc1"]["bias"])
        out["attn_pool.mlp.fc2.weight"] = _kernel_to_torch(ap["fc2"]["kernel"])
        out["attn_pool.mlp.fc2.bias"] = _np(ap["fc2"]["bias"])
    blocks = params["blocks"]

    def layer(tree, i):
        import jax

        def slice_leaf(a):
            if isinstance(a, QuantLinear):
                return QuantLinear(
                    codes=a.codes[i],
                    scales=a.scales[i],
                    mins=None if a.mins is None else a.mins[i],
                    qtype=a.qtype,
                )
            return a[i]

        return jax.tree.map(
            slice_leaf, tree, is_leaf=lambda x: isinstance(x, QuantLinear)
        )

    moe_set = set(hp.moe_layers) if hp.num_experts else set()
    di = mi = 0
    for i in range(hp.num_hidden_layers):
        bp = {
            k: layer(blocks[k], i) for k in ("ln1", "qkv", "proj", "ln2")
        }
        p = f"blocks.{i}."
        out.update(
            {
                p + "norm1.weight": _np(bp["ln1"]["scale"]),
                p + "norm1.bias": _np(bp["ln1"]["bias"]),
                p + "attn.qkv.weight": _kernel_to_torch(bp["qkv"]["kernel"]),
                p + "attn.qkv.bias": _np(bp["qkv"]["bias"]),
                p + "attn.proj.weight": _kernel_to_torch(bp["proj"]["kernel"]),
                p + "attn.proj.bias": _np(bp["proj"]["bias"]),
                p + "norm2.weight": _np(bp["ln2"]["scale"]),
                p + "norm2.bias": _np(bp["ln2"]["bias"]),
            }
        )
        if i in moe_set:
            mp = layer(params["moe"], mi)
            mi += 1
            # router stored torch-order (E, h) like every linear weight
            out[p + "moe.router.weight"] = _np(mp["router"]["kernel"]).T
            for ex in range(hp.num_experts):
                ep = f"{p}moe.experts.{ex}."
                out[ep + "fc1.weight"] = _np(mp["fc1"]["kernel"][ex]).T
                out[ep + "fc1.bias"] = _np(mp["fc1"]["bias"][ex])
                out[ep + "fc2.weight"] = _np(mp["fc2"]["kernel"][ex]).T
                out[ep + "fc2.bias"] = _np(mp["fc2"]["bias"][ex])
        else:
            fc1, fc2 = layer(blocks["fc1"], di), layer(blocks["fc2"], di)
            di += 1
            out.update(
                {
                    p + "mlp.fc1.weight": _kernel_to_torch(fc1["kernel"]),
                    p + "mlp.fc1.bias": _np(fc1["bias"]),
                    p + "mlp.fc2.weight": _kernel_to_torch(fc2["kernel"]),
                    p + "mlp.fc2.bias": _np(fc2["bias"]),
                }
            )
    if moe_set:
        # V-MoE marker: top_k/capacity by VALUE (models/params.py reads
        # them back; layer placement is declared by tensor presence)
        out["meta.moe"] = np.asarray(
            [hp.moe_top_k, hp.moe_capacity], np.float32
        )
    return out


def save_params(
    path: str,
    params: Dict[str, Any],
    hp: VitHParams,
    id2label: Optional[Dict[int, str]] = None,
    ftype: int = 1,
) -> None:
    """Write the pytree as a model file (ftype 0=f32, 1=f16 dtype rules)."""
    state = params_to_state_dict(params, hp)
    if id2label is None:
        id2label = {i: f"LABEL_{i}" for i in range(hp.num_classes)}
    write_model(path, hp, id2label, state_dict_records(state, ftype), ftype)
