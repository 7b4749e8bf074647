"""Partition specs for the ViT parameter pytree.

Megatron-style tensor parallelism over the ('data', 'model') mesh:

- qkv / fc1 kernels are column-parallel (output features sharded over
  "model" — equivalently: attention heads / MLP neurons split across chips);
- proj / fc2 kernels are row-parallel (input features sharded; XLA inserts
  the partial-sum all-reduce after the matmul);
- embeddings, layernorms and small biases are replicated;
- the classifier head is column-parallel over classes;
- activations/batch are sharded over "data".

Specs are shaped for the stacked-blocks layout produced by
vit_cpp_tpu.models.params.load_params (leading L axis on block params).
QuantLinear nodes store codes/scales in the same (in, out) matmul
orientation as dense kernels, so they take identical partition specs
(column-parallel shards the out dim, row-parallel the in dim; per-block
scales shard along in//32 consistently).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_cpp_tpu.quant.int8 import Int8Linear
from vit_cpp_tpu.quant.qlinear import QuantLinear


def _kernel_spec(kernel, col_parallel: bool, stacked: bool = True):
    """Spec for a ([L,] in, out) kernel — dense array, QuantLinear, or
    the W8A8 serving representation Int8Linear (codes share the dense
    kernel's spec; the per-output-channel scale shards with the out dim,
    i.e. only under column parallelism; static act_scale is replicated)."""
    if col_parallel:
        spec = P(None, None, "model") if stacked else P(None, "model")
        scale_spec = P(None, "model") if stacked else P("model")
    else:
        spec = P(None, "model", None) if stacked else P("model", None)
        scale_spec = P()  # scale is per-OUT channel: replicated here
    if isinstance(kernel, QuantLinear):
        return QuantLinear(
            codes=spec,
            scales=spec,
            mins=None if kernel.mins is None else spec,
            qtype=0,
        )
    if isinstance(kernel, Int8Linear):
        return Int8Linear(
            codes=spec,
            scale=scale_spec,
            act_scale=None if kernel.act_scale is None else P(),
        )
    return spec


def param_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching a load_params() pytree.

    Folded-LN pytrees (models/fold.py) carry scale=None/bias=None on the
    folded LN nodes; those positions get spec None so the tree structures
    match (replicating nothing is a no-op either way)."""
    b = params["blocks"]

    def _ln(node):
        return {k: None if node[k] is None else P() for k in ("scale", "bias")}

    specs: Dict[str, Any] = {
        "pos_embed": P(),
        "patch_embed": {"kernel": P(), "bias": P()},
        "blocks": {
            "ln1": _ln(b["ln1"]),
            "qkv": {
                "kernel": _kernel_spec(b["qkv"]["kernel"], col_parallel=True),
                "bias": P(None, "model"),
            },
            "proj": {
                "kernel": _kernel_spec(b["proj"]["kernel"], col_parallel=False),
                "bias": P(),
            },
            "ln2": _ln(b["ln2"]),
            "fc1": {
                "kernel": _kernel_spec(b["fc1"]["kernel"], col_parallel=True),
                "bias": P(None, "model"),
            },
            "fc2": {
                "kernel": _kernel_spec(b["fc2"]["kernel"], col_parallel=False),
                "bias": P(),
            },
        },
        "norm": _ln(params["norm"]),
    }
    if "head" in params:  # absent on headless encoders (num_classes=0)
        specs["head"] = {
            "kernel": _kernel_spec(
                params["head"]["kernel"], col_parallel=True, stacked=False
            ),
            "bias": P("model"),
        }
    # Optional family extensions (DeiT distilled / pre-norm / CLS-less
    # avg-pool, models/params): the prefix tokens and pre-norm LN
    # replicate like their CLS / final-norm counterparts; head_dist is
    # column-parallel like head.
    if "cls_token" in params:
        specs["cls_token"] = P()
    if "dist_token" in params:
        specs["dist_token"] = P()
    if "reg_token" in params:
        specs["reg_token"] = P()
    if "attn_pool" in params:
        # SigLIP attention-pooling head: a single-probe cross-attention
        # over ~h-wide projections — negligible FLOPs next to the blocks,
        # so every leaf replicates rather than carrying TP collectives

        def _rep_kernel(kernel):
            if isinstance(kernel, QuantLinear):
                return QuantLinear(
                    codes=P(), scales=P(),
                    mins=None if kernel.mins is None else P(), qtype=0,
                )
            if isinstance(kernel, Int8Linear):
                return Int8Linear(
                    codes=P(), scale=P(),
                    act_scale=None if kernel.act_scale is None else P(),
                )
            return P()

        ap = params["attn_pool"]
        specs["attn_pool"] = {
            "probe": P(),
            **{
                k: {"kernel": _rep_kernel(ap[k]["kernel"]), "bias": P()}
                for k in ("qkv", "proj", "fc1", "fc2")
            },
            "norm": _ln(ap["norm"]),
        }
    if "moe" in params:
        # V-MoE expert parallelism (ops/moe.py): the stacked (Lm, E, ...)
        # expert kernels shard E over "model" — each chip holds E/tp
        # experts and GSPMD inserts the all-to-alls around the expert
        # einsums (dispatch/combine stay batch-sharded over "data").
        # The router is tiny and argmax-fragile: replicated.
        specs["moe"] = {
            "router": {"kernel": P()},
            "fc1": {
                "kernel": P(None, "model", None, None),
                "bias": P(None, "model", None),
            },
            "fc2": {
                "kernel": P(None, "model", None, None),
                "bias": P(None, "model", None),
            },
        }
    if "norm_pre" in params:
        specs["norm_pre"] = _ln(params["norm_pre"])
    if "head_dist" in params:
        specs["head_dist"] = {
            "kernel": _kernel_spec(
                params["head_dist"]["kernel"], col_parallel=True, stacked=False
            ),
            "bias": P("model"),
        }
    return specs


def fsdp_pspecs(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """ZeRO-3 specs: TP specs + every dense >=2-D leaf sharded over "data".

    Fully-sharded data parallelism for TRAINING: the AdamW state inherits
    parameter shardings leaf-for-leaf (parallel/train.create_train_state),
    so params + grads + both moments all shrink dp-fold per device — a
    ViT-g AdamW state (~16 GB in f32: params, mu, nu, master grads) that
    cannot fit one v5e trains on a dp=8 slice at ~2 GB/device. XLA/GSPMD
    inserts the all-gathers at each layer's use and reduce-scatters the
    grads back to the shards (the scaling-book FSDP recipe: annotate,
    don't hand-roll collectives).

    Per dense leaf the LARGEST dim not already TP-sharded and divisible
    by the "data" axis takes the extra sharding; leaves where no dim
    divides (small biases, odd token counts) keep their TP spec — memory
    loss is negligible, and per-leaf degradation beats shard_params'
    whole-leaf replicate fallback here. Quantized leaves (QuantLinear /
    Int8Linear) keep TP-only specs: they are serving-side, where there is
    no optimizer state to shard and weights are already 4-8x smaller.
    """
    dp = mesh.shape["data"]
    base = param_pspecs(params)
    is_q = lambda x: isinstance(x, (QuantLinear, Int8Linear))

    def widen(leaf, spec):
        if is_q(leaf) or not hasattr(leaf, "ndim") or leaf.ndim < 2:
            return spec
        entries = list(spec) + [None] * (leaf.ndim - len(spec))
        free = [
            i for i, e in enumerate(entries)
            if e is None and leaf.shape[i] % dp == 0
        ]
        if not free:
            return spec
        pick = max(free, key=lambda i: leaf.shape[i])
        entries[pick] = "data"
        return P(*entries)

    return jax.tree.map(widen, params, base, is_leaf=is_q)


def batch_pspec() -> P:
    return P("data")


def shard_params(
    params: Dict[str, Any], mesh: Mesh, fsdp: bool = False
) -> Dict[str, Any]:
    """device_put the param pytree with TP/replicated shardings
    (`fsdp=True` adds the ZeRO-3 "data"-axis sharding, fsdp_pspecs)."""
    specs = fsdp_pspecs(params, mesh) if fsdp else param_pspecs(params)
    is_q = lambda x: isinstance(x, (QuantLinear, Int8Linear))

    def _divisible(shape, spec) -> bool:
        for dim, entry in zip(shape, spec):
            if entry is None:
                continue
            axes = entry if isinstance(entry, tuple) else (entry,)
            size = 1
            for ax in axes:
                size *= mesh.shape[ax]
            if dim % size:
                return False
        return True

    def put(leaf, spec):
        if not _divisible(leaf.shape, spec):
            # dim not divisible by the mesh axis (e.g. a 5-class demo
            # head on tp=2): replicate that leaf instead of failing —
            # XLA still runs the matmul, just without splitting it.
            # Explicit check + warning, NOT a blanket except: a genuine
            # spec bug must still raise, and a silently-replicated model
            # (no TP speedup) must not be silent.
            import warnings

            warnings.warn(
                f"shard_params: leaf shape {tuple(leaf.shape)} does not "
                f"divide mesh axes in spec {spec}; replicating this leaf"
            )
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    def put_node(leaf, spec):
        if isinstance(leaf, QuantLinear):
            return QuantLinear(
                codes=put(leaf.codes, spec.codes),
                scales=put(leaf.scales, spec.scales),
                mins=None if leaf.mins is None else put(leaf.mins, spec.mins),
                qtype=leaf.qtype,
            )
        if isinstance(leaf, Int8Linear):
            return Int8Linear(
                codes=put(leaf.codes, spec.codes),
                scale=put(leaf.scale, spec.scale),
                act_scale=None
                if leaf.act_scale is None
                else put(leaf.act_scale, spec.act_scale),
            )
        return put(leaf, spec)

    return jax.tree.map(put_node, params, specs, is_leaf=is_q)
