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

from vit_cpp_tpu.quant.qlinear import QuantLinear


def _kernel_spec(kernel, col_parallel: bool, stacked: bool = True):
    """Spec for a ([L,] in, out) kernel — dense array or QuantLinear."""
    if col_parallel:
        spec = P(None, None, "model") if stacked else P(None, "model")
    else:
        spec = P(None, "model", None) if stacked else P("model", None)
    if isinstance(kernel, QuantLinear):
        return QuantLinear(
            codes=spec,
            scales=spec,
            mins=None if kernel.mins is None else spec,
            qtype=0,
        )
    return spec


def param_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching a load_params() pytree."""
    b = params["blocks"]
    return {
        "cls_token": P(),
        "pos_embed": P(),
        "patch_embed": {"kernel": P(), "bias": P()},
        "blocks": {
            "ln1": {"scale": P(), "bias": P()},
            "qkv": {
                "kernel": _kernel_spec(b["qkv"]["kernel"], col_parallel=True),
                "bias": P(None, "model"),
            },
            "proj": {
                "kernel": _kernel_spec(b["proj"]["kernel"], col_parallel=False),
                "bias": P(),
            },
            "ln2": {"scale": P(), "bias": P()},
            "fc1": {
                "kernel": _kernel_spec(b["fc1"]["kernel"], col_parallel=True),
                "bias": P(None, "model"),
            },
            "fc2": {
                "kernel": _kernel_spec(b["fc2"]["kernel"], col_parallel=False),
                "bias": P(),
            },
        },
        "norm": {"scale": P(), "bias": P()},
        "head": {
            "kernel": _kernel_spec(
                params["head"]["kernel"], col_parallel=True, stacked=False
            ),
            "bias": P("model"),
        },
    }


def batch_pspec() -> P:
    return P("data")


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """device_put the param pytree with TP/replicated shardings."""
    specs = param_pspecs(params)
    is_q = lambda x: isinstance(x, QuantLinear)

    def put(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    def put_node(leaf, spec):
        if is_q(leaf):
            return QuantLinear(
                codes=put(leaf.codes, spec.codes),
                scales=put(leaf.scales, spec.scales),
                mins=None if leaf.mins is None else put(leaf.mins, spec.mins),
                qtype=leaf.qtype,
            )
        return put(leaf, spec)

    return jax.tree.map(put_node, params, specs, is_leaf=is_q)
