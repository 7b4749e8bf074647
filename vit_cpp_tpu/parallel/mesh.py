"""Device mesh construction.

The reference's only parallelism is a CPU thread pool inside
ggml_graph_compute (SURVEY.md §2.6); it has no distributed backend (§2.7).
The TPU-native equivalents are a 2-D `jax.sharding.Mesh`:

- axis "data"  — data parallelism for throughput serving / training
  (batch sharded, gradients psum over ICI);
- axis "model" — tensor parallelism over attention heads and MLP features
  (megatron-style column/row splits; XLA inserts the all-reduces).

Training additionally supports FSDP/ZeRO-3 over the "data" axis
(parallel/sharding.fsdp_pspecs): params and AdamW moments shard dp-fold,
for models whose optimizer state exceeds one chip's HBM.

Pipeline/sequence/expert parallelism are deliberate non-goals at ViT scale
(max 785 tokens, SURVEY.md §2.6): the whole model fits on one chip, so depth
beyond dp x tp (+ FSDP for training state) buys nothing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults: use every device, all data-parallel (tp=1) — the right shape
    for ViT serving where one chip holds the whole model.
    """
    if devices is None:
        devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)} available")
    devices = list(devices)[:n]
    if tp is None and dp is None:
        dp, tp = n, 1
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != n_devices({n})")
    grid = np.asarray(devices).reshape(dp, tp)
    return Mesh(grid, axis_names=("data", "model"))
