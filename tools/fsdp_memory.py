"""Measure per-device TRAINING-STATE memory with and without FSDP.

Builds the real sharded TrainState (params + AdamW mu/nu + scalars) on the
8-virtual-device CPU mesh and sums device 0's addressable shard bytes —
the quantity FSDP exists to shrink (activations are governed by remat and
are identical either way). Evidence behind docs/TUNING.md "FSDP training
state"; run:

    python tools/fsdp_memory.py [--sizes base,large] [--dp 8] [--tp 1]

Forces an 8-virtual-device CPU platform itself (env-var routes are eaten
by the axon TPU plugin on this harness — CLAUDE.md environment rules).
"""

import argparse
import os
import sys

sys.path.append("/root/repo")

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


GEOMETRIES = {
    "base": dict(hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, num_classes=1000,
                 patch_size=16, img_size=224),
    "large": dict(hidden_size=1024, num_hidden_layers=24,
                  num_attention_heads=16, num_classes=1000,
                  patch_size=16, img_size=224, mlp_hidden=4096),
    "giant": dict(hidden_size=1408, num_hidden_layers=40,
                  num_attention_heads=16, num_classes=1000,
                  patch_size=14, img_size=224, mlp_hidden=6144),
}


def state_bytes_on_device0(state) -> int:
    import jax
    import numpy as np

    total = 0
    for leaf in jax.tree.leaves(state):
        if not hasattr(leaf, "sharding"):
            continue
        shard = leaf.sharding.shard_shape(leaf.shape)
        total += int(np.prod(shard)) * leaf.dtype.itemsize
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="base,large")
    ap.add_argument("--dp", type=int, default=8)
    ap.add_argument("--tp", type=int, default=1)
    args = ap.parse_args()

    import jax

    from vit_cpp_tpu.hparams import VitHParams
    from vit_cpp_tpu.models import params_from_state_dict
    from vit_cpp_tpu.parallel.mesh import make_mesh
    from vit_cpp_tpu.parallel.train import create_train_state, make_optimizer
    from vit_cpp_tpu.testing.synthetic import random_state_dict

    mesh = make_mesh(dp=args.dp, tp=args.tp)
    optimizer = make_optimizer()
    print(f"devices={len(jax.devices())} mesh=dp{args.dp}xtp{args.tp}")
    print(f"{'geometry':<8} {'params':>10} {'state/dev (dp+tp)':>18} "
          f"{'state/dev (+fsdp)':>18} {'shrink':>7}")
    for name in args.sizes.split(","):
        hp = VitHParams(**GEOMETRIES[name])
        params = params_from_state_dict(random_state_dict(hp, seed=0), hp)
        n_params = sum(
            int(l.size) for l in jax.tree.leaves(params) if hasattr(l, "size")
        )
        per_dev = {}
        for fsdp in (False, True):
            with mesh:
                st = create_train_state(params, mesh, optimizer, fsdp=fsdp)
            per_dev[fsdp] = state_bytes_on_device0(st)
            del st
        mb = lambda b: f"{b / 1e6:,.0f} MB"
        print(f"{name:<8} {n_params / 1e6:>8.1f}M {mb(per_dev[False]):>18} "
              f"{mb(per_dev[True]):>18} "
              f"{per_dev[False] / per_dev[True]:>6.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
