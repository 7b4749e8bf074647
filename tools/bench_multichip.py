"""Multi-chip serving throughput bench over a ('data','model') mesh.

The harness has one physical TPU chip, so real multi-chip numbers are a
known gap (STATUS.md); this tool is the measurement half, ready to run
unchanged on a real pod slice. On a TPU host it uses the real devices; on
CPU it builds the N-device virtual mesh (the same path the driver's
dryrun validates) so the sharding/collective program is exercised and
timed end to end.

    python tools/bench_multichip.py                 # all local devices, dp only
    python tools/bench_multichip.py --dp 4 --tp 2   # explicit mesh
    python tools/bench_multichip.py --cpu 8         # 8 virtual CPU devices

Prints one JSON line: images/sec across the mesh + per-chip rate, so pod
results are directly comparable with bench.py's single-chip numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="force N virtual CPU devices (validation mode)")
    ap.add_argument("--dp", type=int, default=0, help="data axis (0 = all/tp)")
    ap.add_argument("--tp", type=int, default=1, help="model axis")
    ap.add_argument("--batch-per-chip", type=int, default=128)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument(
        "--size", choices=["tiny", "small", "base", "large"], default="base"
    )
    ap.add_argument("--quant", choices=["none", "q8_0"], default="none")
    ap.add_argument("--mm", choices=["xla", "int8"], default="int8")
    ap.add_argument(
        "--attn", choices=["xla", "pallas", "pallas-fast"], default=None,
        help="default: pallas-fast on TPU, xla elsewhere",
    )
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.cpu}"
            ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vit_cpp_tpu.hparams import VitHParams
    from vit_cpp_tpu.models import params_from_state_dict
    from vit_cpp_tpu.models.vit import forward
    from vit_cpp_tpu.parallel.mesh import make_mesh
    from vit_cpp_tpu.parallel.sharding import shard_params
    from vit_cpp_tpu.testing.synthetic import random_state_dict

    n = len(jax.devices())
    tp = args.tp
    dp = args.dp or n // tp
    if dp * tp != n:
        raise SystemExit(f"dp({dp}) x tp({tp}) != devices({n})")
    mesh = make_mesh(n_devices=n, dp=dp, tp=tp)
    attn = args.attn or ("pallas-fast" if jax.default_backend() == "tpu" else "xla")

    geo = {
        "tiny": (192, 12, 3),
        "small": (384, 12, 6),
        "base": (768, 12, 12),
        "large": (1024, 24, 16),
    }[args.size]
    hp = VitHParams(
        hidden_size=geo[0],
        num_hidden_layers=geo[1],
        num_attention_heads=geo[2],
        num_classes=1000,
        patch_size=16,
        img_size=224,
    )
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params = params_from_state_dict(random_state_dict(hp, seed=0), hp, dtype=dtype)
    if args.mm == "int8":
        from vit_cpp_tpu.quant.int8 import convert_params_to_int8

        params = convert_params_to_int8(params)

    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = args.batch_per_chip * dp
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((batch, 3, hp.img_size, hp.img_size)), dtype=dtype
    )
    with mesh:
        params = shard_params(params, mesh)
        images = jax.device_put(images, NamedSharding(mesh, P("data")))

        @jax.jit
        def chained(p, x0):
            cls = p["cls_token"]

            def step(c, _):
                p2 = dict(p, cls_token=cls + (c * 1e-30).astype(cls.dtype))
                out = forward(p2, x0, hp, attn_impl=attn, mm_impl=args.mm)
                return out[0, 0].astype(cls.dtype), ()

            cK, _ = jax.lax.scan(
                step, jnp.zeros((), cls.dtype), None, length=args.chain
            )
            return cK

        _ = np.asarray(chained(params, images))  # compile + warmup
        t0 = time.perf_counter()
        _ = np.asarray(chained(params, images))
        dt = time.perf_counter() - t0

    ips = batch * args.chain / dt
    print(
        json.dumps(
            {
                "metric": f"images_per_sec_vit{args.size}16_224_mesh",
                "value": round(ips, 1),
                "unit": "images/sec",
                "per_chip": round(ips / n, 1),
                "mesh": {"data": dp, "model": tp, "devices": n},
                "backend": jax.default_backend(),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
