"""PyTorch-vs-vit_cpp_tpu comparison benchmark.

Rebuild of the reference's scripts/benchmark.py (SURVEY.md C15): time the
same ViT forward in eager PyTorch (CPU, fp32) and in this framework, with
peak-RSS tracking. Where the reference instantiates timm pretrained models,
this version works offline: it builds a plain-torch ViT from the same
random state dict that seeds the JAX engine, so both stacks run identical
weights (timm is used when importable, matching the reference's model ids).

Usage:
  python scripts/benchmark.py --sizes tiny small --runs 5 --img 224
"""

from __future__ import annotations

import argparse
import resource
import sys
import time

import numpy as np

sys.path.insert(0, ".")  # repo root

from vit_cpp_tpu.hparams import VitHParams  # noqa: E402
from vit_cpp_tpu.testing.synthetic import random_state_dict  # noqa: E402

# timm ViT family geometry (reference scripts/benchmark.py:13-18 model ids)
SIZES = {
    "tiny": dict(hidden_size=192, num_hidden_layers=12, num_attention_heads=3),
    "small": dict(hidden_size=384, num_hidden_layers=12, num_attention_heads=6),
    "base": dict(hidden_size=768, num_hidden_layers=12, num_attention_heads=12),
    "large": dict(hidden_size=1024, num_hidden_layers=24, num_attention_heads=16),
}


def peak_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def build_torch_vit(state, hp: VitHParams):
    """Plain-torch ViT with the reference architecture (SURVEY.md §2.1),
    weights loaded from the shared state dict."""
    import torch
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            h = hp.hidden_size
            self.norm1 = nn.LayerNorm(h, eps=hp.eps)
            self.qkv = nn.Linear(h, 3 * h)
            self.proj = nn.Linear(h, h)
            self.norm2 = nn.LayerNorm(h, eps=hp.eps)
            self.fc1 = nn.Linear(h, hp.mlp_dim)
            self.fc2 = nn.Linear(hp.mlp_dim, h)

        def forward(self, x):
            b, t, h = x.shape
            nh, hd = hp.num_attention_heads, hp.head_dim
            y = self.norm1(x)
            qkv = self.qkv(y).reshape(b, t, 3, nh, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            a = torch.softmax(q @ k.transpose(-1, -2) / hd**0.5, dim=-1)
            o = (a @ v).transpose(1, 2).reshape(b, t, h)
            x = x + self.proj(o)
            y = self.norm2(x)
            y = self.fc2(torch.nn.functional.gelu(self.fc1(y), approximate="tanh"))
            return x + y

    class TorchViT(nn.Module):
        def __init__(self):
            super().__init__()
            h = hp.hidden_size
            self.patch = nn.Conv2d(
                hp.in_chans, h, hp.patch_size, stride=hp.patch_size
            )
            self.cls = nn.Parameter(torch.zeros(1, 1, h))
            self.pos = nn.Parameter(torch.zeros(1, hp.n_tokens, h))
            self.blocks = nn.ModuleList(
                [Block() for _ in range(hp.num_hidden_layers)]
            )
            self.norm = nn.LayerNorm(h, eps=hp.eps)
            self.head = nn.Linear(h, hp.num_classes)

        def forward(self, x):
            b = x.shape[0]
            x = self.patch(x).flatten(2).transpose(1, 2)
            x = torch.cat([self.cls.expand(b, -1, -1), x], dim=1) + self.pos
            for blk in self.blocks:
                x = blk(x)
            return self.head(self.norm(x[:, 0]))

    m = TorchViT()
    sd = {}
    t = lambda a: torch.from_numpy(np.ascontiguousarray(a))
    sd["patch.weight"] = t(state["patch_embed.proj.weight"])
    sd["patch.bias"] = t(state["patch_embed.proj.bias"].reshape(-1))
    sd["cls"] = t(state["cls_token"])
    sd["pos"] = t(state["pos_embed"])
    for i in range(hp.num_hidden_layers):
        s, d = f"blocks.{i}.", f"blocks.{i}."
        for a, b in [
            ("norm1", "norm1"),
            ("attn.qkv", "qkv"),
            ("attn.proj", "proj"),
            ("norm2", "norm2"),
            ("mlp.fc1", "fc1"),
            ("mlp.fc2", "fc2"),
        ]:
            sd[d + b + ".weight"] = t(state[s + a + ".weight"])
            sd[d + b + ".bias"] = t(state[s + a + ".bias"])
    sd["norm.weight"] = t(state["norm.weight"])
    sd["norm.bias"] = t(state["norm.bias"])
    sd["head.weight"] = t(state["head.weight"])
    sd["head.bias"] = t(state["head.bias"])
    m.load_state_dict(sd)
    m.eval()
    return m


def bench_torch(state, hp: VitHParams, runs: int, threads: int) -> dict:
    import torch

    torch.set_num_threads(threads)
    model = build_torch_vit(state, hp)
    x = torch.from_numpy(
        np.random.default_rng(0)
        .standard_normal((1, hp.in_chans, hp.img_size, hp.img_size))
        .astype(np.float32)
    )
    with torch.no_grad():
        model(x)  # warmup
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            model(x)
            times.append((time.perf_counter() - t0) * 1000)
    return dict(mean_ms=float(np.mean(times)), peak_rss_mb=peak_rss_mb())


def bench_jax(state, hp: VitHParams, runs: int, dtype: str) -> dict:
    import jax
    import jax.numpy as jnp

    from vit_cpp_tpu.models import params_from_state_dict
    from vit_cpp_tpu.models.vit import predict_probs

    jdtype = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    params = params_from_state_dict(state, hp, dtype=jdtype)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (1, hp.in_chans, hp.img_size, hp.img_size)
        ),
        dtype=jdtype,
    )
    # fetch a scalar each run: on tunneled-TPU hosts block_until_ready alone
    # does not guarantee execution finished (see bench.py measurement note)
    fn = jax.jit(lambda p, im: predict_probs(p, im, hp)[0, 0])
    _ = float(fn(params, x))  # compile + warmup
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _ = float(fn(params, x))
        times.append((time.perf_counter() - t0) * 1000)
    return dict(mean_ms=float(np.mean(times)), peak_rss_mb=peak_rss_mb())


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="+", default=["tiny", "small"], choices=SIZES)
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--patch", type=int, default=16)
    ap.add_argument(
        "--threads", type=int, default=4, help="torch CPU threads (reference: 4)"
    )
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    ap.add_argument("--skip-torch", action="store_true")
    args = ap.parse_args(argv)

    print(f"| model | backend | mean ms ({args.runs} runs) | peak RSS MB |")
    print("|---|---|---|---|")
    for size in args.sizes:
        hp = VitHParams(
            num_classes=1000,
            patch_size=args.patch,
            img_size=args.img,
            **SIZES[size],
        )
        state = random_state_dict(hp, seed=0)
        j = bench_jax(state, hp, args.runs, args.dtype)
        print(
            f"| vit_{size}_patch{args.patch}_{args.img} | vit_cpp_tpu "
            f"({args.dtype}) | {j['mean_ms']:.1f} | {j['peak_rss_mb']:.0f} |"
        )
        if not args.skip_torch:
            tr = bench_torch(state, hp, args.runs, args.threads)
            print(
                f"| vit_{size}_patch{args.patch}_{args.img} | torch-cpu (f32) "
                f"| {tr['mean_ms']:.1f} | {tr['peak_rss_mb']:.0f} |"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
