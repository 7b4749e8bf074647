"""Per-component train-step breakdown on device (VERDICT r2 weak #3).

The inference path has a measured ms-by-component table (docs/TUNING.md);
this gives training the same: forward, forward+backward (= + remat
recompute), and the full step (= + adamw update), each timed with the
chained-scan method bench.py uses, plus a remat=none vs remat=dots A/B
that isolates the recompute cost. Differences between the chains bound
each component:

    adamw update      = full_step - grad_only
    backward(+remat)  = grad_only - forward
    remat recompute   = grad_only(dots) - grad_only(none)   [same batch]

Run on the TPU host:  python tools/train_profile.py [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _timed(fn, args, rtt, trials=3):
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(out)
        times.append(time.perf_counter() - t0)
    return max(1e-9, float(np.median(times)) - rtt)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--remat-ab", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from vit_cpp_tpu.hparams import VitHParams
    from vit_cpp_tpu.models import params_from_state_dict
    from vit_cpp_tpu.models.vit import forward
    from vit_cpp_tpu.parallel.train import TrainState, make_optimizer
    from vit_cpp_tpu.testing.synthetic import random_state_dict

    hp = VitHParams(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        num_classes=1000, patch_size=16, img_size=224,
    )
    dtype = jnp.bfloat16
    params = params_from_state_dict(random_state_dict(hp, seed=0), hp, dtype=dtype)
    rng = np.random.default_rng(0)
    B, K = args.batch, args.chain
    images = jnp.asarray(rng.standard_normal((B, 3, 224, 224)), dtype=dtype)
    labels = jnp.asarray(rng.integers(0, 1000, (B,)), jnp.int32)

    def loss_fn(p, x, y, remat="dots"):
        logits = forward(
            p, x, hp, attn_impl="pallas-train", remat=remat,
            unroll=hp.num_hidden_layers,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.mean(-jnp.take_along_axis(logp, y[:, None], axis=-1))

    optimizer = make_optimizer()
    state0 = TrainState(
        params=params, opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )

    # 1. forward only (chained through a scalar perturbation like bench.py)
    @jax.jit
    def fwd_chain(p, x):
        cls = p["cls_token"]

        def step(c, _):
            p2 = dict(p, cls_token=cls + (c * 1e-30).astype(cls.dtype))
            return loss_fn(p2, x, labels).astype(cls.dtype), ()

        cK, _ = jax.lax.scan(step, jnp.zeros((), cls.dtype), None, length=K)
        return cK

    # 2. forward + backward, no optimizer (grad chained through params)
    def grad_chain_for(remat):
        @jax.jit
        def grad_chain(p, x):
            def step(carry, _):
                l, g = jax.value_and_grad(
                    lambda q: loss_fn(q, x, labels, remat=remat)
                )(carry)
                # serial dependency through EVERY grad leaf — depending on
                # g["cls_token"] alone lets XLA dead-code-eliminate the
                # weight-gradient dots (dW = act^T dY feeds nothing else),
                # which understates the backward and overstates adamw in
                # the full-minus-grad difference. The reduces add ~0.5 GB
                # of reads (~0.7 ms) — billed to the backward, noted.
                dep = sum(
                    jnp.sum(leaf.astype(jnp.float32))
                    for leaf in jax.tree.leaves(g)
                )
                nxt = dict(
                    carry,
                    cls_token=carry["cls_token"]
                    + (dep * 1e-30).astype(carry["cls_token"].dtype),
                )
                return nxt, l

            pK, losses = jax.lax.scan(step, p, None, length=K)
            return losses[-1]

        return grad_chain

    # 3. full train step (bench.py --train replica)
    @jax.jit
    def full_chain(s0, x):
        def step(s, _):
            l, g = jax.value_and_grad(lambda q: loss_fn(q, x, labels))(s.params)
            updates, opt_state = optimizer.update(g, s.opt_state, s.params)
            p = optax.apply_updates(s.params, updates)
            return TrainState(p, opt_state, s.step + 1), l

        sK, losses = jax.lax.scan(step, s0, None, length=K)
        return losses[-1]

    trivial = jax.jit(lambda x: x[0, 0, 0, 0])
    _ = np.asarray(trivial(images))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(trivial(images))
    rtt = (time.perf_counter() - t0) / 5

    results = {}

    _ = np.asarray(fwd_chain(params, images))
    results["forward_ms"] = _timed(fwd_chain, (params, images), rtt) / K * 1e3

    gc = grad_chain_for("dots")
    _ = np.asarray(gc(params, images))
    results["grad_dots_ms"] = _timed(gc, (params, images), rtt) / K * 1e3

    if args.remat_ab:
        gn = grad_chain_for(False)
        try:
            _ = np.asarray(gn(params, images))
            results["grad_noremat_ms"] = _timed(gn, (params, images), rtt) / K * 1e3
        except Exception as e:  # OOM at large batch
            results["grad_noremat_ms"] = None
            print(f"# remat=none failed at batch {B}: {type(e).__name__}", file=sys.stderr)

    _ = np.asarray(full_chain(state0, images))
    results["full_step_ms"] = _timed(full_chain, (state0, images), rtt) / K * 1e3

    # production-shaped loop: K donated train_step calls (parallel/train.py
    # — the finetune loop's actual dispatch pattern, buffers aliased via
    # donate_argnums) with one fetch at the end; dispatches pipeline
    # through the tunnel, so wall-time/K tracks device time. Separates the
    # scan-carried chain's state-copy overhead from the real update cost.
    from vit_cpp_tpu.parallel.train import train_step

    def loop_steps(n):
        s = TrainState(
            params=jax.tree.map(lambda a: jnp.array(a, copy=True), params),
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        loss = None
        for _ in range(n):
            s, loss = train_step(s, images, labels, hp, optimizer)
        return float(loss)

    loop_steps(2)  # compile + warm
    t0 = time.perf_counter()
    loop_steps(K)
    results["loop_step_ms"] = (time.perf_counter() - t0 - rtt) / K * 1e3

    results["adamw_ms"] = results["full_step_ms"] - results["grad_dots_ms"]
    results["backward_ms"] = results["grad_dots_ms"] - results["forward_ms"]
    if results.get("grad_noremat_ms"):
        results["remat_recompute_ms"] = (
            results["grad_dots_ms"] - results["grad_noremat_ms"]
        )
    imgs_per_s = B / (results["full_step_ms"] / 1e3)
    # 3x-forward FLOPs bound (bench.py formula)
    t, h = hp.n_tokens, hp.hidden_size
    fl = (
        hp.num_hidden_layers * 2 * t * (h * 3 * h + h * h + 2 * h * hp.mlp_dim)
        + hp.num_hidden_layers * 2 * 2 * t * t * h
        + 2 * (t - 1) * (3 * hp.patch_size**2) * h
        + 2 * h * 1000
    ) * 3
    results["imgs_per_s"] = imgs_per_s
    results["mfu_3x"] = fl * imgs_per_s / 197e12
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v) for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
