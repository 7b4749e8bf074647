"""Run the headline benchmark configurations and collect BENCH_DETAILS.json.

One bench.py subprocess per config (each jit-compiles its own program;
through the axon remote-compile helper a config takes 5-15 minutes):

    python tools/bench_all.py [--out BENCH_DETAILS.json]

Configs mirror BASELINE.json: Q8_0 W8A8 (bench default / configs[2]),
dense bf16 (configs[0-1] compute path), Q4_0 (configs[3] family),
ViT-L/16@384 Q5_1 bs=64 (configs[3]), ViTSTR-base (configs[4]), and the
p50 single-image latencies.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

CONFIGS = [
    ("q8_0_w8a8", ["--quant", "q8_0", "--mm", "int8", "--attn", "pallas-fast"]),
    # static calibrated activation scales (quant/calibrate.py): the
    # offline-calibration production mode, +8% over dynamic
    (
        "q8_0_w8a8_static",
        ["--quant", "q8_0", "--mm", "int8", "--attn", "pallas-fast",
         "--act", "static"],
    ),
    # ToMe token merging (ops/tome.py): r most-similar patch-token pairs
    # merge per layer — the FLOP-reduction lever orthogonal to the
    # at-their-floor kernels; accuracy trade per the paper's tables
    (
        "q8_0_w8a8_tome8",
        ["--quant", "q8_0", "--mm", "int8", "--attn", "pallas-fast",
         "--tome", "8"],
    ),
    (
        "q8_0_w8a8_tome16",
        ["--quant", "q8_0", "--mm", "int8", "--attn", "pallas-fast",
         "--tome", "16"],
    ),
    # max-throughput merge point (r-sweep in docs/TUNING.md: MFU is flat
    # in r, so throughput tracks the FLOP cut; r=26 is 2.7x unmerged)
    (
        "q8_0_w8a8_tome26",
        ["--quant", "q8_0", "--mm", "int8", "--attn", "pallas-fast",
         "--tome", "26"],
    ),
    # ToMe composed with static activation scales: the two serving
    # levers are orthogonal (FLOP cut x per-GEMM reduce deletion) —
    # the max-throughput classifier configs
    (
        "q8_0_w8a8_static_tome16",
        ["--quant", "q8_0", "--mm", "int8", "--attn", "pallas-fast",
         "--act", "static", "--tome", "16"],
    ),
    (
        "q8_0_w8a8_static_tome26",
        ["--quant", "q8_0", "--mm", "int8", "--attn", "pallas-fast",
         "--act", "static", "--tome", "26"],
    ),
    # f16/bf16 checkpoint on the W8A8 serving path (dense kernels
    # dynamically quantized at load — the `--quant none` serving default;
    # accuracy cost quantified in tests/test_w8a8_accuracy.py)
    ("bf16_w8a8", ["--quant", "none", "--mm", "int8", "--attn", "pallas-fast"]),
    # honest dense bf16 (parity-faithful compute path)
    ("bf16_dense", ["--quant", "none", "--mm", "xla", "--attn", "pallas-fast"]),
    (
        "bf16_dense_safe_softmax",
        ["--quant", "none", "--mm", "xla", "--attn", "pallas"],
    ),
    ("q4_0_w8a8", ["--quant", "q4_0", "--mm", "int8", "--attn", "pallas-fast"]),
    # V-MoE sparse experts (ops/moe.py): ViT-B upcycled to E=8 experts on
    # every other layer. k=2 is the V-MoE routing default (each token
    # runs 2 experts; with capacity 1.25 the routed layers execute
    # E*cap=512 slot-rows vs 197 dense, so img/s REFLECTS the padded
    # executed compute — see TUNING "V-MoE"); k=1 is the Switch-style
    # cheap point. Attention + dense MLPs ride the int8 path; expert
    # einsums run bf16 (experts dequantize dense at load).
    (
        "moe_e8top2_q8_0_w8a8",
        ["--quant", "q8_0", "--mm", "int8", "--attn", "pallas-fast",
         "--moe", "8"],
        3600,
    ),
    (
        "moe_e8top1_q8_0_w8a8",
        ["--quant", "q8_0", "--mm", "int8", "--attn", "pallas-fast",
         "--moe", "8", "--moe-top-k", "1"],
        3600,
    ),
    (
        "vitl16_384_q5_1_w8a8_bs64",
        ["--size", "large", "--img", "384", "--quant", "q5_1", "--mm", "int8",
         "--attn", "pallas-fast", "--batch", "64", "--chain", "12"],
    ),
    (
        "vitstr_base_bf16",
        ["--vitstr", "--quant", "none", "--mm", "xla", "--attn", "pallas-fast"],
    ),
    # ViTSTR on the W8A8 serving path (same int8 pipeline as the classifier)
    (
        "vitstr_base_q8_0_w8a8",
        ["--vitstr", "--quant", "q8_0", "--mm", "int8", "--attn", "pallas-fast"],
    ),
    # ViT-B/8 @224: the reference converter's DEFAULT geometry (785 tokens;
    # masked lane-panel attention dispatch)
    (
        "vitb8_224_q8_0_w8a8",
        ["--patch", "8", "--quant", "q8_0", "--mm", "int8", "--attn", "pallas-fast"],
    ),
    # B/8 with ToMe r=32: token merging attacks the 785-token geometry's
    # quadratic attention from the FLOP side (the kernels are at floor)
    (
        "vitb8_224_q8_0_w8a8_tome32",
        ["--patch", "8", "--quant", "q8_0", "--mm", "int8", "--attn",
         "pallas-fast", "--tome", "32"],
    ),
    # ViT-H/14 @224 (d=80 heads -> generic full-block attention kernel;
    # K=1280 contractions run the int8 MXU above the flagship's K=768
    # rate — the K-bound verdict's other direction)
    (
        "vith14_224_q8_0_w8a8_bs64",
        ["--size", "huge", "--patch", "14", "--quant", "q8_0", "--mm",
         "int8", "--attn", "pallas-fast", "--batch", "64", "--chain", "12"],
    ),
    # ViT-g/14 @224 (~1.0B params): d=88 heads on the full-block kernel
    # AND the non-4x MLP override (6144 on hidden 1408, ratio 48/11)
    (
        "vitg14_224_q8_0_w8a8_bs32",
        ["--size", "giant", "--patch", "14", "--quant", "q8_0", "--mm",
         "int8", "--attn", "pallas-fast", "--batch", "32", "--chain", "12"],
        3600,
    ),
    (
        "latency_q8_0_w8a8",
        ["--latency", "--quant", "q8_0", "--mm", "int8", "--attn", "pallas-fast"],
    ),
    # V-MoE single-image latency: at B=1 the expert GEMMs run cap-row
    # slices of one example — the underfilled-GEMM floor the batch-1
    # analysis prices, paid once per routed layer
    (
        "latency_moe_e8top2",
        ["--latency", "--quant", "q8_0", "--mm", "int8",
         "--attn", "pallas-fast", "--moe", "8"],
        3600,
    ),
    # latency-critical deployment config: static act scales delete the
    # per-GEMM absmax reduces that can't amortize at batch 1 (r3: 0.340
    # vs 0.357-0.367 ms)
    (
        "latency_q8_0_w8a8_static",
        ["--latency", "--quant", "q8_0", "--mm", "int8", "--attn",
         "pallas-fast", "--act", "static"],
    ),
    # the .vitx AOT artifact path (deserialized jax.export program) on the
    # flagship config — must match q8_0_w8a8 within chip variance
    (
        "q8_0_w8a8_aot",
        ["--aot", "--quant", "q8_0", "--mm", "int8", "--attn", "pallas-fast"],
    ),
    # fine-tune train-step throughput (fwd+bwd+adamw; custom-VJP
    # attention + dots+attn remat + full layer unroll, batch 64 — the
    # measured peak, docs/TUNING.md training section)
    ("train_bf16_bs64", ["--train", "--chain", "10", "--batch", "64"]),
    # train THROUGH ToMe (vit-finetune --tome, the paper's
    # train-with-merging recipe): merged-graph loss + backward — the
    # XLA-attention path with per-block checkpoint; T shrinks per layer
    # so images/sec carries the FLOP cut
    (
        "train_bf16_bs64_tome16",
        ["--train", "--chain", "10", "--batch", "64", "--tome", "16"],
    ),
    # the --unroll 1 scan student: the measured other side of the
    # unroll-vs-scan training verdict (full unroll +16%)
    (
        "train_bf16_bs64_scan",
        ["--train", "--chain", "10", "--batch", "64", "--unroll", "1"],
        3600,
    ),
    # knowledge distillation (vit-finetune --distill): the dense train
    # step plus a frozen ViT-L teacher forward on every batch — measured
    # once with the teacher on plain XLA bf16, once with the teacher on
    # the W8A8 serving path (stop_gradient'd, so the non-differentiable
    # serving kernels are legal inside the loss). Teacher weights must
    # ride as jit ARGUMENTS (bench.py): closed-over they serialize as
    # ~600 MB of HLO constants and the remote-compile helper 413s
    (
        "train_bf16_bs64_distill_large",
        ["--train", "--chain", "10", "--batch", "64",
         "--train-distill", "large"],
        3600,
    ),
    (
        "train_bf16_bs64_distill_large_serve",
        ["--train", "--chain", "10", "--batch", "64",
         "--train-distill", "large", "--train-distill-attn", "pallas-fast",
         "--train-distill-mm", "int8"],
        3600,
    ),
    # V-MoE training step (vit-finetune --moe objective: CE + Switch
    # balance + router z-loss; routed layers unroll, custom-VJP
    # attention + dots+attn remat)
    (
        "train_moe_e8top2_bs64",
        ["--train", "--chain", "10", "--batch", "64", "--moe", "8"],
        3600,
    ),
    # quantization-aware training (vit-finetune --qat q8_0): the dense
    # step plus per-leaf weight qdq and per-token activation qdq with
    # STE grads — the measured cost of training the SERVED arithmetic
    # (docs/TUNING.md "Quantization-aware training")
    (
        "train_bf16_bs64_qat_q8_0",
        ["--train", "--chain", "10", "--batch", "64", "--train-qat", "q8_0"],
    ),
    # --qat-act static: frozen per-tensor activation scales delete the
    # per-GEMM absmax reduces (+14% over dynamic QAT; 8.5% below the
    # dense step) and export for zero-calibration static serving
    (
        "train_bf16_bs64_qat_q8_0_static",
        [
            "--train", "--chain", "10", "--batch", "64",
            "--train-qat", "q8_0", "--train-qat-act", "static",
        ],
    ),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_DETAILS.json")
    ap.add_argument("--timeout", type=int, default=1800, help="per config, s")
    ap.add_argument(
        "--resume", action="store_true",
        help="skip configs already present (without error) in --out",
    )
    args = ap.parse_args(argv)

    results = {}
    if args.resume:
        try:
            with open(args.out) as f:
                results = {
                    k: v for k, v in json.load(f).items() if "error" not in v
                }
            print(f"resuming: {len(results)} configs kept", file=sys.stderr)
        except (OSError, json.JSONDecodeError):
            pass
    for name, flags, *extra in CONFIGS:
        if name in results:
            continue
        # optional per-config timeout (3rd tuple element): the 1B-param
        # configs pay ~5 min of host-side weight gen/quantize plus a
        # longer remote compile than the default budget assumes
        timeout = extra[0] if extra else args.timeout
        print(f"=== {name}: bench.py {' '.join(flags)}", file=sys.stderr)
        try:
            proc = subprocess.run(
                [sys.executable, "bench.py", *flags],
                capture_output=True,
                text=True,
                timeout=timeout,
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            results[name] = json.loads(line) if line.startswith("{") else {
                "error": (proc.stderr or "no output")[-500:]
            }
        except (subprocess.TimeoutExpired, json.JSONDecodeError) as exc:
            results[name] = {"error": str(exc)[:500]}
        print(f"    -> {results[name]}", file=sys.stderr)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
