"""`vit-finetune` CLI: fine-tune a checkpoint on an image folder.

    python -m vit_cpp_tpu.cli.finetune -m model-f16.gguf -d train_dir \\
        -o finetuned.gguf --epochs 3 --batch 32 [--val-dir val_dir] \\
        [--freeze-backbone] [--mesh 4x2] [--fsdp] [--ckpt-dir ckpt/]

Classifier checkpoints train on the benchmark-harness tree (one
subdirectory per class; the head transfers to the folder's class
count). ViTSTR checkpoints are auto-detected and train on scene-text
pairs: a flat directory with `gt.txt` (`path<TAB>text` lines) or
filename-stem labels (`hello_1.png` -> "hello"); --val-dir then reports
word-level exact-match accuracy. The output gguf serves everywhere a
converted checkpoint does (vit/vitstr CLI, serve, server, quantize,
vit-export); --ckpt-dir makes the run resumable (orbax). The reference
has no training story at all (SURVEY.md §0) — this is the fine-tune ->
serve loop the TPU build adds.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-m", "--model", required=True, help="input .gguf checkpoint")
    ap.add_argument("-d", "--data-dir", required=True, help="train images: <dir>/<class>/*")
    ap.add_argument("-o", "--out", required=True, help="output .gguf")
    ap.add_argument("--val-dir", help="held-out tree for per-epoch top-1")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("-b", "--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight-decay", type=float, default=0.05)
    ap.add_argument(
        "--schedule", choices=["const", "cosine"], default="const",
        help="learning-rate schedule (cosine decays to 0 over the run)",
    )
    ap.add_argument(
        "--warmup-steps", type=int, default=0,
        help="linear LR warmup over this many optimizer updates",
    )
    ap.add_argument(
        "--grad-accum", type=int, default=1,
        help="accumulate N micro-batches per optimizer update (effective "
        "batch = batch * N with one micro-batch's memory)",
    )
    ap.add_argument(
        "--clip-norm", type=float, default=0.0,
        help="clip the global gradient norm before each update (0 = off)",
    )
    ap.add_argument(
        "--freeze-backbone", action="store_true",
        help="train the head only (linear probe)",
    )
    ap.add_argument(
        "--augment", choices=["none", "flip", "crop", "all"], default="none",
        help="on-device train-batch augmentation (classifier only): "
        "random horizontal flip and/or random resized crop; keyed by the "
        "global step so resumed runs replay the same stream",
    )
    ap.add_argument(
        "--label-smooth", type=float, default=0.0, metavar="EPS",
        help="label-smoothing epsilon for the classifier loss (0 = off)",
    )
    ap.add_argument(
        "--mixup", type=float, default=0.0, metavar="ALPHA",
        help="per-batch mixup with lam ~ Beta(ALPHA, ALPHA) (0 = off; "
        "classifier only, incompatible with --grad-accum > 1)",
    )
    ap.add_argument(
        "--ema", type=float, default=0.0, metavar="DECAY",
        help="maintain an exponential moving average of the weights "
        "(e.g. 0.999) and write THAT to the output gguf; validation "
        "scores the EMA weights (0 = off)",
    )
    ap.add_argument(
        "--mu-dtype", choices=["f32", "bf16"], default="f32",
        help="adamw first-moment dtype (bf16 halves that buffer's memory "
        "and HBM traffic in the update; momentum precision cost is "
        "negligible for fine-tuning)",
    )
    ap.add_argument(
        "--mesh", metavar="DPxTP", default=None,
        help="train over a multi-chip mesh, e.g. 4x2 (dp must divide batch)",
    )
    ap.add_argument(
        "--fsdp", action="store_true",
        help="fully-sharded data parallelism (ZeRO-3): shard params AND "
        "AdamW moments over the mesh's data axis, all-gathered per layer "
        "by XLA — trains models whose optimizer state exceeds one chip "
        "(needs --mesh)",
    )
    ap.add_argument(
        "--ckpt-dir", default=None,
        help="orbax checkpoint dir: saved every epoch, resumed when present",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--decode-threads", type=int, default=0)
    ap.add_argument(
        "--stream", action="store_true",
        help="decode + preprocess per batch on a prefetch thread instead "
        "of preloading the whole dataset into host RAM (~600 KB per 224px "
        "image preloaded); streamed runs replay/resume bit-identically — "
        "use for datasets beyond a few tens of thousands of images",
    )
    ap.add_argument(
        "--img-size", type=int, default=None, metavar="PX",
        help="fine-tune at a non-native resolution (the low-res-pretrain/"
        "high-res-finetune ViT recipe): the pos_embed grid is bicubically "
        "resampled before training and the output checkpoint serves PX "
        "natively; must be a multiple of the patch size",
    )
    ap.add_argument(
        "--patch-size", type=int, default=None, metavar="P",
        help="fine-tune at a non-native patch granularity (the FlexiViT "
        "transfer recipe): the patch-embedding kernel is PI-resized and "
        "the pos_embed grid follows; the output checkpoint serves patch "
        "P natively; must divide the (possibly overridden) image size",
    )
    ap.add_argument(
        "--tome", type=int, default=0, metavar="R",
        help="fine-tune THROUGH ToMe token merging (the paper's "
        "train-with-merging recipe, ops/tome.py): the loss, backward, "
        "and per-epoch validation all run the merged graph, so the "
        "checkpoint is trained for exactly what `--tome R` serving "
        "runs; matching is non-differentiable (official no_grad "
        "semantics), recorded in the resume meta",
    )
    ap.add_argument(
        "--moe", type=int, default=0, metavar="E",
        help="sparse upcycling to a V-MoE (ops/moe.py): replicate every "
        "--moe-every'th block's MLP into E experts behind a learned "
        "top-k router (function-preserving at init), then fine-tune the "
        "routed model — more parameters at ~the dense FLOP cost; the "
        "output gguf declares the experts (blocks.*.moe tensors) and "
        "serves/continues-training through the same stack",
    )
    ap.add_argument(
        "--moe-every", type=int, default=2, metavar="N",
        help="place experts in every N'th block, starting at block 1 "
        "(V-MoE's every-2 alternation by default)",
    )
    ap.add_argument(
        "--moe-top-k", type=int, default=1, metavar="K",
        help="experts per token (gates renormalize over the top-k)",
    )
    ap.add_argument(
        "--moe-capacity", type=float, default=1.25, metavar="F",
        help="expert capacity factor: each expert processes at most "
        "ceil(K*T*F/E) tokens per example; overflow tokens skip the MLP "
        "through the residual (GShard drop semantics)",
    )
    ap.add_argument(
        "--lora", type=int, default=0, metavar="R",
        help="LoRA fine-tuning (models/lora.py): freeze the pretrained "
        "weights and train rank-R adapters on the block GEMMs + the "
        "head — ~1%% of the optimizer state and no full-width dW GEMMs "
        "in the backward; the output gguf has the adapters FOLDED in "
        "(plain dense checkpoint, zero serving cost); composes with "
        "--qat (the fake-quant sees the merged kernels)",
    )
    ap.add_argument(
        "--lora-alpha", type=float, default=0.0, metavar="A",
        help="LoRA scaling (delta = A/R * a@b); default 2*R",
    )
    ap.add_argument(
        "--distill", default="", metavar="TEACHER.gguf",
        help="knowledge distillation (parallel/train.py "
        "distill_cross_entropy_loss): train against the hard labels AND "
        "a frozen teacher's outputs on the same augmented batch; the "
        "teacher must be a classifier fine-tuned on this dataset's "
        "taxonomy at the student's input geometry",
    )
    ap.add_argument(
        "--distill-mode", default="soft", choices=["soft", "hard"],
        help="soft = tau-tempered KL to the teacher distribution "
        "(Hinton et al.), hard = CE to the teacher argmax (DeiT-style)",
    )
    ap.add_argument(
        "--distill-alpha", type=float, default=0.5, metavar="A",
        help="teacher-loss weight in [0,1]; 1 = pure distillation",
    )
    ap.add_argument(
        "--distill-tau", type=float, default=3.0, metavar="T",
        help="soft-distillation temperature",
    )
    ap.add_argument(
        "--qat", default="", metavar="FMT",
        choices=["", "w8a8", "q8_0", "q4_0", "q4_1", "q5_0", "q5_1"],
        help="quantization-aware training (quant/qat.py): fake-quantize "
        "weights through FMT's serving chain (block codec -> channelwise "
        "int8) and activations per-token, with straight-through "
        "gradients, so the EXPORTED quantized/W8A8 model is what the "
        "loss optimized; validation scores the fake-quantized model; "
        "quantize the output gguf with the same FMT afterwards",
    )
    ap.add_argument(
        "--qat-act", default="dynamic", choices=["dynamic", "static"],
        help="activation fake-quant for --qat: 'dynamic' per-token "
        "(mirrors the default W8A8 path) or 'static' frozen per-tensor "
        "scales with clipping (mirrors --act static serving; scales are "
        "measured on a fixed calibration batch at each epoch start and "
        "exported next to the output as OUT.act_scales.json for "
        "zero-calibration static serving via --act-scales)",
    )
    ap.add_argument(
        "--ftype", type=int, choices=[0, 1], default=1,
        help="output dtype rule: 0=f32, 1=f16 (quantize afterwards for "
        "block formats)",
    )
    ap.add_argument(
        "--compile-cache",
        nargs="?",
        const="",
        default=None,
        metavar="DIR",
        help="persist compiled XLA programs (utils/compile_cache.py) — "
        "the train step is the most expensive compile in the repo, so "
        "restarts/resumes skip minutes; optional DIR overrides the "
        "default cache location (also: VIT_COMPILE_CACHE env)",
    )
    args = ap.parse_args(argv)

    from vit_cpp_tpu.utils.compile_cache import (
        enable_compile_cache,
        enable_from_env,
    )

    if args.compile_cache is not None:
        enable_compile_cache(args.compile_cache or None)
    else:
        enable_from_env()

    mesh = None
    if args.mesh:
        from vit_cpp_tpu.parallel.mesh import make_mesh

        try:
            dp, tp = (int(x) for x in args.mesh.lower().split("x"))
        except ValueError:
            print(f"bad --mesh {args.mesh!r}: want DPxTP, e.g. 4x2", file=sys.stderr)
            return 1
        if args.batch % dp:
            print(f"dp={dp} must divide --batch {args.batch}", file=sys.stderr)
            return 1
        try:
            mesh = make_mesh(dp=dp, tp=tp)
        except ValueError as e:
            print(f"--mesh {args.mesh}: {e}", file=sys.stderr)
            return 1

    from vit_cpp_tpu.finetune import finetune
    from vit_cpp_tpu.models.export import save_params

    try:
        params, hp, classes, _ = finetune(
            args.model,
            args.data_dir,
            epochs=args.epochs,
            batch=args.batch,
            lr=args.lr,
            weight_decay=args.weight_decay,
            schedule=args.schedule,
            warmup_steps=args.warmup_steps,
            grad_accum=args.grad_accum,
            clip_norm=args.clip_norm,
            mu_dtype=args.mu_dtype,
            freeze_backbone=args.freeze_backbone,
            augment=args.augment,
            label_smoothing=args.label_smooth,
            mixup=args.mixup,
            ema=args.ema,
            mesh=mesh,
            fsdp=args.fsdp,
            ckpt_dir=args.ckpt_dir,
            seed=args.seed,
            decode_threads=args.decode_threads,
            val_dir=args.val_dir,
            img_size=args.img_size,
            patch_size=args.patch_size,
            tome=args.tome,
            moe=args.moe,
            moe_every=args.moe_every,
            moe_top_k=args.moe_top_k,
            moe_capacity=args.moe_capacity,
            lora=args.lora,
            lora_alpha=args.lora_alpha,
            distill=args.distill,
            distill_mode=args.distill_mode,
            distill_alpha=args.distill_alpha,
            distill_tau=args.distill_tau,
            qat=args.qat,
            qat_act=args.qat_act,
            qat_scales_out=(
                f"{args.out}.act_scales.json"
                if args.qat_act == "static"
                else None
            ),
            stream=args.stream,
            log=lambda m: print(m, file=sys.stderr),
        )
    except ValueError as e:
        print(f"finetune: {e}", file=sys.stderr)
        return 1
    save_params(
        args.out,
        params,
        hp,
        id2label=dict(enumerate(classes)),
        ftype=args.ftype,
    )
    print(
        f"vit-finetune: wrote {args.out} ({len(classes)} classes)",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
