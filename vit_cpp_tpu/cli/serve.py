"""`serve` CLI: classify a directory or file list at throughput.

The batch-serving front end the reference lacks (its only multi-image mode
is re-running the CLI per image, scripts/benchmark.sh:45-55). Drives
vit_cpp_tpu.serve.serve_files — native threaded decode double-buffered
against the jitted batched forward — and prints one `path<TAB>label<TAB>prob`
line per image plus an images/sec summary.

Usage:
  python -m vit_cpp_tpu.cli.serve -m model.gguf -d images_dir [-b 64]
  python -m vit_cpp_tpu.cli.serve -m model.gguf img1.jpg img2.png ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time


from vit_cpp_tpu.io.image import IMAGE_EXTS


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-d", "--dir", help="classify every image under this dir")
    ap.add_argument("files", nargs="*", help="explicit image files")
    ap.add_argument("-b", "--batch", type=int, default=64)
    ap.add_argument("-k", "--topk", type=int, default=1)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    ap.add_argument(
        "--mm", choices=["xla", "pallas", "int8"], default="int8",
        help="matmul path. Default int8 = W8A8 MXU serving (quantized "
        "checkpoints are requantized channelwise, f16 checkpoints are "
        "dynamically quantized at load; accuracy cost quantified in "
        "tests/test_w8a8_accuracy.py). Use xla for the parity-faithful "
        "compute path.",
    )
    ap.add_argument(
        "--attn", choices=["xla", "pallas", "pallas-fast"],
        default="pallas-fast",
        help="attention kernel (fused masked-pair Pallas + capped-exp2 "
        "softmax is the TPU serving default; 'pallas' keeps the exact "
        "max-subtracted softmax)",
    )
    ap.add_argument(
        "--fold-ln",
        action=argparse.BooleanOptionalAction,
        default=None,
        help="fold LN affines into adjacent matmuls (default: on for the "
        "int8 serving path, off otherwise)",
    )
    ap.add_argument(
        "--act", choices=["dynamic", "static"], default="dynamic",
        help="int8 activation quantization: 'static' serves with "
        "calibrated per-tensor scales (the fastest measured config; "
        "guardrailed — falls back to dynamic on rejection). Calibrates "
        "on --calib-dir when given, else on the first served batch.",
    )
    ap.add_argument(
        "--calib-dir", metavar="DIR",
        help="representative images for --act static (up to 16 used)",
    )
    ap.add_argument(
        "--act-scales", metavar="FILE",
        help="pre-measured static scales (a QAT run's "
        "OUT.act_scales.json) — --act static serves with the exact "
        "scales training clipped against, no calibration pass",
    )
    ap.add_argument(
        "--embed", metavar="OUT.npy", default=None,
        help="extract embeddings instead of classifying: write an (N, "
        "hidden) f32 .npy of final-LN pooled features plus OUT.paths.txt "
        "(one kept path per line; failed decodes are skipped). gguf "
        "engines only — a .vitx artifact bakes the classifier program.",
    )
    ap.add_argument("--decode-threads", type=int, default=0)
    ap.add_argument(
        "--img-size", type=int, default=None, metavar="PX",
        help="serve at a non-native resolution: bicubically resample the "
        "pos_embed grid (timm resample_abs_pos_embed semantics) and "
        "preprocess inputs to PX x PX; must be a multiple of the "
        "checkpoint's patch size (gguf classifiers only)",
    )
    ap.add_argument(
        "--patch-size", type=int, default=None, metavar="P",
        help="serve at a non-native patch granularity: the patch-embedding "
        "kernel is PI-resized (FlexiViT / timm resample_patch_embed "
        "semantics) and the pos_embed grid follows; smaller P = more "
        "tokens = higher accuracy/cost, larger P = fewer tokens = faster "
        "(gguf classifiers only)",
    )
    ap.add_argument(
        "--mesh",
        metavar="DPxTP",
        default=None,
        help="shard the engine over a multi-chip mesh, e.g. --mesh 4x2 = "
        "4-way data parallel x 2-way megatron tensor parallel (requires "
        "dp*tp visible devices; dp must divide batch)",
    )
    ap.add_argument(
        "--tome", type=int, default=0, metavar="R",
        help="ToMe token merging (ops/tome.py): merge R most-similar "
        "patch-token pairs per layer for throughput at the paper's "
        "published accuracy cost (classifier gguf engines only)",
    )
    ap.add_argument(
        "--compile-cache",
        nargs="?",
        const="",
        default=None,
        metavar="DIR",
        help="persist compiled XLA programs (utils/compile_cache.py) so "
        "engine restarts skip the multi-minute first compile; optional DIR "
        "overrides the default cache location (also: VIT_COMPILE_CACHE env)",
    )
    args = ap.parse_args(argv)
    from vit_cpp_tpu.utils.compile_cache import enable_compile_cache, enable_from_env

    if args.compile_cache is not None:
        enable_compile_cache(args.compile_cache or None)
    else:
        enable_from_env()
    fold_ln = (
        args.fold_ln
        if args.fold_ln is not None
        # QAT-measured act scales describe the UNFOLDED graph (the
        # engine rejects the combination) — default fold off for them
        else args.mm == "int8" and not args.act_scales
    )

    paths = list(args.files)
    if args.dir:
        for root, _, files in os.walk(args.dir):
            paths.extend(
                os.path.join(root, f)
                for f in sorted(files)
                if os.path.splitext(f)[1] in IMAGE_EXTS
            )
    if not paths:
        print("no input images", file=sys.stderr)
        return 1

    import jax.numpy as jnp
    import numpy as np

    from vit_cpp_tpu.aot import is_vitx
    from vit_cpp_tpu.engine import VitEngine, VitstrEngine, detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.serve import recognize_files, serve_files

    if is_vitx(args.model):
        # AOT artifact: engine knobs (dtype/mm/attn/fold-ln) and the batch
        # size were baked at export; the program is single-chip by contract
        from vit_cpp_tpu.aot import AotEngine

        from vit_cpp_tpu.aot import read_meta

        headless_aot = read_meta(args.model).get("program") == "features"
        if args.embed and not headless_aot:
            print(
                "--embed is not supported for classifier .vitx artifacts "
                "(the exported program is the classifier); serve the gguf "
                "or export a headless-encoder artifact",
                file=sys.stderr,
            )
            return 1
        if headless_aot and not args.embed:
            print(
                "this artifact is a headless encoder (features program) — "
                "use --embed OUT.npy",
                file=sys.stderr,
            )
            return 1
        if args.act == "static":
            print(
                "--act static does not apply to a .vitx artifact — its "
                "scales were baked at export (vit-export --act static)",
                file=sys.stderr,
            )
            return 1
        if args.mesh:
            print(
                "--mesh is not supported for .vitx artifacts (the exported "
                "program is compiled single-chip); serve the gguf instead",
                file=sys.stderr,
            )
            return 1
        if args.img_size is not None or args.patch_size is not None:
            print(
                "--img-size/--patch-size do not apply to a .vitx artifact "
                "— its geometry was baked at export (vit-export "
                "--img-size/--patch-size)",
                file=sys.stderr,
            )
            return 1
        if args.tome:
            print(
                "--tome does not apply to a .vitx artifact — the graph "
                "was baked at export (vit-export --tome R)",
                file=sys.stderr,
            )
            return 1
        aot = AotEngine(args.model)
        if args.batch != aot.batch:
            print(
                f"serve: .vitx artifact is compiled for batch {aot.batch}; "
                f"using it (ignoring -b {args.batch})",
                file=sys.stderr,
            )
        print(
            f"serve: AOT artifact (mm={aot.meta['mm_impl']}, "
            f"attn={aot.meta['attn_impl']}, batch {aot.batch}) — engine "
            "flags baked at export",
            file=sys.stderr,
        )
        if headless_aot:  # --embed (validated above): features program
            return _embed_loop(
                aot,
                paths,
                out=args.embed,
                batch=aot.batch,
                decode_threads=args.decode_threads,
            )
        return _serve_loop(
            aot,
            aot.hp.seq_len is not None,
            paths,
            batch=aot.batch,
            topk=args.topk,
            decode_threads=args.decode_threads,
        )

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
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
        except ValueError as e:  # dp*tp != visible devices
            print(f"--mesh {args.mesh}: {e}", file=sys.stderr)
            return 1
    if args.act == "static" and args.mm != "int8":
        print("--act static requires --mm int8", file=sys.stderr)
        return 1
    # sequence-head (ViTSTR) checkpoints are served with the greedy decoder
    is_vitstr = detect_hparams(read_model(args.model)).seq_len is not None
    cls = VitstrEngine if is_vitstr else VitEngine
    try:
        engine = cls(
            args.model,
            dtype=dtype,
            attn_impl=args.attn,
            mm_impl=args.mm,
            fold_ln=fold_ln,
            act_quant=args.act,
            act_scales=args.act_scales,
            img_size=args.img_size,
            patch_size=args.patch_size,
            tome=args.tome,
            verbose=False,
        )
    except ValueError as e:  # e.g. --img-size not a patch multiple / ViTSTR
        print(f"serve: {e}", file=sys.stderr)
        return 1
    if engine.hp.num_classes == 0 and not args.embed:
        print(
            "serve: checkpoint is a headless encoder (no classifier) — "
            "use --embed OUT.npy for bulk feature extraction, or "
            "vit-finetune to attach a head",
            file=sys.stderr,
        )
        return 1
    if mesh is not None:
        engine.shard(mesh)
    if args.act == "static" and args.calib_dir:
        from vit_cpp_tpu.cli.common import calibrate_engine_from_paths

        try:
            ok = calibrate_engine_from_paths(engine, args.calib_dir)
        except ValueError as e:  # e.g. empty/undecodable --calib-dir
            print(f"serve: {e}", file=sys.stderr)
            return 1
        if not ok:
            print(
                "serve: static calibration rejected by the guardrail; "
                "serving with dynamic activation scales",
                file=sys.stderr,
            )
    if args.embed:
        return _embed_loop(
            engine,
            paths,
            out=args.embed,
            batch=args.batch,
            decode_threads=args.decode_threads,
        )
    return _serve_loop(
        engine,
        is_vitstr,
        paths,
        batch=args.batch,
        topk=args.topk,
        decode_threads=args.decode_threads,
    )


def _embed_loop(engine, paths, *, out: str, batch: int, decode_threads: int) -> int:
    """Bulk feature extraction -> OUT.npy (N, hidden) + OUT.paths.txt."""
    import numpy as np

    from vit_cpp_tpu.serve import embed_files

    t0 = time.perf_counter()
    kept, vecs = [], []
    for e in embed_files(
        engine, paths, batch=batch, decode_threads=decode_threads
    ):
        if e.vector is None:
            print(f"{e.path}\t<decode failed>", file=sys.stderr)
            continue
        kept.append(e.path)
        vecs.append(e.vector)
    if not vecs:
        print("no decodable images", file=sys.stderr)
        return 1
    np.save(out, np.stack(vecs))
    paths_txt = out[: -len(".npy")] + ".paths.txt" if out.endswith(".npy") else out + ".paths.txt"
    with open(paths_txt, "w", encoding="utf-8") as f:
        f.write("\n".join(kept) + "\n")
    dt = time.perf_counter() - t0
    print(
        f"serve: embedded {len(kept)}/{len(paths)} images in {dt:.2f}s "
        f"= {len(kept) / max(dt, 1e-9):.1f} images/sec -> {out} "
        f"({len(kept)} x {vecs[0].shape[-1]}) + {paths_txt}",
        file=sys.stderr,
    )
    return 0


def _serve_loop(
    engine, is_vitstr: bool, paths, *, batch: int, topk: int, decode_threads: int
) -> int:
    """Stream every path through the serving pipeline and print results;
    shared by the gguf-engine and .vitx-artifact branches."""
    import numpy as np

    from vit_cpp_tpu.serve import recognize_files, serve_files

    t0 = time.perf_counter()
    n_ok = 0
    if is_vitstr:
        for r in recognize_files(
            engine, paths, batch=batch, decode_threads=decode_threads
        ):
            if r.confidence < 0:
                print(f"{r.path}\t<decode failed>", file=sys.stderr)
                continue
            n_ok += 1
            print(f"{r.path}\t{r.text}\t{r.confidence:.2f}")
    else:
        for r in serve_files(
            engine,
            paths,
            batch=batch,
            decode_threads=decode_threads,
            keep_probs=topk > 1,
        ):
            if r.top1 < 0:
                print(f"{r.path}\t<decode failed>", file=sys.stderr)
                continue
            n_ok += 1
            if topk > 1:
                order = np.argsort(-r.probs, kind="stable")[:topk]
                tags = " ".join(
                    f"{engine.id2label.get(int(i), f'LABEL_{i}')}:{r.probs[i]:.2f}"
                    for i in order
                )
                print(f"{r.path}\t{tags}")
            else:
                label = engine.id2label.get(r.top1, f"LABEL_{r.top1}")
                print(f"{r.path}\t{label}\t{r.prob:.2f}")
    dt = time.perf_counter() - t0
    print(
        f"serve: {n_ok}/{len(paths)} images in {dt:.2f}s "
        f"= {n_ok / max(dt, 1e-9):.1f} images/sec",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
