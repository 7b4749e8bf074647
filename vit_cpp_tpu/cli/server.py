"""`vit-server` CLI: long-running HTTP inference daemon.

The production front end the reference lacks (its README serving story is
one CLI run per image). One engine, micro-batched device execution
(vit_cpp_tpu/server.py), same engine knobs as the serve CLI.

Usage:
  python -m vit_cpp_tpu.cli.server -m model-q8_0.gguf --port 8000
  curl -s -X POST --data-binary @magpie.jpeg localhost:8000/v1/classify?topk=5
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "-m", "--model", required=True, action="append",
        help="model path (gguf or .vitx). Repeat with name=path to serve "
        "several models from one daemon (routes /v1/<name>/classify|"
        "recognize): -m cls=model.gguf -m ocr=vitstr.gguf",
    )
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument(
        "-b", "--batch", type=int, default=8,
        help="micro-batch size (requests coalesced per device step)",
    )
    ap.add_argument(
        "--max-wait-ms", type=float, default=5.0,
        help="max time the batcher waits to fill a batch",
    )
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    ap.add_argument("--mm", choices=["xla", "pallas", "int8"], default="int8")
    ap.add_argument(
        "--attn", choices=["xla", "pallas", "pallas-fast"], default="pallas-fast"
    )
    ap.add_argument(
        "--fold-ln", action=argparse.BooleanOptionalAction, default=None
    )
    ap.add_argument(
        "--act", choices=["dynamic", "static"], default="dynamic",
        help="int8 activation quantization: 'static' serves with "
        "calibrated per-tensor scales (fastest measured config). The "
        "daemon warms up on a dummy batch, so static REQUIRES "
        "--calib-dir; a guardrail rejection falls back to dynamic.",
    )
    ap.add_argument(
        "--calib-dir", metavar="DIR",
        help="representative images for --act static (up to 16 used)",
    )
    ap.add_argument(
        "--act-scales", metavar="FILE",
        help="pre-measured static scales (a QAT run's "
        "OUT.act_scales.json): --act static serves with the exact "
        "scales training clipped against — no --calib-dir needed",
    )
    ap.add_argument(
        "--img-size", type=int, default=None, metavar="PX",
        help="serve at a non-native resolution: resample the pos_embed "
        "grid (timm semantics) and preprocess to PX x PX; applies to "
        "every gguf model served (multiple of each patch size)",
    )
    ap.add_argument(
        "--patch-size", type=int, default=None, metavar="P",
        help="serve at a non-native patch granularity: PI-resize the "
        "patch-embedding kernel (FlexiViT semantics) on every gguf "
        "model served; must divide the (possibly overridden) image size",
    )
    ap.add_argument(
        "--tome", type=int, default=0, metavar="R",
        help="ToMe token merging (ops/tome.py) on every gguf classifier "
        "served: merge R most-similar patch-token pairs per layer "
        "(throughput at the paper's published accuracy cost)",
    )
    ap.add_argument("--mesh", metavar="DPxTP", default=None)
    ap.add_argument(
        "--request-timeout", type=float, default=30.0,
        help="per-request wait on the device queue, seconds",
    )
    ap.add_argument(
        "--max-queue", type=int, default=0,
        help="admission bound: reject with 503 when more than this many "
        "requests are already queued for the device (0 = unbounded; a "
        "few multiples of the batch size is a sane production setting)",
    )
    ap.add_argument(
        "--no-warmup", action="store_true",
        help="skip the pre-bind warmup batch (first request pays the compile)",
    )
    ap.add_argument(
        "--bucket", action="store_true",
        help="pad coalesced requests to the next power-of-2 bucket instead "
        "of the full batch: a lone request at light load runs the batch-1 "
        "program (~batch-x less compute) at the cost of one compiled "
        "program per bucket, all warmed before the port binds. Multi-batch "
        ".vitx artifacts (vit-export -b 1,64) bucket over their baked "
        "sizes; single-batch artifacts ignore the flag",
    )
    ap.add_argument(
        "--compile-cache", nargs="?", const="", default=None, metavar="DIR"
    )
    args = ap.parse_args(argv)

    # SIGTERM (systemd/docker stop) takes the same clean-shutdown path as
    # Ctrl-C: close the socket, fail queued futures fast, join the worker
    import signal

    def _sigterm(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)

    from vit_cpp_tpu.utils.compile_cache import enable_compile_cache, enable_from_env

    if args.compile_cache is not None:
        enable_compile_cache(args.compile_cache or None)
    else:
        enable_from_env()

    from vit_cpp_tpu.aot import AotEngine, is_vitx
    from vit_cpp_tpu.cli.common import build_engine, model_spec
    from vit_cpp_tpu.server import create_multi_server, create_server

    if args.act == "static":
        # the warmup batch is zeros — lazy calibration would fix scales
        # on it, so the daemon requires explicit calibration data
        if args.mm != "int8":
            print("--act static requires --mm int8", file=sys.stderr)
            return 1
        if not args.calib_dir and not args.act_scales:
            print(
                "--act static needs --calib-dir DIR (the daemon warms up "
                "on a dummy batch, which must not become the calibration "
                "set) or --act-scales FILE (QAT-measured scales)",
                file=sys.stderr,
            )
            return 1

    # multi-model when -m is repeated or a name=path spec ('=' inside a
    # plain path does NOT hijack: spec names must be '/'-free)
    multi = len(args.model) > 1 or model_spec(args.model[0]) is not None
    if multi:
        # several models in one daemon: -m name=path repeated
        if args.mesh:
            print("--mesh is not supported with multiple models", file=sys.stderr)
            return 1
        engines, batches, bucket_map = {}, {}, {}
        for spec in args.model:
            parsed = model_spec(spec)
            if parsed is None:
                print(
                    f"bad -m {spec!r}: multi-model mode needs name=path "
                    "(names must not contain '/')",
                    file=sys.stderr,
                )
                return 1
            name, path = parsed
            if name in engines:
                print(f"duplicate model name {name!r}", file=sys.stderr)
                return 1
            try:
                # --img-size applies per gguf model; .vitx artifacts baked
                # their geometry at export — skip them with a notice
                # rather than failing the whole multi-model daemon
                if (
                    args.img_size is not None or args.patch_size is not None
                ) and is_vitx(path):
                    skipped = []
                    if args.img_size is not None:
                        skipped.append(f"--img-size {args.img_size}")
                    if args.patch_size is not None:
                        skipped.append(f"--patch-size {args.patch_size}")
                    print(
                        f"vit-server: {name}: .vitx geometry is baked at "
                        f"export; ignoring {' '.join(skipped)}",
                        file=sys.stderr,
                    )
                if args.tome and is_vitx(path):
                    print(
                        f"vit-server: {name}: .vitx graph is baked at "
                        f"export; ignoring --tome {args.tome} (use "
                        "vit-export --tome)",
                        file=sys.stderr,
                    )
                engines[name], _ = build_engine(
                    path, dtype=args.dtype, mm=args.mm, attn=args.attn,
                    fold_ln=args.fold_ln, act=args.act,
                    act_scales=args.act_scales,
                    img_size=None if is_vitx(path) else args.img_size,
                    patch_size=None if is_vitx(path) else args.patch_size,
                    tome=0 if is_vitx(path) else args.tome,
                )
            except ValueError as e:  # e.g. --act static on a .vitx
                print(f"vit-server: {name}: {e}", file=sys.stderr)
                return 1
            if args.act == "static" and not args.act_scales:
                from vit_cpp_tpu.cli.common import calibrate_engine_from_paths

                try:
                    ok = calibrate_engine_from_paths(
                        engines[name], args.calib_dir
                    )
                except ValueError as e:
                    print(f"vit-server: {name}: {e}", file=sys.stderr)
                    return 1
                if not ok:
                    print(
                        f"vit-server: {name}: static calibration rejected "
                        "by the guardrail; serving dynamic",
                        file=sys.stderr,
                    )
            batches[name] = (
                engines[name].batch
                if is_vitx(path)
                else args.batch
            )
            bucket_map[name] = args.bucket
            if args.bucket and is_vitx(path):
                baked = engines[name].batches
                if len(baked) > 1:  # bucket over the artifact's baked sizes
                    bucket_map[name] = baked
                else:
                    print(
                        f"vit-server: {name}: .vitx artifact bakes a "
                        "single batch; ignoring --bucket",
                        file=sys.stderr,
                    )
                    bucket_map[name] = False
        httpd, batchers = create_multi_server(
            engines,
            host=args.host,
            port=args.port,
            batch=batches,
            max_wait_ms=args.max_wait_ms,
            warmup=not args.no_warmup,
            request_timeout_s=args.request_timeout,
            max_queue=args.max_queue,
            buckets=bucket_map,
        )
        print(
            f"vit-server: {len(engines)} models on "
            f"http://{args.host}:{httpd.server_port} "
            f"({', '.join(sorted(engines))})",
            file=sys.stderr,
        )
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.server_close()
            for b in batchers.values():
                b.close()
        return 0

    model_path = args.model[0]
    if is_vitx(model_path):
        # AOT artifact: engine knobs and batch baked at export; the
        # micro-batcher must use the artifact's compiled batch size
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
        engine = AotEngine(model_path)
        if args.batch != engine.batch:
            print(
                f"vit-server: .vitx artifact is compiled for batch "
                f"{engine.batch}; using it (ignoring -b {args.batch})",
                file=sys.stderr,
            )
            args.batch = engine.batch
        if args.bucket:
            if len(engine.batches) > 1:
                # multi-batch artifact (vit-export -b 1,64): bucket over
                # exactly the baked sizes
                args.bucket = engine.batches
            else:
                print(
                    "vit-server: .vitx artifact bakes a single batch; "
                    "ignoring --bucket (export with -b 1,.. to bucket)",
                    file=sys.stderr,
                )
                args.bucket = False
        is_vitstr = engine.hp.seq_len is not None
    else:
        try:
            engine, is_vitstr = build_engine(
                model_path, dtype=args.dtype, mm=args.mm, attn=args.attn,
                fold_ln=args.fold_ln, act=args.act,
                act_scales=args.act_scales,
                img_size=args.img_size, patch_size=args.patch_size,
            )
        except ValueError as e:  # e.g. --img-size on ViTSTR / bad multiple
            print(f"vit-server: {e}", file=sys.stderr)
            return 1
        if args.act == "static" and not args.act_scales:
            from vit_cpp_tpu.cli.common import calibrate_engine_from_paths

            try:
                ok = calibrate_engine_from_paths(engine, args.calib_dir)
            except ValueError as e:
                print(f"vit-server: {e}", file=sys.stderr)
                return 1
            if not ok:
                print(
                    "vit-server: static calibration rejected by the "
                    "guardrail; serving dynamic",
                    file=sys.stderr,
                )
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
            engine.shard(make_mesh(dp=dp, tp=tp))
        except ValueError as e:  # dp*tp != visible devices
            print(f"--mesh {args.mesh}: {e}", file=sys.stderr)
            return 1
    httpd, batcher = create_server(
        engine,
        host=args.host,
        port=args.port,
        batch=args.batch,
        max_wait_ms=args.max_wait_ms,
        warmup=not args.no_warmup,
        request_timeout_s=args.request_timeout,
        max_queue=args.max_queue,
        buckets=args.bucket,
    )
    if args.bucket and batcher.bucket_sizes() == [args.batch]:
        # a sharded engine constrains buckets to dp-divisible sizes
        # (server.create_server); none below the full batch survived
        print(
            "vit-server: no usable bucket below the full batch "
            "(sharded engines need dp-divisible sizes); serving unbucketed",
            file=sys.stderr,
        )
    kind = "vitstr" if is_vitstr else "vit"
    print(
        f"vit-server: {kind} model on http://{args.host}:{httpd.server_port} "
        f"(micro-batch {args.batch}, wait {args.max_wait_ms} ms)",
        file=sys.stderr,
    )
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        batcher.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
