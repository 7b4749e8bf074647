"""`vit` CLI: classify one image, print top-k labels.

Flag and console parity with the reference driver (main.cpp:26-113,
vit_params_parse vit.cpp:958-1002): -m/-i/-t/-k/-s/-e, hparams echo on load,
` > label : prob` top-k lines, and the model-load / processing / total
timing report. `-t` (threads) is accepted for compatibility; on TPU the
intra-op parallelism knob belongs to XLA (SURVEY.md §2.6), so it is echoed
but unused. `-s` (seed) is likewise parsed-and-printed, matching the
reference where it is never consumed (SURVEY.md §2.5).

Usage: python -m vit_cpp_tpu.cli.vit -m model.gguf -i image.jpg -k 5
"""

from __future__ import annotations

import os
import sys
import time


class VitParams:
    """Defaults mirroring the reference's vit_params (vit.h:105-113)."""

    def __init__(self):
        self.seed = -1
        self.n_threads = os.cpu_count() or 1
        self.model = "../ggml-model-f16.gguf"
        self.fname_inp = "../assets/tench.jpg"
        self.eps = 1e-6
        self.topk = 5


def print_usage(argv, params: VitParams):
    prog = argv[0] if argv else "vit"
    e = sys.stderr
    print(f"usage: {prog} [options]", file=e)
    print("", file=e)
    print("options:", file=e)
    print("  -h, --help              show this help message and exit", file=e)
    print(f"  -m FNAME, --model       model path (default: {params.model})", file=e)
    print(f"  -i FNAME, --inp         input file (default: {params.fname_inp})", file=e)
    print(
        f"  -t N, --threads         number of threads to use during computation (default: {params.n_threads})",
        file=e,
    )
    print(f"  -k N, --topk            top k classes to print (default: {params.topk})", file=e)
    print("  -s SEED, --seed         RNG seed (default: -1)", file=e)
    print(
        f"  -e FLOAT, --epsilon     epsilon constant in Layer Norm layers (default: {params.eps:f})",
        file=e,
    )
    print("", file=e)


def vit_params_parse(argv, params: VitParams) -> bool:
    i = 1
    while i < len(argv):
        arg = argv[i]
        try:
            if arg in ("-s", "--seed"):
                i += 1
                params.seed = int(argv[i])
            elif arg in ("-t", "--threads"):
                i += 1
                params.n_threads = int(argv[i])
            elif arg in ("-m", "--model"):
                i += 1
                params.model = argv[i]
            elif arg in ("-i", "--inp"):
                i += 1
                params.fname_inp = argv[i]
            elif arg in ("-k", "--topk"):
                i += 1
                params.topk = int(argv[i])
            elif arg in ("-e", "--epsilon"):
                i += 1
                params.eps = float(argv[i])
            elif arg in ("-h", "--help"):
                print_usage(argv, params)
                sys.exit(0)
            else:
                print(f"error: unknown argument: {arg}", file=sys.stderr)
                print_usage(argv, params)
                sys.exit(0)
        except (IndexError, ValueError):
            print(f"error: invalid value for argument: {arg}", file=sys.stderr)
            print_usage(argv, params)
            return False
        i += 1
    return True


def main(argv=None) -> int:
    argv = sys.argv if argv is None else argv
    t_main_start = time.perf_counter()
    from vit_cpp_tpu.utils.compile_cache import enable_from_env

    enable_from_env()
    params = VitParams()
    if not vit_params_parse(argv, params):
        return 1

    if params.seed < 0:
        params.seed = int(time.time())
    print(f"main: seed = {params.seed}", file=sys.stderr)
    print(
        f"main: n_threads = {params.n_threads} / {os.cpu_count()}",
        file=sys.stderr,
    )

    from vit_cpp_tpu.aot import is_vitx
    from vit_cpp_tpu.engine import VitEngine

    try:
        if is_vitx(params.model):
            # AOT artifact: eps (and every engine knob) baked at export
            from vit_cpp_tpu.aot import AotEngine

            engine = AotEngine(params.model)
        else:
            engine = VitEngine(params.model, eps=params.eps)
    except (OSError, ValueError) as exc:
        print(f"main: failed to load model from '{params.model}': {exc}", file=sys.stderr)
        return 1
    t_load = engine.load_ms

    try:
        results = engine.classify_file(params.fname_inp, topk=params.topk)
    except OSError as exc:
        print(
            f"main: failed to load image from '{params.fname_inp}': {exc}",
            file=sys.stderr,
        )
        return 1
    except ValueError as exc:  # e.g. a headless encoder / ViTSTR head
        print(f"main: {exc}", file=sys.stderr)
        return 1

    print("", file=sys.stderr)
    for _idx, prob, label in results:
        print(f" > {label} : {prob:.2f}")

    t_total = (time.perf_counter() - t_main_start) * 1000.0
    print("\n", file=sys.stderr)
    print(f"main:    model load time = {t_load:8.2f} ms", file=sys.stderr)
    print(f"main:    processing time = {t_total - t_load:8.2f} ms", file=sys.stderr)
    print(f"main:    total time      = {t_total:8.2f} ms", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
