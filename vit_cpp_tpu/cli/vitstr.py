"""`vitstr` CLI: recognize scene text in one image.

Flag and console parity with the reference extension driver
(extensions/vitstr.cpp/main.cpp:26-106): -m/-i/-t/-s/-e flags, the decoded
string between `------------------` rules with its `score :` line
(vitstr.cpp:1024-1053), and the model-load / processing / total timing
report.

Usage: python -m vit_cpp_tpu.cli.vitstr -m vitstr-model.gguf -i demo.png
"""

from __future__ import annotations

import os
import sys
import time

from vit_cpp_tpu.cli.vit import VitParams, vit_params_parse


def main(argv=None) -> int:
    argv = sys.argv if argv is None else argv
    t_main_start = time.perf_counter()
    from vit_cpp_tpu.utils.compile_cache import enable_from_env

    enable_from_env()
    params = VitParams()
    params.model = "../ggml-model-f16.gguf"
    params.fname_inp = "../images/demo_1.jpg"
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
    from vit_cpp_tpu.engine import VitstrEngine

    try:
        if is_vitx(params.model):
            # AOT artifact: eps (and every engine knob) baked at export
            from vit_cpp_tpu.aot import AotEngine

            engine = AotEngine(params.model)
        else:
            engine = VitstrEngine(params.model, eps=params.eps)
    except (OSError, ValueError) as exc:
        print(
            f"main: failed to load model from '{params.model}': {exc}",
            file=sys.stderr,
        )
        return 1
    t_load = engine.load_ms

    try:
        text, score = engine.recognize_file(params.fname_inp)
    except OSError as exc:
        print(
            f"main: failed to load image from '{params.fname_inp}': {exc}",
            file=sys.stderr,
        )
        return 1

    print("------------------ ")
    print(text)
    print(f"score : {score:.2f} ")
    print("------------------ ")

    t_total = (time.perf_counter() - t_main_start) * 1000.0
    print("\n", file=sys.stderr)
    print(f"main:    model load time = {t_load:8.2f} ms", file=sys.stderr)
    print(f"main:    processing time = {t_total - t_load:8.2f} ms", file=sys.stderr)
    print(f"main:    total time      = {t_total:8.2f} ms", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
