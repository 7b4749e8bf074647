"""ImageNet-1k accuracy benchmark harness.

Rebuild of the reference's eval harness (tests/benchmark.cpp:17-150,
SURVEY.md C14) with the same contract — dataset laid out as
`dataset_dir/<class_name>/*.JPEG` with ground truth = directory name,
display names from `<dataset_dir>/../classnames.json`, per-image CSV
`filename,truth,prediction`, final `Top-1 Accuracy:` line — but built for
TPU throughput instead of one image at a time: files decode on the native
C++ thread pool (vit_cpp_tpu/native) while the previous batch runs on
device, preprocessing is the on-device resampling matmul, and the forward
pass is one jitted batched program. Failed decodes are skipped exactly like
the reference (tests/benchmark.cpp:108-125).

This also completes the reference's declared To-Do — its ImageNet
evaluation was never finished (reference README.md:268-273).

Usage:
  python -m vit_cpp_tpu.cli.benchmark <model> <dataset_dir> \
      <num_images_per_class> [output_file] [--batch N] [--topk K]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import List, Optional, Tuple

import numpy as np


def read_class_names(path: str) -> List[str]:
    """classnames.json: a JSON array of the 1000 directory names in label
    order (reference tests/benchmark.cpp:17-32)."""
    try:
        with open(path) as f:
            return list(json.load(f))
    except OSError as exc:
        print(f"Cannot open file: {path} ({exc})", file=sys.stderr)
        return []


def collect_images(
    dataset_dir: str, per_class: int, ext: str = ".JPEG"
) -> List[Tuple[str, str]]:
    """[(path, class_dir_name)] over dataset_dir/<class>/*<ext>."""
    out: List[Tuple[str, str]] = []
    for entry in sorted(os.scandir(dataset_dir), key=lambda e: e.name):
        if not entry.is_dir():
            continue
        n = 0
        for img in sorted(os.scandir(entry.path), key=lambda e: e.name):
            if per_class > 0 and n >= per_class:
                break
            if not img.name.endswith(ext):
                continue
            out.append((img.path, entry.name))
            n += 1
    return out


def run_eval(
    model_path: str,
    dataset_dir: str,
    per_class: int,
    output_file: str = "predictions.txt",
    *,
    batch: int = 32,
    dtype: str = "f32",
    attn_impl: str = "xla",
    mm_impl: str = "xla",
    ext: str = ".JPEG",
    classnames: Optional[List[str]] = None,
    verbose: bool = True,
) -> float:
    import jax.numpy as jnp

    from vit_cpp_tpu.engine import VitEngine
    from vit_cpp_tpu.io.image import load_images_rgb_batch

    if classnames is None:
        path = os.path.join(
            os.path.dirname(os.path.abspath(dataset_dir)), "classnames.json"
        )
        if not os.path.exists(path):
            # bundled copy of the reference's tests/classnames.json (kept
            # byte-identical for interop — including its 998-entry quirk)
            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "data",
                "classnames.json",
            )
        classnames = read_class_names(path)

    from vit_cpp_tpu.aot import is_vitx

    if is_vitx(model_path):
        # AOT artifact: engine knobs baked at export; its compiled batch
        # size wins (the loop below pads every chunk to `batch` anyway)
        from vit_cpp_tpu.aot import AotEngine

        engine = AotEngine(model_path)
        if batch != engine.batch:
            print(
                f"benchmark: .vitx artifact is compiled for batch "
                f"{engine.batch}; using it (ignoring --batch {batch})",
                file=sys.stderr,
            )
            batch = engine.batch
    else:
        engine = VitEngine(
            model_path,
            dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32,
            attn_impl=attn_impl,
            mm_impl=mm_impl,
            verbose=verbose,
        )
    items = collect_images(dataset_dir, per_class, ext)
    if not items:
        print(f"no *{ext} images under {dataset_dir}", file=sys.stderr)
        return 0.0

    correct = total = 0
    t0 = time.perf_counter()
    with open(output_file, "w") as out:
        for start in range(0, len(items), batch):
            chunk = items[start : start + batch]
            paths = [p for p, _ in chunk]
            # native threaded batch decode with per-file PIL retry for
            # formats the native decoder rejects (GIF/TGA/...)
            images = load_images_rgb_batch(paths)

            pixels, kept = [], []
            for (path, cls), img in zip(chunk, images):
                if img is None:
                    print(f"Failed to load image from {path}", file=sys.stderr)
                    continue
                pixels.append(engine.preprocess_image(img))
                kept.append((path, cls))
            if not pixels:
                continue
            # pad the tail chunk to the full batch so the jitted forward
            # compiles exactly once (static shapes — SURVEY.md §7)
            n_real = len(pixels)
            while len(pixels) < batch:
                pixels.append(pixels[0])
            probs = np.asarray(
                engine.predict_probs_batch(jnp.stack(pixels))
            )[:n_real]
            preds = probs.argmax(axis=-1)
            for (path, cls), idx in zip(kept, preds):
                pred_name = (
                    classnames[idx] if idx < len(classnames) else f"LABEL_{idx}"
                )
                if pred_name == cls:
                    correct += 1
                total += 1
                out.write(f"{os.path.basename(path)},{cls},{pred_name}\n")
            if verbose and (start // batch) % 10 == 0:
                el = time.perf_counter() - t0
                print(
                    f"  {total}/{len(items)} images, "
                    f"{total / max(el, 1e-9):.1f} img/s",
                    file=sys.stderr,
                )

    accuracy = correct / max(total, 1)
    print(f"Top-1 Accuracy: {accuracy * 100.0}%")
    return accuracy


def main(argv=None) -> int:
    from vit_cpp_tpu.utils.compile_cache import enable_from_env

    enable_from_env()
    ap = argparse.ArgumentParser(
        description="ImageNet top-1 accuracy eval (reference tests/benchmark.cpp)"
    )
    ap.add_argument("model_path")
    ap.add_argument("dataset_dir")
    ap.add_argument(
        "num_images_per_class",
        type=int,
        help="cap per class; <= 0 means all images",
    )
    ap.add_argument("output_file", nargs="?", default="predictions.txt")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    ap.add_argument(
        "--attn", choices=["xla", "pallas", "pallas-fast"], default="xla"
    )
    ap.add_argument("--mm", choices=["xla", "pallas", "int8"], default="xla")
    ap.add_argument("--ext", default=".JPEG")
    args = ap.parse_args(argv)
    run_eval(
        args.model_path,
        args.dataset_dir,
        args.num_images_per_class,
        args.output_file,
        batch=args.batch,
        dtype=args.dtype,
        attn_impl=args.attn,
        mm_impl=args.mm,
        ext=args.ext,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
