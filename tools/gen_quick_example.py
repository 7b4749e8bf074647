"""Regenerate docs/QUICK_EXAMPLE.md — the committed `vit` CLI transcript.

The reference's README quick-example block (README.md:53-94: magpie.jpeg ->
top-5 labels) is its de-facto regression test. This is ours, generated from
the synthetic quick-example checkpoint (testing/synthetic.py:
write_quick_example_model — ViT-tiny/16 @224 f16, seed 42, ImageNet label
strings) so it runs without network weights. stdout is DETERMINISTIC
(hparams echo + top-5 lines); timing lines live on stderr and are recorded
as machine-specific context only. tests/test_cli.py asserts the stdout
block line-for-line.

Run on CPU from the repo root:  JAX_PLATFORMS=cpu python tools/gen_quick_example.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, ".")

REPO = os.path.dirname(os.path.abspath(os.path.dirname(__file__)))


def _run_cli(module, model, image, extra):
    cmd = [sys.executable, "-m", module, "-m", model, "-i", image, *extra]
    return subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        timeout=2400,
        cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )


def main() -> int:
    from vit_cpp_tpu.testing.synthetic import (
        write_quick_example_model,
        write_quick_example_vitstr_model,
    )

    with tempfile.TemporaryDirectory() as d:
        model = os.path.join(d, "vit-tiny-quick.gguf")
        write_quick_example_model(model)
        r = _run_cli(
            "vit_cpp_tpu.cli.vit", model, "assets/magpie.jpeg", ["-k", "5"]
        )
        smodel = os.path.join(d, "vitstr-tiny-quick.gguf")
        write_quick_example_vitstr_model(smodel)
        rs = _run_cli(
            "vit_cpp_tpu.cli.vitstr", smodel, "assets/vitstr/demo_1.png", []
        )
        re_ = _run_cli(
            "vit_cpp_tpu.cli.explain",
            model,
            "assets/magpie.jpeg",
            ["-o", os.path.join(d, "heat.png")],
        )
    for rr in (r, rs, re_):
        if rr.returncode != 0:
            sys.stderr.write(rr.stderr)
            return 1
    # the models live in a temp dir: normalize the path so the committed
    # stdout blocks are deterministic (tests do the same substitution)
    stdout = r.stdout.replace(d, "<tmp>")
    stderr = r.stderr.replace(d, "<tmp>")
    s_stdout = rs.stdout.replace(d, "<tmp>")
    s_stderr = rs.stderr.replace(d, "<tmp>")
    e_stdout = re_.stdout.replace(d, "<tmp>")
    e_stderr = re_.stderr.replace(d, "<tmp>")
    display_cmd = (
        "python -m vit_cpp_tpu.cli.vit -m vit-tiny-quick.gguf "
        "-i assets/magpie.jpeg -k 5"
    )
    out = os.path.join(REPO, "docs", "QUICK_EXAMPLE.md")
    with open(out, "w") as f:
        f.write(
            "# Quick example — committed console transcript\n\n"
            "The analogue of the reference's README quick-example block "
            "(README.md:53-94): one image through the `vit` CLI, with the "
            "full console surface committed so output parity is diffable "
            "end-to-end. The checkpoint is the deterministic synthetic "
            "quick-example model (`vit_cpp_tpu.testing.synthetic."
            "write_quick_example_model` — ViT-tiny/16 @224 f16, seed 42, "
            "ImageNet label strings); predictions are therefore arbitrary, "
            "but every line of the surface is the reference's. "
            "`tests/test_cli.py::test_quick_example_transcript` regenerates "
            "this run and asserts the stdout block below line-for-line; "
            "regenerate with `python tools/gen_quick_example.py`.\n\n"
            f"```console\n$ {display_cmd}\n"
            "```\n\nstdout (deterministic, asserted by test):\n\n"
            "```text\n"
            + stdout
            + "```\n\nstderr (timing is machine-specific — this transcript "
            "is a 1-core CPU run whose processing time is dominated by the "
            "first-run XLA compile; TPU serving numbers live in "
            "BENCH_DETAILS.json / docs/TUNING.md):\n\n```text\n"
            + stderr
            + "```\n\n"
            "## ViTSTR demo (committed transcript)\n\n"
            "The reference extension's demo surface (extensions/"
            "vitstr.cpp/README.md:35-45) on the synthetic ViTSTR "
            "quick-example checkpoint (`write_quick_example_vitstr_model`"
            " — recognized text is arbitrary, the console surface is the "
            "reference's):\n\n"
            "```console\n$ python -m vit_cpp_tpu.cli.vitstr -m "
            "vitstr-tiny-quick.gguf -i assets/vitstr/demo_1.png\n"
            "```\n\nstdout (deterministic, asserted by test):\n\n"
            "```text\n" + s_stdout + "```\n\nstderr:\n\n```text\n"
            + s_stderr + "```\n\n"
            "## Attention rollout (committed transcript)\n\n"
            "`vit-explain` on the same quick-example checkpoint: top-5 "
            "plus the rollout saliency heatmap (Abnar & Zuidema 2020; "
            "models/attention_maps.py). No reference equivalent — its "
            "graph emits logits only:\n\n"
            "```console\n$ python -m vit_cpp_tpu.cli.explain -m "
            "vit-tiny-quick.gguf -i assets/magpie.jpeg -o heat.png\n"
            "```\n\nstdout (deterministic, asserted by test):\n\n"
            "```text\n" + e_stdout + "```\n\nstderr:\n\n```text\n"
            + e_stderr + "```\n"
        )
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
