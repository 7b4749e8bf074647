"""End-to-end CLI tests: `vit` and `quantize` console surface parity."""

import re
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.testing.synthetic import write_synthetic_model

TINY = VitHParams(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_classes=10,
    patch_size=8,
    img_size=32,
)


@pytest.fixture(scope="module")
def model_and_image(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    model = str(d / "model-f16.gguf")
    write_synthetic_model(
        model, TINY, ftype=1, seed=0, id2label={i: f"class_{i}" for i in range(10)}
    )
    img_path = str(d / "img.png")
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)).save(img_path)
    return model, img_path


def _run(args):
    return subprocess.run(
        [sys.executable, *args],
        capture_output=True,
        text=True,
        timeout=600,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo"},
    )


def test_vit_cli_end_to_end(model_and_image):
    model, img = model_and_image
    r = _run(["-m", "vit_cpp_tpu.cli.vit", "-m", model, "-i", img, "-k", "3"])
    assert r.returncode == 0, r.stderr
    # top-k lines on stdout in reference format ` > label : prob`
    lines = [l for l in r.stdout.splitlines() if l.startswith(" > ")]
    assert len(lines) == 3
    assert all(re.match(r" > class_\d+ : \d\.\d\d$", l) for l in lines)
    # hparams echo + timing report
    assert "vit_model_load: hidden_size            = 64" in r.stdout
    assert "model load time" in r.stderr
    assert "processing time" in r.stderr
    assert "total time" in r.stderr


def test_vit_cli_probs_descending_and_k(model_and_image):
    model, img = model_and_image
    r = _run(["-m", "vit_cpp_tpu.cli.vit", "-m", model, "-i", img, "-k", "10"])
    probs = [float(l.split(" : ")[1]) for l in r.stdout.splitlines() if l.startswith(" > ")]
    assert len(probs) == 10
    assert probs == sorted(probs, reverse=True)


def test_vit_cli_unknown_arg(model_and_image):
    r = _run(["-m", "vit_cpp_tpu.cli.vit", "--bogus"])
    assert "error: unknown argument: --bogus" in r.stderr
    assert "usage:" in r.stderr


def test_vit_cli_missing_model(model_and_image):
    _, img = model_and_image
    r = _run(["-m", "vit_cpp_tpu.cli.vit", "-m", "/nonexistent.gguf", "-i", img])
    assert r.returncode == 1
    assert "failed to load model" in r.stderr


def test_vit_cli_missing_image(model_and_image):
    model, _ = model_and_image
    r = _run(["-m", "vit_cpp_tpu.cli.vit", "-m", model, "-i", "/nonexistent.jpg"])
    assert r.returncode == 1
    assert "failed to load image" in r.stderr


def test_quantize_cli(model_and_image, tmp_path):
    model, _ = model_and_image
    out = str(tmp_path / "model-q8.gguf")
    r = _run(["-m", "vit_cpp_tpu.cli.quantize", model, out, "8"])
    assert r.returncode == 0, r.stderr
    assert "quantizing .." in r.stdout
    assert "hist:" in r.stdout
    assert "quantize time" in r.stdout
    from vit_cpp_tpu.gguf import read_model

    mf = read_model(out)
    assert mf.hparams.ftype == 8


def test_quantize_cli_usage():
    r = _run(["-m", "vit_cpp_tpu.cli.quantize"])
    assert r.returncode == 1
    assert "usage:" in r.stdout
    assert "type = 8 - q8_0" in r.stdout
