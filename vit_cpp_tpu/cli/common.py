"""Shared CLI plumbing: one engine-construction path for every
model-consuming command (serve, server, export_aot) so the fold-ln
default, the ViTSTR auto-detect and the gguf/.vitx routing live in
exactly one place."""

from __future__ import annotations

from typing import Tuple


def build_engine(
    path: str,
    *,
    dtype: str = "bf16",
    mm: str = "int8",
    attn: str = "pallas-fast",
    fold_ln=None,
    act: str = "dynamic",
    act_scales=None,
    img_size=None,
    patch_size=None,
    tome: int = 0,
):
    """gguf checkpoint or .vitx artifact -> (engine, is_vitstr).

    Artifacts carry their knobs baked at export; gguf engines get the
    CLI's dtype/mm/attn and the fold-ln default (on for the int8 serving
    path, off otherwise). `act="static"` selects calibrated static
    activation scales (quant/calibrate.py): calibrate explicitly via
    `calibrate_engine_from_paths` (or the first served batch, lazily)."""
    from vit_cpp_tpu.aot import is_vitx

    if is_vitx(path):
        from vit_cpp_tpu.aot import AotEngine

        if act == "static":
            raise ValueError(
                "--act static does not apply to a .vitx artifact — its "
                "activation scales were baked at export (vit-export "
                "--act static --calib-dir ...)"
            )
        if img_size is not None or patch_size is not None:
            raise ValueError(
                "--img-size/--patch-size do not apply to a .vitx artifact "
                "— its geometry was baked at export (vit-export "
                "--img-size/--patch-size ...)"
            )
        if tome:
            raise ValueError(
                "--tome does not apply to a .vitx artifact — the graph "
                "was baked at export (vit-export --tome R)"
            )
        engine = AotEngine(path)
        return engine, engine.hp.seq_len is not None

    import jax.numpy as jnp

    from vit_cpp_tpu.engine import VitEngine, VitstrEngine, detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model

    if fold_ln is None:
        # act_scales were measured on the UNFOLDED training graph
        # (engine rejects the combination) — default fold off for them
        fold_ln = mm == "int8" and act_scales is None
    is_vitstr = detect_hparams(read_model(path)).seq_len is not None
    cls = VitstrEngine if is_vitstr else VitEngine
    engine = cls(
        path,
        dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32,
        attn_impl=attn,
        mm_impl=mm,
        fold_ln=fold_ln,
        act_quant=act,
        act_scales=act_scales,
        img_size=img_size,
        patch_size=patch_size,
        tome=tome,
        verbose=False,
    )
    return engine, is_vitstr


def calibrate_engine_from_paths(engine, calib: str, n: int = 16) -> bool:
    """Calibrate static activation scales from a directory (or one file)
    of representative images; returns params_have_static_scales(engine
    .params) — False means the agreement guardrail rejected the scales
    and the engine fell back to dynamic quantization.

    16 images are enough to pin the per-layer maxima (measured,
    tests/test_w8a8_accuracy.py / docs/TUNING.md static-scale section).
    """
    import os

    import jax.numpy as jnp

    from vit_cpp_tpu.io.image import IMAGE_EXTS, load_image_rgb

    paths = []
    if os.path.isdir(calib):
        for root, _, files in os.walk(calib):
            paths.extend(
                os.path.join(root, f)
                for f in sorted(files)
                if os.path.splitext(f)[1] in IMAGE_EXTS
            )
    else:
        paths = [calib]
    if not paths:
        raise ValueError(f"no calibration images under {calib}")
    pix = []
    for p in paths:
        if len(pix) >= n:
            break
        try:
            pix.append(engine.preprocess_image(load_image_rgb(p)))
        except (OSError, ValueError):  # undecodable file in the set
            continue
    if not pix:
        raise ValueError(f"no decodable calibration images under {calib}")
    pixels = jnp.stack(pix)
    engine.calibrate(pixels)
    from vit_cpp_tpu.quant.int8 import params_have_static_scales

    return params_have_static_scales(engine.params)


def model_spec(s: str) -> Tuple[str, str] | None:
    """Parse a multi-model `name=path` spec; None when `s` is a plain
    path (names must be '/'-free, so an '=' inside a directory name does
    not hijack a single-model invocation — and `./name=x.gguf` is the
    escape hatch for a file that genuinely contains '=')."""
    name, sep, path = s.partition("=")
    if sep and name and path and "/" not in name:
        return name, path
    return None
