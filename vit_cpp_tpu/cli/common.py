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
):
    """gguf checkpoint or .vitx artifact -> (engine, is_vitstr).

    Artifacts carry their knobs baked at export; gguf engines get the
    CLI's dtype/mm/attn and the fold-ln default (on for the int8 serving
    path, off otherwise)."""
    from vit_cpp_tpu.aot import is_vitx

    if is_vitx(path):
        from vit_cpp_tpu.aot import AotEngine

        engine = AotEngine(path)
        return engine, engine.hp.seq_len is not None

    import jax.numpy as jnp

    from vit_cpp_tpu.engine import VitEngine, VitstrEngine, detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model

    if fold_ln is None:
        fold_ln = mm == "int8"
    is_vitstr = detect_hparams(read_model(path)).seq_len is not None
    cls = VitstrEngine if is_vitstr else VitEngine
    engine = cls(
        path,
        dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32,
        attn_impl=attn,
        mm_impl=mm,
        fold_ln=fold_ln,
        verbose=False,
    )
    return engine, is_vitstr


def model_spec(s: str) -> Tuple[str, str] | None:
    """Parse a multi-model `name=path` spec; None when `s` is a plain
    path (names must be '/'-free, so an '=' inside a directory name does
    not hijack a single-model invocation — and `./name=x.gguf` is the
    escape hatch for a file that genuinely contains '=')."""
    name, sep, path = s.partition("=")
    if sep and name and path and "/" not in name:
        return name, path
    return None
