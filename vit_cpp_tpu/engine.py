"""High-level inference engines: load once, classify many.

The TPU-native analogue of the reference's load -> preprocess -> predict
flow (main.cpp:26-113), minus its per-image graph rebuild: the forward pass
is jitted once per (model, batch-shape) and reused. Exposes both the
single-image parity path (f32, matmul precision 'highest') and the
throughput path (bf16, batched).

`VitstrEngine` is the scene-text variant (reference extensions/vitstr.cpp)
— same engine, different head: grayscale preprocessing, the 25-position
sequence readout and greedy decoding. The reference built it by forking the
whole engine; here it is a subclass that swaps the preprocess and decode
stages (SURVEY.md §7 step 6: "a head abstraction instead of forking").
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vit_cpp_tpu.gguf.reader import read_model
from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.io.image import load_image_rgb
from vit_cpp_tpu.models.params import load_params
from vit_cpp_tpu.models.vit import predict_probs
from vit_cpp_tpu.ops.preprocess import preprocess


def detect_hparams(mf) -> VitHParams:
    """Infer extension hparams not stored in the file format.

    The reference's ViTSTR files reuse the classifier format; the loader
    learns in_chans=1 only from the patch conv weight's shape (ne2=1,
    extensions/vitstr.cpp/vitstr.cpp:482). A 1-channel model implies the
    ViTSTR sequence head (fixed seq_len=25, vitstr.cpp:865).
    """
    hp = mf.hparams
    pe = mf.tensors.get("patch_embed.proj.weight")
    if pe is not None and len(pe.shape) == 4 and pe.shape[1] != hp.in_chans:
        hp = dataclasses.replace(hp, in_chans=int(pe.shape[1]))
    if hp.in_chans == 1 and hp.seq_len is None:
        from vit_cpp_tpu.models.vitstr import VITSTR_SEQ_LEN

        hp = dataclasses.replace(hp, seq_len=VITSTR_SEQ_LEN)
    # DeiT distilled / CLIP-style pre-norm extensions, likewise declared
    # by tensor presence (hparams.py; models/params.py re-infers the same
    # way for direct load_params callers).
    if "dist_token" in mf.tensors and hp.num_prefix_tokens == 1:
        hp = dataclasses.replace(hp, num_prefix_tokens=2)
    if "cls_token" not in mf.tensors and hp.num_prefix_tokens == 1:
        hp = dataclasses.replace(hp, num_prefix_tokens=0)
    if "norm_pre.weight" in mf.tensors and not hp.norm_pre:
        hp = dataclasses.replace(hp, norm_pre=True)
    reg = mf.tensors.get("reg_token")
    if reg is not None and not hp.num_reg_tokens:
        n_reg = int(np.prod(reg.shape)) // hp.hidden_size
        hp = dataclasses.replace(hp, num_reg_tokens=n_reg)
    if "head.weight" not in mf.tensors and hp.num_classes:
        # headless files are written with num_classes=0 (converter /
        # save_params); classes-in-header with no head tensor is a
        # truncated or mis-converted checkpoint — fail fast (review r3)
        raise ValueError(
            f"header declares {hp.num_classes} classes but head.weight "
            "is missing — truncated or mis-converted checkpoint "
            "(headless encoders are written with num_classes=0)"
        )
    if "fc_norm.weight" in mf.tensors and hp.global_pool != "avg":
        hp = dataclasses.replace(hp, global_pool="avg")
    if "attn_pool.probe" in mf.tensors and hp.global_pool != "map":
        # SigLIP family: attention pooling + [-1,1] pixel normalization
        hp = dataclasses.replace(hp, global_pool="map", pixel_norm="unit")
    if "meta.clip" in mf.tensors and hp.hidden_act != "quick_gelu":
        # CLIP family marker: QuickGELU MLPs + CLIP pixel normalization
        hp = dataclasses.replace(
            hp, hidden_act="quick_gelu", pixel_norm="clip", eps=1e-5
        )
    pos = mf.tensors.get("pos_embed")
    if pos is not None and hp.n_prefix and not hp.no_embed_class:
        n_rows = int(np.prod(pos.shape)) // hp.hidden_size
        if n_rows == hp.n_patches:
            hp = dataclasses.replace(hp, no_embed_class=True)
    from vit_cpp_tpu.models.params import infer_moe_hparams

    return infer_moe_hparams(hp, mf.tensors)


class VitEngine:
    def __init__(
        self,
        model_path: str,
        *,
        dtype=jnp.float32,
        eps: Optional[float] = None,
        interpolation: Optional[str] = None,
        matmul_precision: Optional[str] = None,
        attn_impl: str = "xla",
        mm_impl: str = "xla",
        fold_ln: bool = False,
        act_quant: str = "dynamic",
        act_scales: Optional[str] = None,
        img_size: Optional[int] = None,
        patch_size: Optional[int] = None,
        tome: int = 0,
        verbose: bool = True,
    ):
        t0 = time.perf_counter()
        if verbose:
            print(f"vit_model_load: loading model from '{model_path}' - please wait")
        mf = read_model(model_path)
        hp = detect_hparams(mf)
        if eps is not None:
            hp = dataclasses.replace(hp, eps=eps)
        if interpolation is not None:
            hp = dataclasses.replace(hp, interpolation=interpolation)
        if verbose:
            print(f"vit_model_load: hidden_size            = {hp.hidden_size}")
            print(f"vit_model_load: num_hidden_layers      = {hp.num_hidden_layers}")
            print(f"vit_model_load: num_attention_heads    = {hp.num_attention_heads}")
            print(f"vit_model_load: patch_size             = {hp.patch_size}")
            print(f"vit_model_load: img_size               = {hp.img_size}")
            print(f"vit_model_load: num_classes            = {hp.num_classes}")
            print(f"vit_model_load: ftype                  = {hp.ftype}")
            print(f"vit_model_load: qntvr                  = {mf.qntvr}")
            total_bytes = sum(
                r.dtype.row_bytes(r.n_elements) for r in mf.tensors.values()
            )
            print(
                f"vit_model_load: model size = {total_bytes / 1024 / 1024:8.2f} MB "
                f"/ num tensors = {len(mf.tensors)}"
            )
        self.id2label = mf.id2label
        self.params = load_params(mf, dtype=dtype, hparams=hp)
        if (img_size is not None and img_size != hp.img_size) or (
            patch_size is not None and patch_size != hp.patch_size
        ):
            # serve at a non-native resolution and/or patch granularity:
            # the pos_embed grid is bicubically resampled (timm
            # resample_abs_pos_embed semantics) and the patch-embedding
            # kernel PI-resized (FlexiViT / timm resample_patch_embed
            # semantics) — models/resample.py. The reference can only
            # serve the trained geometry.
            from vit_cpp_tpu.models.resample import resample_params

            patch_changed = (
                patch_size is not None and patch_size != hp.patch_size
            )
            self.params, hp = resample_params(
                self.params, hp, img_size, patch_size=patch_size
            )
            if verbose:
                print(
                    f"vit_model_load: geometry override      = "
                    f"{hp.img_size} px / patch {hp.patch_size} "
                    f"(pos_embed resampled"
                    + (
                        ", patch_embed PI-resized)"
                        if patch_changed
                        else ")"
                    )
                )
        self.hp = hp
        if mm_impl == "int8":
            # W8A8 serving: requantize block-scaled weights to channelwise
            # int8 once, then every matmul runs on the int8 MXU path
            # (ops/pallas_int8_matmul.py). Selected explicitly; the f16
            # parity path never takes it.
            from vit_cpp_tpu.quant.int8 import convert_params_to_int8

            self.params = convert_params_to_int8(self.params)
        if fold_ln:
            # serving-mode: absorb LN affines into the adjacent matmuls
            # (models/fold.py); numerics shift only by f32 re-association
            from vit_cpp_tpu.models.fold import fold_layernorms

            self.params = fold_layernorms(self.params, mm_impl=mm_impl)
        if matmul_precision is None:
            # f32 engines are the reference-parity path -> exact matmuls;
            # bf16 serving must NOT get 'highest' (XLA would emulate f32
            # with multi-pass bf16 matmuls, ~3x slower on the MXU)
            matmul_precision = "highest" if dtype == jnp.float32 else "default"
        self.matmul_precision = matmul_precision
        self._attn_impl = attn_impl
        self._mm_impl = mm_impl
        if act_quant not in ("dynamic", "static"):
            raise ValueError(f"act_quant must be dynamic|static, got {act_quant!r}")
        if act_quant == "static" and mm_impl != "int8":
            raise ValueError("act_quant='static' requires mm_impl='int8'")
        if act_quant == "static" and hp.num_experts:
            raise ValueError(
                "static act scales are unsupported for MoE checkpoints "
                "(the calibrator walks the dense block stack, "
                "quant/calibrate.py — serve MoE with dynamic W8A8)"
            )
        if act_scales is not None:
            # pre-measured scales (a QAT run's OUT.act_scales.json,
            # quant/qat.save_act_scales): attach and skip calibration —
            # these are the exact scales training clipped against, so
            # the served arithmetic IS the trained objective; the
            # calibration guardrail is replaced by the run's own val
            # scores
            if act_quant != "static":
                raise ValueError("act_scales requires act_quant='static'")
            if fold_ln:
                # folding LN affines into the matmuls changes every
                # pre-GEMM activation distribution; scales measured on
                # the training (unfolded) graph would mis-clip — use
                # on-device calibration (no act_scales) with fold_ln
                raise ValueError(
                    "act_scales (training-measured, unfolded graph) is "
                    "incompatible with fold_ln — drop one"
                )
            from vit_cpp_tpu.quant.calibrate import attach_act_scales
            from vit_cpp_tpu.quant.qat import load_act_scales

            self.params = attach_act_scales(
                self.params, load_act_scales(act_scales)
            )
            self._needs_calibration = False
            if verbose:
                print(
                    f"vit_model_load: static act scales      = {act_scales}"
                )
        else:
            # static activation scales are calibrated lazily on the first
            # served batch (quant/calibrate.py); callers with a
            # representative sample can call .calibrate(images) explicitly
            self._needs_calibration = act_quant == "static"
        if tome and hp.seq_len is not None:
            raise ValueError(
                "tome token merging is incompatible with sequence-head "
                "(ViTSTR) checkpoints"
            )
        if tome and hp.num_experts:
            raise ValueError(
                "tome + MoE is not supported (both re-plan the layer loop)"
            )
        self._tome = tome
        if tome and verbose:
            from vit_cpp_tpu.ops.tome import tome_schedule

            rs = tome_schedule(hp.n_patches, hp.num_hidden_layers, tome)
            print(
                f"vit_model_load: tome r={tome} — patch tokens "
                f"{hp.n_patches} -> {hp.n_patches - sum(rs)} over "
                f"{hp.num_hidden_layers} layers"
            )

        def _predict(params, images):
            with jax.default_matmul_precision(self.matmul_precision):
                return predict_probs(
                    params, images, self.hp, attn_impl=attn_impl,
                    mm_impl=mm_impl, tome=self._tome,
                )

        self._predict = jax.jit(_predict)
        self.load_ms = (time.perf_counter() - t0) * 1000.0

    # -- multi-chip serving ---------------------------------------------------

    def shard(self, mesh) -> "VitEngine":
        """Distribute the engine over a ('data', 'model') mesh.

        Parameters get megatron TP shardings (replicated when the model
        axis is 1 — pure data parallelism); serving batches are sharded
        over 'data' in predict_probs_batch. The reference has no
        distributed execution at all (SURVEY.md §2.7); this is the ICI
        serving axis the TPU design adds. Batch size must divide the data
        axis.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vit_cpp_tpu.parallel.sharding import shard_params

        tp = int(mesh.shape.get("model", 1))
        if tp > 1 and self.hp.num_attention_heads % tp:
            # the megatron qkv column split must land on head boundaries:
            # a tp that slices mid-head makes XLA gather the full qkv
            # behind the attention kernel (correct but silently serial) —
            # fail with the fix instead (VERDICT r2 weak #6)
            raise ValueError(
                f"tensor-parallel size {tp} does not divide "
                f"num_attention_heads {self.hp.num_attention_heads}; "
                f"choose a 'model' axis that divides the head count "
                f"(or tp=1 for pure data parallelism)"
            )
        self.mesh = mesh
        self.params = shard_params(self.params, mesh)
        self._batch_sharding = NamedSharding(mesh, P("data"))
        return self

    # -- single image, reference-parity path ---------------------------------

    def preprocess_image(self, img_u8: np.ndarray) -> jax.Array:
        from vit_cpp_tpu.ops.preprocess import norm_constants

        mean, std = norm_constants(self.hp.pixel_norm)
        return preprocess(
            img_u8, self.hp.img_size, mode=self.hp.interpolation,
            mean=mean, std=std,
        )

    def _print_preprocess_scale(self, img_u8: np.ndarray) -> None:
        """Reference console parity: the resampler's scale report —
        bicubic prints `scale = max(tx, ty)` (vit.cpp:230-231), bilinear
        prints per-axis scales (vit.cpp:141-144)."""
        import sys

        ny, nx = img_u8.shape[:2]
        t = self.hp.img_size
        if self.hp.interpolation == "bilinear":
            print(
                f"vit_image_preprocess: x_scale = {nx / t:f}, "
                f"y_scale = {ny / t:f}",
                file=sys.stderr,
            )
        else:
            print(
                f"vit_image_preprocess: scale = {max(nx / t, ny / t):f}",
                file=sys.stderr,
            )

    def calibrate(
        self,
        images: jax.Array,
        *,
        probe: "jax.Array | None" = None,
        min_agreement: float = 0.90,
    ) -> None:
        """Fix static activation scales from a representative batch
        (quant/calibrate.py); no-op unless act_quant='static'.

        The guardrail (VERDICT r2 weak #5): after calibrating, static-vs-
        dynamic top-1 agreement is checked on `probe` (held-out batch;
        defaults to the calibration batch, which only catches catastrophic
        saturation). Below `min_agreement` the engine WARNS and keeps the
        dynamic path — a mis-calibrated static scale silently clips
        activations at ±127, the classic static-quantization failure."""
        if not self._needs_calibration:
            return
        from vit_cpp_tpu.quant.calibrate import (
            calibrate_act_scales,
            validate_act_scales,
        )

        static = calibrate_act_scales(self.params, images, self.hp)
        try:
            validate_act_scales(
                static,
                self.params,
                probe if probe is not None else images,
                self.hp,
                min_agreement=min_agreement,
            )
        except ValueError as e:
            import sys

            print(f"vit: static calibration rejected — {e}", file=sys.stderr)
            print("vit: serving with dynamic activation scales", file=sys.stderr)
            self._needs_calibration = False
            return
        self.params = static
        self._needs_calibration = False

    def predict_probs_batch(self, images: jax.Array) -> jax.Array:
        """images: (B, C, S, S) preprocessed -> (B, classes) probabilities."""
        if self._needs_calibration:
            self.calibrate(images)
        sharding = getattr(self, "_batch_sharding", None)
        if sharding is not None:
            images = jax.device_put(images, sharding)
        return self._predict(self.params, images)

    def features_batch(self, images: jax.Array) -> jax.Array:
        """images: (B, C, S, S) preprocessed -> (B, hidden) final-LN pooled
        features ((B, seq_len, hidden) for sequence heads) — the encoder
        output without the classifier head (models/vit.py forward
        features=True). Jitted lazily on first use; serving-path knobs
        (attn/mm impl, fold-ln, static scales, shardings) all apply."""
        if self._needs_calibration:
            self.calibrate(images)
        fn = getattr(self, "_features", None)
        if fn is None:
            from vit_cpp_tpu.models.vit import forward

            def _feat(params, images):
                with jax.default_matmul_precision(self.matmul_precision):
                    return forward(
                        params,
                        images,
                        self.hp,
                        attn_impl=self._attn_impl,
                        mm_impl=self._mm_impl,
                        features=True,
                        tome=self._tome,
                    )

            self._features = fn = jax.jit(_feat)
        sharding = getattr(self, "_batch_sharding", None)
        if sharding is not None:
            images = jax.device_put(images, sharding)
        return fn(self.params, images)

    def embed_file(self, path: str) -> np.ndarray:
        """Decode, preprocess, encode: one image -> (hidden,) feature
        vector (or (seq_len, hidden)). The retrieval-embedding entry
        point; callers L2-normalize if their similarity metric needs it."""
        img = load_image_rgb(path)
        pixels = self.preprocess_image(img)
        return np.asarray(self.features_batch(pixels[None])[0])

    def attention_maps_batch(self, images: jax.Array) -> np.ndarray:
        """images: (B, C, S, S) preprocessed -> (B, L, H, T, T) f32
        attention probabilities (models/attention_maps.py). A debug/
        analysis path on the XLA attention (the production kernels never
        materialize probabilities); engine quantization and fold-ln
        apply. Jitted lazily on first use."""
        fn = getattr(self, "_attn_maps", None)
        if fn is None:
            from vit_cpp_tpu.models.attention_maps import attention_maps

            def _maps(params, images):
                with jax.default_matmul_precision(self.matmul_precision):
                    return attention_maps(params, images, self.hp)[0]

            self._attn_maps = fn = jax.jit(_maps)
        return np.asarray(fn(self.params, images))

    def attention_rollout_file(
        self, path: str, head_fuse: str = "mean"
    ) -> np.ndarray:
        """Decode, preprocess, extract: one image -> (side, side) [0, 1]
        attention-rollout saliency over the patch grid (Abnar & Zuidema
        2020; models/attention_maps.py)."""
        return self.explain_file(path, head_fuse=head_fuse)[1]

    def explain_file(
        self, path: str, topk: int = 5, head_fuse: str = "mean"
    ) -> Tuple[List[Tuple[int, float, str]], np.ndarray]:
        """One encoder pass -> ([(class_id, prob, label)] top-k, the
        (side, side) rollout saliency). The maps forward's final block
        output feeds the same pooling/norm/head as the production path
        (models/attention_maps.py head_logits), so vit-explain never runs
        the encoder twice."""
        headless = self.hp.num_classes == 0
        fn = getattr(self, "_explain", None)
        if fn is None:
            from vit_cpp_tpu.models.attention_maps import (
                attention_maps,
                head_logits,
            )

            def _explain(params, images):
                with jax.default_matmul_precision(self.matmul_precision):
                    maps, final = attention_maps(params, images, self.hp)
                    if headless:  # no classifier — rollout only
                        return maps, None
                    logits = head_logits(params, final, self.hp)
                return maps, jax.nn.softmax(
                    logits.astype(jnp.float32), axis=-1
                )

            self._explain = fn = jax.jit(_explain)
        from vit_cpp_tpu.models.attention_maps import attention_rollout

        img = load_image_rgb(path)
        pixels = self.preprocess_image(img)
        maps, probs = fn(self.params, pixels[None])
        grid = attention_rollout(maps, self.hp, head_fuse=head_fuse)[0]
        if headless:
            return [], grid
        p = np.asarray(probs[0])
        order = np.argsort(-p, kind="stable")[:topk]
        top = [
            (int(i), float(p[i]), self.id2label.get(int(i), f"LABEL_{i}"))
            for i in order
        ]
        return top, grid

    def classify_file(
        self, path: str, topk: int = 5, verbose: bool = True
    ) -> List[Tuple[int, float, str]]:
        """Decode, preprocess, predict, return [(class_id, prob, label)]."""
        if self.hp.seq_len is not None and type(self) is VitEngine:
            raise ValueError(
                "this checkpoint has a sequence head (ViTSTR); use "
                "VitstrEngine / the vitstr CLI instead of the classifier"
            )
        img = load_image_rgb(path)
        if verbose:
            print(
                f"load_image_from_file: loaded image '{path}' "
                f"({img.shape[1]} x {img.shape[0]})"
            )
        pixels = self.preprocess_image(img)
        if verbose:
            self._print_preprocess_scale(img)
            print(
                f"processed, out dims : ({self.hp.img_size} x {self.hp.img_size})"
            )
        probs = np.asarray(self.predict_probs_batch(pixels[None])[0])
        order = np.argsort(-probs, kind="stable")[:topk]
        return [
            (int(i), float(probs[i]), self.id2label.get(int(i), f"LABEL_{i}"))
            for i in order
        ]


class VitstrEngine(VitEngine):
    """Scene-text recognition engine (reference extensions/vitstr.cpp).

    Same transformer engine; grayscale (1, S, S) input and a greedy decode
    over the (seq_len, n_tokens) probability grid instead of top-k.
    """

    def preprocess_image(self, img_u8: np.ndarray) -> jax.Array:
        from vit_cpp_tpu.models.vitstr import preprocess_grayscale

        return preprocess_grayscale(img_u8, self.hp.img_size)

    def recognize_file(
        self, path: str, verbose: bool = True
    ) -> Tuple[str, float]:
        """Decode, preprocess, predict, greedy-decode -> (text, confidence)."""
        from vit_cpp_tpu.models.vitstr import greedy_decode

        img = load_image_rgb(path)
        if verbose:
            print(
                f"load_image_from_file: loaded image '{path}' "
                f"({img.shape[1]} x {img.shape[0]})"
            )
        pixels = self.preprocess_image(img)
        if verbose:
            print(
                f"processed, out dims : ({self.hp.img_size} x {self.hp.img_size})"
            )
        probs = np.asarray(self.predict_probs_batch(pixels[None])[0])
        return greedy_decode(probs, self.id2label)
