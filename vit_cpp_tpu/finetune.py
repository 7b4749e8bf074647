"""Fine-tune a classifier checkpoint on an image-folder dataset.

The reference is inference-only (SURVEY.md §0); this closes the loop the
TPU build adds: gguf checkpoint -> dequantized f32 pytree -> pjit train
steps (parallel/train.py) over an optional dp x tp mesh -> orbax
checkpoint/resume (parallel/checkpoint.py) -> servable gguf
(models/export.py). Dataset layout is the benchmark harness's tree
(cli/benchmark.py, reference tests/benchmark.cpp:54-76): one subdirectory
per class, any decodable image inside.

Head transfer: when the dataset's class count differs from the
checkpoint's, the head is re-initialized (zeros — the standard
linear-probe init) and hparams are rewritten, so any ImageNet checkpoint
fine-tunes onto an arbitrary folder taxonomy.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from vit_cpp_tpu.io.image import IMAGE_EXTS


def load_dataset(data_dir: str) -> Tuple[List[str], np.ndarray, List[str]]:
    """Walk `data_dir/<class>/*` -> (paths, int labels, sorted class names)."""
    classes = sorted(
        d
        for d in os.listdir(data_dir)
        if os.path.isdir(os.path.join(data_dir, d))
    )
    if not classes:
        raise ValueError(f"{data_dir}: no class subdirectories")
    paths: List[str] = []
    labels: List[int] = []
    for ci, cls in enumerate(classes):
        sub = os.path.join(data_dir, cls)
        for f in sorted(os.listdir(sub)):
            if os.path.splitext(f)[1] in IMAGE_EXTS:
                paths.append(os.path.join(sub, f))
                labels.append(ci)
    if not paths:
        raise ValueError(f"{data_dir}: no images under class directories")
    return paths, np.asarray(labels, np.int32), classes


def load_vitstr_dataset(data_dir: str) -> Tuple[List[str], List[str]]:
    """Scene-text training pairs from `data_dir`.

    Preferred: a `gt.txt` with one `relative/path<TAB>text` line per
    sample (ICDAR-style). Fallback: every image's ground truth is its
    filename stem, with a trailing `_<digits>` dedup suffix stripped
    (`hello_2.png` -> "hello")."""
    gt = os.path.join(data_dir, "gt.txt")
    paths: List[str] = []
    texts: List[str] = []
    if os.path.exists(gt):
        with open(gt, encoding="utf-8") as f:
            for ln, line in enumerate(f, 1):
                line = line.rstrip("\n")
                if not line:
                    continue
                rel, sep, text = line.partition("\t")
                if not sep:
                    raise ValueError(f"{gt}:{ln}: want 'path<TAB>text'")
                paths.append(os.path.join(data_dir, rel))
                texts.append(text)
    else:
        for f in sorted(os.listdir(data_dir)):
            stem, ext = os.path.splitext(f)
            if ext not in IMAGE_EXTS:
                continue
            head, _, tail = stem.rpartition("_")
            if head and tail.isdigit():
                stem = head
            paths.append(os.path.join(data_dir, f))
            texts.append(stem)
    if not paths:
        raise ValueError(f"{data_dir}: no training samples (gt.txt or images)")
    return paths, texts


def encode_texts(texts: List[str], seq_len: int) -> np.ndarray:
    """Texts -> (N, seq_len) int32 targets for vitstr_cross_entropy_loss.

    Position 0 ([GO]) and the tail beyond the [s] stop token are -1
    (masked); positions 1..n are char ids, n+1 the stop token — the
    exact read pattern of greedy_decode (models/vitstr.py)."""
    from vit_cpp_tpu.models.vitstr import EOS_ID, VITSTR_VOCAB

    char2id = {c: i for i, c in enumerate(VITSTR_VOCAB) if len(c) == 1}
    out = np.full((len(texts), seq_len), -1, np.int32)
    for i, text in enumerate(texts):
        if len(text) > seq_len - 2:
            raise ValueError(
                f"label {text!r} is {len(text)} chars > seq_len-2 = {seq_len - 2}"
            )
        for j, c in enumerate(text):
            if c not in char2id:
                raise ValueError(f"label {text!r}: char {c!r} not in the vocab")
            out[i, 1 + j] = char2id[c]
        out[i, 1 + len(text)] = EOS_ID
    return out


def evaluate_vitstr(
    params, hp, pixels: np.ndarray, texts: List[str], batch: int,
    qat: str = "", qat_scales=None,
) -> float:
    """Word-level exact-match accuracy via the device greedy decoder."""
    import jax.numpy as jnp

    from vit_cpp_tpu.models.vitstr import (
        decode_tokens,
        greedy_decode_device,
        vitstr_id2label,
    )

    fwd = _eval_fwd_probs()
    id2label = vitstr_id2label()
    correct = 0
    for i in range(0, len(pixels), batch):
        chunk = pixels[i : i + batch]
        n = len(chunk)
        if n < batch:
            chunk = np.concatenate([chunk, np.repeat(chunk[:1], batch - n, axis=0)])
        probs = fwd(
            params, jnp.asarray(chunk), hp=hp, qat=qat,
            qat_scales=qat_scales,
        )
        toks, valid, _ = greedy_decode_device(probs)
        toks, valid = np.asarray(toks)[:n], np.asarray(valid)[:n]
        for j in range(n):
            if decode_tokens(toks[j], valid[j], id2label) == texts[i + j]:
                correct += 1
    return correct / len(pixels)


def _dense_f32(params):
    """Dequantize every QuantLinear leaf -> trainable dense f32 pytree."""
    import jax
    import jax.numpy as jnp

    from vit_cpp_tpu.quant.qlinear import QuantLinear

    def leaf(l):
        if isinstance(l, QuantLinear):
            return jnp.asarray(l.dequantize(), jnp.float32)
        return jnp.asarray(l, jnp.float32)

    return jax.tree.map(leaf, params, is_leaf=lambda x: isinstance(x, QuantLinear))


def _reinit_head(params, hp, num_classes: int):
    """Zero-init a fresh (h, num_classes) head for transfer learning.

    Distilled checkpoints (head_dist, models/params.py) get both heads
    re-initialized: without a teacher, fine-tuning trains both on the
    label loss (hard distillation with ground truth as the teacher) and
    inference keeps averaging them (models/vit.py forward)."""
    import jax.numpy as jnp

    params = dict(params)
    fresh = lambda: {
        "kernel": jnp.zeros((hp.hidden_size, num_classes), jnp.float32),
        "bias": jnp.zeros((num_classes,), jnp.float32),
    }
    params["head"] = fresh()
    if "head_dist" in params:
        params["head_dist"] = fresh()
    return params, dataclasses.replace(hp, num_classes=num_classes)


def _trainable_labels(params, freeze_backbone: bool):
    """Per-leaf optax.multi_transform labels: 'train' or 'freeze'."""
    import jax.tree_util as jtu

    def label(path, _):
        if not freeze_backbone:
            return "train"
        top = path[0]
        key = getattr(top, "key", getattr(top, "name", None))
        return "train" if key in ("head", "head_dist") else "freeze"

    return jtu.tree_map_with_path(label, params)


def _preprocess_chunk(paths, hp, decode_threads: int) -> np.ndarray:
    """Decode + canvas-preprocess a chunk of files -> (n, C, S, S) f32
    host array (grayscale pipeline for sequence-head models). Failed
    decodes raise (training data must be clean, unlike the serving
    skip-markers)."""
    from vit_cpp_tpu.serve import _decode_many

    imgs = _decode_many(paths, decode_threads or (os.cpu_count() or 1))
    for p, im in zip(paths, imgs):
        if im is None:
            raise ValueError(f"undecodable training image: {p}")
    if hp.seq_len is not None:
        from vit_cpp_tpu.models.vitstr import preprocess_grayscale_batch

        return np.asarray(preprocess_grayscale_batch(imgs, hp.img_size))
    from vit_cpp_tpu.ops.preprocess import preprocess_batch

    from vit_cpp_tpu.ops.preprocess import norm_constants

    mean, std = norm_constants(hp.pixel_norm)
    return np.asarray(
        preprocess_batch(
            imgs, hp.img_size, mode=hp.interpolation, mean=mean, std=std
        )
    )


def _preprocess_all(paths, hp, decode_threads: int) -> np.ndarray:
    """Decode + canvas-preprocess every file -> (N, C, S, S) f32 host
    array. ~600 KB per 224px image: fine up to tens of thousands of
    images, use stream=True beyond that."""
    chunk = 64
    return np.concatenate(
        [
            _preprocess_chunk(paths[i : i + chunk], hp, decode_threads)
            for i in range(0, len(paths), chunk)
        ],
        axis=0,
    )


def _prefetch_batches(fetch, idx_seq, depth: int = 2):
    """Run `fetch(idx)` for each index array on a background thread,
    `depth` batches ahead of the consumer — decode + preprocess of batch
    s+1 overlaps the device step on batch s (the training-loop analogue
    of serve.py's double-buffered pipeline). Worker exceptions re-raise
    at the consuming iteration. If the consumer abandons the generator
    (a train step raised, KeyboardInterrupt), the finally block signals
    the worker to stop and drains the queue so it cannot stay blocked in
    put() holding preprocessed chunks (review r3)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    def worker():
        try:
            for idx in idx_seq:
                if stop.is_set():
                    return
                q.put(fetch(idx))
        except BaseException as e:  # surface decode errors to the loop
            q.put(e)
            return
        q.put(_END)

    threading.Thread(
        target=worker, name="vit-finetune-prefetch", daemon=True
    ).start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # unblock a worker waiting in put(); it checks `stop` before the
        # next fetch and exits (at most one more item lands and is dropped)
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break


_EVAL_FWD = None  # persistent jitted fns: per-epoch eval must not retrace
_EVAL_FWD_PROBS = None
_EMA_UPDATE = None


def _ema_update():
    """Jitted EMA step `e := d*e + (1-d)*p` over the params pytree; the old
    EMA buffers are donated (the update is pure HBM traffic — same class
    as the adamw update, ~1.7 ms at ViT-B/16, TUNING train breakdown)."""
    global _EMA_UPDATE
    if _EMA_UPDATE is None:
        import jax

        _EMA_UPDATE = jax.jit(
            lambda e, p, d: jax.tree.map(
                lambda ev, pv: ev * d + pv * (1.0 - d), e, p
            ),
            donate_argnums=0,
        )
    return _EMA_UPDATE


def _eval_fwd():
    global _EVAL_FWD
    if _EVAL_FWD is None:
        import jax
        import jax.numpy as jnp

        from vit_cpp_tpu.models.vit import forward

        def fwd(p, x, hp, tome=0, qat="", qat_scales=None):
            if qat:
                # score the model that will be SERVED: fake-quantized
                # weights + activation qdq (quant/qat.py) — static
                # per-tensor scales when qat_scales is given
                from vit_cpp_tpu.quant.qat import fake_quant_params

                p = fake_quant_params(p, qat)
                if qat_scales is not None:
                    from vit_cpp_tpu.quant.qat import inject_act_scales

                    p = inject_act_scales(p, qat_scales)
            return jnp.argmax(
                forward(p, x, hp, tome=tome, mm_impl="qat" if qat else "xla"),
                axis=-1,
            )

        _EVAL_FWD = jax.jit(fwd, static_argnames=("hp", "tome", "qat"))
    return _EVAL_FWD


def _eval_fwd_probs():
    global _EVAL_FWD_PROBS
    if _EVAL_FWD_PROBS is None:
        import jax
        import jax.numpy as jnp

        from vit_cpp_tpu.models.vit import forward

        def fwd(p, x, hp, qat="", qat_scales=None):
            if qat:
                from vit_cpp_tpu.quant.qat import fake_quant_params

                p = fake_quant_params(p, qat)
                if qat_scales is not None:
                    from vit_cpp_tpu.quant.qat import inject_act_scales

                    p = inject_act_scales(p, qat_scales)
            return jax.nn.softmax(
                forward(
                    p, x, hp, mm_impl="qat" if qat else "xla"
                ).astype(jnp.float32),
                axis=-1,
            )

        _EVAL_FWD_PROBS = jax.jit(fwd, static_argnames=("hp", "qat"))
    return _EVAL_FWD_PROBS


def evaluate(
    params, hp, pixels: np.ndarray, labels: np.ndarray, batch: int,
    tome: int = 0, qat: str = "", qat_scales=None,
) -> float:
    """Top-1 accuracy of `params` on preprocessed pixels (pads the tail so
    one program serves every chunk). `tome` evaluates through the merged
    graph — a --tome fine-tune validates what it will serve; `qat`
    likewise scores the fake-quantized model (the served arithmetic)."""
    import jax.numpy as jnp

    fwd = _eval_fwd()
    correct = 0
    for i in range(0, len(pixels), batch):
        chunk = pixels[i : i + batch]
        n = len(chunk)
        if n < batch:
            chunk = np.concatenate([chunk, np.repeat(chunk[:1], batch - n, axis=0)])
        pred = np.asarray(
            fwd(
                params, jnp.asarray(chunk), hp=hp, tome=tome, qat=qat,
                qat_scales=qat_scales,
            )
        )[:n]
        correct += int((pred == labels[i : i + n]).sum())
    return correct / len(pixels)


def finetune(
    model: str,
    data_dir: str,
    *,
    epochs: int = 3,
    batch: int = 32,
    lr: float = 1e-4,
    weight_decay: float = 0.05,
    schedule: str = "const",
    warmup_steps: int = 0,
    grad_accum: int = 1,
    clip_norm: float = 0.0,
    mu_dtype: str = "f32",
    freeze_backbone: bool = False,
    augment: str = "none",
    label_smoothing: float = 0.0,
    mixup: float = 0.0,
    ema: float = 0.0,
    mesh=None,
    fsdp: bool = False,
    ckpt_dir: Optional[str] = None,
    seed: int = 0,
    decode_threads: int = 0,
    val_dir: Optional[str] = None,
    img_size: Optional[int] = None,
    patch_size: Optional[int] = None,
    tome: int = 0,
    moe: int = 0,
    moe_every: int = 2,
    moe_top_k: int = 1,
    moe_capacity: float = 1.25,
    lora: int = 0,
    lora_alpha: float = 0.0,
    distill: str = "",
    distill_mode: str = "soft",
    distill_alpha: float = 0.5,
    distill_tau: float = 3.0,
    qat: str = "",
    qat_act: str = "dynamic",
    qat_scales_out: Optional[str] = None,
    stream: bool = False,
    log=print,
) -> Tuple[Dict[str, Any], Any, List[str], List[float]]:
    """Run the fine-tune loop; returns (params, hp, classnames, epoch_losses).

    Resumable: when `ckpt_dir` holds a previous run's state, training
    continues from its step count (epochs already covered are skipped).

    `augment` ("none"/"flip"/"crop"/"all"), `mixup` (Beta alpha, 0 = off)
    and `label_smoothing` are classifier-only (ops/augment.py); all
    randomness keys off (seed, global update index) so resumed runs
    replay the exact stream — every one of these settings is recorded in
    the checkpoint's sibling meta and validated on resume.

    `ema` > 0 maintains an exponential moving average of the weights
    (timm ModelEma semantics: init = the starting params, e := d*e +
    (1-d)*p after every update, no bias correction) and RETURNS the EMA
    params — that is what you serve. Validation also scores the EMA
    weights. The EMA tree rides the orbax checkpoint, so resumes are
    bit-identical.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from vit_cpp_tpu.engine import detect_hparams
    from vit_cpp_tpu.gguf.reader import read_model
    from vit_cpp_tpu.models.params import load_params
    from vit_cpp_tpu.parallel.train import (
        TrainState,
        create_train_state,
        make_optimizer,
        shard_batch,
        train_step,
        train_step_accum,
    )

    from vit_cpp_tpu.ops.augment import augment_batch, augment_flags

    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    if fsdp and mesh is None:
        raise ValueError("--fsdp needs a device mesh (--mesh DPxTP)")
    mf = read_model(model)
    hp = detect_hparams(mf)
    aug_flip, aug_crop = augment_flags(augment)  # validates the mode
    if mixup < 0:
        raise ValueError(f"mixup alpha must be >= 0, got {mixup}")
    if not 0.0 <= ema < 1.0:
        raise ValueError(f"ema decay must be in [0, 1), got {ema}")
    if mixup and grad_accum > 1:
        # the accum scan's loss_fn contract is (params, x, y, hp); mixup
        # threads (y, y2, lam) — unsupported rather than silently wrong
        raise ValueError("--mixup is incompatible with --grad-accum > 1")
    if tome < 0:
        raise ValueError(f"tome must be >= 0, got {tome}")
    if moe:
        # sparse upcycling (ops/moe.py): validate the expert config
        # before anything expensive
        if moe < 2:
            raise ValueError(f"--moe needs >= 2 experts, got {moe}")
        if moe_every < 1:
            raise ValueError(f"--moe-every must be >= 1, got {moe_every}")
        if not 1 <= moe_top_k <= moe:
            raise ValueError(
                f"--moe-top-k must be in [1, {moe}], got {moe_top_k}"
            )
        if moe_capacity <= 0:
            raise ValueError(
                f"--moe-capacity must be > 0, got {moe_capacity}"
            )
        if hp.num_experts:
            raise ValueError(
                "checkpoint is already MoE — drop --moe (continue-"
                "training reuses the file's expert configuration)"
            )
    if moe or hp.num_experts:
        # restrictions mirror what the MoE forward supports
        # (models/vit.py) — fail here with flag names instead of deep
        # inside a trace; applies both to upcycling (--moe) and to
        # continue-training an already-MoE checkpoint
        if hp.seq_len is not None:
            raise ValueError(
                "MoE training supports classifier checkpoints only (the "
                "sequence loss has no router-aux term)"
            )
        if tome:
            raise ValueError("MoE training with --tome is not supported")
        if qat:
            raise ValueError(
                "MoE training with --qat is not supported (the expert "
                "einsum path has no fake-quant leaves)"
            )
        if lora:
            raise ValueError("MoE training with --lora is not supported")
        if distill:
            raise ValueError("MoE training with --distill is not supported")
        if mixup:
            raise ValueError("MoE training with --mixup is not supported")
        if grad_accum > 1:
            raise ValueError(
                "MoE training with --grad-accum is not supported"
            )
        if freeze_backbone:
            raise ValueError(
                "MoE training updates the experts and router — "
                "--freeze-backbone is not supported"
            )
    if qat:
        from vit_cpp_tpu.quant.qat import QAT_FORMATS

        if qat not in QAT_FORMATS:
            raise ValueError(
                f"qat format must be one of {QAT_FORMATS}, got {qat!r}"
            )
    if lora < 0:
        raise ValueError(f"lora rank must be >= 0, got {lora}")
    if lora:
        if freeze_backbone:
            raise ValueError(
                "--lora already freezes the backbone — drop "
                "--freeze-backbone"
            )
        if fsdp:
            raise ValueError(
                "--lora optimizer state is already tiny (rank-r adapters "
                "+ head); --fsdp is unnecessary — drop one"
            )
        if grad_accum > 1:
            raise ValueError("--lora with --grad-accum is not supported")
        if mixup:
            raise ValueError("--lora with --mixup is not supported")
    lora_alpha = lora_alpha or float(2 * lora)
    if distill:
        if distill_mode not in ("soft", "hard"):
            raise ValueError(
                f"distill mode must be soft|hard, got {distill_mode!r}"
            )
        if not 0.0 <= distill_alpha <= 1.0:
            raise ValueError(
                f"distill alpha must be in [0, 1], got {distill_alpha}"
            )
        if distill_tau <= 0:
            raise ValueError(f"distill tau must be > 0, got {distill_tau}")
        if mixup:
            raise ValueError("--distill with --mixup is not supported")
        if grad_accum > 1:
            raise ValueError("--distill with --grad-accum is not supported")
        if lora:
            raise ValueError("--distill with --lora is not supported")
    if qat_act not in ("dynamic", "static"):
        raise ValueError(
            f"qat_act must be dynamic|static, got {qat_act!r}"
        )
    if qat_act == "static" and not qat:
        raise ValueError("--qat-act static requires --qat FMT")
    if qat_scales_out and qat_act != "static":
        raise ValueError("an act-scales sidecar needs --qat-act static")
    is_vitstr = hp.seq_len is not None
    if tome and is_vitstr:
        raise ValueError(
            "tome is incompatible with sequence checkpoints (ViTSTR "
            "reads every token position)"
        )
    if is_vitstr and (augment != "none" or label_smoothing or mixup):
        # mirrored glyphs / cropped-away characters change the ground
        # truth, and the sequence loss is mask-weighted — reject rather
        # than silently train on corrupted (image, text) pairs
        raise ValueError(
            "augmentation / label smoothing are classifier-only "
            "(scene-text labels are orientation- and crop-sensitive)"
        )
    texts = vtexts = None
    if is_vitstr:
        # scene text: gt.txt / filename-stem labels, (B, seq_len) targets
        from vit_cpp_tpu.models.vitstr import VITSTR_VOCAB

        if hp.num_classes != len(VITSTR_VOCAB):
            # out-of-range targets would be silently clamped by the jitted
            # gather — reject rather than optimize a wrong loss
            raise ValueError(
                f"sequence checkpoint has {hp.num_classes} classes; "
                f"ViTSTR training needs the {len(VITSTR_VOCAB)}-token vocab"
            )
        paths, texts = load_vitstr_dataset(data_dir)
        labels = encode_texts(texts, hp.seq_len)
        classes = list(VITSTR_VOCAB)
    else:
        paths, labels, classes = load_dataset(data_dir)
    samples_per_update = batch * grad_accum
    if len(paths) < samples_per_update:
        raise ValueError(
            f"dataset has {len(paths)} images < batch*grad_accum "
            f"{samples_per_update}; lower --batch/--grad-accum"
        )

    params = _dense_f32(load_params(mf, jnp.float32, hparams=hp))
    # pre-resample: what legacy runs trained at
    native_img_size = hp.img_size
    native_patch_size = hp.patch_size
    if (img_size is not None and img_size != hp.img_size) or (
        patch_size is not None and patch_size != hp.patch_size
    ):
        # fine-tune at a new resolution (the classic ViT recipe: pretrain
        # low-res, fine-tune high-res) and/or patch granularity (the
        # FlexiViT transfer recipe: PI-resized patch_embed + resampled
        # pos_embed, models/resample.py). The exported checkpoint then
        # serves the new geometry natively.
        from vit_cpp_tpu.models.resample import resample_params

        params, hp = resample_params(
            params, hp, img_size, patch_size=patch_size
        )
        log(
            f"finetune: geometry {hp.img_size} px / patch "
            f"{hp.patch_size} (resampled from the checkpoint's native "
            f"grid)"
        )
    if not is_vitstr and len(classes) != hp.num_classes:
        log(
            f"finetune: re-initializing head {hp.num_classes} -> "
            f"{len(classes)} classes"
        )
        params, hp = _reinit_head(params, hp, len(classes))

    if moe:
        # sparse upcycling (ops/moe.py): replicate every-`moe_every`-th
        # block's dense MLP into `moe` identical experts behind a fresh
        # near-zero router. V-MoE placement: the SECOND block of each
        # pair (odd indices) hosts the experts. Function-preserving at
        # init (renormalized top-k gates) — training differentiates the
        # experts; the exported checkpoint serves through the same
        # loader/engine stack (models/params.py MoE family).
        import dataclasses as _dc

        from vit_cpp_tpu.ops.moe import upcycle_params

        moe_layers = tuple(range(1, hp.num_hidden_layers, moe_every))
        if not moe_layers or len(moe_layers) >= hp.num_hidden_layers:
            raise ValueError(
                f"--moe-every {moe_every} places experts in no layer or "
                f"every layer of a {hp.num_hidden_layers}-block model"
            )
        params = upcycle_params(params, hp, moe, moe_layers, seed=seed)
        hp = _dc.replace(
            hp,
            num_experts=moe,
            moe_layers=moe_layers,
            moe_top_k=moe_top_k,
            moe_capacity=moe_capacity,
        )
        log(
            f"finetune: upcycling to {moe} experts (top-{moe_top_k}, "
            f"capacity {moe_capacity:g}) in blocks "
            f"{','.join(map(str, moe_layers))}"
        )

    teacher_params = teacher_hp = None
    if distill:
        # frozen teacher: must already speak the TARGET taxonomy (a
        # previously fine-tuned checkpoint — KD matches output
        # distributions, so the class spaces must coincide) and the
        # student's input geometry (both see the same augmented batch)
        if is_vitstr:
            raise ValueError(
                "--distill supports classifier students only (sequence "
                "heads have no logit-distillation recipe here)"
            )
        tmf = read_model(distill)
        teacher_hp = detect_hparams(tmf)
        if teacher_hp.seq_len is not None:
            raise ValueError("--distill teacher must be a classifier")
        if teacher_hp.num_classes != len(classes):
            raise ValueError(
                f"--distill teacher has {teacher_hp.num_classes} classes "
                f"but the dataset has {len(classes)} — fine-tune the "
                "teacher on this taxonomy first"
            )
        if (
            teacher_hp.img_size != hp.img_size
            or teacher_hp.in_chans != hp.in_chans
        ):
            raise ValueError(
                f"--distill teacher geometry ({teacher_hp.img_size} px, "
                f"{teacher_hp.in_chans} ch) != student "
                f"({hp.img_size} px, {hp.in_chans} ch)"
            )
        teacher_params = _dense_f32(load_params(tmf, dtype=jnp.float32))
        if mesh is not None:
            # TP-shard the frozen teacher like any served model so its
            # forward rides the same collectives instead of replicating
            from vit_cpp_tpu.parallel.sharding import shard_params as _sp

            teacher_params = _sp(
                jax.tree.map(jnp.asarray, teacher_params), mesh
            )
        log(
            f"finetune: distilling from {distill} "
            f"({distill_mode}, alpha {distill_alpha:g}, tau {distill_tau:g})"
        )

    # optimizer-update count for the schedule: one update per
    # batch*grad_accum samples
    updates_per_epoch = len(paths) // samples_per_update
    inner = make_optimizer(
        lr,
        weight_decay=weight_decay,
        schedule=schedule,
        total_steps=updates_per_epoch * epochs,
        warmup_steps=warmup_steps,
        clip_norm=clip_norm,
        mu_dtype=jnp.bfloat16 if mu_dtype == "bf16" else None,
    )
    if freeze_backbone:
        optimizer = optax.multi_transform(
            {"train": inner, "freeze": optax.set_to_zero()},
            _trainable_labels(params, True),
        )
    else:
        optimizer = inner

    base_params = None
    merge = None
    if lora:
        from vit_cpp_tpu.models.lora import (
            lora_state_bytes,
            lora_trainable,
            merge_lora,
        )

        trainable = lora_trainable(params, lora, seed)
        # jitted ONCE: the per-site einsum merge runs every eval/export
        merge = jax.jit(merge_lora, static_argnums=(2,))
        log(
            f"finetune: LoRA rank {lora} (alpha {lora_alpha:g}) — "
            f"{lora_state_bytes(trainable) / 1e6:.1f} MB trainable vs "
            f"{lora_state_bytes(params) / 1e6:.1f} MB full"
        )
        if mesh is not None:
            from vit_cpp_tpu.parallel.sharding import shard_params
            from vit_cpp_tpu.parallel.train import create_lora_train_state

            base_params = shard_params(
                jax.tree.map(jnp.asarray, params), mesh
            )
            state = create_lora_train_state(trainable, mesh, optimizer)
        else:
            base_params = params
            state = TrainState(
                params=trainable,
                opt_state=optimizer.init(trainable),
                step=jnp.zeros((), jnp.int32),
            )
    elif mesh is not None:
        state = create_train_state(params, mesh, optimizer, fsdp=fsdp)
    else:
        state = TrainState(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )
    # EMA starts as a COPY of the initial params: the train steps DONATE
    # state.params, so an alias would read deleted buffers one step in
    ema_params = jax.tree.map(jnp.copy, state.params) if ema else None

    # validate cheap things BEFORE the expensive dataset preprocessing
    vpaths = vlabels = None
    if val_dir:
        if is_vitstr:
            vpaths, vtexts = load_vitstr_dataset(val_dir)
            encode_texts(vtexts, hp.seq_len)  # validate vocab/length early
        else:
            vpaths, vlabels, vclasses = load_dataset(val_dir)
            if vclasses != classes:
                raise ValueError(
                    f"val classes {vclasses} != train classes {classes}"
                )

    # sibling file, NOT inside ckpt_dir: orbax owns that directory and
    # wipes it on every save
    meta_path = (
        os.path.abspath(ckpt_dir).rstrip("/") + ".meta.json" if ckpt_dir else None
    )
    # everything that changes what a resumed run replays: batching (epoch
    # accounting derives from step // steps_per_epoch), the shuffle
    # (seed), and the optimizer/schedule (epochs/lr/schedule/warmup/clip/
    # decay/freeze set the cosine length and update rule) — ADVICE r2:
    # resuming with a different seed or schedule silently diverged from
    # the "replays the exact batching" claim
    run_meta = {
        "batch": batch,
        "n_images": len(paths),
        "grad_accum": grad_accum,
        "seed": seed,
        "epochs": epochs,
        "lr": lr,
        "weight_decay": weight_decay,
        "schedule": schedule,
        "warmup_steps": warmup_steps,
        "clip_norm": clip_norm,
        "mu_dtype": mu_dtype,
        "freeze_backbone": freeze_backbone,
        "augment": augment,
        "label_smoothing": label_smoothing,
        "mixup": mixup,
        "ema": ema,
        # the trained geometry: resuming at a different resolution or
        # patch granularity would restore pos_embed/patch_embed into
        # mismatched shapes (or worse, silently retrain a re-resampled
        # grid)
        "img_size": hp.img_size,
        "patch_size": hp.patch_size,
        # the merged-graph loss differs from the unmerged one — resuming
        # with a different r would silently change the objective
        "tome": tome,
        # the fake-quantized loss (quant/qat.py) differs from the dense
        # one the same way — resuming with a different format retargets
        # the noise the run was absorbing
        "qat": qat,
        # dynamic per-token vs frozen static per-tensor activation qdq
        # are different objectives too (--qat-act)
        "qat_act": qat_act,
        # the trainable tree's SHAPE derives from the rank, and the
        # merged model from alpha — both must replay exactly
        "lora": lora,
        "lora_alpha": lora_alpha,
        # the expert layout defines both the param-tree SHAPE and the
        # routed objective (aux losses) — all of it must replay exactly
        "moe": hp.num_experts,
        "moe_layers": list(hp.moe_layers),
        "moe_top_k": hp.moe_top_k,
        "moe_capacity": hp.moe_capacity,
        # the teacher and its mixing weights define the objective
        "distill": os.path.abspath(distill) if distill else "",
        "distill_mode": distill_mode if distill else "",
        "distill_alpha": distill_alpha if distill else 0.0,
        "distill_tau": distill_tau if distill else 0.0,
    }
    if ckpt_dir and os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
        import json

        # a checkpoint WITHOUT its sibling meta (e.g. the process died
        # between the orbax save and the meta write) cannot be validated,
        # so refuse rather than silently mis-count
        if not os.path.exists(meta_path):
            raise ValueError(
                f"checkpoint at {ckpt_dir} has no {meta_path}; its "
                "batching cannot be validated — use a fresh --ckpt-dir"
            )
        with open(meta_path) as f:
            saved = json.load(f)
        # `epochs` may grow on resume (the extend-training pattern) UNLESS
        # the schedule has a horizon: the cosine decay length derives from
        # total epochs, so changing epochs there rewrites the LR curve
        # (const+warmup never reads total_steps — make_optimizer)
        strict = dict(run_meta)
        if schedule == "const":
            strict.pop("epochs")
        # keys absent from an older meta file (written before they were
        # recorded) cannot be validated — warn and accept the requested
        # value instead of hard-rejecting a resume with identical flags
        missing = [k for k in strict if k not in saved]
        # geometry cannot take the warn-and-adopt path: a meta that
        # predates 'img_size' was trained at the checkpoint's native
        # size, and restoring a (native-grid) pos_embed + moments into a
        # resampled template would crash deep inside orbax — reject with
        # the same clean error a recorded mismatch gets
        if "img_size" in missing and hp.img_size != native_img_size:
            raise ValueError(
                f"checkpoint at {ckpt_dir} predates --img-size recording "
                f"(trained at the native {native_img_size}); resuming at "
                f"{hp.img_size} would not replay the original run — drop "
                "--img-size or use a fresh --ckpt-dir"
            )
        if "patch_size" in missing and hp.patch_size != native_patch_size:
            raise ValueError(
                f"checkpoint at {ckpt_dir} predates --patch-size "
                f"recording (trained at the native patch "
                f"{native_patch_size}); resuming at patch {hp.patch_size} "
                "would not replay the original run — drop --patch-size "
                "or use a fresh --ckpt-dir"
            )
        if "tome" in missing and tome:
            # a meta that predates 'tome' was trained on the unmerged
            # graph; adopting r>0 would silently change the objective
            raise ValueError(
                f"checkpoint at {ckpt_dir} predates --tome recording "
                "(trained unmerged); resuming with --tome would not "
                "replay the original run — drop --tome or use a fresh "
                "--ckpt-dir"
            )
        if "lora" in missing and lora:
            raise ValueError(
                f"checkpoint at {ckpt_dir} predates --lora recording "
                "(trained full-weight); resuming with --lora would not "
                "replay the original run — drop --lora or use a fresh "
                "--ckpt-dir"
            )
        if "moe" in missing and hp.num_experts:
            raise ValueError(
                f"checkpoint at {ckpt_dir} predates --moe recording "
                "(trained dense); resuming with experts would not replay "
                "the original run — drop --moe or use a fresh --ckpt-dir"
            )
        if "distill" in missing and distill:
            raise ValueError(
                f"checkpoint at {ckpt_dir} predates --distill recording "
                "(trained without a teacher); resuming with --distill "
                "would not replay the original run — drop it or use a "
                "fresh --ckpt-dir"
            )
        if "qat_act" in missing and qat_act == "static":
            raise ValueError(
                f"checkpoint at {ckpt_dir} predates --qat-act recording "
                "(trained with dynamic activation qdq); resuming with "
                "--qat-act static would not replay the original run — "
                "drop it or use a fresh --ckpt-dir"
            )
        if "qat" in missing and qat:
            # a meta that predates 'qat' was trained dense; adopting a
            # fake-quantized loss mid-run would change the objective
            raise ValueError(
                f"checkpoint at {ckpt_dir} predates --qat recording "
                "(trained dense); resuming with --qat would not replay "
                "the original run — drop --qat or use a fresh --ckpt-dir"
            )
        if missing:
            log(
                f"finetune: warning — {meta_path} predates recording of "
                f"{missing}; those settings cannot be validated against "
                "the original run"
            )
        theirs = {k: saved.get(k, strict[k]) for k in strict}
        if theirs != strict:
            diff = {
                k: (theirs[k], strict[k])
                for k in strict
                if theirs[k] != strict[k]
            }
            raise ValueError(
                f"checkpoint at {ckpt_dir} was written with different "
                f"settings (saved, requested): {diff}; resuming would not "
                "replay the original run — rerun with the original "
                "settings or use a fresh --ckpt-dir"
            )
        from vit_cpp_tpu.parallel.checkpoint import restore_train_state

        # the EMA tree rides the same leaf-keyed checkpoint (saved as the
        # (state, ema) tuple); the meta validation above guarantees the
        # template structure matches what was saved
        if ema:
            state, ema_params = restore_train_state(
                ckpt_dir, (state, ema_params)
            )
        else:
            state = restore_train_state(ckpt_dir, state)
        log(f"finetune: resumed from {ckpt_dir} at step {int(state.step)}")

    pixels = None
    if stream:
        # decode + preprocess per batch on a prefetch thread instead of
        # holding the whole (N, C, S, S) f32 set in host RAM (~600 KB per
        # 224px image — preloading caps practical dataset size); batch
        # composition derives from indices either way, so streamed runs
        # replay (and resume) bit-identically to preloaded ones
        log(f"finetune: streaming {len(paths)} images per epoch")
    else:
        est = len(paths) * hp.in_chans * hp.img_size * hp.img_size * 4
        if est > 8 << 30:
            log(
                f"finetune: preloading ~{est >> 30} GB of pixels — "
                "consider --stream for datasets this size"
            )
        log(f"finetune: preprocessing {len(paths)} images ...")
        pixels = _preprocess_all(paths, hp, decode_threads)
    val = None
    if val_dir:
        # val sets are preloaded even under --stream (per-epoch eval
        # re-reads them every epoch; they are typically a fraction of the
        # train set)
        val = (
            _preprocess_all(vpaths, hp, decode_threads),
            vtexts if is_vitstr else vlabels,
        )

    start_epoch = int(state.step) // updates_per_epoch
    # construct the accum loss_fn ONCE: it is a static jit argument, and
    # functools.partial hashes by identity — a fresh partial per step
    # would retrace train_step_accum every update
    accum_loss_fn = None
    if grad_accum > 1:
        if is_vitstr:
            from vit_cpp_tpu.parallel.train import vitstr_cross_entropy_loss

            accum_loss_fn = vitstr_cross_entropy_loss
            if qat:
                import functools

                accum_loss_fn = functools.partial(
                    vitstr_cross_entropy_loss, qat=qat
                )
        elif label_smoothing or tome or qat:
            import functools

            from vit_cpp_tpu.parallel.train import cross_entropy_loss

            accum_loss_fn = functools.partial(
                cross_entropy_loss, smooth=label_smoothing, tome=tome, qat=qat
            )
    aug_key = (
        jax.random.PRNGKey(seed) if augment != "none" or mixup else None
    )
    calib_px = None
    measure_scales = None
    if qat_act == "static":
        # fixed deterministic calibration batch (the first `batch` files
        # in dataset order — identical on resume, stream or preloaded)
        calib_px = jnp.asarray(
            _preprocess_chunk(paths[:batch], hp, decode_threads)
        )
        from vit_cpp_tpu.quant.qat import measure_act_scales

        # jitted ONCE (the tap loop dispatches per-op eagerly otherwise —
        # minutes through a remote-device tunnel); retraces only if the
        # geometry changes, which it cannot mid-run
        measure_scales = jax.jit(measure_act_scales, static_argnums=(2, 3))
    qat_scales = None
    losses: List[float] = []
    for epoch in range(start_epoch, epochs):
        if calib_px is not None:
            # epoch-refreshed frozen scales (quant/qat.py): measured on
            # the CURRENT fake-quant weights, then constant for the whole
            # epoch — the per-tensor clipping noise static serving applies
            scale_src = (
                merge(base_params, state.params, lora_alpha)
                if lora
                else state.params
            )
            qat_scales = measure_scales(scale_src, calib_px, hp, qat)
        # deterministic per-epoch shuffle: the same order replays on resume
        order = np.random.default_rng(seed + epoch).permutation(len(paths))
        idx_seq = [
            order[s * samples_per_update : (s + 1) * samples_per_update]
            for s in range(updates_per_epoch)
        ]
        if stream:
            fetch = lambda idx: _preprocess_chunk(  # noqa: E731
                [paths[i] for i in idx], hp, decode_threads
            )
            batch_iter = _prefetch_batches(fetch, idx_seq)
        else:
            batch_iter = (pixels[idx] for idx in idx_seq)
        epoch_losses = []
        for s, bx_host in enumerate(batch_iter):
            idx = idx_seq[s]
            bx = jnp.asarray(bx_host)
            by = jnp.asarray(labels[idx])
            if mesh is not None:
                bx, by = shard_batch(bx, by, mesh)
            mix = None
            if aug_key is not None:
                # keyed by the GLOBAL update index so a resumed run
                # replays the original augmentation stream bit-for-bit
                step_key = jax.random.fold_in(
                    aug_key, epoch * updates_per_epoch + s
                )
                if augment != "none":
                    bx = augment_batch(
                        step_key, bx, flip=aug_flip, crop=aug_crop
                    )
                if mixup:
                    from vit_cpp_tpu.ops.augment import mixup_batch

                    bx, perm, lam = mixup_batch(
                        jax.random.fold_in(step_key, 1), bx, mixup
                    )
                    mix = (jnp.take(by, perm, axis=0), lam)
            if lora:
                from vit_cpp_tpu.parallel.train import train_step_lora

                state, loss = train_step_lora(
                    state, base_params, bx, by, hp, optimizer,
                    alpha=lora_alpha, smooth=label_smoothing, tome=tome,
                    qat=qat, qat_scales=qat_scales, seq=is_vitstr,
                )
            elif distill:
                from vit_cpp_tpu.parallel.train import train_step_distill

                state, loss = train_step_distill(
                    state, teacher_params, bx, by, hp, teacher_hp,
                    optimizer, alpha=distill_alpha, tau=distill_tau,
                    mode=distill_mode, smooth=label_smoothing, tome=tome,
                    qat=qat, qat_scales=qat_scales,
                )
            elif mix is not None:
                from vit_cpp_tpu.parallel.train import train_step_mixup

                state, loss = train_step_mixup(
                    state, bx, by, mix[0], mix[1], hp, optimizer,
                    smooth=label_smoothing, tome=tome, qat=qat,
                    qat_scales=qat_scales,
                )
            elif grad_accum > 1:
                state, loss = train_step_accum(
                    state, bx, by, hp, optimizer, grad_accum,
                    loss_fn=accum_loss_fn, qat_scales=qat_scales,
                )
            elif is_vitstr:
                from vit_cpp_tpu.parallel.train import train_step_vitstr

                state, loss = train_step_vitstr(
                    state, bx, by, hp, optimizer, qat=qat,
                    qat_scales=qat_scales,
                )
            else:
                state, loss = train_step(
                    state, bx, by, hp, optimizer, smooth=label_smoothing,
                    tome=tome, qat=qat, qat_scales=qat_scales,
                )
            if ema:
                ema_params = _ema_update()(ema_params, state.params, ema)
            epoch_losses.append(float(loss))
        mean_loss = float(np.mean(epoch_losses))
        losses.append(mean_loss)
        msg = f"epoch {epoch + 1}/{epochs}: loss {mean_loss:.4f}"
        if val is not None:
            # score what will be served: the EMA weights when enabled
            eval_params = ema_params if ema else state.params
            if lora:  # ...merged into the frozen base
                eval_params = merge(base_params, eval_params, lora_alpha)
            if is_vitstr:
                acc = evaluate_vitstr(
                    eval_params, hp, val[0], val[1], batch, qat=qat,
                    qat_scales=qat_scales,
                )
                msg += f", val word-acc{' (ema)' if ema else ''} {acc:.3f}"
            else:
                acc = evaluate(
                    eval_params, hp, val[0], val[1], batch, tome=tome,
                    qat=qat, qat_scales=qat_scales,
                )
                msg += f", val top-1{' (ema)' if ema else ''} {acc:.3f}"
        log(msg)
        if ckpt_dir:
            import json

            from vit_cpp_tpu.parallel.checkpoint import save_train_state

            save_train_state(
                ckpt_dir, (state, ema_params) if ema else state
            )
            with open(meta_path, "w") as f:
                json.dump(run_meta, f)
    final_params = ema_params if ema else state.params
    if lora:
        # fold the adapters into dense kernels: the exported gguf serves
        # through the unchanged engine — no adapter machinery at inference
        final_params = merge(base_params, final_params, lora_alpha)
    if qat_scales_out:
        # sidecar for zero-calibration static serving (VitEngine
        # act_scales= / --act-scales): measured on the EXPORTED weights
        from vit_cpp_tpu.quant.qat import save_act_scales

        save_act_scales(
            qat_scales_out,
            measure_scales(final_params, calib_px, hp, qat),
            margin=1.05,
        )
        log(f"finetune: wrote static activation scales to {qat_scales_out}")
    return final_params, hp, classes, losses
