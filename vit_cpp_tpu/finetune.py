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
    """Zero-init a fresh (h, num_classes) head for transfer learning."""
    import jax.numpy as jnp

    params = dict(params)
    params["head"] = {
        "kernel": jnp.zeros((hp.hidden_size, num_classes), jnp.float32),
        "bias": jnp.zeros((num_classes,), jnp.float32),
    }
    return params, dataclasses.replace(hp, num_classes=num_classes)


def _trainable_labels(params, freeze_backbone: bool):
    """Per-leaf optax.multi_transform labels: 'train' or 'freeze'."""
    import jax.tree_util as jtu

    def label(path, _):
        if not freeze_backbone:
            return "train"
        top = path[0]
        key = getattr(top, "key", getattr(top, "name", None))
        return "train" if key == "head" else "freeze"

    return jtu.tree_map_with_path(label, params)


def _preprocess_all(paths, hp, decode_threads: int) -> np.ndarray:
    """Decode + canvas-preprocess every file -> (N, C, S, S) f32 host array.

    Failed decodes raise (training data must be clean, unlike the serving
    skip-markers)."""
    from vit_cpp_tpu.ops.preprocess import preprocess_batch
    from vit_cpp_tpu.serve import _decode_many

    out = []
    chunk = 64
    for i in range(0, len(paths), chunk):
        batch_paths = paths[i : i + chunk]
        imgs = _decode_many(batch_paths, decode_threads or (os.cpu_count() or 1))
        for p, im in zip(batch_paths, imgs):
            if im is None:
                raise ValueError(f"undecodable training image: {p}")
        out.append(np.asarray(preprocess_batch(imgs, hp.img_size, mode=hp.interpolation)))
    return np.concatenate(out, axis=0)


_EVAL_FWD = None  # one persistent jitted fn: per-epoch eval must not retrace


def _eval_fwd():
    global _EVAL_FWD
    if _EVAL_FWD is None:
        import jax
        import jax.numpy as jnp

        from vit_cpp_tpu.models.vit import forward

        _EVAL_FWD = jax.jit(
            lambda p, x, hp: jnp.argmax(forward(p, x, hp), axis=-1),
            static_argnames=("hp",),
        )
    return _EVAL_FWD


def evaluate(params, hp, pixels: np.ndarray, labels: np.ndarray, batch: int) -> float:
    """Top-1 accuracy of `params` on preprocessed pixels (pads the tail so
    one program serves every chunk)."""
    import jax.numpy as jnp

    fwd = _eval_fwd()
    correct = 0
    for i in range(0, len(pixels), batch):
        chunk = pixels[i : i + batch]
        n = len(chunk)
        if n < batch:
            chunk = np.concatenate([chunk, np.repeat(chunk[:1], batch - n, axis=0)])
        pred = np.asarray(fwd(params, jnp.asarray(chunk), hp=hp))[:n]
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
    freeze_backbone: bool = False,
    mesh=None,
    ckpt_dir: Optional[str] = None,
    seed: int = 0,
    decode_threads: int = 0,
    val_dir: Optional[str] = None,
    log=print,
) -> Tuple[Dict[str, Any], Any, List[str], List[float]]:
    """Run the fine-tune loop; returns (params, hp, classnames, epoch_losses).

    Resumable: when `ckpt_dir` holds a previous run's state, training
    continues from its step count (epochs already covered are skipped).
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

    mf = read_model(model)
    hp = detect_hparams(mf)
    if hp.seq_len is not None:
        raise ValueError("fine-tuning supports classifier checkpoints only")
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    paths, labels, classes = load_dataset(data_dir)
    samples_per_update = batch * grad_accum
    if len(paths) < samples_per_update:
        raise ValueError(
            f"dataset has {len(paths)} images < batch*grad_accum "
            f"{samples_per_update}; lower --batch/--grad-accum"
        )

    params = _dense_f32(load_params(mf, jnp.float32, hparams=hp))
    if len(classes) != hp.num_classes:
        log(
            f"finetune: re-initializing head {hp.num_classes} -> "
            f"{len(classes)} classes"
        )
        params, hp = _reinit_head(params, hp, len(classes))

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
    )
    if freeze_backbone:
        optimizer = optax.multi_transform(
            {"train": inner, "freeze": optax.set_to_zero()},
            _trainable_labels(params, True),
        )
    else:
        optimizer = inner

    if mesh is not None:
        state = create_train_state(params, mesh, optimizer)
    else:
        state = TrainState(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    # validate cheap things BEFORE the expensive dataset preprocessing
    vpaths = vlabels = None
    if val_dir:
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
    if ckpt_dir and os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
        import json

        # epoch accounting derives from step // steps_per_epoch, so a
        # resumed run must replay the exact batching of the original
        if meta_path and os.path.exists(meta_path):
            with open(meta_path) as f:
                saved = json.load(f)
            mine = {
                "batch": batch,
                "n_images": len(paths),
                "grad_accum": grad_accum,
            }
            theirs = {k: saved.get(k, 1 if k == "grad_accum" else None) for k in mine}
            if theirs != mine:
                raise ValueError(
                    f"checkpoint at {ckpt_dir} was written with {theirs}; "
                    f"resuming with {mine} would mis-count epochs — rerun "
                    "with the original settings or use a fresh --ckpt-dir"
                )
        from vit_cpp_tpu.parallel.checkpoint import restore_train_state

        state = restore_train_state(ckpt_dir, state)
        log(f"finetune: resumed from {ckpt_dir} at step {int(state.step)}")

    log(f"finetune: preprocessing {len(paths)} images ...")
    pixels = _preprocess_all(paths, hp, decode_threads)
    val = None
    if val_dir:
        val = (_preprocess_all(vpaths, hp, decode_threads), vlabels)

    start_epoch = int(state.step) // updates_per_epoch
    losses: List[float] = []
    for epoch in range(start_epoch, epochs):
        # deterministic per-epoch shuffle: the same order replays on resume
        order = np.random.default_rng(seed + epoch).permutation(len(paths))
        epoch_losses = []
        for s in range(updates_per_epoch):
            idx = order[s * samples_per_update : (s + 1) * samples_per_update]
            bx = jnp.asarray(pixels[idx])
            by = jnp.asarray(labels[idx])
            if mesh is not None:
                bx, by = shard_batch(bx, by, mesh)
            if grad_accum > 1:
                state, loss = train_step_accum(
                    state, bx, by, hp, optimizer, grad_accum
                )
            else:
                state, loss = train_step(state, bx, by, hp, optimizer)
            epoch_losses.append(float(loss))
        mean_loss = float(np.mean(epoch_losses))
        losses.append(mean_loss)
        msg = f"epoch {epoch + 1}/{epochs}: loss {mean_loss:.4f}"
        if val is not None:
            acc = evaluate(state.params, hp, val[0], val[1], batch)
            msg += f", val top-1 {acc:.3f}"
        log(msg)
        if ckpt_dir:
            import json

            from vit_cpp_tpu.parallel.checkpoint import save_train_state

            save_train_state(ckpt_dir, state)
            with open(meta_path, "w") as f:
                json.dump(
                    {
                        "batch": batch,
                        "n_images": len(paths),
                        "grad_accum": grad_accum,
                    },
                    f,
                )
    return state.params, hp, classes, losses
