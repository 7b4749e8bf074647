"""Fine-tuning / training step over a device mesh.

The reference is inference-only (SURVEY.md §0), but a production framework
needs the training loop for fine-tuning classifier heads and full models.
This is the pjit path: params live on the mesh with TP shardings
(parallel/sharding.py), the batch is sharded over "data", and one jitted
step computes cross-entropy grads, psums them over ICI via XLA, and applies
an optax update. No hand-written collectives — shardings in, XLA inserts
all-reduces (scaling-book recipe).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models.vit import forward
from vit_cpp_tpu.parallel.sharding import batch_pspec, shard_params
from vit_cpp_tpu.quant.qat import fake_quant_params


class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    step: jax.Array


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 0.05,
    schedule: str = "const",
    total_steps: int = 0,
    warmup_steps: int = 0,
    clip_norm: float = 0.0,
    mu_dtype=None,
):
    """adamw with an optional cosine decay + linear warmup.

    `schedule="cosine"` needs `total_steps` (optimizer updates over the
    whole run); warmup ramps 0 -> lr over `warmup_steps`; `clip_norm` > 0
    clips the global gradient norm before the update. `mu_dtype` (e.g.
    jnp.bfloat16) halves the first-moment buffer — the adamw update is
    HBM-bound elementwise traffic, so this trades a little momentum
    precision for one fewer full-width moment read+write per step."""
    if schedule == "const":
        if warmup_steps:
            lr = optax.linear_schedule(0.0, lr, warmup_steps)
    elif schedule == "cosine":
        if total_steps <= 0:
            raise ValueError("schedule='cosine' needs total_steps > 0")
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr,
            warmup_steps=warmup_steps,
            decay_steps=total_steps,
        )
    else:
        raise ValueError(f"schedule must be const|cosine, got {schedule!r}")
    opt = optax.adamw(lr, weight_decay=weight_decay, mu_dtype=mu_dtype)
    if clip_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(clip_norm), opt)
    return opt


# V-MoE auxiliary-loss coefficients (cross_entropy_loss): the Switch
# balance coefficient (Fedus et al. 2022) and the ST-MoE router z-loss
# coefficient — standard values, not tuned here.
MOE_LB_COEF = 0.01
MOE_Z_COEF = 1e-3


def cross_entropy_loss(
    params, images, labels, hp: VitHParams, smooth: float = 0.0,
    tome: int = 0, qat: str = "", qat_scales=None,
) -> jax.Array:
    # remat="dots+attn": keep each block's GEMM outputs AND the fused
    # attention outputs — ViT-B/16 batch-128 training OOMs a 16 GB v5e
    # with no remat (23.5 GB of stored activations), full remat pays a
    # 4th forward, and plain "dots" re-runs the Pallas attention kernel
    # in the recompute pass (saving its (B, T, h) output instead measured
    # +3.1%: 1,174.5 vs 1,139.5 img/s at batch 64, r3).
    # Full layer unroll: the backward of a scanned graph spends
    # ~12-15 ms/step on dynamic-slice reads of stacked params and
    # dynamic-update-slice writes of stacked grads; unrolling removes the
    # bookkeeping (+11% train rate, measured — the OPPOSITE of inference,
    # where unroll loses; docs/TUNING.md training section).
    # attn_impl="pallas-train": fused custom-VJP attention — neither
    # direction materializes the (B, nh, T, T) scores in HBM (the XLA
    # backward's dominant traffic); falls back to XLA ops at T > 600
    # qat: fake-quantize weights (STE, quant/qat.py) and route the
    # quantized-at-serve matmuls through per-token activation qdq —
    # or the frozen per-tensor static scales when qat_scales is given
    # (--qat-act static; inject_act_scales, never differentiated)
    if qat:
        params = fake_quant_params(params, qat)
        if qat_scales is not None:
            from vit_cpp_tpu.quant.qat import inject_act_scales

            params = inject_act_scales(params, qat_scales)
    out = forward(
        params,
        images,
        hp,
        attn_impl="pallas-train",
        mm_impl="qat" if qat else "xla",
        remat="dots+attn",
        unroll=hp.num_hidden_layers,
        tome=tome,
        moe_aux=bool(hp.num_experts),
    )
    moe_term = 0.0
    if hp.num_experts:
        # V-MoE training objective (ops/moe.py): the Switch balance loss
        # keeps the router from collapsing onto few experts (coef 0.01,
        # Fedus et al. 2022 §2.2) and the z-loss bounds router logit
        # magnitudes (coef 1e-3, ST-MoE §3.1). Means over the MoE layers.
        logits, aux = out
        moe_term = (
            MOE_LB_COEF * aux["load_balance"] + MOE_Z_COEF * aux["router_z"]
        )
    else:
        logits = out
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)
    if smooth:
        # label smoothing: target (1-eps) on the true class, eps spread
        # uniformly — CE = (1-eps)*nll + eps * mean_c(-logp_c)
        uniform = -jnp.mean(logp, axis=-1, keepdims=True)
        nll = (1.0 - smooth) * nll + smooth * uniform
    return jnp.mean(nll) + moe_term


def vitstr_cross_entropy_loss(
    params, images, targets, hp: VitHParams, qat: str = "",
    qat_scales=None,
) -> jax.Array:
    """Scene-text sequence loss: targets (B, seq_len) int32, -1 = masked.

    Position 0 ([GO]) and everything after the EOS target are masked;
    positions 1..n carry the char ids and n+1 the [s] stop token —
    mirroring greedy_decode's read pattern (models/vitstr.py)."""
    if qat:
        params = fake_quant_params(params, qat)
        if qat_scales is not None:
            from vit_cpp_tpu.quant.qat import inject_act_scales

            params = inject_act_scales(params, qat_scales)
    logits = forward(
        params,
        images,
        hp,
        attn_impl="pallas-train",
        mm_impl="qat" if qat else "xla",
        remat="dots+attn",
        unroll=hp.num_hidden_layers,
    )  # (B, S, V)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    mask = targets >= 0
    safe = jnp.where(mask, targets, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


@partial(
    jax.jit, static_argnames=("hp", "optimizer", "qat"), donate_argnums=(0,)
)
def train_step_vitstr(
    state: TrainState,
    images: jax.Array,
    targets: jax.Array,
    hp: VitHParams,
    optimizer,
    qat: str = "",
    qat_scales=None,
) -> Tuple[TrainState, jax.Array]:
    loss, grads = jax.value_and_grad(vitstr_cross_entropy_loss)(
        state.params, images, targets, hp, qat, qat_scales
    )
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


@partial(
    jax.jit,
    static_argnames=("hp", "optimizer", "smooth", "tome", "qat"),
    donate_argnums=(0,),
)
def train_step(
    state: TrainState,
    images: jax.Array,
    labels: jax.Array,
    hp: VitHParams,
    optimizer,
    smooth: float = 0.0,
    tome: int = 0,
    qat: str = "",
    qat_scales=None,
) -> Tuple[TrainState, jax.Array]:
    loss, grads = jax.value_and_grad(cross_entropy_loss)(
        state.params, images, labels, hp, smooth, tome, qat, qat_scales
    )
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def distill_cross_entropy_loss(
    params, teacher_params, images, labels, hp: VitHParams,
    teacher_hp: VitHParams, alpha: float, tau: float, mode: str,
    smooth: float = 0.0, tome: int = 0, qat: str = "", qat_scales=None,
) -> jax.Array:
    """Knowledge distillation (Hinton et al. 2015; the training half of
    the DeiT story whose distilled checkpoints the engine already
    serves): the student trains against the hard labels AND a frozen
    teacher's outputs on the SAME (augmented) batch.

      soft: (1-alpha)*CE(s, y) + alpha * tau^2 * KL(T(t/tau) || T(s/tau))
      hard: (1-alpha)*CE(s, y) + alpha * CE(s, argmax(t))

    Applied to the model's serving logits whatever the head config
    (distilled students serve head-averaged logits, models/vit._head) —
    generic KD, not DeiT's per-head dual loss. The teacher forward runs
    the plain inference graph (no remat — nothing to store for a
    stop_gradient'd branch); the student side reuses cross_entropy_loss
    (fused-VJP attention, remat, QAT, ToMe all compose)."""
    t_logits = jax.lax.stop_gradient(
        forward(teacher_params, images, teacher_hp)
    ).astype(jnp.float32)

    if qat:
        params = fake_quant_params(params, qat)
        if qat_scales is not None:
            from vit_cpp_tpu.quant.qat import inject_act_scales

            params = inject_act_scales(params, qat_scales)
    logits = forward(
        params,
        images,
        hp,
        attn_impl="pallas-train",
        mm_impl="qat" if qat else "xla",
        remat="dots+attn",
        unroll=hp.num_hidden_layers,
        tome=tome,
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)
    if smooth:
        uniform = -jnp.mean(logp, axis=-1, keepdims=True)
        nll = (1.0 - smooth) * nll + smooth * uniform
    ce = jnp.mean(nll)

    if mode == "soft":
        t_prob = jax.nn.softmax(t_logits / tau, axis=-1)
        s_logp = jax.nn.log_softmax(logits.astype(jnp.float32) / tau, axis=-1)
        # KL(t||s) up to the teacher-entropy constant; tau^2 keeps the
        # gradient scale tau-invariant (Hinton et al. 2015 eq. 2-4)
        kd = -(tau * tau) * jnp.mean(jnp.sum(t_prob * s_logp, axis=-1))
    elif mode == "hard":
        kd = jnp.mean(
            -jnp.take_along_axis(
                logp, jnp.argmax(t_logits, axis=-1)[:, None], axis=-1
            )
        )
    else:
        raise ValueError(f"distill mode must be soft|hard, got {mode!r}")
    return (1.0 - alpha) * ce + alpha * kd


@partial(
    jax.jit,
    static_argnames=(
        "hp", "teacher_hp", "optimizer", "alpha", "tau", "mode", "smooth",
        "tome", "qat",
    ),
    donate_argnums=(0,),
)
def train_step_distill(
    state: TrainState,
    teacher_params,
    images: jax.Array,
    labels: jax.Array,
    hp: VitHParams,
    teacher_hp: VitHParams,
    optimizer,
    alpha: float,
    tau: float,
    mode: str,
    smooth: float = 0.0,
    tome: int = 0,
    qat: str = "",
    qat_scales=None,
) -> Tuple[TrainState, jax.Array]:
    """One distillation update; teacher_params is frozen (never donated,
    reused every step)."""
    loss, grads = jax.value_and_grad(distill_cross_entropy_loss)(
        state.params, teacher_params, images, labels, hp, teacher_hp,
        alpha, tau, mode, smooth, tome, qat, qat_scales,
    )
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def lora_cross_entropy_loss(
    trainable, base_params, images, labels, hp: VitHParams,
    alpha: float, smooth: float = 0.0, tome: int = 0, qat: str = "",
    qat_scales=None, seq: bool = False,
) -> jax.Array:
    """LoRA loss: merge the rank-r adapters + trained head into the
    FROZEN base (models/lora.merge_lora — one batched einsum per site),
    then run the standard classifier loss. Differentiated wrt
    `trainable` only; base_params is a plain traced argument, so the
    backward keeps the dx chains but never forms the full-width dW
    GEMMs. QAT composes OUTSIDE the merge: the fake-quant sees the
    merged kernels — the exact weights a fold-then-quantize export
    serves."""
    from vit_cpp_tpu.models.lora import merge_lora

    merged = merge_lora(base_params, trainable, alpha)
    if seq:  # ViTSTR scene-text pairs: labels are (B, seq_len) targets
        return vitstr_cross_entropy_loss(
            merged, images, labels, hp, qat, qat_scales
        )
    return cross_entropy_loss(
        merged, images, labels, hp, smooth, tome, qat, qat_scales
    )


@partial(
    jax.jit,
    static_argnames=(
        "hp", "optimizer", "alpha", "smooth", "tome", "qat", "seq"
    ),
    donate_argnums=(0,),
)
def train_step_lora(
    state: TrainState,
    base_params,
    images: jax.Array,
    labels: jax.Array,
    hp: VitHParams,
    optimizer,
    alpha: float,
    smooth: float = 0.0,
    tome: int = 0,
    qat: str = "",
    qat_scales=None,
    seq: bool = False,
) -> Tuple[TrainState, jax.Array]:
    """One LoRA update: state.params is the {lora, head(,head_dist)}
    tree (models/lora.lora_trainable); base_params stays frozen (and
    NOT donated — it is reused every step)."""
    loss, grads = jax.value_and_grad(lora_cross_entropy_loss)(
        state.params, base_params, images, labels, hp, alpha, smooth,
        tome, qat, qat_scales, seq,
    )
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def _mixed_cross_entropy_loss(
    params, images, labels, labels2, lam, hp: VitHParams, smooth: float,
    tome: int = 0, qat: str = "", qat_scales=None,
) -> jax.Array:
    """Mixup loss: one forward on the pre-mixed batch, CE against both
    label sets weighted by the (traced) mixing coefficient."""
    if qat:
        params = fake_quant_params(params, qat)
        if qat_scales is not None:
            from vit_cpp_tpu.quant.qat import inject_act_scales

            params = inject_act_scales(params, qat_scales)
    logits = forward(
        params,
        images,
        hp,
        attn_impl="pallas-train",
        mm_impl="qat" if qat else "xla",
        remat="dots+attn",
        unroll=hp.num_hidden_layers,
        tome=tome,
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def ce(y):
        nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)
        if smooth:
            uniform = -jnp.mean(logp, axis=-1, keepdims=True)
            nll = (1.0 - smooth) * nll + smooth * uniform
        return jnp.mean(nll)

    return lam * ce(labels) + (1.0 - lam) * ce(labels2)


@partial(
    jax.jit,
    static_argnames=("hp", "optimizer", "smooth", "tome", "qat"),
    donate_argnums=(0,),
)
def train_step_mixup(
    state: TrainState,
    images: jax.Array,
    labels: jax.Array,
    labels2: jax.Array,
    lam: jax.Array,
    hp: VitHParams,
    optimizer,
    smooth: float = 0.0,
    tome: int = 0,
    qat: str = "",
    qat_scales=None,
) -> Tuple[TrainState, jax.Array]:
    """Classifier step on a mixup batch (ops/augment.mixup_batch): images
    are already mixed; `labels2 = labels[perm]` and `lam` is the traced
    mixing scalar, so every lambda draw reuses one compiled program."""
    loss, grads = jax.value_and_grad(_mixed_cross_entropy_loss)(
        state.params, images, labels, labels2, lam, hp, smooth, tome, qat,
        qat_scales,
    )
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


@partial(
    jax.jit,
    static_argnames=("hp", "optimizer", "accum", "loss_fn"),
    donate_argnums=(0,),
)
def train_step_accum(
    state: TrainState,
    images: jax.Array,
    labels: jax.Array,
    hp: VitHParams,
    optimizer,
    accum: int,
    loss_fn=None,
    qat_scales=None,
) -> Tuple[TrainState, jax.Array]:
    """One optimizer update from `accum` sequential micro-batches.

    images is (accum * B, C, S, S): each (B, ...) slice runs its own
    forward/backward (a lax.scan, so peak memory is one micro-batch's
    activations) and the accumulated gradient feeds a single update —
    effective batch accum*B with the footprint of B. `loss_fn` defaults
    to the classifier loss; pass vitstr_cross_entropy_loss with
    (B, seq_len) targets for scene-text training.

    Micro-batches are TOKEN-WEIGHTED, not uniformly averaged: a masked
    sequence loss is a mean over that micro-batch's valid tokens, so each
    micro grad/loss is scaled by its valid-token count and the sum divides
    by the total — exactly the unaccumulated global masked mean (ADVICE
    r2: uniform averaging over-weighted micro-batches with few valid
    tokens). For (B,) classifier labels every weight is B, reducing to
    the plain mean."""
    if loss_fn is None:
        loss_fn = cross_entropy_loss
    micro = images.shape[0] // accum
    imgs = images.reshape(accum, micro, *images.shape[1:])
    lbls = labels.reshape(accum, micro, *labels.shape[1:])

    def step(carry, xy):
        gsum, lsum, wsum = carry
        x, y = xy
        # qat_scales is TRACED (per-epoch refreshed values, one compiled
        # program) — forwarded as a kwarg so the partial'd loss keeps a
        # hashable (static) identity
        kw = {} if qat_scales is None else {"qat_scales": qat_scales}
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, x, y, hp, **kw
        )
        # valid-target count of this micro-batch: mask-aware for (B, S)
        # sequence targets, the constant micro size for (B,) labels
        if y.ndim >= 2:
            w = jnp.maximum(jnp.sum(y >= 0), 1).astype(jnp.float32)
        else:
            w = jnp.asarray(float(micro), jnp.float32)
        return (
            jax.tree.map(lambda s, g: s + (g * w).astype(s.dtype), gsum, grads),
            lsum + loss * w,
            wsum + w,
        ), ()

    zeros = jax.tree.map(jnp.zeros_like, state.params)
    (gsum, lsum, wsum), _ = jax.lax.scan(
        step, (zeros, jnp.zeros(()), jnp.zeros(())), (imgs, lbls)
    )
    grads = jax.tree.map(lambda g: g / wsum, gsum)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), lsum / wsum


def create_train_state(
    params: Dict[str, Any], mesh: Mesh, optimizer, fsdp: bool = False
) -> TrainState:
    """Shard params onto the mesh and build matching optimizer state.

    `fsdp=True` additionally shards every large dense leaf over the
    "data" axis (ZeRO-3, parallel/sharding.fsdp_pspecs); because the
    optimizer state is built leaf-for-leaf from the sharded params below,
    the AdamW moments shard identically — params, grads and both moments
    all shrink dp-fold per device.

    optimizer.init runs EAGERLY: zeros_like on sharded params inherits
    each parameter's sharding leaf-for-leaf, so the Adam moments live
    where their parameters live. (A jitted init loses the propagation and
    gathers the whole optimizer state onto one device.) Scalars (step,
    Adam count) are explicitly replicated over the mesh.

    The returned state OWNS its buffers: the train steps donate their
    state argument (buffer aliasing through the adamw update), and
    device_put can alias the caller's arrays zero-copy — without the
    explicit copy below, the first donated step would delete the
    caller's `params` out from under them.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    params = jax.tree.map(
        lambda leaf: jnp.array(leaf, copy=True) if hasattr(leaf, "ndim") else leaf,
        params,
    )
    params = shard_params(params, mesh, fsdp=fsdp)
    opt_state = optimizer.init(params)
    replicated = NamedSharding(mesh, P())

    def fix_scalars(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 0:
            return jax.device_put(leaf, replicated)
        return leaf

    opt_state = jax.tree.map(fix_scalars, opt_state)
    step = jax.device_put(jnp.zeros((), jnp.int32), replicated)
    return TrainState(params=params, opt_state=opt_state, step=step)


def create_lora_train_state(trainable, mesh: Mesh, optimizer) -> TrainState:
    """Mesh state for a LoRA trainable tree (models/lora.lora_trainable):
    adapters + head are tiny (rank-r), so every leaf REPLICATES — no TP
    splits to maintain; the frozen base keeps its usual dp x tp
    shardings via shard_params, and the merged kernels inside the loss
    inherit the base's partitioning through the einsum-add."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    trainable = jax.tree.map(
        lambda leaf: jax.device_put(jnp.array(leaf, copy=True), replicated),
        trainable,
    )
    opt_state = optimizer.init(trainable)
    step = jax.device_put(jnp.zeros((), jnp.int32), replicated)
    return TrainState(params=trainable, opt_state=opt_state, step=step)


def shard_batch(images, labels, mesh: Mesh):
    s = NamedSharding(mesh, batch_pspec())
    return jax.device_put(images, s), jax.device_put(labels, s)
