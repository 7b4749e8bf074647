"""Quantization-aware training: fake-quantize with straight-through grads.

The serving paths introduce quantization noise the fine-tune loop never
sees: block codecs on disk (quant/blocks.py — the reference's formats,
quantize.cpp:207-223), the load-time channelwise-int8 requantization of
the W8A8 MXU path (quant/int8.py), and the per-token dynamic activation
quantization inside the int8 matmul (ops/pallas_int8_matmul.py:33-41).
Post-training quantization costs measured top-1 agreement (95.3% W8A8,
93.8% Q4_0 — docs/TUNING.md frontier table); QAT trains THROUGH the same
noise so the exported quantized checkpoint is what the loss optimized.

Everything here simulates the serving arithmetic bit-for-bit in f32:

  fake_quant_params(p, "q4_0")   == dequant(channelwise_int8(dequant(
                                      Q4_0_blocks(w))))  per targeted leaf
  fake_quant_act(x)              == sx * round(x / sx), sx per-token absmax/127

and wraps each rounding in a straight-through estimator (STE: identity
gradient, Bengio et al. 2013 — the standard QAT recipe) so the latent
f32 master weights keep training. The train step applies
fake_quant_params at the top of the loss, and forward(mm_impl="qat")
routes every quantized-at-serve matmul through fake_quant_act — the same
tensor positions the reference quantizer targets (2-D `.*weight`:
blocks.{qkv,proj,fc1,fc2} + head; patch_embed/norms/biases stay float).

Pure functions of dense f32 pytrees: QAT composes with mesh/FSDP
shardings, grad-accum, mixup, EMA, ToMe, and the fused-VJP attention
unchanged (the fake-quant is elementwise; XLA fuses it into the
producers/consumers).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

QK = 32  # ggml block size (gguf/dtypes.py)

QAT_FORMATS = ("w8a8", "q8_0", "q4_0", "q4_1", "q5_0", "q5_1")


def _ste(x: jax.Array, q: jax.Array) -> jax.Array:
    """Straight-through: forward value EXACTLY q, gradient of identity
    on x. Not the usual `x + stop_gradient(q - x)` — that reintroduces
    one f32 rounding (x + (q - x) != q), breaking bit-parity with the
    serving codecs; `(x - stop_gradient(x))` is exactly +0.0 for finite
    x, so the sum is exactly q."""
    return (x - jax.lax.stop_gradient(x)) + jax.lax.stop_gradient(q)


def _round_half_away(x: jax.Array) -> jax.Array:
    """C roundf: half away from zero (jnp.round is half-to-even) —
    mirrors quant/blocks.py:146-148 for Q8_0 codes."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def fake_quant_act_static(x: jax.Array, act_scale: jax.Array) -> jax.Array:
    """Per-tensor STATIC-scale int8 qdq with STE.

    Mirrors the W8A8 matmul's static branch bit for bit
    (ops/pallas_int8_matmul.py:36-38): codes = round(clip(x/sx, ±127)),
    value = codes * sx — including the CLIPPING the static serving path
    applies to out-of-range activations, so training absorbs exactly the
    saturation noise deployment will see. `act_scale` is ([1,] 1) or
    scalar-broadcastable, frozen (stop_gradient'd by the STE)."""
    xf = x.astype(jnp.float32)
    sx = act_scale.astype(jnp.float32)
    q = jnp.round(jnp.clip(xf / sx, -127.0, 127.0)) * sx
    return _ste(xf, q).astype(x.dtype)


def fake_quant_act(x: jax.Array) -> jax.Array:
    """Per-token dynamic int8 quantize-dequantize with STE.

    Mirrors the W8A8 matmul's activation quantization
    (ops/pallas_int8_matmul.py:38-41): sx = absmax(token)/127 in f32,
    codes = round(x/sx) (jnp.round — the serving op), value = codes*sx.
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = absmax * (1.0 / 127.0)
    inv = jnp.where(sx > 0, 1.0 / sx, 0.0)
    q = jnp.round(xf * inv) * sx
    return _ste(xf, q).astype(x.dtype)


def _channelwise_qdq(w: jax.Array) -> jax.Array:
    """Per-output-channel int8 qdq — quant/int8.channelwise_int8 followed
    by its dequantize, without materializing int8."""
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    scale = absmax / 127.0  # true division: bit-matches channelwise_int8
    inv = jnp.where(scale > 0, 1.0 / scale, 0.0)
    codes = jnp.clip(jnp.round(w * inv), -127, 127)
    return codes * scale


def _block_view(w: jax.Array):
    """([L,] in, out) -> ([L,] in/QK, QK, out): blocks run along the
    contraction axis in groups of 32, matching QuantLinear's layout
    (scales (in//32, out), quant/qlinear.py:34-36)."""
    if w.shape[-2] % QK:
        raise ValueError(
            f"in_features {w.shape[-2]} not a multiple of QK={QK}"
        )
    return w.reshape(*w.shape[:-2], w.shape[-2] // QK, QK, w.shape[-1])


def _f16(x: jax.Array) -> jax.Array:
    """Round-trip through f16 — block scales/mins are stored as <f2 on
    disk (quant/blocks.py BLOCK_DTYPES) and dequantized from that."""
    return x.astype(jnp.float16).astype(jnp.float32)


def _block_qdq(w: jax.Array, fmt: str) -> jax.Array:
    """Quantize-dequantize a dense ([L,] in, out) kernel through a ggml
    block codec, bit-matching quant/blocks.quantize + dequantize:

      q8_0      d = absmax/127 (f16), codes = roundf(x/d)
      q4_0/q5_0 d = signed_absmax / -(levels/2) (f16),
                codes = min(trunc(x/d + levels/2 + 0.5), levels-1)
      q4_1/q5_1 d = (max-min)/(levels-1), m = min (both f16),
                codes = min(trunc((x-min)/d + 0.5), levels-1)

    Codes are computed with the f32 scale (as the numpy quantizer does)
    but dequantized with the f16-stored one.
    """
    xb = _block_view(w.astype(jnp.float32))
    if fmt == "q8_0":
        amax = jnp.max(jnp.abs(xb), axis=-2, keepdims=True)
        d = amax / 127.0  # division, not reciprocal-multiply: blocks.py:146
        inv = jnp.where(d != 0.0, 1.0 / d, 0.0)
        codes = _round_half_away(xb * inv)
        q = codes * _f16(d)
    elif fmt in ("q4_0", "q5_0"):
        levels = 16 if fmt == "q4_0" else 32
        half = levels // 2
        # signed value at the absmax position (blocks._codes_absmax uses
        # argmax; this where() differs from it only on exact |max|==|min|
        # ties, measure-zero for trained weights)
        mx = jnp.max(xb, axis=-2, keepdims=True)
        mn = jnp.min(xb, axis=-2, keepdims=True)
        signed_max = jnp.where(jnp.abs(mx) >= jnp.abs(mn), mx, mn)
        d = signed_max / -float(half)
        inv = jnp.where(d != 0.0, 1.0 / d, 0.0)
        codes = jnp.minimum(
            jnp.trunc(xb * inv + (half + 0.5)), float(levels - 1)
        )
        q = (codes - half) * _f16(d)
    elif fmt in ("q4_1", "q5_1"):
        levels = 16 if fmt == "q4_1" else 32
        mn = jnp.min(xb, axis=-2, keepdims=True)
        mx = jnp.max(xb, axis=-2, keepdims=True)
        d = (mx - mn) / float(levels - 1)  # division: blocks._codes_minmax
        inv = jnp.where(d != 0.0, 1.0 / d, 0.0)
        codes = jnp.minimum(
            jnp.trunc((xb - mn) * inv + 0.5), float(levels - 1)
        )
        q = codes * _f16(d) + _f16(mn)
    else:
        raise ValueError(f"unknown block format {fmt!r}")
    return q.reshape(w.shape)


def fake_quant_weight(w: jax.Array, fmt: str) -> jax.Array:
    """STE qdq of one dense kernel through the full SERVING chain.

    "w8a8": f16 storage (cli/convert's ftype-1 rule) then the load-time
    channelwise int8 (the `--quant none --mm int8` path). Block formats:
    the on-disk block codec, then the same channelwise requantization
    W8A8 serving applies on top (quant/int8.from_quant_linear).
    """
    wf = w.astype(jnp.float32)
    if fmt == "w8a8":
        q = _channelwise_qdq(_f16(wf))
    else:
        q = _channelwise_qdq(_block_qdq(wf, fmt))
    return _ste(wf, q).astype(w.dtype)


def fake_quant_params(params: Dict[str, Any], fmt: str) -> Dict[str, Any]:
    """Fake-quantize the leaves the serving quantizer targets.

    Same positions as quant/int8.convert_params_to_int8 (the reference's
    2-D `.*weight` rule): blocks.{qkv,proj,fc1,fc2}.kernel and the
    head(s) — including ViTSTR sequence heads and head_dist; headless
    encoders simply have no head leaf. patch_embed, attn_pool (never
    quantized at load), norms and biases stay float, as in quantized
    reference files.
    """
    if fmt not in QAT_FORMATS:
        raise ValueError(f"qat format must be one of {QAT_FORMATS}, got {fmt!r}")
    out = dict(params)
    blocks = dict(params["blocks"])
    for name in ("qkv", "proj", "fc1", "fc2"):
        leaf = dict(blocks[name])
        leaf["kernel"] = fake_quant_weight(leaf["kernel"], fmt)
        blocks[name] = leaf
    out["blocks"] = blocks
    for name in ("head", "head_dist"):
        if name in params:
            head = dict(params[name])
            head["kernel"] = fake_quant_weight(head["kernel"], fmt)
            out[name] = head
    return out


_GEMMS = ("qkv", "proj", "fc1", "fc2")


def measure_act_scales(
    params: Dict[str, Any],
    images: jax.Array,
    hp,
    fmt: str,
    *,
    margin: float = 1.05,
) -> Dict[str, jax.Array]:
    """Per-site static activation scales for --qat-act static, measured
    on the FAKE-QUANTIZED model (the weights training/serving will run):
    {'qkv'|'proj'|'fc1'|'fc2': (L, 1, 1), 'head': (1, 1)} f32, each
    absmax * margin / 127 — the same rule the serve-time calibrator
    applies (quant/calibrate.py:113-117), so an exported scale file
    attaches to Int8Linear leaves unchanged."""
    from vit_cpp_tpu.models.vit import (
        embed,
        slice_block_params,
        transformer_block,
    )
    from vit_cpp_tpu.ops.core import layernorm

    fq = fake_quant_params(params, fmt)
    maxima = {name: [] for name in _GEMMS}
    x = embed(fq, images, hp)
    for i in range(hp.num_hidden_layers):
        bp = {k: slice_block_params(v, i) for k, v in fq["blocks"].items()}
        per_layer = {}

        def tap(name, v, _store=per_layer):
            _store[name[:-3]] = jnp.max(jnp.abs(v.astype(jnp.float32)))

        x = transformer_block(x, bp, hp, attn_impl="xla", mm_impl="xla", tap=tap)
        for name in _GEMMS:
            maxima[name].append(per_layer[name])
    if hp.global_pool == "map" and hp.seq_len is None:
        # SigLIP MAP head: norm all tokens, probe cross-attends — the
        # head reads attention_pool's output (never itself quantized)
        from vit_cpp_tpu.models.vit import attention_pool

        y = layernorm(x, fq["norm"]["scale"], fq["norm"]["bias"], hp.eps)
        pooled = attention_pool(fq["attn_pool"], y, hp)
    else:
        if "head_dist" in fq and hp.seq_len is None:
            pooled = x[:, :2]
        elif hp.seq_len is not None:
            pooled = x[:, : hp.seq_len]
        elif hp.global_pool == "avg":
            pooled = jnp.mean(x[:, hp.n_prefix :], axis=1)
        else:
            pooled = x[:, 0]
        pooled = layernorm(
            pooled, fq["norm"]["scale"], fq["norm"]["bias"], hp.eps
        )

    def to_scale(absmax, shape):
        s = absmax.astype(jnp.float32) * margin / 127.0
        return jnp.maximum(s, 1e-12).reshape(shape)

    out = {
        name: to_scale(jnp.stack(maxima[name]), (hp.num_hidden_layers, 1, 1))
        for name in _GEMMS
    }
    out["head"] = to_scale(jnp.max(jnp.abs(pooled.astype(jnp.float32))), (1, 1))
    return out


def inject_act_scales(
    params: Dict[str, Any], scales: Dict[str, jax.Array]
) -> Dict[str, Any]:
    """Attach 'act_scale' entries next to the targeted kernels so
    forward(mm_impl="qat") runs the STATIC fake-quant (ops/core.linear).
    The scales ride the bp dicts exactly like Int8Linear.act_scale rides
    the serving tree; call on the OUTPUT of fake_quant_params, inside
    the loss, so they are never part of the differentiated params."""
    out = dict(params)
    blocks = dict(params["blocks"])
    for name in _GEMMS:
        leaf = dict(blocks[name])
        leaf["act_scale"] = scales[name]
        blocks[name] = leaf
    out["blocks"] = blocks
    for name in ("head", "head_dist"):
        if name in params:
            head = dict(params[name])
            head["act_scale"] = scales["head"]
            out[name] = head
    return out


def save_act_scales(path: str, scales: Dict[str, jax.Array], margin: float) -> None:
    """Sidecar JSON next to an exported gguf: per-site absmax-derived
    scales a static-serving engine loads instead of calibrating
    (VitEngine act_scales=)."""
    import json

    import numpy as np

    payload = {"margin": margin, "rule": "absmax*margin/127"}
    for k, v in scales.items():
        payload[k] = np.asarray(v).reshape(-1).tolist()
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)


def load_act_scales(path: str) -> Dict[str, jax.Array]:
    """Read a save_act_scales sidecar back to the measure_act_scales
    shapes ((L, 1, 1) per GEMM site, (1, 1) head)."""
    import json

    with open(path) as f:
        payload = json.load(f)
    out: Dict[str, jax.Array] = {}
    for name in _GEMMS:
        if name not in payload:
            raise ValueError(f"act-scales file {path} is missing {name!r}")
        v = jnp.asarray(payload[name], jnp.float32)
        out[name] = v.reshape(v.shape[0], 1, 1)
    if "head" in payload:
        out["head"] = jnp.asarray(payload["head"], jnp.float32).reshape(1, 1)
    return out
