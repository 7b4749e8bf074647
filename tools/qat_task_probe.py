"""Task-level QAT probe: does --qat recover Q4_0 post-training-quantization
accuracy on a trainable task at small scale?

Measured verdict (docs/TUNING.md "Quantization-aware training"):
**no signal at 2-layer/hidden-64 scale** — fine-grained 32-class
prototype-plus-noise tasks train to 54-100% dense top-1, and the
Q4_0+W8A8 served model scores within val noise of dense (sweep: noise
0.9 dense 1.000 / PTQ 1.000; noise 1.5 dense 0.542 / PTQ 0.526 / QAT
0.521 on a 192-image val set, +-3.6% std). Q4_0 weight error is tiny
relative to trained class margins here, so there is nothing for QAT to
recover; the QAT property that IS measurable (and what the committed
frontier rows show) is train/serve consistency — a dense-trained
validation forward agrees with its own Q4_0+W8A8 served model on only
73.4% of worst-case probes (30% logit MAE), while the --qat q4_0
validation forward agrees 100.0% (2.5% MAE, pure f32-vs-int32
accumulation) — `tools/accuracy_frontier.py --qat-only`.

    python tools/qat_task_probe.py [noise] [epochs]

Builds 32 prototype-plus-noise classes (prototypes fixed across splits,
noise split-specific), fine-tunes dense and --qat q4_0 from the same
seed, and scores both through the REAL deployment chain (export ->
vit-quantize Q4_0 -> channelwise int8 -> mm_impl="int8").
"""

import os
import sys
import tempfile

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.testing.synthetic import write_synthetic_model


def make_dataset(root, n_classes=32, n_per=12, size=32, seed=0, noise=0.9):
    """Prototype-plus-noise classes with small margins: each class is a
    fixed random smooth pattern (shared across splits); samples bury it
    in split-specific noise."""
    from PIL import Image

    prng = np.random.default_rng(7)  # prototypes: FIXED across splits
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(-1, 1, size), np.linspace(-1, 1, size))
    protos = []
    for _ in range(n_classes):
        fx, fy = prng.uniform(1, 4, 2)
        ph = prng.uniform(0, 2 * np.pi, 3)
        protos.append(
            np.stack(
                [
                    np.sin(fx * xx * np.pi + p) * np.cos(fy * yy * np.pi)
                    for p in ph
                ]
            )
        )
    for c, proto in enumerate(protos):
        d = os.path.join(root, f"c{c:02d}")
        os.makedirs(d, exist_ok=True)
        for i in range(n_per):
            img = proto + noise * rng.standard_normal((3, size, size))
            u8 = np.clip(
                (img - img.min()) / (img.max() - img.min() + 1e-9) * 255,
                0,
                255,
            ).astype(np.uint8)
            Image.fromarray(u8.transpose(1, 2, 0)).save(
                os.path.join(d, f"{i}.png")
            )
    return root


def quantized_eval(params, hp, val_dir, fmt_itype, batch=16):
    """Export -> block-quantize -> channelwise int8 -> serve: the real
    deployment arithmetic (fmt_itype None = dense f32 reference)."""
    import jax.numpy as jnp

    from vit_cpp_tpu.cli.quantize import quantize_model_file
    from vit_cpp_tpu.finetune import _preprocess_all, load_dataset
    from vit_cpp_tpu.gguf import read_model
    from vit_cpp_tpu.models import load_params
    from vit_cpp_tpu.models.export import save_params
    from vit_cpp_tpu.models.vit import forward
    from vit_cpp_tpu.quant.int8 import convert_params_to_int8

    paths, labels, _ = load_dataset(val_dir)
    pixels = _preprocess_all(paths, hp, 1)
    with tempfile.TemporaryDirectory() as d:
        f16 = f"{d}/m.gguf"
        qf = f"{d}/q.gguf"
        save_params(f16, params, hp)
        if fmt_itype is None:
            served = load_params(read_model(f16), dtype=jnp.float32)
            mm = "xla"
        else:
            quantize_model_file(f16, qf, fmt_itype, verbose=False)
            served = convert_params_to_int8(
                load_params(read_model(qf), dtype=jnp.float32)
            )
            mm = "int8"
        correct = 0
        for i in range(0, len(pixels), batch):
            chunk = pixels[i : i + batch]
            lg = np.asarray(forward(served, jnp.asarray(chunk), hp, mm_impl=mm))
            correct += int((lg.argmax(-1) == labels[i : i + len(chunk)]).sum())
    return correct / len(pixels)


def main(argv=None) -> int:
    from vit_cpp_tpu.finetune import finetune

    argv = sys.argv[1:] if argv is None else argv
    noise = float(argv[0]) if len(argv) > 0 else 1.5
    epochs = int(argv[1]) if len(argv) > 1 else 10
    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=3,
        patch_size=8,
        img_size=32,
    )
    with tempfile.TemporaryDirectory() as d:
        base = f"{d}/base.gguf"
        write_synthetic_model(base, hp, ftype=1, seed=4)
        train = make_dataset(f"{d}/train", seed=0, noise=noise)
        val = make_dataset(f"{d}/val", n_per=6, seed=1, noise=noise)
        dense_params, hp2, _, _ = finetune(
            base, train, epochs=epochs, batch=8, lr=1e-3, seed=0,
            log=lambda m: None,
        )
        acc_f32 = quantized_eval(dense_params, hp2, val, None)
        acc_ptq = quantized_eval(dense_params, hp2, val, 2)  # Q4_0
        qat_params, hp3, _, _ = finetune(
            base, train, epochs=epochs, batch=8, lr=1e-3, seed=0,
            qat="q4_0", log=lambda m: None,
        )
        acc_qat = quantized_eval(qat_params, hp3, val, 2)
        print(
            f"noise={noise} epochs={epochs}: dense f32 {acc_f32:.3f}  "
            f"PTQ q4_0 {acc_ptq:.3f}  QAT q4_0 {acc_qat:.3f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
