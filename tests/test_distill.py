"""Knowledge distillation (vit-finetune --distill): teacher signal
flows (pure-KD students learn the task), alpha=0 reduces exactly to the
plain CE objective, hard mode works, and invalid teachers/combos are
rejected up front."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.testing.synthetic import write_synthetic_model

HP = VitHParams(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_classes=7,
    patch_size=8,
    img_size=32,
)


def test_alpha_zero_is_plain_ce():
    from vit_cpp_tpu.models import params_from_state_dict
    from vit_cpp_tpu.parallel.train import (
        cross_entropy_loss,
        distill_cross_entropy_loss,
    )
    from vit_cpp_tpu.testing.synthetic import random_state_dict

    hp = VitHParams(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_classes=16, patch_size=8, img_size=32,
    )
    params = params_from_state_dict(random_state_dict(hp, seed=0), hp)
    teacher = params_from_state_dict(random_state_dict(hp, seed=1), hp)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 3, 32, 32)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 16, (4,)), jnp.int32)
    plain = float(cross_entropy_loss(params, x, y, hp))
    kd0 = float(
        distill_cross_entropy_loss(
            params, teacher, x, y, hp, hp, alpha=0.0, tau=3.0, mode="soft"
        )
    )
    assert kd0 == pytest.approx(plain, rel=1e-6)
    # alpha=1 soft: pure teacher matching — gradient still flows
    g = jax.grad(
        lambda p: distill_cross_entropy_loss(
            p, teacher, x, y, hp, hp, alpha=1.0, tau=3.0, mode="soft"
        )
    )(params)
    assert float(jnp.abs(g["head"]["kernel"]).max()) > 0
    with pytest.raises(ValueError, match="soft|hard"):
        distill_cross_entropy_loss(
            params, teacher, x, y, hp, hp, alpha=0.5, tau=1.0, mode="x"
        )


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    """A trained teacher on the two-class task + the base checkpoint."""
    from tests.test_finetune import _make_dataset
    from vit_cpp_tpu.finetune import finetune
    from vit_cpp_tpu.models.export import save_params

    d = tmp_path_factory.mktemp("distill")
    base = str(d / "base.gguf")
    write_synthetic_model(base, HP, ftype=1, seed=4)
    data = _make_dataset(d / "train")
    t_params, t_hp, classes, _ = finetune(
        base, data, epochs=4, batch=4, lr=1e-3, log=lambda m: None
    )
    teacher = str(d / "teacher.gguf")
    save_params(teacher, t_params, t_hp, id2label=dict(enumerate(classes)))
    return base, teacher, data


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["soft", "hard"])
def test_pure_kd_student_learns_from_teacher(setup, mode):
    """alpha=1: the student never weights the CE term, yet reaches the
    teacher's accuracy — the distillation channel alone carries the
    task."""
    from vit_cpp_tpu.finetune import (
        _preprocess_all,
        evaluate,
        finetune,
        load_dataset,
    )

    base, teacher, data = setup
    params, hp, classes, losses = finetune(
        base, data, epochs=4, batch=4, lr=1e-3, seed=1,
        distill=teacher, distill_alpha=1.0, distill_mode=mode,
        log=lambda m: None,
    )
    assert losses[-1] < losses[0]
    paths, labels, _ = load_dataset(data)
    pixels = _preprocess_all(paths, hp, 1)
    assert evaluate(params, hp, pixels, labels, batch=4) >= 0.9


@pytest.mark.slow
def test_distill_validation_and_meta_guard(setup, tmp_path):
    from tests.test_finetune import _make_dataset
    from vit_cpp_tpu.finetune import finetune

    base, teacher, data = setup
    # teacher with the wrong class count (the 7-class base itself)
    with pytest.raises(ValueError, match="classes"):
        finetune(base, data, epochs=1, batch=4, distill=base,
                 log=lambda m: None)
    with pytest.raises(ValueError, match="mixup"):
        finetune(base, data, epochs=1, batch=4, distill=teacher,
                 mixup=0.2, log=lambda m: None)
    with pytest.raises(ValueError, match="lora"):
        finetune(base, data, epochs=1, batch=4, distill=teacher, lora=4,
                 log=lambda m: None)
    with pytest.raises(ValueError, match="alpha"):
        finetune(base, data, epochs=1, batch=4, distill=teacher,
                 distill_alpha=1.5, log=lambda m: None)
    # resume-meta: a distilled run cannot silently change its teacher mix
    ck = str(tmp_path / "ck")
    finetune(base, data, epochs=1, batch=4, lr=1e-3, distill=teacher,
             ckpt_dir=ck, log=lambda m: None)
    with pytest.raises(ValueError, match="different settings"):
        finetune(base, data, epochs=2, batch=4, lr=1e-3, distill=teacher,
                 distill_alpha=0.9, ckpt_dir=ck, log=lambda m: None)
