"""On-device augmentation (ops/augment.py) + its finetune integration:
resample oracle, identity crop, flip semantics, keyed determinism,
label-smoothing math, and bit-identical resume under augmentation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_cpp_tpu.ops.augment import (
    augment_batch,
    augment_flags,
    crop_boxes,
    random_hflip,
    random_resized_crop,
    resample_axis,
)


def _batch(b=4, c=3, s=16, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((b, c, s, s)),
        jnp.float32,
    )


class TestResample:
    def test_matches_scalar_oracle(self):
        """resample_axis == a scalar half-pixel-center bilinear loop."""
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 1, 8, 8)).astype(np.float32)
        start = np.asarray([1.25, 0.0], np.float32)
        step = np.asarray([0.5, 0.9], np.float32)
        got = np.asarray(
            resample_axis(jnp.asarray(x), jnp.asarray(start), jnp.asarray(step), axis=2)
        )
        want = np.empty_like(x)
        for b in range(2):
            for i in range(8):
                src = start[b] + (i + 0.5) * step[b] - 0.5
                src = min(max(src, 0.0), 7.0)
                lo = int(np.floor(src))
                hi = min(lo + 1, 7)
                t = src - lo
                want[b, :, i] = (1 - t) * x[b, :, lo] + t * x[b, :, hi]
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)

    def test_identity_crop_is_exact(self):
        x = _batch()
        out = random_resized_crop(
            jax.random.PRNGKey(0), x, scale=(1.0, 1.0), ratio=(1.0, 1.0)
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_crop_stays_within_input_range(self):
        """Bilinear output is a convex combination of input pixels."""
        x = _batch(b=8, s=32, seed=2)
        out = np.asarray(random_resized_crop(jax.random.PRNGKey(3), x))
        assert out.shape == x.shape
        assert np.isfinite(out).all()
        assert out.max() <= float(np.asarray(x).max()) + 1e-5
        assert out.min() >= float(np.asarray(x).min()) - 1e-5

    def test_boxes_within_image(self):
        y0, x0, h, w = crop_boxes(
            jax.random.PRNGKey(4), 256, (0.67, 1.0), (0.75, 4 / 3)
        )
        for lo, sz in ((y0, h), (x0, w)):
            lo, sz = np.asarray(lo), np.asarray(sz)
            assert (lo >= 0).all() and (sz > 0).all()
            assert (lo + sz <= 1.0 + 1e-6).all()


class TestFlip:
    def test_each_image_identity_or_mirror_and_both_occur(self):
        x = _batch(b=32, seed=5)
        out = np.asarray(random_hflip(jax.random.PRNGKey(6), x))
        xn = np.asarray(x)
        flipped = kept = 0
        for b in range(32):
            if np.array_equal(out[b], xn[b, :, :, ::-1]):
                flipped += 1
            elif np.array_equal(out[b], xn[b]):
                kept += 1
        assert flipped + kept == 32
        assert flipped > 0 and kept > 0


class TestDeterminism:
    def test_same_key_same_output_different_key_differs(self):
        x = _batch(b=8, s=32, seed=7)
        a = augment_batch(jax.random.PRNGKey(0), x)
        b = augment_batch(jax.random.PRNGKey(0), x)
        c = augment_batch(jax.random.PRNGKey(1), x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_mode_flags(self):
        assert augment_flags("none") == (False, False)
        assert augment_flags("flip") == (True, False)
        assert augment_flags("crop") == (False, True)
        assert augment_flags("all") == (True, True)
        with pytest.raises(ValueError, match="augment"):
            augment_flags("rotate")


class TestMixup:
    def test_mixed_batch_is_convex_combination(self):
        from vit_cpp_tpu.ops.augment import mixup_batch

        x = _batch(b=8, s=16, seed=10)
        mixed, perm, lam = mixup_batch(jax.random.PRNGKey(11), x, 0.4)
        lam_f = float(lam)
        assert 0.5 <= lam_f <= 1.0  # folded to the majority side
        xn = np.asarray(x)
        want = lam_f * xn + (1 - lam_f) * xn[np.asarray(perm)]
        np.testing.assert_allclose(np.asarray(mixed), want, atol=1e-5)
        # perm is a permutation of the batch
        assert sorted(np.asarray(perm).tolist()) == list(range(8))

    def test_mixed_loss_matches_manual(self):
        from vit_cpp_tpu.hparams import VitHParams
        from vit_cpp_tpu.models import params_from_state_dict
        from vit_cpp_tpu.parallel.train import (
            _mixed_cross_entropy_loss,
            cross_entropy_loss,
        )
        from vit_cpp_tpu.testing.synthetic import random_state_dict

        hp = VitHParams(
            hidden_size=64,
            num_hidden_layers=1,
            num_attention_heads=2,
            num_classes=5,
            patch_size=8,
            img_size=16,
        )
        params = params_from_state_dict(random_state_dict(hp, seed=8), hp)
        x = _batch(b=4, s=16, seed=9)
        y1 = jnp.asarray([0, 3, 1, 4], jnp.int32)
        y2 = jnp.asarray([2, 0, 4, 1], jnp.int32)
        lam = jnp.asarray(0.7, jnp.float32)
        got = float(_mixed_cross_entropy_loss(params, x, y1, y2, lam, hp, 0.0))
        want = 0.7 * float(cross_entropy_loss(params, x, y1, hp)) + 0.3 * float(
            cross_entropy_loss(params, x, y2, hp)
        )
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_mixup_rejected_with_grad_accum(self, tmp_path):
        from test_finetune import _make_dataset, VitHParams
        from vit_cpp_tpu.finetune import finetune
        from vit_cpp_tpu.testing.synthetic import write_synthetic_model

        hp = VitHParams(
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_classes=7,
            patch_size=8,
            img_size=32,
        )
        model = str(tmp_path / "m.gguf")
        write_synthetic_model(model, hp, ftype=1, seed=4)
        data = _make_dataset(tmp_path / "train")
        with pytest.raises(ValueError, match="grad-accum"):
            finetune(
                model, data, mixup=0.2, grad_accum=2, batch=4,
                log=lambda m: None,
            )


class TestLabelSmoothing:
    def test_matches_manual_computation(self):
        from vit_cpp_tpu.hparams import VitHParams
        from vit_cpp_tpu.models import params_from_state_dict
        from vit_cpp_tpu.models.vit import forward
        from vit_cpp_tpu.parallel.train import cross_entropy_loss
        from vit_cpp_tpu.testing.synthetic import random_state_dict

        hp = VitHParams(
            hidden_size=64,
            num_hidden_layers=1,
            num_attention_heads=2,
            num_classes=5,
            patch_size=8,
            img_size=16,
        )
        params = params_from_state_dict(random_state_dict(hp, seed=8), hp)
        x = _batch(b=4, s=16, seed=9)
        y = jnp.asarray([0, 3, 1, 4], jnp.int32)
        eps = 0.1
        got = float(cross_entropy_loss(params, x, y, hp, eps))
        logits = np.asarray(forward(params, x, hp), np.float64)
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        nll = -logp[np.arange(4), np.asarray(y)]
        uni = -logp.mean(-1)
        want = ((1 - eps) * nll + eps * uni).mean()
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_zero_smoothing_unchanged(self):
        from vit_cpp_tpu.hparams import VitHParams
        from vit_cpp_tpu.models import params_from_state_dict
        from vit_cpp_tpu.parallel.train import cross_entropy_loss
        from vit_cpp_tpu.testing.synthetic import random_state_dict

        hp = VitHParams(
            hidden_size=64,
            num_hidden_layers=1,
            num_attention_heads=2,
            num_classes=5,
            patch_size=8,
            img_size=16,
        )
        params = params_from_state_dict(random_state_dict(hp, seed=8), hp)
        x = _batch(b=4, s=16, seed=9)
        y = jnp.asarray([0, 3, 1, 4], jnp.int32)
        assert float(cross_entropy_loss(params, x, y, hp)) == float(
            cross_entropy_loss(params, x, y, hp, 0.0)
        )


@pytest.mark.slow
class TestFinetuneIntegration:
    @pytest.fixture()
    def setup(self, tmp_path):
        from test_finetune import _make_dataset, VitHParams
        from vit_cpp_tpu.testing.synthetic import write_synthetic_model

        hp = VitHParams(
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_classes=7,
            patch_size=8,
            img_size=32,
        )
        model = str(tmp_path / "m.gguf")
        write_synthetic_model(model, hp, ftype=1, seed=4)
        data = _make_dataset(tmp_path / "train")
        return model, data

    def test_augmented_training_learns(self, setup):
        """Flip+crop+smoothing still separates dark vs bright (both are
        augmentation-invariant classes) and the loss decreases."""
        from vit_cpp_tpu.finetune import finetune

        model, data = setup
        params, hp, classes, losses = finetune(
            model,
            data,
            epochs=4,
            batch=4,
            lr=1e-3,
            augment="all",
            label_smoothing=0.1,
            log=lambda m: None,
        )
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()

    def test_resume_replays_augmentation_stream(self, setup, tmp_path):
        """2 epochs straight == 1 epoch + resume(2 epochs), bit-identical:
        the augmentation key derives from the global update index, not
        from how many times the process restarted."""
        import jax.tree_util as jtu

        from vit_cpp_tpu.finetune import finetune

        model, data = setup
        kw = dict(
            epochs=2, batch=4, lr=1e-3, augment="all",
            label_smoothing=0.1, mixup=0.2, log=lambda m: None,
        )
        straight, _, _, _ = finetune(model, data, **kw)
        ck = str(tmp_path / "ck")
        finetune(model, data, ckpt_dir=ck, **{**kw, "epochs": 1})
        # resume epoch 2 only — must land on the same parameters
        resumed, _, _, _ = finetune(model, data, ckpt_dir=ck, **kw)
        for a, b in zip(jtu.tree_leaves(straight), jtu.tree_leaves(resumed)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_with_different_augment_rejected(self, setup, tmp_path):
        from vit_cpp_tpu.finetune import finetune

        model, data = setup
        ck = str(tmp_path / "ck")
        finetune(
            model, data, epochs=1, batch=4, augment="flip",
            ckpt_dir=ck, log=lambda m: None,
        )
        with pytest.raises(ValueError, match="augment"):
            finetune(
                model, data, epochs=2, batch=4, augment="all",
                ckpt_dir=ck, log=lambda m: None,
            )

    def test_augment_on_mesh(self, setup):
        """Augmented training over a dp x tp mesh: the gather-based
        resample must partition over the sharded batch axis."""
        from vit_cpp_tpu.finetune import finetune
        from vit_cpp_tpu.parallel.mesh import make_mesh

        model, data = setup
        mesh = make_mesh(n_devices=4, dp=2, tp=2)
        _, _, _, losses = finetune(
            model,
            data,
            epochs=2,
            batch=4,
            lr=1e-3,
            augment="all",
            label_smoothing=0.1,
            mixup=0.2,  # x[perm]/take(by, perm) gather across dp shards
            mesh=mesh,
            log=lambda m: None,
        )
        assert np.isfinite(losses).all()

    def test_vitstr_rejects_augmentation(self, tmp_path):
        from vit_cpp_tpu.finetune import finetune
        from vit_cpp_tpu.hparams import VitHParams
        from vit_cpp_tpu.testing.synthetic import write_synthetic_model

        hp = VitHParams(
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_classes=96,
            patch_size=8,
            img_size=32,
            in_chans=1,
            seq_len=6,
        )
        model = str(tmp_path / "s.gguf")
        write_synthetic_model(model, hp, ftype=1, seed=0)
        with pytest.raises(ValueError, match="classifier-only"):
            finetune(
                model, str(tmp_path), augment="flip", log=lambda m: None
            )
