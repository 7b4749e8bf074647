"""Multi-device sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4: device-count spoofing via xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import forward, params_from_state_dict
from vit_cpp_tpu.parallel.mesh import make_mesh
from vit_cpp_tpu.parallel.sharding import param_pspecs, shard_params
from vit_cpp_tpu.parallel.train import (
    create_train_state,
    cross_entropy_loss,
    make_optimizer,
    shard_batch,
    train_step,
)
from vit_cpp_tpu.testing.synthetic import random_state_dict

TINY = VitHParams(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_classes=16,
    patch_size=8,
    img_size=32,
)


@pytest.fixture(scope="module")
def setup():
    state = random_state_dict(TINY, seed=0)
    params = params_from_state_dict(state, TINY)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.standard_normal((8, 3, 32, 32)), dtype=jnp.float32)
    labels = jnp.asarray(rng.integers(0, 16, (8,)), dtype=jnp.int32)
    return params, images, labels


def test_mesh_shapes():
    m = make_mesh()
    assert m.devices.shape == (8, 1)
    m = make_mesh(dp=4, tp=2)
    assert m.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=3)


def test_sharded_forward_matches_single_device(setup):
    params, images, labels = setup
    expect = np.asarray(forward(params, images, TINY))
    mesh = make_mesh(dp=4, tp=2)
    with mesh:
        sp = shard_params(params, mesh)
        si = jax.device_put(
            images, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
        )
        got = np.asarray(jax.jit(forward, static_argnums=2)(sp, si, TINY))
    np.testing.assert_allclose(got, expect, atol=2e-4, rtol=1e-4)


def test_param_specs_cover_tree(setup):
    from vit_cpp_tpu.quant.qlinear import QuantLinear

    params, _, _ = setup
    specs = param_pspecs(params)
    is_q = lambda x: isinstance(x, QuantLinear)
    p_leaves = jax.tree.structure(params, is_leaf=is_q)
    s_leaves = jax.tree.structure(specs, is_leaf=lambda x: is_q(x) or isinstance(x, jax.sharding.PartitionSpec))
    assert p_leaves.num_leaves == s_leaves.num_leaves


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
@pytest.mark.slow
def test_train_step_on_mesh(setup, dp, tp):
    params, images, labels = setup
    mesh = make_mesh(dp=dp, tp=tp)
    optimizer = make_optimizer(lr=1e-3)
    with mesh:
        state = create_train_state(params, mesh, optimizer)
        si, sl = shard_batch(images, labels, mesh)
        loss0 = cross_entropy_loss(state.params, si, sl, TINY)
        state, loss = train_step(state, si, sl, TINY, optimizer)
        state, loss2 = train_step(state, si, sl, TINY, optimizer)
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    assert float(loss) == pytest.approx(float(loss0), rel=1e-5)
    assert float(loss2) < float(loss)  # optimizer actually descends
    assert int(state.step) == 2


def test_train_step_tp_matches_dp(setup):
    """TP=2 must compute the same update as pure DP (collectives correct)."""
    params, images, labels = setup
    optimizer = make_optimizer(lr=1e-3)
    losses = {}
    for dp, tp in [(8, 1), (4, 2)]:
        mesh = make_mesh(dp=dp, tp=tp)
        with mesh:
            state = create_train_state(params, mesh, optimizer)
            si, sl = shard_batch(images, labels, mesh)
            for _ in range(3):
                state, loss = train_step(state, si, sl, TINY, optimizer)
            losses[(dp, tp)] = float(loss)
    assert losses[(8, 1)] == pytest.approx(losses[(4, 2)], rel=1e-4)


@pytest.mark.slow
def test_graft_entry_contract():
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    # only check it traces/lowers — full B/16 compile on CPU is slow
    jax.eval_shape(fn, *example_args)


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_timer_report(capsys):
    import time as _time

    from vit_cpp_tpu.utils import Timer, trace

    t = Timer()
    with t.segment("model load"):
        _time.sleep(0.01)
    with t.segment("processing"):
        _time.sleep(0.01)
    t.report(prefix="main")
    out = capsys.readouterr().out
    assert "main:    model load time =" in out
    assert "total" in out
    with trace(None):  # no-op path
        pass


@pytest.mark.slow
def test_train_loss_decreases():
    """5 train steps on one fixed batch must reduce the loss (convergence
    smoke for the dp x tp pjit path)."""
    import jax.numpy as jnp
    import numpy as np

    from vit_cpp_tpu.hparams import VitHParams
    from vit_cpp_tpu.models import params_from_state_dict
    from vit_cpp_tpu.parallel.mesh import make_mesh
    from vit_cpp_tpu.parallel.train import (
        create_train_state,
        make_optimizer,
        shard_batch,
        train_step,
    )
    from vit_cpp_tpu.testing.synthetic import random_state_dict

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_classes=8,
        patch_size=8,
        img_size=32,
    )
    params = params_from_state_dict(random_state_dict(hp, seed=0), hp)
    mesh = make_mesh(dp=4, tp=2)
    optimizer = make_optimizer(lr=3e-3)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((8, 3, 32, 32)), dtype=jnp.float32)
    labels = jnp.asarray(rng.integers(0, 8, (8,)), dtype=jnp.int32)
    with mesh:
        st = create_train_state(params, mesh, optimizer)
        images, labels = shard_batch(images, labels, mesh)
        losses = []
        for _ in range(5):
            st, loss = train_step(st, images, labels, hp, optimizer)
            losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(st.step) == 5


@pytest.mark.slow
def test_checkpoint_save_restore(tmp_path):
    """Orbax round trip of a sharded TrainState: resume must continue from
    the same params/opt_state/step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit_cpp_tpu.hparams import VitHParams
    from vit_cpp_tpu.models import params_from_state_dict
    from vit_cpp_tpu.parallel.checkpoint import (
        restore_train_state,
        save_train_state,
    )
    from vit_cpp_tpu.parallel.mesh import make_mesh
    from vit_cpp_tpu.parallel.train import (
        create_train_state,
        make_optimizer,
        shard_batch,
        train_step,
    )
    from vit_cpp_tpu.testing.synthetic import random_state_dict

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_classes=8,
        patch_size=8,
        img_size=32,
    )
    params = params_from_state_dict(random_state_dict(hp, seed=0), hp)
    mesh = make_mesh(dp=4, tp=2)
    optimizer = make_optimizer()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((8, 3, 32, 32)), dtype=jnp.float32)
    labels = jnp.asarray(rng.integers(0, 8, (8,)), dtype=jnp.int32)
    with mesh:
        st = create_train_state(params, mesh, optimizer)
        images, labels = shard_batch(images, labels, mesh)
        st, _ = train_step(st, images, labels, hp, optimizer)
        save_train_state(str(tmp_path / "ckpt"), st)

        like = create_train_state(params, mesh, optimizer)
        restored = restore_train_state(str(tmp_path / "ckpt"), like)
        assert int(restored.step) == 1
        # continuing from the restored state matches continuing in-memory
        a, loss_a = train_step(st, images, labels, hp, optimizer)
        b, loss_b = train_step(restored, images, labels, hp, optimizer)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    for la, lb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)


@pytest.mark.slow
def test_accum_masked_loss_matches_global_mean():
    """Token-weighted accumulation (ADVICE r2): with masked sequence
    targets whose valid-token counts DIFFER across micro-batches, the
    accumulated gradient must equal the unaccumulated global masked mean.
    SGD(1.0) makes the parameter delta exactly minus the gradient, so the
    comparison sees the gradients themselves."""
    import optax

    from vit_cpp_tpu.parallel.train import (
        TrainState,
        train_step_accum,
        train_step_vitstr,
        vitstr_cross_entropy_loss,
    )

    hp = VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_classes=16,
        patch_size=8,
        img_size=32,
        seq_len=5,
    )
    params = params_from_state_dict(random_state_dict(hp, seed=2), hp)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 3, 32, 32)), dtype=jnp.float32)
    y = rng.integers(2, 16, (4, 5))
    y[:, 0] = -1  # [GO] never predicted
    y[0, 2:] = -1  # first micro-batch: far fewer valid tokens
    y[1, 3:] = -1
    y = jnp.asarray(y, jnp.int32)

    opt = optax.sgd(1.0)

    def fresh_state():
        # the train steps DONATE their state (and the sharded params can
        # alias the source tree) — each call gets its own copy
        p = jax.tree.map(lambda a: jnp.array(a, copy=True), params)
        return TrainState(p, opt.init(p), jnp.zeros((), jnp.int32))

    acc_st, acc_loss = train_step_accum(
        fresh_state(), x, y, hp, opt, 2, loss_fn=vitstr_cross_entropy_loss
    )
    ref_st, ref_loss = train_step_vitstr(fresh_state(), x, y, hp, opt)
    np.testing.assert_allclose(float(acc_loss), float(ref_loss), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        acc_st.params,
        ref_st.params,
    )
