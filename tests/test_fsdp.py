"""FSDP / ZeRO-3 training-state sharding (parallel/sharding.fsdp_pspecs).

The reference has no distributed backend at all (SURVEY.md §2.7); dp x tp
serving/training shardings are covered by tests/test_parallel.py. These
tests cover the additional "data"-axis parameter + optimizer sharding used
to train models whose AdamW state exceeds one chip: spec construction
(largest divisible dim picked, non-divisible leaves degrade per-leaf),
dp-fold per-device memory shrink for params AND both Adam moments, and
numerical equality with plain DP training — on the 8-device virtual CPU
mesh (SURVEY.md §4 device-count spoofing).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import params_from_state_dict
from vit_cpp_tpu.parallel.mesh import make_mesh
from vit_cpp_tpu.parallel.sharding import fsdp_pspecs, shard_params
from vit_cpp_tpu.parallel.train import (
    create_train_state,
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
    images = jnp.asarray(rng.standard_normal((8, 3, 32, 32)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 16, (8,)), jnp.int32)
    return params, images, labels


def test_fsdp_specs_add_data_axis(setup):
    params, _, _ = setup
    mesh = make_mesh(dp=8, tp=1)
    specs = fsdp_pspecs(params, mesh)
    # col-parallel qkv kernel (L, in=64, out=192): TP holds out, FSDP
    # takes the largest remaining divisible dim — in (64 % 8 == 0; L=2 no)
    assert specs["blocks"]["qkv"]["kernel"] == P(None, "data", "model")
    # row-parallel fc2 kernel (L, in=256, out=64): TP holds in, FSDP out
    assert specs["blocks"]["fc2"]["kernel"] == P(None, "model", "data")
    # qkv bias (L=2, 192) has TP on dim1 and L=2 % 8 != 0: stays TP-only
    assert specs["blocks"]["qkv"]["bias"] == P(None, "model")
    # replicated patch_embed kernel (192, 64): largest dim takes "data"
    assert tuple(specs["patch_embed"]["kernel"]) == ("data", None)
    # head kernel (64, 16): in-dim is free and divisible
    assert specs["head"]["kernel"] == P("data", "model")
    # 1-D / scalar leaves never shard
    assert specs["norm"]["scale"] == P()


def test_fsdp_respects_smaller_dp(setup):
    params, _, _ = setup
    mesh = make_mesh(dp=4, tp=2)
    specs = fsdp_pspecs(params, mesh)
    assert specs["blocks"]["qkv"]["kernel"] == P(None, "data", "model")
    # pos_embed (17, 64): 17 % 4 != 0 so the hidden dim takes it
    assert tuple(specs["pos_embed"]) == (None, "data")


def test_fsdp_state_memory_shrinks_dpfold(setup):
    """Params AND both Adam moments must hold 1/dp of each big leaf per
    device — the whole point of ZeRO-3."""
    params, _, _ = setup
    mesh = make_mesh(dp=8, tp=1)
    optimizer = make_optimizer(lr=1e-3)
    with mesh:
        state = create_train_state(params, mesh, optimizer, fsdp=True)

    def shard_frac(leaf):
        shard = leaf.sharding.shard_shape(leaf.shape)
        return float(np.prod(shard)) / float(np.prod(leaf.shape))

    qkv = state.params["blocks"]["qkv"]["kernel"]
    assert shard_frac(qkv) == pytest.approx(1 / 8)
    # find the adamw moment trees and check they shard like the params
    adam = [
        s
        for s in jax.tree.leaves(
            state.opt_state, is_leaf=lambda x: hasattr(x, "mu")
        )
        if hasattr(s, "mu")
    ]
    assert adam, "no ScaleByAdamState found in opt_state"
    for moments in (adam[0].mu, adam[0].nu):
        m_qkv = moments["blocks"]["qkv"]["kernel"]
        assert shard_frac(m_qkv) == pytest.approx(1 / 8)
        assert m_qkv.sharding == qkv.sharding


@pytest.mark.slow
def test_fsdp_train_matches_plain_dp(setup):
    """3 FSDP train steps must produce the same losses as plain DP — the
    all-gather/reduce-scatter insertion is XLA's, the math must be
    identical."""
    params, images, labels = setup
    optimizer = make_optimizer(lr=1e-3)
    losses = {}
    for fsdp in (False, True):
        mesh = make_mesh(dp=8, tp=1)
        with mesh:
            state = create_train_state(params, mesh, optimizer, fsdp=fsdp)
            si, sl = shard_batch(images, labels, mesh)
            run = []
            for _ in range(3):
                state, loss = train_step(state, si, sl, TINY, optimizer)
                run.append(float(loss))
        losses[fsdp] = run
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4)


@pytest.mark.slow
def test_fsdp_composes_with_tp(setup):
    params, images, labels = setup
    optimizer = make_optimizer(lr=1e-3)
    mesh = make_mesh(dp=4, tp=2)
    with mesh:
        state = create_train_state(params, mesh, optimizer, fsdp=True)
        si, sl = shard_batch(images, labels, mesh)
        l0 = None
        for _ in range(3):
            state, loss = train_step(state, si, sl, TINY, optimizer)
            l0 = l0 if l0 is not None else float(loss)
    assert np.isfinite(float(loss))
    assert float(loss) < l0  # descends


@pytest.mark.slow
def test_fsdp_composes_with_moe(setup):
    """ZeRO-3 on a V-MoE pytree: the 8x expert kernels (the state that
    makes MoE training memory-hungry, TUNING "V-MoE" peak 8.2 GB) take
    a "data" dim on top of their expert-parallel "model" dim, and the
    FSDP-sharded routed train step matches plain DP losses."""
    import dataclasses

    from vit_cpp_tpu.ops.moe import upcycle_params

    params, images, labels = setup
    up = upcycle_params(params, TINY, 4, (1,))
    hp_moe = dataclasses.replace(
        TINY, num_experts=4, moe_layers=(1,), moe_top_k=2, moe_capacity=2.0
    )
    mesh = make_mesh(dp=4, tp=2)
    specs = fsdp_pspecs(up, mesh)
    # expert fc1 kernel (Lm=1, E=4, in=64, out=256): "model" holds E,
    # FSDP widens the largest divisible free dim (out=256 % 4 == 0)
    assert specs["moe"]["fc1"]["kernel"] == P(None, "model", None, "data")
    # the router replicates for SERVING (param_pspecs) but under FSDP it
    # carries optimizer state like any dense leaf — its h dim shards
    assert specs["moe"]["router"]["kernel"] == P(None, "data", None)
    optimizer = make_optimizer(lr=1e-3)
    losses = {}
    for fsdp in (False, True):
        with mesh:
            state = create_train_state(up, mesh, optimizer, fsdp=fsdp)
            si, sl = shard_batch(images, labels, mesh)
            run = []
            for _ in range(3):
                state, loss = train_step(state, si, sl, hp_moe, optimizer)
                run.append(float(loss))
        losses[fsdp] = run
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4)


def test_fsdp_serving_path_unaffected(setup):
    """shard_params' default stays TP-only — serving has no opt state to
    shard and must not pick up surprise all-gathers."""
    params, _, _ = setup
    mesh = make_mesh(dp=8, tp=1)
    sp = shard_params(params, mesh)
    spec = sp["blocks"]["qkv"]["kernel"].sharding.spec
    assert "data" not in jax.tree.leaves(tuple(spec))


def test_fsdp_requires_mesh(tmp_path, setup):
    from vit_cpp_tpu.finetune import finetune

    with pytest.raises(ValueError, match="mesh"):
        finetune("unused.gguf", str(tmp_path), fsdp=True, mesh=None)
