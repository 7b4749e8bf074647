"""Export round trip: state dict -> pytree -> model file -> pytree.

Closes the fine-tune -> serve loop (models/export.py); the exported file
must load back into an identical forward function, and a train step's
output must survive the trip.
"""

import pytest

import numpy as np

from vit_cpp_tpu.gguf.reader import read_model
from vit_cpp_tpu.hparams import VitHParams
from vit_cpp_tpu.models import load_params, params_from_state_dict
from vit_cpp_tpu.models.export import params_to_state_dict, save_params
from vit_cpp_tpu.models.vit import forward
from vit_cpp_tpu.testing.synthetic import random_state_dict


def _hp(num_classes=7):
    return VitHParams(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_classes=num_classes,
        patch_size=8,
        img_size=32,
    )


def test_state_dict_round_trip():
    hp = _hp()
    state = random_state_dict(hp, seed=1)
    params = params_from_state_dict(state, hp)
    back = params_to_state_dict(params, hp)
    assert set(back) == set(state)
    for name in state:
        np.testing.assert_allclose(
            back[name].reshape(state[name].shape),
            state[name],
            atol=1e-6,
            err_msg=name,
        )


def test_file_round_trip_forward_parity(tmp_path):
    hp = _hp()
    state = random_state_dict(hp, seed=2)
    params = params_from_state_dict(state, hp)
    path = tmp_path / "exported.gguf"
    save_params(str(path), params, hp, ftype=0)
    mf = read_model(str(path))
    assert mf.hparams.hidden_size == hp.hidden_size
    assert len(mf.tensors) == hp.expected_tensor_count()
    params2 = load_params(mf)
    x = np.random.default_rng(0).standard_normal((2, 3, 32, 32)).astype(np.float32)
    a = np.asarray(forward(params, x, hp))
    b = np.asarray(forward(params2, x, hp))
    np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.slow
def test_trained_params_export(tmp_path):
    import jax.numpy as jnp

    from vit_cpp_tpu.parallel.mesh import make_mesh
    from vit_cpp_tpu.parallel.train import (
        create_train_state,
        make_optimizer,
        shard_batch,
        train_step,
    )

    hp = _hp(num_classes=4)
    params = params_from_state_dict(random_state_dict(hp, seed=3), hp)
    mesh = make_mesh(dp=4, tp=2)
    optimizer = make_optimizer()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((8, 3, 32, 32)), dtype=jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, (8,)), dtype=jnp.int32)
    with mesh:
        st = create_train_state(params, mesh, optimizer)
        images, labels = shard_batch(images, labels, mesh)
        st, loss = train_step(st, images, labels, hp, optimizer)
    path = tmp_path / "tuned.gguf"
    save_params(str(path), st.params, hp, ftype=1)
    params2 = load_params(read_model(str(path)))
    x = np.random.default_rng(1).standard_normal((2, 3, 32, 32)).astype(np.float32)
    a = np.asarray(forward(st.params, x, hp))
    b = np.asarray(forward(params2, x, hp))
    # f16 storage of the tuned weights
    np.testing.assert_allclose(a, b, atol=5e-3, rtol=5e-3)


def test_quantized_pytree_export(tmp_path):
    from vit_cpp_tpu.cli.quantize import quantize_model_file
    from vit_cpp_tpu.testing.synthetic import write_synthetic_model

    hp = _hp()
    f16 = tmp_path / "m.gguf"
    write_synthetic_model(str(f16), hp, ftype=1, seed=4)
    qf = tmp_path / "q.gguf"
    quantize_model_file(str(f16), str(qf), 8, verbose=False)
    qparams = load_params(read_model(str(qf)))
    out = tmp_path / "dequant.gguf"
    save_params(str(out), qparams, hp, ftype=0)
    params2 = load_params(read_model(str(out)))
    x = np.random.default_rng(2).standard_normal((2, 3, 32, 32)).astype(np.float32)
    a = np.asarray(forward(qparams, x, hp))
    b = np.asarray(forward(params2, x, hp))
    np.testing.assert_allclose(a, b, atol=1e-5)
