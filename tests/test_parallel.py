"""Mesh/sharding tests on the virtual 8-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_models_tpu.parallel import make_mesh, parse_mesh_spec, set_mesh
from generative_models_tpu.parallel.ring_attention import ring_causal_attention


def test_parse_mesh_spec():
    assert parse_mesh_spec('', 8) == (('data', 8),)
    assert parse_mesh_spec('data:4,model:2', 8) == (('data', 4), ('model', 2))
    with pytest.raises(AssertionError):
        parse_mesh_spec('data:3', 8)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_data_parallel_train_step_matches_single_device():
    """The same MADE step on a data:8 mesh and a 1-device mesh must agree."""
    from generative_models_tpu.models.made import MADE
    from generative_models_tpu.utils.config import global_defaults

    def G():
        g = global_defaults()
        g.bs = 16
        g.hidden_size = 32
        return g

    x = jnp.asarray(
        (np.random.RandomState(0).rand(16, 28, 28, 1) > 0.5).astype(np.float32)
    )
    set_mesh(make_mesh('', jax.devices()))  # data:8
    m_dp = MADE(G())
    met_dp = m_dp.train_step(x, None)
    set_mesh(make_mesh('', jax.devices()[:1]))  # single device
    m_1 = MADE(G())
    met_1 = m_1.train_step(x, None)
    set_mesh(make_mesh('', jax.devices()))  # restore for other tests
    np.testing.assert_allclose(
        float(met_dp['nlogp']), float(met_1['nlogp']), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(m_dp.params), jax.tree_util.tree_leaves(m_1.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_ring_attention_matches_dense():
    from generative_models_tpu.ops.attention import xla_causal_attention

    mesh = make_mesh('seq:8', jax.devices())
    rng = np.random.RandomState(0)
    B, H, T, D = 2, 2, 64, 8  # T=64 -> 8 tokens per device
    q = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    out_ring = ring_causal_attention(q, k, v, mesh=mesh, axis='seq')
    out_dense = xla_causal_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out_ring), np.asarray(out_dense), rtol=1e-4, atol=1e-5
    )


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    # restore the default mesh for any later tests
    set_mesh(make_mesh('', jax.devices()))
