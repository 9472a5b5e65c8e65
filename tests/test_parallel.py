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


def _tp_G(extra=None):
    from generative_models_tpu.utils.config import global_defaults

    g = global_defaults()
    g.bs = 8
    g.hidden_size = 32
    for k, v in (extra or {}).items():
        g[k] = v
    return g


def test_tensor_parallel_transformer_matches_single_device():
    """pixel_transformer on data:4,model:2 (params ACTUALLY sharded over
    'model') must reproduce single-device numerics."""
    from generative_models_tpu.models.pixel_transformer import PixelTransformer

    x = jnp.asarray(
        (np.random.RandomState(1).rand(8, 28, 28, 1) > 0.5).astype(np.float32)
    )
    set_mesh(make_mesh('data:4,model:2', jax.devices()))
    m_tp = PixelTransformer(
        _tp_G({'n_embed': 32, 'n_layer': 1, 'n_head': 4})
    )
    # the TP rules must produce real shardings, not hints
    fc1 = m_tp.state.params['block0']['fc1']['kernel']
    assert 'model' in tuple(fc1.sharding.spec), fc1.sharding
    qk = m_tp.state.params['block0']['attn']['query']['kernel']
    assert 'model' in tuple(qk.sharding.spec), qk.sharding
    met_tp = m_tp.train_step(x, None)

    set_mesh(make_mesh('', jax.devices()[:1]))
    m_1 = PixelTransformer(_tp_G({'n_embed': 32, 'n_layer': 1, 'n_head': 4}))
    met_1 = m_1.train_step(x, None)
    set_mesh(make_mesh('', jax.devices()))
    np.testing.assert_allclose(
        float(met_tp['nlogp']), float(met_1['nlogp']), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(m_tp.params), jax.tree_util.tree_leaves(m_1.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_tensor_parallel_diffusion_matches_single_device():
    """diffusion UNet on data:4,model:2 with channel-sharded ResBlocks must
    match single-device losses over two optimizer steps."""
    from generative_models_tpu.models.diffusion.model import DiffusionModel

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 28, 28, 1), jnp.float32)
    y = jnp.asarray(rng.randint(0, 10, 8), jnp.int32)

    def make():
        cfg = dict(DiffusionModel.DG)
        cfg.update(
            {'hidden_size': 32, 'timesteps': 4, 'bf16': 0, 'class_cond': 1}
        )
        return DiffusionModel(_tp_G(cfg))

    set_mesh(make_mesh('data:4,model:2', jax.devices()))
    m_tp = make()
    conv0 = m_tp.state.params['ResBlock_0']['Conv_0']['kernel']
    assert 'model' in tuple(conv0.sharding.spec), conv0.sharding
    l_tp = [float(m_tp.train_step(x, y)['loss']) for _ in range(2)]
    set_mesh(make_mesh('', jax.devices()[:1]))
    m_1 = make()
    l_1 = [float(m_1.train_step(x, y)['loss']) for _ in range(2)]
    set_mesh(make_mesh('', jax.devices()))
    np.testing.assert_allclose(l_tp, l_1, rtol=1e-4)


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


def test_ring_attention_gradients_match_dense():
    """Ring attention must be trainable: grads through the ring (scan +
    ppermute transpose) match dense-attention grads."""
    from generative_models_tpu.ops.attention import xla_causal_attention

    mesh = make_mesh('seq:8', jax.devices())
    rng = np.random.RandomState(3)
    B, H, T, D = 2, 2, 64, 8
    q = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    w = jnp.asarray(rng.randn(B, H, T, D), jnp.float32)

    def f_ring(q, k, v):
        return (ring_causal_attention(q, k, v, mesh=mesh, axis='seq') * w).sum()

    def f_dense(q, k, v):
        return (xla_causal_attention(q, k, v) * w).sum()

    g_ring = jax.grad(f_ring, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_dense):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_seq_parallel_transformer_matches_single_device():
    """--mesh=seq:8 routes pixel_transformer attention through the ring; a
    train step must reproduce single-device numerics."""
    from generative_models_tpu.models.pixel_transformer import PixelTransformer

    x = jnp.asarray(
        (np.random.RandomState(4).rand(4, 28, 28, 1) > 0.5).astype(np.float32)
    )
    set_mesh(make_mesh('seq:8', jax.devices()))
    m_sp = PixelTransformer(_tp_G({'n_embed': 32, 'n_layer': 1, 'n_head': 4}))
    assert m_sp.net.use_ring, 'seq mesh should enable ring attention'
    met_sp = m_sp.train_step(x, None)
    set_mesh(make_mesh('', jax.devices()[:1]))
    m_1 = PixelTransformer(_tp_G({'n_embed': 32, 'n_layer': 1, 'n_head': 4}))
    assert not m_1.net.use_ring
    met_1 = m_1.train_step(x, None)
    set_mesh(make_mesh('', jax.devices()))
    np.testing.assert_allclose(
        float(met_sp['nlogp']), float(met_1['nlogp']), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(m_sp.params), jax.tree_util.tree_leaves(m_1.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_maybe_initialize_distributed_gates_on_env(monkeypatch):
    """The multi-host DCN hook must call jax.distributed.initialize exactly
    when the coordinator env var is present (mesh.py); nothing can exercise
    a real DCN here, so the call boundary itself is the contract."""
    from generative_models_tpu.parallel import maybe_initialize_distributed

    calls = []
    monkeypatch.setattr(
        jax.distributed, 'initialize', lambda *a, **k: calls.append(1)
    )
    monkeypatch.delenv('JAX_COORDINATOR_ADDRESS', raising=False)
    maybe_initialize_distributed()
    assert calls == []
    monkeypatch.setenv('JAX_COORDINATOR_ADDRESS', '10.0.0.1:1234')
    maybe_initialize_distributed()
    assert calls == [1]


def test_fsdp_shards_params_and_moments_and_matches_numerics():
    """--fsdp=1 (ZeRO-3, parallel/mesh.py::fsdp_place): params AND their
    Adam moments actually sharded over 'data'; two training steps reproduce
    the replicated single-device numerics (GSPMD all-gathers params at use,
    reduce-scatters grads — reduction order differs, hence tolerance)."""
    from generative_models_tpu.models.made import MADE
    from generative_models_tpu.utils.config import global_defaults

    def G(fsdp):
        g = global_defaults()
        g.bs = 16
        g.hidden_size = 128
        g.fsdp = fsdp
        return g

    x = jnp.asarray(
        (np.random.RandomState(3).rand(16, 28, 28, 1) > 0.5).astype(np.float32)
    )
    set_mesh(make_mesh('', jax.devices()))  # data:8
    m = MADE(G(1))
    n_p = sum(
        1
        for leaf in jax.tree_util.tree_leaves(m.state.params)
        if 'data' in tuple(getattr(leaf.sharding, 'spec', ()))
    )
    assert n_p > 0, 'no param leaf actually sharded over data'
    n_m = sum(
        1
        for leaf in jax.tree_util.tree_leaves(m.state.opt_state)
        if 'data' in tuple(getattr(leaf.sharding, 'spec', ()))
    )
    assert n_m >= 2 * n_p, f'Adam moments not sharded: {n_m} vs {n_p} params'
    met = [m.train_step(x, None), m.train_step(x, None)]

    set_mesh(make_mesh('', jax.devices()[:1]))
    m1 = MADE(G(0))
    ref = [m1.train_step(x, None), m1.train_step(x, None)]
    set_mesh(make_mesh('', jax.devices()))
    for a, b in zip(met, ref):
        np.testing.assert_allclose(
            float(a['nlogp']), float(b['nlogp']), rtol=1e-4
        )


def test_fsdp_composes_with_tp_rules():
    """A TP-ruled leaf keeps its 'model' dim and gains 'data' on the largest
    remaining divisible dim (Megatron-TP x FSDP, 2-D sharded); small leaves
    stay replicated; non-divisible dims are skipped."""
    from generative_models_tpu.models.pixel_transformer import (
        transformer_tp_rules,
    )
    from generative_models_tpu.parallel import fsdp_place

    mesh = make_mesh('data:4,model:2', jax.devices())
    tree = {
        'block0': {
            'fc1': {'kernel': jnp.zeros((64, 256)), 'bias': jnp.zeros((256,))},
            'ln': {'scale': jnp.zeros((64,))},
        }
    }
    placed = fsdp_place(tree, transformer_tp_rules(), mesh=mesh, min_size=1)
    fc1 = tuple(placed['block0']['fc1']['kernel'].sharding.spec)
    assert fc1 == ('data', 'model'), fc1
    # bias: TP rule shards dim 0 over 'model'; 256 % 4 == 0 would allow
    # 'data' too, but the dim is taken -> stays ('model',)
    b = tuple(placed['block0']['fc1']['bias'].sharding.spec)
    assert b == ('model',), b
    # unruled 1-D leaf, 64 % 4 == 0, min_size=1 -> data-sharded
    sc = tuple(placed['block0']['ln']['scale'].sharding.spec)
    assert sc == ('data',), sc
    # default min_size: small leaves replicated
    placed2 = fsdp_place(tree, (), mesh=mesh)
    assert tuple(placed2['block0']['ln']['scale'].sharding.spec) == ()


def test_fsdp_epoch_scan_matches_single_device():
    """--fsdp through the DEFAULT harness path (--jit_epoch: whole epoch as
    one lax.scan inside jit) — sharded params + moments must survive the
    scan carry and reproduce single-device numerics."""
    from generative_models_tpu.models.made import MADE
    from generative_models_tpu.utils.config import global_defaults

    def G(fsdp):
        g = global_defaults()
        g.bs = 16
        g.hidden_size = 128
        g.fsdp = fsdp
        return g

    rng = np.random.RandomState(5)
    bx = jnp.asarray((rng.rand(4, 16, 28, 28, 1) > 0.5).astype(np.float32))
    by = jnp.zeros((4, 16), jnp.int32)
    set_mesh(make_mesh('', jax.devices()))
    met = MADE(G(1)).train_epoch(bx, by)
    set_mesh(make_mesh('', jax.devices()[:1]))
    ref = MADE(G(0)).train_epoch(bx, by)
    set_mesh(make_mesh('', jax.devices()))
    np.testing.assert_allclose(
        float(met['nlogp']), float(ref['nlogp']), rtol=1e-4
    )


def test_dp_x_seq_transformer_matches_single_device():
    """Composed data:2 x seq:4 mesh: batch shards over 'data' THROUGH the
    ring shard_map (its specs map B over 'data' — a replicated-B spec
    forces an involuntary all-gather at the boundary), sequence over the
    ring. One train step must reproduce single-device numerics."""
    from generative_models_tpu.models.pixel_transformer import PixelTransformer

    x = jnp.asarray(
        (np.random.RandomState(6).rand(4, 28, 28, 1) > 0.5).astype(np.float32)
    )
    set_mesh(make_mesh('data:2,seq:4', jax.devices()))
    m_sp = PixelTransformer(_tp_G({'n_embed': 32, 'n_layer': 1, 'n_head': 4}))
    assert m_sp.net.use_ring
    met_sp = m_sp.train_step(x, None)
    set_mesh(make_mesh('', jax.devices()[:1]))
    m_1 = PixelTransformer(_tp_G({'n_embed': 32, 'n_layer': 1, 'n_head': 4}))
    met_1 = m_1.train_step(x, None)
    set_mesh(make_mesh('', jax.devices()))
    np.testing.assert_allclose(
        float(met_sp['nlogp']), float(met_1['nlogp']), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(m_sp.params),
        jax.tree_util.tree_leaves(m_1.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_tp_x_seq_transformer_matches_single_device():
    """Composed model:2 x seq:4 mesh: Megatron TP shards the QKV heads over
    'model' (the ring specs map H over it) while the ring shards T. One
    train step must reproduce single-device numerics."""
    from generative_models_tpu.models.pixel_transformer import PixelTransformer

    x = jnp.asarray(
        (np.random.RandomState(7).rand(4, 28, 28, 1) > 0.5).astype(np.float32)
    )
    set_mesh(make_mesh('model:2,seq:4', jax.devices()))
    m_sp = PixelTransformer(_tp_G({'n_embed': 32, 'n_layer': 1, 'n_head': 4}))
    assert m_sp.net.use_ring
    met_sp = m_sp.train_step(x, None)
    set_mesh(make_mesh('', jax.devices()[:1]))
    m_1 = PixelTransformer(_tp_G({'n_embed': 32, 'n_layer': 1, 'n_head': 4}))
    met_1 = m_1.train_step(x, None)
    set_mesh(make_mesh('', jax.devices()))
    np.testing.assert_allclose(
        float(met_sp['nlogp']), float(met_1['nlogp']), rtol=1e-4
    )
