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


def test_pipeline_apply_matches_sequential():
    """GPipe engine (parallel/pipeline.py): an 8-layer MLP stack run as 4
    pipeline stages must match the sequential scan bit-for-bit forward and
    to float tolerance in grads (params AND input cotangents route back
    through the ppermute/psum transposes)."""
    from generative_models_tpu.parallel import pipeline_apply

    S, L = 4, 8
    mesh = make_mesh('pipe:4', jax.devices()[:S])
    rng = np.random.RandomState(0)
    W = jnp.asarray(rng.randn(L, 16, 16) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(L, 16) * 0.1, jnp.float32)
    x = jnp.asarray(rng.randn(32, 16), jnp.float32)

    def layer(h, wb):
        w, bb = wb
        return jax.nn.gelu(h @ w + bb), None

    def seq_fwd(W, b, x):
        return jax.lax.scan(layer, x, (W, b))[0]

    def stage_fn(p, h):
        return jax.lax.scan(layer, h, (p['w'], p['b']))[0]

    grouped = {
        'w': W.reshape(S, L // S, 16, 16), 'b': b.reshape(S, L // S, 16)
    }
    out = jax.jit(
        lambda g, x: pipeline_apply(stage_fn, g, x, mesh=mesh)
    )(grouped, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(seq_fwd(W, b, x)), rtol=1e-6, atol=1e-6
    )

    def loss_pipe(g, x):
        return (pipeline_apply(stage_fn, g, x, mesh=mesh) ** 2).sum()

    def loss_seq(W, b, x):
        return (seq_fwd(W, b, x) ** 2).sum()

    gp, gx_p = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(grouped, x)
    gW, gb, gx_s = jax.grad(loss_seq, argnums=(0, 1, 2))(W, b, x)
    np.testing.assert_allclose(
        np.asarray(gp['w']).reshape(L, 16, 16), np.asarray(gW),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(gp['b']).reshape(L, 16), np.asarray(gb),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(gx_p), np.asarray(gx_s), rtol=1e-5, atol=1e-5
    )


def _pipe_transformer(mesh_spec, ndev, x, steps=2, sample=False):
    from generative_models_tpu.models.pixel_transformer import PixelTransformer

    set_mesh(make_mesh(mesh_spec, jax.devices()[:ndev]))
    m = PixelTransformer(_tp_G({'n_embed': 32, 'n_layer': 4, 'n_head': 4}))
    assert m.net.use_pipe, f'{mesh_spec} should enable the pipelined stack'
    losses = [float(m.train_step(x, None)['nlogp']) for _ in range(steps)]
    samp = None
    if sample:
        samp = np.asarray(m.sample_images(4))
    specs = [
        getattr(leaf.sharding, 'spec', None)
        for leaf in jax.tree_util.tree_leaves(m.state.params)
    ]
    n_pipe = sum(1 for s in specs if s is not None and 'pipe' in tuple(s))
    return losses, samp, n_pipe


def test_pipeline_parallel_transformer_matches_one_stage():
    """--mesh=pipe:4 stores the Block stack stacked-and-sharded over 'pipe'
    (each stage holds 1/4 of the layers + their Adam moments) and trains
    through the GPipe schedule; losses and samples must match the pipe:1
    run (same stacked init, S=1 schedule == sequential scan)."""
    x = jnp.asarray(
        (np.random.RandomState(5).rand(8, 28, 28, 1) > 0.5).astype(np.float32)
    )
    l4, s4, n_pipe4 = _pipe_transformer('pipe:4', 4, x, sample=True)
    l1, s1, _ = _pipe_transformer('pipe:1', 1, x, sample=True)
    set_mesh(make_mesh('', jax.devices()))
    assert n_pipe4 > 0, 'no param leaf actually sharded over pipe'
    np.testing.assert_allclose(l4, l1, rtol=1e-4)
    np.testing.assert_array_equal(s4, s1)


def test_pipeline_composes_with_data_axis():
    """data:2,pipe:2 — dp and pp from one mesh; partial-manual shard_map
    keeps the batch sharded over 'data' while 'pipe' runs the schedule."""
    x = jnp.asarray(
        (np.random.RandomState(5).rand(8, 28, 28, 1) > 0.5).astype(np.float32)
    )
    l22, _, n_pipe = _pipe_transformer('data:2,pipe:2', 4, x)
    l1, _, _ = _pipe_transformer('pipe:1', 1, x)
    set_mesh(make_mesh('', jax.devices()))
    assert n_pipe > 0
    np.testing.assert_allclose(l22, l1, rtol=1e-4)


def test_pipeline_composes_with_data_and_model_axes():
    """data:2,pipe:2,model:2 — dp x pp x tp from ONE mesh on 8 devices: the
    batch shards over 'data', the stacked Block params shard over 'pipe'
    (GPipe schedule, manual axis) AND over 'model' (Megatron TP inside each
    stage, GSPMD auto axis, ('pipe', None, 'model') rules). Training must
    match the single-device one-stage run."""
    x = jnp.asarray(
        (np.random.RandomState(5).rand(8, 28, 28, 1) > 0.5).astype(np.float32)
    )
    l3d, _, n_pipe = _pipe_transformer('data:2,pipe:2,model:2', 8, x)
    l1, _, _ = _pipe_transformer('pipe:1', 1, x)
    set_mesh(make_mesh('', jax.devices()))
    assert n_pipe > 0
    np.testing.assert_allclose(l3d, l1, rtol=1e-4)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    # restore the default mesh for any later tests
    set_mesh(make_mesh('', jax.devices()))


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
