"""GPipe pipeline-parallelism tests + the driver dryrun entrypoint, on the
virtual 8-device CPU backend (split from tests/test_parallel.py so each
file stays well inside a 10-minute single-core pytest window)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_models_tpu.parallel import make_mesh, set_mesh


def _tp_G(extra=None):
    from generative_models_tpu.utils.config import global_defaults

    g = global_defaults()
    g.bs = 8
    g.hidden_size = 32
    for k, v in (extra or {}).items():
        g[k] = v
    return g

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


def test_pick_n_micro_searches_past_n_stages():
    """batch=6, S=4: M=6 divides the batch and beats M=3 on bubble
    fraction (33% vs 50%) — the fallback must search up to 4S, not S."""
    from generative_models_tpu.parallel.pipeline import pick_n_micro

    assert pick_n_micro(6, 4) == 6
    assert pick_n_micro(64, 4) == 16
    assert pick_n_micro(7, 4) == 7
