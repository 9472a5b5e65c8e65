"""--remat (jax.checkpoint rematerialization): numerically a no-op, so
remat=1 must produce the SAME param tree, loss, and gradients as remat=0 —
it only changes what the backward keeps in HBM. The reference has no
equivalent (torch.utils.checkpoint is never used there); this is a
TPU-native memory/compute tradeoff knob (SURVEY.md §2.1's 'trade FLOPs for
memory' principle; measured HBM numbers in docs/PERF.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_models_tpu.utils import discover_models
from generative_models_tpu.utils.config import parse_args


def _build(model, remat, extra=()):
    G, Model = parse_args(
        [
            f'--model={model}',
            f'--remat={remat}',
            '--bs=8',
            '--logdir=/tmp/test_remat',
            *extra,
        ],
        discover_models=discover_models,
    )
    return Model(G=G)


def _tree_paths(params):
    return {
        jax.tree_util.keystr(kp)
        for kp, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    }


@pytest.mark.parametrize(
    'model,extra',
    [
        ('pixel_transformer', ('--n_layer=2', '--n_embed=32', '--n_head=2')),
        ('diffusion_model', ('--hidden_size=16', '--bf16=0')),
    ],
)
def test_remat_is_numerically_transparent(model, extra):
    m0 = _build(model, 0, extra)
    m1 = _build(model, 1, extra)
    # same param tree: a remat checkpoint loads into a non-remat run
    assert _tree_paths(m0.state.params) == _tree_paths(m1.state.params)

    x = jnp.asarray(
        (np.random.RandomState(0).rand(8, 28, 28, 1) > 0.5).astype(np.float32)
    )
    y = jnp.zeros((8,), jnp.int32) if model == 'diffusion_model' else None
    rng = jax.random.PRNGKey(3)
    # evaluate BOTH at m0's params so the comparison is apples-to-apples;
    # jitted like the real train path (eager multi-device grads hit an
    # XLA-CPU rendezvous flake unrelated to what's under test)
    l0, _ = jax.jit(lambda p: m0.loss(p, x, y, rng=rng))(m0.state.params)
    l1, _ = jax.jit(lambda p: m1.loss(p, x, y, rng=rng))(m0.state.params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)

    g0 = jax.jit(jax.grad(lambda p: m0.loss(p, x, y, rng=rng)[0]))(m0.state.params)
    g1 = jax.jit(jax.grad(lambda p: m1.loss(p, x, y, rng=rng)[0]))(m0.state.params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_remat_composes_with_pipe_mesh():
    """remat applies inside the GPipe stage scan (jax.checkpoint around the
    per-layer body) — train a step on a pipe:2 mesh and match the loss of
    the non-remat pipe run exactly."""
    from generative_models_tpu.parallel import mesh as pmesh

    extra = ('--n_layer=4', '--n_embed=32', '--n_head=2', '--mesh=pipe:2')
    x = jnp.asarray(
        (np.random.RandomState(1).rand(8, 28, 28, 1) > 0.5).astype(np.float32)
    )
    try:
        pmesh.set_mesh(pmesh.make_mesh('pipe:2', jax.devices()[:2]))
        m0 = _build('pixel_transformer', 0, extra)
        m1 = _build('pixel_transformer', 1, extra)
        assert m1.net.use_pipe and m1.net.remat
        l0 = float(m0.train_step(x, None)['nlogp'])
        l1 = float(m1.train_step(x, None)['nlogp'])
        np.testing.assert_allclose(l0, l1, rtol=1e-6)
    finally:
        pmesh.set_mesh(pmesh.make_mesh('', jax.devices()))
