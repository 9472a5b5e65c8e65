"""Trainer knobs on the GM base optimizer (models/base.py::make_optimizer):
--grad_clip, --grad_accum, --lr_scheduler=cosine/--warmup_steps. The
reference declares lr_scheduler on its diffusion model but never reads it
(ref gms/diffusion/diffusion_model.py:29); here the flag is functional for
every model, plus clipping/accumulation the reference lacks entirely.
"""

import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.utils import discover_models
from generative_models_tpu.utils.config import parse_args


def _build(extra=()):
    G, Model = parse_args(
        [
            '--model=made', '--bs=16', '--hidden_size=32',
            '--logdir=/tmp/test_knobs', *extra,
        ],
        discover_models=discover_models,
    )
    return Model(G=G)


def _x(seed=0, n=16):
    return jnp.asarray(
        (np.random.RandomState(seed).rand(n, 28, 28, 1) > 0.5).astype(np.float32)
    )


def test_cosine_schedule_hand_values():
    """The schedule fn itself: 0 at step 0, peak lr at warmup end, ~0 at the
    decay horizon, cos midpoint halfway through."""
    m = _build(
        ('--lr_scheduler=cosine', '--warmup_steps=10', '--lr_decay_steps=100')
    )
    s = m.lr_schedule()
    lr = m.G.lr
    np.testing.assert_allclose(float(s(0)), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(s(10)), lr, rtol=1e-6)
    np.testing.assert_allclose(float(s(110)), 0.0, atol=lr * 1e-3)
    # halfway through the cosine: lr * (1 + cos(pi/2)) / 2 = lr / 2
    np.testing.assert_allclose(float(s(60)), lr / 2, rtol=1e-5)


def test_warmup_only_schedule():
    m = _build(('--warmup_steps=4',))
    s = m.lr_schedule()
    np.testing.assert_allclose(float(s(0)), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(s(2)), m.G.lr / 2, rtol=1e-6)
    np.testing.assert_allclose(float(s(4)), m.G.lr, rtol=1e-6)
    np.testing.assert_allclose(float(s(400)), m.G.lr, rtol=1e-6)  # constant after


def test_grad_accum_updates_every_k_steps():
    """--grad_accum=2: after the 1st micro-step params are UNCHANGED; after
    the 2nd they equal a single no-accum Adam step on the same batch (two
    identical micro-batches average to the same gradient)."""
    x = _x()
    m = _build(('--grad_accum=2',))
    p0 = jax.tree_util.tree_map(np.asarray, m.state.params)
    m.train_step(x, None)
    p1 = jax.tree_util.tree_map(np.asarray, m.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(a, b)
    m.train_step(x, None)
    p2 = m.state.params

    m_ref = _build()
    m_ref.train_step(x, None)
    for a, b in zip(
        jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(m_ref.state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_grad_clip_wiring():
    """A huge clip threshold is a no-op (params match the unclipped run); a
    tiny one changes the update (proves the transform is really in the
    chain, not just parsed)."""
    x = _x(1)
    runs = {}
    for tag, extra in (
        ('off', ()), ('huge', ('--grad_clip=1e9',)), ('tiny', ('--grad_clip=1e-9',)),
    ):
        m = _build(extra)
        m.train_step(x, None)
        runs[tag] = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, m.state.params)
        )
    for a, b in zip(runs['off'], runs['huge']):
        np.testing.assert_allclose(a, b, atol=1e-7)
    assert any(
        np.abs(a - b).max() > 1e-6 for a, b in zip(runs['off'], runs['tiny'])
    ), 'tiny grad_clip did not change the update'


def test_knobs_roundtrip_through_hps_yaml():
    """The knobs ride the standard config round-trip (hps.yaml), so resumed
    runs keep their schedule/clipping."""
    import yaml

    from generative_models_tpu.utils.config import dump_hps

    m = _build(
        ('--lr_scheduler=cosine', '--warmup_steps=5', '--lr_decay_steps=50',
         '--grad_clip=0.5')
    )
    dump_hps(m.G, '/tmp/test_knobs_rt')
    loaded = yaml.safe_load(open('/tmp/test_knobs_rt/hps.yaml'))
    assert loaded['lr_scheduler'] == 'cosine'
    assert loaded['warmup_steps'] == 5
    assert loaded['lr_decay_steps'] == 50
    assert loaded['grad_clip'] == 0.5
