"""--ema on the diffusion model: an exponential moving average of the
params, updated every optimizer step, that SAMPLING reads while training
and the eval loss stay on the live params. The reference has no EMA
(gms/diffusion/diffusion_model.py keeps only the live weights); it is the
standard diffusion quality lever, so the framework ships it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.utils import discover_models
from generative_models_tpu.utils.config import parse_args


def _build(extra=()):
    G, Model = parse_args(
        [
            '--model=diffusion_model', '--bs=8', '--hidden_size=16',
            '--timesteps=4', '--bf16=0', '--logdir=/tmp/test_ema', *extra,
        ],
        discover_models=discover_models,
    )
    return Model(G=G)


def _batch(seed=0, n=8):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, 28, 28, 1), jnp.float32)
    y = jnp.asarray(rng.randint(0, 10, n), jnp.int32)
    return x, y


def test_ema_update_hand_math():
    """After one step, ema must equal d*init + (1-d)*new exactly."""
    d = 0.5
    m = _build((f'--ema={d}',))
    init = jax.device_get(m.state.params)
    x, y = _batch()
    m.train_step(x, y)
    new = jax.device_get(m.state.params)
    ema = jax.device_get(m.state.extra['ema'])
    expect = jax.tree_util.tree_map(lambda i, n: d * i + (1 - d) * n, init, new)
    for a, b in zip(
        jax.tree_util.tree_leaves(ema), jax.tree_util.tree_leaves(expect)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_sampling_reads_ema_not_live_params():
    """d=1.0 freezes the EMA at init, so after training the samples must
    equal a fresh (untrained) model's — and a trained no-EMA model's must
    not."""
    x, y = _batch(1)

    def samples(m):
        return np.asarray(
            m._jit_sample(m.state, 4, jnp.zeros((4,), jnp.int32), jax.random.key(7))
        )

    m_frozen = _build(('--ema=1.0',))
    for _ in range(3):
        m_frozen.train_step(x, y)
    m_fresh = _build(('--ema=1.0',))
    np.testing.assert_allclose(
        samples(m_frozen), samples(m_fresh), atol=1e-5
    )

    m_live = _build()
    for _ in range(3):
        m_live.train_step(x, y)
    assert np.abs(samples(m_live) - samples(m_fresh)).max() > 1e-4, (
        'training a no-EMA model should change its samples'
    )


def test_ema_survives_checkpoint_roundtrip():
    m = _build(('--ema=0.9',))
    x, y = _batch(2)
    m.train_step(x, y)
    path = '/tmp/test_ema_ckpt'
    m.save(path)
    m2 = _build(('--ema=0.9',))
    m2.load_weights(f'{path}/model.pt')
    for a, b in zip(
        jax.tree_util.tree_leaves(m.state.extra['ema']),
        jax.tree_util.tree_leaves(m2.state.extra['ema']),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
