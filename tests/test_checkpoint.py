"""Checkpoint backends: flax-bytes (default) and orbax full-train-state."""

import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.models.made import MADE
from generative_models_tpu.utils.config import global_defaults


def small_G(tmp_path, **kw):
    G = global_defaults()
    G.bs = 16
    G.hidden_size = 32
    G.logdir = tmp_path
    G.data_source = 'synthetic'
    for k, v in kw.items():
        G[k] = v
    return G


def _params_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_orbax_roundtrip(tmp_path):
    G = small_G(tmp_path, ckpt='orbax')
    m = MADE(G)
    x = jnp.asarray(
        (np.random.RandomState(0).rand(16, 28, 28, 1) > 0.5).astype(np.float32)
    )
    m.train_step(x, None)
    m.save(tmp_path)
    assert (tmp_path / 'orbax_state').exists()

    m2 = MADE(small_G(tmp_path, ckpt='orbax'))
    m2.load_weights(tmp_path)
    _params_equal(m.params, m2.params)
    assert int(m2.state.step) == 1  # optimizer/step restored too


def test_orbax_weights_from_model_pt_path(tmp_path):
    """--weights_from logdir/model.pt must find a sibling orbax checkpoint."""
    G = small_G(tmp_path, ckpt='orbax')
    m = MADE(G)
    m.save(tmp_path)
    m2 = MADE(small_G(tmp_path, ckpt='orbax'))
    m2.load_weights(tmp_path / 'model.pt')
    _params_equal(m.params, m2.params)
