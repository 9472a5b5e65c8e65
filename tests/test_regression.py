"""Seeded loss-curve regression (SURVEY.md §4): mean loss over a fixed
20-step epoch at seed 0 must match recorded golden values (CPU backend,
threefry RNG — deterministic). Catches silent numeric drift in losses,
optimizers, or RNG threading that the smoke tests can't see."""

import jax.numpy as jnp
import numpy as np
import pytest

from generative_models_tpu.utils.config import global_defaults

GOLDEN = {
    'made': 0.6932026743888855,
    'vae': 0.7946367263793945,
    'diffusion': 49.48776626586914,
}


def make_G(Model, **kw):
    G = global_defaults()
    G.bs = 16
    G.hidden_size = 32
    for k, v in Model.DG.items():
        G[k] = v
    for k, v in kw.items():
        G[k] = v
    G.hidden_size = kw.get('hidden_size', 32)
    return G


@pytest.fixture(scope='module')
def batches():
    rng = np.random.RandomState(0)
    xb = jnp.asarray((rng.rand(20, 16, 28, 28, 1) > 0.5).astype(np.float32))
    xs = jnp.asarray(rng.randn(20, 16, 28, 28, 1).astype(np.float32))
    yb = jnp.asarray(rng.randint(0, 10, (20, 16)), np.int32)
    return xb, xs, yb


def test_made_loss_curve(batches):
    from generative_models_tpu.models.made import MADE

    xb, _, yb = batches
    m = MADE(make_G(MADE, hidden_size=64))
    mets = m.train_epoch(xb, yb)
    np.testing.assert_allclose(float(mets['nlogp']), GOLDEN['made'], rtol=2e-3)


def test_vae_loss_curve(batches):
    from generative_models_tpu.models.vae import VAE

    xb, _, yb = batches
    v = VAE(make_G(VAE))
    mets = v.train_epoch(xb, yb)
    np.testing.assert_allclose(float(mets['vae_loss']), GOLDEN['vae'], rtol=2e-3)


def test_diffusion_loss_curve(batches):
    from generative_models_tpu.models.diffusion.model import DiffusionModel

    _, xs, yb = batches
    d = DiffusionModel(
        make_G(DiffusionModel, timesteps=4, bf16=0, class_cond=1)
    )
    mets = d.train_epoch(xs, yb)
    np.testing.assert_allclose(
        float(mets['loss']), GOLDEN['diffusion'], rtol=5e-3
    )
