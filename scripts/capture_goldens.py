"""Print seeded 20-step losses for the regression goldens in
tests/test_regression.py (run on the CPU backend, same env as the tests):

  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/capture_goldens.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# the SAME config builder the regression tests use — a drifting local copy
# would re-capture goldens under a different G than the tests run
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tests'))
from test_regression import make_G  # noqa: E402


def main():
    rng = np.random.RandomState(0)
    xb = jnp.asarray((rng.rand(20, 16, 28, 28, 1) > 0.5).astype(np.float32))
    xs = jnp.asarray(rng.randn(20, 16, 28, 28, 1).astype(np.float32))
    yb = jnp.asarray(rng.randint(0, 10, (20, 16)), np.int32)

    from generative_models_tpu.models.gan import GAN
    from generative_models_tpu.models.vqvae import VQVAE

    g = GAN(make_G(GAN))
    mets = g.train_epoch(xs, yb)
    print('gan:', {k: float(v) for k, v in mets.items()})

    v = VQVAE(make_G(VQVAE, vqD=16, vqK=16, n_embed=32, n_head=4, n_layer=1))
    mets = v.train_epoch(xb, yb)
    print('vqvae:', {k: float(v) for k, v in mets.items()})


if __name__ == '__main__':
    main()
