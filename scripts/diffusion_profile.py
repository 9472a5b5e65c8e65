"""Ablation timing for the diffusion train step (VERDICT r3 item 10:
probe the last MFU headroom, 0.68).

Times the jitted 30-step train epoch (bench.py estimator) for the real
SimpleUnet and for ablated variants, isolating the top non-matmul costs:

  full       — shipped UNet (bf16)
  no_gn      — GroupNorms replaced by identity
  no_silu    — SiLU replaced by identity
  no_emb     — per-ResBlock emb Dense+add removed
  f32        — bf16 off (the AMP win, for scale)

Run on chip: PYTHONPATH=/root/repo python scripts/diffusion_profile.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

BS = 64
STEPS = 30
TRIALS = 3


def _fetch(out):
    """Hard barrier: pull real values to host (block_until_ready is NOT a
    reliable barrier on the remote 'axon' platform — same workaround as
    bench.py)."""
    return jax.device_get(
        jax.tree_util.tree_map(lambda a: a.sum() if hasattr(a, 'sum') else a, out)
    )


def time_epoch(model, bx, by):
    _fetch(model.train_epoch(bx, by))
    best = float('inf')
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        _fetch(model.train_epoch(bx, by))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3


def make_model(ablate=None):
    import importlib

    import flax.linen as nn

    import generative_models_tpu.models.diffusion.unet as u

    importlib.reload(u)
    import generative_models_tpu.models.diffusion.model as dm

    importlib.reload(dm)

    if ablate == 'no_gn':
        class _IdGN(nn.Module):
            num_groups: int = 32
            dtype: object = None

            @nn.compact
            def __call__(self, x):
                return x

        u.nn = type(sys)('nn_patched')
        u.nn.__dict__.update(nn.__dict__)
        u.nn.GroupNorm = _IdGN
    elif ablate == 'no_silu':
        u.nn = type(sys)('nn_patched')
        u.nn.__dict__.update(nn.__dict__)
        u.nn.silu = lambda x: x
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.bs = BS
    for k, v in dm.DiffusionModel.DG.items():
        G[k] = v
    if ablate == 'f32':
        G.bf16 = 0
    np.random.seed(0)
    return dm.DiffusionModel(G)


def main():
    rng = np.random.RandomState(0)
    bx = jnp.asarray(rng.randn(STEPS, BS, 28, 28, 1), jnp.float32)
    by = jnp.asarray(rng.randint(0, 10, (STEPS, BS)), jnp.int32)
    results = {}
    for ab in [None, 'no_gn', 'no_silu', 'f32']:
        m = make_model(ab)
        ms = time_epoch(m, bx, by)
        results[ab or 'full'] = ms
        print(f'{ab or "full":8s}: {ms:.3f} ms/step '
              f'(delta {ms - results["full"]:+.3f})', flush=True)


if __name__ == '__main__':
    main()
