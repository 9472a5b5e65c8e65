"""A/B the MADE premasked-weights train step on chip (VERDICT r3 item 2a).

Measures steady-state ms/step of the jitted-epoch path (same estimator as
bench.py: min-of-trials over a 30-step lax.scan epoch) for:
  premasked=1  — masks live in the weights; plain matmuls, grads masked
  premasked=0  — fold-the-mask path (mask*W materialized per use)
and cross-checks the two paths produce identical losses on the same batch
stream (the invariant the premasked design rests on).

Run on chip: PYTHONPATH=/root/repo python scripts/made_ab.py
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


def make_model(premasked, hidden=1024):
    from generative_models_tpu.models.made import MADE
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.bs = BS
    G.hidden_size = hidden
    G.premasked = premasked
    np.random.seed(0)
    return MADE(G)


def time_epoch(model, bx, by):
    _fetch(model.train_epoch(bx, by))  # compile + warm
    best = float('inf')
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        _fetch(model.train_epoch(bx, by))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3  # ms/step


def main():
    rng = np.random.RandomState(0)
    bx = jnp.asarray((rng.rand(STEPS, BS, 28, 28, 1) > 0.5), jnp.float32)
    by = jnp.zeros((STEPS, BS), jnp.int32)

    m1 = make_model(1)
    m0 = make_model(0)
    # numerics invariant: identical losses through a full epoch
    l1 = m1.train_epoch(bx, by)
    l0 = m0.train_epoch(bx, by)
    d = abs(float(l1['nlogp']) - float(l0['nlogp']))
    print(f'epoch-mean nlogp: premasked={float(l1["nlogp"]):.6f} '
          f'folded={float(l0["nlogp"]):.6f} |diff|={d:.2e}')
    assert d < 1e-4, 'premasked path diverged from fold-the-mask path'

    ms1 = time_epoch(make_model(1), bx, by)
    ms0 = time_epoch(make_model(0), bx, by)
    print(f'made bs={BS}: premasked {ms1:.3f} ms/step vs folded {ms0:.3f} '
          f'ms/step ({ms0 / ms1:.2f}x)')

    for hidden in (2048,):
        ms1 = time_epoch(make_model(1, hidden), bx, by)
        ms0 = time_epoch(make_model(0, hidden), bx, by)
        print(f'made hidden={hidden}: premasked {ms1:.3f} vs folded '
              f'{ms0:.3f} ms/step ({ms0 / ms1:.2f}x)')


if __name__ == '__main__':
    main()
