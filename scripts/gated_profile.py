"""Ablation timing for the gated_pixel_cnn train step (VERDICT r3 item 2b).

Times the jitted train epoch (bench.py estimator: min-of-trials over a
30-step scan) for the real net and for surgically ablated variants, so each
component's cost shows up as a timing delta rather than a guess:

  full        — the shipped GatedPixelCNNNet
  no_ln       — StackLayerNorms replaced by identity
  no_gate     — tanh*sigmoid gates replaced by a [:F] slice
  no_link     — v->h 1x1 link removed
  no_out1x1   — per-layer output 1x1 removed
  no_hconv    — horizontal-stack conv removed (link only)

Run on chip: PYTHONPATH=/root/repo python scripts/gated_profile.py
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
    from generative_models_tpu.models import gated_pixel_cnn as g
    from generative_models_tpu.models.gated_pixel_cnn import GatedPixelCNN
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.bs = BS
    for k, v in GatedPixelCNN.DG.items():
        G[k] = v
    np.random.seed(0)

    if ablate == 'bf16':
        G.bf16 = 1
    elif ablate == 'no_ln':
        g.StackLayerNorm.__call__ = lambda self, vx, hx: (vx, hx)
    elif ablate == 'no_gate':
        g.GatedConv2d._gate = staticmethod(
            lambda x: x[..., : x.shape[-1] // 2]
        )
    elif ablate == 'no_link':
        def call_no_link(self, vx, hx):
            k = self.kernel_size
            p = k // 2
            conv = lambda inp, ker, pad: jax.lax.conv_general_dilated(
                inp, ker, (1, 1), pad,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            )
            end = p + 1 if self.mask_type == 'B' else p
            vx_out = conv(vx, self.v_kernel[: p + 1], [(p, 0), (p, p)])
            hx_new = conv(hx, self.h_kernel[:, :end], [(0, 0), (p, end - p - 1)])
            vx_out = self._gate(vx_out)
            hx_new = self._gate(hx_new)
            hx_new = self.out1x1(hx_new)
            return vx_out, hx + hx_new

        g.GatedConv2d.__call__ = call_no_link
    elif ablate == 'no_out1x1':
        def call_no_out(self, vx, hx):
            k = self.kernel_size
            p = k // 2
            conv = lambda inp, ker, pad: jax.lax.conv_general_dilated(
                inp, ker, (1, 1), pad,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            )
            end = p + 1 if self.mask_type == 'B' else p
            vx_out = conv(vx, self.v_kernel[: p + 1], [(p, 0), (p, p)])
            hx_new = conv(hx, self.h_kernel[:, :end], [(0, 0), (p, end - p - 1)])
            hx_new = hx_new + self.link(g.down_shift(vx_out))
            vx_out = self._gate(vx_out)
            hx_new = self._gate(hx_new)
            return vx_out, hx + hx_new

        g.GatedConv2d.__call__ = call_no_out
    elif ablate == 'no_hconv':
        def call_no_h(self, vx, hx):
            k = self.kernel_size
            p = k // 2
            conv = lambda inp, ker, pad: jax.lax.conv_general_dilated(
                inp, ker, (1, 1), pad,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            )
            vx_out = conv(vx, self.v_kernel[: p + 1], [(p, 0), (p, p)])
            hx_new = self.link(g.down_shift(vx_out))
            vx_out = self._gate(vx_out)
            hx_new = self._gate(hx_new)
            hx_new = self.out1x1(hx_new)
            return vx_out, hx + hx_new

        g.GatedConv2d.__call__ = call_no_h
    return GatedPixelCNN(G)


def main():
    import importlib

    rng = np.random.RandomState(0)
    bx = jnp.asarray((rng.rand(STEPS, BS, 28, 28, 1) > 0.5), jnp.float32)
    by = jnp.zeros((STEPS, BS), jnp.int32)
    results = {}
    for ab in [None, 'bf16', 'no_ln', 'no_gate', 'no_link', 'no_out1x1', 'no_hconv']:
        # fresh module state per ablation (monkeypatches are module-global)
        import generative_models_tpu.models.gated_pixel_cnn as g

        importlib.reload(g)
        m = make_model(ab)
        ms = time_epoch(m, bx, by)
        results[ab or 'full'] = ms
        print(f'{ab or "full":10s}: {ms:.3f} ms/step '
              f'(delta {results["full"] - ms:+.3f})', flush=True)


if __name__ == '__main__':
    main()
