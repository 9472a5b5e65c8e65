"""Analytic FLOPs-per-train-step for every zoo model at the reference
workload (bs=64, default sizes), via XLA's HLO cost analysis on the lowered
train step. Backend-independent (shapes fix the FLOPs), so this runs on the
CPU backend and bench.py combines it with measured TPU step times into MFU.

Run:  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/compute_flops.py
Writes model_flops.json at the repo root.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BS = 64


def main():
    from generative_models_tpu.utils import discover_models
    from generative_models_tpu.utils.config import parse_args

    rng = np.random.RandomState(0)
    xb = jnp.asarray((rng.rand(BS, 28, 28, 1) > 0.5), jnp.float32)
    xs = jnp.asarray(rng.randn(BS, 28, 28, 1), jnp.float32)
    y = jnp.asarray(rng.randint(0, 10, BS), jnp.int32)

    out = {}

    # XLA's HLO cost analysis counts a while/scan body ONCE, not x trip
    # count, so the scan-over-784-pixels LSTM must be counted analytically:
    # fwd = T*B * 2*(in+hidden)*4*hidden  (fused gate matmul), train ~= 3x fwd
    T, B, IN, HID = 784, BS, 3, 256
    out['rnn'] = {
        'flops_per_step': float(3 * T * B * 2 * (IN + HID) * 4 * HID),
        'bs': BS,
        'note': 'analytic (scan body undercounted by HLO cost analysis)',
    }

    for name in sorted(discover_models()):
        if name in out:
            continue
        try:
            G, Model = parse_args(
                [f'--model={name}', f'--bs={BS}', '--logdir=/tmp/flops_logs'],
                discover_models=discover_models,
            )
            model = Model(G=G)
            x = xb if G.binarize else xs
            lowered = jax.jit(model.train_step_fn).lower(model.state, x, y)
            cost = lowered.cost_analysis()
            if cost is None:
                # some lowerings only expose cost analysis post-compile
                cost = lowered.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            out[name] = {'flops_per_step': float(cost['flops']), 'bs': BS}
            print(f'{name}: {out[name]["flops_per_step"]:.3e} flops/step')
        except Exception as e:  # keep going; a missing model shows as absent
            print(f'{name}: FAILED {e!r}')

    path = Path(__file__).parent.parent / 'model_flops.json'
    path.write_text(json.dumps(out, indent=2))
    print('wrote', path)


if __name__ == '__main__':
    main()
