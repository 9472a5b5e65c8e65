"""Measure 64-image sampling latency for each progressive-distillation stage.

Loads every stage checkpoint under LOGROOT (its hps.yaml pins the stage's
timestep count) and times the serving-path sample (no-history lax.scan
chain, cond_w=0.5) on the real chip. Appends a `sample_latency` section to
DISTILL.json: the payoff of the chain is this curve — 256-step teacher
latency down to a 1-step student.

Usage: python scripts/distill_latency.py [LOGROOT] [DISTILL.json]
"""

import json
import sys
import time
from pathlib import Path

import jax


def time_stage(logdir, n=64, reps=5):
    from generative_models_tpu.main import load_model_and_data

    model, _, _, _, G = load_model_and_data(
        [f'--weights_from={logdir}/model.pt', '--eval_heavy=0']
    )
    y = -1 * jax.numpy.ones((n,), jax.numpy.int32)
    out = model.sample(n, y)  # compile + warm
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.time()
    for _ in range(reps):
        out = model.sample(n, y)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.time() - t0) / reps
    return {'timesteps': int(G.timesteps), 'sample64_sec': dt,
            'imgs_per_sec': n / dt}


def main():
    root = Path(sys.argv[1] if len(sys.argv) > 1 else 'logs/distillation')
    out_path = Path(sys.argv[2] if len(sys.argv) > 2 else 'DISTILL.json')
    stages = ['teacher', 'step1'] + [
        f'step2_{n}' for n in [128, 64, 32, 16, 8, 4, 2, 1]
    ]
    result = json.loads(out_path.read_text()) if out_path.exists() else {}
    lat = {}
    for stage in stages:
        d = root / stage
        if not (d / 'model.pt').exists():
            continue
        lat[stage] = time_stage(d)
        print(stage, json.dumps(lat[stage]))
    result['sample_latency'] = lat
    out_path.write_text(json.dumps(result, indent=1))
    print('wrote', out_path)


if __name__ == '__main__':
    main()
