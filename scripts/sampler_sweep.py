"""FID-vs-steps sweep for the fast diffusion samplers, measured on chip.

Trains ONE 10-epoch --ema=0.999 diffusion run through the real CLI, then for
each (sampler, sample_steps) config reloads the checkpoint (--weights_from +
hps.yaml round-trip) and runs the full eval_heavy (>=500 samples, shipped
arbiters) plus a p50 64-grid sampling-latency measurement. Results land in
EVAL.json['fast_sampler_sweep'] — the measured quality/latency tradeoff
behind --sampler=dpm2m / --sample_steps (reference only ever samples with
chain length == timesteps, gms/diffusion/gaussian_diffusion.py:282-296).

Usage: python scripts/sampler_sweep.py [workdir] [--skip-train]
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
os.chdir(_REPO)  # EVAL.json and relative logdirs live at the repo root

CONFIGS = [
    ('ddim', 250),
    ('ddim', 50),
    ('ddim', 25),
    ('ddim', 10),
    ('dpm2m', 50),
    ('dpm2m', 25),
    ('dpm2m', 10),
    ('dpm2m', 5),
]

TRAIN_EPOCHS = 10


def measure_latency(model, n=64, reps=5):
    import jax

    y = -np.ones(n, np.int32)
    jax.block_until_ready(model.sample_images(n, y=y))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(model.sample_images(n, y=y))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith('--')]
    workdir = Path(argv[0] if argv else '/tmp/sampler_sweep')
    skip_train = '--skip-train' in sys.argv

    from generative_models_tpu.main import eval_heavy, load_model_and_data
    from generative_models_tpu.main import main as cli_main
    from generative_models_tpu.utils import make_logger

    train_dir = workdir / 'train'
    cache = str(workdir / 'xla_cache')
    if not skip_train:
        cli_main([
            '--model=diffusion_model', f'--epochs={TRAIN_EPOCHS}', '--bs=64',
            f'--save_n={TRAIN_EPOCHS}', '--eval_heavy=0', '--ema=0.999',
            f'--logdir={train_dir}', f'--compile_cache={cache}',
        ])

    sweep = {
        'description': (
            'Sampler/steps sweep over one 10-epoch --ema=0.999 checkpoint '
            '(same CLI, shipped arbiters, >=500 samples per eval_heavy). '
            'sample64_p50_sec = median jitted 64-grid latency, CF-guided '
            'default (w ~ U[0,4) per sample, two net calls per step). '
            'python -m generative_models_tpu.main --model=diffusion_model '
            f'--weights_from=<ckpt> --epochs=0 --eval_heavy=1 --ema=0.999 '
            '--sampler=S --sample_steps=N'
        ),
        'date': time.strftime('%Y-%m-%d'),
        'train_epochs': TRAIN_EPOCHS,
        'rows': [],
    }
    for sampler, steps in CONFIGS:
        t_cfg = time.time()
        model, dataset, autoencoder, classifier, G = load_model_and_data([
            '--model=diffusion_model',
            f'--weights_from={train_dir / "model.pt"}',
            '--epochs=0', '--eval_heavy=1', '--ema=0.999', '--bs=64',
            f'--sampler={sampler}', f'--sample_steps={steps}',
            f'--logdir={workdir / "eval"}', f'--compile_cache={cache}',
        ])
        logger = make_logger()
        eval_heavy(logger, model, dataset, autoencoder, classifier, G)
        row = {
            k.split('/', 1)[1]: round(float(np.mean(v)), 5)
            for k, v in logger.items()
            if k.startswith('eval/')
        }
        row['sampler'] = sampler
        row['sample_steps'] = steps
        row['sample64_p50_sec'] = round(measure_latency(model), 4)
        row['dt_config_sec'] = round(time.time() - t_cfg, 1)
        sweep['rows'].append(row)
        print('SWEEP ROW', json.dumps(row), flush=True)

    eval_path = Path('EVAL.json')
    doc = json.loads(eval_path.read_text()) if eval_path.exists() else {}
    doc['fast_sampler_sweep'] = sweep
    eval_path.write_text(json.dumps(doc, indent=1) + '\n')
    print('WROTE EVAL.json fast_sampler_sweep')


if __name__ == '__main__':
    main()
