"""Steady-state eval_heavy wall-clock A/B for the fast-sampler knobs
(VERDICT r3 item 4): within ONE process per config, run eval_heavy once to
compile, then time a second run — the number an actual training loop pays
per heavy eval after the first epoch. Cross-process dt/eval_heavy is
compile/cache-load-dominated and useless for this comparison (measured
29-90 s of pure warmup noise).

Writes eval_heavy_fast into EVAL.json: default ddim/250 vs
--eval_sampler=dpm2m --eval_sample_steps=25 on the same trained checkpoint,
with metric drift.

Run on chip: PYTHONPATH=/root/repo python scripts/evalfast_measure.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CKPT = 'logs/zoo50/diffusion_model/model.pt'


def run_config(extra_args):
    from generative_models_tpu.main import eval_heavy, load_model_and_data
    from generative_models_tpu.utils import make_logger

    model, dataset, autoencoder, classifier, G = load_model_and_data(
        [
            '--model=diffusion_model', '--epochs=0', '--eval_heavy=1',
            f'--weights_from={CKPT}', '--logdir=/tmp/evalfast_measure',
        ]
        + extra_args
    )
    logger = make_logger()
    t0 = time.perf_counter()
    eval_heavy(logger, model, dataset, autoencoder, classifier, G)
    warm = time.perf_counter() - t0
    logger = make_logger()
    t0 = time.perf_counter()
    eval_heavy(logger, model, dataset, autoencoder, classifier, G)
    steady = time.perf_counter() - t0
    out = {k.split('/')[-1]: round(float(v[0]), 5) for k, v in logger.items()}
    out['eval_heavy_warm_sec'] = round(warm, 2)
    out['eval_heavy_steady_sec'] = round(steady, 2)
    print(extra_args, json.dumps(out), flush=True)
    return out


def main():
    base = run_config([])
    fast = run_config(['--eval_sampler=dpm2m', '--eval_sample_steps=25'])
    drift = {
        k: round(fast[k] - base[k], 5)
        for k in base
        if k in fast and not k.startswith('eval_heavy')
    }
    section = {
        'description': (
            'Steady-state eval_heavy A/B (second call in-process; the first '
            'pays compile) over the SAME trained 50-epoch checkpoint '
            '(logs/zoo50/diffusion_model), >=500 samples each: '
            'reference-faithful default (250-step DDIM) vs --eval_sampler='
            'dpm2m --eval_sample_steps=25. Defaults keep the knobs OFF.'
        ),
        'default_ddim250': base,
        'dpm2m_25': fast,
        'drift_dpm2m25_minus_default': drift,
        'steady_speedup': round(
            base['eval_heavy_steady_sec'] / fast['eval_heavy_steady_sec'], 2
        ),
    }
    eval_path = Path(__file__).resolve().parent.parent / 'EVAL.json'
    data = json.loads(eval_path.read_text())
    data['eval_heavy_fast'] = section
    eval_path.write_text(json.dumps(data, indent=1))
    print('wrote eval_heavy_fast; steady', base['eval_heavy_steady_sec'],
          'vs', fast['eval_heavy_steady_sec'], 'sec')


if __name__ == '__main__':
    main()
