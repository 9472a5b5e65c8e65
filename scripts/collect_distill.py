"""Collect the progressive-distillation chain's per-stage metrics into
DISTILL.json.

Walks LOGROOT (default logs/distillation) in chain order — teacher,
step1, step2_<N>... — and pulls the final logged values of the headline
scalars (eval/fid, eval/precision, eval/recall, loss) out of each stage's
TensorBoard event file. The chain itself is scripts/progressive_distillation.sh
(reference: gms/diffusion/progressive_distillation.sh).

Usage: python scripts/collect_distill.py [LOGROOT] [OUT.json]
"""

import json
import sys
from pathlib import Path

from tensorboard.backend.event_processing.event_accumulator import (
    EventAccumulator,
)

KEYS = [
    'eval/fid', 'eval/ignite_fid', 'eval/precision', 'eval/recall',
    'eval/f1', 'diffusion_model/test/loss', 'dt/eval', 'dt/train',
]


def stage_metrics(logdir):
    acc = EventAccumulator(str(logdir), size_guidance={'scalars': 0})
    acc.Reload()
    out = {}
    for key in KEYS:
        if key in acc.Tags().get('scalars', []):
            events = acc.Scalars(key)
            if events:
                out[key] = events[-1].value
    return out


def main():
    root = Path(sys.argv[1] if len(sys.argv) > 1 else 'logs/distillation')
    out_path = Path(sys.argv[2] if len(sys.argv) > 2 else 'DISTILL.json')
    stages = ['teacher', 'step1'] + [
        f'step2_{n}' for n in [128, 64, 32, 16, 8, 4, 2, 1]
    ]
    result = {'logroot': str(root), 'stages': {}}
    for stage in stages:
        d = root / stage
        if not (d / 'hps.yaml').exists():
            continue
        import yaml

        hps = yaml.safe_load((d / 'hps.yaml').read_text())
        m = stage_metrics(d)
        m['timesteps'] = hps.get('timesteps')
        m['epochs'] = hps.get('epochs')
        result['stages'][stage] = m
        print(stage, json.dumps(m))
    if not result['stages']:
        # never clobber a published artifact with an empty chain (e.g. a
        # LOGROOT typo or a chain that hasn't been trained yet)
        raise SystemExit(
            f'no chain stages found under {root} — refusing to overwrite '
            f'{out_path}'
        )
    out_path.write_text(json.dumps(result, indent=1))
    print('wrote', out_path)


if __name__ == '__main__':
    main()
