"""Fold the eval_heavy fast-sampler A/B (scripts/round4_chip.sh: two
--epochs=0 eval_heavy runs over the same trained diffusion checkpoint, one
default 250-step DDIM, one --eval_sampler=dpm2m --eval_sample_steps=25)
into EVAL.json as 'eval_heavy_fast' (VERDICT r3 item 4).

Usage: python scripts/collect_evalfast.py [logs/evalfast] [EVAL.json]
"""

import json
import sys
from pathlib import Path

from tensorboard.backend.event_processing.event_accumulator import (
    EventAccumulator,
)

KEYS = [
    'eval/fid', 'eval/ignite_fid', 'eval/precision', 'eval/recall',
    'eval/f1', 'eval/cond_fid', 'eval/classifier_loss', 'dt/eval_heavy',
]


def read_run(logdir):
    acc = EventAccumulator(str(logdir), size_guidance={'scalars': 0})
    acc.Reload()
    tags = acc.Tags().get('scalars', [])
    out = {}
    for key in KEYS:
        if key in tags:
            events = acc.Scalars(key)
            if events:
                out[key.split('/', 1)[-1]] = round(events[-1].value, 5)
    return out


def main():
    root = Path(sys.argv[1] if len(sys.argv) > 1 else 'logs/evalfast')
    eval_path = Path(sys.argv[2] if len(sys.argv) > 2 else 'EVAL.json')
    base = read_run(root / 'base')
    fast = read_run(root / 'dpm2m25')
    assert base and fast, f'missing runs under {root}'
    drift = {
        k: round(fast[k] - base[k], 5)
        for k in base
        if k in fast and k != 'eval_heavy'
    }
    section = {
        'description': (
            'eval_heavy wall-clock and metric drift with the fast-sampler '
            'knobs (--eval_sampler=dpm2m --eval_sample_steps=25) vs the '
            'reference-faithful default (250-step DDIM), both --epochs=0 '
            'runs over the same trained checkpoint '
            '(logs/zoo50/diffusion_model), >=500 samples each. Defaults '
            'keep the knobs OFF; this row documents the measured tradeoff.'
        ),
        'default_ddim250': base,
        'dpm2m_25': fast,
        'drift_dpm2m25_minus_default': drift,
        'speedup': round(
            base.get('eval_heavy', 0) / max(fast.get('eval_heavy', 1e-9), 1e-9),
            2,
        ),
    }
    data = json.loads(eval_path.read_text())
    data['eval_heavy_fast'] = section
    eval_path.write_text(json.dumps(data, indent=1))
    print(json.dumps(section, indent=1))


if __name__ == '__main__':
    main()
