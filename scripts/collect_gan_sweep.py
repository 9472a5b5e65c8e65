"""Collect the GAN stabilizer sweep into RESULTS.json (VERDICT r4 item 5).

The sweep itself is run by scripts/gan_stabilizer_sweep.sh (50-epoch chip
runs under logs/gan_sweep/<name>); the reference-exact default and the TTUR
4x variant live in the zoo logroot (logs/zoo50/gan, logs/zoo50/gan_stab).
This collector pulls, for every variant: the stabilizer config (hps.yaml),
final + best FID, final precision/recall, and the collapse onset epoch
(first epoch whose mean train disc loss drops below 0.1 — the recorded
failure mode is the discriminator winning outright, disc loss -> 0 with gen
loss -> 10). Output lands in RESULTS.json['gan_sweep'] and renders into
docs/RESULTS.md via `make results-md` (scripts/render_results.py).

Usage: python scripts/collect_gan_sweep.py
"""

import json
import sys
from pathlib import Path

import yaml
from tensorboard.backend.event_processing.event_accumulator import (
    EventAccumulator,
)

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / 'RESULTS.json'

RUNS = {
    'default (reference-exact)': REPO / 'logs/zoo50/gan',
    # zoo50/gan_stab re-ran the winning disc_lr=1e-5 config (hps.yaml pins
    # it); its bit-identical FID vs 'slowdisc' doubles as a determinism check
    'gan_stab (zoo rerun of slowdisc)': REPO / 'logs/zoo50/gan_stab',
    'smooth': REPO / 'logs/gan_sweep/smooth',
    'slowdisc': REPO / 'logs/gan_sweep/slowdisc',
    'smooth_slow': REPO / 'logs/gan_sweep/smooth_slow',
    'sn_smooth': REPO / 'logs/gan_sweep/sn_smooth',
}

COLLAPSE_DISC_LOSS = 0.1  # disc effectively perfect => generator starved


def collapse_window(pairs, thr=COLLAPSE_DISC_LOSS):
    """(onset, end, recovered) of the first consecutive >=2-epoch streak
    with disc loss < thr in [(epoch, value), ...]; (None, None, None) if no
    such streak. A 1-epoch dip (slowdisc at epoch 8, round 4) is noise,
    not a collapse. `recovered` = the streak broke before the run ended —
    round 5's corrected-init default collapses at epoch 1 and ESCAPES at
    ~23, so onset alone no longer tells the story."""
    onset = end = None
    streak = []
    for step, value in pairs:
        if value < thr:
            streak.append(step)
        else:
            if len(streak) >= 2 and onset is None:
                onset, end = streak[0], streak[-1]
            streak = []
    if len(streak) >= 2 and onset is None:
        onset, end = streak[0], streak[-1]
    if onset is None:
        return None, None, None
    return onset, end, bool(end < pairs[-1][0])


def collect(logdir):
    acc = EventAccumulator(str(logdir), size_guidance={'scalars': 0})
    acc.Reload()
    tags = acc.Tags().get('scalars', [])
    out = {}
    hps = logdir / 'hps.yaml'
    if hps.exists():
        cfg = yaml.safe_load(hps.read_text())
        out['config'] = {
            k: cfg.get(k)
            for k in ('disc_lr', 'label_smooth', 'spectral_norm', 'lr')
        }
    if 'eval/fid' in tags:
        fids = acc.Scalars('eval/fid')
        out['fid_final'] = fids[-1].value
        trained = [e for e in fids if e.step > 0] or fids
        best = min(trained, key=lambda e: e.value)
        out['fid_best'] = best.value
        out['fid_best_epoch'] = best.step
    for key, name in (('eval/precision', 'precision'), ('eval/recall', 'recall')):
        if key in tags:
            out[name] = acc.Scalars(key)[-1].value
    if 'gan/train/disc/loss' in tags:
        dl = acc.Scalars('gan/train/disc/loss')
        out['disc_loss_final'] = dl[-1].value
        onset, end, recovered = collapse_window(
            [(e.step, e.value) for e in dl]
        )
        out['collapse_onset_epoch'] = onset
        out['collapse_end_epoch'] = end
        out['collapse_recovered'] = recovered
    if 'gan/train/gen/loss' in tags:
        out['gen_loss_final'] = acc.Scalars('gan/train/gen/loss')[-1].value
    return out


def main():
    sweep = {}
    for name, logdir in RUNS.items():
        if not logdir.exists():
            print(f'[skip] {name}: {logdir} missing', file=sys.stderr)
            continue
        sweep[name] = collect(logdir)
        print(f'{name}: {json.dumps(sweep[name])}')
    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    data['gan_sweep'] = {
        'description': '50-epoch GAN stabilizer sweep on the fallback '
            'dataset (scripts/gan_stabilizer_sweep.sh). collapse_onset_epoch '
            f'= first epoch with mean train disc loss < {COLLAPSE_DISC_LOSS} '
            '(discriminator winning outright; gen loss -> ~10 follows). '
            'null onset = never collapsed.',
        'collapse_onset_def': 'first consecutive >=2-epoch streak with mean '
            f'train disc loss < {COLLAPSE_DISC_LOSS} (onset..end); '
            'recovered = the streak broke before the run ended',
        'runs': sweep,
    }
    OUT.write_text(json.dumps(data, indent=1))
    print('wrote', OUT)


if __name__ == '__main__':
    main()
