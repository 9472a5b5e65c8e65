"""Collect the zoo-results run (scripts/zoo_results.sh) into RESULTS.json.

For each model logdir under LOGROOT, pulls the final logged values of the
headline quality metrics — test-set bits/dim (autoregressive models),
FID (autoencoder-latent + pixel-space), precision / recall / F1, conditional
CE — plus total train wall-clock, from the TensorBoard event files the real
CLI run wrote. These are the tables the reference README lists as TODOs
(reference README.md:145-148).

Usage: python scripts/collect_results.py [LOGROOT] [OUT.json]
"""

import json
import sys
from pathlib import Path

import yaml
from tensorboard.backend.event_processing.event_accumulator import (
    EventAccumulator,
)

MODELS = [
    'made', 'rnn', 'wavenet', 'pixel_cnn', 'gated_pixel_cnn',
    'pixel_transformer', 'vae', 'vqvae', 'gan', 'gan_stab',
    'diffusion_model',
]
LAST_KEYS = [
    'eval/bits_per_dim', 'eval/fid', 'eval/ignite_fid', 'eval/precision',
    'eval/recall', 'eval/f1', 'eval/cond_fid', 'eval/classifier_loss',
    'num_vars',
]


def model_results(logdir, model):
    acc = EventAccumulator(str(logdir), size_guidance={'scalars': 0})
    acc.Reload()
    tags = acc.Tags().get('scalars', [])
    out = {}
    for key in LAST_KEYS + [f'{model}/test/loss']:
        if key in tags:
            events = acc.Scalars(key)
            if events:
                out[key.split('/', 1)[-1] if key.startswith('eval/')
                    else key] = events[-1].value
    if 'dt/train' in tags:
        out['train_total_sec'] = sum(e.value for e in acc.Scalars('dt/train'))
        out['epochs_trained'] = len(acc.Scalars('dt/train'))
    if (logdir / 'model_best.pt').exists():
        # --keep_best ran: the *_best rows below are servable artifacts
        # (--weights_from <logdir>/model_best.pt), not just table entries
        out['best_checkpoint'] = str(logdir / 'model_best.pt')
        best_meta = logdir / 'best.json'
        if best_meta.exists():
            out['best_checkpoint_meta'] = json.loads(best_meta.read_text())
    # early-stopped optimum: the fallback-digits dataset has a ~1.5k-image
    # base set, so high-capacity models (the conv ARs especially) reach
    # their best test bpd within a few epochs and then overfit — the
    # final-epoch value alone misrepresents model quality (round-4
    # conv-AR-anomaly finding, docs/RESULTS.md)
    if 'eval/bits_per_dim' in tags:
        bpds = acc.Scalars('eval/bits_per_dim')
        trained = [e for e in bpds if e.step > 0]  # step 0 = untrained
        if trained:
            best = min(trained, key=lambda e: e.value)
            out['bits_per_dim_best'] = best.value
            out['bits_per_dim_best_epoch'] = best.step
    # same early-stopping record for FID (GANs in particular collapse past
    # their optimum; runs with save_n < epochs log several heavy evals)
    if 'eval/fid' in tags:
        fids = [e for e in acc.Scalars('eval/fid') if e.step > 0]
        if len(fids) > 1:
            best = min(fids, key=lambda e: e.value)
            out['fid_best'] = best.value
            out['fid_best_epoch'] = best.step
    # first heavy eval (epoch 0, untrained) vs last, to show learning
    if 'eval/fid' in tags:
        fids = acc.Scalars('eval/fid')
        if len(fids) > 1:
            out['fid_untrained'] = fids[0].value
        else:
            # run was killed before its first post-training heavy eval: the
            # only metrics on record are the UNTRAINED epoch-0 ones — don't
            # let ANY of them masquerade as trained-model results
            heavy_keys = (
                'fid', 'ignite_fid', 'precision', 'recall', 'f1',
                'cond_fid', 'cond_precision', 'cond_recall', 'cond_f1',
                'classifier_loss',
            )
            # bits_per_dim is re-logged every epoch (not only at heavy
            # evals), so it is untrained only if no train epoch completed
            light_keys = (
                ('bits_per_dim',) if not out.get('epochs_trained') else ()
            )
            for k in heavy_keys + light_keys:
                if k in out:
                    out[f'{k}_untrained'] = out.pop(k)
            out['partial'] = True
    return out


def seed_diffusion_from_eval(result, eval_path=Path('EVAL.json')):
    """Fold EVAL.json's chip eval_heavy run into the diffusion_model entry.

    EVAL.json records the same CLI + eval_heavy pipeline this collector
    reads from TB events (python -m generative_models_tpu.main
    --model=diffusion_model --epochs=10 --eval_heavy=1, on chip), just
    checked in as a standalone artifact. When no zoo-results logdir run
    exists (or only a partial one), that chip measurement is strictly
    better provenance than re-burning hours of CPU fallback — reuse it.
    """
    existing = result['models'].get('diffusion_model', {})
    if 'fid' in existing and not existing.get('partial'):
        return
    if not eval_path.exists():
        return
    ev = json.loads(eval_path.read_text())
    if ev.get('model') != 'diffusion_model':
        return
    trained = ev['epochs'].get('10') or ev['epochs'][max(
        (k for k in ev['epochs'] if k.isdigit()), key=int)]
    entry = {
        k: trained[k]
        for k in ('fid', 'ignite_fid', 'precision', 'recall', 'f1',
                  'cond_fid', 'classifier_loss')
        if k in trained
    }
    entry['num_vars'] = ev.get('num_vars')
    entry['epochs_trained'] = 10
    entry['fid_untrained'] = ev['epochs'].get('0_untrained', {}).get('fid')
    entry['device'] = 'tpu'
    entry['source'] = 'EVAL.json (chip eval_heavy artifact, same CLI run)'
    result['models']['diffusion_model'] = entry
    print('diffusion_model', json.dumps(entry), '(seeded from EVAL.json)')


def main():
    root = Path(sys.argv[1] if len(sys.argv) > 1 else 'logs/zoo_results')
    out_path = Path(sys.argv[2] if len(sys.argv) > 2 else 'RESULTS.json')
    # merge-don't-clobber: RESULTS.json also carries sections owned by other
    # collectors (gan_sweep by collect_gan_sweep.py, idx_rehearsal by
    # idx_rehearsal.py) — rewriting the file from scratch silently dropped
    # idx_rehearsal once (round 5); preserve every key this collector
    # doesn't own.
    result = json.loads(out_path.read_text()) if out_path.exists() else {}
    result.update({
        'description': (
            'Measured quality metrics for the full zoo: CLI runs with '
            "--eval_heavy=1 (>=500 samples, shipped arbiters); each entry's "
            "'epochs_trained' records its run length and 'device' the "
            'backend that produced it (quality metrics are '
            'hardware-independent training math; train_total_sec is '
            'comparable only within a device). bits/dim = test-set mean '
            'Bernoulli NLL / ln 2 for the autoregressive models. The '
            'reference lists these tables as TODOs (README.md:145-148).'
        ),
        'logroot': str(root),
        'models': {},
    })
    for model in MODELS:
        d = root / model
        if not (d / 'hps.yaml').exists():
            continue
        result['models'][model] = model_results(d, model)
        # stamp each entry with the backend that produced the run (recorded
        # into hps.yaml by dump_logger); quality metrics are
        # hardware-independent but wall-clock is not. Runs that predate the
        # jax_backend stamp are 'unknown' — never fabricate chip provenance.
        hps = yaml.safe_load((d / 'hps.yaml').read_text())
        result['models'][model]['device'] = hps.get('jax_backend', 'unknown')
        print(model, json.dumps(result['models'][model]))
    seed_diffusion_from_eval(result)
    out_path.write_text(json.dumps(result, indent=1))
    print('wrote', out_path)


if __name__ == '__main__':
    main()
