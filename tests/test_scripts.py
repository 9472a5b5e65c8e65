"""Regression coverage for the results-pipeline scripts (collect/render).

These are the scripts that turn raw CLI logdirs into the judge-facing
RESULTS.json / docs/RESULTS.md artifacts, so their small pure helpers get
direct tests: the epoch-key sort (lexicographic '10' < '5' once published a
mid-run FID as the final number) and the provenance default (a run without a
jax_backend stamp must render as 'unknown', never fabricate 'tpu').
"""

import importlib.util
import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, ROOT / 'scripts' / f'{name}.py'
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_epoch_sort_is_numeric():
    rr = _load('render_results')
    keys = ['5', '0_untrained', '10', '49', '9']
    assert sorted(keys, key=rr.epoch_num) == ['0_untrained', '5', '9', '10', '49']
    assert sorted(keys, key=rr.epoch_num)[-1] == '49'


def test_quality_table_defaults_device_to_unknown():
    rr = _load('render_results')
    table = rr.quality_table(
        {'models': {'made': {'bits_per_dim': 0.16, 'epochs_trained': 10}}}
    )
    row = [line for line in table.splitlines() if 'made' in line][0]
    assert '| unknown |' in row
    assert 'tpu' not in row


def test_seed_diffusion_from_eval_fills_missing_entry():
    """With no zoo-logdir diffusion run, the collector reuses the chip
    eval_heavy artifact (EVAL.json) instead of leaving the row empty."""
    cr = _load('collect_results')
    result = {'models': {}}
    cr.seed_diffusion_from_eval(result, eval_path=ROOT / 'EVAL.json')
    entry = result['models']['diffusion_model']
    assert entry['device'] == 'tpu'
    assert 'EVAL.json' in entry['source']
    ev = json.loads((ROOT / 'EVAL.json').read_text())
    assert entry['fid'] == ev['epochs']['10']['fid']
    assert entry['fid_untrained'] == ev['epochs']['0_untrained']['fid']


def test_seed_diffusion_does_not_overwrite_real_run():
    """A finished logdir-derived entry always wins over the EVAL.json seed."""
    cr = _load('collect_results')
    real = {'fid': 0.123, 'device': 'tpu', 'epochs_trained': 50}
    result = {'models': {'diffusion_model': dict(real)}}
    cr.seed_diffusion_from_eval(result, eval_path=ROOT / 'EVAL.json')
    assert result['models']['diffusion_model'] == real


def test_checked_in_results_have_explicit_device():
    """Every entry in the published RESULTS.json carries a real provenance
    stamp (collect_results writes 'unknown' rather than guessing)."""
    results = json.loads((ROOT / 'RESULTS.json').read_text())
    for model, entry in results['models'].items():
        assert entry.get('device') in ('tpu', 'cpu', 'unknown'), (model, entry)
