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


def test_checked_in_results_have_explicit_device():
    """Every entry in the published RESULTS.json carries a real provenance
    stamp (collect_results writes 'unknown' rather than guessing)."""
    results = json.loads((ROOT / 'RESULTS.json').read_text())
    for model, entry in results['models'].items():
        assert entry.get('device') in ('tpu', 'cpu', 'unknown'), (model, entry)
