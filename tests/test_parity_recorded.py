"""Cross-framework loss-curve parity over the CHIP-RECORDED artifact.

parity_ours_tpu.json holds every model's loss curve regenerated on the real
TPU at full reference length (scripts/record_parity_curves.py). This file
asserts the identical parity contract as tests/test_parity_curves.py
(tests/parity_common.py::check_parity) over those recorded curves — a
hardware-independent, seconds-fast check of the BASELINE.md north star,
covering all 12 models at FULL curve length (the live test caps the slowest
conv models at 20-24 steps on the XLA-CPU fallback).

Reference training loop being mirrored: gms/main.py:152-217.
"""

import json

import pytest

from parity_common import KEY_OVERRIDE, OURS_PATH, REF, check_parity, ref_curve

OURS = (
    json.loads(OURS_PATH.read_text()).get('curves', {})
    if OURS_PATH.exists()
    else {}
)


def test_artifact_covers_every_reference_model():
    assert OURS_PATH.exists(), (
        'parity_ours_tpu.json missing — run scripts/record_parity_curves.py'
    )
    assert sorted(OURS) == sorted(REF), (sorted(OURS), sorted(REF))


@pytest.mark.parametrize('name', sorted(REF))
def test_recorded_curve_parity(name):
    assert name in OURS, f'{name} not in parity_ours_tpu.json'
    rec = OURS[name]
    # full length: recorded curves must NOT be capped
    assert rec['steps'] == REF[name]['steps'], (rec['steps'], REF[name]['steps'])
    assert rec['key'] == KEY_OVERRIDE.get(name, REF[name]['key'])
    assert rec['bs'] == REF[name]['bs']
    check_parity(name, rec['ours'], ref_curve(name, rec['steps']))
