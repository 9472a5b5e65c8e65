"""Harness robustness: the non-finite-metric guard and seeded-run
determinism — production-trainer guarantees the reference lacks
(gms/main.py trains through NaNs and has no determinism contract)."""

import pytest

from generative_models_tpu.main import main

TINY = [
    '--bs=16',
    '--hidden_size=32',
    '--data_source=synthetic',
    '--save_n=1',
    '--eval_heavy=0',
]


def _shrink(monkeypatch):
    import generative_models_tpu.data.mnist as mdata

    monkeypatch.setattr(mdata, 'TRAIN_N', 64)
    monkeypatch.setattr(mdata, 'TEST_N', 32)


def test_nan_guard_aborts_blown_up_run(tmp_path, monkeypatch):
    """An absurd learning rate blows MADE's loss up to NaN within two
    epochs; the guard must abort the run instead of training (and
    checkpointing) garbage."""
    _shrink(monkeypatch)
    args = [
        '--model=made',
        f'--logdir={tmp_path}',
        '--epochs=50',
        '--lr=1e20',
    ] + TINY
    with pytest.raises(FloatingPointError, match='non-finite train metrics'):
        main(args)
    # --nan_guard=0 opts out (reference behavior): same run completes
    main(args + ['--nan_guard=0', '--epochs=1'])


def test_seeded_runs_are_bit_deterministic(tmp_path, monkeypatch):
    """Two identical seeded CLI runs produce byte-identical checkpoints:
    init, data order, and the train step are all keyed off --seed (the
    full determinism contract behind the parity-curve suite)."""
    _shrink(monkeypatch)

    def run(d):
        main(
            [
                '--model=made',
                f'--logdir={d}',
                '--epochs=2',
                '--seed=7',
            ]
            + TINY
        )
        return (d / 'model.pt').read_bytes()

    a = run(tmp_path / 'a')
    b = run(tmp_path / 'b')
    assert a == b
    # a different seed must change the trained weights
    main(
        ['--model=made', f'--logdir={tmp_path / "c"}', '--epochs=2', '--seed=8']
        + TINY
    )
    c = (tmp_path / 'c' / 'model.pt').read_bytes()
    assert c != a
