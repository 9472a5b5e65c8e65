"""Test-set bits/dim logging for autoregressive models.

The reference lists bits/dim as a TODO (reference README.md:145-148); here the
harness derives it from the test-epoch nlogp (mean per-pixel Bernoulli NLL in
nats): bits/dim = nlogp / ln 2. Autoreg models get the key; latent-variable
models (VAE etc.) must not, since their loss is not an exact likelihood.
"""

import numpy as np

import generative_models_tpu.main as main_mod


def _run_capturing(argv, tmp_path, monkeypatch):
    import generative_models_tpu.data.mnist as mnist_mod

    monkeypatch.setattr(mnist_mod, 'TRAIN_N', 64)
    monkeypatch.setattr(mnist_mod, 'TEST_N', 32)
    seen = {}
    real = main_mod.dump_logger

    def capture(logger, writer, epoch, G):
        for k, v in logger.items():
            seen.setdefault(k, []).extend(list(np.atleast_1d(v)))
        return real(logger, writer, epoch, G)

    monkeypatch.setattr(main_mod, 'dump_logger', capture)
    main_mod.main(argv + [f'--logdir={tmp_path}'])
    return seen


def test_autoreg_logs_bits_per_dim(tmp_path, monkeypatch):
    seen = _run_capturing(
        ['--model=made', '--epochs=0', '--bs=8', '--hidden_size=32',
         '--data_source=synthetic', '--save_n=5'],
        tmp_path, monkeypatch,
    )
    assert 'eval/bits_per_dim' in seen
    bpd = float(seen['eval/bits_per_dim'][-1])
    nlogp = float(seen['eval/nlogp'][-1])
    assert np.isclose(bpd, nlogp / np.log(2.0), rtol=1e-6)
    assert bpd > 0


def test_non_autoreg_has_no_bits_per_dim(tmp_path, monkeypatch):
    seen = _run_capturing(
        ['--model=vae', '--epochs=0', '--bs=8', '--hidden_size=24',
         '--data_source=synthetic', '--save_n=5'],
        tmp_path, monkeypatch,
    )
    assert 'vae/test/vae_loss' in seen
    assert 'eval/bits_per_dim' not in seen
