"""eval_heavy integration: arbiter save -> load_arbiter -> FID/P/R pipeline
(reference chain gms/main.py:95-149), on tiny CPU configs."""

import numpy as np
import pytest

import generative_models_tpu.data.mnist as mnist_mod
from generative_models_tpu.main import eval_heavy, load_model_and_data, main
from generative_models_tpu.utils import make_logger


@pytest.fixture()
def trained_arbiters(tmp_path, monkeypatch):
    monkeypatch.setattr(mnist_mod, 'TRAIN_N', 64)
    monkeypatch.setattr(mnist_mod, 'TEST_N', 64)
    common = [
        '--epochs=0', '--bs=16', '--hidden_size=16', '--data_source=synthetic',
        '--save_n=1', '--eval_heavy=0',
    ]
    main([f'--model=autoencoder', f'--logdir={tmp_path}/ae'] + common)
    main([f'--model=classifier', f'--logdir={tmp_path}/cls'] + common)
    return tmp_path / 'ae' / 'model.jit.pt', tmp_path / 'cls' / 'model.jit.pt'


def test_eval_heavy_pipeline(tmp_path, monkeypatch, trained_arbiters):
    ae_path, cls_path = trained_arbiters
    monkeypatch.setattr(mnist_mod, 'TRAIN_N', 64)
    monkeypatch.setattr(mnist_mod, 'TEST_N', 64)
    import generative_models_tpu.main as main_mod

    monkeypatch.setattr(main_mod, 'TOTAL_HEAVY_SAMPLES', 32)
    model, dataset, autoencoder, classifier, G = load_model_and_data(
        [
            '--model=diffusion_model', f'--logdir={tmp_path}/diff',
            '--bs=16', '--hidden_size=32', '--timesteps=2', '--bf16=0',
            '--data_source=synthetic', '--eval_heavy=1', '--class_cond=1',
            f'--autoencoder={ae_path}', f'--classifier={cls_path}',
        ]
    )
    assert autoencoder is not None and classifier is not None
    logger = make_logger()
    eval_heavy(logger, model, dataset, autoencoder, classifier, G)
    for key in [
        'eval/fid', 'eval/ignite_fid', 'eval/precision', 'eval/recall',
        'eval/f1', 'eval/classifier_loss', 'eval/cond_fid', 'eval/cond_precision',
    ]:
        assert key in logger, f'missing {key}'
        val = logger[key][0]
        assert np.isfinite(val) or key == 'eval/f1', (key, val)
    # arbiter features are 64-d (G.z_size default), FID must be >= 0
    assert logger['eval/fid'][0] >= -1e-3


def test_eval_heavy_autoreg(tmp_path, monkeypatch, trained_arbiters):
    """eval_heavy for a non-class_cond autoreg: sample() takes no y and
    returns (samples, frames). The reference's eval_heavy crashes on both
    (gms/main.py:126 assumes the diffusion signature); ours must not."""
    ae_path, cls_path = trained_arbiters
    monkeypatch.setattr(mnist_mod, 'TRAIN_N', 64)
    monkeypatch.setattr(mnist_mod, 'TEST_N', 64)
    import generative_models_tpu.main as main_mod

    monkeypatch.setattr(main_mod, 'TOTAL_HEAVY_SAMPLES', 32)
    model, dataset, autoencoder, classifier, G = load_model_and_data(
        [
            '--model=made', f'--logdir={tmp_path}/made',
            '--bs=16', '--hidden_size=32', '--data_source=synthetic',
            '--eval_heavy=1', f'--autoencoder={ae_path}',
        ]
    )
    assert classifier is None  # made is not class-conditional
    logger = make_logger()
    eval_heavy(logger, model, dataset, autoencoder, None, G)
    for key in ['eval/fid', 'eval/ignite_fid', 'eval/precision', 'eval/recall']:
        assert key in logger, f'missing {key}'
        assert np.isfinite(logger[key][0]), (key, logger[key][0])
    assert 'eval/cond_fid' not in logger


def test_eval_heavy_fast_sampler_knobs(tmp_path, monkeypatch, trained_arbiters):
    """--eval_sampler/--eval_sample_steps route eval_heavy's bulk sampling
    through a second (shorter/ODE) chain while evaluate()'s grids keep the
    primary sampler; defaults keep the knobs off (VERDICT r3 item 4)."""
    ae_path, _ = trained_arbiters
    monkeypatch.setattr(mnist_mod, 'TRAIN_N', 64)
    monkeypatch.setattr(mnist_mod, 'TEST_N', 64)
    import generative_models_tpu.main as main_mod

    monkeypatch.setattr(main_mod, 'TOTAL_HEAVY_SAMPLES', 16)
    common = [
        '--bs=16', '--hidden_size=32', '--timesteps=4', '--bf16=0',
        '--data_source=synthetic', '--eval_heavy=1', '--class_cond=0',
        f'--autoencoder={ae_path}',
    ]
    # defaults: no eval chain is built (reference-faithful eval_heavy)
    model, *_ = load_model_and_data(
        ['--model=diffusion_model', f'--logdir={tmp_path}/d0'] + common
    )
    assert model._eval_diffusion is None

    model, dataset, autoencoder, _, G = load_model_and_data(
        [
            '--model=diffusion_model', f'--logdir={tmp_path}/d1',
            '--eval_sampler=dpm2m', '--eval_sample_steps=2',
        ]
        + common
    )
    assert model._eval_diffusion is not None
    assert model._eval_diffusion.sampler == 'dpm2m'
    # the eval chain is what sample_images uses (2 steps, not 4)
    samp = model.sample_images(8)
    assert samp.shape == (8, 28, 28, 1)
    logger = make_logger()
    eval_heavy(logger, model, dataset, autoencoder, None, G)
    for key in ['eval/fid', 'eval/precision', 'eval/recall']:
        assert key in logger and np.isfinite(logger[key][0]), key
