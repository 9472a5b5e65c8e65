"""All-models 1-epoch smoke test, the integration layer of the reference's
test strategy (gms/tests/test_models.py) — run in-process (no subprocess) on
tiny configs so CI stays fast."""

import pytest

from generative_models_tpu.main import main
from generative_models_tpu.utils import discover_models

SMALL = [
    '--epochs=1',
    '--bs=8',
    '--hidden_size=24',
    '--data_source=synthetic',
    '--save_n=1',
    '--eval_heavy=0',
]

# per-model overrides to keep tiny-CPU runtimes sane (1-core host: compile
# time dominates, so shrink kernels/layers aggressively)
OVERRIDES = {
    'made': ['--hidden_size=32'],
    'diffusion_model': ['--timesteps=2', '--hidden_size=32', '--class_cond=0'],
    'pixel_transformer': ['--n_embed=16', '--n_layer=1', '--n_head=2'],
    'vqvae': ['--n_embed=16', '--n_layer=1', '--n_head=2', '--vqD=16', '--vqK=16'],
    'wavenet': ['--hidden_size=8'],
    'pixel_cnn': ['--n_filters=8', '--n_layers=2', '--kernel_size=3'],
    'gated_pixel_cnn': ['--n_filters=8', '--n_layers=3', '--kernel_size=3'],
    'rnn': ['--hidden_size=16'],
}


@pytest.mark.parametrize('name', sorted(discover_models().keys()))
def test_model_smoke(name, tmp_path, monkeypatch):
    # keep the smoke run tiny: one short epoch over a truncated dataset
    import generative_models_tpu.data.mnist as mnist_mod

    monkeypatch.setattr(mnist_mod, 'TRAIN_N', 64)
    monkeypatch.setattr(mnist_mod, 'TEST_N', 32)
    argv = (
        [f'--model={name}', f'--logdir={tmp_path}']
        + SMALL
        + OVERRIDES.get(name, [])
    )
    main(argv)
