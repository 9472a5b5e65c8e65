from pathlib import Path

from generative_models_tpu.utils import discover_models
from generative_models_tpu.utils.config import args_type, global_defaults, parse_args


def test_args_type_bool():
    f = args_type(True)
    assert f('False') is False and f('True') is True


def test_args_type_int_promotes_float():
    f = args_type(64)
    assert f('64') == 64 and isinstance(f('64'), int)
    assert f('3e-4') == 3e-4 and isinstance(f('3e-4'), float)


def test_args_type_path():
    f = args_type(Path('.'))
    assert isinstance(f('~/x'), Path)


def test_two_phase_parse_model_dg():
    G, Model = parse_args(
        ['--model=made', '--bs=32'], discover_models=discover_models
    )
    assert G.model == 'made'
    assert G.bs == 32
    assert G.hidden_size == 1024  # MADE.DG override of the global 256
    assert Path(G.logdir).name == 'made'


def test_global_defaults_reference_keys():
    DG = global_defaults()
    for key in ['model', 'bs', 'hidden_size', 'epochs', 'save_n', 'logdir', 'lr',
                'class_cond', 'binarize', 'pad32', 'mode', 'weights_from',
                'autoencoder', 'classifier', 'eval_heavy', 'skip_training']:
        assert key in DG


def test_hps_roundtrip(tmp_path):
    import yaml

    from generative_models_tpu.utils.config import dump_hps

    G, _ = parse_args(['--model=made'], discover_models=discover_models)
    G.logdir = tmp_path
    dump_hps(G)
    loaded = yaml.safe_load(open(tmp_path / 'hps.yaml'))
    assert loaded['model'] == 'made'
    assert loaded['hidden_size'] == 1024


def test_device_flag_matching_backend_is_noop(tmp_path):
    """--device parity with the reference (gms/main.py:24): selecting the
    already-initialized backend must work; a different one must error
    loudly rather than silently run on the wrong platform."""
    import pytest

    from generative_models_tpu.main import load_model_and_data

    common = [
        '--model=made', f'--logdir={tmp_path}', '--bs=8',
        '--hidden_size=16', '--data_source=synthetic',
    ]
    # tests run with the cpu backend initialized -> 'cpu' is accepted
    load_model_and_data(common + ['--device=cpu'])
    with pytest.raises(ValueError, match='using the cpu backend'):
        load_model_and_data(common + ['--device=tpu'])
