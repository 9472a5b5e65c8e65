"""Test config: run everything on a virtual 8-device CPU mesh.

This is the JAX-native 'fake backend' (SURVEY.md §4): sharding/mesh logic is
exercised for real without TPU hardware. Must run before jax initializes."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import pytest  # noqa: E402


@pytest.fixture()
def tiny_G(tmp_path):
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.bs = 16
    G.hidden_size = 32
    G.epochs = 1
    G.logdir = tmp_path / 'logs'
    G.data_source = 'synthetic'
    return G
