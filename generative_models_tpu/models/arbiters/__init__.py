"""Arbiters: eval-only models. load_arbiter replaces the reference's
TorchScript reload (gms/main.py:85-90) — the saved payload carries the class
name, config, and params, so the harness can rebuild the apply function."""

import pickle
from pathlib import Path

import jax
from flax import serialization

from generative_models_tpu.models.arbiters.autoencoder import AENet, Autoencoder
from generative_models_tpu.models.arbiters.classifier import Classifier


class ArbiterHandle:
    """Jitted pure feature/logit extractor used by eval_heavy."""

    def __init__(self, apply_fn):
        self._fn = jax.jit(apply_fn)

    def apply(self, x):
        return self._fn(x)


def load_arbiter(path):
    from generative_models_tpu.utils.config import AttrDict
    from generative_models_tpu.utils.registry import (
        convert_camel_to_snake,
        discover_models,
    )

    path = Path(path)
    if path.is_dir():
        path = path / 'model.jit.pt'
    with open(path, 'rb') as f:
        payload = pickle.load(f)
    G = AttrDict(payload['G'])
    Model = discover_models()[convert_camel_to_snake(payload['class_name'])]
    model = Model(G=G)
    params = serialization.from_bytes(
        jax.device_get(model.state.params), payload['params']
    )
    return ArbiterHandle(lambda x: model.feature_fn(params, x))
