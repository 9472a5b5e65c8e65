"""Model registry.

The reference discovers models by rglob-importing every file under gms/ and
reflecting on GM subclasses (reference: gms/common.py:38-55). We keep the same
public names (snake-cased class names) but use an explicit decorator registry:
imports are declared once in models/__init__.py, so nothing imports-the-world
and registration is deterministic.
"""

import re

_REGISTRY = {}


def convert_camel_to_snake(name):
    # same naming rule as the reference (gms/common.py:33-35)
    s1 = re.sub('(.)([A-Z][a-z]+)', r'\1_\2', name)
    return re.sub('([a-z0-9])([A-Z])', r'\1_\2', s1).lower()


def register(cls=None, *, name=None):
    """Class decorator: @register on a GM subclass adds it to the registry
    under its snake-cased class name."""

    def wrap(c):
        key = name or convert_camel_to_snake(c.__name__)
        _REGISTRY[key] = c
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def discover_models():
    """Return {snake_name: ModelClass}. Same keys as the reference registry:
    made, rnn, wavenet, pixel_cnn, gated_pixel_cnn, pixel_transformer, vae,
    vqvae, gan, diffusion_model, autoencoder, classifier."""
    # Importing the models package triggers all @register decorators.
    import generative_models_tpu.models  # noqa: F401

    return dict(_REGISTRY)
