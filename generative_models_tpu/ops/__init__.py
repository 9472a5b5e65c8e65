import jax as _jax

from generative_models_tpu.ops.masked_dense import masked_dense


def on_tpu():
    """Models default to the Pallas kernels on TPU and the XLA paths
    elsewhere (interpret-mode Pallas is only for kernel unit tests — it is
    far too slow inside 784-step sampling scans)."""
    return _jax.default_backend() == 'tpu'
