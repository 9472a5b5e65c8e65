"""generative_models_tpu: a TPU-native JAX framework with the capabilities of
matwilso/generative_models.

The reference (mounted at /root/reference) is a single-GPU PyTorch model zoo.
This package is a ground-up rebuild for TPU: functional models (pytrees of
params + pure jitted loss/sample functions), on-device data pipeline,
lax.scan sampling chains, Pallas kernels for the hot ops, and a
jax.sharding.Mesh-based parallelism layer.

Public entry point (API-compatible with the reference CLI,
/root/reference/gms/main.py):

    python -m generative_models_tpu.main --model=<name> [--flag=val ...]
"""

__version__ = "0.1.0"
