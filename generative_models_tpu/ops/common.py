"""Shared helpers for the Pallas kernel modules.

Single home for the backend gate and tile rounding so a change to either
(e.g. supporting a new accelerator or a force-interpret env toggle) lands
in one place — attention, masked_dense, and quantize all import from here.
"""

import jax


def on_tpu():
    """Models default to the Pallas kernels on TPU and the XLA paths
    elsewhere (interpret-mode Pallas is only for kernel unit tests — it is
    far too slow inside 784-step sampling scans)."""
    return jax.default_backend() == 'tpu'


def round_up(x, m):
    return ((x + m - 1) // m) * m
