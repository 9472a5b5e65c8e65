"""Deterministic shared workload for cross-framework parity checks.

Both sides of the loss-curve comparison — the torch reference recorder
(scripts/record_reference_cpu.py) and our tests (tests/test_parity_curves.py)
— draw the SAME images in the SAME order from this module, so curve
differences reflect the frameworks, not the data. Reference training loop
being mirrored: gms/main.py:152-217.
"""

import numpy as np


def parity_arrays(train_n=4096, binarize=1):
    """(x, y): digits-upsampled images (NHWC float32, transformed) + labels,
    deterministic at fixed sizes."""
    import generative_models_tpu.data.mnist as M

    old = (M.TRAIN_N, M.TEST_N)
    M.TRAIN_N, M.TEST_N = train_n, 256
    try:
        tx, ty, _, _ = M._load_digits_upsampled()
    finally:
        M.TRAIN_N, M.TEST_N = old
    x = M._apply_transforms(tx, binarize, 0)
    return np.asarray(x), np.asarray(ty)


def parity_batches(train_n, bs, steps, binarize=1):
    """Sequential (steps, bs, 28, 28, 1) + (steps, bs) batches, no shuffle."""
    x, y = parity_arrays(train_n, binarize)
    n = steps * bs
    assert n <= x.shape[0], (n, x.shape)
    return (
        x[:n].reshape(steps, bs, *x.shape[1:]),
        y[:n].reshape(steps, bs),
    )
