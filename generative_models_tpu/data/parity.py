"""Deterministic shared workload for cross-framework parity checks.

Both sides of the loss-curve comparison — the torch reference recorder
(scripts/record_reference_cpu.py) and our tests (tests/test_parity_curves.py)
— draw the SAME images in the SAME order from this module, so curve
differences reflect the frameworks, not the data. Reference training loop
being mirrored: gms/main.py:152-217.
"""

import numpy as np


def parity_arrays(train_n=4096, binarize=1, data_dir=None):
    """(x, y): images (NHWC float32, transformed) + labels, deterministic at
    fixed sizes.

    Source: digits-upsampled fallback by default; when `data_dir` (or the
    GMT_PARITY_DATA env var) points at MNIST idx files, the first train_n
    REAL images instead — both parity sides import this module, so flipping
    the env var moves the whole cross-framework comparison onto real MNIST
    with no other change (rehearsed end-to-end by scripts/idx_rehearsal.py)."""
    import os

    import generative_models_tpu.data.mnist as M

    data_dir = data_dir or os.environ.get('GMT_PARITY_DATA') or None
    if data_dir:
        loaded = M._load_mnist_idx(data_dir)
        assert loaded is not None, f'no MNIST idx files under {data_dir}'
        tx, ty = loaded[0][:train_n], loaded[1][:train_n]
        assert tx.shape[0] == train_n, (tx.shape, train_n)
    else:
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
