"""Native C++ host-runtime (generative_models_tpu/native) vs numpy parity."""

import struct

import numpy as np
import pytest

from generative_models_tpu import native


def test_idx_roundtrip():
    payload = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    buf = (
        struct.pack('>HBB', 0, 0x08, 3)
        + struct.pack('>III', 2, 3, 4)
        + payload.tobytes()
    )
    arr = native.idx_parse(buf)
    assert arr.shape == (2, 3, 4)
    np.testing.assert_array_equal(arr, payload)


def test_idx_malformed():
    with pytest.raises((ValueError, AssertionError, KeyError)):
        native.idx_parse(b'\x01\x02\x03\x04garbage')


def test_u8_transform_binarize_matches_reference_semantics():
    x = (np.random.RandomState(0).rand(5, 28, 28) * 255).astype(np.uint8)
    out = native.u8_transform(x, binarize=True)
    expect = (x.astype(np.float32) / 255.0 > 0.5).astype(np.float32)
    np.testing.assert_array_equal(out, expect)


def test_u8_transform_pm1():
    x = (np.random.RandomState(1).rand(3, 28, 28) * 255).astype(np.uint8)
    out = native.u8_transform(x, binarize=False)
    np.testing.assert_allclose(
        out, 2 * x.astype(np.float32) / 255 - 1, atol=1e-6
    )


def test_tile_grid_matches_numpy():
    imgs = np.random.RandomState(2).rand(25, 28, 28, 1).astype(np.float32)
    tiled = native.tile_grid_u8(imgs, 5, 5)
    ref = imgs.reshape(5, 5, 28, 28, 1).transpose(0, 2, 1, 3, 4).reshape(140, 140, 1)
    ref = (np.clip(ref, 0, 1) * 255 + 0.5).astype(np.uint8)
    assert tiled.shape == (140, 140, 1)
    if native.available():
        np.testing.assert_array_equal(tiled, ref)
    else:
        np.testing.assert_allclose(
            tiled.astype(int), ref.astype(int), atol=1
        )
