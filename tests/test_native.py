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


def test_gif_encode_gray_roundtrip():
    """Native GIF89a encoder: decoded frames must be bit-identical to the
    input (gray-ramp palette, index == intensity). Exercises LZW dictionary
    resets (noise frames) and width growth boundaries (varied sizes)."""
    pytest.importorskip('PIL')
    import io

    from PIL import Image

    if not native.available():
        assert native.gif_encode_gray(np.zeros((2, 8, 8), np.uint8), 10) is None
        return
    rng = np.random.default_rng(0)
    stacks = [
        rng.integers(0, 256, (7, 33, 41), dtype=np.uint8),  # worst-case noise
        np.linspace(0, 255, 5 * 64 * 64).reshape(5, 64, 64).astype(np.uint8),
        (rng.random((12, 145, 145)) > 0.8).astype(np.uint8) * 255,  # sparse
        np.zeros((3, 17, 19), np.uint8),  # constant (max LZW run length)
    ]
    for frames in stacks:
        gif = native.gif_encode_gray(frames, fps=20)
        assert gif is not None and gif[:6] == b'GIF89a'
        im = Image.open(io.BytesIO(gif))
        assert im.n_frames == frames.shape[0]
        for i in range(im.n_frames):
            im.seek(i)
            np.testing.assert_array_equal(
                np.asarray(im.convert('L')), frames[i]
            )


def test_gridvid_uses_native_gif(tmp_path):
    """write_gridvid on a grayscale (T, 25, H, W, 1) stack must produce a
    valid animated GIF next to the logs through the native encoder path."""
    pytest.importorskip('PIL')
    import io

    from PIL import Image

    from generative_models_tpu.utils.logger import write_gridvid

    x = np.random.default_rng(1).random((6, 25, 28, 28, 1)).astype(np.float32)
    write_gridvid(None, 'proc', x, epoch=0, logdir=tmp_path)
    gif_path = tmp_path / 'proc_0.gif'
    assert gif_path.exists()
    im = Image.open(io.BytesIO(gif_path.read_bytes()))
    assert im.n_frames == 6
    im.seek(3)
    assert np.asarray(im.convert('L')).shape == (140, 140)


def test_load_current_so_skips_build_subprocess():
    """With a current .so, _load must CDLL directly — no `make` fork per
    process start (and no chance for concurrent builders to race)."""
    if native._load() is None:  # first call builds if toolchain exists
        pytest.skip('no native toolchain')
    native._LIB = None  # force a fresh load path

    def boom(*a, **k):
        raise AssertionError('unexpected rebuild of a current .so')

    orig = native.subprocess.run
    native.subprocess.run = boom
    try:
        assert native._load() is not None
    finally:
        native.subprocess.run = orig
