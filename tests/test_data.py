import jax
import numpy as np

from generative_models_tpu.data import load_mnist


def test_synthetic_binarized(tiny_G):
    ds = load_mnist(tiny_G)
    assert ds.train_x.shape == (60000, 28, 28, 1)
    assert ds.test_x.shape == (10000, 28, 28, 1)
    vals = np.unique(np.asarray(ds.train_x[:100]))
    assert set(vals.tolist()) <= {0.0, 1.0}
    assert ds.steps_per_epoch == 60000 // tiny_G.bs


def test_scaled_and_padded(tiny_G):
    tiny_G.binarize = 0
    tiny_G.pad32 = 1
    ds = load_mnist(tiny_G)
    assert ds.train_x.shape == (60000, 32, 32, 1)
    x = np.asarray(ds.train_x[:10])
    assert x.min() >= -1.0 and x.max() <= 1.0
    assert np.allclose(x[:, :2, :, :], -1.0)  # pad region at the [-1,1] floor


def test_epoch_batches_shapes_and_shuffle(tiny_G):
    ds = load_mnist(tiny_G)
    bx, by = ds.epoch_batches(jax.random.key(0))
    assert bx.shape == (ds.steps_per_epoch, tiny_G.bs, 28, 28, 1)
    assert by.shape == (ds.steps_per_epoch, tiny_G.bs)
    bx2, _ = ds.epoch_batches(jax.random.key(1))
    assert not np.allclose(np.asarray(bx[0]), np.asarray(bx2[0]))


def test_digits_source_real_data(tiny_G):
    tiny_G.data_source = 'digits'
    ds = load_mnist(tiny_G)
    # real handwritten digits should have nontrivial structure
    x = np.asarray(ds.train_x[:200])
    assert 0.05 < x.mean() < 0.5


def test_mnist_idx_source_end_to_end(tiny_G):
    """Data path #1 (real MNIST idx files, ref gms/common.py:102-132),
    exercised end-to-end on the checked-in fixture: load_mnist with
    data_source='mnist' must find the gzipped idx files, decode them
    through the native C++ parser, and match an independent pure-python
    struct parse bit-for-bit."""
    import gzip
    import struct
    from pathlib import Path

    fdir = Path(__file__).parent / 'fixtures' / 'mnist_idx'
    tiny_G.data_source = 'mnist'
    tiny_G.data_dir = fdir
    tiny_G.binarize = 1
    ds = load_mnist(tiny_G)
    assert ds.train_x.shape == (64, 28, 28, 1)
    assert ds.test_x.shape == (32, 28, 28, 1)

    def parse(name):  # independent reference parse of the same bytes
        raw = gzip.open(fdir / name).read()
        ndim = raw[3]
        dims = struct.unpack('>' + 'i' * ndim, raw[4 : 4 + 4 * ndim])
        return np.frombuffer(raw, np.uint8, offset=4 + 4 * ndim).reshape(dims)

    imgs = parse('train-images-idx3-ubyte.gz').astype(np.float32) / 255.0
    np.testing.assert_array_equal(
        np.asarray(ds.train_x)[..., 0], (imgs > 0.5).astype(np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(ds.train_y),
        parse('train-labels-idx1-ubyte.gz').astype(np.int32),
    )
    timgs = parse('t10k-images-idx3-ubyte.gz').astype(np.float32) / 255.0
    np.testing.assert_array_equal(
        np.asarray(ds.test_x)[..., 0], (timgs > 0.5).astype(np.float32)
    )
    # this environment ships g++, so the decode above went through the
    # native C++ parser, not the numpy fallback
    from generative_models_tpu import native

    assert native.available()
