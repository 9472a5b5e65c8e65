"""Synthesize a full-size MNIST-shaped IDX dataset (VERDICT r4 item 9).

Writes the fallback digits-upsampled images (60k train / 10k test, the same
splits every zoo artifact used) as REAL idx files in the torchvision layout
(<out>/MNIST/raw/train-images-idx3-ubyte[.gz] ...), so the entire
measurement pipeline — CLI training, eval_heavy, results collection — can
be rehearsed end-to-end against `--data_source=mnist --data_dir=<out>`
exactly as it would run the day real MNIST files appear. Train files are
gzipped, test files raw: both loader paths get exercised in one run
(data/mnist.py::_read_idx handles either; the reference consumes the same
files via torchvision, gms/common.py:102-132).

Usage: python scripts/make_idx_dataset.py [OUT_DIR=/tmp/idx_rehearsal/data]
"""

import gzip
import struct
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def write_idx_images(path, x_u8, gz=False):
    """IDX3: magic 0x00000803, dims (N, H, W) big-endian u32, uint8 data."""
    n, h, w = x_u8.shape
    header = struct.pack('>IIII', 0x00000803, n, h, w)
    payload = header + x_u8.tobytes()
    if gz:
        with gzip.open(path, 'wb') as f:
            f.write(payload)
    else:
        path.write_bytes(payload)


def write_idx_labels(path, y_u8, gz=False):
    header = struct.pack('>II', 0x00000801, len(y_u8))
    payload = header + y_u8.tobytes()
    if gz:
        with gzip.open(path, 'wb') as f:
            f.write(payload)
    else:
        path.write_bytes(payload)


def main(out_dir):
    from generative_models_tpu.data.mnist import _load_digits_upsampled

    train_x, train_y, test_x, test_y = _load_digits_upsampled()
    raw = Path(out_dir) / 'MNIST' / 'raw'
    raw.mkdir(parents=True, exist_ok=True)
    to_u8 = lambda x: np.clip(  # noqa: E731
        np.asarray(x)[..., 0] * 255.0, 0, 255
    ).astype(np.uint8)
    write_idx_images(raw / 'train-images-idx3-ubyte.gz', to_u8(train_x), gz=True)
    write_idx_labels(raw / 'train-labels-idx1-ubyte.gz',
                     np.asarray(train_y).astype(np.uint8), gz=True)
    write_idx_images(raw / 't10k-images-idx3-ubyte', to_u8(test_x))
    write_idx_labels(raw / 't10k-labels-idx1-ubyte',
                     np.asarray(test_y).astype(np.uint8))
    print(f'wrote {raw}: train {train_x.shape} (gz) test {test_x.shape} (raw)')

    # prove the loader roundtrip before anything trains on it
    from generative_models_tpu.data.mnist import _load_mnist_idx

    loaded = _load_mnist_idx(Path(out_dir))
    assert loaded is not None, 'loader did not find the files it just wrote'
    lx, ly, tx, ty = loaded
    assert lx.shape == (len(train_x), 28, 28, 1) and ty.shape == (len(test_y),)
    err = np.abs(lx[:100] - np.asarray(train_x[:100])).max()
    assert err < 1 / 255 + 1e-6, f'roundtrip error {err}'
    print(f'loader roundtrip ok (max quantization err {err:.5f})')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/idx_rehearsal/data')
