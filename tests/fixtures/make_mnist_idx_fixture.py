"""Generate the tiny checked-in MNIST idx fixture (tests/fixtures/mnist_idx).

Writes gzipped IDX files in the exact container format of the real MNIST
distribution (magic 0x803 for 3-D uint8 images, 0x801 for 1-D labels, big
endian dims — /root/reference/gms/common.py:102-132 consumes the same files
via torchvision): 64 train + 32 test images, deterministically derived from
sklearn's real handwritten digits so pixel content is realistic. Re-run this
script to regenerate; the test (tests/test_data.py) exercises
load_mnist(data_source='mnist') -> native C++ idx decode end-to-end on them.
"""

import gzip
import struct
from pathlib import Path

import numpy as np

OUT = Path(__file__).parent / 'mnist_idx'


def idx_bytes(arr):
    arr = np.ascontiguousarray(arr)
    code = {np.dtype(np.uint8): 0x08}[arr.dtype]
    header = struct.pack('>BBBB', 0, 0, code, arr.ndim)
    header += b''.join(struct.pack('>i', d) for d in arr.shape)
    return header + arr.tobytes()


def main():
    from sklearn.datasets import load_digits

    d = load_digits()
    imgs = (d.images.astype(np.float32) / 16.0 * 255).astype(np.uint8)
    labels = d.target.astype(np.uint8)
    rng = np.random.RandomState(0)
    idx = rng.permutation(len(imgs))[:96]
    up = np.zeros((96, 28, 28), np.uint8)
    up[:, 10:18, 10:18] = imgs[idx]  # 8x8 digit centered on a 28x28 canvas
    OUT.mkdir(parents=True, exist_ok=True)
    files = {
        'train-images-idx3-ubyte.gz': idx_bytes(up[:64]),
        'train-labels-idx1-ubyte.gz': idx_bytes(labels[idx[:64]]),
        't10k-images-idx3-ubyte.gz': idx_bytes(up[64:]),
        't10k-labels-idx1-ubyte.gz': idx_bytes(labels[idx[64:]]),
    }
    for name, data in files.items():
        with open(OUT / name, 'wb') as raw:
            with gzip.GzipFile(fileobj=raw, mode='wb', mtime=0) as f:
                f.write(data)  # mtime=0 keeps the bytes reproducible
        print(name, (OUT / name).stat().st_size, 'bytes')


if __name__ == '__main__':
    main()
