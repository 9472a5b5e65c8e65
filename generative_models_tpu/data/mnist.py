"""On-device MNIST data pipeline.

The reference uses torchvision MNIST + 2-worker DataLoaders with a per-step
host->device copy (gms/common.py:102-132, gms/main.py:208). TPU-native
rebuild: the full dataset lives on device as one array; transforms (binarize
/ [-1,1] / pad32) are applied once; an epoch is jax.random.permutation +
reshape into (steps, bs, ...), so the train loop never touches the host.

Data sources, resolved in order by 'auto':
  1. 'mnist'  — real MNIST idx files under --data_dir (raw idx or the
     torchvision layout). Nothing is downloaded (no network in this env).
  2. 'digits' — sklearn load_digits (1797 real 8x8 handwritten digits,
     shipped with scikit-learn) upsampled to 28x28 and deterministically
     augmented with subpixel shifts to MNIST-scale 60k/10k splits.
  3. 'synthetic' — pure procedural fallback (never chosen by auto unless
     sklearn is missing too).
"""

import gzip
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

TRAIN_N = 60000
TEST_N = 10000

_IDX_CANDIDATES = {
    'train_images': ['train-images-idx3-ubyte', 'train-images.idx3-ubyte'],
    'train_labels': ['train-labels-idx1-ubyte', 'train-labels.idx1-ubyte'],
    'test_images': ['t10k-images-idx3-ubyte', 't10k-images.idx3-ubyte'],
    'test_labels': ['t10k-labels-idx1-ubyte', 't10k-labels.idx1-ubyte'],
}


def _read_idx(path):
    """Parse an IDX file (the MNIST container format), gz or raw, via the
    native C++ decoder (generative_models_tpu/native) with numpy fallback."""
    from generative_models_tpu import native

    opener = gzip.open if str(path).endswith('.gz') else open
    with opener(path, 'rb') as f:
        data = f.read()
    return native.idx_parse(data)


def _find_idx_file(data_dir, names):
    search_dirs = [data_dir, data_dir / 'MNIST' / 'raw', data_dir / 'mnist']
    for d in search_dirs:
        for name in names:
            for suffix in ['', '.gz']:
                p = Path(d) / (name + suffix)
                if p.exists():
                    return p
    return None


def _load_mnist_idx(data_dir):
    data_dir = Path(data_dir)
    files = {}
    for key, names in _IDX_CANDIDATES.items():
        p = _find_idx_file(data_dir, names)
        if p is None:
            return None
        files[key] = p
    # native C++ IDX decode when available (generative_models_tpu/native)
    train_x = _read_idx(files['train_images']).astype(np.float32) / 255.0
    train_y = _read_idx(files['train_labels']).astype(np.int32)
    test_x = _read_idx(files['test_images']).astype(np.float32) / 255.0
    test_y = _read_idx(files['test_labels']).astype(np.int32)
    return train_x[..., None], train_y, test_x[..., None], test_y


def _load_digits_upsampled():
    """sklearn's 1797 real 8x8 handwritten digits -> 28x28, replicated with
    deterministic sub-pixel shift augmentation up to MNIST-sized splits."""
    from sklearn.datasets import load_digits

    d = load_digits()
    imgs = d.images.astype(np.float32) / 16.0  # (1797, 8, 8) in [0,1]
    labels = d.target.astype(np.int32)
    # deterministic split: every 7th example to test
    test_mask = np.arange(len(imgs)) % 7 == 0
    base = {
        'train': (imgs[~test_mask], labels[~test_mask]),
        'test': (imgs[test_mask], labels[test_mask]),
    }

    def expand(split_imgs, split_labels, n, seed):
        rng = np.random.RandomState(seed)
        idx = rng.randint(0, len(split_imgs), size=n)
        x = jnp.asarray(split_imgs[idx])[..., None]  # (n, 8, 8, 1)
        up = jax.image.resize(x, (n, 24, 24, 1), method='bilinear')
        # random integer placement inside the 28x28 canvas (MNIST-like margins)
        out = np.zeros((n, 28, 28, 1), np.float32)
        offs = rng.randint(0, 5, size=(n, 2))
        up_np = np.asarray(up)
        for dy in range(5):
            for dx in range(5):
                m = (offs[:, 0] == dy) & (offs[:, 1] == dx)
                out[m, dy : dy + 24, dx : dx + 24, :] = up_np[m]
        return np.clip(out, 0.0, 1.0), split_labels[idx].astype(np.int32)

    train_x, train_y = expand(*base['train'], TRAIN_N, seed=0)
    test_x, test_y = expand(*base['test'], TEST_N, seed=1)
    return train_x, train_y, test_x, test_y


def _load_synthetic():
    """Last-resort procedural data: blurred random rectangles per class."""
    rng = np.random.RandomState(0)

    def make(n, seed):
        r = np.random.RandomState(seed)
        y = r.randint(0, 10, size=n).astype(np.int32)
        x = np.zeros((n, 28, 28, 1), np.float32)
        for i in range(n):
            cy, cx = 6 + y[i] % 5 * 3, 6 + y[i] // 5 * 8
            h, w = 6 + y[i] % 3 * 2, 4 + y[i] % 4
            x[i, cy : cy + h, cx : cx + w, 0] = 1.0
        x += 0.05 * r.randn(n, 28, 28, 1).astype(np.float32)
        return np.clip(x, 0, 1), y

    train_x, train_y = make(TRAIN_N, 0)
    test_x, test_y = make(TEST_N, 1)
    return train_x, train_y, test_x, test_y


def _apply_transforms(x, binarize, pad32):
    """Same transform semantics as the reference (gms/common.py:104-111):
    binarize -> {0,1}; else scale to [-1,1]; optional pad to 32x32."""
    x = jnp.asarray(x, jnp.float32)
    if binarize:
        x = (x > 0.5).astype(jnp.float32)
    else:
        x = 2.0 * x - 1.0
    if pad32:
        pad_val = 0.0 if binarize else -1.0
        x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), constant_values=pad_val)
    return x


class Dataset:
    """Full-dataset-on-device container with epoch iteration by shuffled
    reshape. Images are NHWC float32."""

    def __init__(self, train_x, train_y, test_x, test_y, bs, mesh=None):
        from generative_models_tpu.parallel import mesh as pmesh

        self.bs = bs
        self.mesh = mesh or pmesh.get_mesh()
        sh = pmesh.batch_sharding(self.mesh, ndim=4)
        sh1 = pmesh.batch_sharding(self.mesh, ndim=1)
        self.train_x = jax.device_put(train_x, sh)
        self.train_y = jax.device_put(train_y, sh1)
        self.test_x = jax.device_put(test_x, sh)
        self.test_y = jax.device_put(test_y, sh1)
        self.steps_per_epoch = train_x.shape[0] // bs  # drop_last semantics
        self.test_steps = test_x.shape[0] // bs

    def epoch_batches(self, rng, train=True):
        """Return (steps, bs, H, W, C) images and (steps, bs) labels, shuffled.
        Stays on device; feed straight into a lax.scan."""
        x, y = (self.train_x, self.train_y) if train else (self.test_x, self.test_y)
        steps = self.steps_per_epoch if train else self.test_steps
        n = steps * self.bs
        perm = jax.random.permutation(rng, x.shape[0])[:n]
        bx = x[perm].reshape(steps, self.bs, *x.shape[1:])
        by = y[perm].reshape(steps, self.bs)
        return bx, by

    def first_test_batch(self, epoch=0):
        """One test batch for model.evaluate. The reference sees a freshly
        shuffled batch each epoch (next(iter(test_ds)), gms/main.py:178-179);
        here the subjects rotate deterministically with the epoch seed."""
        idx = np.random.RandomState(epoch).permutation(self.test_x.shape[0])[
            : self.bs
        ]
        return self.test_x[idx], self.test_y[idx]


def load_mnist(G):
    """Load per --data_source / --data_dir, apply transforms, move on device.

    Returns a Dataset. Reference equivalent: gms/common.py:102-132.
    """
    source = G.get('data_source', 'auto')
    loaded = None
    chosen = source
    if source in ('auto', 'mnist'):
        loaded = _load_mnist_idx(G.get('data_dir', Path('./data/')))
        chosen = 'mnist' if loaded is not None else source
    if loaded is None and source in ('auto', 'digits'):
        try:
            loaded = _load_digits_upsampled()
            chosen = 'digits'
        except ImportError:
            loaded = None
    if loaded is None:
        loaded = _load_synthetic()
        chosen = 'synthetic'
    if chosen != 'mnist':
        print(f'[data] MNIST idx files not found; using fallback source: {chosen}')
    train_x, train_y, test_x, test_y = loaded
    train_x = _apply_transforms(train_x, G.binarize, G.pad32)
    test_x = _apply_transforms(test_x, G.binarize, G.pad32)
    if G.get('stream_data', 0):
        # host-streaming path (data/stream.py): the training split stays on
        # the host and batches prefetch to device — the pipeline shape for
        # datasets beyond HBM, exercised here at MNIST scale
        from generative_models_tpu.data.stream import StreamingDataset

        return StreamingDataset(
            np.asarray(train_x),
            np.asarray(train_y),
            np.asarray(test_x),
            test_y,
            G.bs,
            prefetch=G.get('prefetch_depth', 2),
        )
    return Dataset(np.asarray(train_x), train_y, np.asarray(test_x), test_y, G.bs)
