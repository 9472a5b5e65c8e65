"""Host-streaming data pipeline (data/stream.py): determinism, sharding,
prefetch-thread lifecycle, memmap-backed splits, and the CLI integration.

The reference's input pipeline is torch DataLoaders with per-step H2D
copies (gms/common.py:102-132, gms/main.py:208); this is the TPU-native
shape of that idea — batches staged onto the data-axis sharding by a
background thread — generalized to splits that don't fit in HBM."""

import threading

import jax
import numpy as np
import pytest

from generative_models_tpu.data.stream import StreamingDataset
from generative_models_tpu.parallel import make_mesh
from generative_models_tpu.parallel import mesh as pmesh


def _toy(n=96, nt=32, bs=8, seed=0):
    r = np.random.RandomState(seed)
    # image value i at sample i so content equality identifies samples
    train_x = np.broadcast_to(
        np.arange(n, dtype=np.float32)[:, None, None, None], (n, 4, 4, 1)
    ).copy()
    train_y = np.arange(n, dtype=np.int32) % 10
    test_x = r.rand(nt, 4, 4, 1).astype(np.float32)
    test_y = r.randint(0, 10, nt).astype(np.int32)
    return StreamingDataset(train_x, train_y, test_x, test_y, bs=bs)


def _epoch_ids(ds, key):
    """Collect the sample ids (encoded in pixel 0) of one streamed epoch."""
    ids, labels = [], []
    with ds.stream_epoch(key) as it:
        for x, y in it:
            ids.append(np.asarray(x)[:, 0, 0, 0].astype(np.int64))
            labels.append(np.asarray(y))
    return np.concatenate(ids), np.concatenate(labels)


def test_epoch_covers_split_once_deterministically():
    ds = _toy(n=96, bs=8)
    assert ds.steps_per_epoch == 12
    ids, labels = _epoch_ids(ds, jax.random.key(3))
    # one full shuffled pass: every sample exactly once, labels aligned
    assert sorted(ids.tolist()) == list(range(96))
    np.testing.assert_array_equal(labels, ids % 10)
    # not the identity order
    assert ids.tolist() != list(range(96))
    # same key -> same order; different key -> different order
    ids2, _ = _epoch_ids(ds, jax.random.key(3))
    np.testing.assert_array_equal(ids, ids2)
    ids3, _ = _epoch_ids(ds, jax.random.key(4))
    assert ids.tolist() != ids3.tolist()


def test_drop_last_semantics():
    ds = _toy(n=100, bs=8)  # 100 = 12*8 + 4
    assert ds.steps_per_epoch == 12
    ids, _ = _epoch_ids(ds, jax.random.key(0))
    assert len(ids) == 96 and len(set(ids.tolist())) == 96


def test_batches_arrive_with_data_axis_sharding():
    mesh = make_mesh('data:8')
    ds = StreamingDataset(
        np.zeros((64, 4, 4, 1), np.float32),
        np.zeros((64,), np.int32),
        np.zeros((16, 4, 4, 1), np.float32),
        np.zeros((16,), np.int32),
        bs=16,
        mesh=mesh,
    )
    with ds.stream_epoch(0) as it:
        x, y = next(it)
    assert x.sharding == pmesh.batch_sharding(mesh, ndim=4)
    assert y.sharding == pmesh.batch_sharding(mesh, ndim=1)
    assert len(x.sharding.device_set) == 8


def test_early_close_joins_producer_thread():
    ds = _toy(n=96, bs=8)
    before = threading.active_count()
    it = ds.stream_epoch(jax.random.key(0))
    next(it)  # producer is live and likely blocked on the bounded queue
    it.close()
    assert not it._thread.is_alive()
    assert threading.active_count() <= before + 1
    with pytest.raises(StopIteration):
        next(it)


def test_producer_error_propagates_to_consumer():
    armed = {'on': False}  # __init__ also runs the transform (test split)

    def bad_transform(b):
        if armed['on']:
            raise RuntimeError('disk on fire')
        return b

    ds = StreamingDataset(
        np.zeros((32, 4, 4, 1), np.float32),
        np.zeros((32,), np.int32),
        np.zeros((8, 4, 4, 1), np.float32),
        np.zeros((8,), np.int32),
        bs=8,
        transform=bad_transform,
    )
    armed['on'] = True
    with pytest.raises(RuntimeError, match='disk on fire'):
        with ds.stream_epoch(0) as it:
            list(it)


def test_transform_applies_to_train_and_test():
    ds = StreamingDataset(
        np.ones((16, 4, 4, 1), np.uint8),
        np.zeros((16,), np.int32),
        np.ones((8, 4, 4, 1), np.uint8),
        np.zeros((8,), np.int32),
        bs=8,
        transform=lambda b: b.astype(np.float32) * 0.5,
    )
    with ds.stream_epoch(0) as it:
        x, _ = next(it)
    assert x.dtype == np.float32 and float(np.asarray(x)[0, 0, 0, 0]) == 0.5
    assert float(np.asarray(ds.test_x)[0, 0, 0, 0]) == 0.5


def test_test_split_surface_matches_dataset():
    ds = _toy(n=64, nt=32, bs=8)
    bx, by = ds.epoch_batches(jax.random.key(0), train=False)
    assert bx.shape == (4, 8, 4, 4, 1) and by.shape == (4, 8)
    tx, ty = ds.first_test_batch(epoch=1)
    assert tx.shape == (8, 4, 4, 1) and ty.shape == (8,)
    with pytest.raises(ValueError, match='stream_epoch'):
        ds.epoch_batches(jax.random.key(0), train=True)


def test_memmap_backed_split(tmp_path):
    """The beyond-host-RAM story: a .npy memmap split streams without ever
    materializing the whole array."""
    path = tmp_path / 'big.npy'
    mm = np.lib.format.open_memmap(
        str(path), mode='w+', dtype=np.float32, shape=(64, 4, 4, 1)
    )
    mm[:] = np.arange(64, dtype=np.float32)[:, None, None, None]
    mm.flush()
    del mm
    ro = np.lib.format.open_memmap(str(path), mode='r')
    ds = StreamingDataset(
        ro,
        np.arange(64, dtype=np.int32) % 10,
        np.zeros((8, 4, 4, 1), np.float32),
        np.zeros((8,), np.int32),
        bs=8,
    )
    ids, _ = _epoch_ids(ds, jax.random.key(0))
    assert sorted(ids.tolist()) == list(range(64))


def test_cli_stream_data_end_to_end(tmp_path, monkeypatch):
    """--stream_data=1 routes main.py's train loop through stream_epoch."""
    import generative_models_tpu.data.mnist as mnist_mod
    from generative_models_tpu.main import main

    monkeypatch.setattr(mnist_mod, 'TRAIN_N', 64)
    monkeypatch.setattr(mnist_mod, 'TEST_N', 32)
    main(
        [
            '--model=vae',
            f'--logdir={tmp_path}',
            '--epochs=1',
            '--bs=8',
            '--hidden_size=24',
            '--data_source=synthetic',
            '--save_n=1',
            '--eval_heavy=0',
            '--stream_data=1',
        ]
    )
    assert (tmp_path / 'model.pt').exists()


def test_chunked_stream_identical_order_and_partial_tail():
    """--stream_chunk=k stages stacked (k, bs, ...) blocks whose
    concatenation is bit-identical to the chunk=1 stream under the same
    key (one permutation up front), including a partial final block when
    steps_per_epoch % k != 0."""
    ds = _toy(n=96, bs=8)  # 12 steps
    singles = []
    with ds.stream_epoch(7) as it:
        for x, y in it:
            singles.append((np.asarray(x), np.asarray(y)))
    chunks = []
    with ds.stream_epoch(7, chunk=5) as it:  # 5 + 5 + 2
        for cx, cy in it:
            chunks.append((np.asarray(cx), np.asarray(cy)))
    assert [c[0].shape[0] for c in chunks] == [5, 5, 2]
    cat_x = np.concatenate([c[0] for c in chunks])
    cat_y = np.concatenate([c[1] for c in chunks])
    np.testing.assert_array_equal(cat_x, np.stack([s[0] for s in singles]))
    np.testing.assert_array_equal(cat_y, np.stack([s[1] for s in singles]))


def test_chunked_blocks_carry_batch_dim_sharding():
    """Stacked blocks shard over 'data' on dim 1 (the bs axis), not the
    chunk axis — the k-step scan consumes them exactly like the on-device
    epoch tensor."""
    mesh = make_mesh('data:8', jax.devices())
    old = pmesh.get_mesh()
    pmesh.set_mesh(mesh)
    try:
        ds = _toy(n=96, bs=8)
        with ds.stream_epoch(1, chunk=4) as it:
            cx, cy = next(iter(it))
        assert tuple(cx.sharding.spec)[:2] == (None, 'data')
        assert tuple(cy.sharding.spec)[:2] == (None, 'data')
    finally:
        pmesh.set_mesh(old)


def test_cli_stream_chunk_end_to_end(tmp_path, monkeypatch):
    """--stream_data=1 --stream_chunk=4 trains through the chunked scan
    route and produces the same artifacts as the per-step route."""
    import generative_models_tpu.data.mnist as mdata
    from generative_models_tpu.main import main

    monkeypatch.setattr(mdata, 'TRAIN_N', 64)
    monkeypatch.setattr(mdata, 'TEST_N', 32)
    main([
        '--model=made', f'--logdir={tmp_path}', '--bs=16', '--epochs=1',
        '--hidden_size=32', '--data_source=synthetic', '--save_n=1',
        '--eval_heavy=0', '--stream_data=1', '--stream_chunk=4',
    ])
    assert (tmp_path / 'model.pt').exists()
