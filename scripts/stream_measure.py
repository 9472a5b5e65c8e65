"""Measure the host-streaming data tier on chip (VERDICT r4 item 2).

(a) Overhead: full 937-step bs=64 epoch per model, --stream_data=1
    (data/stream.py: host split + prefetch-thread device_put per step +
    per-step dispatch) vs the on-device epoch-in-one-jit path, same data,
    min-of-2 with the device_get fetch barrier. This is the measurement
    data/stream.py's module docstring promises and docs/PERF.md records.

(b) Capability: a np.memmap-backed uint8 synthetic split whose ON-DEVICE
    f32 footprint exceeds the chip's 15.75 GB HBM, trained end-to-end for
    one bounded segment (--steps) — a run the on-device tier cannot
    express (the epoch-in-one-jit path would have to device_put the whole
    f32 split). The memmap transform casts uint8 -> binarized f32 per
    batch, so host RAM holds only staged batches too.

Usage (on chip):
  python scripts/stream_measure.py overhead [model ...]   # default 3 models
  python scripts/stream_measure.py capability [--images N] [--steps K]

Writes/updates STREAM.json at the repo root.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
OUT = REPO / 'STREAM.json'

BS = 64
HBM_GB = 15.75


def _fetch(out):
    import jax

    return jax.device_get(
        jax.tree_util.tree_map(lambda a: a.sum() if hasattr(a, 'sum') else a, out)
    )


def _merge(key, payload):
    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    data[key] = payload
    OUT.write_text(json.dumps(data, indent=2))


def _make_model(name, bs=BS, **over):
    from generative_models_tpu.utils import discover_models
    from generative_models_tpu.utils.config import parse_args

    args = [f'--model={name}', f'--bs={bs}', '--logdir=/tmp/stream_logs']
    args += [f'--{k}={v}' for k, v in over.items()]
    return parse_args(args, discover_models=discover_models)


def overhead(models):
    import jax

    from generative_models_tpu.data import load_mnist
    from generative_models_tpu.data.stream import StreamingDataset

    results = {}
    for name in models:
        G, Model = _make_model(name)
        model = Model(G=G)
        ds = load_mnist(G)

        # on-device epoch-in-one-jit (the training default), min-of-2
        bx, by = ds.epoch_batches(jax.random.key(1))
        _fetch(model.train_epoch(bx, by))  # compile
        dev = []
        for k in (2, 3):
            t0 = time.perf_counter()
            bx, by = ds.epoch_batches(jax.random.key(k))
            _fetch(model.train_epoch(bx, by))
            dev.append(time.perf_counter() - t0)

        # streaming path: same host data, same step count, per-step dispatch
        host_x = np.asarray(ds.train_x)
        host_y = np.asarray(ds.train_y)
        sds = StreamingDataset(
            host_x, host_y, np.asarray(ds.test_x), np.asarray(ds.test_y),
            bs=G.bs, prefetch=int(G.get('prefetch_depth', 2)),
        )
        with sds.stream_epoch(11) as batches:  # compile the per-step path
            for x, y in batches:
                model.train_step(x, y)
                break
        stream = []
        for k in (12, 13):
            t0 = time.perf_counter()
            metrics = None
            with sds.stream_epoch(k) as batches:
                for x, y in batches:
                    metrics = model.train_step(x, y)
            _fetch(metrics)
            stream.append(time.perf_counter() - t0)

        # chunked streaming (--stream_chunk=16): stacked blocks through the
        # jitted 16-step scan — 16x fewer dispatch round-trips
        chunk = 16
        with sds.stream_epoch(14, chunk=chunk) as batches:  # compile shapes
            for cx, cy in batches:
                model.train_epoch(cx, cy)
        chunked = []
        for k in (15, 16):
            t0 = time.perf_counter()
            metrics = None
            with sds.stream_epoch(k, chunk=chunk) as batches:
                for cx, cy in batches:
                    metrics = model.train_epoch(cx, cy)
            _fetch(metrics)
            chunked.append(time.perf_counter() - t0)

        row = {
            'on_device_epoch_sec': min(dev),
            'stream_epoch_sec': min(stream),
            'overhead_x': min(stream) / min(dev),
            'stream_chunk16_epoch_sec': min(chunked),
            'chunk16_overhead_x': min(chunked) / min(dev),
            'steps': ds.steps_per_epoch,
            'bs': G.bs,
            'trials': 2,
            'estimator': 'min',
            'barrier': 'device_get',
        }
        results[name] = row
        print(f'[overhead] {name}: on-device {row["on_device_epoch_sec"]:.2f}s '
              f'stream {row["stream_epoch_sec"]:.2f}s '
              f'({row["overhead_x"]:.2f}x) '
              f'chunk16 {row["stream_chunk16_epoch_sec"]:.2f}s '
              f'({row["chunk16_overhead_x"]:.2f}x)', flush=True)
    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    data.setdefault('overhead', {}).update(results)
    _merge('overhead', data['overhead'])


def capability(images, steps):
    """Train made on a memmap split whose f32 device footprint > HBM."""
    import jax

    from generative_models_tpu.data.stream import StreamingDataset

    mm_path = Path('/tmp/stream_bighbm.u8.npy')
    f32_gb = images * 28 * 28 * 4 / 2**30
    assert f32_gb > HBM_GB, (
        f'--images {images} gives {f32_gb:.1f} GB f32 < {HBM_GB} GB HBM: '
        'not a capability demonstration'
    )
    if not mm_path.exists() or mm_path.stat().st_size < images * 784:
        print(f'[capability] writing {images} synthetic uint8 images '
              f'({images * 784 / 2**30:.1f} GB memmap)...', flush=True)
        mm = np.lib.format.open_memmap(
            mm_path, mode='w+', dtype=np.uint8, shape=(images, 28, 28, 1)
        )
        rng = np.random.RandomState(0)
        chunk = 200_000
        base = (rng.rand(chunk, 28, 28, 1) * 255).astype(np.uint8)
        for i in range(0, images, chunk):
            j = min(images, i + chunk)
            mm[i:j] = base[: j - i]
        mm.flush()
        del mm

    train_x = np.load(mm_path, mmap_mode='r')
    train_y = np.zeros(images, np.int32)  # unconditional model; labels unused
    test = (np.random.RandomState(1).rand(512, 28, 28, 1) > 0.5).astype(
        np.float32
    )
    transform = lambda b: (np.asarray(b) > 127).astype(np.float32)  # noqa: E731

    bs = 512
    G, Model = _make_model('made', bs=bs)
    model = Model(G=G)
    sds = StreamingDataset(
        train_x, train_y, test, np.zeros(512, np.int32), bs=bs,
        prefetch=4, transform=transform,
    )
    total = sds.steps_per_epoch
    steps = min(steps, total)
    t0 = time.perf_counter()
    done = 0
    metrics = None
    with sds.stream_epoch(0) as batches:
        for x, y in batches:
            metrics = model.train_step(x, y)
            done += 1
            if done % 500 == 0:
                print(f'[capability] step {done}/{steps} '
                      f'({time.perf_counter() - t0:.0f}s)', flush=True)
            if done >= steps:
                break
    final = _fetch(metrics)
    dt = time.perf_counter() - t0
    row = {
        'model': 'made',
        'images': images,
        'disk_gb_uint8': round(images * 784 / 2**30, 2),
        'device_f32_gb': round(f32_gb, 2),
        'hbm_gb': HBM_GB,
        'bs': bs,
        'steps_run': done,
        'steps_per_epoch': total,
        'wall_sec': dt,
        'imgs_per_sec': done * bs / dt,
        'final_nlogp': float(final['nlogp']),
        'note': 'uint8 memmap split; on-device tier would need the f32 '
                'split resident (device_f32_gb > hbm_gb) — impossible; '
                'streaming trains it with host RAM holding only staged '
                'batches',
    }
    _merge('capability', row)
    print(f'[capability] {done} steps x bs={bs} over a '
          f'{row["device_f32_gb"]} GB-equivalent split: {dt:.0f}s '
          f'({row["imgs_per_sec"]:.0f} imgs/s), nlogp {row["final_nlogp"]:.4f}',
          flush=True)


if __name__ == '__main__':
    argv = [a for a in sys.argv[1:]]
    if argv and argv[0] == 'overhead':
        models = [a for a in argv[1:] if not a.startswith('--')] or [
            'made', 'gated_pixel_cnn', 'diffusion_model'
        ]
        overhead(models)
    elif argv and argv[0] == 'capability':
        def opt(name, default):
            for a in argv:
                if a.startswith(f'--{name}='):
                    return int(a.split('=', 1)[1])
            return default
        capability(opt('images', 5_400_000), opt('steps', 4000))
    else:
        sys.exit('usage: stream_measure.py overhead|capability [...]')
    print('wrote', OUT)
