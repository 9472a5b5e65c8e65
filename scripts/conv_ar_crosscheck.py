"""Cross-framework conv-AR bits/dim cross-check (VERDICT r3 item 1).

Question: wavenet/pixel_cnn/gated_pixel_cnn record ~0.33-0.36 test bits/dim
in RESULTS.json versus made's 0.162 — on binarized data the PixelCNN family
"should" beat a masked MLP, so either the runs are under-trained, the
fallback-digits distribution favors full-context models, or our conv stacks
hide a correctness bug.

Experiment: train the REFERENCE torch-CPU models (made, wavenet, pixel_cnn,
gated_pixel_cnn — /root/reference/gms/autoregs/*) on the exact same
digits-upsampled binarized dataset our zoo runs used
(generative_models_tpu/data/mnist.py::_load_digits_upsampled), bs=64, each
model's own DG hyperparameters, and record test-set bits/dim on a fixed
512-image test subset at aligned step checkpoints. The twin recorder for our
framework is --ours (run it on the chip; XLA-CPU convs are too slow).

If the reference reproduces the same ordering at aligned steps (conv models
above made), the anomaly is data/schedule, not our bug. Output:
conv_ar_crosscheck.json {'reference'|'ours': {model: {steps: [...], bpd: [...]}}}

Usage:
  python scripts/conv_ar_crosscheck.py --ref   # torch CPU (slow, background)
  python scripts/conv_ar_crosscheck.py --ours  # our framework (run on chip)
"""

import json
import math
import sys
import time
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
OUT = REPO / 'conv_ar_crosscheck.json'

# aligned checkpoints (steps of bs=64); made is cheap so it goes further to
# show where its curve flattens
CONV_CHECKPOINTS = [25, 50, 75, 100, 150]
MADE_CHECKPOINTS = [25, 50, 75, 100, 150, 300, 600, 1000]
TEST_N = 512
BS = 64
SEED = 0


def load_data():
    from generative_models_tpu.data.mnist import _load_digits_upsampled

    train_x, train_y, test_x, test_y = _load_digits_upsampled()
    binarize = lambda x: (x > 0.5).astype(np.float32)  # noqa: E731
    return (
        binarize(np.asarray(train_x)),
        np.asarray(train_y),
        binarize(np.asarray(test_x))[:TEST_N],
        np.asarray(test_y)[:TEST_N],
    )


def batch_order(n_train, steps):
    rng = np.random.RandomState(SEED)
    idx = rng.permutation(n_train)
    need = steps * BS
    while len(idx) < need:
        idx = np.concatenate([idx, rng.permutation(n_train)])
    return idx[:need].reshape(steps, BS)


def run_reference(models):
    import torch

    # gms.common imports torchvision just for MNIST loading; stub it
    _tv = types.ModuleType('torchvision')
    _tr = types.ModuleType('torchvision.transforms')
    _tr.ToTensor = object
    _tr.Compose = lambda x: x
    _ds = types.ModuleType('torchvision.datasets')
    _ds.MNIST = object
    _tv.transforms = _tr
    _tv.datasets = _ds
    sys.modules.setdefault('torchvision', _tv)
    sys.modules.setdefault('torchvision.transforms', _tr)
    sys.modules.setdefault('torchvision.datasets', _ds)
    sys.path.insert(0, '/root/reference')

    from gms.autoregs.gated_pixel_cnn import GatedPixelCNN
    from gms.autoregs.made import MADE
    from gms.autoregs.pixel_cnn import PixelCNN
    from gms.autoregs.wavenet import Wavenet
    from gms.common import AttrDict

    zoo = {
        'made': MADE,
        'wavenet': Wavenet,
        'pixel_cnn': PixelCNN,
        'gated_pixel_cnn': GatedPixelCNN,
    }
    train_x, train_y, test_x, _ = load_data()
    tx = torch.from_numpy(np.ascontiguousarray(test_x.transpose(0, 3, 1, 2)))

    results = {}
    for name in models:
        Model = zoo[name]
        G = AttrDict(
            dict(bs=BS, hidden_size=256, lr=3e-4, class_cond=0, binarize=1,
                 pad32=0, device='cpu')
        )
        for k, v in getattr(Model, 'DG', {}).items():
            G[k] = v
        torch.manual_seed(SEED)
        model = Model(G=G)
        checkpoints = MADE_CHECKPOINTS if name == 'made' else CONV_CHECKPOINTS
        steps = checkpoints[-1]
        order = batch_order(len(train_x), steps)

        def test_bpd():
            model.eval()
            with torch.no_grad():
                tot, cnt = 0.0, 0
                for i in range(0, len(tx), BS):
                    xb = tx[i : i + BS]
                    loss, _ = model.loss(xb)
                    tot += float(loss) * len(xb)
                    cnt += len(xb)
            model.train()
            return tot / cnt / math.log(2)

        rec = {'steps': [], 'bpd': [], 'sec': []}
        t0 = time.perf_counter()
        for s in range(steps):
            xb = train_x[order[s]].transpose(0, 3, 1, 2)
            yb = train_y[order[s]].astype(np.int64)
            model.train_step(
                torch.from_numpy(np.ascontiguousarray(xb)),
                torch.from_numpy(yb),
            )
            if (s + 1) in checkpoints:
                bpd = test_bpd()
                rec['steps'].append(s + 1)
                rec['bpd'].append(bpd)
                rec['sec'].append(time.perf_counter() - t0)
                print(f'[ref] {name} step {s + 1}: {bpd:.4f} bpd '
                      f'({rec["sec"][-1]:.0f}s)', flush=True)
        results[name] = rec
        _merge('reference', {name: rec})
    return results


def run_ours(models):
    import jax

    from generative_models_tpu.utils import discover_models
    from generative_models_tpu.utils.config import global_defaults

    train_x, train_y, test_x, _ = load_data()
    registry = discover_models()
    results = {}
    for name in models:
        Model = registry[name]
        G = global_defaults()
        for k, v in Model.DG.items():
            G[k] = v
        G.bs = BS
        np.random.seed(SEED)
        model = Model(G=G)
        checkpoints = MADE_CHECKPOINTS if name == 'made' else CONV_CHECKPOINTS
        steps = checkpoints[-1]
        order = batch_order(len(train_x), steps)

        def test_bpd():
            tot, cnt = 0.0, 0
            for i in range(0, len(test_x), BS):
                xb = test_x[i : i + BS]
                metrics = model.eval_loss(xb, None)
                tot += float(metrics['nlogp']) * len(xb)
                cnt += len(xb)
            return tot / cnt / math.log(2)

        rec = {'steps': [], 'bpd': [], 'sec': []}
        t0 = time.perf_counter()
        for s in range(steps):
            xb = train_x[order[s]]
            yb = train_y[order[s]]
            model.train_step(xb, yb)
            if (s + 1) in checkpoints:
                jax.block_until_ready(model.state.params)
                bpd = test_bpd()
                rec['steps'].append(s + 1)
                rec['bpd'].append(bpd)
                rec['sec'].append(time.perf_counter() - t0)
                print(f'[ours] {name} step {s + 1}: {bpd:.4f} bpd '
                      f'({rec["sec"][-1]:.0f}s)', flush=True)
        results[name] = rec
        _merge('ours', {name: rec})
    return results


def _merge(side, update):
    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    data.setdefault('meta', {
        'data': 'digits-upsampled binarized', 'bs': BS, 'test_n': TEST_N,
        'seed': SEED,
    })
    data.setdefault(side, {}).update(update)
    OUT.write_text(json.dumps(data, indent=2))


if __name__ == '__main__':
    default_models = ['made', 'pixel_cnn', 'gated_pixel_cnn', 'wavenet']
    models = [a for a in sys.argv[1:] if not a.startswith('--')] or default_models
    if '--ours' in sys.argv:
        run_ours(models)
    else:
        run_reference(models)
    print('wrote', OUT)
