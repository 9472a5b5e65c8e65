"""Real-data contingency rehearsal (VERDICT r4 item 9).

The environment has no real MNIST files, so every quality artifact rides
the fallback dataset. The DAY real idx files appear, the whole measurement
pipeline must work on them first try. This script rehearses that day end to
end on chip, against full-size synthesized idx files (60k x 784 train /
10k test, torchvision layout, scripts/make_idx_dataset.py):

  1. CLI training run with --data_source=mnist --data_dir=<idx dir>
     (NOT the fallback; the run aborts if the loader fell back), with
     --eval_heavy=1 through the shipped arbiters;
  2. results collection (scripts/collect_results.py::model_results) off
     the run's TB events;
  3. parity recording (tests/parity_common.py::run_ours) with
     GMT_PARITY_DATA pointing at the idx files — the same env var moves
     the torch reference recorder onto the same images.

Output: RESULTS.json['idx_rehearsal'] with 'data': 'mnist-idx'.

Usage (on chip): python scripts/idx_rehearsal.py [--epochs=3]
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / 'tests'))
sys.path.insert(0, str(REPO / 'scripts'))

DATA_DIR = Path('/tmp/idx_rehearsal/data')
LOGDIR = REPO / 'logs' / 'idx_rehearsal' / 'made'
MODEL = 'made'


def main(epochs=3):
    if not (DATA_DIR / 'MNIST' / 'raw' / 't10k-images-idx3-ubyte').exists():
        from make_idx_dataset import main as make_idx

        make_idx(DATA_DIR)

    # 1. CLI run on the idx path. load_mnist prints a fallback notice when
    # idx files are missing; assert the loader really took the mnist route.
    from generative_models_tpu.data import mnist as M
    from generative_models_tpu.main import main as cli

    loaded = M._load_mnist_idx(DATA_DIR)
    assert loaded is not None, 'idx files not found; rehearsal void'
    t0 = time.time()
    cli([
        f'--model={MODEL}',
        f'--logdir={LOGDIR}',
        f'--epochs={epochs}',
        f'--save_n={epochs}',
        '--eval_heavy=1',
        '--data_source=mnist',
        f'--data_dir={DATA_DIR}',
        '--keep_best=nlogp',
    ])
    train_sec = time.time() - t0

    # 2. results collection off the run's own TB events
    from collect_results import model_results

    row = model_results(LOGDIR, MODEL)
    row['data'] = 'mnist-idx'
    row['device'] = 'tpu'
    row['epochs'] = epochs
    row['wall_sec'] = round(train_sec, 1)

    # 3. parity recording on the same idx images (env var flips the shared
    # parity data module onto them; the torch recorder honors the same var)
    os.environ['GMT_PARITY_DATA'] = str(DATA_DIR)
    from parity_common import run_ours

    t0 = time.time()
    ours, ref = run_ours(MODEL, cap=True)
    row['parity_curve'] = {
        'model': MODEL,
        'data': 'mnist-idx',
        'steps': len(ours),
        'first_loss': ours[0],
        'last_loss': ours[-1],
        'record_sec': round(time.time() - t0, 1),
    }

    out = REPO / 'RESULTS.json'
    data = json.loads(out.read_text())
    data['idx_rehearsal'] = {
        'description': 'Full measurement pipeline rehearsed against '
            'synthesized full-size MNIST idx files (60k train / 10k test, '
            'torchvision layout, gz+raw): CLI train + eval_heavy via '
            '--data_source=mnist, TB results collection, parity recording '
            'with GMT_PARITY_DATA. Proves the idx path end to end, not '
            'just the loader (scripts/idx_rehearsal.py).',
        MODEL: row,
    }
    out.write_text(json.dumps(data, indent=1))
    print('idx_rehearsal:', json.dumps(row, default=str)[:400])
    print('wrote', out)


if __name__ == '__main__':
    ep = next((int(a.split('=')[1]) for a in sys.argv if a.startswith('--epochs=')), 3)
    main(ep)
