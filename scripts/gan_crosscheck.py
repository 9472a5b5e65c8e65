"""Cross-framework GAN collapse cross-check (VERDICT r4 item 1).

Question: the reference-exact DCGAN config collapses on the fallback dataset
(RESULTS.json gan: disc loss -> 0, gen loss -> 10, 50-epoch FID 0.787,
precision/recall 0.0), and round 4 shipped an opt-in fix (--disc_lr=1e-5)
without ever demonstrating that the TORCH reference collapses the same way
on the same data. Until that run exists, "the data is degenerate" is still
consistent with a subtle GAN bug on our side.

Round 5 found exactly one such bug while building this check: our BatchNorm
scale init was N(0, 0.02) (the conv initializer) where the reference's
weights_init uses N(1.0, 0.02) (gms/gans/gan.py:115-121). So this script
records THREE trajectories on the identical fallback dataset, identical
batch order, aligned step checkpoints:

  --ref          torch-CPU reference DCGAN (/root/reference/gms/gans/gan.py)
  --ours         our GAN, fixed BN-scale init (models/gan.py round 5+)
  --ours-legacy  our GAN with the round-1..4 zero-centered BN-scale init

At each checkpoint: windowed disc/gen loss means + 512 generator samples.
FID is scored for all sides by the SAME shipped jax autoencoder arbiter
(--score pass for the torch samples, so the 2.5h torch run never needs the
chip tunnel). Output: gan_crosscheck.json.

Usage:
  python scripts/gan_crosscheck.py --ref    # torch CPU, ~3.2s/step: background
  python scripts/gan_crosscheck.py --ours         # chip
  python scripts/gan_crosscheck.py --ours-legacy  # chip
  python scripts/gan_crosscheck.py --score  # FID for the stored --ref samples
"""

import json
import sys
import time
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
OUT = REPO / 'gan_crosscheck.json'
REF_NPZ = REPO / 'logs' / 'gan_crosscheck_ref_samples.npz'

# aligned checkpoints in steps of bs=64 (937 steps = 1 fallback epoch); the
# recorded collapse onset is "by epoch ~3" so the torch run goes to 2810.
# Our side is cheap on chip and continues to epoch 10 (the round-4 fid_best
# epoch) to see whether the fixed init moves the whole trajectory.
CHECKPOINTS = [50, 100, 200, 400, 800, 1400, 1875, 2340, 2810]
OURS_EXTRA = [4685, 7028, 9370]
BS = 64
SEED = 0
FID_N = 512
H = 256  # zoo run config (logs/zoo50/gan/hps.yaml)


def load_data():
    """GAN transforms: binarize=0 -> [-1,1] (reference gms/common.py:104-110,
    ours data/mnist.py::_apply_transforms)."""
    from generative_models_tpu.data.mnist import _load_digits_upsampled

    train_x, train_y, test_x, test_y = _load_digits_upsampled()
    to_pm1 = lambda x: (2.0 * np.asarray(x, np.float32) - 1.0)  # noqa: E731
    return to_pm1(train_x), to_pm1(test_x)[:FID_N]


def batch_order(n_train, steps):
    rng = np.random.RandomState(SEED)
    idx = rng.permutation(n_train)
    need = steps * BS
    while len(idx) < need:
        idx = np.concatenate([idx, rng.permutation(n_train)])
    return idx[:need].reshape(steps, BS)


def _merge(side, payload):
    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    data.setdefault('meta', {
        'data': 'digits-upsampled, [-1,1] (binarize=0 transforms)',
        'bs': BS, 'seed': SEED, 'hidden_size': H, 'lr': 5e-5,
        'fid_n': FID_N,
        'fid_scorer': 'shipped jax autoencoder arbiter (weights/autoencoder.pt)',
        'sampling': 'each side its native contract: torch reference samples '
                    'with BN in train mode (gms/gans/gan.py:56-58 never calls '
                    'eval()); ours samples with running stats (train=False)',
    })
    data[side] = payload
    OUT.write_text(json.dumps(data, indent=2))


def _fid_scorer():
    from generative_models_tpu.models.arbiters import load_arbiter
    from generative_models_tpu.utils import metrics as M

    import jax.numpy as jnp

    ae = load_arbiter(REPO / 'weights' / 'autoencoder.pt')
    _, test_x = load_data()
    z_real = ae.apply(jnp.asarray(test_x))

    def score(samples):
        z = ae.apply(jnp.asarray(samples, jnp.float32))
        return float(M.compute_fid(z, z_real))

    return score


def run_reference():
    import torch

    # gms.common imports torchvision only for MNIST loading; stub it
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

    from gms.common import AttrDict
    from gms.gans.gan import GAN

    train_x, _ = load_data()
    G = AttrDict(dict(
        bs=BS, hidden_size=H, lr=5e-5, noise_size=128, binarize=0, pad32=0,
        device='cpu', class_cond=0,
    ))
    torch.manual_seed(SEED)
    model = GAN(G=G)
    steps = CHECKPOINTS[-1]
    order = batch_order(len(train_x), steps)

    rec = {'steps': [], 'disc_loss': [], 'gen_loss': [], 'sec': []}
    window = {'d': [], 'g': []}
    samples = {}
    t0 = time.perf_counter()
    for s in range(steps):
        xb = train_x[order[s]].transpose(0, 3, 1, 2)
        metrics = model.train_step(torch.from_numpy(np.ascontiguousarray(xb)))
        window['d'].append(float(metrics['disc/loss']))
        window['g'].append(float(metrics['gen/loss']))
        if (s + 1) in CHECKPOINTS:
            with torch.no_grad():
                # native reference sampling contract: BN stays in train mode
                samp = model.sample(FID_N).cpu().numpy()
            samples[str(s + 1)] = samp.transpose(0, 2, 3, 1)
            rec['steps'].append(s + 1)
            rec['disc_loss'].append(float(np.mean(window['d'])))
            rec['gen_loss'].append(float(np.mean(window['g'])))
            rec['sec'].append(time.perf_counter() - t0)
            window = {'d': [], 'g': []}
            REF_NPZ.parent.mkdir(parents=True, exist_ok=True)
            np.savez_compressed(REF_NPZ, **samples)
            _merge('reference', rec)
            print(f"[ref] step {s + 1}: disc {rec['disc_loss'][-1]:.4f} "
                  f"gen {rec['gen_loss'][-1]:.4f} ({rec['sec'][-1]:.0f}s)",
                  flush=True)
    return rec


def score_reference():
    score = _fid_scorer()
    data = json.loads(OUT.read_text())
    rec = data['reference']
    npz = np.load(REF_NPZ)
    rec['fid'] = [score(npz[str(s)]) for s in rec['steps']]
    _merge('reference', rec)
    for s, f in zip(rec['steps'], rec['fid']):
        print(f'[ref] step {s}: fid {f:.4f}', flush=True)


def run_ours(legacy):
    import generative_models_tpu.models.gan as gan_mod

    if legacy:
        # round-1..4 deviation under test: conv initializer on BN scales
        gan_mod.dcgan_bn_scale_init = (
            lambda scale=0.02: gan_mod.nn.initializers.normal(stddev=scale)
        )
    import jax

    from generative_models_tpu.utils.config import global_defaults

    train_x, _ = load_data()
    G = global_defaults()
    for k, v in gan_mod.GAN.DG.items():
        G[k] = v
    G.bs = BS
    G.hidden_size = H
    G.logdir = Path('/tmp/gan_crosscheck')
    model = gan_mod.GAN(G=G)
    score = _fid_scorer()
    checkpoints = CHECKPOINTS + OURS_EXTRA
    steps = checkpoints[-1]
    order = batch_order(len(train_x), steps)

    rec = {'steps': [], 'disc_loss': [], 'gen_loss': [], 'fid': [], 'sec': []}
    window = []
    t0 = time.perf_counter()
    for s in range(steps):
        window.append(model.train_step(train_x[order[s]], None))
        if (s + 1) in checkpoints:
            w = jax.device_get(window)
            samp = np.asarray(model.sample(FID_N))
            rec['steps'].append(s + 1)
            rec['disc_loss'].append(float(np.mean([m['disc/loss'] for m in w])))
            rec['gen_loss'].append(float(np.mean([m['gen/loss'] for m in w])))
            rec['fid'].append(score(samp))
            rec['sec'].append(time.perf_counter() - t0)
            window = []
            _merge('ours_legacy' if legacy else 'ours', rec)
            print(f"[{'ours-legacy' if legacy else 'ours'}] step {s + 1}: "
                  f"disc {rec['disc_loss'][-1]:.4f} gen {rec['gen_loss'][-1]:.4f} "
                  f"fid {rec['fid'][-1]:.4f} ({rec['sec'][-1]:.0f}s)", flush=True)
    return rec


if __name__ == '__main__':
    if '--ref' in sys.argv:
        run_reference()
    elif '--score' in sys.argv:
        score_reference()
    elif '--ours-legacy' in sys.argv:
        run_ours(legacy=True)
    elif '--ours' in sys.argv:
        run_ours(legacy=False)
    else:
        sys.exit('pass --ref | --ours | --ours-legacy | --score')
    print('wrote', OUT)
