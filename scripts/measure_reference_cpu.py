"""Record the reference implementation's torch-CPU behavior for ALL 12 zoo
models: training throughput (steps/sec at the reference's default workload,
bs=64 — /root/reference/gms/main.py:22) and seeded short loss curves on the
shared deterministic parity data (generative_models_tpu/data/parity.py).

Output: reference_cpu_baseline.json
  { '<model>_steps_per_sec': float,            # bench.py vs_baseline ratios
    'curves': { model: {key, bs, steps, curve: [...] } },
    'meta': {...} }

The reference publishes no numbers (BASELINE.md); these measurements are the
baseline its north stars are scored against. Run with a clean CPU backend:

  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/measure_reference_cpu.py
"""

import json
import sys
import time
import types
from functools import partial
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, '/root/reference')
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# gms.common imports torchvision at module level just for MNIST loading; we
# only need the model classes, so stub it out (not installed here).
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

from gms.common import AttrDict  # noqa: E402

CURVE_BS = 32
TIME_BS = 64  # reference default workload (gms/main.py:22)

MAIN_DEFAULTS = dict(
    bs=64, hidden_size=256, lr=3e-4, class_cond=0, binarize=1, pad32=0,
    device='cpu',
)


def make_G(Model=None, **overrides):
    G = AttrDict(dict(MAIN_DEFAULTS))
    if Model is not None and hasattr(Model, 'DG'):
        for k, v in Model.DG.items():
            G[k] = v
    for k, v in overrides.items():
        G[k] = v
    return G


def _patch_cuda_free_diffusion():
    """The reference's broadcast_from_left hardcodes device='cuda'
    (diffusion_utils.py:126-130); re-route to plain broadcasting."""
    from gms.diffusion import diffusion_utils
    import gms.diffusion.gaussian_diffusion as gd

    def patched(x, shape):
        if isinstance(x, float):
            x = torch.tensor(x)
        return torch.broadcast_to(
            x.reshape(x.shape + (1,) * (len(shape) - x.ndim)), shape
        )

    diffusion_utils.broadcast_from_left = patched
    gd.broadcast_from_left = patched


def make_diffusion_stepper():
    """GaussianDiffusion + SimpleUnet + Adam — the reference DiffusionModel's
    train step minus CUDA AMP (diffusion_model.py:61-74), guide-conditioned,
    no label dropout (deterministic parity workload)."""
    from gms.diffusion.gaussian_diffusion import GaussianDiffusion
    from gms.diffusion.simple_unet import SimpleUnet

    net = SimpleUnet(128, 0.0)
    diffusion = GaussianDiffusion(mean_type='v', num_steps=250)
    optimizer = torch.optim.Adam(net.parameters(), lr=3e-4)

    def step(x, y):
        optimizer.zero_grad()
        metrics = diffusion.training_losses(net=partial(net, guide=y), x=x)
        loss = metrics['loss'].mean()
        loss.backward()
        optimizer.step()
        return {'loss': loss}

    return step


def model_specs():
    from gms.autoregs.gated_pixel_cnn import GatedPixelCNN
    from gms.autoregs.made import MADE
    from gms.autoregs.pixel_cnn import PixelCNN
    from gms.autoregs.pixel_transformer import PixelTransformer
    from gms.autoregs.rnn import RNN
    from gms.autoregs.wavenet import Wavenet
    from gms.arbiters.autoencoder import Autoencoder
    from gms.arbiters.classifier import Classifier
    from gms.gans.gan import GAN
    from gms.vaes.vae import VAE
    from gms.vaes.vqvae import VQVAE

    def std(Model, **kw):
        def make():
            torch.manual_seed(0)
            m = Model(G=make_G(Model, **kw))
            return m.train_step

        return make

    # name -> (make_stepper, primary metric key, binarize, curve steps, time n)
    return {
        'made': (std(MADE), 'nlogp', 1, 48, 10),
        'rnn': (std(RNN), 'nlogp', 1, 24, 5),
        'wavenet': (std(Wavenet), 'nlogp', 1, 24, 3),
        'pixel_cnn': (std(PixelCNN), 'nlogp', 1, 24, 3),
        'gated_pixel_cnn': (std(GatedPixelCNN), 'nlogp', 1, 24, 3),
        'pixel_transformer': (std(PixelTransformer), 'nlogp', 1, 20, 3),
        'vae': (std(VAE), 'vae_loss', 1, 48, 10),
        'vqvae': (std(VQVAE), 'vq_vae_loss', 1, 24, 3),
        'gan': (std(GAN, binarize=0), 'disc/loss', 0, 32, 5),
        'autoencoder': (std(Autoencoder, binarize=0), 'full_loss', 0, 48, 10),
        'classifier': (std(Classifier, binarize=0), 'cross_entropy_loss', 0, 48, 10),
        'diffusion': (
            lambda: (torch.manual_seed(0), make_diffusion_stepper())[1],
            'loss', 0, 20, 3,
        ),
    }


def to_torch(x_nhwc, y):
    return (
        torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2))),
        torch.from_numpy(np.asarray(y).astype(np.int64)),
    )


def main():
    from generative_models_tpu.data.parity import parity_batches

    _patch_cuda_free_diffusion()
    torch.set_num_threads(1)

    only = {a.split('=')[1] for a in sys.argv[1:] if a.startswith('--only=')}
    out_path = Path(__file__).parent.parent / 'reference_cpu_baseline.json'
    if only and out_path.exists():  # merge mode: re-record selected models
        results = json.loads(out_path.read_text())
        results.setdefault('curves', {})
    else:
        results = {'curves': {}, 'meta': {
            'curve_bs': CURVE_BS, 'time_bs': TIME_BS, 'data': 'digits-upsampled',
            'train_n': 4096, 'seed': 0,
        }}

    # shared parity batches, one set per binarize flag (48 steps x 32 = 1536)
    max_steps = 48
    batches = {
        b: parity_batches(4096, CURVE_BS, max_steps, binarize=b) for b in (0, 1)
    }

    for name, (make, key, binarize, steps, time_n) in model_specs().items():
        if only and name not in only:
            continue
        t_build = time.perf_counter()
        # ---- seeded loss curve on the shared data ----
        stepper = make()
        bx, by = batches[binarize]
        curve = []
        all_curves = {}
        torch.manual_seed(1)
        for i in range(steps):
            x, y = to_torch(bx[i], by[i])
            metrics = stepper(x, y)
            curve.append(float(metrics[key]))
            for k, v in metrics.items():
                try:
                    all_curves.setdefault(k, []).append(float(v))
                except (TypeError, ValueError):
                    pass
        results['curves'][name] = {
            'key': key, 'bs': CURVE_BS, 'steps': steps, 'binarize': binarize,
            'curve': curve, 'all': all_curves,
        }

        # ---- throughput at the reference default workload (bs=64) ----
        stepper = make()
        x64, y64 = to_torch(
            np.concatenate([bx[0], bx[1]], 0), np.concatenate([by[0], by[1]], 0)
        )
        stepper(x64, y64)  # warmup
        t0 = time.perf_counter()
        for _ in range(time_n):
            stepper(x64, y64)
        sps = time_n / (time.perf_counter() - t0)
        results[f'{name}_steps_per_sec'] = sps
        print(
            f'{name}: {sps:.4f} steps/s (bs=64), curve {curve[0]:.4f} -> '
            f'{curve[-1]:.4f} [{time.perf_counter() - t_build:.1f}s total]',
            flush=True,
        )

    out_path.write_text(json.dumps(results, indent=2))
    print('wrote', out_path)


if __name__ == '__main__':
    main()
