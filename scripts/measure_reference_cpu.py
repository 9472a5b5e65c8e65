"""One-time measurement of the reference implementation's torch-CPU training
throughput, recorded to reference_cpu_baseline.json for bench.py's
vs_baseline ratio.

Imports the reference read-only from /root/reference purely to time it (the
reference has no published numbers; BASELINE.md's north star is >=20x its CPU
steps/sec). Models whose imports need packages absent here (torchvision) are
timed through their torch modules directly.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, '/root/reference')

import torch  # noqa: E402

# gms.common imports torchvision at module level just for MNIST loading; we
# only need its model classes, so stub torchvision out (it is not installed).
import types  # noqa: E402

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


def time_diffusion(bs=64, hidden=128, n=5):
    from functools import partial

    from gms.diffusion.gaussian_diffusion import GaussianDiffusion
    from gms.diffusion.simple_unet import SimpleUnet

    net = SimpleUnet(hidden, 0.0)
    diffusion = GaussianDiffusion(mean_type='v', num_steps=250)
    optimizer = torch.optim.Adam(net.parameters(), lr=3e-4)
    x = torch.randn(bs, 1, 28, 28)
    y = torch.randint(0, 10, (bs,))

    def step():
        optimizer.zero_grad()
        metrics = diffusion.training_losses(net=partial(net, guide=y), x=x)
        loss = metrics['loss'].mean()
        loss.backward()
        optimizer.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    return n / (time.perf_counter() - t0)


def time_simple(model_ctor, flat=False, bs=64, n=5, binary=True):
    model = model_ctor()
    x = (torch.rand(bs, 1, 28, 28) > 0.5).float() if binary else torch.randn(
        bs, 1, 28, 28
    )
    y = torch.randint(0, 10, (bs,))
    model.train_step(x, y)
    t0 = time.perf_counter()
    for _ in range(n):
        model.train_step(x, y)
    return n / (time.perf_counter() - t0)


def main():
    # patch the reference's hardcoded cuda default in broadcast_from_left
    from gms.diffusion import diffusion_utils

    orig = diffusion_utils.broadcast_from_left

    def patched(x, shape):
        if isinstance(x, float):
            x = torch.tensor(x)
        return torch.broadcast_to(
            x.reshape(x.shape + (1,) * (len(shape) - x.ndim)), shape
        )

    diffusion_utils.broadcast_from_left = patched
    import gms.diffusion.gaussian_diffusion as gd

    gd.broadcast_from_left = patched

    from gms.common import AttrDict

    results = {}
    results['diffusion_steps_per_sec'] = time_diffusion()
    print('diffusion', results['diffusion_steps_per_sec'])

    from gms.autoregs.made import MADE

    G = AttrDict(hidden_size=1024, lr=3e-4, device='cpu')
    results['made_steps_per_sec'] = time_simple(lambda: MADE(G), n=10)
    print('made', results['made_steps_per_sec'])

    from gms.vaes.vae import VAE

    G = AttrDict(hidden_size=256, lr=3e-4, device='cpu', z_size=128, beta=1.0,
                 binarize=1)
    results['vae_steps_per_sec'] = time_simple(lambda: VAE(G), n=10)
    print('vae', results['vae_steps_per_sec'])

    from gms.autoregs.pixel_transformer import PixelTransformer

    G = AttrDict(hidden_size=256, lr=1e-3, device='cpu', n_layer=2, n_head=4,
                 n_embed=128)
    results['pixel_transformer_steps_per_sec'] = time_simple(
        lambda: PixelTransformer(G=G), n=10
    )
    print('pixel_transformer', results['pixel_transformer_steps_per_sec'])

    out = Path(__file__).parent.parent / 'reference_cpu_baseline.json'
    out.write_text(json.dumps(results, indent=2))
    print('wrote', out)


if __name__ == '__main__':
    main()
