"""PixelCNN (reference: gms/autoregs/pixel_cnn.py): masked 2-D convs
(A mask for the input layer, B thereafter), channels-last LayerNorm, ReLU
stack, two 1x1 B-convs on top, Bernoulli over pixels.

TPU-native: NHWC layout means the reference's permute-LayerNorm-permute
wrapper (pixel_cnn.py:137-144) disappears — LayerNorm is native on the last
axis. Masks are pure constants multiplied into the conv kernel at apply time
(the reference mutates weights in-place per forward in the gated variant).
Sampling is one jitted 784-step lax.scan of full forwards.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.models.base import Autoreg
from generative_models_tpu.utils import dists, register
from generative_models_tpu.utils.config import AttrDict


def pixelcnn_mask(k, mask_type):
    """(k, k, 1, 1) raster-causal mask in HWIO layout (reference:
    pixel_cnn.py:103-108): rows above center all 1, center row left-of-center
    1, center itself only for type B."""
    m = np.zeros((k, k, 1, 1), np.float32)
    m[: k // 2, :] = 1.0
    m[k // 2, : k // 2] = 1.0
    if mask_type == 'B':
        m[k // 2, k // 2] = 1.0
    return jnp.asarray(m)


class MaskConv2d(nn.Module):
    mask_type: str
    features: int
    kernel_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            'kernel',
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
        )
        mask = pixelcnn_mask(k, self.mask_type)
        y = jax.lax.conv_general_dilated(
            x, kernel * mask, window_strides=(1, 1), padding='SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        )
        if self.use_bias:
            y = y + self.param('bias', nn.initializers.zeros, (self.features,))
        return y


class PixelResBlock(nn.Module):
    """bottleneck 1x1 -> masked 7x7 -> 1x1 with skip (pixel_cnn.py:111-134)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = MaskConv2d('B', self.channels // 2, 1)(h)
        h = nn.relu(h)
        h = MaskConv2d('B', self.channels // 2, 7)(h)
        h = nn.relu(h)
        h = MaskConv2d('B', self.channels, 1)(h)
        return x + h


class PixelCNNNet(nn.Module):
    n_filters: int
    n_layers: int
    kernel_size: int
    use_resblock: bool

    @nn.compact
    def __call__(self, x):  # (B, H, W, 1) -> logits same shape
        x = MaskConv2d('A', self.n_filters, self.kernel_size)(x)
        for _ in range(self.n_layers):
            x = nn.LayerNorm()(x)
            x = nn.relu(x)
            if self.use_resblock:
                x = PixelResBlock(self.n_filters)(x)
            else:
                x = MaskConv2d('B', self.n_filters, self.kernel_size)(x)
        x = nn.relu(x)
        x = MaskConv2d('B', self.n_filters, 1)(x)
        x = nn.relu(x)
        x = MaskConv2d('B', 1, 1)(x)
        return x


@register
class PixelCNN(Autoreg):
    DG = AttrDict()
    DG.n_filters = 128
    DG.n_layers = 5
    DG.kernel_size = 7
    DG.use_resblock = 0
    DG.lr = 1e-4

    def __init__(self, G):
        self.side = 32 if G.get('pad32', 0) else 28
        self.canvas_size = self.side * self.side
        super().__init__(G)
        self._jit_sample = jax.jit(self.sample_fn, static_argnums=1)

    def build(self):
        return PixelCNNNet(
            n_filters=self.G.n_filters,
            n_layers=self.G.n_layers,
            kernel_size=self.G.kernel_size,
            use_resblock=bool(self.G.use_resblock),
        )

    def loss(self, params, x, y=None, rng=None, train=True):
        logits = self.net.apply({'params': params}, x)
        loss = -dists.Bernoulli(logits=logits).log_prob(x).mean()
        return loss, {'nlogp': loss}

    def sample_fn(self, state, n, rng):
        side = self.side

        def body(canvas, inp):
            i, key = inp
            r, c = i // side, i % side
            logits = self.net.apply({'params': state.params}, canvas)
            pix = dists.Bernoulli(logits=logits[:, r, c, 0]).sample(key)
            canvas = canvas.at[:, r, c, 0].set(pix)
            return canvas, canvas

        keys = jax.random.split(rng, self.canvas_size)
        canvas0 = jnp.zeros((n, side, side, 1), jnp.float32)
        samples, frames = jax.lax.scan(
            body, canvas0, (jnp.arange(self.canvas_size), keys)
        )
        return samples, frames

    def sample(self, n):
        return self._jit_sample(self.state, n, self.next_rng())
