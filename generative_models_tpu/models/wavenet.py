"""Wavenet over 1-D-ified MNIST (reference: gms/autoregs/wavenet.py):
causal 'A' conv (kernel 2, pad 2, drop last) into 9 gated residual blocks
with dilations 2^0..2^8, 1x1 out conv, Bernoulli over pixels.

TPU-native: NWC layout with explicit left-pad dilated convs (XLA maps these
onto the MXU as implicit GEMMs); sampling = one jitted lax.scan of 784 full
forwards instead of the reference's host loop (wavenet.py:58-66).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_models_tpu.models.base import Autoreg
from generative_models_tpu.models.rnn import append_location
from generative_models_tpu.utils import dists, register
from generative_models_tpu.utils.config import AttrDict


class DilatedCausalConv1d(nn.Module):
    """mask_type 'A': pad 2 left, drop last output (strictly causal first
    layer); 'B': pad = dilation (sees self) — reference wavenet.py:70-89."""

    mask_type: str
    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        if self.mask_type == 'A':
            out = nn.Conv(
                self.features, (2,), kernel_dilation=(1,), padding=[(2, 0)]
            )(x)
            return out[:, :-1]
        out = nn.Conv(
            self.features, (2,), kernel_dilation=(self.dilation,),
            padding=[(self.dilation, 0)],
        )(x)
        return out


class GatedResidualBlock(nn.Module):
    """tanh/sigmoid-gated dilated conv + 1x1 residual (wavenet.py:92-107)."""

    res_channels: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        out = DilatedCausalConv1d('B', 2 * self.res_channels, self.dilation)(x)
        o1, o2 = jnp.split(out, 2, axis=-1)
        out = jnp.tanh(o1) * jax.nn.sigmoid(o2)
        return x + nn.Conv(self.res_channels, (1,))(out)


class WavenetNet(nn.Module):
    res_channels: int
    use_resblock: bool = True
    layer_size: int = 9  # largest dilation 2^8 covers the 784-pixel context

    @nn.compact
    def __call__(self, x):  # (B, T, 3) -> (B, T) logits
        x = DilatedCausalConv1d('A', self.res_channels, 1)(x)
        for i in range(self.layer_size):
            if self.use_resblock:
                x = GatedResidualBlock(self.res_channels, 2**i)(x)
            else:
                x = DilatedCausalConv1d('B', self.res_channels, 2**i)(x)
        return nn.Conv(1, (1,))(x)[..., 0]


@register
class Wavenet(Autoreg):
    DG = AttrDict()
    DG.use_resblock = 1
    DG.hidden_size = 320

    def __init__(self, G):
        self.side = 32 if G.get('pad32', 0) else 28
        self.canvas_size = self.side * self.side
        super().__init__(G)
        self._jit_sample = jax.jit(self.sample_fn, static_argnums=1)

    def build(self):
        return WavenetNet(
            res_channels=self.G.hidden_size, use_resblock=bool(self.G.use_resblock)
        )

    def example_input(self):
        return jnp.zeros((1, self.canvas_size, 3), jnp.float32)

    def _logits(self, params, x_img):
        bs = x_img.shape[0]
        x = append_location(x_img).reshape(bs, self.canvas_size, 3)
        logits = self.net.apply({'params': params}, x)
        return logits.reshape(bs, self.side, self.side, 1)

    def loss(self, params, x, y=None, rng=None, train=True):
        logits = self._logits(params, x)
        loss = -dists.Bernoulli(logits=logits).log_prob(x).mean()
        return loss, {'nlogp': loss}

    def sample_fn(self, state, n, rng):
        side = self.side

        def body(canvas, inp):
            i, key = inp
            r, c = i // side, i % side
            logits = self._logits(state.params, canvas)
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
