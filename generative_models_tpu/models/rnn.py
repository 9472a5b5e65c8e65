"""Pixel-RNN: LSTM over 784 pixels (reference: gms/autoregs/rnn.py).

TPU-native: the LSTM cell is an explicit fused gate computation scanned with
nn.scan over the sequence (training) and carried step-by-step through a
lax.scan for sampling — the reference's host-driven 784-iteration sampling
loop (rnn.py:61-74) becomes one jitted scan.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_models_tpu.models.base import Autoreg
from generative_models_tpu.utils import dists, register
from generative_models_tpu.utils.config import AttrDict


def location_grid(side=28):
    """(side, side, 2) channels: (row/(side-1), col/(side-1)) — matches the
    reference's append_location meshgrid (gms/common.py:235-240)."""
    r = jnp.linspace(0, 1, side)
    rows, cols = jnp.meshgrid(r, r, indexing='ij')
    return jnp.stack([rows, cols], -1)


def append_location(x):
    """(B, H, W, C) -> (B, H, W, C+2) with normalized xy coords."""
    b, h, w, _ = x.shape
    grid = jnp.broadcast_to(location_grid(h)[None], (b, h, w, 2))
    return jnp.concatenate([x, grid], -1)


class LSTMPixelNet(nn.Module):
    hidden: int
    in_channels: int

    def setup(self):
        # fused input/hidden projections: gate order (i, f, g, o) like torch
        self.wi = nn.Dense(4 * self.hidden, name='wi')
        self.wh = nn.Dense(4 * self.hidden, use_bias=False, name='wh')
        self.fc = nn.Dense(1, name='fc')

    def cell(self, carry, x_t):
        h, c = carry
        gates = self.wi(x_t) + self.wh(h)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    def __call__(self, x_seq):
        """Teacher-forced full sequence: (B, T, C) -> (B, T) logits."""
        bs = x_seq.shape[0]
        carry = (
            jnp.zeros((bs, self.hidden), x_seq.dtype),
            jnp.zeros((bs, self.hidden), x_seq.dtype),
        )
        scanned = nn.scan(
            lambda mdl, carry, x: mdl.cell(carry, x),
            variable_broadcast='params',
            split_rngs={'params': False},
            in_axes=1,
            out_axes=1,
        )
        _, hs = scanned(self, carry, x_seq)
        return self.fc(hs)[..., 0]

    def step(self, carry, x_t):
        carry, h = self.cell(carry, x_t)
        return carry, self.fc(h)[..., 0]


@register
class RNN(Autoreg):
    DG = AttrDict()
    DG.append_loc = 1  # reference rnn.py:11 (hidden_size stays the main
    # default 256, matching the reference's RNN workload)

    def __init__(self, G):
        self.side = 32 if G.get('pad32', 0) else 28
        self.canvas_size = self.side * self.side
        self.in_channels = 3 if G.append_loc else 1
        super().__init__(G)
        self._jit_sample = jax.jit(self.sample_fn, static_argnums=(1, 3))

    def build(self):
        return LSTMPixelNet(hidden=self.G.hidden_size, in_channels=self.in_channels)

    def example_input(self):
        return jnp.zeros((1, self.canvas_size, self.in_channels), jnp.float32)

    def loss(self, params, inp, y=None, rng=None, train=True):
        bs = inp.shape[0]
        x = append_location(inp) if self.G.append_loc else inp
        x = x.reshape(bs, self.canvas_size, self.in_channels)
        # right-shift with a zero start token (reference rnn.py:35-38)
        x = jnp.concatenate(
            [jnp.zeros((bs, 1, self.in_channels), x.dtype), x[:, :-1]], axis=1
        )
        logits = self.net.apply({'params': params}, x)
        loss = -dists.Bernoulli(
            logits=logits.reshape(bs, self.side, self.side, 1)
        ).log_prob(inp).mean()
        return loss, {'nlogp': loss}

    def sample_fn(self, state, n, rng, with_frames=True):
        side = self.side
        H = self.G.hidden_size

        def body(carry, inp):
            (h, c), x_t = carry
            i, key = inp
            (h, c), logit = self.net.apply(
                {'params': state.params}, (h, c), x_t, method=LSTMPixelNet.step
            )
            pix = dists.Bernoulli(logits=logit).sample(key)  # (n,)
            if self.G.append_loc:
                loc = jnp.stack(
                    [(i // side) / (side - 1), (i % side) / (side - 1)]
                ).astype(jnp.float32)
                nxt = jnp.concatenate(
                    [pix[:, None], jnp.broadcast_to(loc[None], (n, 2))], -1
                )
            else:
                nxt = pix[:, None]
            return ((h, c), nxt), pix

        carry0 = (
            (jnp.zeros((n, H)), jnp.zeros((n, H))),
            jnp.zeros((n, self.in_channels)),
        )
        keys = jax.random.split(rng, self.canvas_size)
        _, pixels = jax.lax.scan(
            body, carry0, (jnp.arange(self.canvas_size), keys)
        )  # (T, n)
        samples = pixels.T.reshape(n, side, side, 1)
        if not with_frames:
            return samples
        # frame t shows pixels 0..t placed on the canvas (raster-fill video)
        T = self.canvas_size
        tri = jnp.tril(jnp.ones((T, T), pixels.dtype))
        frames = (tri[:, :, None] * pixels[None, :, :]).transpose(0, 2, 1)
        frames = frames.reshape(T, n, side, side, 1)
        return samples, frames

    def sample(self, n):
        return self._jit_sample(self.state, n, self.next_rng())
