"""Wavenet over 1-D-ified MNIST (reference: gms/autoregs/wavenet.py):
causal 'A' conv (kernel 2, pad 2, drop last) into 9 gated residual blocks
with dilations 2^0..2^8, 1x1 out conv, Bernoulli over pixels.

TPU-native: NWC layout with explicit left-pad dilated convs for training
(XLA maps these onto the MXU as implicit GEMMs). Sampling uses INCREMENTAL
decoding — each dilated conv carries a d-slot shift register, so one pixel
costs one fused cell instead of a full 784-position forward (the reference
runs 784 full forwards from the host, wavenet.py:58-66; a naive scan of full
forwards is O(T^2·layers)). Exact equivalence with the full forward is
tested in tests/test_causality.py.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_models_tpu.models.base import Autoreg
from generative_models_tpu.models.rnn import append_location, location_grid
from generative_models_tpu.utils import dists, register
from generative_models_tpu.utils.config import AttrDict


class CausalConv1x2(nn.Module):
    """kernel-2 dilated causal conv with shared params for both the full
    teacher-forced path and the single-step decode path.

    a_type=True reproduces the reference's 'A' layer (pad 2, drop last:
    y_t = K0·x_{t-2} + K1·x_{t-1}); otherwise 'B' (pad d:
    y_t = K0·x_{t-d} + K1·x_t)."""

    features: int
    dilation: int = 1
    a_type: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_prev=None):
        """Full mode: x is (B, T, C), x_prev None.
        Step mode: x is (B, C) (current input: x_{t-1} for A, x_t for B) and
        x_prev is (B, C) (x_{t-2} for A, x_{t-d} for B)."""
        in_c = x.shape[-1]
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(), (2, in_c, self.features)
        )
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        # params live in f32; matmuls run in self.dtype (bf16 on TPU) with
        # f32 accumulation — a kernel-2 dilated causal conv is exactly two
        # shifted matmuls, which XLA tiles straight onto the MXU
        k = kernel.astype(self.dtype)
        if x_prev is None:
            xc = x.astype(self.dtype)
            T = x.shape[1]
            if self.a_type:  # y_t = K0 x_{t-2} + K1 x_{t-1}
                s2 = jnp.pad(xc, ((0, 0), (2, 0), (0, 0)))[:, :T]
                s1 = jnp.pad(xc, ((0, 0), (1, 0), (0, 0)))[:, :T]
            else:  # y_t = K0 x_{t-d} + K1 x_t
                s2 = jnp.pad(xc, ((0, 0), (self.dilation, 0), (0, 0)))[:, :T]
                s1 = xc
            out = (
                jnp.einsum('btc,cf->btf', s2, k[0], preferred_element_type=jnp.float32)
                + jnp.einsum('btc,cf->btf', s1, k[1], preferred_element_type=jnp.float32)
            )
            # accumulate f32, then drop to the compute dtype so the gate /
            # residual elementwise chain runs at bf16 VPU rate on TPU
            return (out + bias).astype(self.dtype)
        return (
            jnp.einsum('bc,cf->bf', x_prev.astype(self.dtype), k[0],
                       preferred_element_type=jnp.float32)
            + jnp.einsum('bc,cf->bf', x.astype(self.dtype), k[1],
                         preferred_element_type=jnp.float32)
            + bias
        ).astype(self.dtype)


class GatedResidualBlock(nn.Module):
    """tanh/sigmoid-gated dilated conv + 1x1 residual (wavenet.py:92-107)."""

    res_channels: int
    dilation: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.dilated = CausalConv1x2(
            2 * self.res_channels, self.dilation, dtype=self.dtype
        )
        self.res1x1 = nn.Dense(self.res_channels, dtype=self.dtype)

    def _gate(self, out):
        o1, o2 = jnp.split(out, 2, axis=-1)
        return jnp.tanh(o1) * jax.nn.sigmoid(o2)

    def __call__(self, x):
        return x + self.res1x1(self._gate(self.dilated(x)))

    def step(self, x_t, x_prev):
        return x_t + self.res1x1(self._gate(self.dilated(x_t, x_prev)))


class WavenetNet(nn.Module):
    res_channels: int
    use_resblock: bool = True
    layer_size: int = 9  # largest dilation 2^8 covers the 784-pixel context
    dtype: jnp.dtype = jnp.float32  # matmul dtype (bf16 on TPU); params f32

    def setup(self):
        self.causal = CausalConv1x2(self.res_channels, a_type=True, dtype=self.dtype)
        if self.use_resblock:
            self.stack = [
                GatedResidualBlock(
                    self.res_channels, 2**i, dtype=self.dtype, name=f'block{i}'
                )
                for i in range(self.layer_size)
            ]
        else:
            self.stack = [
                CausalConv1x2(
                    self.res_channels, 2**i, dtype=self.dtype, name=f'conv{i}'
                )
                for i in range(self.layer_size)
            ]
        self.out_dense = nn.Dense(1)  # logits stay f32

    def __call__(self, x):  # (B, T, 3) -> (B, T) logits
        x = self.causal(x)
        for layer in self.stack:
            x = layer(x)
        return self.out_dense(x)[..., 0]

    # ------------------------- incremental decode ------------------------- #
    def init_buffers(self, n, in_channels=3):
        """Shift registers: s_{t-2} for the A layer plus a d-slot ring buffer
        per dilated layer (zeros == the full path's left pad)."""
        a_buf = jnp.zeros((n, in_channels))
        rings = tuple(
            jnp.zeros((n, 2**i, self.res_channels), self.dtype)
            for i in range(self.layer_size)
        )
        return a_buf, rings

    def decode_step(self, buffers, s_prev, t):
        """Consume s_{t-1} (the input features at position t-1) and emit the
        logit for position t. Returns (logit (B,), new_buffers)."""
        a_buf, rings = buffers  # a_buf == s_{t-2}
        h = self.causal(s_prev, a_buf)  # K0·s_{t-2} + K1·s_{t-1}
        new_a_buf = s_prev
        new_rings = []
        for i, layer in enumerate(self.stack):
            ring = rings[i]
            slot = jnp.mod(t, ring.shape[1])
            x_prev = jax.lax.dynamic_index_in_dim(ring, slot, axis=1, keepdims=False)
            new_rings.append(
                jax.lax.dynamic_update_index_in_dim(ring, h, slot, axis=1)
            )
            h = layer.step(h, x_prev) if self.use_resblock else layer(h, x_prev)
        logit = self.out_dense(h)[..., 0]
        return logit, (new_a_buf, tuple(new_rings))


@register
class Wavenet(Autoreg):
    DG = AttrDict()
    DG.use_resblock = 1
    DG.hidden_size = 320

    def __init__(self, G):
        self.side = 32 if G.get('pad32', 0) else 28
        self.canvas_size = self.side * self.side
        super().__init__(G)
        self._jit_sample = jax.jit(self.sample_fn, static_argnums=(1, 3))

    def build(self):
        from generative_models_tpu.ops import on_tpu

        return WavenetNet(
            res_channels=self.G.hidden_size,
            use_resblock=bool(self.G.use_resblock),
            dtype=jnp.bfloat16 if on_tpu() else jnp.float32,
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

    def sample_fn(self, state, n, rng, with_frames=True):
        side = self.side
        locs = location_grid(side).reshape(self.canvas_size, 2)

        def body(carry, inp):
            buffers, s_prev = carry
            i, key = inp
            logit, buffers = self.net.apply(
                {'params': state.params}, buffers, s_prev, i,
                method=WavenetNet.decode_step,
            )
            pix = dists.Bernoulli(logits=logit).sample(key)  # (n,)
            s_t = jnp.concatenate(
                [pix[:, None], jnp.broadcast_to(locs[i][None], (n, 2))], -1
            )
            return (buffers, s_t), pix

        buffers0 = self.net.apply(
            {'params': state.params}, n, method=WavenetNet.init_buffers
        )
        keys = jax.random.split(rng, self.canvas_size)
        (_, _), pixels = jax.lax.scan(
            body, (buffers0, jnp.zeros((n, 3))), (jnp.arange(self.canvas_size), keys)
        )  # pixels: (T, n)
        samples = pixels.T.reshape(n, side, side, 1)
        if not with_frames:
            return samples
        T = self.canvas_size
        tri = jnp.tril(jnp.ones((T, T), pixels.dtype))
        frames = (tri[:, :, None] * pixels[None]).transpose(0, 2, 1)
        frames = frames.reshape(T, n, side, side, 1)
        return samples, frames

    def sample(self, n):
        return self._jit_sample(self.state, n, self.next_rng())
