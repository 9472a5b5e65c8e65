"""PixelCNN (reference: gms/autoregs/pixel_cnn.py): masked 2-D convs
(A mask for the input layer, B thereafter), channels-last LayerNorm, ReLU
stack, two 1x1 B-convs on top, Bernoulli over pixels.

TPU-native: NHWC layout means the reference's permute-LayerNorm-permute
wrapper (pixel_cnn.py:137-144) disappears — LayerNorm is native on the last
axis. Masks are pure constants multiplied into the conv kernel at apply time
(the reference mutates weights in-place per forward in the gated variant).

Sampling is INCREMENTAL wavefront decoding (one jitted 784-step lax.scan):
because every masked-conv activation at position q depends only on input
pixels strictly before q in raster order, the activation at q is FINAL the
moment the sampling cursor reaches q. So each step computes exactly ONE
position per spatial conv against cached per-layer canvases (a k x k window
dot), instead of the reference's full 28x28 forward per pixel
(pixel_cnn.py:73-81). Exact equivalence with the full forward is tested in
tests/test_causality.py.
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
    dtype: object = None  # computation dtype (bf16 stacks); None = f32

    @nn.compact
    def __call__(self, x, window=False):
        """window=False: x is a full (B, H, W, C) image, SAME padding.
        window=True: x is one (B, k, k, C) patch centered on a single output
        position; returns that position's (B, features) output."""
        k = self.kernel_size
        kernel = self.param(
            'kernel',
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        elif x.dtype != kernel.dtype:
            # f32 module fed from a bf16 stack (e.g. the final logit conv
            # under --bf16): compute this conv in f32
            x = x.astype(kernel.dtype)
        mask = pixelcnn_mask(k, self.mask_type).astype(kernel.dtype)
        if window:
            y = jnp.einsum('nhwc,hwcf->nf', x, kernel * mask)
        else:
            # the mask zeroes every kernel row below center, so crop the
            # kernel to rows [:p+1] and shift the padding up — bit-identical
            # output with ~43% less MXU work (k=7: 49 -> 28 taps)
            p = k // 2
            y = jax.lax.conv_general_dilated(
                x, (kernel * mask)[: p + 1], window_strides=(1, 1),
                padding=[(p, 0), (p, p)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            )
        if self.use_bias:
            b = self.param('bias', nn.initializers.zeros, (self.features,))
            y = y + (b.astype(y.dtype) if self.dtype is not None else b)
        return y


class PixelResBlock(nn.Module):
    """bottleneck 1x1 -> masked 7x7 -> 1x1 with skip (pixel_cnn.py:111-134).

    setup-based with the flax auto-names (MaskConv2d_0..2) so param paths
    and init RNG streams are identical to the former nn.compact version."""

    channels: int
    dtype: object = None

    def setup(self):
        self.conv_a = MaskConv2d(
            'B', self.channels // 2, 1, name='MaskConv2d_0', dtype=self.dtype
        )
        self.conv_mid = MaskConv2d(
            'B', self.channels // 2, 7, name='MaskConv2d_1', dtype=self.dtype
        )
        self.conv_b = MaskConv2d(
            'B', self.channels, 1, name='MaskConv2d_2', dtype=self.dtype
        )

    def __call__(self, x):
        h = nn.relu(x)
        h = self.conv_a(h)
        h = nn.relu(h)
        h = self.conv_mid(h)
        h = nn.relu(h)
        h = self.conv_b(h)
        return x + h

    # decode path: the mid 7x7 conv needs a canvas of its input
    def step_pre(self, x):
        """(B, C) -> the (B, C//2) vector that feeds the 7x7 conv."""
        return nn.relu(self.conv_a(x[:, None, None, :], window=True))

    def step_post(self, x, w):
        """x: (B, C) block input; w: (B, 7, 7, C//2) mid-conv window."""
        h = nn.relu(self.conv_mid(w, window=True))
        h = self.conv_b(h[:, None, None, :], window=True)
        return x + h


class PixelCNNNet(nn.Module):
    n_filters: int
    n_layers: int
    kernel_size: int
    use_resblock: bool
    dtype: object = None  # --bf16: bf16 stack activations, f32 params/loss

    def setup(self):
        # names replicate the former nn.compact auto-naming exactly
        self.conv_in = MaskConv2d(
            'A', self.n_filters, self.kernel_size, name='MaskConv2d_0',
            dtype=self.dtype,
        )
        self.lns = [
            nn.LayerNorm(name=f'LayerNorm_{i}', dtype=self.dtype)
            for i in range(self.n_layers)
        ]
        if self.use_resblock:
            self.blocks = [
                PixelResBlock(
                    self.n_filters, name=f'PixelResBlock_{i}', dtype=self.dtype
                )
                for i in range(self.n_layers)
            ]
            out_base = 1
        else:
            self.blocks = [
                MaskConv2d(
                    'B', self.n_filters, self.kernel_size,
                    name=f'MaskConv2d_{i + 1}', dtype=self.dtype,
                )
                for i in range(self.n_layers)
            ]
            out_base = self.n_layers + 1
        self.conv_out1 = MaskConv2d(
            'B', self.n_filters, 1, name=f'MaskConv2d_{out_base}',
            dtype=self.dtype,
        )
        self.conv_out2 = MaskConv2d('B', 1, 1, name=f'MaskConv2d_{out_base + 1}')

    def __call__(self, x):  # (B, H, W, 1) -> logits same shape
        x = self.conv_in(x)
        for i in range(self.n_layers):
            x = self.lns[i](x)
            x = nn.relu(x)
            x = self.blocks[i](x)
        x = nn.relu(x)
        x = self.conv_out1(x)
        x = nn.relu(x)
        x = self.conv_out2(x)
        return x

    # ---------------------- incremental wavefront decode ----------------------
    # One canvas per spatial (k>1) conv, holding that conv's INPUT plane,
    # zero-padded by k//2 on each spatial edge. A position's activation only
    # reads raster-earlier positions, so canvases filled in cursor order are
    # always valid. 1x1 convs and LayerNorm are positionwise: no canvas.

    def _mid_kernel_size(self):
        # resblock mode's spatial conv is PixelResBlock.conv_mid, which is
        # hard-coded 7x7 (reference: pixel_cnn.py:118) — the layer canvases
        # must be padded/windowed for THAT kernel, not self.kernel_size
        return 7 if self.use_resblock else self.kernel_size

    def init_canvases(self, n, side):
        p = self.kernel_size // 2
        c0 = jnp.zeros((n, side + 2 * p, side + 2 * p, 1))
        pm = self._mid_kernel_size() // 2
        hw = side + 2 * pm
        mid_c = self.n_filters // 2 if self.use_resblock else self.n_filters
        layer_canvases = tuple(
            jnp.zeros((n, hw, hw, mid_c)) for _ in range(self.n_layers)
        )
        return c0, layer_canvases

    def decode_step(self, canvases, r, c):
        """Compute the logit for position (r, c) (unpadded coords; traced)
        and write this position's activations into the canvases.
        Returns (logit (B,), canvases)."""
        k = self.kernel_size
        km = self._mid_kernel_size()
        pm = km // 2
        c0, layer_canvases = canvases
        n = c0.shape[0]
        # window whose center is (r+p, c+p) in padded coords starts at (r, c)
        w = jax.lax.dynamic_slice(c0, (0, r, c, 0), (n, k, k, 1))
        x = self.conv_in(w, window=True)  # (n, F)
        new_canvases = []
        for i in range(self.n_layers):
            x = self.lns[i](x)
            x = nn.relu(x)
            if self.use_resblock:
                v = self.blocks[i].step_pre(x)
            else:
                v = x
            canvas = jax.lax.dynamic_update_slice(
                layer_canvases[i], v[:, None, None, :], (0, r + pm, c + pm, 0)
            )
            new_canvases.append(canvas)
            w = jax.lax.dynamic_slice(
                canvas, (0, r, c, 0), (n, km, km, v.shape[-1])
            )
            if self.use_resblock:
                x = self.blocks[i].step_post(x, w)
            else:
                x = self.blocks[i](w, window=True)
        x = nn.relu(x)
        x = self.conv_out1(x[:, None, None, :], window=True)
        x = nn.relu(x)
        logit = self.conv_out2(x[:, None, None, :], window=True)[:, 0]
        return logit, (c0, tuple(new_canvases))


@register
class PixelCNN(Autoreg):
    DG = AttrDict()
    DG.n_filters = 128
    DG.n_layers = 5
    DG.kernel_size = 7
    DG.use_resblock = 0
    DG.lr = 1e-4
    DG.bf16 = 0  # bf16 stack activations (params + loss stay f32); default
    # off keeps reference-exact f32 numerics for the parity contract

    def __init__(self, G):
        self.side = 32 if G.get('pad32', 0) else 28
        self.canvas_size = self.side * self.side
        super().__init__(G)
        self._jit_sample = jax.jit(self.sample_fn, static_argnums=(1, 3))

    def build(self):
        kw = dict(
            n_filters=self.G.n_filters,
            n_layers=self.G.n_layers,
            kernel_size=self.G.kernel_size,
            use_resblock=bool(self.G.use_resblock),
        )
        if int(self.G.get('bf16', 0)):
            # decode stays f32 (f32 canvases; latency- not bandwidth-bound)
            self._decode_net = PixelCNNNet(**kw)
            return PixelCNNNet(**kw, dtype=jnp.bfloat16)
        return PixelCNNNet(**kw)

    def loss(self, params, x, y=None, rng=None, train=True):
        logits = self.net.apply({'params': params}, x)
        # f32 loss regardless of the net's compute dtype (--bf16 stacks)
        loss = -dists.Bernoulli(
            logits=logits.astype(jnp.float32)
        ).log_prob(x).mean()
        return loss, {'nlogp': loss}

    # hooks the gated subclass overrides: how to read/write the input
    # canvas inside the incremental sampling scan
    _decode_step = staticmethod(PixelCNNNet.decode_step)
    _init_canvases = staticmethod(PixelCNNNet.init_canvases)

    @staticmethod
    def _get_c0(canvases):
        return canvases[0]

    @staticmethod
    def _set_c0(canvases, c0):
        return (c0, canvases[1])

    def sample_fn(self, state, n, rng, with_frames=True):
        """Incremental-decode sampling scan, shared with GatedPixelCNN via
        the _decode_step/_init_canvases/_get_c0/_set_c0 hooks. Decoding
        always runs the f32 net (_decode_net when --bf16 trains the stacks
        in bf16; same params)."""
        side = self.side
        p = self.G.kernel_size // 2
        net = getattr(self, '_decode_net', None) or self.net

        def body(canvases, inp):
            i, key = inp
            r, c = i // side, i % side
            logit, canvases = net.apply(
                {'params': state.params}, canvases, r, c,
                method=self._decode_step,
            )
            pix = dists.Bernoulli(logits=logit).sample(key)  # (n,)
            c0 = jax.lax.dynamic_update_slice(
                self._get_c0(canvases), pix[:, None, None, None],
                (0, r + p, c + p, 0),
            )
            frame = c0[:, p:p + side, p:p + side, :] if with_frames else None
            return self._set_c0(canvases, c0), frame

        keys = jax.random.split(rng, self.canvas_size)
        canvases0 = net.apply(
            {'params': state.params}, n, side, method=self._init_canvases
        )
        canvases, frames = jax.lax.scan(
            body, canvases0, (jnp.arange(self.canvas_size), keys)
        )
        samples = self._get_c0(canvases)[:, p:p + side, p:p + side, :]
        return (samples, frames) if with_frames else samples

    def sample(self, n):
        return self._jit_sample(self.state, n, self.next_rng())
