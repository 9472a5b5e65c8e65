"""GatedPixelCNN (reference: gms/autoregs/gated_pixel_cnn.py): dual
vertical/horizontal stacks fix PixelCNN's blind spot; the vertical stack sees
strictly-above rows, the horizontal stack left-of-center pixels, linked by a
1x1 conv on the down-shifted vertical features; tanh*sigmoid gates both.

TPU-native note: the reference applies its stack masks by mutating conv
weights in-place on every forward (gated_pixel_cnn.py:94-95) — here masks are
pure constants fused at apply time.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.models.pixel_cnn import MaskConv2d, PixelCNN
from generative_models_tpu.utils import register
from generative_models_tpu.utils.config import AttrDict


def vstack_mask(k):
    """keep rows 0..k//2 (reference zeroes rows k//2+1.., :79)."""
    m = np.zeros((k, k, 1, 1), np.float32)
    m[: k // 2 + 1, :] = 1.0
    return jnp.asarray(m)


def hstack_mask(k, mask_type):
    """(1, k) conv keeping cols 0..k//2 (A also drops the center col)."""
    m = np.zeros((1, k, 1, 1), np.float32)
    end = k // 2 if mask_type == 'A' else k // 2 + 1
    m[0, :end] = 1.0
    return jnp.asarray(m)


def down_shift(x):
    """shift rows down by one, zero-padding the top (reference :86-89)."""
    return jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))


class GatedConv2d(nn.Module):
    mask_type: str
    features: int
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        vx, hx = jnp.split(x, 2, axis=-1)
        in_c = vx.shape[-1]
        v_kernel = self.param(
            'v_kernel', nn.initializers.lecun_normal(), (k, k, in_c, 2 * self.features)
        )
        h_kernel = self.param(
            'h_kernel', nn.initializers.lecun_normal(), (1, k, in_c, 2 * self.features)
        )
        conv = lambda inp, ker: jax.lax.conv_general_dilated(
            inp, ker, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC')
        )
        vx_out = conv(vx, v_kernel * vstack_mask(k))
        hx_new = conv(hx, h_kernel * hstack_mask(k, self.mask_type))
        # vertical -> horizontal link through a 1x1 on the down-shifted vstack
        hx_new = hx_new + nn.Conv(2 * self.features, (1, 1), use_bias=False)(
            down_shift(vx_out)
        )
        v1, v2 = jnp.split(vx_out, 2, axis=-1)
        vx_out = jnp.tanh(v1) * jax.nn.sigmoid(v2)
        h1, h2 = jnp.split(hx_new, 2, axis=-1)
        hx_new = jnp.tanh(h1) * jax.nn.sigmoid(h2)
        hx_new = nn.Conv(self.features, (1, 1), use_bias=False)(hx_new)
        return jnp.concatenate([vx_out, hx + hx_new], axis=-1)


class StackLayerNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        vx, hx = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([nn.LayerNorm()(vx), nn.LayerNorm()(hx)], axis=-1)


class GatedPixelCNNNet(nn.Module):
    n_filters: int
    n_layers: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        x = MaskConv2d('A', self.n_filters, self.kernel_size)(x)
        x = jnp.concatenate([x, x], axis=-1)  # (v, h) stacks
        for _ in range(self.n_layers - 2):
            x = nn.relu(x)
            x = GatedConv2d('B', self.n_filters, self.kernel_size)(x)
            x = StackLayerNorm()(x)
        _, hx = jnp.split(x, 2, axis=-1)
        return MaskConv2d('B', 1, self.kernel_size)(hx)


@register
class GatedPixelCNN(PixelCNN):
    DG = AttrDict()
    DG.n_filters = 96
    DG.n_layers = 5
    DG.kernel_size = 7
    DG.use_resblock = 0
    DG.lr = 1e-4

    def build(self):
        return GatedPixelCNNNet(
            n_filters=self.G.n_filters,
            n_layers=self.G.n_layers,
            kernel_size=self.G.kernel_size,
        )
