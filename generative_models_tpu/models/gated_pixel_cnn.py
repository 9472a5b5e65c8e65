"""GatedPixelCNN (reference: gms/autoregs/gated_pixel_cnn.py): dual
vertical/horizontal stacks fix PixelCNN's blind spot; the vertical stack sees
strictly-above rows, the horizontal stack left-of-center pixels, linked by a
1x1 conv on the down-shifted vertical features; tanh*sigmoid gates both.

TPU-native notes:
  - the reference applies its stack masks by mutating conv weights in-place
    on every forward (gated_pixel_cnn.py:94-95) — here masks are pure
    constants fused at apply time.
  - sampling is an incremental hybrid wavefront (one jitted 784-step scan):
    the h-stack is raster-causal, so each step computes ONE position per
    layer against cached canvases; the v-stack mask spans its full center
    row, so v activations are only ROW-causal — they are batch-computed one
    row at a time, for row r-1, as the cursor enters row r (a lax.cond
    branch on c == 0). This replaces a full 28x28 dual-stack forward per
    pixel. Exact equivalence is tested in tests/test_causality.py.
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
    """setup-based with the flax auto-names (v_kernel/h_kernel params,
    Conv_0/Conv_1 submodules) so param paths and init RNG streams are
    identical to the former nn.compact version. `in_features` is the
    per-stack channel count of the input (always n_filters in the net)."""

    mask_type: str
    features: int
    kernel_size: int = 7
    in_features: int = None
    dtype: object = None  # bf16 stacks (--bf16): halves the elementwise/LN
    # HBM traffic that dominates this model (scripts/gated_profile.py)

    def setup(self):
        k = self.kernel_size
        in_c = self.in_features if self.in_features is not None else self.features
        self.v_kernel = self.param(
            'v_kernel', nn.initializers.lecun_normal(),
            (k, k, in_c, 2 * self.features),
        )
        self.h_kernel = self.param(
            'h_kernel', nn.initializers.lecun_normal(),
            (1, k, in_c, 2 * self.features),
        )
        self.link = nn.Conv(
            2 * self.features, (1, 1), use_bias=False, name='Conv_0',
            dtype=self.dtype,
        )
        self.out1x1 = nn.Conv(
            self.features, (1, 1), use_bias=False, name='Conv_1',
            dtype=self.dtype,
        )

    @staticmethod
    def _gate(x):
        a, b = jnp.split(x, 2, axis=-1)
        return jnp.tanh(a) * jax.nn.sigmoid(b)

    def __call__(self, vx, hx):
        """(vx, hx) stay SEPARATE tensors through the whole stack — the
        former concat-both-stacks layout forced a split + concat (two full
        (B,28,28,2F) HBM copies) per layer; measured on chip the pair form
        takes the train step 9.9 -> 9.0 ms at bit-identical math
        (docs/PERF.md)."""
        k = self.kernel_size
        p = k // 2
        dt = self.dtype

        def conv(inp, ker, pad):
            if dt is not None:
                inp, ker = inp.astype(dt), ker.astype(dt)
            return jax.lax.conv_general_dilated(
                inp, ker, (1, 1), pad,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            )

        # the stack masks zero whole kernel rows/cols, so run the convs on
        # the cropped causal support with shifted (possibly negative)
        # padding — bit-identical to the masked full conv, ~43% fewer taps.
        # v keeps rows [:p+1]; h keeps cols [:p+1] (B) or [:p] (A).
        end = p + 1 if self.mask_type == 'B' else p
        vx_out = conv(vx, self.v_kernel[: p + 1], [(p, 0), (p, p)])
        hx_new = conv(hx, self.h_kernel[:, :end], [(0, 0), (p, end - p - 1)])
        # vertical -> horizontal link through a 1x1 on the down-shifted vstack
        hx_new = hx_new + self.link(down_shift(vx_out))
        vx_out = self._gate(vx_out)
        hx_new = self._gate(hx_new)
        hx_new = self.out1x1(hx_new)
        return vx_out, hx + hx_new

    # ------------------------- decode-path pieces -------------------------
    def v_row(self, strip):
        """Raw v-conv outputs for ONE row: strip is the (B, k//2+1, Wp, C)
        slice of the (relu'd) v canvas whose last row is the output row.
        Returns (B, Wp - 2*(k//2), 2F)."""
        k = self.kernel_size
        out = jax.lax.conv_general_dilated(
            strip, (self.v_kernel * vstack_mask(k))[: k // 2 + 1],
            (1, 1), 'VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        )
        return out[:, 0]

    def h_step(self, hw, vo_prev):
        """One h-stack position: hw is the (B, 1, k//2+1, C) relu'd window
        ending at the center column; vo_prev is the raw v-conv output at the
        row above, (B, 2F). Returns the raw (pre-gate) h update (B, 2F)."""
        k = self.kernel_size
        ker = (self.h_kernel * hstack_mask(k, self.mask_type))[:, : k // 2 + 1]
        out = jnp.einsum('nhwc,hwcf->nf', hw, ker)
        return out + self.link(vo_prev[:, None, None, :])[:, 0, 0]

    def h_out(self, hx, hx_new_raw):
        """Gate + 1x1 + residual for one position: (B, F)."""
        return hx + self.out1x1(self._gate(hx_new_raw)[:, None, None, :])[:, 0, 0]


class StackLayerNorm(nn.Module):
    dtype: object = None

    def setup(self):
        # flax LN computes its mean/var in f32 regardless of dtype
        self.ln_v = nn.LayerNorm(name='LayerNorm_0', dtype=self.dtype)
        self.ln_h = nn.LayerNorm(name='LayerNorm_1', dtype=self.dtype)

    def __call__(self, vx, hx):
        return self.ln_v(vx), self.ln_h(hx)


class GatedPixelCNNNet(nn.Module):
    n_filters: int
    n_layers: int
    kernel_size: int
    dtype: object = None  # --bf16: bf16 stack activations, f32 params/loss

    def setup(self):
        self.conv_in = MaskConv2d(
            'A', self.n_filters, self.kernel_size, name='MaskConv2d_0',
            dtype=self.dtype,
        )
        n_gated = self.n_layers - 2
        self.gated = [
            GatedConv2d(
                'B', self.n_filters, self.kernel_size,
                in_features=self.n_filters, name=f'GatedConv2d_{i}',
                dtype=self.dtype,
            )
            for i in range(n_gated)
        ]
        self.stack_lns = [
            StackLayerNorm(name=f'StackLayerNorm_{i}', dtype=self.dtype)
            for i in range(n_gated)
        ]
        self.conv_out = MaskConv2d(
            'B', 1, self.kernel_size, name='MaskConv2d_1', dtype=self.dtype,
        )

    def __call__(self, x):
        x = self.conv_in(x)
        vx, hx = x, x  # (v, h) stacks — two tensors, never concatenated
        for i in range(self.n_layers - 2):
            vx, hx = self.gated[i](nn.relu(vx), nn.relu(hx))
            vx, hx = self.stack_lns[i](vx, hx)
        return self.conv_out(hx)

    # ---------------------- incremental hybrid decode ----------------------
    # Canvases (all spatially padded by p = k//2):
    #   c0   : input pixels (1 ch)
    #   s0   : A-conv outputs, filled per-pixel (shared root of both stacks)
    #   v[i] : v-stack input to gated layer i (i>=1; v[0] == s0), filled
    #          per-ROW (one row behind the cursor)
    #   vo[i]: RAW v-conv outputs of layer i (2F), filled per-row; read by
    #          the h-chain at the row above the cursor (the down-shift link)
    #   h[i] : h-stack input to gated layer i (i>=1; h[0] == s0), per-pixel
    #   hfin : final h stack (input to conv_out), per-pixel

    def init_canvases(self, n, side):
        p = self.kernel_size // 2
        hw = side + 2 * p
        F = self.n_filters
        n_gated = self.n_layers - 2
        z = lambda c: jnp.zeros((n, hw, hw, c))
        return dict(
            c0=z(1),
            s0=z(F),
            v=tuple(z(F) for _ in range(n_gated - 1)),
            vo=tuple(z(2 * F) for _ in range(n_gated)),
            h=tuple(z(F) for _ in range(n_gated - 1)),
            hfin=z(F),
        )

    def _row_update(self, cv, r):
        """Compute v-stack activations for row r-1 (just completed), all
        layers in order, writing vo[i] rows and v[i+1] rows."""
        k = self.kernel_size
        p = k // 2
        n = cv['c0'].shape[0]
        n_gated = self.n_layers - 2
        # padded row index of output row r-1 is (r - 1) + p; the (p+1)-row
        # strip whose LAST row is the output row starts at (r-1+p) - p = r-1
        row_out = r - 1 + p
        strip_at = lambda canvas: jax.lax.dynamic_slice(
            canvas, (0, r - 1, 0, 0),
            (n, p + 1, canvas.shape[2], canvas.shape[3]),
        )
        vo = list(cv['vo'])
        v = list(cv['v'])
        src = strip_at(cv['s0'])  # v[0] == s0
        for i in range(n_gated):
            vo_row = self.gated[i].v_row(nn.relu(src))  # (n, side, 2F)
            vo[i] = jax.lax.dynamic_update_slice(
                vo[i], vo_row[:, None], (0, row_out, p, 0)
            )
            if i + 1 < n_gated:
                v_next = self.stack_lns[i].ln_v(GatedConv2d._gate(vo_row))
                v[i] = jax.lax.dynamic_update_slice(
                    v[i], v_next[:, None], (0, row_out, p, 0)
                )
                src = strip_at(v[i])
        return dict(cv, vo=tuple(vo), v=tuple(v))

    def decode_step(self, cv, r, c):
        """Logit for position (r, c) (unpadded coords; traced). Runs the
        per-row v update when entering a new row, then the per-pixel
        h-chain. Returns (logit (B,), canvases)."""
        k = self.kernel_size
        p = k // 2
        n = cv['c0'].shape[0]
        n_gated = self.n_layers - 2

        cv = jax.lax.cond(
            jnp.logical_and(c == 0, r > 0),
            lambda cv: self._row_update(cv, r),
            lambda cv: cv,
            cv,
        )

        # A conv at (r, c): strictly-before pixels only
        w0 = jax.lax.dynamic_slice(cv['c0'], (0, r, c, 0), (n, k, k, 1))
        s0_vec = self.conv_in(w0, window=True)  # (n, F)
        s0 = jax.lax.dynamic_update_slice(
            cv['s0'], s0_vec[:, None, None, :], (0, r + p, c + p, 0)
        )
        cv = dict(cv, s0=s0)

        h = s0_vec
        h_canvases = list(cv['h'])
        for i in range(n_gated):
            if i == 0:
                canvas = cv['s0']
            else:
                h_canvases[i - 1] = jax.lax.dynamic_update_slice(
                    h_canvases[i - 1], h[:, None, None, :], (0, r + p, c + p, 0)
                )
                canvas = h_canvases[i - 1]
            # same-row window ending at the center column: cols c..c+p
            hw = jax.lax.dynamic_slice(
                canvas, (0, r + p, c, 0), (n, 1, p + 1, self.n_filters)
            )
            vo_prev = jax.lax.dynamic_slice(
                cv['vo'][i], (0, r + p - 1, c + p, 0), (n, 1, 1, 2 * self.n_filters)
            )[:, 0, 0]
            hx_new_raw = self.gated[i].h_step(nn.relu(hw), vo_prev)
            h = self.gated[i].h_out(nn.relu(h), hx_new_raw)
            h = self.stack_lns[i].ln_h(h)
        hfin = jax.lax.dynamic_update_slice(
            cv['hfin'], h[:, None, None, :], (0, r + p, c + p, 0)
        )
        wf = jax.lax.dynamic_slice(
            hfin, (0, r, c, 0), (n, k, k, self.n_filters)
        )
        logit = self.conv_out(wf, window=True)[:, 0]
        return logit, dict(cv, h=tuple(h_canvases), hfin=hfin)


@register
class GatedPixelCNN(PixelCNN):
    DG = AttrDict()
    DG.n_filters = 96
    DG.n_layers = 5
    DG.kernel_size = 7
    DG.use_resblock = 0
    DG.lr = 1e-4
    DG.bf16 = 0  # bf16 stack activations (params + loss stay f32): the
    # step is elementwise/LN-HBM-bound (scripts/gated_profile.py), so
    # halving activation bytes is the measured lever; default off keeps
    # the reference-exact f32 numerics for the parity contract

    def build(self):
        import jax.numpy as jnp

        kw = dict(
            n_filters=self.G.n_filters,
            n_layers=self.G.n_layers,
            kernel_size=self.G.kernel_size,
        )
        if int(self.G.get('bf16', 0)):
            # decode stays f32 (the incremental canvases are f32 and the
            # per-position window math is latency-, not bandwidth-, bound)
            self._decode_net = GatedPixelCNNNet(**kw)
            return GatedPixelCNNNet(**kw, dtype=jnp.bfloat16)
        return GatedPixelCNNNet(**kw)

    # hooks for the sampling-scan template in PixelCNN.sample_fn
    _decode_step = staticmethod(GatedPixelCNNNet.decode_step)
    _init_canvases = staticmethod(GatedPixelCNNNet.init_canvases)

    @staticmethod
    def _get_c0(cv):
        return cv['c0']

    @staticmethod
    def _set_c0(cv, c0):
        return dict(cv, c0=c0)
