"""MADE: masked autoencoder for distribution estimation.

Reference behavior (gms/autoregs/made.py): a 3-hidden-layer MLP over the 784
flattened binarized pixels with autoregressive connectivity masks (natural
input ordering, random hidden ranks), Bernoulli NLL loss, raster-order
sampling with one full forward per pixel.

TPU-native build: masked matmuls route through ops/masked_dense.py, which
picks per shape between XLA's fold-the-mask matmul (faster at the default
784x1024 layers — measured) and a Pallas kernel that fuses the mask in VMEM
(wins once materializing mask*W per step dominates, >~8 MB of masked
weight). Sampling is one lax.scan over 784 steps entirely on device,
emitting the frame stack for the sampling-process video in a single final
D2H transfer.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.models.base import Autoreg
from generative_models_tpu.ops import masked_dense
from generative_models_tpu.utils import dists, register
from generative_models_tpu.utils.config import AttrDict


def create_made_masks(nin, hidden_sizes, seed=42):
    """Autoregressive connectivity masks, same construction as the reference
    (gms/autoregs/made.py:36-57): natural input order, random hidden ranks in
    [min(prev_rank), nin-1); mask[l] connects rank-nondecreasing units, the
    output mask uses strict inequality. Returned as (in, out)-shaped float
    arrays (the reference stores the torch (out, in) transpose)."""
    rng = np.random.RandomState(seed)
    m = {-1: np.arange(nin)}
    L = len(hidden_sizes)
    for l in range(L):
        m[l] = rng.randint(m[l - 1].min(), nin - 1, size=hidden_sizes[l])
    masks = [(m[l - 1][:, None] <= m[l][None, :]) for l in range(L)]
    masks.append(m[L - 1][:, None] < m[-1][None, :])
    return [jnp.asarray(mask, jnp.float32) for mask in masks]


class MaskedMLP(nn.Module):
    """ReLU MLP whose every Dense is a masked matmul.

    premasked=True (the training default): the mask lives IN the weights —
    masked-out entries are zeroed at init and kept zero by masking the
    gradients before Adam (GM.transform_grads), so the forward/backward are
    plain matmuls with ZERO mask traffic. The fold-the-mask / Pallas paths
    materialize (or VMEM-fuse) mask*W on every forward AND backward — at
    MADE's default shapes that was ~6 weight-sized HBM sweeps per step of
    pure mask overhead (the made MFU-tail row, docs/PERF.md). Mathematically
    identical: masked entries contribute 0 either way."""

    hidden_sizes: tuple
    nout: int
    masks: tuple  # len(hidden_sizes)+1 masks, each (in, out)
    use_pallas: bool = True
    premasked: bool = False

    @nn.compact
    def __call__(self, x):
        sizes = (*self.hidden_sizes, self.nout)
        for i, out_n in enumerate(sizes):
            init = nn.initializers.lecun_normal()
            if self.premasked:
                init = _masked_init(init, self.masks[i])
            w = self.param(f'w{i}', init, (x.shape[-1], out_n))
            b = self.param(f'b{i}', nn.initializers.zeros, (out_n,))
            if self.premasked:
                x = x @ w + b
            else:
                x = masked_dense(x, w, b, self.masks[i], self.use_pallas)
            if i < len(sizes) - 1:
                x = nn.relu(x)
        return x


def _masked_init(base_init, mask):
    def init(key, shape, dtype=jnp.float32):
        return base_init(key, shape, dtype) * mask.astype(dtype)

    return init


@register
class MADE(Autoreg):
    DG = AttrDict()
    DG.hidden_size = 1024
    DG.premasked = 1  # masks live in the weights (see MaskedMLP); 0 = the
    # fold-the-mask / Pallas-kernel paths (for A/B measurement)

    def __init__(self, G):
        self.nin = self.nout = (32 * 32) if G.get('pad32', 0) else 784
        self.hidden_sizes = (G.hidden_size,) * 3
        self.masks = tuple(
            create_made_masks(self.nin, self.hidden_sizes, seed=G.get('seed', 0) + 42)
        )
        super().__init__(G)
        self._jit_sample = jax.jit(self.sample_fn, static_argnums=(1, 3))

    def build(self):
        from generative_models_tpu.ops import on_tpu
        from generative_models_tpu.ops.masked_dense import prefer_pallas

        # shape gate: above ~8 MB of masked weight the VMEM-fused Pallas
        # masked kernel is the fastest path (chip A/B, scripts/made_ab.py:
        # hidden=2048 premasked 1.48 vs Pallas 1.27 ms/step); below it,
        # premasked plain matmuls win (hidden=1024: 0.99 vs 1.09 ms/step)
        big_k, big_n = max(
            zip(
                (self.nin,) + self.hidden_sizes,
                self.hidden_sizes + (self.nout,),
            ),
            key=lambda kn: kn[0] * kn[1],
        )
        big = on_tpu() and prefer_pallas(big_k, big_n)
        if int(self.G.get('premasked', 1)) and not big:
            # masks folded into the weights at rest (zero per-step mask
            # traffic); --premasked=0 keeps the fold path for A/B
            return MaskedMLP(
                hidden_sizes=self.hidden_sizes,
                nout=self.nout,
                masks=self.masks,
                premasked=True,
            )
        return MaskedMLP(
            hidden_sizes=self.hidden_sizes,
            nout=self.nout,
            masks=self.masks,
            use_pallas=big,
        )

    def example_input(self):
        return jnp.zeros((1, self.nin), jnp.float32)

    # --- premasked-weight invariant (masked-out entries stay exactly 0) ---
    def _mask_wdict(self, d):
        """Apply the layer masks to the w0..wN entries of a param-shaped
        dict (grads, params, or Adam moment trees)."""
        out = dict(d)
        for i, m in enumerate(self.masks):
            key = f'w{i}'
            if key in out:
                out[key] = out[key] * m.astype(out[key].dtype)
        return out

    def transform_grads(self, grads):
        if not getattr(self.net, 'premasked', False):
            return grads
        return self._mask_wdict(grads)

    def load_weights(self, path):
        """Old checkpoints (premasked=0 runs) carry unused random values in
        the masked weight positions and live Adam moments there; zero both
        so the premasked forward stays exact."""
        super().load_weights(path)
        if not getattr(self.net, 'premasked', False):
            return
        is_pdict = lambda x: isinstance(x, dict) and 'w0' in x  # noqa: E731
        self.state = self.state.replace(
            params=self._mask_wdict(self.state.params),
            opt_state=jax.tree_util.tree_map(
                lambda x: self._mask_wdict(x) if is_pdict(x) else x,
                self.state.opt_state,
                is_leaf=is_pdict,
            ),
        )

    def loss(self, params, x, y=None, rng=None, train=True):
        x = x.reshape(-1, self.nin)
        logits = self.net.apply({'params': params}, x)
        loss = -dists.Bernoulli(logits=logits).log_prob(x).mean()
        return loss, {'nlogp': loss}

    def sample_fn(self, state, n, rng, with_frames=True):
        """Raster-order sampling as one on-device scan (reference does 784
        host-driven full forwards, gms/autoregs/made.py:66-81)."""
        side = int(np.sqrt(self.nin))

        def body(samples, inp):
            i, key = inp
            logits = self.net.apply({'params': state.params}, samples)
            logit_i = jnp.take(logits, i, axis=1)
            pix = dists.Bernoulli(logits=logit_i).sample(key)
            samples = samples.at[:, i].set(pix)
            frame = samples.reshape(n, side, side, 1) if with_frames else None
            return samples, frame

        keys = jax.random.split(rng, self.nin)
        samples, frames = jax.lax.scan(
            body, jnp.zeros((n, self.nin), jnp.float32), (jnp.arange(self.nin), keys)
        )
        samples = samples.reshape(n, side, side, 1)
        return (samples, frames) if with_frames else samples

    def sample(self, n):
        return self._jit_sample(self.state, n, self.next_rng())
