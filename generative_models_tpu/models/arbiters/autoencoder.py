"""Arbiter autoencoder (reference: gms/arbiters/autoencoder.py): plain AE
whose 64-d encoder is the FID feature extractor for eval_heavy; trained on
unbinarized [-1,1] MNIST with a tiny KL-ish regularizer treating z as
Normal(z, 1)."""

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_models_tpu.models.base import Arbiter
from generative_models_tpu.models.vae import ConvDecoder, ConvEncoder
from generative_models_tpu.utils import combine_imgs, dists, register, write_image
from generative_models_tpu.utils.config import AttrDict
from generative_models_tpu.utils.dists import normal_kl


class AENet(nn.Module):
    z_size: int
    hidden: int
    binarize: bool

    def setup(self):
        self.encoder = ConvEncoder(out_size=self.z_size, hidden=self.hidden)
        self.decoder = ConvDecoder(hidden=self.hidden)

    def __call__(self, x):
        return self.encode(x)

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        x = self.decoder(z)
        # sigmoid for binarized data, tanh for [-1,1] (reference
        # autoencoder.py:99-102)
        return jax.nn.sigmoid(x) if self.binarize else jnp.tanh(x)

    def reconstruct(self, x):
        return self.decode(self.encode(x))


@register
class Autoencoder(Arbiter):
    DG = AttrDict()
    DG.eval_heavy = False
    DG.z_size = 64
    DG.beta = 1e-6
    DG.binarize = 0

    def build(self):
        return AENet(
            z_size=self.G.z_size,
            hidden=self.G.hidden_size,
            binarize=bool(self.G.binarize),
        )

    def init_params(self, rng):
        # init through encode+decode (__call__ is encode-only — it is the
        # FID feature extractor)
        return self.net.init(rng, self.example_input(), method=AENet.reconstruct)[
            'params'
        ]

    def __init__(self, G):
        super().__init__(G)
        self._jit_encode = jax.jit(
            lambda state, x: self.net.apply({'params': state.params}, x)
        )
        self._jit_decode = jax.jit(
            lambda state, z: self.net.apply(
                {'params': state.params}, z, method=AENet.decode
            )
        )

    def feature_fn(self, params, x):
        """FID feature extractor (reference autoencoder.py:26-27)."""
        return self.net.apply({'params': params}, x)

    def loss(self, params, x, y=None, rng=None, train=True):
        z = self.net.apply({'params': params}, x)
        decoded = self.net.apply({'params': params}, z, method=AENet.decode)
        if self.G.binarize:
            recon_loss = -dists.Bernoulli(probs=decoded).log_prob(x).mean((1, 2, 3))
        else:
            recon_loss = -dists.Normal(decoded, 1.0).log_prob(x).mean((1, 2, 3))
        kl_loss = normal_kl(z, jnp.ones_like(z)).mean(-1)
        loss = (recon_loss + self.G.beta * kl_loss).mean()
        metrics = {
            'full_loss': loss,
            'recon_loss': recon_loss.mean(),
            'kl_loss': kl_loss.mean(),
            'z_mean': z.mean(),
            'z_std': z.std(),
        }
        return loss, metrics

    def evaluate(self, writer, x, y, epoch):
        z = self._jit_encode(self.state, x[:8])
        recon = self._jit_decode(self.state, z)
        if self.G.binarize:
            recon = (recon > 0.5).astype(jnp.float32)
        truth = x[:8]
        error = (recon - truth + 1.0) / 2.0
        stack = jnp.concatenate([truth, recon, error], 0)
        write_image(writer, 'reconstruction', combine_imgs(stack, 3, 8), epoch)
