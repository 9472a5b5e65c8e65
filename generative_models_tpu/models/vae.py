"""VAE (reference: gms/vaes/vae.py): conv encoder -> Normal posterior,
deconv decoder, ELBO = Bernoulli/Normal recon NLL + beta * KL(post || N(0,1)).

TPU-native: NHWC layout, jitted loss/sample, reparameterized sampling with
explicit rng threading.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from generative_models_tpu.models.base import GM
from generative_models_tpu.utils import (
    combine_imgs, dists, register, write_grid, write_image,
)
from generative_models_tpu.utils.config import AttrDict
from generative_models_tpu.utils.dists import normal_kl


class ConvEncoder(nn.Module):
    """Same geometry as the reference encoder (gms/vaes/vae.py:60-81):
    28x28 -> 13 -> 6 -> 4 -> 1 with VALID 3x3 convs."""

    out_size: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        H = self.hidden
        x = nn.relu(nn.Conv(H, (3, 3), strides=2, padding='VALID')(x))
        x = nn.relu(nn.Conv(H, (3, 3), strides=2, padding='VALID')(x))
        x = nn.relu(nn.Conv(H, (3, 3), strides=1, padding='VALID')(x))
        x = nn.Conv(self.out_size, (3, 3), strides=2, padding='VALID')(x)
        return x.reshape(x.shape[0], -1)


class ConvDecoder(nn.Module):
    """1 -> 5 -> 12 -> 26 -> 28 VALID deconvs (gms/vaes/vae.py:84-100)."""

    hidden: int
    out_channels: int = 1

    @nn.compact
    def __call__(self, z):
        H = self.hidden
        x = z[:, None, None, :]
        x = nn.relu(nn.ConvTranspose(H, (5, 5), strides=(1, 1), padding='VALID')(x))
        x = nn.relu(nn.ConvTranspose(H, (4, 4), strides=(2, 2), padding='VALID')(x))
        x = nn.relu(nn.ConvTranspose(H, (4, 4), strides=(2, 2), padding='VALID')(x))
        x = nn.ConvTranspose(
            self.out_channels, (3, 3), strides=(1, 1), padding='VALID'
        )(x)
        return x


class VAENet(nn.Module):
    z_size: int
    hidden: int

    def setup(self):
        self.encoder = ConvEncoder(out_size=2 * self.z_size, hidden=self.hidden)
        self.decoder = ConvDecoder(hidden=self.hidden)

    def __call__(self, x):
        mu, std = self.encode(x)
        return self.decoder(mu)

    def encode(self, x):
        h = self.encoder(x)
        mu, log_std = jnp.split(h, 2, axis=-1)
        std = jax.nn.softplus(log_std) + 1e-4  # reference: gms/vaes/vae.py:77
        return mu, std

    def decode(self, z):
        return self.decoder(z)


@register
class VAE(GM):
    DG = AttrDict()
    DG.z_size = 128
    DG.beta = 1.0

    def build(self):
        return VAENet(z_size=self.G.z_size, hidden=self.G.hidden_size)

    def __init__(self, G):
        super().__init__(G)
        self._jit_sample = jax.jit(self.sample_fn, static_argnums=1)
        self._jit_encode = jax.jit(
            lambda state, x: self.net.apply(
                {'params': state.params}, x, method=VAENet.encode
            )
        )
        self._jit_decode = jax.jit(
            lambda state, z: self.net.apply(
                {'params': state.params}, z, method=VAENet.decode
            )
        )

    def loss(self, params, x, y=None, rng=None, train=True):
        mu, std = self.net.apply({'params': params}, x, method=VAENet.encode)
        z = dists.Normal(mu, std).rsample(rng)
        decoded = self.net.apply({'params': params}, z, method=VAENet.decode)
        if self.G.binarize:
            recon_loss = -dists.Bernoulli(logits=decoded).log_prob(x).mean((1, 2, 3))
        else:
            recon_loss = -dists.Normal(decoded, 1.0).log_prob(x).mean((1, 2, 3))
        kl_loss = normal_kl(mu, std).mean(-1)
        loss = (recon_loss + self.G.beta * kl_loss).mean()
        metrics = {
            'vae_loss': loss,
            'recon_loss': recon_loss.mean(),
            'kl_loss': kl_loss.mean(),
        }
        return loss, metrics

    def sample_fn(self, state, n, rng):
        z = jax.random.normal(rng, (n, self.G.z_size))
        decoded = self.net.apply({'params': state.params}, z, method=VAENet.decode)
        return (jax.nn.sigmoid(decoded) > 0.5).astype(jnp.float32)

    def sample(self, n):
        return self._jit_sample(self.state, n, self.next_rng())

    def evaluate(self, writer, x, y, epoch):
        samples = self.sample(25)
        write_grid(writer, 'samples', samples, epoch)
        mu, _ = self._jit_encode(self.state, x[:8])
        logits = self._jit_decode(self.state, mu)
        recon = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        truth = x[:8]
        error = (recon - truth + 1.0) / 2.0
        stack = jnp.concatenate([truth, recon, error], 0)
        write_image(writer, 'reconstruction', combine_imgs(stack, 3, 8), epoch)
