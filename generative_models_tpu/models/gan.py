"""DCGAN-style GAN (reference: gms/gans/gan.py): deconv generator with
BatchNorm+tanh, conv discriminator, twin Adam(lr=5e-5, betas=(0.5, 0.999))
optimizers, BCE real=1/fake=0 then a non-saturating generator step.

TPU-native: both optimizer steps fuse into ONE jitted train_step; BatchNorm
batch_stats are carried functionally in state.extra (the 'mutable batch
stats' hard part, SURVEY.md §7); discriminator outputs logits and the BCE is
computed in log-space for stability (same value as sigmoid+BCELoss).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from generative_models_tpu.models.base import GM, TrainState
from generative_models_tpu.utils import register, write_grid
from generative_models_tpu.utils.config import AttrDict


def dcgan_normal_init(scale=0.02):
    return nn.initializers.normal(stddev=scale)


def dcgan_bn_scale_init(scale=0.02):
    """BatchNorm scales ~ N(1.0, 0.02) — the reference's weights_init
    (gms/gans/gan.py:115-121) centers BN weights at 1. Rounds 1-4 used the
    conv initializer N(0, 0.02) here by mistake, which strangles the forward
    signal at init (BN output ~= 0.02 * normalized, so ReLU activations
    start ~50x too small); scripts/gan_crosscheck.py measures the training-
    dynamics consequence of that deviation side by side."""

    def init(key, shape, dtype=jnp.float32):
        return jnp.ones(shape, dtype) + scale * jax.random.normal(key, shape, dtype)

    return init


class Generator(nn.Module):
    """noise -> 28x28 tanh image (gms/gans/gan.py:68-89 geometry)."""

    hidden: int

    @nn.compact
    def __call__(self, z, train=True):
        H = self.hidden
        x = z[:, None, None, :]
        for kernel, stride in [((5, 5), 1), ((4, 4), 2), ((4, 4), 2)]:
            x = nn.ConvTranspose(
                H, kernel, strides=(stride, stride), padding='VALID',
                kernel_init=dcgan_normal_init(),
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                scale_init=dcgan_bn_scale_init(),
            )(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(
            1, (3, 3), strides=(1, 1), padding='VALID', kernel_init=dcgan_normal_init()
        )(x)
        return jnp.tanh(x)


class Discriminator(nn.Module):
    """28x28 -> real/fake logit (gms/gans/gan.py:92-112 geometry).

    spectral=True (--spectral_norm=1, default off => reference-exact):
    every conv is wrapped in flax SpectralNorm (power-iteration u vectors
    ride the same 'batch_stats' collection as the BatchNorms), the standard
    Lipschitz stabilizer for small-GAN training."""

    hidden: int
    spectral: bool = False

    def _conv(self, x, features, stride, train):
        conv = nn.Conv(
            features, (3, 3), strides=stride, padding='VALID',
            kernel_init=dcgan_normal_init(),
        )
        if self.spectral:
            return nn.SpectralNorm(conv)(x, update_stats=train)
        return conv(x)

    @nn.compact
    def __call__(self, x, train=True):
        H = self.hidden
        x = self._conv(x, H, 2, train)
        x = nn.leaky_relu(x, 0.01)
        for stride in [2, 1]:
            x = self._conv(x, H, stride, train)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                scale_init=dcgan_bn_scale_init(),
            )(x)
            x = nn.leaky_relu(x, 0.01)
        x = self._conv(x, 1, 2, train)
        return x.reshape(x.shape[0])  # logits


def bce_with_logits(logits, target):
    """Same value as BCELoss(sigmoid(logits), target), computed stably."""
    pos = target * jax.nn.log_sigmoid(logits)
    neg = (1 - target) * jax.nn.log_sigmoid(-logits)
    return jnp.mean(-(pos + neg))


@register
class GAN(GM):
    DG = AttrDict()
    DG.noise_size = 128
    DG.lr = 5e-5
    DG.binarize = 0  # GAN trains on [-1,1] data (reference: gms/gans/gan.py:16)
    # opt-in stabilizers (both default-off => reference-exact training):
    DG.disc_lr = 0.0  # separate discriminator lr (0 = --lr for both). On
    # this workload the measured failure mode is the DISC winning outright
    # (sustained disc loss < 0.1 from epoch 1, gen loss -> 10+, FID stuck
    # >= 0.75). The collapse is DATA-BORNE, not a framework bug: the torch
    # reference DCGAN on the identical fallback data/batch order follows
    # the same trajectory (scripts/gan_crosscheck.py -> gan_crosscheck.json,
    # docs/RESULTS.md "GAN collapse, cross-framework"). With the corrected
    # BN-scale init (round 5) the default run ESCAPES the collapse around
    # epoch ~23 and recovers to FID 0.048 by epoch 50; the round-1..4
    # zero-centered init never escaped (0.787 @ 50). The stabilizer story
    # is init-sensitive: under the legacy init only --disc_lr=1e-5 rescued
    # the run (FID 0.039); the corrected-init 50-epoch sweep
    # (scripts/gan_stabilizer_sweep.sh -> docs/RESULTS.md) is the current
    # record. Defaults stay reference-exact.
    DG.spectral_norm = 0  # spectral-normalize the discriminator convs
    DG.label_smooth = 0.0  # one-sided label smoothing: disc's real target
    # becomes 1 - label_smooth (Salimans et al. 2016); measured on this
    # workload it does NOT rescue the collapse (see sweep)
    SAMPLE_RANGE = (-1.0, 1.0)  # generator ends in tanh

    def build(self):
        return None  # two separate modules below

    def __init__(self, G):
        self.gen = Generator(hidden=G.hidden_size)
        self.disc = Discriminator(
            hidden=G.hidden_size, spectral=bool(G.get('spectral_norm', 0))
        )
        super().__init__(G)
        self.fixed_noise = jax.random.normal(
            jax.random.key(G.get('seed', 0) + 7), (25, G.noise_size)
        )
        self._jit_sample = jax.jit(self.sample_fn, static_argnums=1)

    def make_optimizer(self):
        return optax.adam(self.G.lr, b1=0.5, b2=0.999)

    def make_disc_optimizer(self):
        lr = float(self.G.get('disc_lr', 0.0)) or self.G.lr
        return optax.adam(lr, b1=0.5, b2=0.999)

    def init_state(self, rng):
        g_rng, d_rng, s_rng = jax.random.split(rng, 3)
        size = 32 if self.G.get('pad32', 0) else 28
        g_vars = self.gen.init(g_rng, jnp.zeros((1, self.G.noise_size)), train=False)
        d_vars = self.disc.init(d_rng, jnp.zeros((1, size, size, 1)), train=False)
        params = {'gen': g_vars['params'], 'disc': d_vars['params']}
        stats = {'gen': g_vars['batch_stats'], 'disc': d_vars['batch_stats']}
        opt_state = {
            'gen': self.make_optimizer().init(params['gen']),
            'disc': self.make_disc_optimizer().init(params['disc']),
        }
        return TrainState(
            params=params, opt_state=opt_state, step=jnp.int32(0), rng=s_rng, extra=stats
        )

    def _gen_apply(self, params, stats, z, train):
        return self.gen.apply(
            {'params': params, 'batch_stats': stats}, z, train=train,
            mutable=['batch_stats'] if train else False,
        )

    def _disc_apply(self, params, stats, x, train):
        return self.disc.apply(
            {'params': params, 'batch_stats': stats}, x, train=train,
            mutable=['batch_stats'] if train else False,
        )

    def train_step_fn(self, state, x, y=None):
        """Twin-optimizer step (reference: gms/gans/gan.py:27-54), one jit."""
        opt = self.make_optimizer()
        d_opt_tx = self.make_disc_optimizer()
        rng = jax.random.fold_in(state.rng, state.step)
        bs = x.shape[0]
        noise = jax.random.normal(rng, (bs, self.G.noise_size))
        params, stats, opt_state = state.params, state.extra, state.opt_state

        # fake batch (generator in train mode; stats update as in the
        # reference where gen BN sees the batch during the disc step)
        fake, g_mut = self._gen_apply(params['gen'], stats['gen'], noise, True)

        # --- discriminator step ---
        real_target = 1.0 - float(self.G.get('label_smooth', 0.0))

        def disc_loss_fn(d_params):
            real_logits, d_mut1 = self._disc_apply(d_params, stats['disc'], x, True)
            loss_real = bce_with_logits(real_logits, real_target * jnp.ones(bs))
            fake_logits, d_mut2 = self._disc_apply(
                d_params, d_mut1['batch_stats'], jax.lax.stop_gradient(fake), True
            )
            loss_fake = bce_with_logits(fake_logits, jnp.zeros(bs))
            return loss_real + loss_fake, (loss_real, loss_fake, d_mut2['batch_stats'])

        (d_loss, (loss_real, loss_fake, d_stats)), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(params['disc'])
        d_updates, d_opt = d_opt_tx.update(
            d_grads, opt_state['disc'], params['disc']
        )
        d_params = optax.apply_updates(params['disc'], d_updates)

        # --- generator step (against the UPDATED discriminator) ---
        def gen_loss_fn(g_params):
            fake2, g_mut2 = self._gen_apply(g_params, stats['gen'], noise, True)
            fake_logits, _ = self._disc_apply(d_params, d_stats, fake2, True)
            return bce_with_logits(fake_logits, jnp.ones(bs)), g_mut2['batch_stats']

        (g_loss, g_stats), g_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            params['gen']
        )
        g_updates, g_opt = opt.update(g_grads, opt_state['gen'], params['gen'])
        g_params = optax.apply_updates(params['gen'], g_updates)

        new_state = state.replace(
            params={'gen': g_params, 'disc': d_params},
            opt_state={'gen': g_opt, 'disc': d_opt},
            extra={'gen': g_stats, 'disc': d_stats},
            step=state.step + 1,
        )
        metrics = {
            'disc/loss': d_loss,
            'disc/loss_fake': loss_fake,
            'disc/loss_real': loss_real,
            'gen/loss': g_loss,
        }
        return new_state, metrics

    def sample_fn(self, state, n, rng):
        noise = jax.random.normal(rng, (n, self.G.noise_size))
        return self.gen.apply(
            {'params': state.params['gen'], 'batch_stats': state.extra['gen']},
            noise, train=False,
        )

    def sample(self, n):
        return self._jit_sample(self.state, n, self.next_rng())

    def evaluate(self, writer, x, y, epoch):
        samples = self.sample(25)
        write_grid(writer, 'samples', (samples + 1.0) / 2.0, epoch)
        fixed = self.gen.apply(
            {'params': self.state.params['gen'], 'batch_stats': self.state.extra['gen']},
            self.fixed_noise, train=False,
        )
        write_grid(writer, 'fixed_noise', (fixed + 1.0) / 2.0, epoch)
