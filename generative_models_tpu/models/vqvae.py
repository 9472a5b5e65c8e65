"""VQ-VAE with a jointly trained PixelTransformer prior (reference:
gms/vaes/vqvae.py): conv encoder to a 7x7 code grid, nearest-neighbor
vector quantization with straight-through gradients, deconv decoder, and a
49-token categorical transformer prior trained on the (detached) code
indices in the same step with its own Adam.

TPU-native: the codebook search is a Pallas kernel (ops/quantize.py); both
optimizer steps fuse into one jitted train_step; prior sampling is a
KV-cached lax.scan.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from generative_models_tpu.models.base import GM, TrainState
from generative_models_tpu.models.pixel_transformer import (
    TransformerNet,
    transformer_sample_scan,
)
from generative_models_tpu.ops.quantize import vq_quantize
from generative_models_tpu.utils import (
    combine_imgs, dists, register, write_grid, write_image,
)
from generative_models_tpu.utils.config import AttrDict


class VQEncoder(nn.Module):
    """28 -> 14 -> 7 -> 7 -> 7 SAME convs (gms/vaes/vqvae.py:81-97)."""

    hidden: int
    vqD: int

    @nn.compact
    def __call__(self, x):
        H = self.hidden
        x = nn.relu(nn.Conv(H, (3, 3), strides=2, padding='SAME')(x))
        x = nn.relu(nn.Conv(H, (3, 3), strides=2, padding='SAME')(x))
        x = nn.relu(nn.Conv(H, (3, 3), strides=1, padding='SAME')(x))
        x = nn.relu(nn.Conv(self.vqD, (3, 3), strides=1, padding='SAME')(x))
        return x


class VQDecoder(nn.Module):
    """7 -> 24 -> 26 -> 28 -> 28 VALID deconvs (gms/vaes/vqvae.py:100-115)."""

    hidden: int

    @nn.compact
    def __call__(self, z):
        H = self.hidden
        x = nn.relu(nn.ConvTranspose(H, (6, 6), strides=(3, 3), padding='VALID')(z))
        x = nn.relu(nn.ConvTranspose(H, (3, 3), strides=(1, 1), padding='VALID')(x))
        x = nn.relu(nn.ConvTranspose(H, (3, 3), strides=(1, 1), padding='VALID')(x))
        return nn.ConvTranspose(1, (1, 1), strides=(1, 1), padding='VALID')(x)


class VQAENet(nn.Module):
    """encoder + codebook + decoder (the 'ae' optimizer's param group)."""

    hidden: int
    vqD: int
    vqK: int
    beta: float
    use_pallas: bool = True

    def setup(self):
        self.encoder = VQEncoder(self.hidden, self.vqD)
        self.decoder = VQDecoder(self.hidden)
        self.codebook = self.param(
            'codebook',
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / self.vqK, maxval=1.0 / self.vqK
            ),
            (self.vqK, self.vqD),
        )

    def __call__(self, x):
        z_e = self.encoder(x)
        embed_loss, z_q, perplexity, idxs, _ = vq_quantize(
            z_e, self.codebook, self.beta, self.use_pallas
        )
        decoded = self.decoder(z_q)
        return embed_loss, decoded, perplexity, idxs

    def decode_codes(self, one_hots):
        """(B, T=49, K) one-hot codes -> decoded logits."""
        B, T, _ = one_hots.shape
        hw = int(T**0.5)
        z_q = (one_hots @ self.codebook).reshape(B, hw, hw, self.vqD)
        return self.decoder(z_q)


@register
class VQVAE(GM):
    DG = AttrDict()
    DG.vqD = 64
    DG.vqK = 64
    DG.beta = 0.25
    DG.n_layer = 2
    DG.n_head = 8
    DG.n_embed = 256
    DG.prior_lr = 1e-3
    DG.fused_decode = 1  # prior sampling via ops/decode_fused.py (TPU only)

    def __init__(self, G):
        self.grid_hw = 8 if G.get('pad32', 0) else 7
        self.n_codes = self.grid_hw * self.grid_hw
        super().__init__(G)
        self._jit_sample = jax.jit(self.sample_fn, static_argnums=1)
        self._jit_forward = jax.jit(
            lambda state, x: self.ae.apply({'params': state.params['ae']}, x)
        )

    def build(self):
        from generative_models_tpu.ops import on_tpu

        self.ae = VQAENet(
            hidden=self.G.hidden_size, vqD=self.G.vqD, vqK=self.G.vqK,
            beta=self.G.beta, use_pallas=on_tpu(),
        )
        from generative_models_tpu.parallel import MODEL_AXIS, get_mesh

        mesh = get_mesh()
        self.prior = TransformerNet(
            in_size=self.G.vqK,
            block_size=self.n_codes,
            n_embed=self.G.n_embed,
            n_head=self.G.n_head,
            n_layer=self.G.n_layer,
            head='cat',
            use_pallas=on_tpu(),
            use_fused_decode=(
                on_tpu()
                and bool(self.G.get('fused_decode', 1))
                and (
                    MODEL_AXIS not in mesh.axis_names
                    or mesh.shape[MODEL_AXIS] == 1
                )
            ),
        )
        return None

    def param_sharding_rules(self):
        from generative_models_tpu.models.pixel_transformer import (
            transformer_tp_rules,
        )

        # prior transformer params live under 'prior/...'; the regexes are
        # suffix-anchored so they apply there too
        return transformer_tp_rules()

    def _prior_optimizer(self):
        # reference: Adam(prior_lr, betas=(0.5, 0.999)), gms/vaes/vqvae.py:32-34
        return optax.adam(self.G.prior_lr, b1=0.5, b2=0.999)

    def init_state(self, rng):
        ae_rng, pr_rng, s_rng = jax.random.split(rng, 3)
        size = 32 if self.G.get('pad32', 0) else 28
        ae_params = self.ae.init(ae_rng, jnp.zeros((1, size, size, 1)))['params']
        pr_params = self.prior.init(
            pr_rng, jnp.zeros((1, self.n_codes, self.G.vqK))
        )['params']
        params = {'ae': ae_params, 'prior': pr_params}
        opt_state = {
            'ae': self.make_optimizer().init(ae_params),
            'prior': self._prior_optimizer().init(pr_params),
        }
        return TrainState(
            params=params, opt_state=opt_state, step=jnp.int32(0), rng=s_rng
        )

    def train_step_fn(self, state, x, y=None):
        """Joint single-phase step: AE step then prior step on detached codes
        (reference gms/vaes/vqvae.py:36-57)."""
        params, opt_state = state.params, state.opt_state

        def ae_loss_fn(ae_params):
            embed_loss, decoded, perplexity, idxs = self.ae.apply(
                {'params': ae_params}, x
            )
            recon_loss = -dists.Bernoulli(logits=decoded).log_prob(x).mean()
            loss = recon_loss + embed_loss
            return loss, (recon_loss, embed_loss, perplexity, idxs)

        (loss, (recon_loss, embed_loss, perplexity, idxs)), ae_grads = (
            jax.value_and_grad(ae_loss_fn, has_aux=True)(params['ae'])
        )
        ae_up, ae_opt = self.make_optimizer().update(
            ae_grads, opt_state['ae'], params['ae']
        )
        ae_params = optax.apply_updates(params['ae'], ae_up)

        code_one_hot = jax.lax.stop_gradient(
            jax.nn.one_hot(idxs, self.G.vqK).reshape(x.shape[0], self.n_codes, self.G.vqK)
        )

        def prior_loss_fn(pr_params):
            dist = self.prior.apply({'params': pr_params}, code_one_hot)
            return -dist.log_prob(code_one_hot).mean()

        prior_loss, pr_grads = jax.value_and_grad(prior_loss_fn)(params['prior'])
        pr_up, pr_opt = self._prior_optimizer().update(
            pr_grads, opt_state['prior'], params['prior']
        )
        pr_params = optax.apply_updates(params['prior'], pr_up)

        new_state = state.replace(
            params={'ae': ae_params, 'prior': pr_params},
            opt_state={'ae': ae_opt, 'prior': pr_opt},
            step=state.step + 1,
        )
        metrics = {
            'vq_vae_loss': loss,
            'recon_loss': recon_loss,
            'embed_loss': embed_loss,
            'perplexity': perplexity,
            'prior_loss': prior_loss,
        }
        return new_state, metrics

    def loss(self, params, x, y=None, rng=None, train=True):
        """Test-sweep loss (mirrors the train metrics without the updates)."""
        embed_loss, decoded, perplexity, idxs = self.ae.apply({'params': params['ae']}, x)
        recon_loss = -dists.Bernoulli(logits=decoded).log_prob(x).mean()
        code_one_hot = jax.nn.one_hot(idxs, self.G.vqK).reshape(
            x.shape[0], self.n_codes, self.G.vqK
        )
        prior_dist = self.prior.apply({'params': params['prior']}, code_one_hot)
        prior_loss = -prior_dist.log_prob(code_one_hot).mean()
        loss = recon_loss + embed_loss
        return loss, {
            'vq_vae_loss': loss,
            'recon_loss': recon_loss,
            'embed_loss': embed_loss,
            'perplexity': perplexity,
            'prior_loss': prior_loss,
        }

    def sample_fn(self, state, n, rng):
        sample_token = lambda logits, key: dists.Categorical(logits=logits).sample(key)
        tokens = transformer_sample_scan(
            self.prior, state.params['prior'], n, rng, sample_token
        )  # (T, n, K) one-hot
        one_hots = tokens.transpose(1, 0, 2)
        decoded = self.ae.apply(
            {'params': state.params['ae']}, one_hots, method=VQAENet.decode_codes
        )
        return (jax.nn.sigmoid(decoded) > 0.5).astype(jnp.float32)

    def sample(self, n):
        return self._jit_sample(self.state, n, self.next_rng())

    def evaluate(self, writer, x, y, epoch):
        _, decoded, _, _ = self._jit_forward(self.state, x[:8])
        recon = (jax.nn.sigmoid(decoded) > 0.5).astype(jnp.float32)
        stack = jnp.concatenate([x[:8], recon], 0)
        write_image(writer, 'reconstruction', combine_imgs(stack, 2, 8), epoch)
        samples = self.sample(25)
        write_grid(writer, 'samples', samples, epoch)
