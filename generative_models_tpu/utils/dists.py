"""Minimal distribution library (jnp-native stand-in for torch.distributions).

Only what the zoo needs: Bernoulli / Normal / independent Categorical
(multinomial-over-last-axis), with numerically stable log_probs and
jax.random sampling. All functions are pure and jit/vmap/scan friendly.
"""

import jax
import jax.numpy as jnp


class Bernoulli:
    """Bernoulli parameterized by logits (reference usage: tdib.Bernoulli
    in gms/autoregs/made.py:63, gms/vaes/vae.py:26, etc.)."""

    def __init__(self, logits=None, probs=None):
        if logits is None:
            eps = 1e-7
            p = jnp.clip(probs, eps, 1 - eps)
            logits = jnp.log(p) - jnp.log1p(-p)
        self.logits = logits

    @property
    def probs(self):
        return jax.nn.sigmoid(self.logits)

    def log_prob(self, x):
        # -softplus(-l)*x - softplus(l)*(1-x), stable for large |logits|
        l = self.logits
        return x * jax.nn.log_sigmoid(l) + (1.0 - x) * jax.nn.log_sigmoid(-l)

    def sample(self, rng):
        return jnp.asarray(
            jax.random.uniform(rng, self.logits.shape) < self.probs,
            dtype=self.logits.dtype,
        )

    def mode(self):
        return jnp.asarray(self.logits > 0, dtype=self.logits.dtype)


class Normal:
    def __init__(self, loc, scale):
        self.loc = loc
        self.scale = scale

    def log_prob(self, x):
        var = self.scale**2
        return -0.5 * (
            jnp.log(2 * jnp.pi) + jnp.log(var) + (x - self.loc) ** 2 / var
        )

    def sample(self, rng):
        shape = jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))
        return self.loc + self.scale * jax.random.normal(rng, shape)

    rsample = sample  # reparameterized by construction


def normal_kl(p_loc, p_scale, q_loc=0.0, q_scale=1.0):
    """KL(N(p) || N(q)) elementwise (torch.distributions.kl_divergence parity
    for Normals; reference usage gms/vaes/vae.py:30-31)."""
    var_ratio = (p_scale / q_scale) ** 2
    t1 = ((p_loc - q_loc) / q_scale) ** 2
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


class Categorical:
    """Independent categorical over the last axis; log_prob of a one-hot x is
    the multinomial(total_count=1) log-pmf (reference: CategoricalHead uses
    tdib.Multinomial with one-hot samples, gms/common.py:211-220)."""

    def __init__(self, logits):
        self.logits = logits

    def log_prob(self, one_hot_x):
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        return jnp.sum(one_hot_x * logp, axis=-1)

    def sample(self, rng):
        idx = jax.random.categorical(rng, self.logits, axis=-1)
        return jax.nn.one_hot(idx, self.logits.shape[-1], dtype=self.logits.dtype)

    def sample_index(self, rng):
        return jax.random.categorical(rng, self.logits, axis=-1)
