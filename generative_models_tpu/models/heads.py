"""Distribution heads (reference: gms/common.py:211-232): a single Dense
producing Bernoulli or Categorical logits."""

import flax.linen as nn

from generative_models_tpu.utils import dists


class BinaryHead(nn.Module):
    out_n: int

    @nn.compact
    def __call__(self, x):
        return dists.Bernoulli(logits=nn.Dense(self.out_n)(x))


class CategoricalHead(nn.Module):
    out_n: int

    @nn.compact
    def __call__(self, x):
        return dists.Categorical(logits=nn.Dense(self.out_n)(x))
