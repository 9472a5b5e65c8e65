"""Arbiter MNIST classifier (reference: gms/arbiters/classifier.py): the
autoencoder's conv encoder with out_size=10, cross-entropy; scores
class-conditional samples in eval_heavy."""

import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.models.base import Arbiter
from generative_models_tpu.models.vae import ConvEncoder
from generative_models_tpu.utils import register, to_numpy, write_image
from generative_models_tpu.utils.config import AttrDict
from generative_models_tpu.utils.metrics import cross_entropy


@register
class Classifier(Arbiter):
    DG = AttrDict()
    DG.eval_heavy = False
    DG.epochs = 6  # starts to overfit after about this many
    DG.binarize = 0
    DG.save_n = 1

    def build(self):
        return ConvEncoder(out_size=10, hidden=self.G.hidden_size)

    def __init__(self, G):
        super().__init__(G)
        self._jit_logits = jax.jit(
            lambda state, x: self.net.apply({'params': state.params}, x)
        )

    def feature_fn(self, params, x):
        return self.net.apply({'params': params}, x)

    def loss(self, params, x, y, rng=None, train=True):
        logits = self.net.apply({'params': params}, x)
        loss = cross_entropy(logits, y)
        return loss, {'cross_entropy_loss': loss}

    def evaluate(self, writer, x, y, epoch):
        """green/red-tinted prediction strip (reference classifier.py:35-49)."""
        N = 10
        preds = jnp.argmax(self._jit_logits(self.state, x[:N]), axis=1)
        correct = np.asarray(preds == y[:N])
        imgs = np.repeat(to_numpy(x[:N]), 3, axis=-1)  # (N, H, W, 3)
        imgs = np.clip(imgs, 0.0, 1.0)
        imgs[correct, :, :, 0] = 0
        imgs[correct, :, :, 2] = 0
        imgs[~correct, :, :, 1] = 0
        imgs[~correct, :, :, 2] = 0
        strip = imgs.transpose(1, 0, 2, 3).reshape(
            imgs.shape[1], imgs.shape[0] * imgs.shape[2], 3
        )
        write_image(writer, 'classifier/pred', strip, epoch)
