"""Model zoo: importing this package registers every model with the registry
(explicit imports replace the reference's rglob reflection,
gms/common.py:38-55)."""

from generative_models_tpu.models.arbiters.autoencoder import Autoencoder
from generative_models_tpu.models.arbiters.classifier import Classifier
from generative_models_tpu.models.base import GM, Arbiter, Autoreg, TrainState
from generative_models_tpu.models.diffusion.model import DiffusionModel
from generative_models_tpu.models.gan import GAN
from generative_models_tpu.models.gated_pixel_cnn import GatedPixelCNN
from generative_models_tpu.models.made import MADE
from generative_models_tpu.models.pixel_cnn import PixelCNN
from generative_models_tpu.models.pixel_transformer import PixelTransformer
from generative_models_tpu.models.rnn import RNN
from generative_models_tpu.models.vae import VAE
from generative_models_tpu.models.vqvae import VQVAE
from generative_models_tpu.models.wavenet import Wavenet
