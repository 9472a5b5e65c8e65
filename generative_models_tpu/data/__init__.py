from generative_models_tpu.data.mnist import Dataset, load_mnist
