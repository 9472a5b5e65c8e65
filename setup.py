from setuptools import find_packages, setup

setup(
    name='generative_models_tpu',
    version='0.1.0',
    description=(
        'TPU-native JAX generative model zoo: autoregressive models, VAEs, '
        'GANs, VQ-VAE, and logSNR diffusion with Pallas kernels and '
        'mesh-sharded training'
    ),
    packages=find_packages(),
    python_requires='>=3.10',
    install_requires=[
        'jax',
        'flax',
        'optax',
        'numpy',
        'pyyaml',
        'einops',
        'imageio',
    ],
    extras_require={
        'logging': ['tensorboard', 'torch'],
        'data': ['scikit-learn'],
        'test': ['pytest'],
    },
    entry_points={
        'console_scripts': [
            'gmt-train=generative_models_tpu.main:main',
        ]
    },
)
