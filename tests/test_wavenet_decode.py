"""Incremental Wavenet decoding must reproduce the full teacher-forced
forward exactly (the shift-register analog of a KV cache)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_models_tpu.models.wavenet import WavenetNet


@pytest.mark.parametrize('use_resblock', [True, False])
def test_decode_step_matches_full_forward(use_resblock):
    T, C, n = 40, 8, 3
    net = WavenetNet(res_channels=C, use_resblock=use_resblock, layer_size=4)
    rng = np.random.RandomState(0)
    s = jnp.asarray(rng.randn(n, T, 3), jnp.float32)
    params = net.init(jax.random.key(0), s)['params']
    full_logits = net.apply({'params': params}, s)  # (n, T)

    buffers = net.apply({'params': params}, n, method=WavenetNet.init_buffers)
    step_logits = []
    s_prev = jnp.zeros((n, 3))
    for t in range(T):
        logit, buffers = net.apply(
            {'params': params}, buffers, s_prev, jnp.int32(t),
            method=WavenetNet.decode_step,
        )
        step_logits.append(logit)
        s_prev = s[:, t]
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(full_logits), rtol=2e-4, atol=2e-5
    )
