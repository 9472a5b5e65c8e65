"""Fused decode-step kernels (ops/decode_fused.py) vs the plain per-op XLA
decode chain: teacher-forced logits must match step by step (interpret-mode
Pallas on CPU, f32 — same validation pattern as the flash-attention
kernels)."""

import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.models.pixel_transformer import TransformerNet

T, C, H, L, B = 16, 32, 4, 2, 3


def _nets():
    kw = dict(
        in_size=1, block_size=T, n_embed=C, n_head=H, n_layer=L,
        head='bin', use_pallas=False,
    )
    return (
        TransformerNet(**kw),
        TransformerNet(**kw, use_fused_decode=True),
    )


def test_fused_decode_matches_plain_stepwise():
    net_p, net_f = _nets()
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.rand(B, T, 1) > 0.5).astype(np.float32))
    params = net_p.init(jax.random.key(0), x)['params']

    cache_p = net_p.apply(
        {'params': params}, B, method=TransformerNet.init_cache
    )
    cache_f = net_f.apply(
        {'params': params}, B, method=TransformerNet.init_cache
    )
    prev = jnp.zeros((B, 1))
    for t in range(T):
        lp, cache_p = net_p.apply(
            {'params': params}, prev, cache_p, t,
            method=TransformerNet.decode_step,
        )
        lf, cache_f = net_f.apply(
            {'params': params}, prev, cache_f, t,
            method=TransformerNet.decode_step,
        )
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lp), rtol=1e-4, atol=1e-5,
            err_msg=f'step {t}',
        )
        prev = jnp.asarray((rng.rand(B, 1) > 0.5).astype(np.float32))


def test_fused_decode_matches_full_forward():
    """The fused decode chain teacher-forced over a full sequence must
    reproduce the training forward's logits at every position."""
    net_p, net_f = _nets()
    rng = np.random.RandomState(1)
    x = jnp.asarray((rng.rand(B, T, 1) > 0.5).astype(np.float32))
    params = net_p.init(jax.random.key(0), x)['params']
    full_logits = net_p.apply({'params': params}, x).logits  # (B, T, 1)

    cache = net_f.apply({'params': params}, B, method=TransformerNet.init_cache)
    prev = jnp.zeros((B, 1))
    for t in range(T):
        logits_t, cache = net_f.apply(
            {'params': params}, prev, cache, t,
            method=TransformerNet.decode_step,
        )
        np.testing.assert_allclose(
            np.asarray(logits_t), np.asarray(full_logits[:, t]),
            rtol=1e-4, atol=1e-5, err_msg=f'pos {t}',
        )
        prev = x[:, t]


def test_segmented_sample_scan_bitwise_identical():
    """segments > 1 (triangular cache reads) must reproduce the unsegmented
    scan's tokens BITWISE: truncating the cache only removes rows whose
    softmax weight is exactly 0 (exp(NEG_INF - m) underflows to 0.0), so
    every partial sum is unchanged."""
    from generative_models_tpu.models.pixel_transformer import (
        transformer_sample_scan,
    )

    net, _ = _nets()
    rng = np.random.RandomState(2)
    x = jnp.asarray((rng.rand(B, T, 1) > 0.5).astype(np.float32))
    params = net.init(jax.random.key(0), x)['params']
    tok = lambda logits, key: (logits > 0).astype(jnp.float32)
    key = jax.random.key(1)
    base = transformer_sample_scan(net, params, B, key, tok, segments=1)
    for segments in (2, 4, 8):
        seg = transformer_sample_scan(net, params, B, key, tok,
                                      segments=segments)
        np.testing.assert_array_equal(np.asarray(seg), np.asarray(base))
