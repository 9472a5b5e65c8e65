import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.ops.attention import (
    causal_attention,
    decode_step_attention,
    xla_causal_attention,
)


def _qkv(B=2, H=2, T=20, D=8, seed=0):
    rng = np.random.RandomState(seed)
    f = lambda: jnp.asarray(rng.randn(B, H, T, D), jnp.float32)
    return f(), f(), f()


def test_flash_kernel_matches_dense():
    q, k, v = _qkv(T=200)  # exercises padding (200 -> 256) + multi-block
    out_flash = causal_attention(q, k, v, True)  # interpret mode on CPU
    out_dense = xla_causal_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_dense), rtol=2e-4, atol=2e-5
    )


def test_flash_grads_match_dense():
    q, k, v = _qkv(T=140)
    f1 = lambda q, k, v: jnp.sum(causal_attention(q, k, v, True) ** 2)
    f2 = lambda q, k, v: jnp.sum(xla_causal_attention(q, k, v) ** 2)
    g1 = jax.grad(f1, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_attention_is_causal():
    q, k, v = _qkv(T=16)
    out1 = xla_causal_attention(q, k, v)
    # perturb the future: outputs at position t must not change
    k2 = k.at[:, :, 10:].add(100.0)
    v2 = v.at[:, :, 10:].add(-50.0)
    out2 = xla_causal_attention(q, k2, v2)
    np.testing.assert_allclose(
        np.asarray(out1[:, :, :10]), np.asarray(out2[:, :, :10]), atol=1e-5
    )


def test_decode_step_matches_full_forward():
    """KV-cache decoding (packed T-major cache) must reproduce the full
    causal attention."""
    q, k, v = _qkv(T=12)
    full = xla_causal_attention(q, k, v)
    B, H, T, D = q.shape
    # pack (B, H, T, D) k/v into the (T, B, 2, H*D) cache layout
    to_rows = lambda u: u.transpose(2, 0, 1, 3).reshape(T, B, H * D)
    kv_cache = jnp.stack([to_rows(k), to_rows(v)], 2)  # (T, B, 2, HD)
    for t in [0, 5, 11]:
        q1 = q[:, :, t].reshape(B, H * D)
        out_t = decode_step_attention(q1, kv_cache, t, H)
        np.testing.assert_allclose(
            np.asarray(out_t.reshape(B, H, D)),
            np.asarray(full[:, :, t]),
            rtol=1e-5, atol=1e-5,
        )


def test_transformer_cache_sampling_consistent():
    """decode_step chain through TransformerNet == teacher-forced forward."""
    from generative_models_tpu.models.pixel_transformer import TransformerNet

    net = TransformerNet(
        in_size=1, block_size=8, n_embed=16, n_head=2, n_layer=2, head='bin',
        use_pallas=False,
    )
    x = jnp.asarray((np.random.RandomState(0).rand(3, 8, 1) > 0.5), jnp.float32)
    params = net.init(jax.random.key(0), x)['params']
    dist = net.apply({'params': params}, x)
    full_logits = dist.logits  # (3, 8, 1)

    caches = net.init_cache(3)
    shifted = jnp.concatenate([jnp.zeros((3, 1, 1)), x[:, :-1]], axis=1)
    for t in range(8):
        logits_t, caches = net.apply(
            {'params': params}, shifted[:, t], caches, t,
            method=TransformerNet.decode_step,
        )
        np.testing.assert_allclose(
            np.asarray(logits_t), np.asarray(full_logits[:, t]), rtol=1e-4, atol=1e-4
        )


def test_streamed_long_context_path_matches_dense():
    """T=1664 exceeds the static-unroll budget, so _plan routes to the
    streamed kernels (3-D grid over (bh-group, q-block, kv-block) with
    pl.when-predicated causally-live block pairs and VMEM scratch
    accumulators); both forward and gradients must match dense XLA in
    interpret mode."""
    from generative_models_tpu.ops.attention import _plan

    assert _plan(784)[0] == 'static'
    assert _plan(1664)[0] == 'streamed'
    assert _plan(100000)[0] == 'streamed'  # no dense cliff at any length

    q, k, v = _qkv(B=1, H=1, T=1664, D=8)
    out_flash = causal_attention(q, k, v, True)
    out_dense = xla_causal_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_dense), rtol=2e-4, atol=2e-5
    )
    f1 = lambda q, k, v: jnp.sum(causal_attention(q, k, v, True) ** 2)
    f2 = lambda q, k, v: jnp.sum(xla_causal_attention(q, k, v) ** 2)
    g1 = jax.grad(f1, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_streamed_path_with_padding_matches_dense():
    """Streamed kernels with T NOT a multiple of the 128 block (T=1600 ->
    Tp=1664): padded q rows and padded K/V tails must not leak into valid
    outputs or gradients."""
    from generative_models_tpu.ops.attention import _plan

    assert _plan(1600)[0] == 'streamed'
    q, k, v = _qkv(B=1, H=1, T=1600, D=8)
    np.testing.assert_allclose(
        np.asarray(causal_attention(q, k, v, True)),
        np.asarray(xla_causal_attention(q, k, v)),
        rtol=2e-4, atol=2e-5,
    )
    g1 = jax.grad(
        lambda q, k, v: jnp.sum(causal_attention(q, k, v, True) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    g2 = jax.grad(
        lambda q, k, v: jnp.sum(xla_causal_attention(q, k, v) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_bf16_inputs_keep_dtype_through_fwd_and_grad():
    """The Pallas path must honor the same dtype contract as the XLA path:
    bf16 in -> bf16 out, and custom_vjp cotangents matching the primal
    dtypes (a f32 grad against a bf16 primal is a trace-time error)."""
    q, k, v = _qkv(T=24)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = causal_attention(qb, kb, vb, True)
    assert out.dtype == jnp.bfloat16
    f = lambda q, k, v: jnp.sum(causal_attention(q, k, v, True).astype(jnp.float32) ** 2)
    gq, gk, gv = jax.grad(f, argnums=(0, 1, 2))(qb, kb, vb)
    assert gq.dtype == gk.dtype == gv.dtype == jnp.bfloat16
    # values still track the f32 dense path within bf16 resolution
    ref = jax.grad(
        lambda q, k, v: jnp.sum(xla_causal_attention(q, k, v) ** 2),
        argnums=0,
    )(q, k, v)
    np.testing.assert_allclose(
        np.asarray(gq, np.float32), np.asarray(ref), rtol=0.15, atol=0.1
    )


def test_xla_fallback_t_valid_masks_padded_keys():
    """t_valid must zero out attention to padded tail keys, matching the
    ring-chunk kernels' semantics."""
    q, k, v = _qkv(T=16)
    out_masked = xla_causal_attention(q, k, v, t_valid=10)
    # garbage in the padded tail must not leak into any output row
    k2 = k.at[:, :, 10:].add(123.0)
    v2 = v.at[:, :, 10:].add(-77.0)
    out_masked2 = xla_causal_attention(q, k2, v2, t_valid=10)
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_masked2), atol=1e-5
    )
    # and the first t_valid rows equal plain causal attention on the
    # unpadded prefix
    ref = xla_causal_attention(q[:, :, :10], k[:, :, :10], v[:, :, :10])
    np.testing.assert_allclose(
        np.asarray(out_masked[:, :, :10]), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
