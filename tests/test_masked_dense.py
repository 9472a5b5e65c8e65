import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.ops import masked_dense


def _data(B=8, K=20, N=12, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, K), jnp.float32)
    w = jnp.asarray(rng.randn(K, N), jnp.float32)
    b = jnp.asarray(rng.randn(N), jnp.float32)
    mask = jnp.asarray(rng.rand(K, N) > 0.5, jnp.float32)
    return x, w, b, mask


def test_pallas_matches_xla():
    x, w, b, mask = _data()
    out_pallas = masked_dense(x, w, b, mask, True)  # interpret mode on CPU
    out_xla = masked_dense(x, w, b, mask, False)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), rtol=1e-5, atol=1e-5
    )


def test_grads_match_autodiff_through_masked_weight():
    x, w, b, mask = _data()

    def f_kernel(x, w, b):
        return jnp.sum(masked_dense(x, w, b, mask, True) ** 2)

    def f_explicit(x, w, b):
        return jnp.sum((x @ (w * mask) + b) ** 2)

    g1 = jax.grad(f_kernel, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(f_explicit, argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_weight_grad_respects_mask():
    x, w, b, mask = _data()
    dw = jax.grad(lambda w: jnp.sum(masked_dense(x, w, b, mask, True)))(w)
    assert np.allclose(np.asarray(dw) * (1 - np.asarray(mask)), 0.0)


def test_k_blocked_accumulation_path():
    """K=1300 forces multiple K grid steps (bk=512): exercises the scratch
    zero-init at k==0, += accumulation, and the last-step output-mask gate
    in the weight-gradient kernel."""
    rng = np.random.RandomState(3)
    K, N, B = 1300, 256, 16
    x = jnp.asarray(rng.randn(B, K), jnp.float32)
    w = jnp.asarray(rng.randn(K, N) * 0.01, jnp.float32)
    b = jnp.zeros((N,), jnp.float32)
    m = jnp.asarray((rng.rand(K, N) > 0.5).astype(np.float32))
    y_p = masked_dense(x, w, b, m, True)
    y_x = x @ (w * m) + b
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-4, atol=1e-4)
    g_p = jax.grad(
        lambda x, w: masked_dense(x, w, b, m, True).sum(), argnums=(0, 1)
    )(x, w)
    g_x = jax.grad(lambda x, w: ((x @ (w * m)) + b).sum(), argnums=(0, 1))(x, w)
    for a, bb in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4)


def test_bf16_inputs_keep_dtype_through_fwd_and_grad():
    """Pallas path dtype contract: bf16 in -> bf16 out; custom_vjp
    cotangents match primal dtypes (f32-vs-bf16 is a trace error)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 12), jnp.bfloat16)
    w = jnp.asarray(rng.randn(12, 8), jnp.bfloat16)
    b = jnp.asarray(rng.randn(8), jnp.bfloat16)
    mask = jnp.asarray(rng.rand(12, 8) > 0.5, jnp.bfloat16)
    y = masked_dense(x, w, b, mask, True)
    assert y.dtype == jnp.bfloat16
    f = lambda x, w, b: jnp.sum(
        masked_dense(x, w, b, mask, True).astype(jnp.float32) ** 2
    )
    dx, dw, db = jax.grad(f, argnums=(0, 1, 2))(x, w, b)
    assert dx.dtype == dw.dtype == db.dtype == jnp.bfloat16
