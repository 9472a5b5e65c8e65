import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.ops.quantize import vq_one_hot, vq_quantize


def test_pallas_one_hot_matches_xla():
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(50, 16), jnp.float32)
    cb = jnp.asarray(rng.randn(24, 16), jnp.float32)
    oh_p = vq_one_hot(z, cb, use_pallas=True)  # interpret mode on CPU
    oh_x = vq_one_hot(z, cb, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(oh_p), np.asarray(oh_x))
    assert np.all(np.asarray(oh_p).sum(-1) == 1.0)


def test_nearest_neighbor_correct():
    cb = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [-1.0, 2.0]], jnp.float32)
    z = jnp.asarray([[0.1, -0.1], [0.9, 1.2], [-0.8, 1.7]], jnp.float32)
    oh = vq_one_hot(z, cb, use_pallas=False)
    np.testing.assert_array_equal(np.argmax(np.asarray(oh), -1), [0, 1, 2])


def test_straight_through_gradient():
    """d loss/d z must flow through z_q as identity (straight-through)."""
    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.randn(2, 4, 4, 8), jnp.float32)
    cb = jnp.asarray(rng.randn(16, 8), jnp.float32)

    def recon_loss(z):
        _, z_q, _, _, _ = vq_quantize(z, cb, beta=0.25, use_pallas=False)
        return jnp.sum(z_q * 2.0)

    g = jax.grad(recon_loss)(z)
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones_like(g), atol=1e-6)


def test_codebook_gradient_through_commitment():
    rng = np.random.RandomState(2)
    z = jnp.asarray(rng.randn(2, 4, 4, 8), jnp.float32)
    cb = jnp.asarray(rng.randn(16, 8), jnp.float32)

    def embed_loss(cb):
        loss, _, _, _, _ = vq_quantize(z, cb, beta=0.25, use_pallas=False)
        return loss

    g = jax.grad(embed_loss)(cb)
    assert np.any(np.asarray(g) != 0.0)


def test_perplexity_bounds():
    rng = np.random.RandomState(3)
    z = jnp.asarray(rng.randn(4, 7, 7, 8), jnp.float32)
    cb = jnp.asarray(rng.randn(16, 8), jnp.float32)
    _, _, perplexity, idxs, _ = vq_quantize(z, cb, beta=0.25, use_pallas=False)
    assert 1.0 <= float(perplexity) <= 16.0
    assert idxs.shape == (4, 7, 7)


def test_pick_bn_vmem_budget():
    """Block sizing: the (bn, Kp) out block must fit scoped VMEM. The old
    fixed bn=1024 OOM'd on chip at Kp=4096 (16 MB out block alone)."""
    from generative_models_tpu.ops.quantize import _VMEM_BUDGET, _pick_bn

    assert _pick_bn(64 * 7 * 7, 128, 128) == 1024  # zoo shape: unchanged
    bn = _pick_bn(50176, 4096, 128)
    assert bn is not None and bn < 1024
    assert 4 * (2 * bn * (4096 + 128) + 4096 * 128) <= _VMEM_BUDGET
    # a codebook whose VMEM residency alone busts the budget -> None (XLA)
    assert _pick_bn(1024, 65536, 8192) is None
    # shrinking must keep the sublane dim 8-aligned (Mosaic rejects f32
    # blocks otherwise): N=196 rounds to bn=200, and naive halving would
    # yield 100/50/...
    for args in ((196, 8192, 128), (1000, 4096, 128)):
        bn = _pick_bn(*args)
        assert bn is not None and bn % 8 == 0, (args, bn)


def test_large_codebook_shrunken_block_matches_xla():
    """Kp=2048 forces a shrunken bn (and exercises the multi-block grid);
    interpret-mode kernel must still match the XLA argmin exactly."""
    z = jax.random.normal(jax.random.key(3), (160, 32))
    cb = jax.random.normal(jax.random.key(4), (2048, 32))
    from generative_models_tpu.ops.quantize import _pick_bn

    assert _pick_bn(160, 2048, 128) < 1024
    oh_p = vq_one_hot(z, cb, use_pallas=True, interpret=True)
    oh_x = vq_one_hot(z, cb, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(oh_p), np.asarray(oh_x))


def test_oversized_codebook_falls_back_to_xla():
    """When not even bn=8 fits, vq_one_hot must route to the XLA form
    rather than emit a kernel that will VMEM-OOM."""
    from unittest import mock

    import generative_models_tpu.ops.quantize as q

    z = jax.random.normal(jax.random.key(5), (16, 8))
    cb = jax.random.normal(jax.random.key(6), (64, 8))
    with mock.patch.object(q, '_pick_bn', return_value=None):
        oh = q.vq_one_hot(z, cb, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(oh), np.asarray(vq_one_hot(z, cb, use_pallas=False))
    )
