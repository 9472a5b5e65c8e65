"""Numeric parity of the diffusion math against the reference implementation
(imported read-only from /root/reference for test-time comparison; our
implementation lives in generative_models_tpu/models/diffusion)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from generative_models_tpu.models.diffusion import gaussian_diffusion as gd
from generative_models_tpu.models.diffusion.schedules import get_logsnr_schedule

# reference modules for golden values (pure torch+numpy, no torchvision)
sys.path.insert(0, '/root/reference')
try:
    import torch

    from gms.diffusion import diffusion_utils as ref_du

    HAS_REF = True
except Exception:  # pragma: no cover
    HAS_REF = False

needs_ref = pytest.mark.skipif(not HAS_REF, reason='reference import failed')

T_GRID = np.linspace(0.0, 1.0, 33).astype(np.float32)


@needs_ref
@pytest.mark.parametrize('name', ['uniform', 'beta_const', 'beta_linear', 'cosine'])
def test_schedules_match_reference(name):
    ours = get_logsnr_schedule(name, logsnr_min=-20.0, logsnr_max=20.0)
    theirs = ref_du.get_logsnr_schedule(name, logsnr_min=-20.0, logsnr_max=20.0)
    a = np.asarray(ours(jnp.asarray(T_GRID)))
    b = theirs(torch.tensor(T_GRID)).numpy()
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_iddpm_schedules_match_formula():
    """The reference's iddpm_* schedules call torch.interp, which does not
    exist (dead/broken code, SURVEY.md §2 row 27) — so golden values come
    from a direct numpy evaluation of the published formula instead."""
    n = 100
    steps = np.arange(n + 1, dtype=np.float64) / n
    alpha_bar = np.cos((steps + 0.008) / 1.008 * np.pi / 2) ** 2
    betas = np.minimum(1 - alpha_bar[1:] / alpha_bar[:-1], 0.999)
    ac = np.cumprod(1.0 - betas)
    logsnr = np.log(ac) - np.log1p(-ac)
    expected = np.interp(T_GRID, np.linspace(0, 1, len(betas)), logsnr)
    ours = get_logsnr_schedule('iddpm_cosine_interp', num_timesteps=n)
    np.testing.assert_allclose(
        np.asarray(ours(jnp.asarray(T_GRID))), expected, rtol=1e-3, atol=1e-3
    )

    inds = np.round(np.linspace(0, 1, 10) * (n - 1)).astype(int)
    ac_r = np.cumprod(1.0 - betas)[inds]
    logsnr_r = np.log(ac_r) - np.log1p(-ac_r)
    expected_r = np.interp(T_GRID, np.linspace(0, 1, 10), logsnr_r)
    ours_r = get_logsnr_schedule(
        'iddpm_cosine_respaced', num_timesteps=n, num_respaced_timesteps=10
    )
    np.testing.assert_allclose(
        np.asarray(ours_r(jnp.asarray(T_GRID))), expected_r, rtol=1e-3, atol=1e-3
    )


def test_x_eps_v_roundtrip():
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(4, 8, 8, 1), jnp.float32)
    x = jnp.asarray(rng.randn(4, 8, 8, 1), jnp.float32)
    logsnr = jnp.asarray(rng.uniform(-10, 10, 4), jnp.float32)
    eps = gd.predict_eps_from_x(z=z, x=x, logsnr=logsnr)
    x2 = gd.predict_x_from_eps(z=z, eps=eps, logsnr=logsnr)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=2e-3, atol=2e-3)
    v = gd.predict_v_from_x_and_eps(x=x, eps=eps, logsnr=logsnr)
    x3 = gd.predict_x_from_v(z=z, v=v, logsnr=logsnr)
    np.testing.assert_allclose(np.asarray(x3), np.asarray(x), rtol=2e-3, atol=2e-3)


def test_forward_consistency():
    """z = alpha*x + sigma*eps should invert exactly through predict_x."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 4, 4, 1), jnp.float32)
    eps = jnp.asarray(rng.randn(4, 4, 4, 1), jnp.float32)
    logsnr = jnp.asarray(rng.uniform(-5, 5, 4), jnp.float32)
    d = gd.diffusion_forward(x, gd.bc(logsnr, x.shape))
    z = d['mean'] + d['std'] * eps
    x_rec = gd.predict_x_from_eps(z=z, eps=eps, logsnr=logsnr)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4, atol=1e-4)


@needs_ref
def test_log1mexp_matches_reference():
    xs = np.concatenate(
        [np.linspace(-20, -1e-4, 101), np.array([-0.6931, -0.6932, -1e-6])]
    ).astype(np.float32)
    a = np.asarray(gd.log1mexp(jnp.asarray(xs)))
    b = ref_du.log1mexp(torch.tensor(xs)).numpy()
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_log1mexp_grad_finite():
    g = jax.grad(lambda x: gd.log1mexp(x).sum())(jnp.asarray([-10.0, -0.5, -1e-5]))
    assert np.all(np.isfinite(np.asarray(g)))


@needs_ref
def test_diffusion_reverse_matches_reference():
    rng = np.random.RandomState(2)
    shape = (3, 4, 4, 1)
    x = rng.randn(*shape).astype(np.float32)
    z_t = rng.randn(*shape).astype(np.float32)
    logsnr_t = np.full(shape, -2.0, np.float32)
    logsnr_s = np.full(shape, 1.0, np.float32)
    for logvar in ['small', 'large', 'medium:0.3']:
        ours = gd.diffusion_reverse(
            x=jnp.asarray(x), z_t=jnp.asarray(z_t),
            logsnr_s=jnp.asarray(logsnr_s), logsnr_t=jnp.asarray(logsnr_t),
            x_logvar=logvar,
        )
        theirs = ref_du.diffusion_reverse(
            x=torch.tensor(x), z_t=torch.tensor(z_t),
            logsnr_s=torch.tensor(logsnr_s), logsnr_t=torch.tensor(logsnr_t),
            x_logvar=logvar,
        )
        np.testing.assert_allclose(
            np.asarray(ours['mean']), theirs['mean'].numpy(), rtol=1e-4,
            atol=1e-5, err_msg=f'{logvar}/mean',
        )
        if logvar == 'medium:0.3':
            # reference bug (consciously fixed here): it calls
            # log1mexp(logsnr_s - logsnr_t) — a POSITIVE input — with an
            # implementation expecting log(1-e^x) for x<0, so its logvar
            # (and medium-mode std) is NaN; ours uses the equivalent
            # negative-argument form and stays finite.
            assert np.all(np.isnan(theirs['std'].numpy()))
            assert np.all(np.isfinite(np.asarray(ours['std'])))
            # finite cross-check: interpolate our small/large logvars
            small = gd.diffusion_reverse(
                x=jnp.asarray(x), z_t=jnp.asarray(z_t),
                logsnr_s=jnp.asarray(logsnr_s), logsnr_t=jnp.asarray(logsnr_t),
                x_logvar='small',
            )
            large = gd.diffusion_reverse(
                x=jnp.asarray(x), z_t=jnp.asarray(z_t),
                logsnr_s=jnp.asarray(logsnr_s), logsnr_t=jnp.asarray(logsnr_t),
                x_logvar='large',
            )
            expect = np.exp(
                0.3 * np.log(np.asarray(large['var']))
                + 0.7 * np.log(np.asarray(small['var']))
            )
            np.testing.assert_allclose(
                np.asarray(ours['var']), expect, rtol=1e-4, atol=1e-6
            )
        else:
            np.testing.assert_allclose(
                np.asarray(ours['std']), theirs['std'].numpy(), rtol=1e-4,
                atol=1e-5, err_msg=f'{logvar}/std',
            )


def test_ddim_chain_shapes_and_final_range():
    """Tiny end-to-end sanity: a 4-step DDIM chain with a dummy net."""
    diff = gd.GaussianDiffusion(mean_type='v', num_steps=4)
    net = lambda z, logsnr, **kw: jnp.zeros_like(z)
    zs, xs, eps = diff.sample(
        net=net, init_x=jnp.ones((2, 4, 4, 1)), rng=jax.random.key(0)
    )
    assert zs.shape == (4, 2, 4, 4, 1)
    assert np.all(np.abs(np.asarray(xs)) <= 1.0)  # x_hat clipped
