"""logSNR schedule library (reference: gms/diffusion/diffusion_utils.py:166-239).

All schedules map t in [0,1] -> logSNR, with t==0 => logsnr_max and
t==1 => logsnr_min. Pure jnp, shape-polymorphic, jit/scan friendly. The
'cosine' schedule with (logsnr_min=-20, logsnr_max=20) is the default used by
GaussianDiffusion (reference gaussian_diffusion.py:33-35).
"""

import functools

import jax.numpy as jnp
import numpy as np


def _np_softplus(x):
    return np.logaddexp(x, 0)


def logsnr_uniform(t, *, logsnr_min, logsnr_max):
    return logsnr_min * t + logsnr_max * (1.0 - t)


def logsnr_beta_const(t, *, logsnr_min, logsnr_max):
    b = _np_softplus(-logsnr_max)
    a = _np_softplus(-logsnr_min) - b
    return -jnp.log(jnp.expm1(a * t + b))


def logsnr_beta_linear(t, *, logsnr_min, logsnr_max):
    b = _np_softplus(-logsnr_max)
    a = _np_softplus(-logsnr_min) - b
    return -jnp.log(jnp.expm1(a * t**2 + b))


def logsnr_beta_interpolated(t, *, betas):
    betas = np.asarray(betas, dtype=np.float64)
    alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
    logsnr = np.log(alphas_cumprod) - np.log1p(-alphas_cumprod)
    return jnp.interp(
        t, jnp.asarray(np.linspace(0, 1, len(betas))), jnp.asarray(logsnr, jnp.float32)
    )


def logsnr_cosine(t, *, logsnr_min, logsnr_max):
    b = np.arctan(np.exp(-0.5 * logsnr_max))
    a = np.arctan(np.exp(-0.5 * logsnr_min)) - b
    return -2.0 * jnp.log(jnp.tan(a * t + b))


def _iddpm_betas(num_timesteps):
    steps = np.arange(num_timesteps + 1, dtype=np.float64) / num_timesteps
    alpha_bar = np.cos((steps + 0.008) / 1.008 * np.pi / 2) ** 2
    return np.minimum(1 - alpha_bar[1:] / alpha_bar[:-1], 0.999)


def logsnr_iddpm_cosine_interpolated(t, *, num_timesteps):
    return logsnr_beta_interpolated(t, betas=_iddpm_betas(num_timesteps))


def logsnr_iddpm_cosine_respaced(t, *, num_timesteps, num_respaced_timesteps):
    betas = _iddpm_betas(num_timesteps)
    respaced_inds = np.round(
        np.linspace(0, 1, num_respaced_timesteps) * (num_timesteps - 1)
    ).astype(int)
    alpha_bar = np.cumprod(1.0 - betas)[respaced_inds]
    logsnr = np.log(alpha_bar) - np.log1p(-alpha_bar)
    return jnp.interp(
        t, jnp.asarray(np.linspace(0, 1, len(logsnr))), jnp.asarray(logsnr, jnp.float32)
    )


_SCHEDULES = {
    'uniform': logsnr_uniform,
    'beta_const': logsnr_beta_const,
    'beta_linear': logsnr_beta_linear,
    'beta_interp': logsnr_beta_interpolated,
    'cosine': logsnr_cosine,
    'iddpm_cosine_interp': logsnr_iddpm_cosine_interpolated,
    'iddpm_cosine_respaced': logsnr_iddpm_cosine_respaced,
}


def get_logsnr_schedule(name, **kwargs):
    return functools.partial(_SCHEDULES[name], **kwargs)
