"""Continuous-time logSNR Gaussian diffusion core.

Same math as the reference (gms/diffusion/gaussian_diffusion.py +
diffusion_utils.py, google-research diffusion_distillation style): q(z_t|x)
and q(z_s|z_t,x) in logSNR form, x<->eps<->v prediction conversions with
clip-then-recompute, 'snr_trunc' max(x_mse, eps_mse) training loss, epsilon-
space classifier-free guidance, DDIM and stochastic ancestral samplers, and
1-/2-step progressive-distillation teacher targets.

TPU-native rebuild: everything is a pure function of (params, rng); the
sampling chain is one lax.scan (the reference drives 250 Python-loop steps
from the host, gaussian_diffusion.py:287-296) collecting the (z, x_hat,
eps_hat) history on device.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp

from generative_models_tpu.models.diffusion.schedules import get_logsnr_schedule


def bc(x, shape):
    """broadcast_from_left (reference diffusion_utils.py:126-130, minus the
    hardcoded device='cuda')."""
    x = jnp.asarray(x, jnp.float32)
    return jnp.broadcast_to(x.reshape(x.shape + (1,) * (len(shape) - x.ndim)), shape)


def mean_flat(x):
    return x.mean(axis=tuple(range(1, x.ndim)))


def log1mexp(x, expm1_guard=1e-7):
    """Numerically stable log(1 - exp(x)) for x < 0, with the reference's
    guarded backward near x=0 (diffusion_utils.py:108-123)."""
    small = x < math.log(0.5)
    # branch 1 (x < log 0.5): log1p(-exp(x)); safe input for the other branch
    x_small = jnp.where(small, x, math.log(0.5) - 1.0)
    y_small = jnp.log1p(-jnp.exp(x_small))
    # branch 2 (x >= log 0.5): log(-expm1(x)) with gradient-magnitude guard
    x_big = jnp.where(small, math.log(0.5) + 1e-3, x)
    expxm1 = jnp.expm1(x_big)
    fw = jnp.log(-expxm1)
    bw = jnp.log(-expxm1 + expm1_guard)
    y_big = jax.lax.stop_gradient(fw) + (bw - jax.lax.stop_gradient(bw))
    return jnp.where(small, y_small, y_big)


def diffusion_forward(x, logsnr):
    """q(z_t | x) (reference diffusion_utils.py:65-73)."""
    return {
        'mean': x * jnp.sqrt(jax.nn.sigmoid(logsnr)),
        'std': jnp.sqrt(jax.nn.sigmoid(-logsnr)),
        'var': jax.nn.sigmoid(-logsnr),
        'logvar': jax.nn.log_sigmoid(-logsnr),
    }


def diffusion_reverse(x, z_t, logsnr_s, logsnr_t, x_logvar):
    """q(z_s | z_t, x), requires s < t (reference diffusion_utils.py:34-62)."""
    alpha_st = jnp.sqrt((1.0 + jnp.exp(-logsnr_t)) / (1.0 + jnp.exp(-logsnr_s)))
    alpha_s = jnp.sqrt(jax.nn.sigmoid(logsnr_s))
    r = jnp.exp(logsnr_t - logsnr_s)  # SNR(t)/SNR(s)
    one_minus_r = -jnp.expm1(logsnr_t - logsnr_s)
    log_one_minus_r = log1mexp(logsnr_t - logsnr_s)
    mean = r * alpha_st * z_t + one_minus_r * alpha_s * x
    if x_logvar == 'small':
        var = one_minus_r * jax.nn.sigmoid(-logsnr_s)
        logvar = log_one_minus_r + jax.nn.log_sigmoid(-logsnr_s)
    elif x_logvar == 'large':
        var = one_minus_r * jax.nn.sigmoid(-logsnr_t)
        logvar = log_one_minus_r + jax.nn.log_sigmoid(-logsnr_t)
    elif x_logvar.startswith('medium:'):
        frac = float(x_logvar.split(':')[1])
        assert 0 <= frac <= 1
        min_logvar = log_one_minus_r + jax.nn.log_sigmoid(-logsnr_s)
        max_logvar = log_one_minus_r + jax.nn.log_sigmoid(-logsnr_t)
        logvar = frac * max_logvar + (1 - frac) * min_logvar
        var = jnp.exp(logvar)
    else:
        raise NotImplementedError(x_logvar)
    return {'mean': mean, 'std': jnp.sqrt(var), 'var': var, 'logvar': logvar}


def predict_x_from_eps(z, eps, logsnr):
    logsnr = bc(logsnr, z.shape)
    return jnp.sqrt(1.0 + jnp.exp(-logsnr)) * (
        z - eps * jax.lax.rsqrt(1.0 + jnp.exp(logsnr))
    )


def predict_eps_from_x(z, x, logsnr):
    logsnr = bc(logsnr, z.shape)
    return jnp.sqrt(1.0 + jnp.exp(logsnr)) * (
        z - x * jax.lax.rsqrt(1.0 + jnp.exp(-logsnr))
    )


def predict_v_from_x_and_eps(x, eps, logsnr):
    logsnr = bc(logsnr, x.shape)
    return jnp.sqrt(jax.nn.sigmoid(logsnr)) * eps - jnp.sqrt(
        jax.nn.sigmoid(-logsnr)
    ) * x


def predict_x_from_v(z, v, logsnr):
    logsnr = bc(logsnr, z.shape)
    return jnp.sqrt(jax.nn.sigmoid(logsnr)) * z - jnp.sqrt(
        jax.nn.sigmoid(-logsnr)
    ) * v


class GaussianDiffusion:
    """Stateless diffusion math. `net(z, logsnr, guide=..., cond_w=...)` is a
    pure closure over params supplied by the model layer."""

    def __init__(
        self,
        *,
        mean_type,
        num_steps,
        has_teacher=False,
        teacher_mode=None,
        sampler='ddim',
        sample_cond_w=None,
        fused_cfg=False,
        sample_steps=None,
    ):
        self.fused_cfg = fused_cfg
        self.mean_type = mean_type
        self.num_steps = num_steps
        # --sample_steps decouples the sampling-chain length from the
        # training discretization: the chain walks a coarser uniform u-grid
        # of sample_steps points through the SAME logsnr schedule (DDIM and
        # DPM-Solver++ are ODE solvers — nothing ties them to num_steps).
        # None/0 keeps the reference behavior (chain length == num_steps).
        self.sample_steps = int(sample_steps or num_steps)
        self.has_teacher = has_teacher
        self.logsnr_schedule_fn = get_logsnr_schedule(
            'cosine', logsnr_min=-20.0, logsnr_max=20.0
        )
        self.sampler = sampler
        self.sample_cond_w = sample_cond_w
        self.loss_weight_type = 'snr_trunc'
        if has_teacher:
            assert teacher_mode in ['step1', 'step2']
            self.teacher_mode = teacher_mode
            if teacher_mode == 'step1':
                self.loss_weight_type = 'snr'

    # ---------------------------------------------------------------- #
    def _run_model(self, *, net, z, logsnr):
        """net output under mean_type -> clipped x_hat, recomputed eps/v
        (reference gaussian_diffusion.py:45-79)."""
        model_output = net(z, logsnr)
        if self.mean_type == 'eps':
            model_x = predict_x_from_eps(z=z, eps=model_output, logsnr=logsnr)
        elif self.mean_type == 'x':
            model_x = model_output
        elif self.mean_type == 'v':
            model_x = predict_x_from_v(z=z, v=model_output, logsnr=logsnr)
        elif self.mean_type == 'both':
            _model_x, _model_eps = jnp.split(model_output, 2, axis=-1)
            model_x_eps = predict_x_from_eps(z=z, eps=_model_eps, logsnr=logsnr)
            wx = bc(jax.nn.sigmoid(-logsnr), z.shape)
            model_x = wx * _model_x + (1.0 - wx) * model_x_eps
        else:
            raise NotImplementedError(self.mean_type)
        model_x = jnp.clip(model_x, -1.0, 1.0)
        model_eps = predict_eps_from_x(z=z, x=model_x, logsnr=logsnr)
        model_v = predict_v_from_x_and_eps(x=model_x, eps=model_eps, logsnr=logsnr)
        return {'model_x': model_x, 'model_eps': model_eps, 'model_v': model_v}

    # ---------------------------------------------------------------- #
    def training_losses(self, *, net, x, rng, teacher_net=None):
        """(reference gaussian_diffusion.py:81-172). rng is explicit."""
        rng_eps, rng_u, rng_w = jax.random.split(rng, 3)
        eps = jax.random.normal(rng_eps, x.shape, x.dtype)
        bcx = lambda z: bc(z, x.shape)

        if self.has_teacher and self.teacher_mode == 'step2':
            i = jax.random.randint(rng_u, (x.shape[0],), 0, self.num_steps)
            u = (i + 1).astype(x.dtype) / self.num_steps
        else:
            i = None
            u = jax.random.uniform(rng_u, (x.shape[0],), x.dtype)
        logsnr = self.logsnr_schedule_fn(u)

        z_dist = diffusion_forward(x, bcx(logsnr))
        z_t = z_dist['mean'] + z_dist['std'] * eps

        if self.has_teacher:
            assert teacher_net is not None
            cond_w = 4.0 * jax.random.uniform(rng_w, u.shape, u.dtype)
            net = partial(net, cond_w=cond_w)
            t_net = partial(
                teacher_net, cond_w=None if self.teacher_mode == 'step1' else cond_w
            )
            u_s = u - 1.0 / self.num_steps
            logsnr_s = self.logsnr_schedule_fn(u_s)

            if self.teacher_mode == 'step1':
                _, x_target, eps_target = self.ddim_step(
                    net=t_net, z_t=z_t, logsnr_t=logsnr, logsnr_s=logsnr_s,
                    cond_w=cond_w,
                )
            else:  # step2: two teacher DDIM half-steps + implied-x algebra
                u_mid = u - 0.5 / self.num_steps
                logsnr_mid = self.logsnr_schedule_fn(u_mid)
                z_mid, _, _ = self.ddim_step(
                    net=t_net, z_t=z_t, logsnr_t=logsnr, logsnr_s=logsnr_mid
                )
                z_teacher, x_pred_teacher, _ = self.ddim_step(
                    net=t_net, z_t=z_mid, logsnr_t=logsnr_mid, logsnr_s=logsnr_s
                )
                alpha_s = bcx(jnp.sqrt(jax.nn.sigmoid(logsnr_s)))
                alpha_t = bcx(jnp.sqrt(jax.nn.sigmoid(logsnr)))
                stdv_frac = bcx(
                    jnp.exp(
                        0.5 * (jax.nn.softplus(logsnr) - jax.nn.softplus(logsnr_s))
                    )
                )
                x_target = (z_teacher - stdv_frac * z_t) / (
                    alpha_s - stdv_frac * alpha_t
                )
                x_target = jnp.where(bcx(i == 0), x_pred_teacher, x_target)
            x_target = jax.lax.stop_gradient(x_target)
            eps_target = jax.lax.stop_gradient(
                predict_eps_from_x(z=z_t, x=x_target, logsnr=logsnr)
            )
        else:
            x_target = x
            eps_target = eps

        model_output = self._run_model(net=net, z=z_t, logsnr=logsnr)
        x_mse = mean_flat(jnp.square(model_output['model_x'] - x_target))
        eps_mse = mean_flat(jnp.square(model_output['model_eps'] - eps_target))
        if self.loss_weight_type == 'snr_trunc':  # x_mse * max(SNR, 1)
            loss = jnp.maximum(x_mse, eps_mse)
        elif self.loss_weight_type == 'snr':
            loss = eps_mse
        return {'loss': loss}

    # ---------------------------------------------------------------- #
    def _run_model_guided(self, *, net, z_t, logsnr_t, cond_w):
        """Classifier-free-guided prediction: the conditional and
        unconditional branches run as ONE doubled-batch net call (the
        reference runs two separate forwards, gaussian_diffusion.py:174-187 —
        same math, but half the kernel launches and a fuller MXU), then the
        epsilon-space combine + clip-recompute. fused_cfg=False falls back to
        two separate forwards (exactly the reference structure)."""
        B = z_t.shape[0]
        ls = jnp.broadcast_to(jnp.asarray(logsnr_t, jnp.float32), (B,))
        if self.fused_cfg:
            z2 = jnp.concatenate([z_t, z_t], axis=0)
            ls2 = jnp.concatenate([ls, ls], axis=0)
            out = self._run_model(
                net=partial(net, uncond_second_half=True), z=z2, logsnr=ls2
            )
            eps_cond = out['model_eps'][:B]
            eps_uncond = out['model_eps'][B:]
        else:
            cond_out = self._run_model(net=net, z=z_t, logsnr=ls)
            uncond_out = self._run_model(
                net=partial(net, uncond=True), z=z_t, logsnr=ls
            )
            eps_cond = cond_out['model_eps']
            eps_uncond = uncond_out['model_eps']
        cond_w = bc(cond_w, z_t.shape)
        eps_pred_t = (1 + cond_w) * eps_cond - cond_w * eps_uncond
        x_pred_t = predict_x_from_eps(z=z_t, eps=eps_pred_t, logsnr=ls)
        x_pred_t = jnp.clip(x_pred_t, -1.0, 1.0)
        eps_pred_t = predict_eps_from_x(z=z_t, x=x_pred_t, logsnr=ls)
        return x_pred_t, eps_pred_t

    def _predict(self, *, net, z_t, logsnr_t, cond_w=None):
        """Shared prediction head for every sampler: clipped x_hat and the
        recomputed eps_hat at (z_t, logsnr_t), CF-guided when cond_w is set."""
        if cond_w is not None:
            return self._run_model_guided(
                net=net, z_t=z_t, logsnr_t=logsnr_t, cond_w=cond_w
            )
        model_out = self._run_model(net=net, z=z_t, logsnr=logsnr_t)
        return model_out['model_x'], model_out['model_eps']

    def ddim_step(self, *, net, logsnr_t, logsnr_s, z_t, cond_w=None):
        x_pred_t, eps_pred_t = self._predict(
            net=net, z_t=z_t, logsnr_t=logsnr_t, cond_w=cond_w
        )
        stdv_s = bc(jnp.sqrt(jax.nn.sigmoid(-logsnr_s)), z_t.shape)
        alpha_s = bc(jnp.sqrt(jax.nn.sigmoid(logsnr_s)), z_t.shape)
        z_s_pred = alpha_s * x_pred_t + stdv_s * eps_pred_t
        return z_s_pred, x_pred_t, eps_pred_t

    def reverse_dpm_step(self, *, net, logsnr_t, logsnr_s, z_t, rng, cond_w=None):
        x_pred_t, eps_pred_t = self._predict(
            net=net, z_t=z_t, logsnr_t=logsnr_t, cond_w=cond_w
        )
        z_s_dist = diffusion_reverse(
            z_t=z_t,
            logsnr_t=bc(logsnr_t, z_t.shape),
            logsnr_s=bc(logsnr_s, z_t.shape),
            x=x_pred_t,
            x_logvar='large',
        )
        eps = jax.random.normal(rng, z_t.shape, z_t.dtype)
        z_s_pred = z_s_dist['mean'] + z_s_dist['std'] * eps
        return z_s_pred, x_pred_t, eps_pred_t

    # ---------------------------------------------------------------- #
    def sample(
        self, *, net, init_x, rng, cond_w=None, teacher_net=None,
        return_history=True,
    ):
        """Full reverse chain as ONE lax.scan over t = S-1..0 where S =
        sample_steps (reference runs a host Python loop over num_steps,
        gaussian_diffusion.py:282-296). Returns stacked (z, x_hat, eps_hat)
        histories, shape (S, *init_x.shape) — or, with return_history=False,
        just the final sample batch (the serving path: no per-step history
        ever lands in HBM).

        NOTE (preserved reference quirk): cond_w's VALUE is ignored — it is
        a not-None flag enabling guidance, with per-sample weights drawn
        w ~ U[0,4) unless self.sample_cond_w overrides them. The reference
        has identical semantics (gaussian_diffusion.py:245-257); use
        --sample_cond_w for a fixed guidance weight."""
        rng_w, rng_chain = jax.random.split(rng)
        net_cond_w = (
            4.0 * jax.random.uniform(rng_w, (init_x.shape[0],))
            if cond_w is not None
            else None
        )
        if self.has_teacher:
            # distilled students condition on w directly, no CF guidance
            net = partial(net, cond_w=net_cond_w)
            cond_w = None
        else:
            cond_w = (
                self.sample_cond_w if self.sample_cond_w != -1.0 else net_cond_w
            )

        if self.sampler in ('ddim', 'dpm2m'):
            body_net = net
            stochastic = False
        elif self.sampler == 'noisy':
            body_net = net
            stochastic = True
        elif self.sampler == 'teacher_test':
            assert teacher_net is not None
            body_net = partial(teacher_net, cond_w=None)
            cond_w = net_cond_w
            stochastic = False
        else:
            raise NotImplementedError(self.sampler)

        fbc = lambda z: bc(z, init_x.shape)
        S = self.sample_steps

        if self.sampler == 'dpm2m':
            # DPM-Solver++(2M) (Lu et al. 2022, arXiv:2211.01095), data-
            # prediction multistep form in half-logSNR time lam = logsnr/2.
            # Step t->s (denoising, h = lam_s - lam_t > 0):
            #   D    = x_t + (x_t - x_prev) / (2 r),  r = h_prev / h
            #   z_s  = (sigma_s/sigma_t) z_t - alpha_s expm1(-h) D
            # First step has no history: D = x_t, which makes the update
            # EXACTLY the DDIM step (tests pin this). One extra carry slot
            # (x_prev, h_prev) is the entire cost — same one-scan structure,
            # one net call per step, second-order accuracy in h.
            def body2m(carry, i):
                z_t, x_prev, h_prev = carry
                logsnr_t = self.logsnr_schedule_fn((i + 1.0) / S)
                logsnr_s = self.logsnr_schedule_fn(i / S)
                x_pred, eps_pred = self._predict(
                    net=body_net, z_t=z_t, logsnr_t=logsnr_t, cond_w=cond_w
                )
                h = 0.5 * (logsnr_s - logsnr_t)
                r = h_prev / h
                D = jnp.where(
                    fbc(i) == S - 1.0,
                    x_pred,
                    x_pred + (x_pred - x_prev) / fbc(2.0 * r),
                )
                sig_ratio = jnp.sqrt(
                    jax.nn.sigmoid(-logsnr_s) / jax.nn.sigmoid(-logsnr_t)
                )
                alpha_s = jnp.sqrt(jax.nn.sigmoid(logsnr_s))
                z_s = fbc(sig_ratio) * z_t - fbc(alpha_s * jnp.expm1(-h)) * D
                z_next = jnp.where(fbc(i) == 0, x_pred, z_s)
                hist = (z_next, x_pred, eps_pred) if return_history else None
                return (z_next, x_pred, h), hist

            # deterministic ODE steps: no per-step rng is consumed
            steps = jnp.arange(S - 1, -1, -1, dtype=jnp.float32)
            (final, _, _), hist = jax.lax.scan(
                body2m, (init_x, jnp.zeros_like(init_x), jnp.float32(1.0)),
                steps,
            )
            if not return_history:
                return final
            return hist

        def body(z_t, inp):
            i, key = inp
            logsnr_t = self.logsnr_schedule_fn((i + 1.0) / S)
            logsnr_s = self.logsnr_schedule_fn(i / S)
            if stochastic:
                z_s, x_pred, eps_pred = self.reverse_dpm_step(
                    net=body_net, logsnr_t=logsnr_t, logsnr_s=logsnr_s, z_t=z_t,
                    rng=key, cond_w=cond_w,
                )
            else:
                z_s, x_pred, eps_pred = self.ddim_step(
                    net=body_net, logsnr_t=logsnr_t, logsnr_s=logsnr_s, z_t=z_t,
                    cond_w=cond_w,
                )
            z_next = jnp.where(fbc(i) == 0, x_pred, z_s)
            hist = (z_next, x_pred, eps_pred) if return_history else None
            return z_next, hist

        steps = jnp.arange(S - 1, -1, -1, dtype=jnp.float32)
        keys = jax.random.split(rng_chain, S)
        final, hist = jax.lax.scan(body, init_x, (steps, keys))
        if not return_history:
            return final
        zs, xs, eps = hist
        return zs, xs, eps
