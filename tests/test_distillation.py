"""Progressive-distillation + classifier-free-guidance math tests.

The step1/step2 teacher-target algebra and the fused-CFG path are the hardest
math in the repo (models/diffusion/gaussian_diffusion.py:171-270; reference:
gms/diffusion/gaussian_diffusion.py:105-187). Every hand-check below
reimplements the published formulas in plain numpy — independently of the
library's predict_* / ddim_step helpers — so a silent regression in either
side trips the comparison.
"""

import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.models.diffusion.gaussian_diffusion import (
    GaussianDiffusion,
)

N_STEPS = 4
LOGSNR_MIN, LOGSNR_MAX = -20.0, 20.0


# ---------------------------------------------------------------------- #
# hand-written math (numpy, independent of the library helpers)
# ---------------------------------------------------------------------- #
def sched(u):
    """cosine logSNR schedule (published formula)."""
    b = np.arctan(np.exp(-0.5 * LOGSNR_MAX))
    a = np.arctan(np.exp(-0.5 * LOGSNR_MIN)) - b
    return -2.0 * np.log(np.tan(a * np.asarray(u, np.float64) + b))


def bcx(v, shape):
    v = np.asarray(v, np.float64)
    return np.broadcast_to(v.reshape(v.shape + (1,) * (len(shape) - v.ndim)), shape)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def pred_eps(z, x, logsnr):
    """eps implied by an x prediction: (z - alpha*x) / sigma."""
    l = bcx(logsnr, z.shape)
    return (z - np.sqrt(sigmoid(l)) * x) / np.sqrt(sigmoid(-l))


def pred_x(z, eps, logsnr):
    l = bcx(logsnr, z.shape)
    return (z - np.sqrt(sigmoid(-l)) * eps) / np.sqrt(sigmoid(l))


def hand_run_model_x(net_out, z, logsnr):
    """mean_type='x' clip-then-recompute."""
    x = np.clip(net_out, -1.0, 1.0)
    eps = pred_eps(z, x, logsnr)
    return x, eps


def hand_ddim_step(x_pred, eps_pred, logsnr_s, shape):
    l = bcx(logsnr_s, shape)
    return np.sqrt(sigmoid(l)) * x_pred + np.sqrt(sigmoid(-l)) * eps_pred


# ---------------------------------------------------------------------- #
# synthetic nets: smooth, distinguish cond/uncond/cond_w, in [-1, 1]
# ---------------------------------------------------------------------- #
def teacher_fn(z, cond_w):
    base = 0.5 * np.tanh(np.asarray(z, np.float64))
    if cond_w is not None:
        base = base * (1.0 + 0.1 * bcx(cond_w, base.shape))
    return base


def make_teacher_net():
    def net(z, logsnr, cond_w=None, uncond=False, uncond_second_half=False):
        out = 0.5 * jnp.tanh(z)
        if uncond:
            out = 0.3 * jnp.tanh(z)
        if uncond_second_half:
            B = z.shape[0] // 2
            out = jnp.concatenate([0.5 * jnp.tanh(z[:B]), 0.3 * jnp.tanh(z[B:])])
        if cond_w is not None:
            cw = jnp.broadcast_to(jnp.asarray(cond_w), (z.shape[0],))
            out = out * (1.0 + 0.1 * cw.reshape((-1,) + (1,) * (z.ndim - 1)))
        return out

    return net


def make_student_net():
    def net(z, logsnr, cond_w=None, uncond=False, uncond_second_half=False):
        out = 0.2 * jnp.tanh(z)
        if cond_w is not None:
            cw = jnp.broadcast_to(jnp.asarray(cond_w), (z.shape[0],))
            out = out + 0.05 * cw.reshape((-1,) + (1,) * (z.ndim - 1))
        return out

    return net


def batch(seed=0, B=8):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(B, 4, 4, 1), jnp.float32)


# ---------------------------------------------------------------------- #
# fused CFG == two-call CFG
# ---------------------------------------------------------------------- #
def test_fused_cfg_matches_two_call():
    z = batch()
    net = make_teacher_net()
    kw = dict(mean_type='x', num_steps=N_STEPS)
    gd_fused = GaussianDiffusion(fused_cfg=True, **kw)
    gd_two = GaussianDiffusion(fused_cfg=False, **kw)
    for w in [0.0, 0.5, 3.0]:
        for l_t, l_s in [(2.0, 4.0), (-3.0, 0.5)]:
            out_f = gd_fused.ddim_step(
                net=net, z_t=z, logsnr_t=l_t, logsnr_s=l_s, cond_w=w
            )
            out_t = gd_two.ddim_step(
                net=net, z_t=z, logsnr_t=l_t, logsnr_s=l_s, cond_w=w
            )
            for a, b in zip(out_f, out_t):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
                )


def test_guided_prediction_matches_hand_math():
    """eps-space CFG combine + clip-recompute vs plain numpy."""
    z = batch(1)
    net = make_teacher_net()
    gd = GaussianDiffusion(mean_type='x', num_steps=N_STEPS, fused_cfg=False)
    w, l_t = 1.7, 1.2
    x_pred, eps_pred = gd._run_model_guided(
        net=net, z_t=z, logsnr_t=l_t, cond_w=w
    )
    zn = np.asarray(z, np.float64)
    _, eps_c = hand_run_model_x(0.5 * np.tanh(zn), zn, l_t)
    _, eps_u = hand_run_model_x(0.3 * np.tanh(zn), zn, l_t)
    eps_g = (1 + w) * eps_c - w * eps_u
    x_g = np.clip(pred_x(zn, eps_g, l_t), -1.0, 1.0)
    eps_g = pred_eps(zn, x_g, l_t)
    np.testing.assert_allclose(np.asarray(x_pred), x_g, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(eps_pred), eps_g, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------- #
# step1: student target = guided teacher DDIM output
# ---------------------------------------------------------------------- #
def test_step1_loss_matches_hand_math():
    x = batch(2)
    gd = GaussianDiffusion(
        mean_type='x', num_steps=N_STEPS, has_teacher=True, teacher_mode='step1'
    )
    assert gd.loss_weight_type == 'snr'
    key = jax.random.key(7)
    losses = gd.training_losses(
        net=make_student_net(), x=x, rng=key, teacher_net=make_teacher_net()
    )

    # replay the exact rng draws the library makes
    rng_eps, rng_u, rng_w = jax.random.split(key, 3)
    eps = np.asarray(jax.random.normal(rng_eps, x.shape, x.dtype), np.float64)
    u = np.asarray(jax.random.uniform(rng_u, (x.shape[0],), x.dtype), np.float64)
    cond_w = 4.0 * np.asarray(
        jax.random.uniform(rng_w, u.shape, x.dtype), np.float64
    )
    xn = np.asarray(x, np.float64)
    logsnr = sched(u)
    z_t = bcx(np.sqrt(sigmoid(logsnr)), xn.shape) * xn + bcx(
        np.sqrt(sigmoid(-logsnr)), xn.shape
    ) * eps

    # guided teacher (step1 teacher takes no cond_w input): CFG in eps space
    _, eps_c = hand_run_model_x(0.5 * np.tanh(z_t), z_t, logsnr)
    _, eps_u = hand_run_model_x(0.3 * np.tanh(z_t), z_t, logsnr)
    w = bcx(cond_w, z_t.shape)
    eps_g = (1 + w) * eps_c - w * eps_u
    x_target = np.clip(pred_x(z_t, eps_g, logsnr), -1.0, 1.0)
    eps_target = pred_eps(z_t, x_target, logsnr)

    # student prediction (mean_type='x', cond_w-conditioned)
    s_out = 0.2 * np.tanh(z_t) + 0.05 * w
    model_x, model_eps = hand_run_model_x(s_out, z_t, logsnr)
    hand_loss = ((model_eps - eps_target) ** 2).mean(axis=(1, 2, 3))

    np.testing.assert_allclose(
        np.asarray(losses['loss'], np.float64), hand_loss, rtol=1e-4
    )


# ---------------------------------------------------------------------- #
# step2: two teacher half-steps + implied-x algebra (and the i==0 fallback)
# ---------------------------------------------------------------------- #
def step2_hand(x, key):
    """Full numpy replay of training_losses(teacher_mode='step2')."""
    rng_eps, rng_u, rng_w = jax.random.split(key, 3)
    eps = np.asarray(jax.random.normal(rng_eps, x.shape, x.dtype), np.float64)
    i = np.asarray(
        jax.random.randint(rng_u, (x.shape[0],), 0, N_STEPS), np.float64
    )
    u = (i + 1.0) / N_STEPS
    cond_w = 4.0 * np.asarray(
        jax.random.uniform(rng_w, u.shape, x.dtype), np.float64
    )
    xn = np.asarray(x, np.float64)
    logsnr = sched(u)
    logsnr_s = sched(u - 1.0 / N_STEPS)
    logsnr_mid = sched(u - 0.5 / N_STEPS)
    z_t = bcx(np.sqrt(sigmoid(logsnr)), xn.shape) * xn + bcx(
        np.sqrt(sigmoid(-logsnr)), xn.shape
    ) * eps

    # two teacher DDIM half-steps (teacher IS cond_w-conditioned in step2)
    x1, eps1 = hand_run_model_x(teacher_fn(z_t, cond_w), z_t, logsnr)
    z_mid = hand_ddim_step(x1, eps1, logsnr_mid, z_t.shape)
    x2, eps2 = hand_run_model_x(teacher_fn(z_mid, cond_w), z_mid, logsnr_mid)
    z_teacher = hand_ddim_step(x2, eps2, logsnr_s, z_t.shape)

    # implied x: solve z_teacher = alpha_s x + (sigma_s/sigma_t)(z_t - alpha_t x)
    alpha_s = bcx(np.sqrt(sigmoid(logsnr_s)), z_t.shape)
    alpha_t = bcx(np.sqrt(sigmoid(logsnr)), z_t.shape)
    stdv_frac = bcx(
        np.exp(
            0.5
            * (np.logaddexp(logsnr, 0.0) - np.logaddexp(logsnr_s, 0.0))
        ),
        z_t.shape,
    )
    x_target = (z_teacher - stdv_frac * z_t) / (alpha_s - stdv_frac * alpha_t)
    x_target = np.where(bcx(i == 0, z_t.shape), x2, x_target)
    eps_target = pred_eps(z_t, x_target, logsnr)

    s_out = 0.2 * np.tanh(z_t) + 0.05 * bcx(cond_w, z_t.shape)
    model_x, model_eps = hand_run_model_x(s_out, z_t, logsnr)
    x_mse = ((model_x - x_target) ** 2).mean(axis=(1, 2, 3))
    eps_mse = ((model_eps - eps_target) ** 2).mean(axis=(1, 2, 3))
    loss = np.maximum(x_mse, eps_mse)  # snr_trunc
    return loss, i, z_t, z_teacher, x_target, logsnr, logsnr_s


def test_step2_loss_matches_hand_math():
    x = batch(3, B=16)  # B=16: near-surely contains i==0 rows (fallback path)
    gd = GaussianDiffusion(
        mean_type='x', num_steps=N_STEPS, has_teacher=True, teacher_mode='step2'
    )
    key = jax.random.key(11)
    losses = gd.training_losses(
        net=make_student_net(), x=x, rng=key, teacher_net=make_teacher_net()
    )
    hand_loss, i, *_ = step2_hand(x, key)
    assert (i == 0).any(), 'seed must exercise the i==0 fallback'
    assert (i > 0).any()
    np.testing.assert_allclose(
        np.asarray(losses['loss'], np.float64), hand_loss, rtol=1e-4
    )


def test_step2_implied_x_reconstructs_teacher_z():
    """Defining property of the implied-x algebra: ONE student DDIM step from
    z_t with x=x_target must land exactly on the teacher's two-half-step
    z_teacher (for i > 0 rows, where the algebra applies)."""
    x = batch(4, B=16)
    key = jax.random.key(13)
    _, i, z_t, z_teacher, x_target, logsnr, logsnr_s = step2_hand(x, key)
    eps_implied = pred_eps(z_t, x_target, logsnr)
    z_onestep = hand_ddim_step(x_target, eps_implied, logsnr_s, z_t.shape)
    mask = i > 0
    np.testing.assert_allclose(
        z_onestep[mask], z_teacher[mask], rtol=1e-6, atol=1e-8
    )


# ---------------------------------------------------------------------- #
# E2E: teacher -> step1 -> step2 chain through the real harness
# (the code path of scripts/progressive_distillation.sh, shrunk)
# ---------------------------------------------------------------------- #
def test_distillation_chain_e2e(tmp_path, monkeypatch):
    import generative_models_tpu.data.mnist as mnist_mod
    from generative_models_tpu.main import main

    monkeypatch.setattr(mnist_mod, 'TRAIN_N', 32)
    monkeypatch.setattr(mnist_mod, 'TEST_N', 16)
    common = [
        '--model=diffusion_model',
        '--epochs=1',
        '--bs=8',
        '--hidden_size=32',
        '--data_source=synthetic',
        '--save_n=1',
        '--eval_heavy=0',
        '--bf16=0',
        '--class_cond=1',
    ]
    main(common + ['--timesteps=4', f'--logdir={tmp_path}/teacher'])
    main(
        common
        + [
            '--timesteps=4',
            f'--teacher_path={tmp_path}/teacher/model.pt',
            '--teacher_mode=step1',
            f'--logdir={tmp_path}/step1',
        ]
    )
    main(
        common
        + [
            '--timesteps=2',
            f'--teacher_path={tmp_path}/step1/model.pt',
            '--teacher_mode=step2',
            f'--logdir={tmp_path}/step2',
        ]
    )
    assert (tmp_path / 'step2' / 'model.pt').exists()


def test_teacher_params_stay_frozen(tmp_path, monkeypatch):
    """state.extra['teacher'] must be bit-identical after training steps."""
    import generative_models_tpu.data.mnist as mnist_mod
    from generative_models_tpu.main import main
    from generative_models_tpu.utils import discover_models
    from generative_models_tpu.utils.config import parse_args

    monkeypatch.setattr(mnist_mod, 'TRAIN_N', 32)
    monkeypatch.setattr(mnist_mod, 'TEST_N', 16)
    main(
        [
            '--model=diffusion_model',
            '--epochs=0',
            '--bs=8',
            '--hidden_size=32',
            '--data_source=synthetic',
            '--save_n=1',
            '--eval_heavy=0',
            '--bf16=0',
            '--timesteps=4',
            f'--logdir={tmp_path}/teacher',
        ]
    )
    G, Model = parse_args(
        [
            '--model=diffusion_model',
            '--bs=8',
            '--hidden_size=32',
            '--timesteps=4',
            '--bf16=0',
            f'--teacher_path={tmp_path}/teacher/model.pt',
            '--teacher_mode=step1',
            f'--logdir={tmp_path}/step1',
        ],
        discover_models=discover_models,
    )
    model = Model(G=G)
    before = jax.device_get(model.state.extra['teacher'])
    rng = np.random.RandomState(0)
    xb = jnp.asarray(rng.randn(8, 28, 28, 1), jnp.float32)
    yb = jnp.asarray(rng.randint(0, 10, 8), jnp.int32)
    for _ in range(3):
        model.train_step(xb, yb)
    after = jax.device_get(model.state.extra['teacher'])
    for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)
    # and the student must have moved
    student = jax.device_get(model.state.params)
    moved = any(
        not np.array_equal(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(student)
        )
    )
    assert moved, 'student params did not update'
