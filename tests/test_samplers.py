"""Fast samplers: --sample_steps chain respacing and the DPM-Solver++(2M)
multistep sampler (gaussian_diffusion.py::sample, sampler='dpm2m',
arXiv:2211.01095 data-prediction form in half-logSNR time).

The reference only ever samples with chain length == num_steps
(gms/diffusion/gaussian_diffusion.py:282-296); DDIM and dpm2m are ODE
solvers, so the framework decouples the two and ships a second-order
solver for low-step serving. Correctness pinned three ways: respacing is
bit-exact vs an equivalently-short chain, the dpm2m first step IS the DDIM
step, and on an analytically-solvable Gaussian problem dpm2m at 8 steps
beats DDIM at 8 steps against a 2048-step ground truth (second order in h).
"""

import jax
import jax.numpy as jnp
import numpy as np

from generative_models_tpu.models.diffusion import gaussian_diffusion as gd
from generative_models_tpu.utils import discover_models
from generative_models_tpu.utils.config import parse_args


def _gauss_net(c):
    """Exact v-prediction for data x0 ~ N(0, c^2 I): the posterior mean is
    E[x|z_t] = c^2 alpha z / (alpha^2 c^2 + sigma^2), so the ODE the samplers
    integrate has a known smooth solution and the only output error is the
    solver's discretization error."""

    def net(z, logsnr, **kw):
        ls = gd.bc(jnp.asarray(logsnr, jnp.float32), z.shape)
        a2 = jax.nn.sigmoid(ls)
        s2 = jax.nn.sigmoid(-ls)
        x = (c * c) * jnp.sqrt(a2) * z / (a2 * (c * c) + s2)
        eps = (z - jnp.sqrt(a2) * x) / jnp.sqrt(s2)
        return gd.predict_v_from_x_and_eps(x=x, eps=eps, logsnr=logsnr)

    return net


def _z0(shape=(4, 4, 4, 1), seed=1):
    # clipped so the exact trajectory never hits _run_model's x-clip
    return jnp.clip(jax.random.normal(jax.random.key(seed), shape), -2.5, 2.5)


def test_respaced_ddim_bitexact_vs_short_chain():
    """sample_steps=8 under num_steps=64 must produce the exact computation
    of an 8-step chain: same u-grid, same rng splits, same ops."""
    net = _gauss_net(0.2)
    z0 = _z0()
    a = gd.GaussianDiffusion(mean_type='v', num_steps=64, sample_steps=8)
    b = gd.GaussianDiffusion(mean_type='v', num_steps=8)
    za = a.sample(net=net, init_x=z0, rng=jax.random.key(2))
    zb = b.sample(net=net, init_x=z0, rng=jax.random.key(2))
    for x, y in zip(za, zb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert za[0].shape[0] == 8


def test_dpm2m_first_step_equals_ddim():
    """With no history the 2M update is the DDIM update — compare the first
    emitted chain state of both samplers on the same rng."""
    net = _gauss_net(0.2)
    z0 = _z0()
    dd = gd.GaussianDiffusion(mean_type='v', num_steps=4, sampler='ddim')
    dp = gd.GaussianDiffusion(mean_type='v', num_steps=4, sampler='dpm2m')
    zs_d, xs_d, _ = dd.sample(net=net, init_x=z0, rng=jax.random.key(3))
    zs_p, xs_p, _ = dp.sample(net=net, init_x=z0, rng=jax.random.key(3))
    np.testing.assert_allclose(
        np.asarray(zs_p[0]), np.asarray(zs_d[0]), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(xs_p[0]), np.asarray(xs_d[0]), rtol=1e-6, atol=1e-6
    )


def test_dpm2m_hand_math():
    """Numpy mirror of the 2M recurrence for a 3-step chain (f32 math,
    same cosine schedule), against the scan output."""
    c = 0.3
    net = _gauss_net(c)
    z0 = _z0((2, 2, 2, 1), seed=7)
    S = 3
    diff = gd.GaussianDiffusion(mean_type='v', num_steps=S, sampler='dpm2m')
    zs, xs, _ = diff.sample(net=net, init_x=z0, rng=jax.random.key(5))

    sched = diff.logsnr_schedule_fn
    z = np.asarray(z0, np.float32)
    x_prev, h_prev = None, None
    got_z, got_x = [], []
    for i in range(S - 1, -1, -1):
        ls_t = float(sched(jnp.float32((i + 1.0) / S)))
        ls_s = float(sched(jnp.float32(i / S)))
        a2t = 1.0 / (1.0 + np.exp(-ls_t))
        x_hat = (c * c) * np.sqrt(a2t) * z / (a2t * c * c + (1.0 - a2t))
        x_hat = np.clip(x_hat, -1.0, 1.0)
        h = 0.5 * (ls_s - ls_t)
        if x_prev is None:
            D = x_hat
        else:
            D = x_hat + (x_hat - x_prev) / (2.0 * (h_prev / h))
        sig_ratio = np.sqrt((1.0 / (1.0 + np.exp(ls_s))) / (1.0 - a2t))
        alpha_s = np.sqrt(1.0 / (1.0 + np.exp(-ls_s)))
        z_s = sig_ratio * z - alpha_s * np.expm1(-h) * D
        z = x_hat if i == 0 else z_s
        x_prev, h_prev = x_hat, h
        got_z.append(z.copy())
        got_x.append(x_hat)
    np.testing.assert_allclose(np.asarray(zs), np.stack(got_z), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(xs), np.stack(got_x), rtol=2e-4, atol=2e-4)


def test_dpm2m_second_order_on_analytic_gaussian():
    """On the smooth Gaussian ODE, compare the chain state at the SHARED
    u = 1/8 grid point (before the final x-hat replacement, which depends on
    the grid) against a 2048-step DDIM ground truth: the 8-step dpm2m error
    must be well under half the 8-step DDIM error, and small in absolute
    terms — the second-order claim, measured."""
    net = _gauss_net(0.25)
    z0 = _z0((4, 2, 2, 1), seed=11)
    rng = jax.random.key(4)

    def chain(sampler, S):
        d = gd.GaussianDiffusion(mean_type='v', num_steps=S, sampler=sampler)
        zs, _, _ = d.sample(net=net, init_x=z0, rng=rng)
        return np.asarray(zs)

    fine = chain('ddim', 2048)
    ref = fine[2048 - 1 - 256]  # z at u = 256/2048 = 1/8
    zd = chain('ddim', 8)[8 - 1 - 1]  # z at u = 1/8
    zp = chain('dpm2m', 8)[8 - 1 - 1]
    err_d = np.abs(zd - ref).max()
    err_p = np.abs(zp - ref).max()
    assert err_p < 0.5 * err_d, (err_p, err_d)
    assert err_p < 0.02, err_p


def test_dpm2m_guided_path_runs():
    """CF-guided dpm2m: the guided prediction head (cond/uncond branches +
    epsilon-space combine) feeds the 2M update; shapes and finiteness."""
    net = _gauss_net(0.2)
    diff = gd.GaussianDiffusion(
        mean_type='v', num_steps=6, sampler='dpm2m', sample_cond_w=1.5
    )
    z0 = _z0((3, 4, 4, 1))
    out = diff.sample(
        net=net, init_x=z0, rng=jax.random.key(6), cond_w=0.5,
        return_history=False,
    )
    assert out.shape == z0.shape
    assert np.isfinite(np.asarray(out)).all()
    assert np.all(np.abs(np.asarray(out)) <= 1.0)


def test_diffusion_model_dpm2m_cli_flags():
    """--sampler=dpm2m --sample_steps=8 through the real model layer: the
    serving-path sample() returns a finite batch and the evaluate() history
    has sample_steps frames."""
    G, Model = parse_args(
        [
            '--model=diffusion_model', '--bs=8', '--hidden_size=16',
            '--timesteps=64', '--sample_steps=8', '--sampler=dpm2m',
            '--bf16=0', '--logdir=/tmp/test_dpm2m',
        ],
        discover_models=discover_models,
    )
    m = Model(G=G)
    s = m.sample(4)
    assert s.shape == (4, 28, 28, 1)
    assert np.isfinite(np.asarray(s)).all()
    noise = jax.random.normal(jax.random.key(0), (2, 28, 28, 1))
    zs, xs, eps = m.sample_chain_fn(
        m.state, noise, jnp.zeros((2,), jnp.int32), jax.random.key(1)
    )
    assert zs.shape[0] == 8


def test_serve_sampler_override_roundtrip(tmp_path):
    """Serving honors --sampler/--sample_steps overrides on top of the
    checkpoint's hps.yaml (and keeps the trained values without them):
    the deploy knob for the fast-sampler latency/quality tradeoff."""
    G, Model = parse_args(
        [
            '--model=diffusion_model', '--bs=4', '--hidden_size=16',
            '--timesteps=8', '--bf16=0', f'--logdir={tmp_path}',
        ],
        discover_models=discover_models,
    )
    m = Model(G=G)
    m.save(tmp_path)
    from generative_models_tpu.utils.config import dump_hps

    dump_hps(G, tmp_path)  # the sibling hps.yaml --weights_from reloads

    from generative_models_tpu.serve import load_server

    srv, G2 = load_server(
        [
            '--model=diffusion_model', f'--weights_from={tmp_path}/model.pt',
            '--serve_bs=4', f'--logdir={tmp_path}/s1',
        ]
    )
    assert srv.model.diffusion.sampler == 'ddim'
    assert srv.model.diffusion.sample_steps == 8  # hps.yaml round-trip

    srv, G3 = load_server(
        [
            '--model=diffusion_model', f'--weights_from={tmp_path}/model.pt',
            '--serve_bs=4', '--sampler=dpm2m', '--sample_steps=3',
            f'--logdir={tmp_path}/s2',
        ]
    )
    assert srv.model.diffusion.sampler == 'dpm2m'
    assert srv.model.diffusion.sample_steps == 3
    out = srv.sample(4)
    assert out.shape == (4, 28, 28, 1) and np.isfinite(out).all()


def test_new_dg_flags_work_on_old_checkpoints(tmp_path):
    """Regression: parse_args' weights_from branch only registered flags
    present in the checkpoint's hps.yaml, so DG keys added after a
    checkpoint was trained (e.g. --sample_steps) died with 'unrecognized
    arguments'. They must resolve at the model's current defaults and be
    overridable."""
    import yaml

    G, Model = parse_args(
        [
            '--model=diffusion_model', '--bs=4', '--hidden_size=16',
            '--timesteps=8', '--bf16=0', f'--logdir={tmp_path}',
        ],
        discover_models=discover_models,
    )
    m = Model(G=G)
    m.save(tmp_path)
    from generative_models_tpu.utils.config import dump_hps

    dump_hps(G, tmp_path)
    # simulate a checkpoint from before the sampler flags existed
    hp = tmp_path / 'hps.yaml'
    d = yaml.load(hp.read_text(), Loader=yaml.Loader)
    del d['sample_steps']
    del d['sampler']
    hp.write_text(yaml.dump(d))

    G2, _ = parse_args(
        [
            f'--weights_from={tmp_path}/model.pt',
            '--sampler=dpm2m', '--sample_steps=25',
        ],
        discover_models=discover_models,
    )
    assert G2.sampler == 'dpm2m' and G2.sample_steps == 25
    G3, _ = parse_args(
        [f'--weights_from={tmp_path}/model.pt'],
        discover_models=discover_models,
    )
    assert G3.sampler == 'ddim' and G3.sample_steps == 0  # current defaults
