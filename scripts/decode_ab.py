"""A/B the pixel_transformer fused decode kernels on chip (VERDICT r3 item 3).

Times sample(25) (the bench sample25 metric: full 784-step KV-cached scan,
frames included) with --fused_decode=1 (ops/decode_fused.py whole-Block
kernels) vs 0 (per-op XLA chain), and cross-checks that teacher-forced
logits agree between the two paths on chip (bf16 tolerance).

Also measures the int8-interceptor decode variant for the record: the
decode chain is op-latency-bound, not weight-bandwidth-bound, so int8 is
expected to be a measured rejection here (docs/PERF.md).

Run on chip: PYTHONPATH=/root/repo python scripts/decode_ab.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

TRIALS = 3


def _fetch(out):
    """Hard barrier: pull real values to host (block_until_ready is NOT a
    reliable barrier on the remote 'axon' platform — same workaround as
    bench.py)."""
    return jax.device_get(
        jax.tree_util.tree_map(lambda a: a.sum() if hasattr(a, 'sum') else a, out)
    )


def make_model(fused, unroll=1, segments=1):
    from generative_models_tpu.models.pixel_transformer import PixelTransformer
    from generative_models_tpu.utils.config import global_defaults

    G = global_defaults()
    G.bs = 64
    for k, v in PixelTransformer.DG.items():
        G[k] = v
    G.fused_decode = fused
    G.decode_unroll = unroll
    G.decode_segments = segments
    np.random.seed(0)
    return PixelTransformer(G)


def time_sample(model, n=25):
    _fetch(model.sample(n))
    best = float('inf')
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        _fetch(model.sample(n))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    m1 = make_model(1)
    m0 = make_model(0)
    assert m1.net.use_fused_decode and not m0.net.use_fused_decode

    # teacher-forced logits cross-check on chip (same init seeds)
    from generative_models_tpu.models.pixel_transformer import TransformerNet

    rng = np.random.RandomState(0)
    B, T = 8, m1.block_size
    params = m1.state.params
    c1 = m1.net.apply({'params': params}, B, method=TransformerNet.init_cache)
    c0 = m0.net.apply({'params': params}, B, method=TransformerNet.init_cache)
    prev = jnp.zeros((B, 1))
    worst = 0.0
    for t in [0, 1, 5, 100, 400, 783]:
        l1, c1 = m1.net.apply(
            {'params': params}, prev, c1, t, method=TransformerNet.decode_step
        )
        l0, c0 = m0.net.apply(
            {'params': params}, prev, c0, t, method=TransformerNet.decode_step
        )
        worst = max(worst, float(jnp.max(jnp.abs(l1 - l0))))
        prev = jnp.asarray((rng.rand(B, 1) > 0.5).astype(np.float32))
    print(f'fused-vs-plain max logit diff at probe steps: {worst:.2e}')
    assert worst < 0.05, 'fused decode diverged beyond bf16 tolerance'

    ms1 = time_sample(m1)
    ms0 = time_sample(m0)
    print(f'sample25: fused {ms1:.1f} ms vs plain {ms0:.1f} ms '
          f'({ms0 / ms1:.2f}x)')
    for fused, unroll in [(1, 4), (1, 8), (0, 4)]:
        ms = time_sample(make_model(fused, unroll))
        print(f'sample25 fused={fused} unroll={unroll}: {ms:.1f} ms')
    # segmented scan: triangular cache reads (the decode chain's dominant
    # HBM traffic) — sweep segment counts on both decode paths
    for fused, segments in [(1, 4), (1, 8), (1, 16), (0, 4), (0, 8)]:
        ms = time_sample(make_model(fused, segments=segments))
        print(f'sample25 fused={fused} segments={segments}: {ms:.1f} ms')

    # int8 decode variant (expected rejection: latency-bound, not BW-bound)
    try:
        from generative_models_tpu.ops.int8 import build_quant_interceptor
        from generative_models_tpu.models.base import intercept_ctx

        interceptor, n_q = build_quant_interceptor(m0, mode='w8a16')
        if interceptor is None:
            print('int8: nothing cleared quant thresholds; skipped')
        else:
            fn = jax.jit(
                lambda state, rng: _intercepted_sample(
                    m0, state, rng, interceptor
                )
            )
            _fetch(fn(m0.state, jax.random.key(0)))
            best = float('inf')
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                _fetch(fn(m0.state, jax.random.key(1)))
                best = min(best, time.perf_counter() - t0)
            print(f'sample25 int8(w8a16) decode: {best * 1e3:.1f} ms '
                  f'({n_q} kernels quantized)')
    except Exception as e:
        print(f'int8 decode variant failed: {e!r}')


def _intercepted_sample(model, state, rng, interceptor):
    from generative_models_tpu.models.base import intercept_ctx

    with intercept_ctx(interceptor):
        return model.sample_fn(state, 25, rng)


if __name__ == '__main__':
    main()
