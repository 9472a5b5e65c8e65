"""Pipeline parallelism: a GPipe-style microbatch schedule over a 'pipe'
mesh axis, with activations moving stage-to-stage via lax.ppermute (ICI
neighbor hops — a pipeline is the one parallelism whose traffic pattern is
pure nearest-neighbor, exactly what a TPU torus is built for).

The reference has no pipeline (or any) parallelism — SURVEY.md §2.2. This is
the framework's PP layer: homogeneous layer stacks (the transformer's Block
stack) store their params STACKED along a leading layer axis, that axis is
sharded over 'pipe' (so each device holds only its stage's layer params and
optimizer moments), and the forward runs the classic S-stage / M-microbatch
schedule: M + S - 1 lockstep ticks, each tick = one stage_fn call per device
followed by one ppermute shift. Bubble fraction (S-1)/(M+S-1), the GPipe
bound. Differentiable through shard_map/scan/ppermute autodiff — the
backward is automatically the reverse pipeline (cotangents ppermute
upstream), no hand-written schedule needed.

Reachable from PixelTransformer via --mesh=pipe:N (models/pixel_transformer.py).
"""

import jax
import jax.numpy as jnp

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

PIPE_AXIS = 'pipe'


def pick_n_micro(batch, n_stages):
    """Default microbatch count: the largest of {4S, 2S, S} dividing the
    batch (GPipe wants M >= S to keep the bubble fraction small), falling
    back to the largest divisor of the batch <= 4S — searching the full
    range keeps e.g. batch=6, S=4 at M=6 (bubble 33%) instead of M=3
    (bubble 50%)."""
    for m in (4 * n_stages, 2 * n_stages, n_stages):
        if m <= batch and batch % m == 0:
            return m
    for m in range(min(batch, 4 * n_stages), 0, -1):
        if batch % m == 0:
            return m
    return 1


def pipeline_apply(stage_fn, stage_params, x, n_micro=None, mesh=None, axis=PIPE_AXIS):
    """Run x through S pipeline stages laid out over the mesh's `axis`.

    stage_fn(params_slice, h) -> h     one stage (identical signature on
                                       every device; a stage holding several
                                       layers scans over them internally)
    stage_params                       pytree whose leaves all have leading
                                       axis S == mesh.shape[axis]; sharded
                                       (or shardable) over `axis`
    x: (B, ...)                        stage-0 input; split into n_micro
                                       microbatches along axis 0
    Returns (B, ...) — the last stage's outputs, replicated over `axis`.
    """
    from generative_models_tpu.parallel import get_mesh

    mesh = mesh or get_mesh()
    assert axis in mesh.axis_names, f'mesh {mesh.axis_names} lacks {axis!r}'
    S = mesh.shape[axis]
    B = x.shape[0]
    M = n_micro or pick_n_micro(B, S)
    assert B % M == 0, f'batch {B} not divisible into {M} microbatches'
    mb = B // M
    perm = [(i, i + 1) for i in range(S - 1)]  # shift toward the next stage

    def body(params, x):
        local = jax.tree_util.tree_map(lambda p: p[0], params)  # this stage
        s = jax.lax.axis_index(axis)
        micro = x.reshape(M, mb, *x.shape[1:])
        # the carries become device-varying after one tick; mark the (zero)
        # initial values varying too so scan's carry types line up
        vary = lambda z: jax.lax.pcast(z, (axis,), to='varying')
        state = vary(jnp.zeros_like(micro[0]))
        outbuf = vary(jnp.zeros_like(micro))

        def tick(carry, t):
            state, outbuf = carry
            # stage 0 ingests microbatch t (clamped once the feed runs dry —
            # those ticks are bubble work whose output is never recorded);
            # later stages consume what the previous stage sent last tick
            feed = jax.lax.dynamic_index_in_dim(
                micro, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            h = stage_fn(local, jnp.where(s == 0, feed, state))
            # the last stage finishes microbatch m = t - (S-1) at tick t
            m = t - (S - 1)
            rec = jax.lax.dynamic_update_index_in_dim(
                outbuf, h, jnp.clip(m, 0, M - 1), 0
            )
            outbuf = jnp.where((s == S - 1) & (m >= 0), rec, outbuf)
            if S > 1:
                state = jax.lax.ppermute(h, axis, perm)
            return (state, outbuf), None

        (_, outbuf), _ = jax.lax.scan(
            tick, (state, outbuf), jnp.arange(M + S - 1)
        )
        # only the last stage holds real outputs; psum == broadcast to the
        # ring (and its transpose routes output cotangents back to stage S-1)
        outbuf = jnp.where(s == S - 1, outbuf, jnp.zeros_like(outbuf))
        return jax.lax.psum(outbuf, axis).reshape(B, *x.shape[1:])

    pspecs = jax.tree_util.tree_map(
        lambda p: P(axis, *([None] * (p.ndim - 1))), stage_params
    )
    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(pspecs, P()),
        out_specs=P(),
        axis_names={axis},  # manual over 'pipe' only; data/model stay GSPMD
    )
    return f(stage_params, x)
