"""Ring attention: causal attention with the sequence axis sharded over a
device mesh ('seq' axis), K/V chunks rotating around the ring via
lax.ppermute while each device folds every visiting chunk into its queries'
online softmax — the multi-chip generalization of the blockwise flash
kernel, riding ICI instead of VMEM.

The compute body per hop IS the flash kernel: ops.attention's ring chunk
kernels (_ring_chunk_fwd/_ring_chunk_bwd) run bf16 MXU matmuls with f32
online-softmax accumulators carried ACROSS hops, and a flash-style
(lse/delta recompute) backward whose dK/dV accumulators travel around the
ring with their chunks. Nothing O(T^2) is ever materialized on any device.
Gradients are a hand-written custom_vjp (a second ring pass), since Pallas
kernels are not autodiff-traceable.

The reference has no sequence parallelism at all (it materializes a dense
784x784 mask, gms/autoregs/pixel_transformer.py:92-97); this module is the
framework's long-context scaling path (SURVEY.md §2.2/§5). Reachable from
PixelTransformer via --mesh=seq:N.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from generative_models_tpu.ops import attention as att


def _prep(x, Tlp, dt):
    """(B, H, Tl, D) shard -> (BH, Tlp, D) in the matmul dtype, zero-padded
    along the sequence (padded q rows are sliced off; padded do rows are
    zero, which kills their dK/dV contributions exactly)."""
    B, H, Tl, D = x.shape
    return jnp.pad(
        x.reshape(B * H, Tl, D).astype(dt), ((0, 0), (0, Tlp - Tl), (0, 0))
    )


def _ring_fwd(axis_name, q, k, v):
    """Forward ring pass. All ring positions run in ppermute lockstep, so
    wall-clock is set by the last ring position (which sees every chunk);
    within each hop the chunk kernel's dynamic live bound skips
    causally-dead blocks (the diagonal hop does half work)."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.psum(1, axis_name)
    B, H, Tl, D = q.shape
    BH = B * H
    Tlp = att._pick_chunk_blk(Tl)[1]
    dt = att._dots_dtype()
    qp = _prep(q, Tlp, dt)
    kp = _prep(k, Tlp, dt)
    vp = _prep(v, Tlp, dt)
    scale = 1.0 / np.sqrt(D)
    q_start = idx * Tl
    perm = [(j, (j + 1) % n) for j in range(n)]
    rot = lambda x: jax.lax.ppermute(x, axis_name, perm)

    # hop 0 (the diagonal chunk) runs the init kernel variant: accumulators
    # are seeded in-kernel instead of being read from HBM
    acc, m, l = att._ring_chunk_fwd(
        qp, kp, vp, None, None, None, q_start, idx * Tl, Tl, scale,
        vma=(axis_name,),
    )
    if n > 1:
        kk, vv = rot(kp), rot(vp)

        def step(carry, i):
            acc, m, l, kk, vv = carry
            src = (idx - i) % n  # ring position whose K/V chunk we now hold
            acc, m, l = att._ring_chunk_fwd(
                qp, kk, vv, acc, m, l, q_start, src * Tl, Tl, scale,
                vma=(axis_name,),
            )
            return (acc, m, l, rot(kk), rot(vv)), None

        (acc, m, l, _, _), _ = jax.lax.scan(
            step, (acc, m, l, kk, vv), jnp.arange(1, n)
        )
    l = jnp.maximum(l, 1e-30)
    o_pad = acc / l[..., None]
    lse = m + jnp.log(l)
    out = o_pad[:, :Tl].reshape(B, H, Tl, D).astype(q.dtype)
    return out, (q, k, v, o_pad, lse)


def _ring_bwd(axis_name, res, g):
    """Backward ring pass: q/do/lse/delta stay local; (k, v, dk, dv) rotate
    together, each visiting chunk collecting its gradient contribution from
    every q shard. After n hops the accumulators are back home."""
    q, k, v, o_pad, lse = res
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.psum(1, axis_name)
    B, H, Tl, D = q.shape
    BH = B * H
    Tlp = att._pick_chunk_blk(Tl)[1]
    dt = att._dots_dtype()
    qp = _prep(q, Tlp, dt)
    kp = _prep(k, Tlp, dt)
    vp = _prep(v, Tlp, dt)
    dop = _prep(g, Tlp, dt)
    delta = jnp.sum(dop.astype(jnp.float32) * o_pad, axis=-1)  # (BH, Tlp)
    scale = 1.0 / np.sqrt(D)
    q_start = idx * Tl
    perm = [(j, (j + 1) % n) for j in range(n)]
    rot = lambda x: jax.lax.ppermute(x, axis_name, perm)

    # hop 0: init variant seeds dQ/dK/dV in-kernel (no HBM carry-in read)
    dq, dk, dv = att._ring_chunk_bwd(
        qp, kp, vp, dop, lse, delta, None, None, None,
        q_start, idx * Tl, Tl, scale, vma=(axis_name,),
    )
    if n > 1:
        kk, vv, dk, dv = rot(kp), rot(vp), rot(dk), rot(dv)

        def step(carry, i):
            dq, kk, vv, dk, dv = carry
            src = (idx - i) % n
            dq, dk, dv = att._ring_chunk_bwd(
                qp, kk, vv, dop, lse, delta, dq, dk, dv,
                q_start, src * Tl, Tl, scale, vma=(axis_name,),
            )
            return (dq, rot(kk), rot(vv), rot(dk), rot(dv)), None

        (dq, _, _, dk, dv), _ = jax.lax.scan(
            step, (dq, kk, vv, dk, dv), jnp.arange(1, n)
        )
    unpad = lambda x, like: (
        x[:, :Tl].reshape(B, H, Tl, D).astype(like.dtype)
    )
    return unpad(dq, q), unpad(dk, k), unpad(dv, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _local_ring_attention(axis_name, q, k, v):
    """Per-device body: q stays, k/v rotate. Shards are (B, H, Tl, D)."""
    return _ring_fwd(axis_name, q, k, v)[0]


_local_ring_attention.defvjp(_ring_fwd, _ring_bwd)


def ring_causal_attention(q, k, v, mesh=None, axis=None):
    """(B, H, T, D) causal attention with T sharded over the mesh 'seq' axis.

    T must divide evenly by the axis size. Output matches
    ops.attention.xla_causal_attention (same math, distributed); gradients
    flow through the paired backward ring pass.
    """
    from generative_models_tpu.parallel import DATA_AXIS, MODEL_AXIS, SEQ_AXIS, get_mesh

    mesh = mesh or get_mesh()
    axis = axis or SEQ_AXIS
    assert axis in mesh.axis_names, f'mesh {mesh.axis_names} lacks {axis!r}'
    # the body is embarrassingly parallel over batch and heads (only the
    # sequence axis communicates), so map B over 'data' and H over 'model'
    # when the mesh has them — a spec that leaves them unnamed means
    # "replicated", and on a composed data x seq mesh GSPMD would have to
    # all-gather the batch at the shard_map boundary (SPMD 'involuntary
    # full rematerialization' warnings, wasted ICI) just to satisfy it.
    # Shapes are static per trace: fall back to replicated when a dim
    # doesn't divide its axis (e.g. the B=1 init trace).
    names = mesh.axis_names

    def axis_if(name, dim):
        return (
            name
            if name in names and dim % mesh.shape[name] == 0
            else None
        )

    spec = P(
        axis_if(DATA_AXIS, q.shape[0]),
        axis_if(MODEL_AXIS, q.shape[1]),
        axis,
        None,
    )
    # check_vma=False: jax 0.9 cannot type interpret-mode pallas_call
    # bodies under the varying-manual-axes checker (jax suggests this
    # workaround in the error itself); the ring body is still fully
    # device-varying by construction.
    f = shard_map(
        functools.partial(_local_ring_attention, axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return f(q, k, v)
