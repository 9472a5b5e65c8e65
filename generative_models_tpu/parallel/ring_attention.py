"""Ring attention: causal attention with the sequence axis sharded over a
device mesh ('seq' axis), K/V shards rotating around the ring via
lax.ppermute while each device accumulates its queries' online softmax —
the multi-chip generalization of the blockwise flash kernel
(ops/attention.py), riding ICI instead of VMEM.

The reference has no sequence parallelism at all (it materializes a dense
784x784 mask, gms/autoregs/pixel_transformer.py:92-97); this module is the
framework's long-context scaling path (SURVEY.md §2.2/§5). It is fully
differentiable (shard_map autodiff: ppermute transposes to the inverse
permute) and reachable from PixelTransformer via --mesh=seq:N.
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

NEG_INF = -1e30


def _local_ring_attention(q, k, v, axis_name):
    """Per-device body: q stays, k/v rotate. Shards are (B, H, Tl, D).

    All ring positions run the same masked block computation: devices move in
    ppermute lockstep, so the wall-clock is set by the last ring position
    (which sees every block) — conditional skipping of fully-masked blocks
    would save energy but not latency."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.psum(1, axis_name)
    Tl = q.shape[2]
    scale = 1.0 / np.sqrt(q.shape[-1])

    row = jax.lax.broadcasted_iota(jnp.int32, (Tl, Tl), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Tl, Tl), 1)

    def step(carry, i):
        acc, m, l, kk, vv = carry
        src = (idx - i) % n  # ring position whose K/V shard we now hold
        # f32 accumulation regardless of input dtype (bf16-safe)
        s = jnp.einsum(
            'bhqd,bhkd->bhqk', q, kk, preferred_element_type=jnp.float32
        ) * scale
        q_pos = idx * Tl + row
        k_pos = src * Tl + col
        s = jnp.where((q_pos >= k_pos)[None, None], s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            'bhqk,bhkd->bhqd', p.astype(vv.dtype), vv,
            preferred_element_type=jnp.float32,
        )
        perm = [(j, (j + 1) % n) for j in range(n)]
        kk = jax.lax.ppermute(kk, axis_name, perm)
        vv = jax.lax.ppermute(vv, axis_name, perm)
        return (acc, m_new, l_new, kk, vv), None

    # carries must carry the shard_map 'varying' axis type (fresh constants
    # would mismatch the device-varying outputs of the scan body)
    if hasattr(jax.lax, 'pcast'):
        vary = lambda a: jax.lax.pcast(a, (axis_name,), to='varying')
    else:  # older jax
        vary = lambda a: jax.lax.pvary(a, (axis_name,))
    acc0 = vary(jnp.zeros(q.shape, jnp.float32))
    m0 = vary(jnp.full(q[..., :1].shape, NEG_INF, jnp.float32))
    l0 = vary(jnp.zeros(q[..., :1].shape, jnp.float32))
    (acc, _, l, _, _), _ = jax.lax.scan(
        step, (acc0, m0, l0, k, v), jnp.arange(n)
    )
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_causal_attention(q, k, v, mesh=None, axis=None):
    """(B, H, T, D) causal attention with T sharded over the mesh 'seq' axis.

    T must divide evenly by the axis size. Output matches
    ops.attention.xla_causal_attention (same math, distributed); gradients
    flow through the ring (scan + ppermute autodiff).
    """
    from generative_models_tpu.parallel import SEQ_AXIS, get_mesh

    mesh = mesh or get_mesh()
    axis = axis or SEQ_AXIS
    assert axis in mesh.axis_names, f'mesh {mesh.axis_names} lacks {axis!r}'
    spec = P(None, None, axis, None)
    f = shard_map(
        functools.partial(_local_ring_attention, axis_name=axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return f(q, k, v)
