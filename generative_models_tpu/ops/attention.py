"""Causal attention ops.

The reference materializes a dense 784x784 tril mask and full attention
matrix (gms/autoregs/pixel_transformer.py:92-116). Here the training/eval
path is a blockwise-causal flash-attention Pallas kernel: K/V stream through
VMEM in blocks with a running (max, sum) softmax, so nothing O(T^2) ever
lands in HBM. This is the single-chip analog of ring attention and the
long-context building block (parallel/ring_attention.py wraps it with
shard_map + collective permutes over a 'seq' mesh axis).

The backward pass recomputes attention in XLA (flash-style recompute: saves
only q, k, v between fwd and bwd). A hand-written flash backward kernel can
replace it without touching callers.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _on_tpu():
    return jax.default_backend() == 'tpu'


def xla_causal_attention(q, k, v, t_valid=None):
    """Dense fallback: (B, H, T, D) -> (B, H, T, D) with tril mask."""
    T = q.shape[2]
    scale = 1.0 / np.sqrt(q.shape[-1])
    att = jnp.einsum('bhqd,bhkd->bhqk', q, k) * scale
    mask = jnp.tril(jnp.ones((T, T), bool))
    att = jnp.where(mask[None, None], att, NEG_INF)
    att = jax.nn.softmax(att, axis=-1)
    return jnp.einsum('bhqk,bhkd->bhqd', att, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, bq, bk, n_kv, scale):
    """One (batch*head, q_block) program: stream causal KV blocks with an
    online-softmax accumulator."""
    qi = pl.program_id(1)
    q = q_ref[0] * scale  # (bq, D)
    D = q.shape[-1]

    def body(kv_i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(kv_i * bk, bk), :]  # (bk, D)
        v_blk = v_ref[0, pl.ds(kv_i * bk, bk), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # (bq, bk)
        # causal mask across blocks
        q_pos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        k_pos = kv_i * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(q_pos >= k_pos, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    # only blocks with k_start <= q_end participate (causal)
    n_blocks = jnp.minimum((qi + 1) * bq // bk + ((qi + 1) * bq % bk != 0), n_kv)
    acc0 = jnp.zeros((bq, D), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_blocks, body, (acc0, m0, l0))
    o_ref[0] = acc / jnp.maximum(l, 1e-30)
    # row logsumexp, saved for the backward kernels' softmax recompute.
    # lse is laid out (BH, 1, T) with a full-row block revisited across the
    # q-block grid axis (TPU tiling requires the trailing dims of a block to
    # be 8/128-divisible or span the array)
    lse_ref[0, 0, pl.ds(qi * bq, bq)] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _flash_forward(q, k, v, scale, bq=128, bk=128, interpret=None):
    """(BH, T, D) padded inputs -> (BH, T, D). `scale` must come from the
    TRUE head dim (the last axis here is zero-padded to the lane width)."""
    if interpret is None:
        interpret = not _on_tpu()
    BH, T, D = q.shape
    n_kv = T // bk
    kernel = functools.partial(_flash_kernel, bq=bq, bk=bk, n_kv=n_kv, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(BH, T // bq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, 1, T), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * T * T * D // 2,
            bytes_accessed=4 * 4 * BH * T * D,
            transcendentals=BH * T * T // 2,
        ),
        interpret=interpret,
    )(q, k, v)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *, bq, bk, n_kv, scale
):
    """dQ for one (bh, q-block): stream causal KV blocks, recomputing P from
    the saved row logsumexp."""
    qi = pl.program_id(1)
    q = q_ref[0]  # (bq, D)
    do = do_ref[0]
    lse = lse_ref[0, 0, pl.ds(qi * bq, bq)][:, None]  # (bq, 1)
    delta = delta_ref[0, 0, pl.ds(qi * bq, bq)][:, None]

    def body(kv_i, dq):
        k_blk = k_ref[0, pl.ds(kv_i * bk, bk), :]
        v_blk = v_ref[0, pl.ds(kv_i * bk, bk), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        q_pos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        k_pos = kv_i * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(q_pos >= k_pos, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jnp.dot(ds, k_blk, preferred_element_type=jnp.float32)

    n_blocks = jnp.minimum((qi + 1) * bq // bk + ((qi + 1) * bq % bk != 0), n_kv)
    dq = jax.lax.fori_loop(0, n_blocks, body, jnp.zeros_like(q))
    dq_ref[0] = dq * scale


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, bq, bk, n_q, scale,
):
    """dK/dV for one (bh, kv-block): stream the causal q blocks >= this one."""
    ki = pl.program_id(1)
    k_blk = k_ref[0]  # (bk, D)
    v_blk = v_ref[0]

    def body(q_i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(q_i * bq, bq), :]
        do = do_ref[0, pl.ds(q_i * bq, bq), :]
        lse = lse_ref[0, 0, pl.ds(q_i * bq, bq)][:, None]
        delta = delta_ref[0, 0, pl.ds(q_i * bq, bq)][:, None]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        q_pos = q_i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        k_pos = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(q_pos >= k_pos, s, NEG_INF)
        p = jnp.exp(s - lse)  # (bq, bk)
        dv = dv + jnp.dot(p.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
        return dk, dv

    # causal: only q blocks whose end reaches this kv block's start
    first_q = (ki * bk) // bq
    dk0 = jnp.zeros_like(k_blk)
    dv0 = jnp.zeros_like(v_blk)
    dk, dv = jax.lax.fori_loop(first_q, n_q, body, (dk0, dv0))
    dk_ref[0] = dk * scale
    dv_ref[0] = dv


def _flash_backward(q, k, v, o, lse, do, scale, bq=128, bk=128, interpret=None):
    """(BH, T, D) padded tensors -> (dq, dk, dv)."""
    if interpret is None:
        interpret = not _on_tpu()
    BH, T, D = q.shape
    delta = jnp.sum(do * o, axis=-1)[:, None, :]  # (BH, 1, T)
    n_kv = T // bk
    n_q = T // bq
    full = lambda b, i: (b, 0, 0)
    row_spec = pl.BlockSpec((1, 1, T), full, memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, bq=bq, bk=bk, n_kv=n_kv, scale=scale
        ),
        grid=(BH, n_q),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BH, T, D), jnp.float32),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, bq=bq, bk=bk, n_q=n_q, scale=scale
        ),
        grid=(BH, n_kv),
        in_specs=[
            pl.BlockSpec((1, T, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), full, memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, bk, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, T, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, T, D), jnp.float32),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def causal_attention(q, k, v, use_pallas=True):
    """Causal multi-head attention: (B, H, T, D) -> (B, H, T, D).

    Softmax(QK^T / sqrt(D), tril-masked) @ V. Pallas flash kernel on TPU,
    dense XLA elsewhere.
    """
    return _ca_fwd(q, k, v, use_pallas)[0]


def _pad_bhtd(x, Tp, Dp):
    B, H, T, D = x.shape
    return jnp.pad(
        x.reshape(B * H, T, D).astype(jnp.float32),
        ((0, 0), (0, Tp - T), (0, Dp - D)),
    )


def _pallas_call_4d(q, k, v):
    B, H, T, D = q.shape
    # pad T to a block multiple and D to lane width
    Tp = _round_up(T, 128)
    Dp = _round_up(D, 128)
    out, lse = _flash_forward(
        _pad_bhtd(q, Tp, Dp), _pad_bhtd(k, Tp, Dp), _pad_bhtd(v, Tp, Dp),
        scale=1.0 / np.sqrt(D),
    )
    # padded keys beyond T are only attendable from padded queries (causal),
    # so valid rows are exact
    return out[:, :T, :D].reshape(B, H, T, D), (out, lse)


def _ca_fwd(q, k, v, use_pallas):
    if use_pallas:
        out, (o_pad, lse) = _pallas_call_4d(q, k, v)
        return out, (q, k, v, o_pad, lse)
    out = xla_causal_attention(q, k, v)
    return out, (q, k, v, None, None)


def _ca_bwd(use_pallas, res, g):
    q, k, v, o_pad, lse = res
    if not use_pallas:
        _, vjp = jax.vjp(xla_causal_attention, q, k, v)
        return vjp(g)
    B, H, T, D = q.shape
    Tp = _round_up(T, 128)
    Dp = _round_up(D, 128)
    dq, dk, dv = _flash_backward(
        _pad_bhtd(q, Tp, Dp), _pad_bhtd(k, Tp, Dp), _pad_bhtd(v, Tp, Dp),
        o_pad, lse, _pad_bhtd(g, Tp, Dp), scale=1.0 / np.sqrt(D),
    )
    unpad = lambda x: x[:, :T, :D].reshape(B, H, T, D)
    return unpad(dq), unpad(dk), unpad(dv)


causal_attention.defvjp(_ca_fwd, _ca_bwd)


def decode_step_attention(q1, k_cache, v_cache, t):
    """Single-token attention against a KV cache for sampling.

    q1: (B, H, D); k_cache/v_cache: (B, H, T, D); t: current index (traced).
    Attends to positions 0..t inclusive.
    """
    scale = 1.0 / np.sqrt(q1.shape[-1])
    att = jnp.einsum('bhd,bhkd->bhk', q1, k_cache) * scale
    T = k_cache.shape[2]
    valid = jnp.arange(T)[None, None, :] <= t
    att = jnp.where(valid, att, NEG_INF)
    att = jax.nn.softmax(att, axis=-1)
    return jnp.einsum('bhk,bhkd->bhd', att, v_cache)
