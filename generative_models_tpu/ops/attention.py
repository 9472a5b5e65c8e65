"""Causal attention ops.

The reference materializes a dense 784x784 tril mask and full attention
matrix (gms/autoregs/pixel_transformer.py:92-116). Here the training/eval
path is a blockwise-causal flash-attention Pallas kernel: K/V stream through
VMEM in blocks with a running (max, sum) softmax, so nothing O(T^2) ever
lands in HBM. This is the single-chip analog of ring attention and the
long-context building block (parallel/ring_attention.py wraps it with
shard_map + collective permutes over a 'seq' mesh axis).

Layout/perf notes (TPU v5e, B=64 H=4 T=784 D=32 — the pixel_transformer
training shape; measured on chip):
  - head_dim stays UNPADDED in HBM; only VMEM blocks pay the 32->128 lane
    padding. An earlier version materialized (BH, Tp, 128) f32 copies of
    q/k/v in HBM, which made the kernel HBM-bound and slower than dense.
  - one program per GROUP of batch*head slices (grid over BH/G only); the
    causal block structure is a STATIC double loop (qi, ki<=qi) so 43% of
    block-pairs are skipped at compile time and only diagonal blocks pay
    the tril mask. A dynamic fori_loop bound defeats Mosaic's pipelining
    and ran no faster than computing everything.
  - matmul inputs are bf16 on TPU (f32 accumulation via
    preferred_element_type), f32 in interpret mode so CPU tests check the
    exact algorithm.
  - at D=32 the MXU runs at ~3-7% peak regardless of blocking (measured:
    XLA's own bare QK^T batched matmul takes 1.95 ms; this kernel does the
    whole fused causal attention in ~1.9 ms fwd). The shape, not the
    schedule, is the ceiling.

The backward is hand-written flash-style: saves only (q, k, v, o, lse) and
recomputes P blockwise in ONE fused kernel producing dQ, dK and dV (the
S/P recompute is shared across the three gradients).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from generative_models_tpu.ops.common import on_tpu as _on_tpu
from generative_models_tpu.ops.common import round_up as _round_up

NEG_INF = -1e30


def _pick_blk(T):
    """(block size, padded T). Prefer a block that divides T exactly (so no
    HBM pad/unpad copies are needed; sublane granularity is 8): T=784 ->
    112. Otherwise pad T to a 128 multiple."""
    if T % 8 == 0:
        best = 0
        for d in range(40, 145, 8):
            if T % d == 0:
                best = d
        if best:
            return best, T
    return 128, _round_up(T, 128)


_LANE = 128  # D pads to the lane width inside VMEM blocks
_VMEM_BUDGET = 10 * 1024 * 1024  # resident working set per program
_MAX_STATIC_BLOCKS = 12  # above this the unrolled double loop bloats compiles


def _plan(T):
    """Pick the kernel strategy for sequence length T.

    'static'  : whole sequence resident per program, fully unrolled causal
                double loop — fastest at the zoo's T<=~1.5k shapes.
    'streamed': 3-D grid streaming every operand blockwise from HBM with
                scratch accumulators — nothing full-T is ever resident, so
                it scales to arbitrary sequence lengths.
    """
    blk, Tp = _pick_blk(T)
    if Tp // blk <= _MAX_STATIC_BLOCKS:
        return 'static', blk, Tp
    return 'streamed', 128, _round_up(T, 128)


def _group_size_simple(BH):
    """Largest of 8/4/2/1 dividing BH (streamed kernels hold only
    per-block operands, so VMEM never constrains the group)."""
    for g in (8, 4, 2, 1):
        if BH % g == 0:
            return g
    return 1


def _vmem_fit_group(BH, Tp, resident_f32_equiv, cap):
    """Largest bh-group whose resident full-T footprint fits the budget.
    resident_f32_equiv: resident full-T tensors weighted by bytes/4."""
    per_g = Tp * _LANE * 4 * resident_f32_equiv
    for g in (8, 4, 2, 1):
        if g <= cap and BH % g == 0 and g * per_g <= _VMEM_BUDGET:
            return g
    return 1


def _in_vma(x):
    """Device-varying axis set of x's aval, or None outside check_vma-typed
    shard_map traces. pallas_call out_shapes must carry this set (e.g. when
    a pipeline stage body runs these kernels manual over 'pipe')."""
    try:
        vma = jax.typeof(x).vma
    except AttributeError:
        return None
    return frozenset(vma) if vma else None


def xla_causal_attention(q, k, v, t_valid=None):
    """Dense fallback: (B, H, T, D) -> (B, H, T, D) with tril mask.

    t_valid (optional): number of valid (unpadded) key positions — keys at
    index >= t_valid get no weight, matching the ring-chunk kernels'
    tail-padding semantics (_ring_chunk_fwd_kernel above)."""
    T = q.shape[2]
    scale = 1.0 / np.sqrt(q.shape[-1])
    att = jnp.einsum('bhqd,bhkd->bhqk', q, k) * scale
    mask = jnp.tril(jnp.ones((T, T), bool))
    if t_valid is not None:
        mask = mask & (jnp.arange(T)[None, :] < t_valid)
    att = jnp.where(mask[None, None], att, NEG_INF)
    att = jax.nn.softmax(att, axis=-1)
    if t_valid is not None:
        # rows with no valid key (t_valid == 0) output 0, matching the ring
        # kernels' online-softmax (l = 0 -> acc / max(l, eps) = 0) instead
        # of softmax's uniform-over-NEG_INF artifact
        att = att * mask.any(-1)[None, None, :, None]
    return jnp.einsum('bhqk,bhkd->bhqd', att, v)


def _bdot(a, b, contract_a, contract_b):
    """Batched (leading-dim) matmul with f32 accumulation."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _tril_mask(s, G, b):
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (G, b, b), 1)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (G, b, b), 2)
    return jnp.where(q_pos >= k_pos, s, NEG_INF)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, blk, n_blk, scale):
    """One bh-group program: static causal double loop over (q, kv) blocks
    with an online-softmax accumulator; only diagonal blocks are masked."""
    G = q_ref.shape[0]
    D = q_ref.shape[-1]
    for qi in range(n_blk):
        q = q_ref[:, pl.ds(qi * blk, blk), :]  # (G, blk, D)
        acc = jnp.zeros((G, blk, D), jnp.float32)
        m = jnp.full((G, blk, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((G, blk, 1), jnp.float32)
        for ki in range(qi + 1):
            k_blk = k_ref[:, pl.ds(ki * blk, blk), :]
            v_blk = v_ref[:, pl.ds(ki * blk, blk), :]
            s = _bdot(q, k_blk, 2, 2) * scale  # (G, blk, blk) f32
            if ki == qi:  # only the diagonal block needs the tril mask
                s = _tril_mask(s, G, blk)
            acc, m, l = _online_update(s, v_blk, acc, m, l, q.dtype)
        o_ref[:, pl.ds(qi * blk, blk), :] = acc / jnp.maximum(l, 1e-30)
        # row logsumexp, saved for the backward's softmax recompute
        lse_ref[0, :, pl.ds(qi * blk, blk)] = (
            m + jnp.log(jnp.maximum(l, 1e-30))
        )[..., 0]


def _flash_forward(q, k, v, scale, blk=128, interpret=None):
    """(BH, Tp, D) inputs (D unpadded; Tp a multiple of blk) ->
    (o (BH, Tp, D) f32, lse (BH, Tp) f32)."""
    if interpret is None:
        interpret = not _on_tpu()
    BH, T, D = q.shape
    # residents: q/k/v bf16 + o f32 per program
    G = _vmem_fit_group(BH, T, 2.5, 8)
    kernel = functools.partial(
        _flash_kernel, blk=blk, n_blk=T // blk, scale=scale
    )
    full = pl.BlockSpec((G, T, D), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        kernel,
        grid=(BH // G,),
        in_specs=[full, full, full],
        out_specs=(
            full,
            pl.BlockSpec((1, G, T), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            _sds((BH, T, D), _in_vma(q)),
            _sds((BH // G, G, T), _in_vma(q)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * T * T * D // 2,
            bytes_accessed=4 * 4 * BH * T * D,
            transcendentals=BH * T * T // 2,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(q, k, v)
    return o, lse.reshape(BH, T)


def _flash_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref, *, blk, n_blk, scale,
):
    """Fused dQ/dK/dV for one bh-group: one static causal pass over block
    pairs, sharing the S/P recompute. dQ accumulates in registers per
    q-block; dK/dV accumulate into their (VMEM-resident) output blocks."""
    G = q_ref.shape[0]
    D = q_ref.shape[-1]
    dk_ref[...] = jnp.zeros_like(dk_ref)
    dv_ref[...] = jnp.zeros_like(dv_ref)
    for qi in range(n_blk):
        q = q_ref[:, pl.ds(qi * blk, blk), :]
        do = do_ref[:, pl.ds(qi * blk, blk), :]
        lse = lse_ref[0, :, pl.ds(qi * blk, blk)][..., None]  # (G, blk, 1)
        delta = delta_ref[0, :, pl.ds(qi * blk, blk)][..., None]
        dq = jnp.zeros((G, blk, D), jnp.float32)
        for ki in range(qi + 1):
            ks = pl.ds(ki * blk, blk)
            k_blk = k_ref[:, ks, :]
            v_blk = v_ref[:, ks, :]
            s = _bdot(q, k_blk, 2, 2) * scale
            if ki == qi:
                s = _tril_mask(s, G, blk)
            p = jnp.exp(s - lse)  # (G, blk, blk) f32
            dp = _bdot(do, v_blk, 2, 2)
            ds = p * (dp - delta)
            pt = jnp.swapaxes(p.astype(q.dtype), 1, 2)
            dst = jnp.swapaxes(ds.astype(q.dtype), 1, 2)
            dq = dq + _bdot(ds.astype(q.dtype), k_blk, 2, 1)
            dk_ref[:, ks, :] += _bdot(dst, q, 2, 1) * scale
            dv_ref[:, ks, :] += _bdot(pt, do, 2, 1)
        dq_ref[:, pl.ds(qi * blk, blk), :] = dq * scale


def _flash_backward(q, k, v, o, lse, do, scale, blk=128, interpret=None):
    """(BH, Tp, D) tensors (q/k/v/do in the matmul dtype, o/lse f32) ->
    (dq, dk, dv) f32, in one fused kernel."""
    if interpret is None:
        interpret = not _on_tpu()
    BH, T, D = q.shape
    # residents: q/k/v/do bf16 + dq/dk/dv f32 per program
    G = _vmem_fit_group(BH, T, 5.0, 4)
    delta = (
        jnp.sum(do.astype(jnp.float32) * o, axis=-1).reshape(BH // G, G, T)
    )
    kernel = functools.partial(
        _flash_bwd_kernel, blk=blk, n_blk=T // blk, scale=scale
    )
    full = pl.BlockSpec((G, T, D), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, G, T), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(BH // G,),
        in_specs=[full, full, full, full, row, row],
        out_specs=(full, full, full),
        out_shape=(
            _sds((BH, T, D), _in_vma(q)),
            _sds((BH, T, D), _in_vma(q)),
            _sds((BH, T, D), _in_vma(q)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * BH * T * T * D // 2,
            bytes_accessed=7 * 4 * BH * T * D,
            transcendentals=BH * T * T // 2,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(q, k, v, do, lse.reshape(BH // G, G, T), delta)
    return dq, dk, dv


# --------------------- streamed (long-context) kernels ---------------------
# 3-D grid with the KV (fwd/dQ) or Q (dK/dV) axis INNERMOST: every operand
# arrives as one (G, blk, D) block per grid step, so nothing full-T is ever
# resident in VMEM and the path scales to arbitrary sequence lengths. The
# online-softmax / gradient accumulators live in VMEM scratch, reset at the
# first inner step and flushed into the (revisited) output blocks at the
# last. Causally-dead block pairs are skipped with pl.when predication. The
# lse/delta rows use a (BH//G, G, Tp) layout so any group size satisfies
# the TPU block-dim rules.


def _block_tril(s, qi, ki, blk):
    """Causal mask for the (qi, ki) block pair of (G, blk, blk) scores."""
    G = s.shape[0]
    q_pos = qi * blk + jax.lax.broadcasted_iota(jnp.int32, (G, blk, blk), 1)
    k_pos = ki * blk + jax.lax.broadcasted_iota(jnp.int32, (G, blk, blk), 2)
    return jnp.where(q_pos >= k_pos, s, NEG_INF)


def _online_update(s, v_blk, acc, m, l, dtype):
    """One online-softmax step: fold a masked score block into (acc, m, l)."""
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + _bdot(p.astype(dtype), v_blk, 2, 1)
    return acc_new, m_new, l_new


def _flash_kernel_streamed(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_s, m_s, l_s, *, blk, n_kv, scale
):
    qi, ki = pl.program_id(1), pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_s[...] = jnp.zeros_like(acc_s)
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)

    @pl.when(ki <= qi)  # causally-live block pairs only
    def _():
        q = q_ref[...]
        s = _bdot(q, k_ref[...], 2, 2) * scale
        s = _block_tril(s, qi, ki, blk)
        acc, m, l = _online_update(
            s, v_ref[...], acc_s[...], m_s[...], l_s[...], q.dtype
        )
        acc_s[...], m_s[...], l_s[...] = acc, m, l

    @pl.when(ki == n_kv - 1)
    def _():
        l = jnp.maximum(l_s[...], 1e-30)
        o_ref[...] = acc_s[...] / l
        lse_ref[0] = (m_s[...] + jnp.log(l))[..., 0]


def _streamed_specs(BH, T, D, blk, G):
    qkv = pl.BlockSpec(
        (G, blk, D), lambda g, i, k: (g, i, 0), memory_space=pltpu.VMEM
    )
    kv = pl.BlockSpec(
        (G, blk, D), lambda g, i, k: (g, k, 0), memory_space=pltpu.VMEM
    )
    row = pl.BlockSpec(
        (1, G, blk), lambda g, i, k: (g, 0, i), memory_space=pltpu.VMEM
    )
    return qkv, kv, row


def _flash_forward_streamed(q, k, v, scale, blk=128, interpret=None):
    if interpret is None:
        interpret = not _on_tpu()
    BH, T, D = q.shape
    G = _group_size_simple(BH)
    n_blk = T // blk
    qkv, kv, row = _streamed_specs(BH, T, D, blk, G)
    o, lse = pl.pallas_call(
        functools.partial(
            _flash_kernel_streamed, blk=blk, n_kv=n_blk, scale=scale
        ),
        grid=(BH // G, n_blk, n_blk),
        in_specs=[qkv, kv, kv],
        out_specs=(qkv, row),
        out_shape=(
            _sds((BH, T, D), _in_vma(q)),
            _sds((BH // G, G, T), _in_vma(q)),
        ),
        scratch_shapes=[
            pltpu.VMEM((G, blk, D), jnp.float32),
            pltpu.VMEM((G, blk, 1), jnp.float32),
            pltpu.VMEM((G, blk, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * T * T * D // 2,
            bytes_accessed=4 * 4 * BH * T * D,
            transcendentals=BH * T * T // 2,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(q, k, v)
    return o, lse.reshape(BH, T)


def _flash_bwd_dq_streamed(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_s,
    *, blk, n_kv, scale,
):
    qi, ki = pl.program_id(1), pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        dq_s[...] = jnp.zeros_like(dq_s)

    @pl.when(ki <= qi)
    def _():
        q = q_ref[...]
        do = do_ref[...]
        lse = lse_ref[0][..., None]  # (G, blk, 1)
        delta = delta_ref[0][..., None]
        k_blk = k_ref[...]
        s = _bdot(q, k_blk, 2, 2) * scale
        s = _block_tril(s, qi, ki, blk)
        p = jnp.exp(s - lse)
        dp = _bdot(do, v_ref[...], 2, 2)
        ds = (p * (dp - delta)).astype(q.dtype)
        dq_s[...] += _bdot(ds, k_blk, 2, 1)

    @pl.when(ki == n_kv - 1)
    def _():
        dq_ref[...] = dq_s[...] * scale


def _flash_bwd_dkv_streamed(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_s, dv_s, *, blk, n_q, scale,
):
    # here the grid's middle axis is the KV block and the INNER axis is q
    ki, qi = pl.program_id(1), pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_s[...] = jnp.zeros_like(dk_s)
        dv_s[...] = jnp.zeros_like(dv_s)

    @pl.when(qi >= ki)
    def _():
        q = q_ref[...]
        do = do_ref[...]
        lse = lse_ref[0][..., None]
        delta = delta_ref[0][..., None]
        k_blk = k_ref[...]
        v_blk = v_ref[...]
        s = _bdot(q, k_blk, 2, 2) * scale
        s = _block_tril(s, qi, ki, blk)
        p = jnp.exp(s - lse)  # (G, blk, blk) f32
        pt = jnp.swapaxes(p.astype(q.dtype), 1, 2)
        dv_s[...] += _bdot(pt, do, 2, 1)
        dp = _bdot(do, v_blk, 2, 2)
        ds = p * (dp - delta)
        dst = jnp.swapaxes(ds.astype(q.dtype), 1, 2)
        dk_s[...] += _bdot(dst, q, 2, 1)

    @pl.when(qi == n_q - 1)
    def _():
        dk_ref[...] = dk_s[...] * scale
        dv_ref[...] = dv_s[...]


def _flash_backward_streamed(q, k, v, o, lse, do, scale, blk=128, interpret=None):
    if interpret is None:
        interpret = not _on_tpu()
    BH, T, D = q.shape
    G = _group_size_simple(BH)
    n_blk = T // blk
    delta3 = (
        jnp.sum(do.astype(jnp.float32) * o, axis=-1).reshape(BH // G, G, T)
    )
    lse3 = lse.reshape(BH // G, G, T)
    qkv, kv, row = _streamed_specs(BH, T, D, blk, G)
    params = dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )
    cost = pl.CostEstimate(
        flops=3 * 2 * BH * T * T * D // 2,
        bytes_accessed=6 * 4 * BH * T * D,
        transcendentals=BH * T * T // 2,
    )
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_streamed, blk=blk, n_kv=n_blk, scale=scale
        ),
        grid=(BH // G, n_blk, n_blk),
        in_specs=[qkv, kv, kv, qkv, row, row],
        out_specs=qkv,
        out_shape=_sds((BH, T, D), _in_vma(q)),
        scratch_shapes=[pltpu.VMEM((G, blk, D), jnp.float32)],
        cost_estimate=cost,
        **params,
    )(q, k, v, do, lse3, delta3)
    # dK/dV pass: middle grid axis = kv block, inner axis = q block
    qkv_i = pl.BlockSpec(
        (G, blk, D), lambda g, i, k: (g, k, 0), memory_space=pltpu.VMEM
    )
    kv_m = pl.BlockSpec(
        (G, blk, D), lambda g, i, k: (g, i, 0), memory_space=pltpu.VMEM
    )
    row_i = pl.BlockSpec(
        (1, G, blk), lambda g, i, k: (g, 0, k), memory_space=pltpu.VMEM
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_streamed, blk=blk, n_q=n_blk, scale=scale
        ),
        grid=(BH // G, n_blk, n_blk),
        in_specs=[qkv_i, kv_m, kv_m, qkv_i, row_i, row_i],
        out_specs=(kv_m, kv_m),
        out_shape=(
            _sds((BH, T, D), _in_vma(q)),
            _sds((BH, T, D), _in_vma(q)),
        ),
        scratch_shapes=[
            pltpu.VMEM((G, blk, D), jnp.float32),
            pltpu.VMEM((G, blk, D), jnp.float32),
        ],
        cost_estimate=cost,
        **params,
    )(q, k, v, do, lse3, delta3)
    return dq, dk, dv



# ------------------------- ring-attention chunk kernels -------------------------
# The per-hop compute body of ring attention (parallel/ring_attention.py):
# fold ONE visiting K/V chunk into the carried online-softmax state (fwd) or
# accumulate this q-shard's gradient contributions onto the visiting chunk's
# traveling dK/dV accumulators (bwd). Same building blocks as the single-chip
# flash kernels above (_bdot bf16 matmuls with f32 accumulation,
# _online_update, flash-style lse/delta backward) — the ring path IS the
# flash kernel, with VMEM block streaming replaced by ICI chunk rotation.
#
# Layout: grid (BH//G, n_q); q/do/acc arrive as one (G, blk, D) block per
# program, K/V (and dK/dV) chunks stay VMEM-resident, m/l/lse/delta rows use
# the (BH//G, G, Tp) layout. The causal mask comes from GLOBAL positions:
# q_start/k_start (SMEM scalars, traced per hop — k_start depends on the
# ring step) offset the block-local iotas. The KV loop is a fori_loop whose
# UPPER BOUND is computed from the offsets, so causally-dead blocks are
# never executed: at seq:1 this degenerates to exactly the static kernel's
# compile-time causal skipping, and on a ring the diagonal hop does half
# work. K/V stay resident (no HBM streaming to pipeline), so the dynamic
# bound costs nothing.


def _pick_chunk_blk(T):
    """(block size, padded T) for a ring chunk of local length T. Small
    chunks round up to one sublane-aligned block; larger reuse _pick_blk."""
    if T <= 128:
        b = _round_up(T, 8)
        return b, b
    return _pick_blk(T)


def _live_kv_bound(q0, k0, blk, n_kv):
    """Number of leading KV blocks with any causally-live pair for the
    q-block starting at global q0 against the chunk starting at k0."""
    hi = jnp.floor_divide(q0 + (blk - 1) - k0, blk) + 1
    return jnp.clip(hi, 0, n_kv)


def _sds(shape, vma):
    """f32 pallas out-shape; under shard_map the outputs must carry the
    device-varying axis set (vma) so check_vma-typed tracing accepts them."""
    if vma is None:
        return jax.ShapeDtypeStruct(shape, jnp.float32)
    return jax.ShapeDtypeStruct(shape, jnp.float32, vma=frozenset(vma))


def _ring_chunk_fwd_kernel(
    *refs, blk, n_kv, t_valid, scale, init,
):
    if init:  # first hop: accumulators start fresh, no carry-in traffic
        (qs_ref, ks_ref, q_ref, k_ref, v_ref,
         oacc_ref, om_ref, ol_ref) = refs
    else:
        (qs_ref, ks_ref, q_ref, k_ref, v_ref, acc_ref, m_ref, l_ref,
         oacc_ref, om_ref, ol_ref) = refs
    G = q_ref.shape[0]
    D = q_ref.shape[-1]
    q0 = qs_ref[0] + pl.program_id(1) * blk
    k0 = ks_ref[0]
    q = q_ref[...]
    row = jax.lax.broadcasted_iota(jnp.int32, (G, blk, blk), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (G, blk, blk), 2)

    def body(ki, carry):
        acc, m, l = carry
        k_blk = k_ref[:, pl.ds(ki * blk, blk), :]
        v_blk = v_ref[:, pl.ds(ki * blk, blk), :]
        s = _bdot(q, k_blk, 2, 2) * scale
        live = (q0 + row) >= (k0 + ki * blk + col)
        if t_valid % blk:  # chunk tail padding: mask padded K columns
            live &= (ki * blk + col) < t_valid
        s = jnp.where(live, s, NEG_INF)
        return _online_update(s, v_blk, acc, m, l, q.dtype)

    if init:
        carry0 = (
            jnp.zeros((G, blk, D), jnp.float32),
            jnp.full((G, blk, 1), NEG_INF, jnp.float32),
            jnp.zeros((G, blk, 1), jnp.float32),
        )
    else:
        carry0 = (acc_ref[...], m_ref[...], l_ref[...])
    acc, m, l = jax.lax.fori_loop(
        0, _live_kv_bound(q0, k0, blk, n_kv), body, carry0
    )
    oacc_ref[...] = acc
    om_ref[...] = m
    ol_ref[...] = l


def _ring_chunk_fwd(
    q, k, v, acc, m, l, q_start, k_start, t_valid, scale, interpret=None,
    vma=None,
):
    """One ring hop of the forward online softmax.

    q/k/v: (BH, Tp, D) in the matmul dtype; acc: (BH, Tp, D) f32;
    m/l: (BH, Tp) f32; q_start/k_start: traced global offsets of the local
    q shard / visiting kv chunk; t_valid: static valid length (<= Tp).
    Returns the updated (acc, m, l). acc/m/l may be None on the FIRST hop
    (init variant: the kernel seeds the accumulators itself, saving their
    HBM carry-in read).
    """
    if interpret is None:
        interpret = not _on_tpu()
    BH, Tp, D = q.shape
    blk = _pick_chunk_blk(t_valid)[0]
    n_kv = (t_valid + blk - 1) // blk
    G = _vmem_fit_group(BH, Tp, 2.0, 8)
    blkspec = pl.BlockSpec(
        (G, blk, D), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(
        (G, Tp, D), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM
    )
    # m/l travel as (BH, Tp, 1) arrays in (G, blk, 1) blocks: the size-1
    # lane dim equals the array dim and blk is sublane-aligned, so the
    # blocks satisfy TPU tiling rules with no in-kernel slicing.
    rowspec = pl.BlockSpec(
        (G, blk, 1), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    scalar = lambda x: jnp.asarray(x, jnp.int32).reshape(1)
    init = acc is None
    carry_specs = [] if init else [blkspec, rowspec, rowspec]
    carry_args = [] if init else [
        acc, m.reshape(BH, Tp, 1), l.reshape(BH, Tp, 1)
    ]
    acc, m, l = pl.pallas_call(
        functools.partial(
            _ring_chunk_fwd_kernel,
            blk=blk, n_kv=n_kv, t_valid=t_valid, scale=scale, init=init,
        ),
        grid=(BH // G, Tp // blk),
        in_specs=[smem, smem, blkspec, full, full] + carry_specs,
        out_specs=(blkspec, rowspec, rowspec),
        out_shape=(
            _sds((BH, Tp, D), vma),
            _sds((BH, Tp, 1), vma),
            _sds((BH, Tp, 1), vma),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * Tp * t_valid * D // 2,
            bytes_accessed=4 * 4 * BH * Tp * D,
            transcendentals=BH * Tp * t_valid // 2,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        scalar(q_start), scalar(k_start), q, k, v, *carry_args,
    )
    return acc, m.reshape(BH, Tp), l.reshape(BH, Tp)


def _ring_chunk_bwd_kernel(
    *refs, blk, n_kv, t_valid, scale, init,
):
    if init:  # first hop: gradient accumulators start at zero
        (qs_ref, ks_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dq_ref, dk_ref, dv_ref) = refs
    else:
        (qs_ref, ks_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dq_in_ref, dk_in_ref, dv_in_ref, dq_ref, dk_ref, dv_ref) = refs
    G = q_ref.shape[0]
    qi = pl.program_id(1)

    @pl.when(qi == 0)  # seed the VMEM-resident dK/dV accumulators
    def _():
        if init:
            dk_ref[...] = jnp.zeros_like(dk_ref)
            dv_ref[...] = jnp.zeros_like(dv_ref)
        else:
            dk_ref[...] = dk_in_ref[...]
            dv_ref[...] = dv_in_ref[...]

    q0 = qs_ref[0] + qi * blk
    k0 = ks_ref[0]
    q = q_ref[...]
    do = do_ref[...]
    lse = lse_ref[...]
    delta = delta_ref[...]
    row = jax.lax.broadcasted_iota(jnp.int32, (G, blk, blk), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (G, blk, blk), 2)

    def body(ki, dq):
        ks = pl.ds(ki * blk, blk)
        k_blk = k_ref[:, ks, :]
        v_blk = v_ref[:, ks, :]
        s = _bdot(q, k_blk, 2, 2) * scale
        live = (q0 + row) >= (k0 + ki * blk + col)
        if t_valid % blk:
            live &= (ki * blk + col) < t_valid
        s = jnp.where(live, s, NEG_INF)
        p = jnp.exp(s - lse)  # (G, blk, blk) f32; padded-q rows have do == 0
        dp = _bdot(do, v_blk, 2, 2)
        ds = p * (dp - delta)
        pt = jnp.swapaxes(p.astype(q.dtype), 1, 2)
        dst = jnp.swapaxes(ds.astype(q.dtype), 1, 2)
        dk_ref[:, ks, :] += _bdot(dst, q, 2, 1) * scale
        dv_ref[:, ks, :] += _bdot(pt, do, 2, 1)
        return dq + _bdot(ds.astype(q.dtype), k_blk, 2, 1)

    dq = jax.lax.fori_loop(
        0, _live_kv_bound(q0, k0, blk, n_kv), body,
        jnp.zeros((G, blk, q.shape[-1]), jnp.float32),
    )
    if init:
        dq_ref[...] = dq * scale
    else:
        dq_ref[...] = dq_in_ref[...] + dq * scale


def _ring_chunk_bwd(
    q, k, v, do, lse, delta, dq, dk, dv, q_start, k_start, t_valid, scale,
    interpret=None, vma=None,
):
    """One ring hop of the flash-style backward: adds this hop's
    contributions onto the local dQ and the visiting chunk's traveling
    dK/dV. q/k/v/do: (BH, Tp, D) matmul dtype; lse/delta: (BH, Tp) f32;
    dq/dk/dv: (BH, Tp, D) f32 accumulators (None on the first hop:
    the init variant seeds them in-kernel, saving their HBM read)."""
    if interpret is None:
        interpret = not _on_tpu()
    BH, Tp, D = q.shape
    blk = _pick_chunk_blk(t_valid)[0]
    n_kv = (t_valid + blk - 1) // blk
    G = _vmem_fit_group(BH, Tp, 6.0, 4)
    blkspec = pl.BlockSpec(
        (G, blk, D), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(
        (G, Tp, D), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM
    )
    rowspec = pl.BlockSpec(
        (G, blk, 1), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    scalar = lambda x: jnp.asarray(x, jnp.int32).reshape(1)
    rows = lambda x: x.reshape(BH, Tp, 1)
    init = dq is None
    carry_specs = [] if init else [blkspec, full, full]
    carry_args = [] if init else [dq, dk, dv]
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _ring_chunk_bwd_kernel,
            blk=blk, n_kv=n_kv, t_valid=t_valid, scale=scale, init=init,
        ),
        grid=(BH // G, Tp // blk),
        in_specs=[
            smem, smem, blkspec, full, full, blkspec, rowspec, rowspec,
        ] + carry_specs,
        out_specs=(blkspec, full, full),
        out_shape=(
            _sds((BH, Tp, D), vma),
            _sds((BH, Tp, D), vma),
            _sds((BH, Tp, D), vma),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * BH * Tp * t_valid * D // 2,
            bytes_accessed=10 * 4 * BH * Tp * D,
            transcendentals=BH * Tp * t_valid // 2,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        scalar(q_start), scalar(k_start), q, k, v, do, rows(lse),
        rows(delta), *carry_args,
    )
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def causal_attention(q, k, v, use_pallas=True):
    """Causal multi-head attention: (B, H, T, D) -> (B, H, T, D).

    Softmax(QK^T / sqrt(D), tril-masked) @ V. Pallas flash kernel on TPU
    (bf16 matmuls, f32 accumulation), dense XLA elsewhere.
    """
    return _ca_fwd(q, k, v, use_pallas)[0]


def _dots_dtype():
    # bf16 matmul inputs on the real MXU; exact f32 under interpret mode so
    # CPU tests validate the block algorithm bit-tightly
    return jnp.bfloat16 if _on_tpu() else jnp.float32


def _prep_bhtd(x, Tp, dt):
    """(B, H, T, D) -> (BH, Tp, D) in matmul dtype; T zero-padded only
    (head_dim stays unpadded in HBM; VMEM blocks absorb lane padding)."""
    B, H, T, D = x.shape
    return jnp.pad(
        x.reshape(B * H, T, D).astype(dt), ((0, 0), (0, Tp - T), (0, 0))
    )


def _pallas_call_4d(q, k, v):
    B, H, T, D = q.shape
    mode, blk, Tp = _plan(T)
    dt = _dots_dtype()
    fwd = _flash_forward if mode == 'static' else _flash_forward_streamed
    # padded keys beyond T are only attendable from padded queries (causal),
    # so valid rows are exact
    out, lse = fwd(
        _prep_bhtd(q, Tp, dt), _prep_bhtd(k, Tp, dt), _prep_bhtd(v, Tp, dt),
        scale=1.0 / np.sqrt(D), blk=blk,
    )
    return out[:, :T].reshape(B, H, T, D), (out, lse)


def _ca_fwd(q, k, v, use_pallas):
    if use_pallas:
        out, (o_pad, lse) = _pallas_call_4d(q, k, v)
        # match the XLA path's dtype contract (bf16 in -> bf16 out); the
        # kernel accumulates f32 internally either way
        return out.astype(q.dtype), (q, k, v, o_pad, lse)
    out = xla_causal_attention(q, k, v)
    return out, (q, k, v, None, None)


def _ca_bwd(use_pallas, res, g):
    q, k, v, o_pad, lse = res
    if not use_pallas:
        _, vjp = jax.vjp(xla_causal_attention, q, k, v)
        return vjp(g)
    B, H, T, D = q.shape
    mode, blk, Tp = _plan(T)
    dt = _dots_dtype()
    bwd = _flash_backward if mode == 'static' else _flash_backward_streamed
    dq, dk, dv = bwd(
        _prep_bhtd(q, Tp, dt), _prep_bhtd(k, Tp, dt), _prep_bhtd(v, Tp, dt),
        o_pad, lse, _prep_bhtd(g, Tp, dt), scale=1.0 / np.sqrt(D), blk=blk,
    )
    # custom_vjp contract: cotangents must match the primal avals' dtypes
    unpad = lambda x, p: x[:, :T].reshape(B, H, T, D).astype(p.dtype)
    return unpad(dq, q), unpad(dk, k), unpad(dv, v)


causal_attention.defvjp(_ca_fwd, _ca_bwd)


def decode_step_attention(q1, kv_cache, t, n_head):
    """Single-token attention against a packed T-major KV cache.

    q1: (B, H*D) the current token's query; kv_cache: (T, B, 2, H*D) with
    K at [:, :, 0] and V at [:, :, 1]; t: current index (traced). Attends
    to positions 0..t inclusive; returns (B, H*D).

    Layout rationale (measured on v5e, B=25 T=784 H=4 D=32): T-major makes
    the per-token cache write one contiguous fully-tiled
    dynamic_update_slice, and the H*D last dim keeps lanes full. The
    previous (B, H, T, D) layout padded its D=32 tail 4x in VMEM tiles and
    forced a full padded-buffer copy per update (~33 us each); this layout
    + a bf16 cache cut the 784-step sampling scan 259 -> ~70 ms.
    """
    T, B, _, HD = kv_cache.shape
    D = HD // n_head
    dt = kv_cache.dtype
    kc = kv_cache[:, :, 0].reshape(T, B, n_head, D)
    vc = kv_cache[:, :, 1].reshape(T, B, n_head, D)
    qh = q1.reshape(B, n_head, D).astype(dt)
    s = jnp.einsum(
        'tbhd,bhd->bht', kc, qh, preferred_element_type=jnp.float32
    ) / np.sqrt(D)
    s = jnp.where(jnp.arange(T)[None, None] <= t, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    y = jnp.einsum(
        'bht,tbhd->bhd', p.astype(dt), vc, preferred_element_type=jnp.float32
    )
    return y.reshape(B, HD)


def decode_cache_dtype():
    """KV-cache dtype for sampling: bf16 on TPU (halves cache traffic; the
    training path's attention matmuls are bf16 anyway), f32 elsewhere so
    CPU tests compare the decode chain against the full forward exactly."""
    return jnp.bfloat16 if _on_tpu() else jnp.float32
