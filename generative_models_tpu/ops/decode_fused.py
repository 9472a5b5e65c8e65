"""Fused transformer decode-step kernels.

The KV-cached sampling scan (models/pixel_transformer.py) is dependent-op
latency-bound: at (B=25, C=128, T=784) each of the ~30 XLA ops in a decode
step costs ~3 us of fixed latency, so the 784-step chain ran at ~88 us/step
(69 ms per 25-sample grid) with the MXU essentially idle. These kernels
collapse a whole transformer Block step — pre-LN, fused QKV, attention over
the prefix cache, out-proj, residual, pre-LN, MLP, residual — into ONE
pallas_call per layer, plus `ln_matmul` for the final LN+head, so a 2-layer
step is ~8 ops instead of ~30.

Design notes:
  * the K/V caches are passed as separate (T, B, H*D) arrays (the packed
    (T, B, 2, H*D) layout would tile-pad its size-2 sublane dim 4x in
    VMEM); the kernel READS the prefix rows < t and returns this token's
    (k_t, v_t) for a cheap external dynamic_update_slice — pulling the
    update inside would force a full cache write-back per call.
  * the current token attends to itself via an explicit self-term joined
    into the prefix softmax (the cache doesn't contain row t yet).
  * matmul inputs are bf16 on the real MXU (f32 accumulation), exact f32
    under interpret mode — same policy as ops/attention.py — and the whole
    per-head score/weight math runs f32.

Reference behavior being accelerated: gms/autoregs/pixel_transformer.py:59-71
(which re-runs the FULL transformer per token, no cache at all).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from generative_models_tpu.ops.common import on_tpu as _on_tpu

NEG_INF = -1e30


def _ln(x, scale, bias, eps=1e-6):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(x - m), axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * scale + bias


def _fused_layer_kernel(
    t_ref, x_ref, kc_ref, vc_ref,
    ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    xo_ref, kt_ref, vt_ref, *, n_head, dt,
):
    x = x_ref[:]  # (B, C) f32
    B, C = x.shape
    T = kc_ref.shape[0]
    D = C // n_head
    t = t_ref[0]

    # --- pre-LN + fused QKV ---
    h = _ln(x, ln1s_ref[:], ln1b_ref[:])
    qkv = (
        jnp.dot(h.astype(dt), wqkv_ref[:].astype(dt),
                preferred_element_type=jnp.float32)
        + bqkv_ref[:]
    )
    q, k_t, v_t = qkv[:, :C], qkv[:, C : 2 * C], qkv[:, 2 * C :]
    kt_ref[:] = k_t.astype(kt_ref.dtype)
    vt_ref[:] = v_t.astype(vt_ref.dtype)

    # --- attention over the prefix cache (< t) + explicit self-term ---
    # Per-head math via lane MASKS over the full (T, B, C) layout: a
    # head-sliced or (.., H, D)-shaped tensor would tile-pad its D=32 (or
    # H=4) minor dim 4-8x in VMEM; masked full-width reductions keep every
    # intermediate at its natural (T, B, C) / (T, B) tiling.
    qs = q / np.sqrt(D)
    weighted = kc_ref[:].astype(jnp.float32) * qs[None]  # (T, B, C)
    w_self = k_t * qs  # (B, C)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (T, B), 0) < t
    )  # prefix rows
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
    vc = vc_ref[:].astype(jnp.float32)
    p_acc = jnp.zeros((T, B, C), jnp.float32)  # per-head weights, fanned
    self_acc = jnp.zeros((B, C), jnp.float32)
    for h in range(n_head):
        mask_h = ((lane // D) == h).astype(jnp.float32)  # (1, 1, C)
        s_h = jnp.sum(weighted * mask_h, axis=-1)  # (T, B)
        s_h = jnp.where(valid, s_h, NEG_INF)
        s_self_h = jnp.sum(w_self * mask_h[0], axis=-1)  # (B,)
        m_h = jnp.maximum(jnp.max(s_h, axis=0), s_self_h)  # (B,)
        p_h = jnp.where(valid, jnp.exp(s_h - m_h[None]), 0.0)  # (T, B)
        p_self_h = jnp.exp(s_self_h - m_h)  # (B,)
        denom_h = jnp.sum(p_h, axis=0) + p_self_h
        p_acc = p_acc + (p_h / denom_h[None])[:, :, None] * mask_h
        self_acc = self_acc + (p_self_h / denom_h)[:, None] * mask_h[0]
    y = jnp.sum(p_acc * vc, axis=0) + self_acc * v_t

    # --- out-proj + residual + pre-LN MLP + residual ---
    h1 = x + (
        jnp.dot(y.astype(dt), wproj_ref[:].astype(dt),
                preferred_element_type=jnp.float32)
        + bproj_ref[:]
    )
    g = _ln(h1, ln2s_ref[:], ln2b_ref[:])
    g = (
        jnp.dot(g.astype(dt), wfc1_ref[:].astype(dt),
                preferred_element_type=jnp.float32)
        + bfc1_ref[:]
    )
    g = jax.nn.gelu(g)
    xo_ref[:] = h1 + (
        jnp.dot(g.astype(dt), wfc2_ref[:].astype(dt),
                preferred_element_type=jnp.float32)
        + bfc2_ref[:]
    )


def fused_decode_layer(x, kc, vc, t, lp, n_head, interpret=None):
    """One transformer Block decode step, fused.

    x: (B, C) f32; kc/vc: (T, B, C) prefix caches (rows < t valid);
    t: traced i32 scalar; lp: layer param dict with keys
    ln1_scale, ln1_bias, wqkv (C, 3C), bqkv, wproj, bproj, ln2_scale,
    ln2_bias, wfc1, bfc1, wfc2, bfc2. Returns (x_out (B, C) f32,
    k_t, v_t (B, C) in cache dtype)."""
    if interpret is None:
        interpret = not _on_tpu()
    B, C = x.shape
    T = kc.shape[0]
    dt = jnp.float32 if interpret else jnp.bfloat16
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(_fused_layer_kernel, n_head=n_head, dt=dt)
    row = lambda v: v.reshape(1, -1)  # 1-D params -> (1, N) VMEM rows
    xo, kt, vt = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vec] * 15,
        out_specs=[vec, vec, vec],
        out_shape=[
            jax.ShapeDtypeStruct((B, C), jnp.float32),
            jax.ShapeDtypeStruct((B, C), kc.dtype),
            jax.ShapeDtypeStruct((B, C), vc.dtype),
        ],
        interpret=interpret,
    )(
        jnp.asarray(t, jnp.int32).reshape(1), x, kc, vc,
        row(lp['ln1_scale']), row(lp['ln1_bias']), lp['wqkv'],
        row(lp['bqkv']), lp['wproj'], row(lp['bproj']),
        row(lp['ln2_scale']), row(lp['ln2_bias']), lp['wfc1'],
        row(lp['bfc1']), lp['wfc2'], row(lp['bfc2']),
    )
    return xo, kt, vt


def _ln_matmul_kernel(x_ref, s_ref, b_ref, w_ref, bias_ref, o_ref, *, dt):
    h = _ln(x_ref[:], s_ref[:], b_ref[:])
    o_ref[:] = (
        jnp.dot(h.astype(dt), w_ref[:].astype(dt),
                preferred_element_type=jnp.float32)
        + bias_ref[:]
    )


def ln_matmul(x, scale, bias, w, b, interpret=None):
    """LN(x) @ w + b in one kernel (the final ln_f + head of a decode
    step). x: (B, C); w: (C, N); returns (B, N) f32."""
    if interpret is None:
        interpret = not _on_tpu()
    dt = jnp.float32 if interpret else jnp.bfloat16
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    row = lambda v: v.reshape(1, -1)
    return pl.pallas_call(
        functools.partial(_ln_matmul_kernel, dt=dt),
        in_specs=[vec] * 5,
        out_specs=vec,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], w.shape[1]), jnp.float32),
        interpret=interpret,
    )(x, row(scale), row(bias), w, row(b))
