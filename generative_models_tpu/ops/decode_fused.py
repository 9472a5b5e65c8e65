"""Fused transformer decode-step kernels.

The KV-cached sampling scan (models/pixel_transformer.py) is dependent-op
latency-bound: at (B=25, C=128, T=784) each XLA op in a decode step costs
~3 us of fixed latency regardless of its size, so the ~30-op 784-step chain
ran at ~88 us/step (69 ms per 25-sample grid) with the MXU nearly idle.
These kernels collapse the per-layer DENSE chains into one pallas_call
each:

  ln_matmul   — pre-LN + matmul (+bias): the LN1+fused-QKV entry of a Block
                step and the final ln_f+head, each one kernel instead of
                3-4 ops;
  block_tail  — attn out-proj + residual + pre-LN MLP (fc1/gelu/fc2) +
                residual: one kernel instead of ~8 ops.

Attention itself stays the XLA einsum path (ops/attention.py
decode_step_attention): its batched-per-head contraction maps natively
onto the MXU via dot_general batching, which Mosaic cannot express without
either H-times-redundant VPU masking or (T, B, C)-sized f32 intermediates
that blow the ~16 MB VMEM budget.

Everything here is (B, C)-sized, so VMEM pressure is nil. Matmul inputs are
bf16 on the real MXU (f32 accumulation), exact f32 under interpret mode —
the same policy as ops/attention.py.

Reference behavior being accelerated: gms/autoregs/pixel_transformer.py:59-71
(which re-runs the FULL transformer per token, with no cache at all).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from generative_models_tpu.ops.common import on_tpu as _on_tpu


def _ln(x, scale, bias, eps=1e-6):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(x - m), axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * scale + bias


def _ln_matmul_kernel(x_ref, s_ref, b_ref, w_ref, bias_ref, o_ref, *, dt):
    h = _ln(x_ref[:], s_ref[:], b_ref[:])
    o_ref[:] = (
        jnp.dot(h.astype(dt), w_ref[:].astype(dt),
                preferred_element_type=jnp.float32)
        + bias_ref[:]
    )


def ln_matmul(x, scale, bias, w, b, interpret=None):
    """LN(x) @ w + b in one kernel. x: (B, C); w: (C, N) -> (B, N) f32."""
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


def _block_tail_kernel(
    x_ref, y_ref, wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
    wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, o_ref, *, dt,
):
    x = x_ref[:]
    h1 = x + (
        jnp.dot(y_ref[:].astype(dt), wproj_ref[:].astype(dt),
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
    o_ref[:] = h1 + (
        jnp.dot(g.astype(dt), wfc2_ref[:].astype(dt),
                preferred_element_type=jnp.float32)
        + bfc2_ref[:]
    )


def block_tail(x, y, lp, interpret=None):
    """x + proj(y), then + MLP(LN2(.)) — the whole post-attention half of a
    Block step in one kernel. x, y: (B, C); lp: param dict with wproj,
    bproj, ln2_scale, ln2_bias, wfc1, bfc1, wfc2, bfc2. Returns (B, C) f32."""
    if interpret is None:
        interpret = not _on_tpu()
    dt = jnp.float32 if interpret else jnp.bfloat16
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    row = lambda v: v.reshape(1, -1)
    return pl.pallas_call(
        functools.partial(_block_tail_kernel, dt=dt),
        in_specs=[vec] * 10,
        out_specs=vec,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        interpret=interpret,
    )(
        x, y, lp['wproj'], row(lp['bproj']), row(lp['ln2_scale']),
        row(lp['ln2_bias']), lp['wfc1'], row(lp['bfc1']), lp['wfc2'],
        row(lp['bfc2']),
    )
