"""Pallas masked-matmul kernel.

TPU-native replacement for the reference's MaskedLinear
(gms/autoregs/made.py:84-95), which materializes mask*W on every forward.
Here the mask multiply is fused into the matmul tile loop in VMEM, so the
masked weight never hits HBM; the custom VJP applies the mask to the weight
gradient the same way (mathematically identical to autodiff through mask*W).

Falls back to pure-XLA (still fused by XLA in practice) off-TPU; the Pallas
path runs in interpret mode in CPU tests.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from generative_models_tpu.ops.common import on_tpu as _on_tpu
from generative_models_tpu.ops.common import round_up as _round_up


def _masked_matmul_kernel(x_ref, w_ref, m_ref, o_ref):
    """o += x @ (w * m), one (bm, bn, bk) tile; K is the innermost grid
    axis, accumulated into the revisited output tile."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    w = w_ref[:] * m_ref[:]
    o_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)


def _mask_out_matmul_kernel(a_ref, b_ref, m_ref, o_ref, *, n_k):
    """o = m * (a @ b) — used for the masked weight gradient; the mask
    multiply happens once, after the last K step."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _():
        o_ref[:] = o_ref[:] * m_ref[:]


def _pallas_masked_matmul(x, w, mask, *, mask_on_output=False, interpret=None):
    """x: (B, K), w: (K, N), mask matching w (or the output if
    mask_on_output). Returns (B, N) f32. Blocked over all three matmul
    dims so VMEM stays bounded at any shape."""
    B, K = x.shape
    K2, N = w.shape
    assert K == K2
    if interpret is None:
        interpret = not _on_tpu()
    # bf16 matmul inputs on the real MXU (f32 accumulation via
    # preferred_element_type), exact f32 under interpret mode so CPU tests
    # validate the block algorithm bit-tightly — same policy as the flash
    # attention kernels' _dots_dtype
    dt = jnp.bfloat16 if _on_tpu() else jnp.float32
    bm = min(_round_up(B, 8), 256)
    bn = min(_round_up(N, 128), 512)
    bk = min(_round_up(K, 128), 512)
    Bp, Kp, Np = _round_up(B, bm), _round_up(K, bk), _round_up(N, bn)
    n_k = Kp // bk
    xp = jnp.pad(x, ((0, Bp - B), (0, Kp - K)))
    wp = jnp.pad(w, ((0, Kp - K), (0, Np - N)))
    if mask_on_output:
        mp = jnp.pad(mask, ((0, Bp - B), (0, Np - N)))
        kernel = functools.partial(_mask_out_matmul_kernel, n_k=n_k)
        m_spec = pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        )
    else:
        mp = jnp.pad(mask, ((0, Kp - K), (0, Np - N)))
        kernel = _masked_matmul_kernel
        m_spec = pl.BlockSpec(
            (bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
        )
    out = pl.pallas_call(
        kernel,
        grid=(Bp // bm, Np // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            m_spec,
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Kp * Np,
            bytes_accessed=dt.dtype.itemsize * (Bp * Kp + 2 * Kp * Np)
            + 4 * Bp * Np,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp.astype(dt), wp.astype(dt), mp.astype(dt))
    return out[:B, :N]


def prefer_pallas(K, N):
    """Shape gate: below ~8 MB of masked weight, XLA's fold-the-mask matmul
    measured faster than the kernel (0.83 vs 1.13 ms for MADE's grad at
    784x1024); above it, materializing mask*W per step is the bottleneck
    the kernel exists to remove."""
    return K * N * 4 > 8 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def masked_dense(x, w, b, mask, use_pallas=True):
    """y = x @ (w * mask) + b with the mask fused into the kernel.

    x: (..., K); w: (K, N); b: (N,) or None; mask: (K, N) in {0,1}.
    """
    return _masked_dense_fwd(x, w, b, mask, use_pallas)[0]


def _apply(x2d, w, mask, use_pallas):
    if use_pallas:
        # match the XLA path's dtype contract: x @ (w * mask) promotes over
        # all three operands (MADE ships f32 masks), and the kernel
        # accumulates f32 internally either way
        return _pallas_masked_matmul(x2d, w, mask).astype(
            jnp.result_type(x2d, w, mask)
        )
    return x2d @ (w * mask)


def _masked_dense_fwd(x, w, b, mask, use_pallas):
    batch_shape = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    y = _apply(x2d, w, mask, use_pallas)
    if b is not None:
        y = y + b
    # b rides the residuals (it's (N,), tiny) so bwd can match its dtype
    res = (x2d, w, mask, b, batch_shape)
    return y.reshape(*batch_shape, w.shape[-1]), res


def _masked_dense_bwd(use_pallas, res, g):
    x2d, w, mask, b, batch_shape = res
    g2d = g.reshape(-1, g.shape[-1])
    if use_pallas:
        dx = _pallas_masked_matmul(g2d, w.T, mask.T)
        dw = _pallas_masked_matmul(x2d.T, g2d, mask, mask_on_output=True)
    else:
        dx = g2d @ (w * mask).T
        dw = mask * (x2d.T @ g2d)
    # custom_vjp contract: cotangents must match the primal avals' dtypes
    dx = dx.astype(x2d.dtype)
    dw = dw.astype(w.dtype)
    db = g2d.sum(0).astype(b.dtype) if b is not None else None
    return dx.reshape(*batch_shape, x2d.shape[-1]), dw, db, None


masked_dense.defvjp(_masked_dense_fwd, _masked_dense_bwd)
