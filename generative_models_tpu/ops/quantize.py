"""Pallas VQ codebook nearest-neighbor kernel.

TPU-native replacement for the reference VectorQuantizer distance search
(gms/vaes/vqvae.py:137-146): the -2*z@e^T + |e|^2 scores are computed on the
MXU and reduced to a one-hot assignment in VMEM, so the (N, K) distance
matrix never reaches HBM. The straight-through estimator and the codebook /
commitment losses stay in jnp on top of the returned one-hot (which is a
constant w.r.t. gradients, exactly like the reference's scatter_ output).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from generative_models_tpu.ops.common import on_tpu as _on_tpu
from generative_models_tpu.ops.common import round_up as _round_up


def _vq_kernel(z_ref, e_ref, oh_ref, *, k_valid):
    """One (bn, D) block of z against the full codebook -> one-hot (bn, Kp)."""
    z = z_ref[:]  # (bn, D)
    e = e_ref[:]  # (Kp, D)
    # |z - e|^2 argmin == argmin(-2 z e^T + |e|^2)
    scores = -2.0 * jnp.dot(z, e.T, preferred_element_type=jnp.float32)
    scores = scores + jnp.sum(e * e, axis=-1)[None, :]
    Kp = scores.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < k_valid, scores, jnp.inf)
    idx = jnp.argmin(scores, axis=-1)  # (bn,)
    oh_ref[:] = (col == idx[:, None]).astype(jnp.float32)


_VMEM_BUDGET = 14 * 2**20  # leave slack under the ~16 MB scoped VMEM limit


def _pick_bn(N, Kp, Dp):
    """Largest N-block size whose VMEM working set fits: the (bn, Kp) one-hot
    out block and (bn, Dp) z block are pipelined (double-buffered, hence the
    2x), the (Kp, Dp) codebook is resident. None = not even bn=8 fits (fall
    back to XLA). Regression guard: at (Kp=4096, Dp=128) the old fixed
    bn=1024 allocated a 16 MB out block and the kernel VMEM-OOM'd."""
    bn = min(_round_up(N, 8), 1024)
    while bn >= 8:
        if 4 * (2 * bn * (Kp + Dp) + Kp * Dp) <= _VMEM_BUDGET:
            return bn
        # keep the sublane dim 8-aligned while shrinking (Mosaic rejects
        # f32 blocks whose second-minor dim is not a multiple of 8)
        bn = _round_up(bn // 2, 8) if bn > 8 else 0
    return None


def vq_one_hot(z_flat, codebook, use_pallas=True, interpret=None):
    """z_flat: (N, D); codebook: (K, D) -> one-hot assignments (N, K) f32.

    Non-differentiable by construction (argmin); callers build z_q as
    one_hot @ codebook to route gradients into the codebook.
    """
    if not use_pallas:
        d = (
            jnp.sum(z_flat**2, axis=1, keepdims=True)
            + jnp.sum(codebook**2, axis=1)[None, :]
            - 2.0 * z_flat @ codebook.T
        )
        idx = jnp.argmin(d, axis=1)
        return jax.nn.one_hot(idx, codebook.shape[0], dtype=z_flat.dtype)
    if interpret is None:
        interpret = not _on_tpu()
    # the argmin assignment is piecewise-constant: stop gradients at the
    # kernel INPUTS so reverse-mode AD never tries to linearize pallas_call
    z_flat = jax.lax.stop_gradient(z_flat)
    codebook = jax.lax.stop_gradient(codebook)
    N, D = z_flat.shape
    K = codebook.shape[0]
    Kp, Dp = _round_up(K, 128), _round_up(D, 128)
    bn = _pick_bn(N, Kp, Dp)
    # measured shape gate (docs/PERF.md, v5e): the kernel wins while blocks
    # stay large (zoo N=3136/K=64: 254 vs 266 us; N=12544/K=1024: 301 vs
    # 306 us), but at huge score matrices (N=50176/K=4096: 30.2 vs 25.1 ms)
    # XLA's matmul+argmin pipeline beats the VMEM-shrunken kernel — both
    # pay the (N, Kp) one-hot HBM write the API contract requires
    if bn is None or N * Kp > 64 * 2**20:
        return vq_one_hot(z_flat, codebook, use_pallas=False)
    Np = _round_up(N, bn)
    zp = jnp.pad(z_flat.astype(jnp.float32), ((0, Np - N), (0, Dp - D)))
    ep = jnp.pad(codebook.astype(jnp.float32), ((0, Kp - K), (0, Dp - D)))
    kernel = functools.partial(_vq_kernel, k_valid=K)
    oh = pl.pallas_call(
        kernel,
        grid=(Np // bn,),
        in_specs=[
            pl.BlockSpec((bn, Dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, Dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, Kp), jnp.float32),
        interpret=interpret,
    )(zp, ep)
    oh = jax.lax.stop_gradient(oh[:N, :K])
    return oh.astype(z_flat.dtype)


def vq_quantize(z, codebook, beta, use_pallas=True):
    """Full VQ forward on an NHWC latent grid z: (B, h, w, D).

    Returns (embed_loss, z_q_straight_through, perplexity, idxs(B,h,w),
    one_hot(B*h*w, K)) with the exact reference loss form
    (gms/vaes/vqvae.py:148-157): mean((sg[z_q]-z)^2) + beta*mean((z_q-sg[z])^2).
    """
    B, h, w, D = z.shape
    z_flat = z.reshape(-1, D)
    one_hot = vq_one_hot(z_flat, codebook, use_pallas)
    z_q = (one_hot @ codebook).reshape(z.shape)
    loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + beta * jnp.mean(
        (z_q - jax.lax.stop_gradient(z)) ** 2
    )
    # straight-through: forward z_q, gradient to z
    z_q_st = z + jax.lax.stop_gradient(z_q - z)
    e_mean = jnp.mean(one_hot, axis=0)
    perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))
    idxs = jnp.argmax(one_hot, axis=-1).reshape(B, h, w)
    return loss, z_q_st, perplexity, idxs, one_hot
