"""Eval metrics, fully on-device (jnp).

The reference computes FID on CPU with scipy fractional_matrix_power
(gms/common.py:267-288) and a k-NN precision/recall manifold estimate with
torch.cdist (gms/common.py:291-319). Both are rebuilt here as jitted jnp:
the matrix sqrt of the covariance product uses the symmetric-PSD trick
  trace(sqrtm(A @ B)) = trace(sqrtm(B^1/2 A B^1/2))
so everything reduces to eigh, which XLA runs on-device.
"""

import jax
import jax.numpy as jnp


def _psd_sqrtm(a):
    """Symmetric PSD matrix square root via eigendecomposition."""
    w, v = jnp.linalg.eigh(a)
    w = jnp.clip(w, 0.0, None)
    return (v * jnp.sqrt(w)) @ v.T


def _cov(x):
    xm = x - x.mean(0, keepdims=True)
    return (xm.T @ xm) / (x.shape[0] - 1)


def frechet_distance(x, y, mean_of_sq=False):
    """Frechet distance between gaussians fit to two feature sets (N, D).

    mean_of_sq=True reproduces the reference quirk of using
    np.mean((pmu-tmu)**2) instead of the standard sum
    (gms/common.py:282); mean_of_sq=False is the standard FID formula
    (what ignite.metrics.FID computes, used at gms/main.py:108,134).
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    pmu, tmu = x.mean(0), y.mean(0)
    pcov, tcov = _cov(x), _cov(y)
    sqrt_p = _psd_sqrtm(pcov)
    # trace(sqrtm(pcov @ tcov)) with pcov, tcov PSD
    covmean_tr = jnp.trace(_psd_sqrtm(sqrt_p @ tcov @ sqrt_p))
    diff = pmu - tmu
    mean_term = jnp.mean(diff**2) if mean_of_sq else jnp.sum(diff**2)
    return mean_term + jnp.trace(pcov) + jnp.trace(tcov) - 2.0 * covmean_tr


def compute_fid(x, y):
    """Reference-parity FID (gms/common.py:267-288): mean-of-squares mean
    term, NaN on numerical failure is impossible here (eigh of PSD)."""
    return frechet_distance(x, y, mean_of_sq=True)


def cdist(a, b):
    """Pairwise euclidean distances (N, D) x (M, D) -> (N, M)."""
    a2 = jnp.sum(a**2, -1)[:, None]
    b2 = jnp.sum(b**2, -1)[None, :]
    d2 = a2 + b2 - 2.0 * (a @ b.T)
    return jnp.sqrt(jnp.clip(d2, 0.0, None))


def cross_entropy(logits, labels):
    """Mean softmax cross-entropy with integer labels (F.cross_entropy
    parity; reference usage gms/main.py:122)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def precision_recall_f1(real, gen, k=3):
    """k-NN manifold precision/recall/F1 (arXiv:1904.06991), matching the
    reference semantics (gms/common.py:291-319): radii are the distance to
    the (k+1)-th nearest neighbor within a set (self included)."""

    def _manifold_estimate(set_a, set_b):
        d = cdist(set_a, set_a)
        # k+1 smallest including self-distance 0 -> radius = k-th neighbor
        radii = -jax.lax.top_k(-d, k + 1)[0][..., -1:]
        d2 = cdist(set_a, set_b)
        return jnp.mean(jnp.any(d2 < radii, axis=0).astype(jnp.float32))

    precision = _manifold_estimate(real, gen)
    recall = _manifold_estimate(gen, real)
    # conscious fix of a reference bug (gms/common.py:317-319): there
    # precision == recall == 0 (e.g. an untrained model) yields f1 = NaN;
    # here it is defined as 0.
    denom = precision + recall
    f1 = jnp.where(
        denom > 0, 2 * (precision * recall) / jnp.maximum(denom, 1e-12), 0.0
    )
    return {'precision': precision, 'recall': recall, 'f1': f1}
