import jax.numpy as jnp
import numpy as np

from generative_models_tpu.utils.metrics import (
    compute_fid,
    cross_entropy,
    frechet_distance,
    precision_recall_f1,
)


def _sets(seed=0, n=200, d=16, shift=0.0):
    rng = np.random.RandomState(seed)
    a = rng.randn(n, d).astype(np.float32)
    b = rng.randn(n, d).astype(np.float32) + shift
    return jnp.asarray(a), jnp.asarray(b)


def test_fid_zero_for_identical():
    a, _ = _sets()
    assert abs(float(compute_fid(a, a))) < 1e-3


def test_fid_increases_with_shift():
    a, b_near = _sets(shift=0.1)
    _, b_far = _sets(shift=2.0)
    assert float(compute_fid(a, b_far)) > float(compute_fid(a, b_near))


def test_fid_matches_scipy_reference_formula():
    """Cross-check the eigh-based sqrtm against the reference's scipy
    fractional_matrix_power computation (gms/common.py:267-288)."""
    from scipy.linalg import fractional_matrix_power

    a, b = _sets(shift=0.7)
    x, y = np.asarray(a), np.asarray(b)
    pmu, tmu = x.mean(0), y.mean(0)
    pcov = np.cov(x, rowvar=False)
    tcov = np.cov(y, rowvar=False)
    ref = np.mean((pmu - tmu) ** 2) + np.trace(
        pcov + tcov - 2 * fractional_matrix_power(pcov.dot(tcov), 0.5)
    )
    ours = float(compute_fid(a, b))
    np.testing.assert_allclose(ours, ref.real, rtol=1e-3)


def test_standard_fid_uses_sum():
    a, b = _sets(shift=1.0)
    assert float(frechet_distance(a, b, mean_of_sq=False)) > float(
        compute_fid(a, b)
    )


def test_precision_recall_identical_sets():
    a, _ = _sets()
    out = precision_recall_f1(real=a, gen=a)
    assert float(out['precision']) == 1.0
    assert float(out['recall']) == 1.0
    assert float(out['f1']) == 1.0


def test_precision_recall_disjoint_sets():
    a, _ = _sets()
    far = a + 100.0
    out = precision_recall_f1(real=a, gen=far)
    assert float(out['precision']) == 0.0
    assert float(out['recall']) == 0.0
    # conscious fix of the reference's NaN (gms/common.py:317-319): with
    # precision == recall == 0, f1 is defined as 0, not NaN
    assert float(out['f1']) == 0.0


def test_cross_entropy_matches_manual():
    logits = jnp.asarray([[2.0, 0.0, -1.0], [0.0, 3.0, 0.0]])
    labels = jnp.asarray([0, 1])
    expected = -np.mean(
        [
            np.log(np.exp(2.0) / np.exp([2.0, 0.0, -1.0]).sum()),
            np.log(np.exp(3.0) / np.exp([0.0, 3.0, 0.0]).sum()),
        ]
    )
    np.testing.assert_allclose(float(cross_entropy(logits, labels)), expected, rtol=1e-5)
