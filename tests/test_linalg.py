"""L2 linear algebra vs the reference's golden fixtures.

The reference embeds worked covariance/Cholesky examples with expected
numeric matrices in comments (mcmc-fitting.lisp:729-751) — the closest
thing it has to unit tests.  Those exact numbers are asserted here.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lisp_mcmc_tpu.ops.linalg import (
    cholesky_clamped,
    covariant_sample,
    diagonal_covariance,
    haario_scale,
    moments_covariance,
    sample_covariance,
)

# example-lplist (mcmc-fitting.lisp:729-733)
GOLDEN_SAMPLES = np.array(
    [
        [90.0, 60.0, 90.0],
        [90.0, 90.0, 30.0],
        [60.0, 60.0, 60.0],
        [60.0, 60.0, 90.0],
        [30.0, 30.0, 30.0],
    ]
)
# expected covariance (mcmc-fitting.lisp:745)
GOLDEN_COV = np.array(
    [
        [504.0, 360.0, 180.0],
        [360.0, 360.0, 0.0],
        [180.0, 0.0, 720.0],
    ]
)
# expected l-matrix (mcmc-fitting.lisp:749-751)
GOLDEN_L = np.array(
    [
        [22.44994432064365, 0.0, 0.0],
        [16.035674514745462, 10.141851056742201, 0.0],
        [8.017837257372731, -12.677313820927745, 22.248595461286993],
    ]
)


def test_covariance_golden():
    cov = sample_covariance(jnp.asarray(GOLDEN_SAMPLES))
    np.testing.assert_allclose(np.asarray(cov), GOLDEN_COV, rtol=1e-12)


def test_cholesky_golden():
    L, ok = cholesky_clamped(jnp.asarray(GOLDEN_COV))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(L), GOLDEN_L, rtol=1e-12)


def test_cholesky_semidefinite_clamps():
    # Rank-deficient: reference clamps sqrt(max 0 .) (mcmc-fitting.lisp:596).
    a = np.array([[1.0, 1.0], [1.0, 1.0]])
    L, ok = cholesky_clamped(jnp.asarray(a))
    assert np.isfinite(np.asarray(L)).all()
    # Second pivot hits exactly zero -> flagged not-ok for the caller.
    assert not bool(ok)


def test_cholesky_batched():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(4, 3, 3))
    spd = np.einsum("bij,bkj->bik", m, m) + 3 * np.eye(3)
    L, ok = cholesky_clamped(jnp.asarray(spd))
    assert ok.shape == (4,) and bool(ok.all())
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", np.asarray(L), np.asarray(L)), spd, rtol=1e-10
    )


def test_moments_covariance_matches_direct():
    rng = np.random.default_rng(1)
    samples = rng.normal(size=(100, 4))
    m_sum = jnp.asarray(samples.sum(0))
    m_outer = jnp.asarray(np.einsum("mi,mj->ij", samples, samples))
    cov = moments_covariance(m_sum, m_outer, jnp.asarray(100.0))
    np.testing.assert_allclose(
        np.asarray(cov), np.asarray(sample_covariance(jnp.asarray(samples))), rtol=1e-10
    )


def test_weighted_covariance_masks_rows():
    rng = np.random.default_rng(2)
    samples = rng.normal(size=(50, 3))
    w = np.zeros(50)
    w[:30] = 1.0
    cov = sample_covariance(jnp.asarray(samples), jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(cov),
        np.asarray(sample_covariance(jnp.asarray(samples[:30]))),
        rtol=1e-10,
    )


def test_diagonal_covariance():
    d = diagonal_covariance(jnp.asarray([1.0, -2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(d), np.diag([1.0, -2.0, 3.0]))


def test_covariant_sample_distribution():
    import jax

    L = jnp.asarray([[2.0, 0.0], [1.0, 0.5]])
    mean = jnp.zeros((20000, 2))
    out = covariant_sample(jax.random.PRNGKey(0), mean, L)
    emp = np.cov(np.asarray(out).T, bias=True)
    np.testing.assert_allclose(emp, np.asarray(L @ L.T), atol=0.1)


def test_haario_scale():
    assert haario_scale(6) == pytest.approx(2.38**2 / 6)


def test_sample_covariance_fractional_weights():
    """General weights carry ONE factor of w (sum w outer / sum w);
    weighting both einsum operands silently squared them (regression:
    uniform w=0.5 halved the covariance)."""
    rng = np.random.default_rng(0)
    s = rng.standard_normal((200, 3))
    full = np.asarray(sample_covariance(jnp.asarray(s)))
    half = np.asarray(sample_covariance(jnp.asarray(s),
                                        weights=jnp.full(200, 0.5)))
    np.testing.assert_allclose(half, full, rtol=1e-12)


def test_split_rhat_frozen_ensemble_not_converged():
    """Chains constant in time (zero within-chain variance) must read as
    NOT converged (inf), not sqrt(b/n) in raw parameter units."""
    from lisp_mcmc_tpu.ops.reductions import split_rhat

    rng = np.random.default_rng(1)
    frozen = np.repeat(rng.standard_normal((1, 16)), 12, axis=0)
    assert float(split_rhat(jnp.asarray(frozen))) == float("inf")
