"""Exact refit-LOO for Pareto-k-flagged points (diagnostics.reloo).

All flagged points' leave-one-out posteriors run as dataset blocks of a
single BatchedFit; the flagged elpd_i are replaced by exact refit values
and their k set to 0.  Anchor: the exact value matches an independent
single refit without the point (within the MC error of log-mean-exp on
an influential point).
"""

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.diagnostics import loo, reloo
from lisp_mcmc_tpu.models import line

X = np.linspace(0, 10, 40)


def _outlier_fit(seed=1):
    rng = np.random.default_rng(0)
    y = 2.0 * X + 1.0 + rng.normal(0, 0.1, 40)
    y[7] += 2.5                       # gross outlier under gaussian lik
    w = mfit.walker_create(function=line, data=(X, y),
                           params={"m": 1.5, "b": 0.5}, data_error=0.1,
                           n_walkers=64, seed=seed, walker_jitter=0.05)
    w.adaptive_steps(6000, auto=None)
    w.burn_steps(len(w) // 2)
    return w, y


def test_reloo_replaces_flagged_with_exact_refit():
    w, y = _outlier_fit()
    r = loo(w)
    flagged = np.where(r.pareto_k > 0.7)[0]
    assert 7 in flagged               # the outlier is influential

    r2 = reloo(w, r, seed=3)
    assert r2.n_bad_k == 0
    assert r2.pareto_k[7] == 0.0
    # unflagged points keep their PSIS estimates bit-for-bit
    keep = np.ones(40, bool)
    keep[flagged] = False
    np.testing.assert_array_equal(r2.pointwise[keep], r.pointwise[keep])
    # exact elpd_7 is BELOW the PSIS estimate (PSIS under-penalizes the
    # point its own k flagged as unreachable)
    assert r2.pointwise[7] < r.pointwise[7]

    # anchor: independent manual refit without point 7
    keep7 = np.arange(40) != 7
    w7 = mfit.walker_create(function=line, data=(X[keep7], y[keep7]),
                            params={"m": 1.5, "b": 0.5}, data_error=0.1,
                            n_walkers=64, seed=5, walker_jitter=0.05)
    w7.adaptive_steps(8000, auto=None)
    w7.burn_steps(len(w7) // 2)
    import jax
    import jax.numpy as jnp

    from lisp_mcmc_tpu.likelihoods import pointwise_log_likelihood
    pos, _ = w7.steps()
    pos = np.asarray(pos)[::10]
    ds = w.terms[0].dataset
    ll = np.asarray(jax.vmap(lambda v: pointwise_log_likelihood(
        w.terms[0].likelihood, line, w.spec.unflatten(v), ds))(
        jnp.asarray(pos, w.dtype)))[:, 7]
    manual = float(np.log(np.mean(np.exp(ll - ll.max()))) + ll.max())
    # log-mean-exp over a 25-sigma point is MC-noisy; 2.5 log-units
    # out of ~330 still separates exact (-327) from PSIS (-314)
    assert r2.pointwise[7] == pytest.approx(manual, abs=2.5)


def test_reloo_no_flags_is_identity():
    rng = np.random.default_rng(2)
    y = 2.0 * X + 1.0 + rng.normal(0, 0.1, 40)
    w = mfit.walker_create(function=line, data=(X, y),
                           params={"m": 1.5, "b": 0.5}, data_error=0.1,
                           n_walkers=64, seed=2, walker_jitter=0.05)
    w.adaptive_steps(5000, auto=None)
    w.burn_steps(len(w) // 2)
    r = loo(w)
    assert r.n_bad_k == 0
    assert reloo(w, r) is r           # nothing to refit


def test_reloo_guards():
    w, _ = _outlier_fit(seed=4)
    r = loo(w)
    with pytest.raises(ValueError, match="misspecified"):
        reloo(w, r, k_threshold=-1.0, max_refits=4)   # flags everything


def test_reloo_refits_non_gaussian_likelihoods_exactly():
    """BatchedFit's custom-likelihood path (r3 session 3) refits robust
    fits under their OWN likelihood — the former Gaussian-only refusal
    is lifted; refits must run and score finitely.  (The remaining
    refusal — a reduction with no per-point form — is pinned in
    test_batched_likelihoods.py.)"""
    rng = np.random.default_rng(5)
    y = 2.0 * X + 1.0 + rng.normal(0, 0.1, 40)
    y[3] += 3.0
    w = mfit.walker_create(function=line, data=(X, y),
                           params={"m": 1.5, "b": 0.5}, data_error=0.1,
                           log_likelihood=mfit.make_student_t_likelihood(4.0),
                           n_walkers=64, seed=5, walker_jitter=0.05)
    w.adaptive_steps(3000, auto=None)
    w.burn_steps(len(w) // 2)
    r = loo(w)
    thresh = min(0.7, float(np.max(r.pareto_k)) - 1e-6)
    rr = reloo(w, r, k_threshold=thresh, n_steps=2000, max_refits=8)
    assert np.isfinite(rr.elpd)
    # refitted points get their k zeroed — at least one must have fired
    assert int(np.sum(rr.pareto_k < r.pareto_k)) >= 1


def test_reloo_threads_data_dependent_prior():
    """The refit prior evaluates against the ORIGINAL dataset (fixer
    semantics, mcmc-fitting.lisp:837-845) — BatchedFit's bare
    prior(p, None) convention would crash priors that read it."""
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    y = 2.0 * X + 1.0 + rng.normal(0, 0.1, 40)
    y[7] += 2.5

    def ds_prior(p, ds):
        # reads the dataset: soft prior keeping the line level near
        # the data mean (harmless, but crashes if ds is None)
        return -1e-6 * (p["b"] - jnp.mean(ds.y)) ** 2

    w = mfit.walker_create(function=line, data=(X, y),
                           params={"m": 1.5, "b": 0.5}, data_error=0.1,
                           log_prior=ds_prior,
                           n_walkers=64, seed=6, walker_jitter=0.05)
    w.adaptive_steps(5000, auto=None)
    w.burn_steps(len(w) // 2)
    r = loo(w)
    r2 = reloo(w, r, k_threshold=0.7, seed=2)
    assert r2.n_bad_k == 0
