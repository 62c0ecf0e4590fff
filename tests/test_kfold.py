"""Exact K-fold cross-validation (diagnostics.kfold).

All K fold-complement refits run as one BatchedFit; each held-out point
is scored by the posterior that never saw it.  Anchor: on a
well-specified fit, kfold elpd agrees with PSIS-LOO within error bars.
"""

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.diagnostics import (KFoldResult, kfold, loo,
                                       model_weights)
from lisp_mcmc_tpu.models import line

X = np.linspace(0, 10, 40)


@pytest.fixture(scope="module")
def linefit():
    rng = np.random.default_rng(0)
    y = 2.0 * X + 1.0 + rng.normal(0, 0.1, 40)
    w = mfit.walker_create(function=line, data=(X, y),
                           params={"m": 1.5, "b": 0.5}, data_error=0.1,
                           n_walkers=64, seed=1, walker_jitter=0.05)
    w.adaptive_steps(6000, auto=None)
    w.burn_steps(len(w) // 2)
    return w


def test_kfold_matches_loo_when_loo_is_reliable(linefit):
    r_loo = loo(linefit)
    assert r_loo.n_bad_k == 0
    r_kf = kfold(linefit, k=8, seed=2, n_steps=6000)
    assert isinstance(r_kf, KFoldResult)
    assert r_kf.n_points == 40 and r_kf.k == 8
    # exact CV and PSIS-LOO estimate the same quantity
    assert r_kf.elpd == pytest.approx(r_loo.elpd, abs=2.0 * max(r_kf.se, 1.0))
    # every point scored exactly once
    assert np.all(np.isfinite(r_kf.pointwise))
    counts = np.bincount(r_kf.folds, minlength=8)
    assert counts.min() >= 4 and counts.max() <= 6   # balanced partition


def test_kfold_explicit_folds_and_model_weights(linefit):
    folds = np.arange(40) % 4           # leave-one-segment-out style
    r = kfold(linefit, folds=folds, seed=0, n_steps=5000)
    assert r.k == 4
    np.testing.assert_array_equal(r.folds, folds)
    # duck-compatibility: KFoldResult joins model_weights with LOO results
    r_loo = loo(linefit)
    w = model_weights([r, r_loo])
    assert w.shape == (2,) and abs(w.sum() - 1.0) < 1e-9


def test_kfold_validations(linefit):
    with pytest.raises(ValueError, match="2 <= k"):
        kfold(linefit, k=1)
    with pytest.raises(ValueError, match="shape"):
        kfold(linefit, folds=np.zeros(7, np.int64))
    with pytest.raises(ValueError, match="cover"):
        kfold(linefit, folds=np.full(40, 2, np.int64))
