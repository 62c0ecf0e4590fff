"""LOO-PIT calibration checks (diagnostics.loo_pit).

Each observed point is scored against its own leave-one-out predictive
CDF via the PSIS weights LOO already computes; a calibrated model gives
Uniform(0,1) PIT values.  Anchors: a calibrated fit passes, an
understated-error fit piles PIT at 0/1 and fails, a biased mean model
fails, the Poisson mid-p variant is calibrated on real count data, and
the student-t CDF matches scipy exactly.
"""

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.data import Dataset
from lisp_mcmc_tpu.diagnostics import LOOPITResult, _ks_uniform, loo_pit
from lisp_mcmc_tpu.likelihoods import (log_likelihood_poisson,
                                       make_student_t_likelihood,
                                       pointwise_cdf)
from lisp_mcmc_tpu.models import line

X = np.linspace(0, 10, 60)


def _fit(y, err, seed=1, likelihood=None, params=None):
    kwargs = {} if likelihood is None else {"log_likelihood": likelihood}
    w = mfit.walker_create(function=line, data=(X, y),
                           params=params or {"m": 1.5, "b": 0.5},
                           data_error=err, n_walkers=64, seed=seed,
                           walker_jitter=0.05, **kwargs)
    w.adaptive_steps(6000, auto=None)
    w.burn_steps(len(w) // 2)
    return w


def test_loo_pit_detects_miscalibration():
    rng = np.random.default_rng(0)
    y = 2.0 * X + 1.0 + rng.normal(0, 0.3, 60)

    ok = loo_pit(_fit(y, 0.3))
    assert isinstance(ok, LOOPITResult)
    assert ok.ok and ok.p_value > 0.1
    assert ok.pit.shape == (60,)

    # overconfident (claimed error 3x too small): symmetric 0/1 pile-up
    over = loo_pit(_fit(y, 0.1))
    assert not over.ok
    assert (over.pit < 0.05).sum() + (over.pit > 0.95).sum() > 12

    # biased mean model (line fitted to a quadratic)
    y2 = 0.2 * X ** 2 + 1.0 + rng.normal(0, 0.3, 60)
    bias = loo_pit(_fit(y2, 0.3))
    assert not bias.ok and bias.ks_stat > over.ks_stat


def test_loo_pit_poisson_mid_p():
    rng = np.random.default_rng(1)
    y = rng.poisson(5.0 + 0.5 * X).astype(float)
    w = _fit(y, None, seed=2, likelihood=log_likelihood_poisson,
             params={"m": 0.4, "b": 4.0})
    r = loo_pit(w)
    assert r.ok
    # mid-p PIT of a discrete model stays strictly inside (0, 1)
    assert r.pit.min() > 0.0 and r.pit.max() < 1.0


def test_student_t_cdf_matches_scipy():
    ss = pytest.importorskip("scipy.stats")
    rng = np.random.default_rng(2)
    y = 2.0 * X[:8] + 1.0 + rng.normal(0, 0.3, 8)
    ds = Dataset.create(X[:8], y, np.full(8, 0.3))
    lt = make_student_t_likelihood(4.0)
    c = np.asarray(pointwise_cdf(lt, line, {"m": 2.0, "b": 1.0}, ds))[:8]
    z = (y - (2.0 * X[:8] + 1.0)) / 0.3
    np.testing.assert_allclose(c, ss.t.cdf(z, 4.0), atol=1e-10)


def test_noise_scale_cdf_uses_fitted_scale():
    from lisp_mcmc_tpu.likelihoods import make_noise_scale_likelihood

    rng = np.random.default_rng(3)
    y = 2.0 * X[:8] + 1.0 + rng.normal(0, 0.6, 8)
    ds = Dataset.create(X[:8], y, np.ones(8))
    lns = make_noise_scale_likelihood()
    c2 = np.asarray(pointwise_cdf(
        lns, line, {"m": 2.0, "b": 1.0, "noise_scale": 2.0}, ds))[:8]
    from scipy.stats import norm
    z = (y - (2.0 * X[:8] + 1.0)) / 2.0
    np.testing.assert_allclose(c2, norm.cdf(z), atol=1e-12)


def test_unrecognized_likelihood_is_an_error():
    rng = np.random.default_rng(4)
    y = 2.0 * X + 1.0 + rng.normal(0, 0.3, 60)

    def custom(fn, params, dataset):
        import jax.numpy as jnp
        mu = fn(dataset.x, params)
        return -0.5 * jnp.sum(((dataset.y - mu) * dataset.inv_sigma) ** 2)

    w = _fit(y, 0.3, likelihood=custom)
    with pytest.raises(ValueError, match="pointwise"):
        loo_pit(w)


def test_loo_pit_plot(tmp_path):
    rng = np.random.default_rng(6)
    y = 2.0 * X + 1.0 + rng.normal(0, 0.3, 60)
    r = loo_pit(_fit(y, 0.3, seed=7))
    from lisp_mcmc_tpu import plotting

    path = str(tmp_path / "loo_pit.png")
    plotting.loo_pit_plot(r, filename=path)
    import os
    assert os.path.getsize(path) > 0


def test_ks_uniform_sanity():
    rng = np.random.default_rng(5)
    d, p = _ks_uniform(rng.uniform(size=500))
    assert p > 0.05
    d2, p2 = _ks_uniform(rng.beta(4.0, 4.0, size=500))   # humped at 0.5
    assert p2 < 1e-4 and d2 > d
