"""Model-averaging weights (diagnostics.model_weights): stacking and
pseudo-BMA+ over per-point WAIC/LOO elpds (Yao et al. 2018)."""

import math

import numpy as np
import pytest

from lisp_mcmc_tpu.diagnostics import WAICResult, model_weights


def _fake(pointwise):
    pw = np.asarray(pointwise, np.float64)
    return WAICResult(elpd=float(pw.sum()), p_waic=0.0, lppd=float(pw.sum()),
                      se=0.0, n_points=pw.size, n_samples=100, pointwise=pw)


def test_dominant_model_takes_the_weight():
    rng = np.random.default_rng(0)
    good = _fake(rng.normal(-1.0, 0.1, 200))
    bad = _fake(rng.normal(-3.0, 0.1, 200))
    for method in ("stacking", "pseudo-bma+"):
        w = model_weights([good, bad], method=method)
        assert w.shape == (2,)
        assert w.sum() == pytest.approx(1.0)
        assert w[0] > 0.95, (method, w)


def test_identical_models_split_evenly():
    pw = np.random.default_rng(1).normal(-1.0, 0.5, 150)
    w = model_weights([_fake(pw), _fake(pw.copy())])
    assert w[0] == pytest.approx(0.5, abs=0.05)


def test_stacking_keeps_complementary_models():
    """Each model predicts half the points well: totals favor neither
    decisively, and STACKING keeps both in the mix with interior
    weights — the property exp(total)-proportional weights lack."""
    n = 200
    a = np.where(np.arange(n) < n // 2, -0.5, -4.0)
    b = np.where(np.arange(n) < n // 2, -4.0, -0.5)
    w = model_weights([_fake(a), _fake(b)], method="stacking")
    assert 0.35 < w[0] < 0.65
    # pseudo-BMA+ with equal totals also splits here (symmetry), but
    # tilt model b's good half slightly and stacking still keeps model
    # a for its exclusive coverage while pseudo-BMA+ collapses.
    b2 = b.copy()
    b2[n // 2:] = -0.3
    w_stack = model_weights([_fake(a), _fake(b2)], method="stacking")
    w_bma = model_weights([_fake(a), _fake(b2)], method="pseudo-bma+")
    assert w_stack[0] > 0.25          # a still covers its half
    assert w_bma[0] < w_stack[0]      # BMA concentrates harder


def test_validation():
    pw = np.zeros(10)
    with pytest.raises(ValueError, match=">= 2"):
        model_weights([_fake(pw)])
    with pytest.raises(ValueError, match="different"):
        model_weights([_fake(pw), _fake(np.zeros(11))])
    with pytest.raises(ValueError, match="unknown method"):
        model_weights([_fake(pw), _fake(pw)], method="nope")


def test_evidence_weights_bma():
    """BMA probabilities from log evidences: softmax in log_z, prior
    odds shift them, and anything carrying .log_z is accepted."""
    from types import SimpleNamespace

    from lisp_mcmc_tpu.diagnostics import evidence_weights

    w = evidence_weights([0.0, math.log(3.0)])
    assert w == pytest.approx([0.25, 0.75])
    # Equal evidence + 4:1 prior odds -> 80/20.
    w = evidence_weights([5.0, 5.0], log_prior_odds=[math.log(4.0), 0.0])
    assert w == pytest.approx([0.8, 0.2])
    # Objects with .log_z (Laplace/Nested/SMC/VI results) mix with floats.
    w = evidence_weights([SimpleNamespace(log_z=1.0), 1.0, 1.0])
    assert w == pytest.approx([1 / 3] * 3)
    with pytest.raises(ValueError, match=">= 2"):
        evidence_weights([1.0])
    with pytest.raises(ValueError, match="non-finite"):
        evidence_weights([1.0, float("nan")])
    with pytest.raises(ValueError, match="log_prior_odds"):
        evidence_weights([1.0, 2.0], log_prior_odds=[0.0])
