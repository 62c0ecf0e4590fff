"""Vectorized expression evaluation: distributions of derived quantities."""

import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.expressions import eval_expression
from lisp_mcmc_tpu.models import line


@pytest.fixture(scope="module")
def fitted():
    x = np.linspace(0.0, 10.0, 50)
    rng = np.random.default_rng(0)
    y = 2.0 * x + 1.0 + 0.1 * rng.standard_normal(50)
    w = mfit.walker_create(
        function=line, data=(x, y), params={"m": 2.0, "b": 1.0},
        data_error=0.1, n_walkers=64, seed=0, walker_jitter=0.05,
    )
    w.adaptive_steps(4000, auto=None)
    return w


def test_scalar_expression_styles_agree():
    p = {"m": 4.0, "b": 2.0}
    assert eval_expression("(/ :m :b)", p) == pytest.approx(2.0)
    assert eval_expression(":m / :b", p) == pytest.approx(2.0)
    assert eval_expression("(max :m :b 3)", p) == pytest.approx(4.0)
    assert eval_expression("(log :m 2)", p) == pytest.approx(2.0)  # log base 2
    assert eval_expression("sqrt(:m)", p) == pytest.approx(2.0)


def test_expression_samples_distribution(fitted):
    samples = mfit.expression_samples(fitted, "(/ :m :b)", take=1000)
    assert samples.ndim == 1 and samples.size > 100
    # the derived ratio concentrates near 2.0 for this fit
    assert np.median(samples) == pytest.approx(2.0, abs=0.3)
    med, lo, hi = mfit.expression_credible_interval(fitted, "(/ :m :b)")
    assert lo < med < hi
    # point evaluation stays consistent with the most-likely params
    point = mfit.walker_with_expression(fitted, "(/ :m :b)")
    assert lo * 0.5 < point < hi * 2.0


def test_adaptive_steps_l_matrix_seed(fitted):
    # the reference's l-matrix kwarg (mcmc-fitting.lisp:862)
    fitted.adaptive_steps(400, auto=None, l_matrix=0.01 * np.eye(2))
    assert np.isfinite(np.asarray(fitted.state.l_matrix)).all()


def test_python_min_max_variadic_not_ufunc_out():
    """min/max in the Python path must be variadic reductions: the raw
    binary ufunc treats a third argument as `out`, silently overwriting
    it on arrays and raising TypeError on scalars (regression)."""
    from lisp_mcmc_tpu.expressions import eval_expression

    assert eval_expression("min(:a, :b, :c)", {"a": 3.0, "b": 1.0, "c": 2.0}) == 1.0
    assert eval_expression("max(:a, :b, :c)", {"a": 3.0, "b": 1.0, "c": 2.0}) == 3.0
    # Array path: the third argument must survive untouched.
    import numpy as np
    from lisp_mcmc_tpu.expressions import _evaluate
    c = np.array([5.0, 5.0])
    out = _evaluate("min(:a, :b, :c)", {"a": np.array([3.0, 0.5]),
                                        "b": np.array([1.0, 2.0]), "c": c})
    np.testing.assert_allclose(out, [1.0, 0.5])
    np.testing.assert_allclose(c, [5.0, 5.0])


def test_sexp_accepts_lisp_double_float_literals():
    """Expressions copied from the reference use the d exponent marker
    (4.4d-5, nv-specific.lisp style)."""
    from lisp_mcmc_tpu.expressions import eval_expression

    assert eval_expression("(/ :a 4.4d-5)", {"a": 4.4e-5}) == 1.0
    assert eval_expression("(* 1D2 2)", {}) == 200.0


def test_hdi_shorter_than_central_on_skewed():
    """On a skewed posterior the HDI is strictly shorter than the
    central interval at the same level, and on a symmetric one they
    coincide; both cover the bulk."""
    import numpy as np
    from lisp_mcmc_tpu.stats import hdi

    rng = np.random.default_rng(0)
    skew = rng.lognormal(0.0, 0.8, 20000)
    lo, hi = hdi(skew, 0.95)
    c_lo, c_hi = np.percentile(skew, [2.5, 97.5])
    assert (hi - lo) < (c_hi - c_lo) * 0.95
    assert lo < np.median(skew) < hi
    sym = rng.normal(0.0, 1.0, 20000)
    s_lo, s_hi = hdi(sym, 0.95)
    assert s_lo == pytest.approx(-1.96, abs=0.1)
    assert s_hi == pytest.approx(1.96, abs=0.1)
    with pytest.raises(ValueError, match="level"):
        hdi(sym, 1.5)


def test_expression_hdi_on_rate():
    """1/tau is right-skewed: expression_hdi returns a valid interval no
    wider than the central one and both contain the median rate."""
    from lisp_mcmc_tpu.models import exponential_decay

    rng = np.random.default_rng(3)
    x = np.linspace(0.0, 6.0, 40)
    y = 2.0 * np.exp(-x / 1.5) + 0.1 + 0.05 * rng.standard_normal(40)
    w = mfit.walker_create(function=exponential_decay, data=(x, y),
                           params={"scale": 1.5, "tau": 2.0, "bg0": 0.2},
                           data_error=0.05, n_walkers=32, seed=0,
                           walker_jitter=0.05)
    w.adaptive_steps(3000, auto=None)
    w.burn_steps(len(w) // 2)
    med_c, lo_c, hi_c = mfit.expression_credible_interval(w, "(/ 1 :tau)")
    med_h, lo_h, hi_h = mfit.expression_hdi(w, "(/ 1 :tau)")
    assert med_h == pytest.approx(med_c)
    assert lo_h < med_h < hi_h
    assert (hi_h - lo_h) <= (hi_c - lo_c) + 1e-12
