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
