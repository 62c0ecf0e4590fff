"""L0/L1 substrate: params, data cleaning, likelihoods, priors, stats, io."""

import jax.numpy as jnp
import numpy as np
import pytest

from lisp_mcmc_tpu.data import Dataset, clean_data, clean_data_error, create_walker_data
from lisp_mcmc_tpu.expressions import eval_expression
from lisp_mcmc_tpu.likelihoods import (
    create_log_likelihood_function,
    log_factorial,
    log_likelihood_normal,
    log_likelihood_normal_cutoff,
    log_likelihood_poisson,
    log_normal,
    log_poisson,
    resolve_likelihood,
)
from lisp_mcmc_tpu.params import ParamSpec, normalize_params, scale_params
from lisp_mcmc_tpu.priors import (
    bound_penalty,
    constraint_penalty,
    log_prior_flat,
    make_bounds_prior,
    prior_bounds,
    resolve_prior,
)
from lisp_mcmc_tpu.stats import (
    credible_interval_95,
    iqr,
    make_histogram,
    std_from_84th_percentile,
)


# ------------------------------------------------------------------- params
def test_param_spec_roundtrip():
    spec, vec = normalize_params({"scale": 1e-5, "x0": 2200.0, "mix": 0.9})
    assert spec.keys == ("scale", "x0", "mix")
    d = spec.unflatten(vec)
    assert float(d["x0"]) == 2200.0
    np.testing.assert_allclose(np.asarray(spec.flatten(d)), np.asarray(vec))


def test_param_spec_accepts_lisp_keywords():
    spec, vec = normalize_params({":scale": 2.0, ":x0": 3.0})
    assert spec.keys == ("scale", "x0")
    assert spec.index(":x0") == 1


def test_param_spec_array_style():
    # The reference's single-list/vector/array styles (1078-1088).
    spec, vec = normalize_params([1.0, 2.0, 3.0])
    assert spec.keys == ("p0", "p1", "p2")
    np.testing.assert_allclose(np.asarray(vec), [1.0, 2.0, 3.0])


def test_scale_params():
    assert scale_params(2.0, {"a": 3.0})["a"] == 6.0


def test_batched_unflatten():
    spec = ParamSpec(("a", "b"))
    batch = jnp.arange(6.0).reshape(3, 2)
    d = spec.unflatten(batch)
    np.testing.assert_allclose(np.asarray(d["b"]), [1.0, 3.0, 5.0])


# --------------------------------------------------------------------- data
def test_clean_data_single_dataset_wrapped():
    out = clean_data(([1.0, 2.0], [3.0, 4.0]), 1)
    assert len(out) == 1
    np.testing.assert_allclose(out[0][0], [1.0, 2.0])


def test_clean_data_depth_error():
    with pytest.raises(ValueError, match="insufficient depth"):
        clean_data([1.0, 2.0], 1)


def test_clean_data_count_mismatch():
    with pytest.raises(ValueError, match="insufficient number of datasets"):
        clean_data(([1.0], [2.0]), 2)


def test_clean_data_error_scalar_broadcast():
    cleaned = clean_data(([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]), 1)
    errs = clean_data_error(0.5, cleaned)
    np.testing.assert_allclose(errs[0], [0.5, 0.5, 0.5])


def test_clean_data_error_per_dataset():
    cleaned = clean_data([([1.0], [2.0]), ([3.0, 4.0], [5.0, 6.0])], 2)
    errs = clean_data_error([[0.1], [0.2]], cleaned)
    np.testing.assert_allclose(errs[0], [0.1])
    np.testing.assert_allclose(errs[1], [0.2, 0.2])


def test_dataset_padding_and_mask():
    ds = Dataset.create([1.0, 2.0, 3.0], [4.0, 5.0, 6.0], 0.1)
    assert ds.x.shape[0] % 128 == 0
    assert ds.n == 3
    assert float(ds.mask.sum()) == 3.0


def test_create_walker_data():
    table = [np.arange(5.0), np.arange(5.0) * 2, np.arange(5.0) * 3]
    x, y = create_walker_data(table, 0, 2)
    np.testing.assert_allclose(y, np.arange(5.0) * 3)


# -------------------------------------------------------------- likelihoods
def test_log_normal_matches_formula():
    v = float(log_normal(1.0, 0.0, 2.0))
    expected = -0.5 * np.log(2 * np.pi) - np.log(2.0) - 0.5 * (1.0 / 2.0) ** 2
    assert v == pytest.approx(expected, rel=1e-12)


def test_log_poisson():
    from scipy import stats as sps

    v = float(log_poisson(3.5, 2.0))
    assert v == pytest.approx(sps.poisson.logpmf(2, 3.5), rel=1e-10)


def test_log_factorial():
    assert float(log_factorial(5.0)) == pytest.approx(np.log(120.0), rel=1e-12)


def _linear_model(x, p):
    return p["b"] + p["m"] * x


def test_log_likelihood_normal_masked_sum():
    ds = Dataset.create([0.0, 1.0, 2.0], [1.0, 3.0, 5.0], 0.5)
    params = {"m": 2.0, "b": 1.0}
    v = float(log_likelihood_normal(_linear_model, params, ds))
    # Perfect fit: residuals 0 -> 3 * (-.5 log 2pi - log .5)
    expected = 3 * (-0.5 * np.log(2 * np.pi) - np.log(0.5))
    assert v == pytest.approx(expected, rel=1e-12)
    # Padding must contribute exactly zero: compare against explicit numpy.
    params_off = {"m": 1.5, "b": 0.5}
    v2 = float(log_likelihood_normal(_linear_model, params_off, ds))
    mu = 0.5 + 1.5 * np.array([0.0, 1.0, 2.0])
    manual = (-0.5 * np.log(2 * np.pi) - np.log(0.5)
              - 0.5 * ((np.array([1.0, 3.0, 5.0]) - mu) / 0.5) ** 2).sum()
    assert v2 == pytest.approx(manual, rel=1e-12)


def test_log_likelihood_cutoff_clamps():
    ds = Dataset.create([0.0], [1000.0], 0.01)
    v = float(log_likelihood_normal_cutoff(_linear_model, {"m": 0.0, "b": 0.0}, ds))
    assert v == pytest.approx(-5000.0)


def test_log_likelihood_poisson_reduction():
    from scipy import stats as sps

    ds = Dataset.create([1.0, 2.0], [3.0, 7.0], None)
    v = float(log_likelihood_poisson(lambda x, p: p["rate"] * x, {"rate": 2.5}, ds))
    expected = sps.poisson.logpmf([3, 7], [2.5, 5.0]).sum()
    assert v == pytest.approx(expected, rel=1e-10)


def test_create_log_likelihood_function():
    ds = Dataset.create([0.0, 1.0], [1.0, 2.0], 1.0)
    ll = create_log_likelihood_function(lambda y, model, err: -jnp.abs(y - model))
    v = float(ll(_linear_model, {"m": 0.0, "b": 0.0}, ds))
    assert v == pytest.approx(-3.0)


def test_resolve_likelihood_factory():
    def factory(fn, params, dataset):
        scale = float(dataset.n)

        def specialized(fn, params, dataset):
            return scale * log_likelihood_normal(fn, params, dataset)

        return specialized

    ds = Dataset.create([0.0], [0.0], 1.0)
    resolved = resolve_likelihood(factory, _linear_model, {"m": 0.0, "b": 0.0}, ds)
    assert resolved is not factory
    plain = resolve_likelihood(
        log_likelihood_normal, _linear_model, {"m": 0.0, "b": 0.0}, ds
    )
    assert plain is log_likelihood_normal


# ------------------------------------------------------------------- priors
def test_bound_penalty_inside_zero():
    assert float(bound_penalty(5.0, 0.0, 10.0)) == 0.0


def test_bound_penalty_exact_reference_formula():
    # -1d10 * (exp(1d-5 * dist) - 1) with dist to nearer bound (358-360).
    v = float(bound_penalty(15.0, 0.0, 10.0))
    expected = -1e10 * (np.exp(1e-5 * 5.0) - 1.0)
    assert v == pytest.approx(expected, rel=1e-12)
    # Boundary itself counts as outside (open interval).
    assert float(bound_penalty(10.0, 0.0, 10.0)) == pytest.approx(0.0, abs=1e-30)
    assert float(bound_penalty(0.0, 0.0, 10.0)) == pytest.approx(0.0, abs=1e-30)


def test_prior_bounds_anaphora():
    pens = prior_bounds({"a": 5.0, "b": -1.0}, {"a": (0, 10), ":b": (0, 10)})
    assert float(pens["a_bound"]) == 0.0
    assert float(pens["b_bound"]) < 0.0
    assert float(pens["bounds_total"]) == float(pens["b_bound"])


def test_make_bounds_prior_with_constraints():
    # The NV physics prior pattern (nv-specific.lisp:21-34).
    prior = make_bounds_prior(
        {"mu1": (2850, 2870), "mu2": (2870, 2890)},
        extra=lambda p, pens, ds: constraint_penalty(p["mu1"] < p["mu2"])
        + constraint_penalty(p["mu2"] - p["mu1"] >= 6.0),
    )
    good = float(prior({"mu1": 2860.0, "mu2": 2880.0}))
    assert good == 0.0
    bad = float(prior({"mu1": 2869.0, "mu2": 2871.0}))
    assert bad == pytest.approx(-1e9)


def test_flat_prior():
    assert float(log_prior_flat({"a": 1.0})) == 0.0


def test_resolve_prior_factory():
    def factory(params, dataset):
        n = dataset.n

        def specialized(params, dataset):
            return jnp.asarray(float(n))

        return specialized

    ds = Dataset.create([0.0, 1.0], [0.0, 1.0], 1.0)
    resolved = resolve_prior(factory, {"a": 1.0}, ds)
    assert float(resolved({"a": 1.0}, ds)) == 2.0


# -------------------------------------------------------------------- stats
def test_stats_basic():
    x = np.random.default_rng(3).normal(0, 2.0, size=20000)
    lo, hi = credible_interval_95(x)
    assert float(lo) == pytest.approx(-3.92, abs=0.15)
    assert float(hi) == pytest.approx(3.92, abs=0.15)
    assert float(iqr(x)) == pytest.approx(2 * 1.349, abs=0.1)
    assert float(std_from_84th_percentile(x)) == pytest.approx(2.0, abs=0.1)


def test_histogram():
    counts, centers = make_histogram(np.random.default_rng(4).normal(size=1000))
    assert counts.sum() == 1000
    assert len(counts) == len(centers)


# -------------------------------------------------------------- expressions
def test_sexp_expression():
    # nv-specific.lisp:68-69 field-offset expression.
    v = eval_expression("(/ (- :mu2 :mu1) 2 2.8)", {"mu1": 2860.0, "mu2": 2874.0})
    assert v == pytest.approx(14.0 / 2 / 2.8)


def test_python_expression():
    # test.lisp:31 Q-factor expression.
    v = eval_expression(":linewidth / :x0", {"linewidth": 121.0, "x0": 2784.0})
    assert v == pytest.approx(121.0 / 2784.0)


def test_expression_rejects_unknown():
    with pytest.raises((KeyError, ValueError)):
        eval_expression("(frobnicate :a)", {"a": 1.0})
    with pytest.raises(KeyError):
        eval_expression(":missing + 1", {"a": 1.0})


def test_dataset_rejects_nonpositive_sigma():
    """A zero/negative per-point error would give inf inv_sigma and a
    silently never-accepting posterior; Dataset.create fails loudly."""
    from lisp_mcmc_tpu.data import Dataset

    x = np.arange(10.0)
    err = np.where(np.arange(10) == 3, 0.0, 0.1)
    with pytest.raises(ValueError, match="positive"):
        Dataset.create(x, x, err)
