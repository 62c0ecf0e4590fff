"""Hierarchical multi-term blocks (round 4, verdict item #8).

The reference's global fits share parameters across heterogeneous terms
(test.lisp:58-70: one (m, b) against a line AND a quadratic).
HierarchicalFit composes with that via the documented TERM-ID COLUMN
recipe (docs/API.md "Multi-term blocks"): concatenate each dataset's
term grids into ONE (N, 2) multi-column x whose second column is the
term id, concatenate y and the per-term sigmas, and branch the model on
the id with jnp.where.  Everything downstream — the stacked (S, N)
likelihood, the decode hook, joint waic/loo, refit-CV masks — rides
unchanged because multi-column x is first-class in Dataset (reference
x tuples, mcmc-fitting.lisp:1136-1137).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lisp_mcmc_tpu.diagnostics import waic
from lisp_mcmc_tpu.hierarchical import HierarchicalFit
from lisp_mcmc_tpu.priors import Gaussian, LogNormal


def model(x, p):
    """Two terms sharing (m, b): term 0 = line, term 1 = quadratic."""
    x0, tid = x[..., 0], x[..., 1]
    return jnp.where(tid < 0.5, p["m"] * x0 + p["b"],
                     0.5 * p["m"] * x0 ** 2 + p["b"])


def test_multiterm_blocks_via_term_id_column(rng):
    S = 3
    x1 = np.linspace(0.0, 10.0, 12)
    x2 = np.linspace(0.0, 3.0, 10)
    ms = rng.normal(2.0, 0.2, S)
    data, errs = [], []
    for m in ms:
        y1 = m * x1 + 1.0 + rng.normal(0, 0.2, x1.size)
        y2 = 0.5 * m * x2 ** 2 + 1.0 + rng.normal(0, 0.1, x2.size)
        X = np.concatenate([np.stack([x1, np.zeros_like(x1)], -1),
                            np.stack([x2, np.ones_like(x2)], -1)])
        data.append((X, np.concatenate([y1, y2])))
        errs.append(np.concatenate([np.full(12, 0.2), np.full(10, 0.1)]))

    h = HierarchicalFit(
        model, data, {"m": 1.5, "b": 0.5}, data_error=errs,
        hyper={"m": (Gaussian(2.0, 1.0), LogNormal(np.log(0.2), 0.5)),
               "b": (Gaussian(1.0, 1.0), LogNormal(np.log(0.2), 0.5))},
        n_walkers=96, seed=0)
    h.adaptive_steps(3000, auto=None)
    h.reset()
    h.sampling_steps(3000, kernel="chees")
    h.burn_steps(len(h) // 2)

    per = h.params_per_dataset("median")
    for s in range(S):
        # Both terms inform each dataset's m: the quadratic pins the
        # line's slope and vice versa.
        assert per[s]["m"] == pytest.approx(ms[s], abs=0.15)
    # Joint pointwise toolchain covers BOTH terms' points.
    w = waic(h, max_samples=256)
    assert w.n_points == S * 22
    assert np.isfinite(w.elpd)


def line_term(x, p):
    return p["m"] * x + p["b"]


def quad_term(x, p):
    return 0.5 * p["m"] * x ** 2 + p["b"]


def test_first_class_term_lists_match_recipe_bitwise(rng):
    """function=[f1, f2] + data=[[(x1,y1),(x2,y2)], ...] builds the
    SAME posterior as the hand-assembled term-id-column recipe —
    bitwise at arbitrary walk vectors (VERDICT r4 #8)."""
    S = 3
    x1 = np.linspace(0.0, 10.0, 12)
    x2 = np.linspace(0.0, 3.0, 10)
    ms = rng.normal(2.0, 0.2, S)
    term_data, recipe_data, errs = [], [], []
    for m in ms:
        y1 = m * x1 + 1.0 + rng.normal(0, 0.2, x1.size)
        y2 = 0.5 * m * x2 ** 2 + 1.0 + rng.normal(0, 0.1, x2.size)
        term_data.append([(x1, y1), (x2, y2)])
        X = np.concatenate([np.stack([x1, np.zeros_like(x1)], -1),
                            np.stack([x2, np.ones_like(x2)], -1)])
        recipe_data.append((X, np.concatenate([y1, y2])))
        errs.append(np.concatenate([np.full(12, 0.2), np.full(10, 0.1)]))

    kw = dict(
        hyper={"m": (Gaussian(2.0, 1.0), LogNormal(np.log(0.2), 0.5)),
               "b": (Gaussian(1.0, 1.0), LogNormal(np.log(0.2), 0.5))},
        n_walkers=16, seed=0)

    def recipe_model(x, p):
        x0, tid = x[..., 0], x[..., 1]
        return jnp.where(tid < 0.5, line_term(x0, p), quad_term(x0, p))

    h_new = HierarchicalFit(
        [line_term, quad_term], term_data, {"m": 1.5, "b": 0.5},
        data_error=[[0.2, 0.1]] * S, **kw)
    h_old = HierarchicalFit(
        recipe_model, recipe_data, {"m": 1.5, "b": 0.5},
        data_error=errs, **kw)

    assert h_new.spec.keys == h_old.spec.keys
    # stacked datasets identical (incl. the synthesized sigmas)
    np.testing.assert_array_equal(
        np.asarray(h_new._posterior_data()["ds"].x),
        np.asarray(h_old._posterior_data()["ds"].x))
    np.testing.assert_array_equal(
        np.asarray(h_new._posterior_data()["ds"].sigma),
        np.asarray(h_old._posterior_data()["ds"].sigma))
    # joint posterior bitwise at arbitrary walk vectors
    vecs = np.random.default_rng(7).standard_normal((5, h_new.spec.ndim))
    vecs[:, 2:4] = np.abs(vecs[:, 2:4]) + 0.1      # tau > 0
    for v in vecs:
        lp_new = h_new.diagnose_params(h_new.spec.unflatten(v))
        lp_old = h_old.diagnose_params(h_old.spec.unflatten(v))
        assert lp_new == lp_old
    # and the whole fit runs
    h_new.adaptive_steps(200, auto=None)
    assert np.isfinite(h_new.most_likely_step()[0])


def test_first_class_term_lists_validation():
    x = np.linspace(0, 1, 4)
    with pytest.raises(ValueError, match="list of 2"):
        HierarchicalFit([line_term, quad_term], [(x, x), (x, x)],
                        {"m": 1.0, "b": 0.0},
                        hyper={"m": (Gaussian(0, 1), LogNormal(0, 1)),
                               "b": (Gaussian(0, 1), LogNormal(0, 1))})


def test_first_class_term_lists_checkpoint_roundtrip(rng, tmp_path):
    """Checkpoints of first-class multi-term fits serialize the TERM
    function names; load rebuilds the same where-chain (explicit
    function= list, the unserializable-callable contract) and the
    posterior matches bitwise."""
    import lisp_mcmc_tpu as mfit

    x1 = np.linspace(0.0, 10.0, 8)
    x2 = np.linspace(0.0, 3.0, 6)
    data = [[(x1, 2.0 * x1 + 1.0), (x2, 0.5 * 2.0 * x2 ** 2 + 1.0)]
            for _ in range(2)]
    h = HierarchicalFit(
        [line_term, quad_term], data, {"m": 2.0, "b": 1.0},
        data_error=[[0.2, 0.1]] * 2,
        hyper={"m": (Gaussian(2.0, 1.0), LogNormal(np.log(0.2), 0.5)),
               "b": (Gaussian(1.0, 1.0), LogNormal(np.log(0.2), 0.5))},
        n_walkers=16, seed=0)
    h.adaptive_steps(200, auto=None)
    path = str(tmp_path / "mt.npz")
    mfit.hierarchical_save(h, path)
    loaded = mfit.hierarchical_load(path, function=[line_term, quad_term],
                                    quiet=True)
    assert loaded is not None
    assert loaded.spec.keys == h.spec.keys
    v = np.asarray(h.state.position)[0]
    lp_a = h.diagnose_params(h.spec.unflatten(v))
    lp_b = loaded.diagnose_params(loaded.spec.unflatten(v))
    assert lp_a == lp_b


def test_multiterm_checkpoint_refuses_single_function(rng, tmp_path):
    """Loading a multi-term checkpoint with a single callable would
    silently broadcast it to every term — refuse loudly instead."""
    import lisp_mcmc_tpu as mfit

    x1 = np.linspace(0.0, 10.0, 6)
    data = [[(x1, 2.0 * x1 + 1.0), (x1, x1 ** 2 + 1.0)]] * 2
    h = HierarchicalFit(
        [line_term, quad_term], data, {"m": 2.0, "b": 1.0},
        data_error=0.2,
        hyper={"m": (Gaussian(2.0, 1.0), LogNormal(np.log(0.2), 0.5)),
               "b": (Gaussian(1.0, 1.0), LogNormal(np.log(0.2), 0.5))},
        n_walkers=8, seed=0)
    path = str(tmp_path / "mt2.npz")
    mfit.hierarchical_save(h, path)
    with pytest.raises(ValueError, match="LIST of per-term"):
        mfit.hierarchical_load(path, function=line_term, quiet=True)
