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
