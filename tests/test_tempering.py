"""Parallel tempering (Walker.tempered_steps): replica-exchange search."""

import jax.numpy as jnp
import numpy as np
import pytest

import lisp_mcmc_tpu as mfit


def _bimodal_walker(n_walkers=64, seed=0, start=-4.0):
    """Double well: narrow modes at -4 (local, weight 0.1) and +4 (global),
    separated by a ~90-log-unit barrier."""

    def model(x, p):
        return jnp.zeros_like(x)

    def loglik(fn, params, dataset):
        x = params["x"]
        well = lambda mu: jnp.exp(-0.5 * ((x - mu) / 0.3) ** 2)
        return jnp.log(0.1 * well(-4.0) + well(4.0) + 1e-300) + (
            -0.5 * (params["y"] / 1.0) ** 2
        )

    return mfit.walker_create(
        function=model, data=([0.0, 1.0], [0.0, 0.0]),
        params={"x": start, "y": 0.0}, log_likelihood=loglik,
        n_walkers=n_walkers, seed=seed, walker_jitter=0.01,
    )


def test_cold_chain_stays_trapped_but_tempering_escapes():
    w = _bimodal_walker()
    # Local proposal scale: a cold chain cannot cross the ~90-log-unit
    # barrier (the default diag(|params|) seed would jump it directly).
    w.adaptive_steps(3000, temperature=1.0, auto=None,
                     l_matrix=np.diag([0.05, 0.1]))
    assert w.most_likely_params()["x"] == pytest.approx(-4.0, abs=0.5)

    w.tempered_steps(6000, rungs=8, t_max=100.0)
    best = w.most_likely_params()
    assert best["x"] == pytest.approx(4.0, abs=0.5)  # found the global mode
    # the cold rung (block 0) concentrates at the global mode too
    cold = np.asarray(w.state.position[: w.n_walkers // 8, 0])
    assert np.median(cold) == pytest.approx(4.0, abs=0.5)


def test_tempered_best_logprob_is_untempered():
    """Swaps move untempered log-posteriors; the best step's value must
    equal a direct re-evaluation at the best params."""
    w = _bimodal_walker(n_walkers=32, seed=1)
    w.tempered_steps(2000, rungs=4, t_max=30.0)
    lp, best = w.most_likely_step()
    assert lp == pytest.approx(w.diagnose_params(best), abs=1e-6)


def test_tempering_validations():
    w = _bimodal_walker(n_walkers=30)
    with pytest.raises(ValueError, match="divide"):
        w.tempered_steps(1000, rungs=8)  # 30 % 8 != 0
    # kernel-level guard: mala + tempering in a hand-built config
    from lisp_mcmc_tpu.kernel import FitConfig, build_chunk_runner

    w2 = _bimodal_walker(n_walkers=32)
    with pytest.raises(ValueError, match="search phase"):
        build_chunk_runner(
            w2._log_post_one, w2.ndim,
            FitConfig(kernel="mala", tempering_rungs=4), takes_data=True,
        )


def test_tempering_restores_single_group_state():
    w = _bimodal_walker(n_walkers=32, seed=2)
    w.tempered_steps(1000, rungs=4, t_max=20.0)
    assert w.n_groups == 1 and w.group_ids is None
    assert w.state.l_matrix.shape[0] == 1
    # subsequent plain adaptive stepping works
    w.adaptive_steps(600, auto=None)
    assert np.isfinite(w.most_likely_step()[0])


def test_swap_rates_observability():
    """Ladder observability: per-pair swap acceptance after a tempered
    run (nanmean over alternating-parity chunks); a healthy geometric
    ladder on the double well clears the 0.05 gap bar."""
    w = _bimodal_walker(n_walkers=64, seed=3)
    with pytest.raises(ValueError, match="no tempered run"):
        w.swap_rates()
    w.tempered_steps(4000, rungs=8, t_max=50.0)
    r = w.swap_rates()
    assert r["betas"].shape == (8,) and r["pair_rates"].shape == (7,)
    assert r["betas"][0] == pytest.approx(1.0)
    assert np.all(np.isfinite(r["pair_rates"]))
    assert 0.0 <= r["min_rate"] <= 1.0
    assert r["ok"]                       # geometric 8-rung ladder is sane
    # a 2-rung ladder across the same span has a huge beta gap: the
    # pair rate collapses and the verdict flags it
    w2 = _bimodal_walker(n_walkers=64, seed=4)
    w2.tempered_steps(4000, rungs=2, t_max=1e6)
    r2 = w2.swap_rates()
    assert r2["pair_rates"].shape == (1,)
    assert r2["min_rate"] < r["min_rate"]


def test_swap_rates_after_log_evidence_named_prior():
    """log_evidence runs the ladder on the unit-cube view for named
    priors; the diagnostics must surface on the CALLER's walker."""
    from lisp_mcmc_tpu.priors import Gaussian, PriorSpec
    from lisp_mcmc_tpu.models import line

    rng = np.random.default_rng(0)
    x = np.linspace(0, 10, 40)
    y = 2.0 * x + 1.0 + rng.normal(0, 0.3, 40)
    spec = PriorSpec({"m": Gaussian(2.0, 1.0), "b": Gaussian(1.0, 2.0)})
    w = mfit.walker_create(function=line, data=(x, y),
                           params={"m": 1.5, "b": 0.5}, data_error=0.3,
                           n_walkers=64, seed=1, walker_jitter=0.05,
                           log_prior=spec)
    w.adaptive_steps(3000, auto=None)
    w.log_evidence(n_steps=4000, rungs=8, t_max=1e3)
    r = w.swap_rates()
    assert r["pair_rates"].shape == (7,)
    assert np.all(np.isfinite(r["pair_rates"]))
