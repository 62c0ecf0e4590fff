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


def test_respace_ladder_packs_bottleneck():
    """Deterministic respace: the low-swap-rate pair attracts rungs
    (its log-beta gap shrinks); endpoints stay fixed; strict descent."""
    from lisp_mcmc_tpu.fit import respace_ladder

    betas = 1.0 / np.array([1.0, 10.0, 100.0, 1000.0])
    rates = np.array([0.05, 0.6, 0.6])       # pair 0 is the bottleneck
    nb = respace_ladder(betas, rates)
    assert nb[0] == 1.0 and nb[-1] == betas[-1]
    assert np.all(np.diff(nb) < 0)
    assert (np.log(nb[0]) - np.log(nb[1])) \
        < (np.log(betas[0]) - np.log(betas[1]))
    # NaN rates (pilot too short for one parity) degrade gracefully
    nb2 = respace_ladder(betas, np.array([0.05, np.nan, 0.6]))
    assert np.all(np.isfinite(nb2)) and np.all(np.diff(nb2) < 0)
    with pytest.raises(ValueError, match="pair rates"):
        respace_ladder(betas, np.array([0.5]))


def test_auto_ladder_respaces_and_explicit_betas():
    w = _bimodal_walker(n_walkers=64, seed=3)
    w.tempered_steps(8000, rungs=8, t_max=1e4, auto_ladder=True)
    r = w.swap_rates()
    geo = 1.0 / np.asarray([1e4 ** (k / 7) for k in range(8)])
    assert not np.allclose(r["betas"], geo)          # actually respaced
    assert r["betas"][0] == 1.0
    assert r["betas"][-1] == pytest.approx(geo[-1])  # endpoints fixed
    assert np.all(np.isfinite(r["pair_rates"]))
    # the global mode is still found (search quality preserved)
    assert w.most_likely_params()["x"] == pytest.approx(4.0, abs=0.5)

    w2 = _bimodal_walker(n_walkers=64, seed=4)
    w2.tempered_steps(2000, rungs=4, betas=[1.0, 0.2, 0.04, 0.001])
    np.testing.assert_allclose(w2.swap_rates()["betas"],
                               [1.0, 0.2, 0.04, 0.001])
    with pytest.raises(ValueError, match="descend"):
        w2.tempered_steps(1000, rungs=4, betas=[1.0, 0.2, 0.4, 0.001])


def test_evidence_on_adaptive_ladder_matches_geometric():
    """The TI/stepping-stone reduction reads the ladder the run ACTUALLY
    used; auto_ladder evidence agrees with the geometric ladder and the
    SMC estimate on a conjugate fit."""
    from lisp_mcmc_tpu.priors import Gaussian, PriorSpec
    from lisp_mcmc_tpu.models import line

    rng = np.random.default_rng(0)
    x = np.linspace(0, 10, 40)
    y = 2.0 * x + 1.0 + rng.normal(0, 0.3, 40)
    spec = PriorSpec({"m": Gaussian(2.0, 1.0), "b": Gaussian(1.0, 2.0)})
    w = mfit.walker_create(function=line, data=(x, y),
                           params={"m": 1.5, "b": 0.5}, data_error=0.3,
                           n_walkers=128, seed=1, walker_jitter=0.05,
                           log_prior=spec)
    w.adaptive_steps(4000, auto=None)
    ev_geo = w.log_evidence(prior=spec, n_steps=8000, rungs=8, t_max=1e3)
    ev_auto = w.log_evidence(prior=spec, n_steps=8000, rungs=8, t_max=1e3,
                             auto_ladder=True)
    sm = w.smc_sample(prior=spec, n_move=200)
    assert ev_auto.log_z == pytest.approx(ev_geo.log_z, abs=1.0)
    assert ev_auto.log_z == pytest.approx(sm.log_z, abs=1.0)


def test_tempering_betas_config_roundtrip():
    """tempering_betas must stay hashable (configs key the jit cache)
    through the checkpoint JSON round-trip (list -> tuple coercion)."""
    from lisp_mcmc_tpu.kernel import FitConfig

    c = FitConfig(tempering_betas=[1.0, 0.5, 0.1])    # list in
    assert isinstance(c.tempering_betas, tuple)
    hash(c)                                            # cache-key usable
    assert c == FitConfig(tempering_betas=(1.0, 0.5, 0.1))
