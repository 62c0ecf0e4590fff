"""Structured block-diagonal proposals (round 4, verdict item #5).

The hierarchical walk space is [2P hypers | S local blocks of dl] and
the posterior's coupling is hyper<->local only.  ``config.block_*``
(kernel.py) applies and refreshes L per block: O(4P^2 + S*dl^2)
proposal math per walker-step instead of O(d^2), and per-block
covariance sufficiency (counts > max block size instead of counts > d
— the dense refresh is impossible at W < d, exactly the scan-grid
regime).  Storage stays dense (G, d, d) with zero off-blocks so every
host verb, checkpoint and adaptation path is unchanged.  Pins:

  - blocked apply == dense apply on a block-diagonal L (the operators
    agree wherever both are defined);
  - pre-refresh chunks are BITWISE identical (initial L is diagonal);
  - a blocked hierarchical fit recovers the same posterior as dense
    (statistical twin on the conjugate-style grid);
  - blocked refresh fires at W < d where dense cannot (the scan-grid
    enabler);
  - L-free kernels refuse block_count loudly;
  - HierarchicalFit(proposal=) validates and wires the layout.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lisp_mcmc_tpu.hierarchical import HierarchicalFit
from lisp_mcmc_tpu.kernel import FitConfig, build_chunk_runner
from lisp_mcmc_tpu.priors import Gaussian, LogNormal


def const_model(x, p):
    return p["c"] + 0.0 * x


def line_model(x, p):
    return p["m"] * x + p["b"]


HYPER_C = {"c": (Gaussian(1.0, 1.0), LogNormal(np.log(0.4), 0.5))}


def _datasets(rng, S=4, n=16):
    x = np.linspace(0.0, 1.0, n)
    return [(x, 1.0 + 0.3 * s + 0.2 * rng.standard_normal(n))
            for s in range(S)]


def _fit(ds, proposal, seed=0, n_walkers=64, config=None, **kw):
    return HierarchicalFit(const_model, ds, {"c": 1.0}, data_error=0.2,
                           hyper=HYPER_C, n_walkers=n_walkers, seed=seed,
                           proposal=proposal, config=config, **kw)


@pytest.mark.parametrize("kernel", ["rwm", "mala"])
def test_blocked_chunk_matches_dense_on_blockdiag_l(rng, kernel):
    """One REAL kernel chunk with a generic block-diagonal L: the
    blocked build and the dense build produce the same step (operators
    implement the same map whenever L is block-diagonal)."""
    from lisp_mcmc_tpu.kernel import init_state

    bh, bl, nb = 3, 2, 4
    d = bh + nb * bl
    L = np.zeros((d, d))
    A = rng.standard_normal((bh, bh))
    L[:bh, :bh] = np.tril(A @ A.T + 2 * np.eye(bh))
    for s in range(nb):
        i0 = bh + s * bl
        B = rng.standard_normal((bl, bl))
        L[i0:i0 + bl, i0:i0 + bl] = np.tril(B @ B.T + 2 * np.eye(bl))
    L = 0.1 * L

    def lp(theta):
        return -0.5 * jnp.sum(theta * theta)

    W = 16
    pos0 = jnp.asarray(rng.standard_normal((W, d)))
    states, outs = [], []
    for cfg in (FitConfig(kernel=kernel, chunk_size=1),
                FitConfig(kernel=kernel, chunk_size=1, block_hyper=bh,
                          block_local=bl, block_count=nb)):
        run, _ = build_chunk_runner(lp, d, cfg)
        key = jax.random.key(0, impl=cfg.prng_impl)
        st = init_state(key, pos0, jax.vmap(lp)(pos0), jnp.asarray(L))
        st2, out = jax.jit(run)(st, False, False, True)
        states.append(st2)
        outs.append(out)
    np.testing.assert_allclose(np.asarray(states[0].position),
                               np.asarray(states[1].position),
                               rtol=1e-9, atol=1e-12)
    assert float(outs[0]["accept_rate"]) == pytest.approx(
        float(outs[1]["accept_rate"]), abs=1e-12)


def test_blocked_prerefresh_bitwise_identical(rng):
    """The initial L is diagonal (a special block-diagonal), so blocked
    and dense fits are BITWISE identical until the first refresh."""
    ds = _datasets(rng)
    fd = _fit(ds, "dense")
    fb = _fit(ds, "block")
    assert fb.config.block_count == 4 and fb.config.block_local == 1
    fd.adaptive_steps(200, auto=None)
    fb.adaptive_steps(200, auto=None)
    np.testing.assert_array_equal(np.asarray(fd.state.position),
                                  np.asarray(fb.state.position))
    np.testing.assert_array_equal(np.asarray(fd.state.logprob),
                                  np.asarray(fb.state.logprob))


def test_blocked_statistical_twin_of_dense(rng):
    """After refreshes diverge, the blocked fit must still sample the
    SAME posterior: population summaries agree between independent
    blocked and dense runs (chees sampling phase)."""
    ds = _datasets(rng)
    res = {}
    for name, prop, seed in [("block", "block", 1), ("dense", "dense", 2)]:
        f = _fit(ds, prop, seed=seed, n_walkers=128)
        f.adaptive_steps(3000, auto=None)
        f.reset()
        f.sampling_steps(3000, kernel="chees")
        f.burn_steps(len(f) // 2)
        res[name] = f.hyper_params("median")
    assert res["block"]["mu"]["c"] == pytest.approx(
        res["dense"]["mu"]["c"], abs=0.15)
    assert res["block"]["tau"]["c"] == pytest.approx(
        res["dense"]["tau"]["c"], abs=0.15)


def test_blocked_l_stays_blockdiagonal_after_refresh(rng):
    """The refreshed L's cross-block entries are exactly zero (the
    covariance mask runs before the Cholesky) — the dense storage
    really holds a block-diagonal factor."""
    ds = _datasets(rng)
    fb = _fit(ds, "block", n_walkers=128)
    fb.adaptive_steps(2000, auto=None)
    L = np.asarray(fb.state.l_matrix)[0]
    bh = fb.config.block_hyper
    bl = fb.config.block_local
    assert np.any(L[:bh, :bh] != 0.0)
    # hyper-local cross entries: exactly zero
    assert np.all(L[:bh, bh:] == 0.0) and np.all(L[bh:, :bh] == 0.0)
    # local-local cross blocks: exactly zero
    loc = L[bh:, bh:].reshape(fb.config.block_count, bl,
                              fb.config.block_count, bl)
    for s in range(fb.config.block_count):
        for t in range(fb.config.block_count):
            if s != t:
                assert np.all(loc[s, :, t, :] == 0.0)


def test_blocked_refresh_fires_at_w_below_d(rng):
    """The scan-grid enabler: at W < d the dense ENSEMBLE covariance is
    singular and its refresh is vetoed (counts > d fails), but the
    blocked refresh needs only counts > max block size.  Controlled
    comparison: both fits use covariance_source='ensemble' and a wide
    acceptance band (so the refresh gate is sufficiency, not band
    luck); the dense twin must keep a DIAGONAL L, the blocked one must
    grow in-block off-diagonals with exactly-zero cross blocks."""
    S, n = 16, 8
    x = np.linspace(0.0, 1.0, n)
    ds = [(x, 2.0 * x + 1.0 + 0.1 * s + 0.1 * rng.standard_normal(n))
          for s in range(S)]
    hyper = {"m": (Gaussian(2.0, 1.0), LogNormal(np.log(0.2), 0.5)),
             "b": (Gaussian(1.0, 1.0), LogNormal(np.log(0.2), 0.5))}
    cfg = FitConfig(accept_low=0.001, accept_high=0.999,
                    covariance_source="ensemble")

    def make(prop):
        return HierarchicalFit(line_model, ds, {"m": 2.0, "b": 1.0},
                               data_error=0.1, hyper=hyper, n_walkers=24,
                               seed=0, proposal=prop, config=cfg)

    fb = make("block")
    assert fb.ndim == 4 + 2 * S and fb.n_walkers < fb.ndim
    fb.adaptive_steps(1000, auto=None)
    L_b = np.asarray(fb.state.l_matrix)[0]
    bh = fb.config.block_hyper
    assert np.abs(np.tril(L_b[:bh, :bh], k=-1)).sum() > 0.0
    assert np.all(L_b[:bh, bh:] == 0.0) and np.all(L_b[bh:, :bh] == 0.0)

    fd = make("dense")
    fd.adaptive_steps(1000, auto=None)
    L_d = np.asarray(fd.state.l_matrix)[0]
    # counts = W = 24 < d = 36: the dense ensemble refresh never fires;
    # only diagonal rescales happened.
    assert np.abs(np.tril(L_d, k=-1)).sum() == 0.0


def test_block_count_refuses_l_free_kernels(rng):
    ds = _datasets(rng)
    cfg = FitConfig(kernel="slice")
    with pytest.raises(ValueError, match="L-free"):
        _fit(ds, "block", config=cfg)


def test_blocked_fit_can_switch_to_l_free_kernels(rng):
    """Review r4 regression pin: an auto/block fit must still run the
    L-free kernels (block fields are inert for them — there is no L to
    structure), so sampling_steps(kernel='slice'/'demc'/'stretch')
    works without unsetting anything."""
    ds = _datasets(rng)
    fb = _fit(ds, "block", n_walkers=32)
    fb.adaptive_steps(200, auto=None)
    for kern in ("slice", "demc", "stretch"):
        fb.sampling_steps(200, kernel=kern)
    assert np.isfinite(np.asarray(fb.state.logprob)).all()


def test_bad_block_layout_refuses():
    cfg = FitConfig(block_hyper=3, block_local=2, block_count=4)

    def lp(theta):
        return -0.5 * jnp.sum(theta * theta)

    with pytest.raises(ValueError, match="block layout"):
        build_chunk_runner(lp, 10, cfg)   # 3 + 4*2 = 11 != 10


def test_proposal_auto_thresholds(rng):
    """auto = dense below d=96, block at/above."""
    ds = _datasets(rng)                  # d = 6
    f_small = _fit(ds, "auto", n_walkers=16)
    assert f_small.config.block_count == 0
    S, n = 46, 8                         # d = 4 + 2*46 = 96
    x = np.linspace(0.0, 1.0, n)
    big = [(x, 2.0 * x + 1.0 + 0.1 * rng.standard_normal(n))
           for _ in range(S)]
    hyper = {"m": (Gaussian(2.0, 1.0), LogNormal(np.log(0.2), 0.5)),
             "b": (Gaussian(1.0, 1.0), LogNormal(np.log(0.2), 0.5))}
    f_big = HierarchicalFit(line_model, big, {"m": 2.0, "b": 1.0},
                            data_error=0.1, hyper=hyper, n_walkers=16,
                            seed=0, proposal="auto")
    assert f_big.ndim == 96
    assert f_big.config.block_count == S
    assert f_big.config.block_hyper == 4
    assert f_big.config.block_local == 2


def test_blocked_sharded_matches_unsharded(rng):
    """Blocked proposals under chain-axis DP: the per-block einsums
    (including the diagonal-block extraction) must stay GSPMD-
    partitionable and bitwise identical sharded vs unsharded."""
    import jax as _jax

    from lisp_mcmc_tpu.parallel import make_mesh

    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ds = _datasets(rng)

    def make():
        return _fit(ds, "block", n_walkers=64)

    w1 = make()
    w1.adaptive_steps(400, auto=None)
    w2 = make()
    w2.shard(make_mesh())
    w2.adaptive_steps(400, auto=None)
    np.testing.assert_array_equal(np.asarray(w1.state.position),
                                  np.asarray(w2.state.position))
    np.testing.assert_array_equal(np.asarray(w1.state.l_matrix),
                                  np.asarray(w2.state.l_matrix))


def test_blocked_config_survives_checkpoint(rng, tmp_path):
    """hierarchical_save/load round-trips the block_* config fields and
    the block-diagonal L (dense storage, zero cross blocks)."""
    from lisp_mcmc_tpu.checkpoint import hierarchical_load, hierarchical_save

    ds = _datasets(rng)
    fb = _fit(ds, "block", n_walkers=32)
    fb.adaptive_steps(400, auto=None)
    path = str(tmp_path / "blocked.npz")
    hierarchical_save(fb, path)
    loaded = hierarchical_load(path, function=const_model)
    assert loaded.config.block_count == fb.config.block_count
    assert loaded.config.block_hyper == fb.config.block_hyper
    assert loaded.config.block_local == fb.config.block_local
    np.testing.assert_array_equal(np.asarray(loaded.state.l_matrix),
                                  np.asarray(fb.state.l_matrix))


def test_blocked_parent_refits_blocked(rng):
    """A blocked HierarchicalFit's refit-CV blocks inherit the proposal
    structure (the grouped layout composes with per-coordinate blocks)."""
    ds = _datasets(rng)
    fb = _fit(ds, "block", n_walkers=32)
    fb.adaptive_steps(400, auto=None)
    n = fb._n_real_points
    fit, score = fb._refit_cv("test", [np.arange(n) != 0], n_steps=200,
                              temperature=2.0, walkers_per_dataset=8,
                              burn_fraction=0.3, max_samples=8, seed=0)
    assert fit.config.block_count == fb.config.block_count
    assert np.isfinite(score(0)).all()


def test_blocked_evidence_ladder_matches_dense(rng):
    """The evidence layer composes with block mode: tempered rungs ARE
    adaptation groups (contiguous blocks — the layout blocked proposals
    support), so log_evidence runs on a blocked HierarchicalFit
    unchanged and agrees with the dense twin within error bars; the
    stepping-stone/TI internal cross-check holds on both."""
    ds = _datasets(rng)
    res = {}
    for prop in ("block", "dense"):
        f = _fit(ds, prop, n_walkers=64)
        f.adaptive_steps(1500, auto=None)
        ev = f.log_evidence(n_steps=3000, rungs=8, t_max=30.0)
        assert abs(ev.log_z - ev.log_z_ti) < 3 * max(ev.error, 0.1)
        assert f.swap_rates()["ok"]
        res[prop] = ev
    assert res["block"].log_z == pytest.approx(
        res["dense"].log_z,
        abs=3 * (res["block"].error + res["dense"].error) + 0.2)
