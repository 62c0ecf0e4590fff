"""Normalizing-flow VI (variational.flow_advi): the non-Gaussian upgrade
of ADVI.

Oracle pair: (1) the straight-line fit's EXACTLY Gaussian posterior —
the identity-initialized flow must reproduce ADVI's answer (mean, cov,
Laplace-matched evidence); (2) a banana posterior built from a
volume-preserving quadratic shear of a Gaussian — its evidence is known
in closed form, the Gaussian family provably cannot fit it (the
curvature is the failure mode ADVI's Pareto-k flags), and the flow must
recover both the curvature and the trustworthy evidence.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.models import line
from lisp_mcmc_tpu.variational import FlowVIResult

SIGMA = 0.05
BOUNDS = {"b": (-3.0, 5.0), "m": (-2.0, 4.0)}


def _line_walker(seed=0, n_walkers=128):
    rng = np.random.default_rng(seed)
    x = np.linspace(0.0, 2.0, 40)
    y = 1.0 + 0.5 * x + SIGMA * rng.standard_normal(x.size)
    w = mfit.walker_create(
        function=line, data=(x, y), params={"b": 1.0, "m": 0.5},
        data_error=SIGMA, log_prior=mfit.make_bounds_prior(BOUNDS),
        n_walkers=n_walkers, seed=seed, walker_jitter=0.1)
    return w, x, y


def _analytic_posterior(x, y):
    A = np.stack([np.ones_like(x), x], axis=1)
    prec = A.T @ A / SIGMA**2
    cov = np.linalg.inv(prec)
    mean = cov @ (A.T @ y / SIGMA**2)
    return mean, cov


BANANA_BOUNDS = {"t1": (-6.0, 6.0), "t2": (-2.0, 10.0)}
# theta1 ~ N(0,1), theta2 | theta1 ~ N(theta1^2, 0.25^2): a
# volume-preserving shear of a Gaussian, so the box evidence is exact:
# log Z = log(2 pi * 1 * 0.25) - log V_box (uniform prior normalization).
BANANA_TRUTH = math.log(2 * math.pi * 0.25) - math.log(12.0 * 12.0)


@pytest.fixture(scope="module")
def banana_flow():
    """Shared converged banana walker + trained flow (the two slowest
    pieces of this module, reused by the evidence and NeuTra tests)."""
    w = _banana_walker()
    fv = w.flow_advi(n_steps=8000, seed=1)
    return w, fv


def _banana_walker(seed=0, n_walkers=512):
    def model(x, p):
        return jnp.zeros_like(x)

    def loglik(fn, params, dataset):
        t1, t2 = params["t1"], params["t2"]
        return -0.5 * t1 ** 2 - 0.5 * ((t2 - t1 ** 2) / 0.25) ** 2

    w = mfit.walker_create(
        function=model, data=([0.0, 1.0], [0.0, 0.0]),
        params={"t1": 0.5, "t2": 0.5}, log_likelihood=loglik,
        n_walkers=n_walkers, seed=seed, walker_jitter=0.5,
        log_prior=mfit.make_bounds_prior(BANANA_BOUNDS))
    w.adaptive_steps(4000, temperature=2.0, auto=None)
    return w


def test_flow_reduces_to_gaussian_on_gaussian_posterior():
    """Identity-initialized couplings on an exactly-Gaussian posterior:
    the flow must match the analytic mean/cov and the Laplace evidence
    (= ADVI's contract), not bend what needs no bending."""
    w, x, y = _line_walker()
    fv = w.flow_advi(n_steps=1500, n_samples=64, seed=3)
    mean, cov = _analytic_posterior(x, y)

    assert isinstance(fv, FlowVIResult)
    assert abs(fv.mean["b"] - mean[0]) < 4e-2
    assert abs(fv.mean["m"] - mean[1]) < 4e-2
    assert fv.sd["b"] == pytest.approx(np.sqrt(cov[0, 0]), rel=0.2)
    assert fv.sd["m"] == pytest.approx(np.sqrt(cov[1, 1]), rel=0.2)

    w.optimize(300, rounds=2)
    lap = w.laplace_approx()
    assert fv.log_z == pytest.approx(lap.log_z, abs=0.2)
    assert fv.converged_evidence
    # ELBO is a lower bound (up to MC error)
    assert fv.elbo <= fv.log_z + 3 * (fv.log_z_error or 0.1)


def test_flow_fixes_the_banana_gaussian_advi_cannot(banana_flow):
    """The headline contract: on the curved posterior the Gaussian
    family underfits (evidence biased low — the ELBO gap IS the KL to
    the best Gaussian) while the flow recovers the curvature and an
    evidence within a few hundredths of the closed form."""
    w, fv = banana_flow
    g = w.advi(n_steps=1200, n_samples=8, seed=1)

    # Gaussian: biased at least ~0.4 nats low on this target (measured
    # -0.53); flow: within 0.15.
    assert g.log_z - BANANA_TRUTH < -0.3
    assert abs(fv.log_z - BANANA_TRUTH) < 0.15
    assert fv.elbo > g.elbo + 0.3          # strictly larger family, shown
    assert fv.pareto_k < 0.7

    # The flow's samples carry the quadratic ridge (theta2 ~ theta1^2).
    s = fv.sample(4000, seed=2)
    curv = np.polyfit(s[:, 0], s[:, 1], 2)[0]
    assert curv > 0.8, curv


def test_flow_seed_walker_and_chaining():
    w, x, y = _line_walker()
    fv = w.flow_advi(n_steps=800, n_samples=64, seed=5)
    s = fv.sample(256, seed=1)
    assert s.shape == (256, 2)
    assert np.all(np.isfinite(s))
    # samples respect the declared box
    assert s[:, 0].min() > BOUNDS["b"][0] and s[:, 0].max() < BOUNDS["b"][1]

    mv = fv.to_mvgaussian()
    assert mv._mean[list(mv._keys).index("b")] == pytest.approx(fv.mean["b"])

    fv.seed_walker(w, seed=2)
    pos = np.asarray(w.state.position)
    assert np.isfinite(np.asarray(w.state.logprob)).all()
    assert abs(pos[:, 0].mean() - fv.mean["b"]) < 5 * fv.sd["b"]


def test_flow_validation_and_no_spec_path():
    w, _, _ = _line_walker()
    with pytest.raises(ValueError):
        w.flow_advi(n_layers=0)
    with pytest.raises(ValueError):
        w.flow_advi(n_steps=0)

    # custom (unresolvable) prior -> q in whitened space, evidence None
    def custom_prior(params, dataset):
        return jnp.asarray(0.0)

    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 2.0, 30)
    y = 1.0 + 0.5 * x + SIGMA * rng.standard_normal(x.size)
    w2 = mfit.walker_create(
        function=line, data=(x, y), params={"b": 1.0, "m": 0.5},
        data_error=SIGMA, log_prior=custom_prior,
        n_walkers=64, seed=0, walker_jitter=0.1)
    w2.adaptive_steps(1500, temperature=2.0, auto=None)
    fv = w2.flow_advi(n_steps=600, n_samples=32, seed=0)
    assert fv.log_z is None and fv.elbo is None
    assert not fv.converged_evidence
    assert abs(fv.mean["m"] - 0.5) < 0.3


def test_neutra_sample_exact_and_near_iid(banana_flow):
    """NeuTra: MCMC in the flow's latent space must deliver EXACT
    posterior samples (reparameterization preserves invariance — the
    mapped chain reproduces the banana's moments and curvature) and,
    because the latent target is near-N(0,I), near-iid per-step mixing
    (measured 72% of iid on the bent ridge, vs a few percent for
    position-space random walks)."""
    w, fv = banana_flow
    res = fv.neutra_sample(w, n_steps=2000, kernel="mala",
                           n_walkers=128, seed=1)

    s = res.samples
    # exactness: the box-truncated banana's moments
    assert abs(s[:, 0].mean()) < 0.15
    assert abs(s[:, 1].mean() - 1.0) < 0.25
    curv = np.polyfit(s[:, 0], s[:, 1], 2)[0]
    assert curv > 0.9, curv
    # near-iid mixing: min-ESS a large fraction of the retained chain
    T, W, _ = res.samples_by_step.shape
    chain_samples = T * min(W, 64)
    assert res.min_ess() > 0.3 * chain_samples, (res.min_ess(), chain_samples)
    # MALA steered to its optimum in the latent geometry
    assert 0.45 < res.acceptance < 0.75
    # the caller's walker was untouched
    assert w.n_walkers == 512


def test_flow_advi_per_dataset_matches_gaussian_per_dataset():
    """Batched flows: every dataset block trains its own coupling stack
    in ONE vmapped program; on exactly-Gaussian blocks each must agree
    with the Gaussian per-dataset verb (and near-constant IS weights
    must report a healthy tail, not GPD-on-noise garbage)."""
    from lisp_mcmc_tpu.batched import BatchedFit

    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 2.0, 30)
    datasets = []
    for s in range(2):
        y = (1.0 + s) + 0.5 * x + SIGMA * rng.standard_normal(x.size)
        datasets.append((x, y))

    def model(x, p):
        return p["b"] + p["m"] * x

    bf = BatchedFit(model, datasets, {"b": 1.0, "m": 0.5}, SIGMA,
                    log_prior=mfit.make_bounds_prior(BOUNDS),
                    walkers_per_dataset=128, seed=0, walker_jitter=0.1)
    bf.adaptive_steps(3000, temperature=2.0, auto=None)

    flows = bf.flow_advi_per_dataset(n_steps=1200, n_samples=64, seed=0)
    gauss = bf.advi_per_dataset(n_steps=1200, seed=0)

    assert len(flows) == 2
    for s, (fv, gv) in enumerate(zip(flows, gauss)):
        assert isinstance(fv, FlowVIResult)
        assert fv.log_z == pytest.approx(gv.log_z, abs=0.2), (s, fv, gv)
        assert fv.mean["b"] == pytest.approx(1.0 + s, abs=0.1)
        assert fv.converged_evidence, fv
        # per-dataset sampling draws land in the right block's posterior
        draws = fv.sample(256, seed=1)
        assert abs(draws[:, 0].mean() - (1.0 + s)) < 0.15

    with pytest.raises(ValueError, match="BatchedFit"):
        from lisp_mcmc_tpu.variational import flow_advi_per_dataset
        w, _, _ = _line_walker()
        flow_advi_per_dataset(w)


def test_flow_named_prior_matches_laplace():
    """The flow under a NAMED (Gaussian) prior spec: z-space is the
    declared prior's inverse-CDF map and the evidence is the true
    Bayesian integral L*pi — must match the Laplace closed form on the
    exactly-Gaussian line posterior (measured agreement 1e-3)."""
    from lisp_mcmc_tpu.priors import Gaussian, PriorSpec

    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 2.0, 40)
    y = 1.0 + 0.5 * x + SIGMA * rng.standard_normal(x.size)
    spec = PriorSpec({"b": Gaussian(0.0, 2.0), "m": Gaussian(0.0, 2.0)})
    w = mfit.walker_create(
        function=line, data=(x, y), params={"b": 1.0, "m": 0.5},
        data_error=SIGMA, log_prior=spec,
        n_walkers=128, seed=0, walker_jitter=0.1)
    w.adaptive_steps(3000, temperature=2.0, auto=None)
    fv = w.flow_advi(n_steps=2000, n_samples=64, seed=1)
    w.optimize(300, rounds=2)
    lap = w.laplace_approx()
    assert fv.converged_evidence
    assert fv.log_z == pytest.approx(lap.log_z, abs=0.2)
    # samples live on the prior's (unbounded) support, centered right
    s = fv.sample(512, seed=2)
    assert abs(s[:, 0].mean() - 1.0) < 0.1


def test_flow_save_load_roundtrip(tmp_path):
    """The trained transport checkpoints: train once, reload against a
    same-model walker, and get bitwise-identical samples plus the full
    surface (seeding, NeuTra) without retraining.  No-spec fits freeze
    their whitening scales in the file, so the reloaded z-map matches
    the TRAINING-time map even after the ensemble moves on; a
    spec-mismatched reload raises instead of silently disagreeing."""
    w, x, y = _line_walker()
    fv = w.flow_advi(n_steps=800, n_samples=64, seed=5)
    path = str(tmp_path / "flow.npz")
    fv.save(path)
    fv2 = mfit.load_flow(path, w)
    np.testing.assert_array_equal(fv.sample(256, seed=9),
                                  fv2.sample(256, seed=9))
    assert fv2.log_z == fv.log_z and fv2.pareto_k == fv.pareto_k
    res = fv2.neutra_sample(w, n_steps=400, kernel="mala",
                            n_walkers=64, seed=1)
    assert abs(res.samples[:, 0].mean() - fv.mean["b"]) < 5 * fv.sd["b"]

    # custom-prior fit: frozen scales survive ensemble movement
    def custom_prior(params, dataset):
        return jnp.asarray(0.0)

    rng = np.random.default_rng(0)
    x2 = np.linspace(0.0, 2.0, 30)
    y2 = 1.0 + 0.5 * x2 + SIGMA * rng.standard_normal(x2.size)
    w2 = mfit.walker_create(
        function=line, data=(x2, y2), params={"b": 1.0, "m": 0.5},
        data_error=SIGMA, log_prior=custom_prior,
        n_walkers=64, seed=0, walker_jitter=0.1)
    w2.adaptive_steps(1200, temperature=2.0, auto=None)
    f3 = w2.flow_advi(n_steps=400, n_samples=32, seed=0)
    path2 = str(tmp_path / "flow2.npz")
    f3.save(path2)
    w2.adaptive_steps(600, temperature=1.0, auto=None)
    f4 = mfit.load_flow(path2, w2)
    np.testing.assert_array_equal(f3.sample(128, seed=3),
                                  f4.sample(128, seed=3))
    with pytest.raises(ValueError, match="z-space maps"):
        mfit.load_flow(path2, w)


def test_flow_per_dataset_save_load(tmp_path):
    """Per-dataset flow results checkpoint too: reload against a
    standalone single-dataset walker of the same model reproduces the
    sampling bitwise (review finding r3: the batched path used to
    return results without the checkpoint fields)."""
    from lisp_mcmc_tpu.batched import BatchedFit

    rng = np.random.default_rng(0)
    x = np.linspace(0.0, 2.0, 30)
    datasets = []
    for s in range(2):
        y = (1.0 + s) + 0.5 * x + SIGMA * rng.standard_normal(x.size)
        datasets.append((x, y))

    def model(x, p):
        return p["b"] + p["m"] * x

    bf = BatchedFit(model, datasets, {"b": 1.0, "m": 0.5}, SIGMA,
                    log_prior=mfit.make_bounds_prior(BOUNDS),
                    walkers_per_dataset=128, seed=0, walker_jitter=0.1)
    bf.adaptive_steps(1500, temperature=2.0, auto=None)
    flows = bf.flow_advi_per_dataset(n_steps=800, n_samples=64, seed=0)
    path = str(tmp_path / "flow_ds1.npz")
    flows[1].save(path)

    w1 = mfit.walker_create(
        function=model, data=datasets[1], params={"b": 1.0, "m": 0.5},
        data_error=SIGMA, log_prior=mfit.make_bounds_prior(BOUNDS),
        n_walkers=64, seed=0, walker_jitter=0.1)
    loaded = mfit.load_flow(path, w1)
    np.testing.assert_array_equal(flows[1].sample(128, seed=7),
                                  loaded.sample(128, seed=7))
    assert loaded.log_z == flows[1].log_z
