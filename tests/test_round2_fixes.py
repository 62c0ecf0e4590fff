"""Round-2 hardening: VERDICT r1 items 5/6/9/10 + advisor findings.

Covers the AST-whitelist expression evaluator (no eval escapes), the
distributed-init failure policy, custom-posterior checkpoints, the
BatchedNVFit subclass round-trip, SMC history clearing, and the
matplotlib backend policy.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu.expressions import eval_expression
from lisp_mcmc_tpu.models import line


# ---------------------------------------------------------------- expressions

@pytest.mark.parametrize("payload", [
    "().__class__.__bases__[0].__subclasses__()",
    "(1).__class__",
    "__import__('os').system('true')",
    "[x for x in (1,)]",
    "'abc' + 'def'",
    "exp.__call__(1)",
    "lambda: 1",
])
def test_python_expression_sandbox_escapes_rejected(payload):
    with pytest.raises(ValueError):
        eval_expression(payload, {"m": 1.0})


def test_python_expression_arithmetic_still_works():
    p = {"m": 4.0, "b": 2.0}
    # (a leading "(" would dispatch to the s-expression parser)
    assert eval_expression(":b ** 2 + (:m - :b) / 2", p) == pytest.approx(5.0)
    assert eval_expression("-:m + abs(-:b)", p) == pytest.approx(-2.0)
    assert eval_expression("exp(log(:m))", p) == pytest.approx(4.0)
    # Comparisons evaluate to 0/1 like numpy bools.
    assert eval_expression(":m > :b", p) == pytest.approx(1.0)


def test_python_expression_unknown_name_message():
    with pytest.raises(ValueError, match="unknown (name|function)"):
        eval_expression("nosuchfn(:m)", {"m": 1.0})
    with pytest.raises(KeyError, match="unknown parameter"):
        eval_expression(":nope + 1", {"m": 1.0})


# ---------------------------------------------------------------- distributed

def test_initialize_distributed_raises_on_configured_coordinator(monkeypatch):
    import jax

    from lisp_mcmc_tpu.parallel import mesh as pmesh

    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False,
                        raising=False)

    def boom(**kwargs):
        raise RuntimeError("connection refused")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    # Explicit coordinator kwarg: must raise, not fall back.
    with pytest.raises(RuntimeError, match="refusing silent"):
        pmesh.initialize_distributed(coordinator_address="10.0.0.1:1234")
    # Env-var coordinator: same.
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    with pytest.raises(RuntimeError, match="refusing silent"):
        pmesh.initialize_distributed()
    # No coordinator anywhere: local fallback.
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert pmesh.initialize_distributed() == len(jax.devices())
    # Auto-detected cluster launcher (SLURM multi-node): configured.
    monkeypatch.setenv("SLURM_JOB_NUM_NODES", "2")
    with pytest.raises(RuntimeError, match="refusing silent"):
        pmesh.initialize_distributed()
    # Single-node SLURM allocation: still a local run.
    monkeypatch.setenv("SLURM_JOB_NUM_NODES", "1")
    assert pmesh.initialize_distributed() == len(jax.devices())
    monkeypatch.delenv("SLURM_JOB_NUM_NODES", raising=False)


# ------------------------------------------------------- custom checkpointing

def _gauss_log_post(theta, data):
    z = (theta - data["mu"]) / data["sig"]
    return -0.5 * jnp.sum(z * z)


def test_custom_posterior_checkpoint_roundtrip(tmp_path):
    from lisp_mcmc_tpu.fit import Walker
    from lisp_mcmc_tpu.params import ParamSpec

    data = {"mu": jnp.asarray([1.0, -2.0]), "sig": jnp.asarray([0.5, 2.0])}
    w = Walker([], ParamSpec(("a", "b")), np.asarray([0.0, 0.0]),
               n_walkers=32, seed=3, walker_jitter=0.1,
               log_posterior=_gauss_log_post, posterior_data=data)
    w.adaptive_steps(800, auto=None)
    path = str(tmp_path / "custom.npz")
    mfit.walker_save(w, path)

    # Without the callable: recommendations + None (reference contract,
    # mcmc-fitting.lisp:996-997).
    assert mfit.walker_load(path, quiet=True) is None

    loaded = mfit.walker_load(path, log_posterior=_gauss_log_post)
    assert loaded is not None
    np.testing.assert_allclose(np.asarray(loaded.state.position),
                               np.asarray(w.state.position))
    np.testing.assert_allclose(np.asarray(loaded._posterior_data()["mu"]),
                               np.asarray(data["mu"]))
    # Resumable: posterior evaluations agree and the chain advances.
    lp = np.asarray(loaded._eval_batch(loaded.state.position))
    np.testing.assert_allclose(lp, np.asarray(loaded.state.logprob), atol=1e-9)
    age0 = int(loaded.state.age)
    loaded.adaptive_steps(400, auto=None)
    assert int(loaded.state.age) > age0


def test_batched_nv_fit_subclass_survives_reload(tmp_path):
    from lisp_mcmc_tpu.nv import BatchedNVFit

    rng = np.random.default_rng(0)
    x = np.linspace(2820.0, 2920.0, 60)

    def spectrum(mu1, mu2):
        return (1.0 - 0.1 / (1 + ((x - mu1) / 5.0) ** 2)
                - 0.1 / (1 + ((x - mu2) / 5.0) ** 2)
                + 0.003 * rng.standard_normal(len(x)))

    spectra = [(x, spectrum(2860.0, 2880.0)), (x, spectrum(2855.0, 2885.0))]
    fit = BatchedNVFit(spectra, walkers_per_spectrum=16, seed=1)
    fit.adaptive_steps(400, auto=None)
    path = str(tmp_path / "nv.npz")
    mfit.batched_save(fit, path)

    loaded = mfit.batched_load(path)
    assert isinstance(loaded, BatchedNVFit)
    assert loaded.n_spectra == 2
    offs = loaded.field_offsets()
    assert len(offs) == 2 and np.all(np.isfinite(offs))


# ------------------------------------------------------------------ SMC state

def test_seed_prior_box_clears_stale_history():
    x = np.linspace(0.0, 10.0, 40)
    y = 2.0 * x + 1.0
    w = mfit.walker_create(function=line, data=(x, y),
                           params={"m": 2.0, "b": 1.0}, data_error=0.1,
                           n_walkers=32, seed=0, walker_jitter=0.05)
    w.adaptive_steps(600, auto=None)
    assert len(w) > 0
    from lisp_mcmc_tpu.smc import seed_prior_box

    seed_prior_box(w, {"m": (0.0, 4.0), "b": (-2.0, 4.0)}, seed=1)
    assert len(w) == 0
    assert w._accept_log == []
    # best tracking restarts at the fresh draws
    np.testing.assert_allclose(np.asarray(w.state.best_position),
                               np.asarray(w.state.position))


# ------------------------------------------------------------ damped refresh

def test_rwm_damped_refresh_settles_at_high_d():
    """VERDICT r1 #7: at high d the reference's hard band policy
    limit-cycles (measured 0.2 -> 0.92 -> 0.2 with std 0.28 at d=24;
    DESIGN.md "damped band adaptation"); refresh_damping < 1 must settle
    into the band instead.  Defaults stay reference-exact (gamma = 1)."""
    import jax.numpy as jnp

    from lisp_mcmc_tpu.fit import Walker
    from lisp_mcmc_tpu.params import ParamSpec

    assert mfit.FitConfig().refresh_damping == 1.0

    d = 16
    rng = np.random.default_rng(0)
    A = rng.standard_normal((d, d))
    prec = np.linalg.inv(A @ A.T + 0.05 * np.eye(d))

    def log_post(theta, data):
        return -0.5 * theta @ data["prec"] @ theta

    cfg = mfit.FitConfig(kernel="rwm", refresh_damping=0.25, thin=1000)
    w = Walker([], ParamSpec(tuple(f"p{i}" for i in range(d))),
               np.zeros(d) + 0.1, n_walkers=256, seed=1, walker_jitter=0.5,
               log_posterior=log_post, posterior_data={"prec": jnp.asarray(prec)},
               config=cfg)
    w.adaptive_steps(6000, auto=None, temperature=1.0, collect_history=False)
    acc = np.asarray([float(a) for a in w._accept_log])[-10:]
    assert acc.std() < 0.1, f"damped refresh still cycling: {np.round(acc, 2)}"
    assert 0.15 < acc.mean() < 0.55, acc.mean()


# -------------------------------------------------------------- history caps

def test_history_walker_subsample_and_byte_cap():
    x = np.linspace(0.0, 10.0, 40)
    y = 2.0 * x + 1.0
    cfg = mfit.FitConfig(history_walkers=8, thin=1,
                         max_history_bytes=8 * 3 * 8 * 40)  # ~40 rows
    w = mfit.walker_create(function=line, data=(x, y),
                           params={"m": 2.0, "b": 1.0}, data_error=0.1,
                           n_walkers=32, seed=0, walker_jitter=0.05,
                           config=cfg)
    w.adaptive_steps(2000, auto=None)
    # Walker axis of retained history is the 8-walker subsample...
    assert all(h.shape[1] == 8 for h in w._hist_positions)
    # ...and the byte cap bounds total retention (whole chunks pop, so
    # allow one chunk of slack above the row budget).
    total_rows = sum(h.shape[0] for h in w._hist_positions)
    row_bytes = 8 * (2 + 1) * w._hist_positions[0].dtype.itemsize
    budget_rows = cfg.max_history_bytes // row_bytes + cfg.chunk_size
    assert total_rows <= budget_rows
    # Diagnostics still work on the subsampled history.
    from lisp_mcmc_tpu import diagnostics

    ess = diagnostics.ess_per_param(w)
    assert all(v >= 1.0 for v in ess.values())
    # Full-ensemble state is untouched.
    assert w.state.position.shape == (32, 2)


def test_history_default_bytes_bound_at_scale():
    """Defaults must keep the README quickstart at W=131072 host-safe:
    3000 retained rows x min(W, history_walkers) x (d+1) doubles < 2 GB."""
    cfg = mfit.FitConfig()
    rows = cfg.max_history // cfg.thin
    host_bytes = rows * min(131072, cfg.history_walkers) * (6 + 1) * 8
    assert host_bytes < 2 * 1024**3
    assert cfg.max_history_bytes <= 2 * 1024**3


# ------------------------------------------------------------------- plotting

def test_headless_policy(monkeypatch):
    from lisp_mcmc_tpu import plotting

    monkeypatch.delenv("MPLBACKEND", raising=False)
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    assert plotting._is_headless()
    monkeypatch.setenv("DISPLAY", ":0")
    assert not plotting._is_headless()
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.setenv("MPLBACKEND", "QtAgg")
    assert not plotting._is_headless()
