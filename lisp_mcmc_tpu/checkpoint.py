"""Checkpoint / resume: save and load full fit state (reference C18).

The reference designed but disabled this: ``walker-save``/``walker-load``
exist only as comments (mcmc-fitting.lisp:980-1027), with a format of
printed plists holding function *names* (via ``sb-kernel:%fun-name``,
972-977), data, errors, and the walk; loading without functions prints
recommendations, with functions reconstructs the walker
(``test.lisp:38-49`` documents the intended usage).  Here the capability
is first-class and resumable mid-run.

Format: a single ``.npz`` containing every chain array (position,
logprob, best step, proposal factor, moment accumulators, RNG key, age),
the datasets, optional thinned history, and a JSON header with parameter
keys, config, and the *names* of model/likelihood/prior functions —
closures are never serialized, matching the reference's design.  Loading
resolves names against the model registry
(:data:`lisp_mcmc_tpu.models.MODEL_REGISTRY`) or takes explicit callables.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

from .data import Dataset
from .kernel import FitConfig, WalkerState
from .likelihoods import (
    log_likelihood_normal,
    log_likelihood_normal_cutoff,
    log_likelihood_poisson,
)
from .priors import log_prior_flat

__all__ = ["walker_save", "walker_load", "walker_set_save", "walker_set_load",
           "batched_save", "batched_load",
           "hierarchical_save", "hierarchical_load"]

# v2 (round 2): FitConfig gained refresh_damping / max_history_bytes /
# history_walkers, headers gained kind="custom" and "subclass" — older
# readers must refuse cleanly at the version gate rather than crash in
# FitConfig(**config).  v1 files still load (missing keys take dataclass
# defaults).
FORMAT_VERSION = 2

LIKELIHOOD_REGISTRY: dict[str, Callable] = {
    "log_likelihood_normal": log_likelihood_normal,
    "log_likelihood_normal_weighted": log_likelihood_normal,
    "log_likelihood_normal_cutoff": log_likelihood_normal_cutoff,
    "log_likelihood_poisson": log_likelihood_poisson,
}

PRIOR_REGISTRY: dict[str, Callable] = {
    "log_prior_flat": log_prior_flat,
}

# Named `extra=` hooks of make_bounds_prior, for reconstructing bounds
# priors from their serialized recipe.
PRIOR_EXTRA_REGISTRY: dict[str, Callable] = {}


def _register_domain_priors():
    """Late registration avoids a circular import with the nv module."""
    try:
        from . import nv

        PRIOR_REGISTRY.setdefault("log_prior_nv", nv.log_prior_nv)
        PRIOR_EXTRA_REGISTRY.setdefault("_nv_constraints", nv._nv_constraints)
    except (ImportError, AttributeError):  # pragma: no cover
        pass


def _prior_meta(prior) -> dict:
    """Serializable recipe for a prior: PriorSpec closures carry the full
    spec, bounds-table closures their bounds + the extra hook's NAME;
    everything else is a bare name."""
    spec = getattr(prior, "_prior_spec", None)
    if spec is not None and not spec.is_uniform:
        # Pure-uniform specs round-trip as the (older) bounds recipe
        # below — the two priors are behaviorally identical.
        return {"prior": "prior_spec", "prior_spec": spec.to_meta()}
    bounds = getattr(prior, "_bounds", None)
    if bounds is not None:
        extra = getattr(prior, "_extra", None)
        return {
            "prior": "bounds_prior",
            "prior_bounds": {k: [float(v[0]), float(v[1])]
                             for k, v in bounds.items()},
            "prior_extra": _fn_name(extra) if extra is not None else None,
        }
    return {"prior": _fn_name(prior)}


def _resolve_prior(meta: dict, supplied, quiet: bool):
    """Prior from a ``_prior_meta`` dict: explicit > recipe > registry."""
    if supplied is not None:
        return supplied
    if meta.get("prior") == "prior_spec" and "prior_spec" in meta:
        from .priors import PriorSpec

        return PriorSpec.from_meta(meta["prior_spec"]).as_log_prior()
    if meta.get("prior") == "bounds_prior" and "prior_bounds" in meta:
        from .priors import make_bounds_prior

        bounds = {k: tuple(v) for k, v in meta["prior_bounds"].items()}
        extra_name = meta.get("prior_extra")
        if extra_name is None:
            return make_bounds_prior(bounds)
        extra = PRIOR_EXTRA_REGISTRY.get(extra_name)
        if extra is not None:
            return make_bounds_prior(bounds, extra=extra)
        if not quiet:
            print(f"walker_load: cannot resolve bounds-prior extra hook "
                  f"{extra_name!r}; pass the prior explicitly via log_prior")
        return None
    fn = PRIOR_REGISTRY.get(meta["prior"])
    if fn is None and not quiet:
        print(f"walker_load: cannot resolve log_prior {meta['prior']!r}; "
              f"pass it explicitly via the log_prior argument")
    return fn


def _fn_name(fn) -> str:
    return getattr(fn, "__name__", fn.__class__.__name__)


def walker_save(walker, path: str, take: int | None = None) -> None:
    """Save a fit to ``path`` (``walker-save``, mcmc-fitting.lisp:980-985).

    ``take`` limits how much thinned history is stored (the reference's
    optional take, test.lisp:40).
    """
    import jax

    if hasattr(walker, "walkers_per_dataset"):
        raise ValueError(
            "walker_save: this is a BatchedFit/BatchedNVFit — use "
            "batched_save, which captures the stacked datasets and block "
            "layout this format does not."
        )
    if hasattr(walker, "pooled") and hasattr(walker, "local_spec"):
        # Without this redirect the custom escape hatch below would save
        # a bare checkpoint with no hyper/local-prior recipes, no pooled
        # list, and an unreconstructible log_posterior closure.
        raise ValueError(
            "walker_save: this is a HierarchicalFit — use "
            "hierarchical_save, which serializes the pooling structure "
            "as distribution recipes this format does not."
        )
    if (getattr(walker, "_custom_log_post", None) is not None
            or getattr(walker, "_custom_batched", None) is not None
            or walker.aux is not None or walker.group_ids is not None):
        return _custom_save(walker, path, take)

    arrays = _dump_state(walker, take)
    for i, t in enumerate(walker.terms):
        arrays[f"term{i}_x"] = np.asarray(t.dataset.x)
        arrays[f"term{i}_y"] = np.asarray(t.dataset.y)
        arrays[f"term{i}_sigma"] = np.asarray(t.dataset.sigma)
        arrays[f"term{i}_mask"] = np.asarray(t.dataset.mask)

    header = {
        "format_version": FORMAT_VERSION,
        "param_keys": list(walker.spec.keys),
        "n_walkers": walker.n_walkers,
        "prng_impl": str(jax.random.key_impl(walker.state.key)),
        "dtype": np.dtype(walker.dtype).name,
        "config": dataclasses.asdict(walker.config),
        "terms": [
            {
                "function": _fn_name(t.fn),
                "likelihood": _fn_name(t.likelihood),
                "n": t.dataset.n,
                **_prior_meta(t.prior),
            }
            for t in walker.terms
        ],
    }
    arrays["header"] = np.frombuffer(json.dumps(header).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def _custom_save(walker, path: str, take) -> None:
    """Names+arrays escape hatch for custom-posterior walkers.

    The reference's (commented) design saved function *names* and made the
    user re-supply the callables at load, printing recommendations
    otherwise (mcmc-fitting.lisp:996-997).  Same contract here: every
    chain array, the param keys/config, group_ids, and — when they are
    plain array pytrees — aux and posterior_data are stored; the
    posterior callable itself is never serialized and must be passed to
    :func:`walker_load` as ``log_posterior=`` (and/or
    ``batched_log_posterior=``).
    """
    import jax

    arrays = _dump_state(walker, take)
    pdata = walker._custom_data
    pdata_saved = False
    if isinstance(pdata, dict) and all(
            isinstance(k, str) and not hasattr(v, "__call__") for k, v in pdata.items()):
        try:
            staged = {f"pdata_{k}": np.asarray(v) for k, v in pdata.items()}
        except (TypeError, ValueError):
            staged = None  # stage-then-commit: no partial pdata_* entries
        if staged is not None and all(a.dtype != object for a in staged.values()):
            # object arrays would savez as pickles that np.load refuses
            # to read back (allow_pickle=False) — an unloadable "success"
            arrays.update(staged)
            pdata_saved = True
    aux_saved = False
    if walker.aux is not None:
        try:
            arrays["aux"] = np.asarray(walker.aux)
            aux_saved = True
        except (TypeError, ValueError):
            aux_saved = False
    if walker.group_ids is not None:
        arrays["group_ids"] = np.asarray(walker.group_ids)

    header = {
        "format_version": FORMAT_VERSION,
        "kind": "custom",
        "param_keys": list(walker.spec.keys),
        "n_walkers": walker.n_walkers,
        "n_groups": int(walker.n_groups),
        "prng_impl": str(jax.random.key_impl(walker.state.key)),
        "dtype": np.dtype(walker.dtype).name,
        "config": dataclasses.asdict(walker.config),
        "log_posterior": (_fn_name(walker._custom_log_post)
                          if walker._custom_log_post is not None else None),
        "batched_log_posterior": (_fn_name(walker._custom_batched)
                                  if walker._custom_batched is not None else None),
        "posterior_data_saved": pdata_saved,
        "had_posterior_data": pdata is not None,
        "aux_saved": aux_saved,
        "had_aux": walker.aux is not None,
    }
    arrays["header"] = np.frombuffer(json.dumps(header).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def _custom_load(arrays, header, *, log_posterior=None, batched_log_posterior=None,
                 posterior_data=None, aux=None, quiet=False):
    """Load a ``kind=custom`` checkpoint; demands the callables back."""
    from .fit import Walker
    from .params import ParamSpec

    need_batched = header.get("batched_log_posterior") is not None
    have_fn = (log_posterior is not None
               or (need_batched and batched_log_posterior is not None))
    need_pdata = (header.get("had_posterior_data")
                  and not header.get("posterior_data_saved")
                  and posterior_data is None)
    need_aux = (header.get("had_aux") and not header.get("aux_saved")
                and aux is None)
    if not have_fn or need_aux or need_pdata:
        if not quiet:
            print("*Recommendations*")
            print(f"log_posterior: {header.get('log_posterior')}")
            if need_batched:
                print(f"batched_log_posterior: {header.get('batched_log_posterior')}")
            if need_pdata:
                print("posterior_data: (not serializable; re-supply the "
                      "dataset pytree)")
            if need_aux:
                print("aux: (not serializable; re-supply the aux pytree)")
        return None

    dtype = jnp.dtype(header["dtype"])
    if posterior_data is None:
        pdata = {k[len("pdata_"):]: jnp.asarray(v)
                 for k, v in arrays.items() if k.startswith("pdata_")}
        posterior_data = pdata if pdata else None
    if aux is None and header.get("aux_saved"):
        aux = jnp.asarray(arrays["aux"])

    walker = Walker.__new__(Walker)
    walker.terms = []
    walker.spec = ParamSpec(tuple(header["param_keys"]))
    walker.config = FitConfig(**header["config"])
    walker.dtype = dtype
    walker.n_walkers = header["n_walkers"]
    walker._runner_cache = {}
    walker._custom_log_post = log_posterior
    walker._custom_data = posterior_data
    walker._custom_batched = batched_log_posterior
    walker.aux = aux
    walker.group_ids = (jnp.asarray(arrays["group_ids"], jnp.int32)
                        if "group_ids" in arrays else None)
    walker.n_groups = int(header.get("n_groups", 1))
    walker._log_post_one = walker._build_log_posterior()
    return _restore_state(walker, arrays, header, dtype)


def _dump_state(walker, take):
    """Every chain array + histories, shared by both save formats."""
    import jax

    state = walker.state
    arrays = {
        # Typed PRNG keys serialize as raw uint32 words + impl name.
        "key": np.asarray(jax.random.key_data(state.key)),
        "position": np.asarray(state.position),
        "logprob": np.asarray(state.logprob),
        "best_position": np.asarray(state.best_position),
        "best_logprob": np.asarray(state.best_logprob),
        "l_matrix": np.asarray(state.l_matrix),
        "m_sum": np.asarray(state.m_sum),
        "m_outer": np.asarray(state.m_outer),
        "m_count": np.asarray(state.m_count),
        "age": np.asarray(state.age),
        "anneal_step": np.asarray(state.anneal_step),
        "chees": np.asarray(state.chees),
    }
    hist_pos, hist_lp = walker._history(take)
    arrays["history_positions"] = hist_pos
    arrays["history_logprobs"] = hist_lp
    arrays["accept_log"] = np.asarray(walker._accept_log, dtype=np.float64)
    # Auto-stop traces travel with the fit so a resumed run can settle
    # immediately instead of regenerating max(settle, 400) steps of trace.
    arrays["lpmax_trace"] = (
        np.concatenate(walker._lpmax_trace) if walker._lpmax_trace else np.empty(0)
    )
    arrays["lpmean_trace"] = (
        np.concatenate(walker._lpmean_trace) if walker._lpmean_trace else np.empty(0)
    )
    return arrays


def _restore_state(walker, arrays, header, dtype):
    """Install saved chain arrays + histories onto a constructed fit."""
    import jax

    prng_impl = header.get("prng_impl", "threefry2x32")
    walker.state = WalkerState(
        key=jax.random.wrap_key_data(jnp.asarray(arrays["key"]), impl=prng_impl),
        position=jnp.asarray(arrays["position"], dtype),
        logprob=jnp.asarray(arrays["logprob"], dtype),
        best_position=jnp.asarray(arrays["best_position"], dtype),
        best_logprob=jnp.asarray(arrays["best_logprob"], dtype),
        l_matrix=jnp.asarray(arrays["l_matrix"], dtype),
        m_sum=jnp.asarray(arrays["m_sum"], dtype),
        m_outer=jnp.asarray(arrays["m_outer"], dtype),
        m_count=jnp.asarray(arrays["m_count"], dtype),
        age=jnp.asarray(arrays["age"], jnp.int32),
        anneal_step=jnp.asarray(arrays.get("anneal_step", 0), jnp.int32),
        # Pre-chees checkpoints restore with a fresh (zeroed) trajectory
        # state: t restarts at hmc_leapfrog, which is the old behavior.
        chees=jnp.asarray(
            arrays.get(
                "chees",
                np.zeros((np.asarray(arrays["l_matrix"]).shape[0], 4))),
            dtype),
    )
    walker._hist_positions = (
        [arrays["history_positions"]] if arrays["history_positions"].size else []
    )
    walker._hist_logprobs = (
        [arrays["history_logprobs"]] if arrays["history_logprobs"].size else []
    )
    walker._accept_log = list(arrays["accept_log"])
    lpmax = arrays.get("lpmax_trace", np.empty(0))
    lpmean = arrays.get("lpmean_trace", np.empty(0))
    walker._lpmax_trace = [lpmax] if lpmax.size else []
    walker._lpmean_trace = [lpmean] if lpmean.size else []
    # Run-scoped ladder diagnostics do not travel with the checkpoint;
    # the custom-posterior path builds via Walker.__new__, so every
    # __init__-initialized trace must be re-seeded here.
    walker._swap_trace = []
    walker._swap_betas = None
    return walker


def _stack_batch_arrays(fit, take) -> dict:
    """Chain arrays + the stacked dataset triplet, shared by
    :func:`batched_save` and :func:`hierarchical_save`.

    Stacks from the per-dataset Dataset objects (the single source of
    truth for every posterior path).  Sigma saves DIRECTLY (a
    1/inv_sigma reconstruction drifts 1 ulp and breaks the bitwise
    round-trip); pad lanes save as 0 via the mask, and load slices
    each dataset back to its true length before Dataset.create.
    """
    arrays = _dump_state(fit, take)
    arrays["batch_x"] = np.stack(
        [np.asarray(ds.x, np.float64) for ds in fit._datasets])
    arrays["batch_y"] = np.stack(
        [np.asarray(ds.y, np.float64) for ds in fit._datasets])
    arrays["batch_err"] = np.stack(
        [np.asarray(ds.sigma, np.float64) * np.asarray(ds.mask, np.float64)
         for ds in fit._datasets])
    return arrays


def _batch_header_fields(fit) -> dict:
    """Header fields common to the batched and hierarchical formats."""
    term = fit.terms[0]
    return {
        "format_version": FORMAT_VERSION,
        "param_keys": list(fit.spec.keys),
        "n_walkers": fit.n_walkers,
        "n_datasets": int(fit.n_datasets),
        "n_points_per_dataset": [int(ds.n) for ds in fit._datasets],
        "prng_impl": str(__import__("jax").random.key_impl(fit.state.key)),
        "dtype": np.dtype(fit.dtype).name,
        "config": dataclasses.asdict(fit.config),
        "function": _fn_name(term.fn),
        "likelihood": _fn_name(term.likelihood),
    }


def batched_save(fit, path: str, take: int | None = None) -> None:
    """Save a :class:`~lisp_mcmc_tpu.batched.BatchedFit` to ``path``.

    The batch is reconstructible from its inputs (one registry model, the
    stacked datasets, the block layout), so the format stores those plus
    every chain array — the same names-not-closures contract as
    :func:`walker_save`.  A non-registry prior must be re-supplied to
    :func:`batched_load` (the reference's walker-load contract).
    """
    if fit._custom_data is None or not hasattr(fit, "walkers_per_dataset"):
        raise ValueError("batched_save: not a BatchedFit; use walker_save")
    arrays = _stack_batch_arrays(fit, take)
    term = fit.terms[0]
    header = {
        **_batch_header_fields(fit),
        "kind": "batched",
        # Concrete class so load restores the subclass surface
        # (n_spectra, field_offsets, ...).  BatchedNVFit carries no state
        # beyond BatchedFit — its __init__ only derives constructor
        # arguments — so recording the name suffices.
        "subclass": type(fit).__name__,
        "n_points": int(fit.terms[0].dataset.n),
        # Ragged batches: n_points_per_dataset (from the shared header
        # fields) carries every dataset's TRUE pre-padding length —
        # n_points alone (dataset 0) would slice longer datasets short
        # (silent truncation) or leave zero-error pad lanes in shorter
        # ones (Dataset.create rejects them at load).
        "walkers_per_dataset": int(fit.walkers_per_dataset),
        **_prior_meta(term.prior),
    }
    arrays["header"] = np.frombuffer(json.dumps(header).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def batched_load(path: str, *, function=None, log_likelihood=None,
                 log_prior=None, quiet: bool = False):
    """Load a :func:`batched_save` checkpoint into a resumable BatchedFit.

    Names resolve like :func:`walker_load` (explicit callable > registry >
    printed recommendations + None).  Factory likelihoods (student-t,
    noise-scale, ...) are closures the registry cannot rebuild — pass the
    re-created factory via ``log_likelihood`` (the reference's own
    walker-load contract for unserializable callables, 996-997).
    """
    from .batched import BatchedFit
    from .models import MODEL_REGISTRY

    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    header = json.loads(bytes(arrays.pop("header")).decode())
    if header.get("kind") != "batched":
        raise ValueError("batched_load: not a batched checkpoint; use walker_load")
    if header["format_version"] > FORMAT_VERSION:
        raise ValueError(f"checkpoint format {header['format_version']} is newer than supported")

    _register_domain_priors()
    fns = _resolve([header["function"]], function, MODEL_REGISTRY, "function", quiet)
    prior = _resolve_prior(header, log_prior, quiet)
    # Pre-likelihood (< r3 session 3) batched files carry no likelihood
    # name: they were Gaussian by construction.
    ll_name = header.get("likelihood", "log_likelihood_normal")
    lls = _resolve([ll_name], log_likelihood, LIKELIHOOD_REGISTRY,
                   "log_likelihood", quiet)
    if fns is None or prior is None or lls is None:
        if not quiet:
            print("*Recommendations*")
            print(f"function: {header['function']}")
            print(f"log_likelihood: {ll_name}")
            print(f"log_prior: {header['prior']}")
        return None

    dtype = jnp.dtype(header["dtype"])
    keys = header["param_keys"]
    S, B = header["n_datasets"], header["walkers_per_dataset"]
    # The saved arrays are lane-padded (P = multiple of 128) with err = 0
    # on the pad rows; feeding those to BatchedFit as real data would
    # rebuild them as zero-error points (inf inv_sigma -> NaN posterior).
    # Slice back to the true length and let Dataset.create re-pad.
    ns = header.get("n_points_per_dataset") or [header["n_points"]] * S
    x, y, err = arrays["batch_x"], arrays["batch_y"], arrays["batch_err"]
    # Any valid guess works — the saved state replaces it — so use each
    # block's best walker.
    best_lp = arrays["best_logprob"].reshape(S, B)
    best_pos = arrays["best_position"].reshape(S, B, -1)
    guesses = [
        dict(zip(keys, best_pos[g, int(np.argmax(best_lp[g]))]))
        for g in range(S)
    ]
    fit = BatchedFit(
        fns[0], [(x[g, :ns[g]], y[g, :ns[g]]) for g in range(S)], guesses,
        data_error=[err[g, :ns[g]] for g in range(S)],
        log_prior=None if header["prior"] == "log_prior_flat" else prior,
        log_likelihood=lls[0],
        walkers_per_dataset=B, dtype=dtype,
        config=FitConfig(**header["config"]),
    )
    if header.get("subclass") == "BatchedNVFit":
        # Rebind to the saved subclass: BatchedNVFit holds no state of
        # its own (only derived properties over BatchedFit state), so
        # this restores n_spectra/field_offsets/best_params_per_spectrum
        # without re-running its guess/noise/prior derivations.
        from .nv import BatchedNVFit

        fit.__class__ = BatchedNVFit
    return _restore_state(fit, arrays, header, dtype)


def hierarchical_save(fit, path: str, take: int | None = None) -> None:
    """Save a :class:`~lisp_mcmc_tpu.HierarchicalFit` to ``path``.

    Same names-not-closures contract as :func:`batched_save`; the
    hierarchy's structure (pooled names, hyperpriors, non-pooled local
    priors) serializes as distribution RECIPES via each dist's
    ``to_meta`` — the prior is always a product of the named 1-D family,
    so no callable ever needs to travel.
    """
    from .hierarchical import HierarchicalFit

    if not isinstance(fit, HierarchicalFit):
        raise ValueError("hierarchical_save: not a HierarchicalFit; "
                         "use walker_save / batched_save")
    arrays = _stack_batch_arrays(fit, take)
    header = {
        **_batch_header_fields(fit),
        "kind": "hierarchical",
        "local_keys": list(fit.local_spec.keys),
        "pooled": list(fit.pooled),
        "hyper": {p: {"mu": mu.to_meta(), "tau": tau.to_meta()}
                  for p, (mu, tau) in fit._hyper.items()},
        "local_priors": {k: d.to_meta()
                         for k, d in fit._local_dists.items()},
        "correlation": fit.correlation,
        "corr_prior": (fit._corr_dist.to_meta()
                       if fit._corr_dist is not None else None),
        # First-class multi-term fits carry a SYNTHESIZED branching
        # model; serialize the per-term function NAMES so load can
        # rebuild the same where-chain via _term_branch_model (the
        # names resolve like any function: registry or explicit
        # function= list).
        "term_functions": [getattr(f, "__name__", "f")
                           for f in getattr(fit.terms[0].fn,
                                            "_term_fns", ())] or None,
        "term_one_col": getattr(fit.terms[0].fn, "_term_one_col", None),
        # Any valid guess rebuilds the fit (state replaces it); the
        # decoded per-dataset best is always valid.
        "guesses": [{k: float(v) for k, v in g.items()}
                    for g in fit.params_per_dataset("best")],
    }
    arrays["header"] = np.frombuffer(json.dumps(header).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def hierarchical_load(path: str, *, function=None, log_likelihood=None,
                      quiet: bool = False):
    """Load a :func:`hierarchical_save` checkpoint, resumable mid-run.

    The model resolves by registry name or explicit ``function=``;
    factory likelihoods (student-t, ...) must be re-supplied via
    ``log_likelihood`` (the reference's walker-load contract for
    unserializable callables, mcmc-fitting.lisp:996-997).  Hyper and
    local priors rebuild exactly from their serialized recipes.
    """
    from .hierarchical import HierarchicalFit
    from .models import MODEL_REGISTRY
    from .priors import _dist_from_meta

    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    header = json.loads(bytes(arrays.pop("header")).decode())
    if header.get("kind") != "hierarchical":
        raise ValueError("hierarchical_load: not a hierarchical checkpoint; "
                         "use walker_load / batched_load")
    if header["format_version"] > FORMAT_VERSION:
        raise ValueError(f"checkpoint format {header['format_version']} "
                         "is newer than supported")

    term_names = header.get("term_functions")
    if term_names:
        # Rebuild the synthesized multi-term branching model from the
        # per-term names (function= may supply the list explicitly).
        # A SINGLE callable must be refused here: _resolve would
        # broadcast it to every term and re-wrap it in the branch model
        # — a silently wrong posterior (and passing the fit's own
        # synthesized model would strip the term-id column twice;
        # review finding r5).
        from .hierarchical import _term_branch_model

        if function is not None and not isinstance(function,
                                                   (list, tuple)):
            raise ValueError(
                "hierarchical_load: this checkpoint holds a multi-term "
                f"fit of {len(term_names)} terms ({term_names}); pass "
                "function= as the LIST of per-term callables, not a "
                "single function")
        tfns = _resolve(term_names, function, MODEL_REGISTRY,
                        "function", quiet)
        fns = None if tfns is None else \
            [_term_branch_model(list(tfns), bool(header["term_one_col"]))]
    else:
        fns = _resolve([header["function"]], function, MODEL_REGISTRY,
                       "function", quiet)
    lls = _resolve([header["likelihood"]], log_likelihood,
                   LIKELIHOOD_REGISTRY, "log_likelihood", quiet)
    if fns is None or lls is None:
        if not quiet:
            print("*Recommendations*")
            print(f"function: {header.get('term_functions') or header['function']}")
            print(f"log_likelihood: {header['likelihood']}")
        return None

    dtype = jnp.dtype(header["dtype"])
    S = header["n_datasets"]
    ns = header["n_points_per_dataset"]
    x, y, err = arrays["batch_x"], arrays["batch_y"], arrays["batch_err"]
    hyper = {p: (_dist_from_meta(m["mu"]), _dist_from_meta(m["tau"]))
             for p, m in header["hyper"].items()}
    local_priors = {k: _dist_from_meta(m)
                    for k, m in header["local_priors"].items()}
    # Guess dicts must present keys in the saved local-spec order (the
    # walk-space layout derives from it).
    guesses = [{k: g[k] for k in header["local_keys"]}
               for g in header["guesses"]]
    corr_meta = header.get("corr_prior")
    fit = HierarchicalFit(
        fns[0], [(x[g, :ns[g]], y[g, :ns[g]]) for g in range(S)], guesses,
        data_error=[err[g, :ns[g]] for g in range(S)],
        pooled=header["pooled"], hyper=hyper,
        local_priors=local_priors or None,
        log_likelihood=lls[0],
        n_walkers=header["n_walkers"], dtype=dtype,
        config=FitConfig(**header["config"]),
        correlation=header.get("correlation", "diag"),
        corr_prior=_dist_from_meta(corr_meta) if corr_meta else None,
    )
    return _restore_state(fit, arrays, header, dtype)


def _resolve(names, supplied, registry, kind, quiet):
    """Resolve saved names to callables: explicit > registry > None."""
    if supplied is not None:
        supplied = supplied if isinstance(supplied, (list, tuple)) else [supplied] * len(names)
        if len(supplied) != len(names):
            raise ValueError(
                f"{kind}: {len(supplied)} callables supplied for "
                f"{len(names)} saved terms")
        return list(supplied)
    resolved = []
    for name in names:
        fn = registry.get(name)
        if fn is None:
            if not quiet:
                print(f"walker_load: cannot resolve {kind} {name!r}; "
                      f"pass it explicitly via the {kind} argument")
            return None
        resolved.append(fn)
    return resolved


def walker_load(path: str, *, function=None, log_likelihood=None, log_prior=None,
                log_posterior=None, batched_log_posterior=None,
                posterior_data=None, aux=None, quiet: bool = False):
    """Load a fit (``walker-load``, mcmc-fitting.lisp:987-1001).

    Without callables, function/likelihood/prior names are resolved from
    the registries; unresolvable names print *recommendations* and return
    None, exactly the reference's contract (997).  With callables (or
    fully-resolvable names), returns a reconstructed, resumable
    :class:`~lisp_mcmc_tpu.fit.Walker`.

    Custom-posterior checkpoints (written by :func:`walker_save` for
    walkers built with ``log_posterior=``/``batched_log_posterior=``)
    demand those callables back here — arrays round-trip, closures never
    serialize (the reference's own contract, mcmc-fitting.lisp:996-997).
    """
    from .fit import Walker, _Term
    from .models import MODEL_REGISTRY
    from .params import ParamSpec

    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    header = json.loads(bytes(arrays.pop("header")).decode())
    if header["format_version"] > FORMAT_VERSION:
        raise ValueError(f"checkpoint format {header['format_version']} is newer than supported")
    if header.get("kind") == "custom":
        return _custom_load(arrays, header, log_posterior=log_posterior,
                            batched_log_posterior=batched_log_posterior,
                            posterior_data=posterior_data, aux=aux, quiet=quiet)

    term_meta = header["terms"]
    fn_names = [t["function"] for t in term_meta]
    ll_names = [t["likelihood"] for t in term_meta]
    lp_names = [t["prior"] for t in term_meta]

    _register_domain_priors()
    functions = _resolve(fn_names, function, MODEL_REGISTRY, "function", quiet)
    likelihoods = _resolve(ll_names, log_likelihood, LIKELIHOOD_REGISTRY, "log_likelihood", quiet)
    supplied = (log_prior if isinstance(log_prior, (list, tuple))
                else [log_prior] * len(term_meta))
    if len(supplied) != len(term_meta):
        raise ValueError(
            f"log_prior: {len(supplied)} callables supplied for "
            f"{len(term_meta)} saved terms")
    priors = [_resolve_prior(t, s, quiet) for t, s in zip(term_meta, supplied)]
    if any(p is None for p in priors):
        priors = None
    if functions is None or likelihoods is None or priors is None:
        if not quiet:
            print("*Recommendations*")
            print(f"function: {fn_names}")
            print(f"log_likelihood: {ll_names}")
            print(f"log_prior: {lp_names}")
        return None

    dtype = jnp.dtype(header["dtype"])
    spec = ParamSpec(tuple(header["param_keys"]))
    cfg = FitConfig(**header["config"])

    terms = []
    for i, (meta, fn, ll, lp) in enumerate(zip(term_meta, functions, likelihoods, priors)):
        ds = Dataset(
            x=jnp.asarray(arrays[f"term{i}_x"], dtype),
            y=jnp.asarray(arrays[f"term{i}_y"], dtype),
            sigma=jnp.asarray(arrays[f"term{i}_sigma"], dtype),
            mask=jnp.asarray(arrays[f"term{i}_mask"], dtype),
            n=meta["n"],
        )
        terms.append(_Term(fn=fn, dataset=ds, likelihood=ll, prior=lp))

    walker = Walker.__new__(Walker)
    walker.terms = terms
    walker.spec = spec
    walker.config = cfg
    walker.dtype = dtype
    walker.n_walkers = header["n_walkers"]
    walker._runner_cache = {}
    walker._custom_log_post = None
    walker._custom_data = None
    walker._custom_batched = None
    walker.aux = None
    walker.group_ids = None
    walker.n_groups = int(np.asarray(arrays["l_matrix"]).shape[0])
    walker._log_post_one = walker._build_log_posterior()
    return _restore_state(walker, arrays, header, dtype)


def walker_set_save(walker_set: Sequence, path_prefix: str, take: int | None = None) -> None:
    """Save a set of fits (``walker-set-save``, mcmc-fitting.lisp:1005-1011)."""
    for i, w in enumerate(walker_set):
        walker_save(w, f"{path_prefix}{i:04d}.npz", take)


def walker_set_load(paths: Sequence[str], **kwargs):
    """Load a set of fits (``walker-set-load``, mcmc-fitting.lisp:1013-1027).

    Returns ``None`` (after the usual recommendations) if ANY member fails
    to resolve — a set with silent ``None`` holes would defer the failure
    to an unrelated AttributeError on first use.
    """
    from .walker_set import WalkerSet

    loaded = [walker_load(p, **kwargs) for p in paths]
    if any(w is None for w in loaded):
        return None
    return WalkerSet(loaded)
