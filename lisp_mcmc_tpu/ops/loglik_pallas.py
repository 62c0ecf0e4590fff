"""Fused Pallas posterior kernel: residual -> logpdf -> masked-sum on TPU.

This is SURVEY §7 phase 5: the reference's hottest math — the dataset
likelihood reduction inside ``walker-make-step`` (mcmc-fitting.lisp:
1067-1070, reducing ``log-liklihood-normal`` 393-400 over every data
point) — built as one Pallas TPU kernel over the walker batch.

Layout: walkers ride the *lane* axis.  Each grid program sees a
``(d, WB)`` parameter block (one sublane row per parameter, so per-walker
scalars like ``cos(mix)`` vectorize across 128-lane tiles), the dataset as
``(NP, 1)`` columns broadcast across lanes, and produces a ``(1, WB)``
log-posterior row.  Model eval, log-pdf, prior penalty, and the masked
point reduction stay fused in VMEM; no ``(W, N)`` intermediate touches
HBM.  Walker-independent terms (``log sigma`` sums, ``1/sigma``,
``lgamma(y!)``) are precomputed host-side once per fit.

Benchmark verdict (TPU v5e-1, 65536 walkers, test.lisp fit): this kernel
sustains ~178M chain-steps/sec vs ~250M for the XLA-fused ``jax.vmap``
path in :mod:`lisp_mcmc_tpu.likelihoods` — XLA's elementwise fusion beats
Mosaic codegen on this broadcast-heavy pattern, so per SURVEY §7
("benchmark vs the XLA version; keep the faster") the XLA path is the
default and this kernel is kept as a forced option
(``FitConfig(posterior_impl="pallas")``) and as the substrate for future
kernel work (e.g. whole-chunk-in-VMEM stepping).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_fused_posterior", "fusable_terms", "pick_block",
           "prepare_fused_terms"]

_CUTOFF_DEFAULT = -5000.0


def _likelihood_kind(likelihood: Callable) -> str | None:
    """Classify a likelihood reduction for in-kernel fusion.

    Identity-based: only the library reductions have known algebra.  A
    custom or data-specialized likelihood returns ``None`` (not fusable).
    """
    from ..likelihoods import (
        log_likelihood_normal,
        log_likelihood_normal_cutoff,
        log_likelihood_poisson,
    )

    if likelihood is log_likelihood_normal:  # weighted variant is an alias
        return "normal"
    if likelihood is log_likelihood_normal_cutoff:
        return "normal_cutoff"
    if likelihood is log_likelihood_poisson:
        return "poisson"
    return None


def fusable_terms(terms) -> bool:
    """True if every posterior term can run inside the fused kernel."""
    for t in terms:
        if _likelihood_kind(t.likelihood) is None:
            return False
        if np.ndim(t.dataset.x) != 1:
            return False  # multi-column x: fall back to the XLA path
    return True


def pick_block(n_walkers: int, preferred: int = 2048) -> int | None:
    """Largest lane-aligned walker block <= preferred that divides W."""
    for wb in (preferred, 1024, 512, 256, 128):
        if wb <= n_walkers and n_walkers % wb == 0:
            return wb
    return None


def prepare_fused_terms(terms, dtype):
    """Host-side precomputation shared by the fused kernels.

    Returns ``(term_inputs, term_meta, scalar_const)``: per-term tuples
    of ``(NP, 1)``-column device arrays, ``(kind, fn, prior, n_inputs)``
    metadata, and the walker-independent normalization constant (added
    OUTSIDE the kernels — it cancels in MH ratios).
    """
    term_inputs: list[tuple] = []
    term_meta: list[tuple] = []
    scalar_const = jnp.asarray(0.0, dtype)
    for t in terms:
        kind = _likelihood_kind(t.likelihood)
        ds = t.dataset
        x = jnp.asarray(ds.x, dtype)[:, None]
        y = jnp.asarray(ds.y, dtype)[:, None]
        if kind == "normal":
            inv_sigma = jnp.asarray(ds.inv_sigma, dtype)[:, None]
            scalar_const = scalar_const + jnp.asarray(ds.log_norm_const, dtype)
            term_inputs.append((x, y, inv_sigma))
            term_meta.append((kind, t.fn, t.prior, 3))
        elif kind == "normal_cutoff":
            inv_sigma = jnp.asarray(ds.inv_sigma, dtype)[:, None]
            c_pt = jnp.asarray(ds.log_norm_const_point, dtype)[:, None]
            mask = jnp.asarray(ds.mask, dtype)[:, None]
            term_inputs.append((x, y, inv_sigma, c_pt, mask))
            term_meta.append((kind, t.fn, t.prior, 5))
        else:  # poisson
            mask = jnp.asarray(ds.mask, dtype)[:, None]
            scalar_const = scalar_const - jnp.sum(jnp.asarray(ds.log_fact_y, dtype))
            term_inputs.append((x, y, mask))
            term_meta.append((kind, t.fn, t.prior, 3))
    return term_inputs, term_meta, scalar_const


def build_fused_posterior(
    terms,
    spec,
    dtype,
    n_walkers: int,
    *,
    block_walkers: int = 2048,
    interpret: bool = False,
):
    """Build ``positions (W, d) -> (W,) log-posterior`` as one Pallas kernel.

    Returns ``None`` when the fit is outside the kernel's coverage
    (custom likelihoods, multi-column x, dataset-reading priors, walker
    counts with no lane-aligned block size) — the caller then uses the
    XLA vmap path.  Priors are traced into the kernel on broadcastable
    ``(1, WB)`` parameter rows with ``dataset=None``; a prior that needs
    the dataset raises at build time and triggers the fallback.
    """
    if not fusable_terms(terms):
        return None
    wb = pick_block(n_walkers, block_walkers)
    if wb is None:
        return None

    d = spec.ndim
    keys = spec.keys

    # Host-side precomputation of walker-independent dataset terms, laid
    # out as (NP, 1) columns so they broadcast across the walker lanes.
    term_inputs, term_meta, scalar_const = prepare_fused_terms(terms, dtype)
    flat_inputs = [a for tup in term_inputs for a in tup]

    def kernel(pos_ref, *refs):
        out_ref = refs[-1]
        data_refs = refs[:-1]
        theta = pos_ref[:]                                   # (d, WB)
        params = {k: theta[i : i + 1, :] for i, k in enumerate(keys)}
        total = jnp.zeros((1, wb), dtype)
        idx = 0
        for kind, fn, prior, n_in in term_meta:
            block = data_refs[idx : idx + n_in]
            idx += n_in
            x = block[0][:]                                  # (NP, 1)
            y = block[1][:]
            mu = fn(x, params)                               # (NP, WB) via broadcast
            if kind == "normal":
                z = (y - mu) * block[2][:]
                total += -0.5 * jnp.sum(z * z, axis=0, keepdims=True)
            elif kind == "normal_cutoff":
                z = (y - mu) * block[2][:]
                lp = jnp.maximum(_CUTOFF_DEFAULT, block[3][:] - 0.5 * z * z)
                total += jnp.sum(lp * block[4][:], axis=0, keepdims=True)
            else:  # poisson
                mask = block[2][:]
                lp = (y * jnp.log(mu) - mu) * mask
                total += jnp.sum(lp, axis=0, keepdims=True)
            pr = prior(params, None)                         # (1, WB) or scalar
            total += jnp.broadcast_to(jnp.asarray(pr, dtype), (1, wb))
        out_ref[:] = total

    grid = (n_walkers // wb,)
    in_specs = [pl.BlockSpec((d, wb), lambda i: (0, i), memory_space=pltpu.VMEM)]
    for arr in flat_inputs:
        in_specs.append(
            pl.BlockSpec(arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, wb), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_walkers), dtype),
        interpret=interpret,
    )

    # Smoke-trace now so unfusable priors/models fall back at build time,
    # not at first step inside the jitted scan.
    try:
        jax.eval_shape(
            lambda p: call(p, *flat_inputs), jax.ShapeDtypeStruct((d, n_walkers), dtype)
        )
    except Exception:
        return None

    def eval_logpost(positions):
        out = call(positions.T.astype(dtype), *flat_inputs)
        return out[0, :] + scalar_const

    return eval_logpost
