"""On-device convergence diagnostics: ESS, split R-hat, autocorrelation.

The reference has no cross-chain statistics (single chain by
construction); its convergence story is the likelihood-trace heuristics
(``stable-probs-p``, mcmc-fitting.lisp:880-887).  The rebuild's metric
pair is chain-steps/sec AND ESS/sec (BASELINE.md), and multi-walker
ensembles make R-hat natural, so these are first-class device reductions:
they run on the ``(T, W)`` history *before* host transfer (BASELINE.json:
"diagnostics reduce on device before host transfer").
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["autocorrelation", "effective_sample_size", "split_rhat",
           "rank_normalized_rhat", "tail_ess", "mcse_mean"]


def autocorrelation(chains, max_lag: int | None = None):
    """Normalized autocorrelation per chain via FFT.

    ``chains``: (T, W) samples.  Returns (L, W) autocorrelations for lags
    0..L-1 where L = ``max_lag`` or T.
    """
    chains = jnp.asarray(chains)
    T = chains.shape[0]
    L = max_lag or T
    x = chains - jnp.mean(chains, axis=0, keepdims=True)
    # Zero-pad to >= 2T for linear (non-circular) autocorrelation.
    n = 1 << (2 * T - 1).bit_length()
    f = jnp.fft.rfft(x, n=n, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=n, axis=0)[:T]
    acov = acov / jnp.arange(T, 0, -1)[:, None]  # unbiased normalization
    var0 = jnp.where(acov[0] > 0, acov[0], 1.0)
    return (acov / var0)[:L]


def effective_sample_size(chains):
    """ESS with Geyer's initial positive sequence truncation.

    ``chains``: (T, W).  Returns the total ESS over all W chains (scalar).
    Pairs consecutive-lag autocorrelations and truncates at the first
    non-positive pair sum, the standard initial-positive-sequence rule.
    """
    chains = jnp.asarray(chains)
    T, W = chains.shape
    rho = autocorrelation(chains)  # (T, W)
    # Pair sums rho[2k+1] + rho[2k+2]; stop where they go non-positive.
    n_pairs = (T - 1) // 2
    pair = rho[1 : 1 + 2 * n_pairs].reshape(n_pairs, 2, W).sum(axis=1)  # (P, W)
    positive = pair > 0
    # Monotone mask: True until the first False (cumulative AND).
    keep = jnp.cumprod(positive.astype(jnp.int32), axis=0).astype(bool)
    tau = 1.0 + 2.0 * jnp.sum(jnp.where(keep, pair, 0.0), axis=0)  # (W,)
    tau = jnp.maximum(tau, 1.0)
    # A frozen chain (zero variance: a walker that never accepted in the
    # window) has rho = 0 everywhere, so tau = 1 and it would count as T
    # perfectly-independent samples — the OPPOSITE of the truth.  A
    # constant chain carries one sample of information; count it as 1.
    # (Measured: a ~25%-frozen population inflated min-ESS ~5x.)
    moving = jnp.var(chains, axis=0) > 0                           # (W,)
    return jnp.sum(jnp.where(moving, T / tau, 1.0))


def split_rhat(chains):
    """Split-chain Gelman-Rubin R-hat over the walker ensemble.

    ``chains``: (T, W) samples of one quantity across W walkers.  Each
    chain is split in half (2W half-chains of length T//2); values near
    1.0 indicate convergence.
    """
    chains = jnp.asarray(chains)
    T = chains.shape[0] // 2 * 2
    halves = jnp.concatenate([chains[: T // 2], chains[T // 2 : T]], axis=1)  # (T/2, 2W)
    n, m = halves.shape
    chain_means = jnp.mean(halves, axis=0)
    chain_vars = jnp.var(halves, axis=0, ddof=1)
    w = jnp.mean(chain_vars)
    b = n * jnp.var(chain_means, ddof=1)
    var_plus = (n - 1) / n * w + b / n
    # A frozen ensemble (every chain ~zero variance) must read as
    # NOT-converged: w = 0 with any between-chain spread would otherwise
    # return sqrt(b/n) in raw parameter units — tiny spreads pass the
    # rhat < 1.01 auto-stop on a run that never moved.  The guard is
    # RELATIVE (w vs var_plus) because identical-sample chains still
    # carry ~1-ulp variance from mean rounding; w below 1e-12 of the
    # pooled variance means rhat > 1e6 regardless, so inf is monotone.
    ok = w > 1e-12 * var_plus
    return jnp.where(ok, jnp.sqrt(var_plus / jnp.where(ok, w, 1.0)), jnp.inf)


def _rank_normalize(chains):
    """Average-rank normal-score transform over all samples jointly.

    Ranks the flattened ``(T, W)`` block (ties get their average rank —
    essential: ordinal tie-breaking would hand a frozen ensemble's
    identical values a fake spread of ranks and defeat
    :func:`split_rhat`'s frozen guard), then maps rank r to
    z = ndtri((r - 3/8) / (S + 1/4)) — the Blom normal scores used by
    Vehtari, Gelman, Simpson, Carpenter & Burkner (2021, "Rank-
    normalization, folding, and localization").  One sort + two
    searchsorted passes, all on device.
    """
    from jax.scipy.special import ndtri

    chains = jnp.asarray(chains)
    v = chains.reshape(-1)
    s = jnp.sort(v)
    lo = jnp.searchsorted(s, v, side="left")
    hi = jnp.searchsorted(s, v, side="right")
    r = 0.5 * (lo + hi - 1) + 1.0                  # 1-based average ranks
    z = ndtri((r - 0.375) / (v.size + 0.25))
    return z.reshape(chains.shape)


def rank_normalized_rhat(chains):
    """(bulk, tail) rank-normalized split R-hat (Vehtari et al. 2021).

    The modern convergence standard, strictly stronger than classic
    :func:`split_rhat`: rank normalization makes *bulk* R-hat robust to
    heavy tails, and running the same statistic on the *folded* draws
    |x - median| catches chains that agree in location but not scale —
    invisible to any mean/variance R-hat (between-chain variance of the
    means is zero there).  Report max(bulk, tail); both < 1.01 is the
    usual pass bar.  ``chains``: (T, W).
    """
    chains = jnp.asarray(chains)
    bulk = split_rhat(_rank_normalize(chains))
    folded = jnp.abs(chains - jnp.median(chains))
    tail = split_rhat(_rank_normalize(folded))
    return bulk, tail


def tail_ess(chains):
    """Tail effective sample size: min ESS of the 5%/95% exceedance chains.

    Bulk ESS says nothing about how well the chain resolves its extremes
    (credible-interval endpoints); the Vehtari et al. (2021) tail-ESS is
    the ESS of the indicator chains I(x <= q05) and I(x >= q95), taking
    the worse side.  A walker that never visits a tail contributes its
    frozen-chain floor of 1 via :func:`effective_sample_size`.
    """
    chains = jnp.asarray(chains)
    q05 = jnp.quantile(chains, 0.05)
    q95 = jnp.quantile(chains, 0.95)
    lo = effective_sample_size((chains <= q05).astype(chains.dtype))
    hi = effective_sample_size((chains >= q95).astype(chains.dtype))
    return jnp.minimum(lo, hi)


def mcse_mean(chains):
    """Monte Carlo standard error of the posterior mean.

    Pooled posterior sd scaled by the autocorrelation-aware sample count:
    sqrt(var / ESS).  This is the "+-" a mean estimate should be quoted
    with; it shrinks with more sampling while the posterior sd does not.
    """
    chains = jnp.asarray(chains)
    ess = effective_sample_size(chains)
    return jnp.sqrt(jnp.var(chains, ddof=1) / jnp.maximum(ess, 1.0))
