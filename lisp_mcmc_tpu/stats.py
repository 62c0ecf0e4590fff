"""Descriptive statistics (reference C17, mcmc-fitting.lisp:1491-1538).

Device-friendly implementations of the reference's stats helpers:
``nth-percentile`` (1495), ``95cr`` (1508), ``iqr`` (1511), ``median``
(1515), ``mean`` (1518), ``variance`` (1521), ``standard-deviation``
(1526), and the robust normal sigma from the 84.1th percentile
(1529-1538).  Also the histogram binning used by the plot layer
(``make-histo``, 1542-1564).

All functions accept array-likes and work on the last axis by default, so
they can run on-device over ``(W, T)`` chain batches before host transfer.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "nth_percentile",
    "credible_interval_95",
    "hdi",
    "iqr",
    "median",
    "mean",
    "variance",
    "standard_deviation",
    "std_from_84th_percentile",
    "multivariate_gaussian_random",
    "make_histogram",
]


def nth_percentile(x, n, axis=-1):
    """``nth-percentile`` (mcmc-fitting.lisp:1495): linear interpolation."""
    return jnp.percentile(jnp.asarray(x), n, axis=axis)


def hdi(samples, level: float = 0.95):
    """Highest-density interval: the SHORTEST interval holding ``level``
    of the samples.

    For skewed posteriors the central (equal-tailed) interval excludes
    high-density points near the short tail while including low-density
    ones in the long tail; the HDI is the decision-relevant summary
    there (for symmetric posteriors the two coincide).  Computed by the
    standard sliding-window minimum over the sorted samples.  Non-finite
    samples (a derived expression undefined on part of the posterior)
    are dropped — NaNs sort to the end, poison the window widths, and
    argmin would return a NaN-anchored garbage interval otherwise.
    """
    s = np.asarray(samples, float).ravel()
    s = np.sort(s[np.isfinite(s)])
    n = s.size
    if n < 2:
        raise ValueError("hdi: need at least 2 finite samples")
    if not 0.0 < level < 1.0:
        raise ValueError(f"hdi: level must be in (0, 1), got {level}")
    k = max(2, int(np.ceil(level * n)))
    widths = s[k - 1:] - s[: n - k + 1]
    i = int(np.argmin(widths))
    return float(s[i]), float(s[i + k - 1])


def credible_interval_95(x, axis=-1):
    """Central 95% credible interval (``95cr``, 1508): (2.5th, 97.5th)."""
    lo = nth_percentile(x, 2.5, axis)
    hi = nth_percentile(x, 97.5, axis)
    return lo, hi


def iqr(x, axis=-1):
    """Interquartile range (``iqr``, 1511)."""
    return nth_percentile(x, 75, axis) - nth_percentile(x, 25, axis)


def median(x, axis=-1):
    return jnp.median(jnp.asarray(x), axis=axis)


def mean(x, axis=-1):
    return jnp.mean(jnp.asarray(x), axis=axis)


def variance(x, axis=-1):
    """Population variance (``variance``, 1521 divides by N)."""
    return jnp.var(jnp.asarray(x), axis=axis)


def standard_deviation(x, axis=-1):
    return jnp.std(jnp.asarray(x), axis=axis)


def std_from_84th_percentile(x, axis=-1):
    """Robust sigma: 84.1th percentile minus median (mcmc-fitting.lisp:1529-1538).

    For a Gaussian, P84.1 - P50 = 1 sigma; robust to heavy tails.
    """
    return nth_percentile(x, 84.1, axis) - median(x, axis)


def multivariate_gaussian_random(key, stddevs):
    """Independent per-axis Gaussian draw (``multivariate-gaussian-random``, 1492)."""
    import jax

    stddevs = jnp.asarray(stddevs)
    return jax.random.normal(key, stddevs.shape, stddevs.dtype) * stddevs


def make_histogram(samples, bins: int | None = None):
    """Histogram with the reference's auto-binning (``make-histo``, 1542-1557).

    Bin count defaults to a Freedman-Diaconis-style rule; returns
    ``(counts, centers)`` like the reference's (histo, centers) pair
    (1559-1564).
    """
    samples = np.asarray(samples).ravel()
    if bins is None:
        spread = np.subtract(*np.percentile(samples, [75, 25]))
        width = 2.0 * spread / max(1.0, len(samples) ** (1.0 / 3.0))
        if width <= 0:
            bins = 10
        else:
            bins = int(np.clip(np.ceil((samples.max() - samples.min()) / width), 1, 200))
    counts, edges = np.histogram(samples, bins=bins)
    centers = 0.5 * (edges[:-1] + edges[1:])
    return counts, centers
