"""NV-center magnetometry pipeline (reference C22, nv-specific.lisp).

Rebuilds the domain layer end to end:
  - data loaders: per-column spectrum separation (``nv-data->separated``,
    nv-specific.lisp:5-6) and directory ingestion with ';' delimiters
    (``nv-dir->data``, 8-10)
  - NV likelihood (12-19).  NOTE the reference passes ``(log-normal model
    error y)`` — argument order swaps sigma and y so the *y value* is used
    as the standard deviation (SURVEY §2.2); this rebuild implements the
    intended behavior (y ~ Normal(model, error)).
  - physics prior (21-34): box bounds on scales/mus/sigma/bg plus hard
    constraints mu1 < mu2, mu2 - mu1 >= 6 MHz, 0.9 < scale1/scale2 < 1.1,
    each at -1e9.
  - noise estimate from the quieter of the first/last deciles (36-41)
  - parameter auto-guess (43-48)
  - per-spectrum walker factory + batch drivers (50-66)
  - field-offset derived quantity (68-69): (mu2 - mu1) / 2 / 2.8 Oe
  - scan-grid export + heatmap (76-105)

TPU scaling redesign (SURVEY §3.4): the reference fits k spectra
*sequentially* (k x wall time); here same-length spectra stack into a
``(S, P)`` batch fitted as ONE ensemble of S x W walkers with per-spectrum
adaptation groups — the "1e5+ parallel walkers sharded across chips"
configuration of BASELINE.json.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .data import Dataset, pad_to
from .fit import Walker, walker_create
from .io import get_filename, read_file_data
from .likelihoods import log_likelihood_normal
from .params import ParamSpec
from .priors import constraint_penalty, make_bounds_prior
from .expressions import walker_with_expression
from .models import double_lorentzian_bg
from .walker_set import WalkerSet

__all__ = [
    "nv_data_separated",
    "nv_dir_data",
    "log_prior_nv",
    "make_nv_prior",
    "nv_data_std_dev",
    "guess_nv_params",
    "nv_walker",
    "fit_nv_file",
    "fit_nv_dir",
    "BatchedNVFit",
    "fit_nv_spectra_batched",
    "walker_field_offset",
    "export_scan_grid",
]

FIELD_OFFSET_EXPRESSION = "(/ (- :mu2 :mu1) 2 2.8)"  # nv-specific.lisp:68-69


def nv_data_separated(table):
    """Split a multi-column table into (x, y_i) spectra
    (``nv-data->separated``, nv-specific.lisp:5-6)."""
    x = np.asarray(table[0], dtype=np.float64)
    return [(x, np.asarray(y, dtype=np.float64)) for y in table[1:]]


def nv_dir_data(directory: str):
    """All spectra from every file in a directory, ';'-delimited
    (``nv-dir->data``, nv-specific.lisp:8-10)."""
    spectra = []
    for path in get_filename(directory):
        spectra.extend(nv_data_separated(read_file_data(path, delim=";")))
    return spectra


def _nv_constraints(p, pens, ds):
    """Hard physics constraints (nv-specific.lisp:31-34)."""
    return (
        constraint_penalty(p["mu1"] <= p["mu2"])
        + constraint_penalty(p["mu2"] - p["mu1"] >= 6.0)
        + constraint_penalty(
            (0.9 < p["scale1"] / p["scale2"]) & (p["scale1"] / p["scale2"] < 1.1)
        )
    )


# Physics prior (nv-specific.lisp:21-34): the reference's exact boxes and
# constraints.  NOTE these amplitude boxes assume the reference lab's y
# units (backgrounds below 1e-5); the pipeline factories below default to
# make_nv_prior(y), which rescales them to the actual spectrum.
log_prior_nv = make_bounds_prior(
    {
        "scale1": (1e-5, 1e1),
        "scale2": (1e-5, 1e1),
        "mu1": (2850, 2870),
        "mu2": (2870, 2890),
        "sigma": (9, 20),
        "bg0": (0, 1e-5),
    },
    extra=_nv_constraints,
)
log_prior_nv.__name__ = "log_prior_nv"  # stable name for checkpoints


def make_nv_prior(y=None):
    """NV prior with amplitude boxes scaled to the spectrum's units.

    The mu/sigma boxes are physical (MHz) and stay fixed; scale1/scale2/
    bg0 are in y units, so the reference's literal boxes (tuned to its
    lab files, backgrounds < 1e-5) would reject any normalized spectrum
    — its own auto-guess included.  With ``y`` the boxes span generous
    multiples of the observed contrast/background; without ``y`` this is
    exactly :data:`log_prior_nv`.
    """
    if y is None:
        return log_prior_nv
    y = np.asarray(y, dtype=np.float64)
    contrast = max(float(y.max() - y.min()), 1e-300)
    spread = 5.0 * contrast
    return make_bounds_prior(
        {
            "scale1": (1e-3 * contrast, 1e3 * contrast),
            "scale2": (1e-3 * contrast, 1e3 * contrast),
            "mu1": (2850, 2870),
            "mu2": (2870, 2890),
            "sigma": (9, 20),
            "bg0": (float(y.min()) - spread, float(y.max()) + spread),
        },
        extra=_nv_constraints,
    )


def nv_data_std_dev(y) -> float:
    """Noise estimate: the quieter of the first/last deciles of the trace
    (``nv-data-std-dev``, nv-specific.lisp:36-41)."""
    y = np.asarray(y, dtype=np.float64)
    k = max(1, len(y) // 10)
    return float(min(np.std(y[:k]), np.std(y[-k:])))


def guess_nv_params(y) -> dict:
    """Initial parameter guess (``guess-nv-params``, nv-specific.lisp:43-48).

    The reference divides the y-contrast by 4.4d-5 because its (unpublished)
    model normalizes dip depth differently; this rebuild's
    ``double_lorentzian_bg`` expresses scale directly in y units, so the
    guess is the contrast itself.
    """
    y = np.asarray(y, dtype=np.float64)
    contrast = float(y.max() - y.min())
    return {
        "scale1": contrast,
        "scale2": contrast,
        "mu1": 2863.0,
        "mu2": 2873.0,
        "sigma": 10.0,
        "bg0": float(y.max()),
    }


def nv_walker(data, n_walkers: int = 256, seed: int = 0, **kwargs) -> Walker:
    """Single-spectrum walker factory (``nv-walker``, nv-specific.lisp:50-56).

    The prior defaults to :func:`make_nv_prior` scaled to this spectrum's
    y units; pass ``log_prior=...`` to override.
    """
    x, y = data
    return walker_create(
        function=double_lorentzian_bg,
        data=(x, y),
        params=guess_nv_params(y),
        data_error=nv_data_std_dev(y),
        log_likelihood=log_likelihood_normal,
        log_prior=kwargs.pop("log_prior", None) or make_nv_prior(y),
        n_walkers=n_walkers,
        seed=seed,
        walker_jitter=kwargs.pop("walker_jitter", 0.02),
        **kwargs,
    )


def fit_nv_file(filename: str, n_steps: int | None = None, **kwargs) -> WalkerSet:
    """Sequential per-spectrum fits of one file (``file->nv-walkers``,
    nv-specific.lisp:63-66).  Prefer :func:`fit_nv_spectra_batched` for
    throughput."""
    walkers = WalkerSet(nv_walker(d, **kwargs) for d in
                        nv_data_separated(read_file_data(filename, delim=";")))
    walkers.adaptive_steps(n_steps)
    return walkers


def fit_nv_dir(directory: str, n_steps: int | None = None, **kwargs) -> WalkerSet:
    """Sequential fits of every spectrum in a directory
    (``dir->nv-walkers``, nv-specific.lisp:58-61)."""
    walkers = WalkerSet(nv_walker(d, **kwargs) for d in nv_dir_data(directory))
    walkers.adaptive_steps(n_steps)
    return walkers


class BatchedNVFit(Walker):
    """S spectra fitted as one ensemble: the TPU walker-set.

    Spectra (same frequency grid length) stack into ``(S, P)`` y / sigma
    arrays; the ensemble has ``S * walkers_per_spectrum`` walkers whose
    per-walker spectrum index is the kernel ``aux``; each spectrum is its
    own adaptation group (per-group proposal covariance).  One fit replaces
    the reference's k sequential fits (nv-specific.lisp:60).
    """

    def __init__(self, spectra, walkers_per_spectrum: int = 128, seed: int = 0,
                 model=double_lorentzian_bg, prior=None, dtype=None,
                 config=None, walker_jitter: float = 0.02):
        from .fit import default_dtype

        dtype = dtype or default_dtype()
        S = len(spectra)
        if S == 0:
            raise ValueError("no spectra provided")
        if prior is None:
            # Amplitude boxes scaled to the pooled y range of all spectra.
            prior = make_nv_prior(np.concatenate(
                [np.asarray(y, np.float64) for _, y in spectra]
            ))
        x0 = np.asarray(spectra[0][0], dtype=np.float64)
        P = pad_to(len(x0))
        ys, sigmas, guesses = [], [], []
        for x, y in spectra:
            if len(x) != len(x0) or not np.allclose(x, x0):
                raise ValueError(
                    "BatchedNVFit requires a shared frequency grid; "
                    "use fit_nv_file for ragged spectra"
                )
            yp = np.pad(np.asarray(y, np.float64), (0, P - len(y)), mode="edge")
            ys.append(yp)
            sigmas.append(np.full(P, nv_data_std_dev(y)))
            guesses.append(guess_nv_params(y))

        xp = np.pad(x0, (0, P - len(x0)), mode="edge")
        mask = np.zeros(P)
        mask[: len(x0)] = 1.0

        self.n_spectra = S
        self.walkers_per_spectrum = walkers_per_spectrum
        x_dev = jnp.asarray(xp, dtype)
        y_dev = jnp.asarray(np.stack(ys), dtype)        # (S, P)
        sig_dev = jnp.asarray(np.stack(sigmas), dtype)  # (S, P)
        mask_dev = jnp.asarray(mask, dtype)
        # Representative dataset (spectrum 0) for plotting/term APIs.
        ds0 = Dataset(x=x_dev, y=y_dev[0], sigma=sig_dev[0], mask=mask_dev, n=len(x0))

        spec = ParamSpec.from_params(guesses[0])
        sigma_log_term = jnp.sum(
            (-0.5 * np.log(2 * np.pi) - jnp.log(sig_dev)) * mask_dev, axis=1
        )  # (S,) constant per spectrum

        # The spectra arrays ride as the posterior's runtime data argument
        # (NOT closure constants), so a new scan file of the same shape
        # reuses the compiled kernel (and the persistent XLA cache hits).
        # inv_sigma folds the mask and the 1/sigma normalization into one
        # precomputed multiplier (no per-step divide in the hot block).
        batch_data = {
            "x": x_dev, "y": y_dev, "sigma": sig_dev, "mask": mask_dev,
            "inv_sigma": mask_dev * (1.0 / sig_dev),
            "sigma_log_term": sigma_log_term,
        }

        def log_post(theta, spectrum_idx, data):
            """Per-walker posterior (diagnostics path): gathers one spectrum."""
            params = spec.unflatten(theta)
            mu = model(data["x"], params)
            z = (data["y"][spectrum_idx] - mu) * data["inv_sigma"][spectrum_idx]
            ll = data["sigma_log_term"][spectrum_idx] - 0.5 * jnp.sum(z * z)
            return ll + prior(params, None)

        def batched_log_post(positions, data):
            """Hot-path posterior for the whole (W, d) batch.

            Walkers are ordered by spectrum (group_ids = repeat(arange(S))),
            so reshaping to (S, wps, d) aligns each walker block with its
            spectrum row — NO per-walker data gather (a per-step (W, P)
            gather measured ~30x slower than this on TPU v5e).
            """
            pos_s = positions.reshape(S, walkers_per_spectrum, -1)

            def per_spectrum(theta_block, y, inv_sig, const):
                def one(theta):
                    params = spec.unflatten(theta)
                    mu = model(data["x"], params)
                    z = (y - mu) * inv_sig
                    ll = const - 0.5 * jnp.sum(z * z)
                    return ll + prior(params, None)

                return jax.vmap(one)(theta_block)

            lps = jax.vmap(per_spectrum)(
                pos_s, data["y"], data["inv_sigma"], data["sigma_log_term"]
            )
            return lps.reshape(positions.shape[0])

        W = S * walkers_per_spectrum
        group_ids = np.repeat(np.arange(S, dtype=np.int32), walkers_per_spectrum)
        init = np.stack(
            [np.asarray([g[k] for k in spec.keys], np.float64) for g in guesses]
        )  # (S, d)
        positions = np.repeat(init, walkers_per_spectrum, axis=0)  # (W, d)

        from .fit import _Term

        super().__init__(
            terms=[_Term(fn=model, dataset=ds0, likelihood=log_likelihood_normal,
                         prior=prior)],
            spec=spec,
            initial_vector=jnp.asarray(positions, dtype),
            n_walkers=W,
            seed=seed,
            walker_jitter=walker_jitter,
            config=config,
            dtype=dtype,
            aux=jnp.asarray(group_ids),
            group_ids=group_ids,
            n_groups=S,
            log_posterior=log_post,
            posterior_data=batch_data,
            batched_log_posterior=batched_log_post,
        )

    def best_params_per_spectrum(self):
        """Per-spectrum most-likely params: argmax within each group."""
        best_lp = np.asarray(self.state.best_logprob)
        best_pos = np.asarray(self.state.best_position)
        gid = np.asarray(self.group_ids)
        out = []
        for s in range(self.n_spectra):
            idx = np.flatnonzero(gid == s)
            w = idx[np.argmax(best_lp[idx])]
            out.append(self.spec.make(best_pos[w].tolist()))
        return out

    def field_offsets(self):
        """Per-spectrum field offset in Oe (``walker-field-offset``,
        nv-specific.lisp:68-69): (mu2 - mu1) / 2 / 2.8."""
        return [
            (p["mu2"] - p["mu1"]) / 2.0 / 2.8 for p in self.best_params_per_spectrum()
        ]


def fit_nv_spectra_batched(spectra, n_steps: int | None = None,
                           walkers_per_spectrum: int = 128, **kwargs) -> BatchedNVFit:
    """Fit S spectra as one vectorized ensemble and return the batch."""
    fit = BatchedNVFit(spectra, walkers_per_spectrum=walkers_per_spectrum, **kwargs)
    fit.adaptive_steps(n_steps)
    return fit


def walker_field_offset(walker, take: int | None = 1000) -> float:
    """``walker-field-offset`` (nv-specific.lisp:68-69) for a single fit."""
    return walker_with_expression(walker, FIELD_OFFSET_EXPRESSION, take)


def export_scan_grid(values, row_length: int, filename: str = "./3d-temp-file.txt"):
    """Write (x, y, value) triples in gnuplot scan-grid format
    (``walker-set-make-file-3d-plot-exp``, nv-specific.lisp:76-95):
    row-major positions with a blank line at the end of each row."""
    values = list(values)
    with open(filename, "w") as out:
        for i, v in enumerate(values):
            x = i % row_length
            y = i // row_length
            out.write(f"{float(x)} {float(y)} {float(v)}\n")
            if x == row_length - 1:
                out.write("\n")
    return filename
