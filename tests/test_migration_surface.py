"""docs/MIGRATION.md consistency: every documented target must resolve.

The migration guide promises a reference user that each mapped symbol
exists; this test pins that promise so renames can't silently strand
the doc (the reference's own README drifted exactly this way —
log-liklihood-normal-weighted existed only in its README, SURVEY §0).
"""

import lisp_mcmc_tpu as mfit
from lisp_mcmc_tpu import diagnostics, nv, plotting, stats, utils
from lisp_mcmc_tpu.fit import Walker
from lisp_mcmc_tpu.io import files
from lisp_mcmc_tpu.ops import linalg

PACKAGE_NAMES = [
    # top-level fitting
    "mcmc_fit", "walker_create", "estop", "request_stop", "clear_stop",
    # likelihoods & priors
    "log_normal", "log_poisson", "log_likelihood_normal",
    "log_likelihood_normal_cutoff", "log_likelihood_normal_weighted",
    "log_likelihood_poisson", "create_log_likelihood_function",
    "log_prior_flat", "prior_bounds", "make_bounds_prior",
    "constraint_penalty", "combine_priors", "bound_penalty",
    # expressions
    "walker_with_expression", "expression_samples",
    "expression_credible_interval", "expression_hdi",
    # ingestion / substrate
    "get_filename", "read_file_data", "create_walker_data",
    "clean_data", "clean_data_error", "linspace", "make_plist",
    "map_tree", "partition",
    # checkpointing
    "walker_save", "walker_load", "walker_set_save", "walker_set_load",
    "batched_save", "batched_load",
    # ensembles / new surface
    "WalkerSet", "BatchedFit", "FitConfig", "log_evidence",
    "log_bayes_factor", "smc_sample", "temperature_schedule",
    "enable_compilation_cache",
    # round-2 surface
    "laplace_approx", "LaplaceResult", "nested_sample", "NestedResult",
    "posterior_predictive", "prior_predictive", "predict", "Prediction",
    "PredictiveDraws", "ppc_pvalue", "sbc_check", "SBCResult",
    "make_student_t_likelihood", "make_noise_scale_likelihood",
    "make_x_error_likelihood",
    "profile_likelihood", "ProfileResult",
    # round-3 surface
    "advi", "advi_per_dataset", "VIResult",
]

WALKER_METHODS = [
    # walker-get verbs (mcmc-fitting.lisp:487-543)
    "steps", "unique_steps", "forward_steps", "most_likely_step",
    "acceptance", "param_trace", "most_likely_params", "median_params",
    "mean_params", "median_params_vector", "stddev_params",
    "log_likelihoods", "covariance_matrix", "l_matrix_estimate",
    "check_for_nonfinite", "diagnose_params",
    # walker-modify verbs (547-580)
    "add_steps", "burn_steps", "keep_steps", "reset",
    "reset_to_most_likely", "delete", "force_step", "swap_data",
    # drivers (849-969)
    "adaptive_steps", "many_steps", "sample_region", "sampling_steps",
    "tempered_steps", "optimize", "smc_sample", "log_evidence", "shard",
    "swap_rates", "prior_sensitivity", "audit",
    # expression + plot verbs
    "with_expression", "plot_data_and_fit", "plot_residuals",
    "caterpillar_plots", "likelihood_plot", "autocorrelation_plot",
    "corner_plot", "all_corner_plots", "param_histogram",
    # round-2 verbs
    "laplace_approx", "nested_sample", "posterior_predictive",
    "prior_predictive", "predict", "ppc_pvalue", "ppc_plot",
    "profile_likelihood", "summary", "metrics", "convergence", "advi",
]

MODULE_NAMES = {
    plotting: ["plot_data_and_fit", "plot_residuals", "caterpillar_plots",
               "likelihood_plot", "autocorrelation_plot", "corner_plot",
               "all_corner_plots", "param_histogram", "show", "heatmap",
               "plot_file", "plot_set_param", "ppc_plot", "sbc_rank_plot",
               "loo_pit_plot", "prior_sensitivity_plot"],
    stats: ["median", "mean", "variance", "credible_interval_95", "hdi",
            "iqr",
            "nth_percentile", "standard_deviation",
            "std_from_84th_percentile", "make_histogram",
            "multivariate_gaussian_random"],
    utils: ["range_list", "thin", "slice_seq", "map_tree", "plist_keys",
            "plist_values", "make_plist", "transpose", "flatten",
            "split_string", "mapcar_enum", "array_to_plist", "repeat",
            "diff_matrix", "diff_params"],
    nv: ["fit_nv_dir", "fit_nv_file", "fit_nv_spectra_batched",
         "nv_data_separated", "nv_dir_data", "nv_data_std_dev",
         "guess_nv_params", "log_prior_nv", "make_nv_prior",
         "walker_field_offset", "export_scan_grid", "BatchedNVFit"],
    diagnostics: ["summary", "metrics", "trace_profile",
                  "ess_from_history", "rhat_from_history",
                  "waic", "waic_compare", "WAICResult",
                  "loo", "loo_compare", "LOOResult", "convergence",
                  "rank_rhat_per_param", "tail_ess_per_param",
                  "mcse_per_param", "model_weights",
                  "prior_sensitivity", "PriorSensitivityResult",
                  "loo_pit", "LOOPITResult", "reloo",
                  "kfold", "KFoldResult", "audit", "AuditResult"],
    files: ["file_specs", "get_filename", "read_file_data"],
    linalg: ["sample_covariance", "cholesky_clamped",
             "diagonal_covariance", "haario_scale", "moments_covariance"],
}

MODEL_NAMES = ["lorder_mixed_bg", "double_lorentzian_bg", "line",
               "polynomial", "gaussian_peak", "lorentzian_bg",
               "exponential_decay", "sinusoid", "example_line"]


def test_package_surface():
    missing = [n for n in PACKAGE_NAMES if not hasattr(mfit, n)]
    assert not missing, missing


def test_walker_surface():
    missing = [n for n in WALKER_METHODS if not hasattr(Walker, n)]
    assert not missing, missing


def test_module_surfaces():
    missing = [f"{mod.__name__}.{n}"
               for mod, names in MODULE_NAMES.items()
               for n in names if not hasattr(mod, n)]
    assert not missing, missing


def test_model_zoo_surface():
    from lisp_mcmc_tpu import models
    missing = [n for n in MODEL_NAMES if not hasattr(models, n)]
    assert not missing, missing
    # registry resolution (checkpoint name round-trips depend on it)
    for n in MODEL_NAMES:
        assert models.get_model(n) is getattr(models, n)
