"""Whole-chunk Pallas stepper vs the XLA lax.scan chunk, on real TPU.

The head-to-head for VERDICT r1 #1's named experiment, run through the
PRODUCTION driver path: two identical flagship walkers whose configs
differ only in ``posterior_impl`` ("auto" = XLA scan vs "pallas_chunk"),
both stepped with full adaptation via ``Walker._runner``.

Run:  python benchmarks/chunk_pallas_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def make_walker(mfit, model, impl, W):
    table = mfit.read_file_data("/root/reference/example-data.xls")
    x, y = mfit.create_walker_data(table, 1, 4)
    return mfit.walker_create(
        function=model, data=(x, y),
        params={"scale": 1e-5, "linewidth": 7.0, "x0": 2200.0, "mix": 0.9,
                "bg0": 1e-7, "bg1": 1e-9},
        data_error=1e-7, n_walkers=W, seed=0, walker_jitter=0.05,
        config=mfit.FitConfig(posterior_impl=impl))


def bench(walker, CH=10):
    runner = walker._runner(with_history=False)
    data = walker._posterior_data()
    state = walker.state
    for _ in range(3):
        state, out = runner(state, True, True, False, data)
    jax.block_until_ready(state.position)
    t0 = time.perf_counter()
    for _ in range(CH):
        state, out = runner(state, True, True, False, data)
    jax.block_until_ready(state.position)
    t = (time.perf_counter() - t0) / CH
    return t, float(np.asarray(out["accept_rate"]))


def main():
    W = int(os.environ.get("BENCH_WALKERS", 131072))

    import lisp_mcmc_tpu as mfit
    from lisp_mcmc_tpu.models import lorder_mixed_bg

    mfit.enable_compilation_cache()
    chunk = mfit.FitConfig().chunk_size

    wx = make_walker(mfit, lorder_mixed_bg, "auto", W)
    xla_t, xla_acc = bench(wx)
    print(json.dumps({"xla_chunk_seconds": xla_t,
                      "xla_steps_per_sec": chunk * W / xla_t,
                      "xla_accept": xla_acc}), flush=True)

    wp = make_walker(mfit, lorder_mixed_bg, "pallas_chunk", W)
    pal_t, pal_acc = bench(wp)
    print(json.dumps({
        "walkers": W,
        "xla_chunk_seconds": xla_t,
        "xla_steps_per_sec": chunk * W / xla_t,
        "xla_accept": xla_acc,
        "pallas_chunk_seconds": pal_t,
        "pallas_steps_per_sec": chunk * W / pal_t,
        "pallas_accept": pal_acc,
        "pallas_over_xla": xla_t / pal_t,
    }, indent=2))


if __name__ == "__main__":
    main()
