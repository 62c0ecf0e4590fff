"""Whole-chunk Pallas stepper vs the XLA lax.scan chunk, on real TPU.

The head-to-head for VERDICT r1 #1's named experiment: same flagship
workload (lorder_mixed_bg, 334-pt data, W walkers, 200-step chunks),
same proposal L, T pinned to 1 — measure steps/sec for
  (a) the production XLA chunk (jitted lax.scan, carry in HBM),
  (b) the Pallas whole-chunk kernel (state resident in VMEM).

Run:  python benchmarks/chunk_pallas_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    W = int(os.environ.get("BENCH_WALKERS", 131072))

    import lisp_mcmc_tpu as mfit
    from lisp_mcmc_tpu.kernel import build_chunk_runner
    from lisp_mcmc_tpu.models import lorder_mixed_bg
    from lisp_mcmc_tpu.ops.chunk_pallas import build_chunk_pallas

    mfit.enable_compilation_cache()

    table = mfit.read_file_data("/root/reference/example-data.xls")
    x, y = mfit.create_walker_data(table, 1, 4)
    walker = mfit.walker_create(
        function=lorder_mixed_bg, data=(x, y),
        params={"scale": 1e-5, "linewidth": 7.0, "x0": 2200.0, "mix": 0.9,
                "bg0": 1e-7, "bg1": 1e-9},
        data_error=1e-7, n_walkers=W, seed=0, walker_jitter=0.05)
    chunk = walker.config.chunk_size
    on_tpu = jax.default_backend() == "tpu"

    # ---------------- XLA baseline
    run, _ = build_chunk_runner(walker._log_post_one, walker.ndim,
                                walker.config, takes_data=True)
    data = walker._posterior_data()
    step = jax.jit(run)
    state = walker.state
    for _ in range(3):
        state, out = step(state, True, True, True, data)
    jax.block_until_ready(state.position)
    t0 = time.perf_counter()
    CH = 10
    for _ in range(CH):
        state, out = step(state, True, True, True, data)
    jax.block_until_ready(state.position)
    xla_t = (time.perf_counter() - t0) / CH
    xla_sps = chunk * W / xla_t
    print(json.dumps({"xla_chunk_seconds": xla_t,
                      "xla_steps_per_sec": xla_sps}), flush=True)

    # ---------------- Pallas whole-chunk
    for bw in (int(os.environ.get("BENCH_PALLAS_BLOCK", 1024)),):
        rc = build_chunk_pallas(walker.terms, walker.spec, walker.config,
                                walker.n_walkers, walker.dtype,
                                block_walkers=bw, interpret=not on_tpu)
        if rc is None:
            print(json.dumps({"error": "pallas chunk unsupported here"}))
            return
        st = walker.state
        l0 = st.l_matrix[0]

        @jax.jit
        def pstep(pos, lp, best, best_lp, seed):
            out = rc(pos, lp, best, best_lp, l0, 0, 1.0, seed)
            return (out["position"], out["logprob"], out["best_position"],
                    out["best_logprob"], out["accept_counts"])

        pos, lp = st.position, st.logprob
        best, blp = st.best_position, st.best_logprob
        t0 = time.perf_counter()
        pos, lp, best, blp, acc = pstep(pos, lp, best, blp, 0)
        jax.block_until_ready(pos)
        print(json.dumps({"pallas_compile_plus_first_chunk_s":
                          time.perf_counter() - t0}), flush=True)
        for i in range(1, 3):
            pos, lp, best, blp, acc = pstep(pos, lp, best, blp, i)
        jax.block_until_ready(pos)
        t0 = time.perf_counter()
        for i in range(CH):
            pos, lp, best, blp, acc = pstep(pos, lp, best, blp, 100 + i)
        jax.block_until_ready(pos)
        pal_t = (time.perf_counter() - t0) / CH
        pal_sps = chunk * W / pal_t

        print(json.dumps({
            "walkers": W,
            "block_walkers": bw,
            "xla_chunk_seconds": xla_t,
            "xla_steps_per_sec": xla_sps,
            "pallas_chunk_seconds": pal_t,
            "pallas_steps_per_sec": pal_sps,
            "pallas_over_xla": pal_sps / xla_sps,
            "xla_accept": float(np.mean(np.asarray(out["accept_rate"]))),
            "pallas_accept": float(np.mean(np.asarray(acc))) / chunk,
        }, indent=2))


if __name__ == "__main__":
    main()
