"""Roofline account of the chunk kernel on real TPU hardware (VERDICT r1 #1).

Measures, on the flagship bench configuration (W walkers, 200-step rwm
chunk, lorder_mixed_bg on the 334-point example data):

  1. achieved chunk throughput (chain-steps/sec) and XLA's flop/byte
     counts for the compiled chunk (``cost_analysis`` reports the scan
     BODY once; totals scale by chunk_size),
  2. empirical device ceilings — fused-FMA VPU rate, divide and
     transcendental throughput, HBM copy bandwidth — measured with the
     K-DIFFERENCE method (time K2 and K1 fused passes, divide the work
     difference by the time difference) so per-call dispatch latency
     (~2-3 ms over the axon tunnel) cancels instead of polluting the
     ceiling,
  3. the decomposition: a fori_loop of K pure likelihood evaluations
     (same difference method) vs the full chunk step,

and prints the roofline verdict: achieved fraction of the *binding*
ceiling (the VPU elementwise + reciprocal mix — this workload has no
matmuls; quoting MXU MFU would be theater).

Run on TPU:  python benchmarks/roofline.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def wall(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def chain_rate(make_chain, work_per_pass, k1=64, k2=512):
    """ops/sec via the K-difference method (fixed overheads cancel)."""
    f1, f2 = make_chain(k1), make_chain(k2)
    t1, t2 = wall(*f1), wall(*f2)
    return (k2 - k1) * work_per_pass / (t2 - t1), (t1, t2)


def microbench_ceilings(dtype, n=(256, 512)):
    """Per-op issue-rate ceilings measured INSIDE a Pallas kernel.

    The operands live in VMEM for the whole run (no per-iteration HBM
    carry traffic, unlike a jitted fori_loop), the inner body unrolls
    U ops over P independent chains (ILP hides op latency — a single
    serial chain measures latency, ~3x low), and the K-difference
    cancels call overhead.  Compile cost stays tiny (one small body).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, U = 4, 8
    size = n[0] * n[1]

    def rate_of(op, flops_per_op, k1=32, k2=256):
        def make(K):
            def kernel(x_ref, o_ref):
                xs = [x_ref[:] + jnp.asarray(i * 1e-6, dtype)
                      for i in range(P)]

                def body(_, xs):
                    for _ in range(U):
                        xs = [op(xi) for xi in xs]
                    return tuple(xs)

                xs = jax.lax.fori_loop(0, K, body, tuple(xs))
                out = xs[0]
                for xi in xs[1:]:
                    out = out + xi
                o_ref[:] = out

            f = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(n, dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            return jax.jit(f), jnp.ones(n, dtype) * 1.0001

        f1, x = make(k1)
        f2, _ = make(k2)
        t1, t2 = wall(f1, x, iters=8), wall(f2, x, iters=8)
        return (k2 - k1) * U * P * size * flops_per_op / (t2 - t1)

    fma_rate = rate_of(lambda x: x * 1.0000001 + 1e-7, 2)
    div_rate = rate_of(lambda x: 1.0001 / (x + 1e-6), 1, k1=16, k2=96)
    cos_rate = rate_of(lambda x: jnp.cos(x), 1, k1=16, k2=96)
    exp_rate = rate_of(lambda x: jnp.exp(x * 1e-6), 1, k1=16, k2=96)
    log_rate = rate_of(lambda x: jnp.log(x + 1.0), 1, k1=16, k2=96)

    # HBM bandwidth: same single-pass copy at two sizes; the size
    # difference cancels dispatch latency.
    big = jnp.ones((256, 1024, 1024), dtype)
    small = jnp.ones((64, 1024, 1024), dtype)

    @jax.jit
    def copy(x):
        return x + 1.0

    tb = wall(copy, big, iters=4)
    ts = wall(copy, small, iters=4)
    hbm_bw = 2 * (big.size - small.size) * big.dtype.itemsize / (tb - ts)

    return {
        "fma_flops_per_sec": fma_rate,
        "div_per_sec": div_rate,
        "cos_per_sec": cos_rate,
        "exp_per_sec": exp_rate,
        "log_per_sec": log_rate,
        "hbm_bytes_per_sec": hbm_bw,
    }


def main():
    W = int(os.environ.get("ROOFLINE_WALKERS", 131072))

    import lisp_mcmc_tpu as mfit
    from lisp_mcmc_tpu.kernel import build_chunk_runner
    from lisp_mcmc_tpu.models import lorder_mixed_bg

    mfit.enable_compilation_cache()

    table = mfit.read_file_data("/root/reference/example-data.xls")
    x, y = mfit.create_walker_data(table, 1, 4)
    walker = mfit.walker_create(
        function=lorder_mixed_bg, data=(x, y),
        params={"scale": 1e-5, "linewidth": 7.0, "x0": 2200.0, "mix": 0.9,
                "bg0": 1e-7, "bg1": 1e-9},
        data_error=1e-7, n_walkers=W, seed=0, walker_jitter=0.05)
    dtype = walker.dtype
    print(f"# devices={jax.devices()} dtype={np.dtype(dtype).name} W={W}",
          file=sys.stderr)

    run, _ = build_chunk_runner(walker._log_post_one, walker.ndim,
                                walker.config, takes_data=True)
    data = walker._posterior_data()
    step = jax.jit(run)

    # ---- achieved chunk throughput + XLA's cost model (scan body x chunk)
    state = walker.state
    compiled = jax.jit(run).lower(state, True, True, False, data).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    body_flops = float(ca.get("flops", float("nan")))
    body_bytes = float(ca.get("bytes accessed", float("nan")))

    for _ in range(3):
        state, out = step(state, True, True, False, data)
    jax.block_until_ready(state.position)
    t0 = time.perf_counter()
    CH = 10
    for _ in range(CH):
        state, out = step(state, True, True, False, data)
    jax.block_until_ready(state.position)
    chunk_t = (time.perf_counter() - t0) / CH

    chunk = walker.config.chunk_size
    steps_per_sec = chunk * W / chunk_t
    # cost_analysis flop count covers the scan body ONCE (verified:
    # 1.07e9 ~= W * ~8.1k flops = one step of W walkers).
    chunk_flops = body_flops * chunk
    chunk_bytes_touched = body_bytes  # NOT x chunk: carry stays on device

    # ---- pure likelihood rate via fori_loop difference
    eval_one = walker._log_post_one
    pos = state.position

    def lik_chain(K):
        @jax.jit
        def f(pos, data):
            def body(_, p):
                lp = jax.vmap(eval_one, in_axes=(0, None))(p, data)
                # cheap dependency so passes can't collapse
                return p * (1.0 + 0.0 * lp[0])
            return jax.lax.fori_loop(0, K, body, pos)
        return f, pos, data

    lik_rate_evals, (lt1, lt2) = chain_rate(lik_chain, 1, k1=8, k2=64)
    lik_t = 1.0 / lik_rate_evals              # seconds per full-W likelihood

    ceil = microbench_ceilings(dtype)

    n_pts = int(walker.terms[0].dataset.x.shape[-1])
    report = {
        "walkers": W,
        "dtype": np.dtype(dtype).name,
        "chunk_steps": chunk,
        "chunk_seconds": chunk_t,
        "steps_per_sec": steps_per_sec,
        "likelihood_eval_seconds": lik_t,
        "likelihood_share_of_step": lik_t * chunk / chunk_t,
        "padded_points": n_pts,
        "xla_flops_per_step": body_flops,
        "xla_flops_per_chunk": chunk_flops,
        "xla_bytes_per_chunk_body": chunk_bytes_touched,
        "achieved_flops_per_sec": chunk_flops / chunk_t,
        "ceilings": ceil,
        "mfu_vs_vpu_fma_pct": 100.0 * (chunk_flops / chunk_t) / ceil["fma_flops_per_sec"],
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
