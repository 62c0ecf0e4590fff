"""Worker for the 2-process jax.distributed test (and dryrun_multiprocess).

Each process: initialize_distributed against a shared coordinator, build
the SAME deterministic line fit, shard one chunk over the 2-process
global mesh, and print replicated scalars as one JSON line (process 0
only).  The parent compares them against a single-process run of the
same program — the kernel's sharded==unsharded bitwise guarantee
(tests/test_parallel.py) extended across PROCESS boundaries, which is
exactly what `initialize_distributed` (parallel/mesh.py, reference C24)
exists to provide.

Usage: python dist_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    # One local CPU device per process -> nproc global devices.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from lisp_mcmc_tpu.parallel import (initialize_distributed, make_mesh,
                                        shard_state)

    n_global = initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)
    assert n_global == nproc, f"{n_global} global devices, expected {nproc}"
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    import numpy as np

    import lisp_mcmc_tpu as mfit
    from lisp_mcmc_tpu.kernel import build_chunk_runner
    from lisp_mcmc_tpu.models import line

    x = np.linspace(0.0, 10.0, 50)
    y = 2.0 * x + 1.0
    w = mfit.walker_create(function=line, data=(x, y),
                           params={"m": 1.5, "b": 0.5}, data_error=0.1,
                           n_walkers=16, seed=0, walker_jitter=0.05)
    mesh = make_mesh(nproc)
    state = shard_state(w.state, mesh)
    run, _ = build_chunk_runner(w._log_post_one, w.ndim, w.config,
                                takes_data=True)
    state, out = jax.jit(run)(state, True, True, False, w._posterior_data())
    # Replicated/global scalars only (per-process shards are not
    # addressable across the boundary): jitted global reductions.
    lp_mean = float(jax.jit(lambda s: jnp.mean(s.logprob))(state))
    best = float(jax.jit(lambda s: jnp.max(s.best_logprob))(state))
    l_sum = float(jnp.sum(state.l_matrix))
    if pid == 0:
        print(json.dumps({
            "n_global_devices": n_global,
            "process_count": jax.process_count(),
            "accept_rate": float(out["accept_rate"]),
            "lp_mean": lp_mean,
            "best": best,
            "l_sum": l_sum,
        }), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
