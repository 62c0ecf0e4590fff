"""Whole-chunk-in-VMEM Pallas stepping: 200 MH steps without touching HBM.

The experiment named in ops/loglik_pallas.py:23-24 and VERDICT r1 #1:
instead of a ``lax.scan`` whose carry (positions, logprob, best step,
moment accumulators) round-trips HBM every step, one Pallas program
keeps a walker block's full state in VMEM across the entire chunk —
proposal draw (hardware PRNG + Box-Muller), model eval, MH accept
(mcmc-fitting.lisp:1091-1092), best tracking (553-555), and the
accepted-move moment accumulation all fuse into a single kernel.

Layout matches the fused posterior kernel: walkers on lanes, parameters
on sublanes — each grid program owns a ``(d, WB)`` state block and loops
``chunk`` steps over it.  The L-matrix rides scalar prefetch (SMEM), so
the 36 L[i,j] reads per step are scalar loads, not vector traffic.

Scope (callers fall back to the XLA scan outside it): ungrouped rwm,
fusable likelihood terms (the library reductions over 1-D x), no
tempering, no aux, float32.  The RNG stream necessarily differs from the
XLA path (in-kernel hardware PRNG vs jax.random), so the kernel is
validated statistically (Gaussian-target moments, acceptance behavior),
not bitwise — see tests/test_chunk_pallas.py.

Benchmark verdict: see DESIGN.md "Roofline" — measured 1.107x the XLA
scan on TPU v5e at the flagship bench shape (340.5M vs 307.6M
steps/sec), with the carry-traffic share of chunk time quantified there.

Operational caveat (axon remote-TPU environments): after a process that
executed this kernel exits, the remote executor has been observed to
wedge for the NEXT client (all execution hangs until a remote watchdog
recovers, ~30-60 min).  On such tunneled backends prefer the default
XLA path for long unattended runs; this kernel is the measured-evidence
artifact and an opt-in for locally-attached TPUs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .loglik_pallas import (_CUTOFF_DEFAULT, fusable_terms, pick_block,
                            prepare_fused_terms)

__all__ = ["build_chunk_pallas"]


def _uniform_from_bits(bits):
    """uint32 random bits -> f32 uniform in (0, 1).

    Exponent trick: 23 mantissa bits into [1, 2), minus 1; clamped away
    from 0 so ``log(u)`` stays finite.
    """
    f = jax.lax.bitcast_convert_type(
        (bits >> 9) | jnp.uint32(0x3F800000), jnp.float32
    ) - jnp.float32(1.0)
    return jnp.maximum(f, jnp.float32(1.1754944e-38))


def _hash_bits(shape, key1, key2):
    """Keyed counter hash (two murmur3-finalizer rounds), uint32.

    Portable across TPU Mosaic and interpret mode (pure integer jnp ops;
    the hardware PRNG primitive has no CPU lowering).  The element's
    linear index is XOR-mixed with two key words — (seed, block) and
    (step, draw) material — BETWEEN the finalizer rounds, so distinct
    keys select independent permutations of the index space.  Additive
    counter offsets (the previous scheme) shift ranges within one shared
    2^32 counter space, where consecutive chunk seeds and large blocks
    can overlap and replay bits; keyed permutations cannot overlap
    without a full hash collision.  Two rounds with distinct constants
    decorrelate adjacent indices far below anything an MCMC accept test
    can see (tests/test_chunk_pallas.py checks moments + lag correlation).
    """
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = r * jnp.uint32(shape[1]) + c

    def fin(x, m1, m2):
        x = x ^ (x >> 16)
        x = x * jnp.uint32(m1)
        x = x ^ (x >> 13)
        x = x * jnp.uint32(m2)
        x = x ^ (x >> 16)
        return x

    x = fin(x ^ key1, 0x7FEB352D, 0x846CA68B)
    x = fin(x ^ key2, 0x85EBCA6B, 0xC2B2AE35)
    return x


def build_chunk_pallas(terms, spec, config, n_walkers: int, dtype,
                       *, block_walkers: int = 1024, interpret: bool = False):
    """Build a whole-chunk MH stepper as one Pallas kernel, or None.

    The returned callable maps
    ``(position (W,d), logprob (W,), best_position (W,d),
    best_logprob (W,), l_matrix (d,d), anneal_step, temp_override, seed)``
    to a dict with the updated arrays plus ``accept_counts (W,)``,
    ``m_sum (d,)``, ``m_outer (d,d)``, ``m_count ()``, and per-step
    ``trace_max/mean/min (chunk,)`` — everything the chunk driver's
    ``_finish``/adapt step consumes.
    """
    if jnp.dtype(dtype) != jnp.float32:
        return None  # PRNG bit tricks are f32; x64 parity runs keep XLA
    if not fusable_terms(terms):
        return None
    if config.tempering_rungs > 1 or config.kernel != "rwm":
        return None
    wb = pick_block(n_walkers, block_walkers)
    if wb is None:
        return None

    d = spec.ndim
    dd = d * d
    keys = spec.keys
    chunk = config.chunk_size

    # Walker-independent dataset constants, (NP, 1) columns (see
    # loglik_pallas for the layout rationale).  The scalar normalization
    # constant is EXCLUDED inside the kernel (it cancels in the MH
    # ratio); the wrapper shifts logprob in and out.
    term_inputs, term_meta, scalar_const = prepare_fused_terms(terms, jnp.float32)
    flat_inputs = [a for tup in term_inputs for a in tup]
    n_data_refs = len(flat_inputs)

    # Annealing schedule constants (temperature_schedule, kernel.py:200).
    ts = float(config.temp_steps(d))
    mult = 1 + 2 * (int(ts) // config.temp_period)
    phase_rate = math.pi * mult / (2.0 * ts)
    temp_amp = float(config.temperature)
    greedy = bool(config.greedy)
    neg_floor = float(np.finfo(np.float32).min / 4)

    def eval_block(params, data_refs):
        """log-posterior (1, WB) for a parameter dict of (1, WB) rows."""
        total = jnp.zeros((1, wb), jnp.float32)
        idx = 0
        for kind, fn, prior, n_in in term_meta:
            block = data_refs[idx: idx + n_in]
            idx += n_in
            x = block[0][:]
            y = block[1][:]
            mu = fn(x, params)
            if kind == "normal":
                z = (y - mu) * block[2][:]
                total += -0.5 * jnp.sum(z * z, axis=0, keepdims=True)
            elif kind == "normal_cutoff":
                z = (y - mu) * block[2][:]
                lp = jnp.maximum(_CUTOFF_DEFAULT, block[3][:] - 0.5 * z * z)
                total += jnp.sum(lp * block[4][:], axis=0, keepdims=True)
            else:
                mask = block[2][:]
                lp = (y * jnp.log(mu) - mu) * mask
                total += jnp.sum(lp, axis=0, keepdims=True)
            pr = prior(params, None)
            total += jnp.broadcast_to(jnp.asarray(pr, jnp.float32), (1, wb))
        return total

    lane_iota = None  # built inside the kernel (broadcasted_iota)

    def kernel(seed_ref, astep_ref, tover_ref, l_ref,   # scalar prefetch (SMEM)
               pos_ref, lp_ref, best_ref, best_lp_ref,
               *refs):
        data_refs = refs[:n_data_refs]
        (pos_out, lp_out, best_out, best_lp_out, acc_out,
         msum_out, mouter_out, trace_out) = refs[n_data_refs:]

        pid = pl.program_id(0)
        # Per-(seed, block) hash key word; the per-(step, draw) word is
        # built inside the loop.  Small (seed, pid) deltas cannot alias:
        # a collision needs dseed*K1 == -dpid*K2 (mod 2^32) with odd K.
        key_sp = (seed_ref[0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
                  + jnp.uint32(pid).astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))

        pos0 = pos_ref[:]                                 # (d, WB)
        lp0 = lp_ref[:]                                   # (1, WB)
        best0 = best_ref[:]
        best_lp0 = best_lp_ref[:]
        acc0 = jnp.zeros((1, wb), jnp.float32)
        msum0 = jnp.zeros((d, wb), jnp.float32)
        mouter0 = jnp.zeros((dd, wb), jnp.float32)
        tover = tover_ref[0]
        astep0 = astep_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, carry):
            pos, lp, best, best_lp, acc, msum, mouter = carry

            # --- temperature (cosine annealing or pinned override)
            step_i = (astep0 + i).astype(jnp.float32)
            sched = jnp.maximum(1.0, jnp.cos(step_i * phase_rate) * temp_amp)
            sched = jnp.where(step_i < ts, sched, jnp.float32(1.0))
            temp = jnp.where(tover > 0, tover, sched)

            # --- proposal: z ~ N(0,1) via Box-Muller on keyed hashes;
            # draw slots 0/1/2 = z1, z2, accept-u
            key_step = i.astype(jnp.uint32) * jnp.uint32(0xB5297A4D)
            u1 = _uniform_from_bits(_hash_bits((d, wb), key_sp, key_step))
            u2 = _uniform_from_bits(_hash_bits(
                (d, wb), key_sp, key_step + jnp.uint32(0x68E31DA4)))
            z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
                jnp.float32(2.0 * math.pi) * u2)          # (d, WB)

            # step = L @ z, unrolled over the tiny lower-triangular (d, d)
            rows = []
            for r in range(d):
                srow = l_ref[r * d] * z[0:1, :]
                for c in range(1, r + 1):
                    srow = srow + l_ref[r * d + c] * z[c:c + 1, :]
                rows.append(srow)
            step_vec = jnp.concatenate(rows, axis=0)      # (d, WB)
            prop = pos + step_vec

            # --- posterior at the proposal
            params = {k: prop[j:j + 1, :] for j, k in enumerate(keys)}
            lp_prop = eval_block(params, data_refs)       # (1, WB)
            lp_prop = jnp.where(jnp.isfinite(lp_prop), lp_prop, neg_floor)

            # --- MH accept (mcmc-fitting.lisp:1091-1092)
            log_u = jnp.log(_uniform_from_bits(_hash_bits(
                (1, wb), key_sp, key_step + jnp.uint32(2 * 0x68E31DA4))))
            if greedy:
                accept = lp_prop > lp
            else:
                accept = (lp_prop > lp) | ((lp_prop - lp) / temp > log_u)
            accf = accept.astype(jnp.float32)             # (1, WB)

            new_pos = jnp.where(accept, prop, pos)
            new_lp = jnp.where(accept, lp_prop, lp)

            # --- accepted-move moment accumulators (lane-resident; the
            # cross-walker reduction happens once at chunk end)
            delta = step_vec * accf                       # (d, WB)
            msum = msum + delta
            # static-slice + concat (Mosaic has no scatter-add lowering)
            mouter = jnp.concatenate(
                [mouter[r * d:(r + 1) * d, :] + delta[r:r + 1, :] * delta
                 for r in range(d)], axis=0)
            acc = acc + accf

            # --- best tracking (553-555)
            better = new_lp > best_lp
            best = jnp.where(better, new_pos, best)
            best_lp = jnp.where(better, new_lp, best_lp)

            # --- per-step trace row: lane0 max, lane1 mean, lane2 min
            mx = jnp.max(new_lp)
            mn = jnp.min(new_lp)
            mean = jnp.sum(new_lp) / wb
            row = (jnp.where(lane == 0, mx, 0.0)
                   + jnp.where(lane == 1, mean, 0.0)
                   + jnp.where(lane == 2, mn, 0.0))
            trace_out[0, pl.ds(i, 1), :] = row

            return new_pos, new_lp, best, best_lp, acc, msum, mouter

        pos, lp, best, best_lp, acc, msum, mouter = jax.lax.fori_loop(
            0, chunk, body, (pos0, lp0, best0, best_lp0, acc0, msum0, mouter0))

        pos_out[:] = pos
        lp_out[:] = lp
        best_out[:] = best
        best_lp_out[:] = best_lp
        acc_out[:] = acc
        msum_out[0] = jnp.broadcast_to(
            jnp.sum(msum, axis=1, keepdims=True), (d, 128))
        mouter_out[0] = jnp.broadcast_to(
            jnp.sum(mouter, axis=1, keepdims=True), (dd, 128))

    nblk = n_walkers // wb
    state_spec_d = pl.BlockSpec((d, wb), lambda i, *_: (0, i),
                                memory_space=pltpu.VMEM)
    state_spec_1 = pl.BlockSpec((1, wb), lambda i, *_: (0, i),
                                memory_space=pltpu.VMEM)
    data_specs = [
        pl.BlockSpec(arr.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
        for arr in flat_inputs
    ]
    blk3 = lambda i, *_: (i, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblk,),
        in_specs=[state_spec_d, state_spec_1, state_spec_d, state_spec_1,
                  *data_specs],
        out_specs=[
            state_spec_d, state_spec_1, state_spec_d, state_spec_1,
            state_spec_1,
            pl.BlockSpec((1, d, 128), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dd, 128), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 128), blk3, memory_space=pltpu.VMEM),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((d, n_walkers), jnp.float32),
            jax.ShapeDtypeStruct((1, n_walkers), jnp.float32),
            jax.ShapeDtypeStruct((d, n_walkers), jnp.float32),
            jax.ShapeDtypeStruct((1, n_walkers), jnp.float32),
            jax.ShapeDtypeStruct((1, n_walkers), jnp.float32),
            jax.ShapeDtypeStruct((nblk, d, 128), jnp.float32),
            jax.ShapeDtypeStruct((nblk, dd, 128), jnp.float32),
            jax.ShapeDtypeStruct((nblk, chunk, 128), jnp.float32),
        ],
        interpret=interpret,
    )

    def run_chunk(position, logprob, best_position, best_logprob, l_matrix,
                  anneal_step, temp_override, seed):
        lp_in = (logprob - scalar_const)[None, :].astype(jnp.float32)
        blp_in = (best_logprob - scalar_const)[None, :].astype(jnp.float32)
        outs = call(
            jnp.asarray([seed], jnp.int32),
            jnp.asarray([anneal_step], jnp.int32),
            jnp.asarray([temp_override], jnp.float32),
            l_matrix.reshape(-1).astype(jnp.float32),
            position.T.astype(jnp.float32),
            lp_in,
            best_position.T.astype(jnp.float32),
            blp_in,
            *flat_inputs,
        )
        pos, lp, best, best_lp, acc, msum_b, mouter_b, trace_b = outs
        return {
            "position": pos.T,
            "logprob": lp[0] + scalar_const,
            "best_position": best.T,
            "best_logprob": best_lp[0] + scalar_const,
            "accept_counts": acc[0],
            "m_sum": jnp.sum(msum_b[:, :, 0], axis=0),
            "m_outer": jnp.sum(mouter_b[:, :, 0], axis=0).reshape(d, d),
            "m_count": jnp.sum(acc),
            "trace_max": jnp.max(trace_b[:, :, 0], axis=0) + scalar_const,
            "trace_mean": jnp.mean(trace_b[:, :, 1], axis=0) + scalar_const,
            "trace_min": jnp.min(trace_b[:, :, 2], axis=0) + scalar_const,
        }

    # Smoke-trace so raising priors/models fall back at build time, not
    # at first step inside the driver (mirrors build_fused_posterior).
    # Priors that silently BRANCH on dataset=None trace cleanly; fit.py
    # additionally gates this kernel on the fused-posterior numeric
    # equivalence probe to catch those.
    try:
        f32, i32 = jnp.float32, jnp.int32
        jax.eval_shape(
            run_chunk,
            jax.ShapeDtypeStruct((n_walkers, d), f32),
            jax.ShapeDtypeStruct((n_walkers,), f32),
            jax.ShapeDtypeStruct((n_walkers, d), f32),
            jax.ShapeDtypeStruct((n_walkers,), f32),
            jax.ShapeDtypeStruct((d, d), f32),
            jax.ShapeDtypeStruct((), i32),
            jax.ShapeDtypeStruct((), f32),
            jax.ShapeDtypeStruct((), i32),
        )
    except Exception:
        return None

    return run_chunk
