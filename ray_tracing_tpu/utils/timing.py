"""Tunnel-robust device timing.

Two failure modes were observed on the axon TPU tunnel that make naive
`block_until_ready`-bracketed timing untrustworthy for MICRO-benchmarks
(they were never observed on the real render workloads, whose timings
match value-materialized measurements — but a methodology that cannot be
fooled beats one that happens not to be):

  * sub-dispatch wall times (<1 ms over a ~40 ms-dispatch tunnel) on
    repeated identical zero-input calls — consistent with client-side
    result caching of an (executable, args) pair;
  * `block_until_ready` returning before a freshly dispatched execution
    is finished, with the truth only surfacing when the value is
    materialized on the host.

`timed_marginal` is immune to both and to any fixed per-measurement
overhead (dispatch RPCs, device->host fetch latency):

  1. every call gets DISTINCT arguments (a seed-like argument is varied),
     so client-side caching of identical requests can never short-circuit
     an execution;
  2. every timing window ends by MATERIALIZING each result on the host
     (tiny transfers only: one scalar per output leaf), so the window
     provably contains the execution;
  3. the reported time is the DIFFERENCE between a (k1+k)-call window and
     a k1-call window, so dispatch/fetch/sync overheads — however large —
     cancel exactly and only per-call device time remains.

Used by bench.py, benchmarks/mfu.py and the VPU-peak microbenchmark
(utils/flops.py). The reference has no analogue (it times wall-clock
around pthread joins, src/main.c:274-414); this exists because a remote
TPU tunnel sits between the host clock and the chip.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def materialize(out) -> float:
    """Force device->host materialization of every leaf of `out`; returns
    a checksum-ish float (summing one element per leaf keeps transfers
    tiny — full-plane pulls over the tunnel are minutes-slow)."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel"):
            v = jnp.ravel(leaf)[0]
            total += float(jax.device_get(v))
        else:
            total += float(leaf)
    return total


def timed_marginal(fn, make_args, *, k: int = 1, k1: int = 1, repeats: int = 2):
    """Marginal per-call wall time of `fn`.

    make_args(i) -> argument tuple for the i-th call; MUST vary with i
    (e.g. a seed) so no two calls are identical. fn is assumed compiled/
    warmed by the caller (call once with make_args(-1) first).

    Measures a window of k1 calls and a window of k1+k calls (all calls
    dispatched back-to-back, then every result materialized) and returns
    (t_{k1+k} - t_{k1}) / k — fixed overheads cancel. min over `repeats`
    trials (min, not mean: tunnel noise is strictly additive).
    """
    seq = [0]

    def window(n):
        args = []
        for _ in range(n):
            seq[0] += 1
            args.append(make_args(seq[0]))
        t0 = time.perf_counter()
        outs = [fn(*a) for a in args]
        for o in outs:
            jax.block_until_ready(o)
        for o in outs:
            materialize(o)
        return time.perf_counter() - t0

    # min per window size across repeats, THEN difference: tunnel noise is
    # strictly additive, so min is the clean estimate of each window and
    # the difference only ever subtracts clean estimates. (A per-repeat
    # difference can go negative whenever the small window catches a noise
    # spike the big one missed.)
    t_small = min(window(k1) for _ in range(repeats))
    t_big = min(window(k1 + k) for _ in range(repeats))
    return (t_big - t_small) / k


def timed_per_sample(fn, scene, *, n, repeats: int = 2):
    """The benchmark protocol shared by bench.py, benchmarks/run_all.py
    and benchmarks/mfu.py: compile+warm `fn(scene, seed)` once with a
    distinct seed, then marginal per-call time (seeds 1001, 1002, ... so
    no two dispatches are identical requests) divided by the `n` samples
    the call accumulates on-device."""
    make_args = lambda i: (scene, 1000 + i)
    jax.block_until_ready(fn(*make_args(-1)))  # compile + warm
    return timed_marginal(fn, make_args, repeats=repeats) / n
