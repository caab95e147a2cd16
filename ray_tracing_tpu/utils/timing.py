"""Tunnel-robust device timing.

Three failure modes were observed on the axon TPU tunnel that make naive
`block_until_ready`-bracketed timing untrustworthy:

  * sub-dispatch wall times (<1 ms over a ~40 ms-dispatch tunnel) on
    repeated identical zero-input calls — consistent with client-side
    result caching of an (executable, args) pair (round 3);
  * `block_until_ready` returning before a freshly dispatched execution
    is finished, with the truth only surfacing when the value is
    materialized on the host (round 3);
  * device->host fetches costing ~29 ms EACH over the tunnel (round 4):
    materializing every call's outputs adds (n_calls x n_leaves) fetches
    to a window, a cost that GROWS with window size and therefore does
    NOT cancel out of a window difference. This inflated every round-3
    driver backward number by ~30 ms/sample (a Scene gradient has 8
    leaves; the forward's single scalar hid it) — the entire "2x bwd
    regression" of BENCH_r03 was this artifact (BENCH_NOTES round 4).

`timed_marginal` is immune to all three and to any fixed per-measurement
overhead (dispatch RPCs, device->host fetch latency):

  1. every call gets DISTINCT arguments (a seed-like argument is varied),
     so client-side caching of identical requests can never short-circuit
     an execution;
  2. every timing window ends by MATERIALIZING the LAST call's outputs on
     the host (one tiny transfer per output leaf). A TPU core executes
     enqueued programs in order on a single stream, and distinct inputs
     make every call a real execution — so the last call's value being on
     the host proves every earlier call in the window also ran. Exactly
     ONE materialization per window, REGARDLESS of window size, keeps the
     fetch cost constant across windows so it cancels in the difference;
  3. the reported time is the DIFFERENCE between a (k1+k)-call window and
     a k1-call window, so dispatch/fetch/sync overheads — however large —
     cancel exactly and only per-call device time remains. (If the host
     cannot DISPATCH as fast as the device executes, the difference
     honestly reports the dispatch-rate bound instead — that is the
     achievable steady-state throughput on this host.)

Used by bench.py, benchmarks/* and the VPU-peak microbenchmark
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


def timed_marginal(fn, make_args, *, k: int = 4, k1: int = 1, repeats: int = 2):
    """Marginal per-call wall time of `fn`.

    make_args(i) -> argument tuple for the i-th call; MUST vary with i
    (e.g. a seed) so no two calls are identical. fn is assumed compiled/
    warmed by the caller (call once with make_args(-1) first).

    Measures a window of k1 calls and a window of k1+k calls (all calls
    dispatched back-to-back, then the LAST result materialized — one
    fetch per window, see module docstring) and returns
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
        # ONE materialization per window (constant across window sizes, so
        # it cancels in the difference): the last call's outputs prove the
        # whole in-order window executed.
        materialize(outs[-1])
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


def environment_fingerprint(n: int = 16) -> dict:
    """Session environment fingerprint for bench artifacts (VERDICT r04
    weak #1 / directive #6): cross-session absolutes over the tunnel vary
    by up to ~±40%, so every artifact must carry the knobs that explain
    its own session — the per-call DISPATCH floor (the tunnel rate-limits
    dispatches at ~25 ms/call, round 4) and the device->host FETCH
    latency (~29 ms/fetch, round 4 — the artifact behind the round-3
    "regression"). The VPU peak is measured separately (utils/flops.py).

    Returns {"dispatch_ms_per_call", "device_get_ms"} — medians over `n`
    trials of a trivial jitted scalar add (distinct inputs so client-side
    request caching cannot short-circuit)."""
    f = jax.jit(lambda s: s + 1)
    jax.block_until_ready(f(jnp.int32(0)))  # compile
    # dispatch floor: n back-to-back enqueues, block once at the end
    t0 = time.perf_counter()
    outs = [f(jnp.int32(100 + i)) for i in range(n)]
    jax.block_until_ready(outs[-1])
    dispatch = (time.perf_counter() - t0) / n

    fetches = []
    for i in range(5):
        o = jax.block_until_ready(f(jnp.int32(200 + i)))
        t0 = time.perf_counter()
        jax.device_get(o)
        fetches.append(time.perf_counter() - t0)
    fetches.sort()
    return {
        "dispatch_ms_per_call": round(dispatch * 1e3, 1),
        "device_get_ms": round(fetches[len(fetches) // 2] * 1e3, 1),
    }
