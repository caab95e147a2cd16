#!/usr/bin/env python
"""Probe: can a Pallas TPU kernel gather from a VMEM-resident table at
better than XLA's ~9 ns/index HBM gather (the measured wall for skybox
lookups, BENCH_NOTES round 2)?

If per-lane VMEM gather lowers and runs at vector-ish rate, a two-level
"stream table chunks through VMEM + gather per chunk" kernel beats the
XLA gather for the scene_0/AA dense-fresh case (sky_stats.py: 62-85%
fresh texels/sample => the sparse cache cannot help; the gather itself
must get faster).

Usage: python benchmarks/vmem_gather_probe.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from ray_tracing_tpu.utils.timing import timed_marginal

TABLE = 64 * 1024          # 256 KB table chunk in VMEM
TILE = (512, 128)          # indices per grid step (64K)
N_IDX = 2 * 1024 * 1024    # ~one 1080p plane of indices


def kernel(tbl_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take(tbl_ref[...], idx_ref[...], axis=0)


@jax.jit
def run(tbl, idx):
    grid = (idx.shape[0] // TILE[0],)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TABLE,), lambda i: (0,)),
            pl.BlockSpec(TILE, lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec(TILE, lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N_IDX // TILE[1], TILE[1]), tbl.dtype),
    )(tbl, idx)


def main():
    key = jax.random.key(0)
    tbl = jax.random.randint(key, (TABLE,), 0, 1 << 30, dtype=jnp.int32)
    idx = jax.random.randint(
        jax.random.key(1), (N_IDX // TILE[1], TILE[1]), 0, TABLE,
        dtype=jnp.int32,
    )
    try:
        out = jax.block_until_ready(run(tbl, idx))
    except Exception as e:
        print(f"LOWERING FAILED: {type(e).__name__}: {str(e)[:400]}")
        return
    ref = np.asarray(tbl)[np.asarray(idx)]
    ok = np.array_equal(np.asarray(out), ref)
    print(f"correct={ok}")

    R = 8  # gathers per call: keep device time above the tunnel floor

    @jax.jit
    def f(seed):
        def body(acc, s):
            idx2 = jnp.bitwise_xor(idx, s & 0x3FF)
            return acc + jnp.sum(run(tbl, idx2)), None

        acc, _ = jax.lax.scan(body, jnp.int32(0), seed + jnp.arange(R))
        return acc

    jax.block_until_ready(f(jnp.int32(-7)))
    dt = timed_marginal(f, lambda i: (jnp.int32(1000 + i),)) / R
    print(f"pallas vmem gather: {dt * 1e3:.3f} ms for {N_IDX} idx "
          f"= {dt / N_IDX * 1e9:.3f} ns/idx")

    # XLA HBM gather comparison at the same index count
    @jax.jit
    def g(seed):
        def body(acc, s):
            idx2 = jnp.bitwise_xor(idx.ravel(), s & 0x3FF)
            return acc + jnp.sum(jnp.take(tbl, idx2)), None

        acc, _ = jax.lax.scan(body, jnp.int32(0), seed + jnp.arange(R))
        return acc

    jax.block_until_ready(g(jnp.int32(-7)))
    dt2 = timed_marginal(g, lambda i: (jnp.int32(2000 + i),)) / R
    print(f"xla gather:         {dt2 * 1e3:.3f} ms for {N_IDX} idx "
          f"= {dt2 / N_IDX * 1e9:.3f} ns/idx")


if __name__ == "__main__":
    main()
