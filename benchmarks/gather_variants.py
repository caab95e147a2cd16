#!/usr/bin/env python
"""XLA TPU gather variants at the skybox working point (2M indices,
25.2M-entry uint32 table): is the measured ~7-9 ns/index floor sensitive
to bounds mode, index dtype, slice width, or batching form?

The scene_0/AA sky fetch is gather-bound (profile_bwd round 5); any
per-index win here multiplies straight into the fwd+bwd headline.
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from ray_tracing_tpu.utils.timing import timed_marginal

TABLE = 6 * 2048 * 2048
N_IDX = 2 * 1024 * 1024
R = 8


def bench(name, fn):
    @jax.jit
    def run(seed):
        def body(acc, s):
            return acc + fn(s), None

        acc, _ = jax.lax.scan(
            body, jnp.uint32(0), seed + jnp.arange(R, dtype=jnp.int32)
        )
        return acc

    jax.block_until_ready(run(jnp.int32(-7)))
    dt = timed_marginal(run, lambda i: (jnp.int32(1000 + i),)) / R
    print(f"{name:42s} {dt * 1e3:8.3f} ms  {dt / N_IDX * 1e9:6.2f} ns/idx",
          flush=True)


def main():
    tbl = jax.random.randint(
        jax.random.key(0), (TABLE,), 0, 1 << 24, dtype=jnp.uint32
    )
    idx = jax.random.randint(
        jax.random.key(1), (N_IDX,), 0, TABLE, dtype=jnp.int32
    )
    idx_sorted = jnp.sort(idx)
    tbl2 = tbl.reshape(-1, 2)  # (12.6M, 2) paired rows

    def mix(s):
        # cheap per-call index perturbation (stays in-bounds)
        return jnp.bitwise_xor(idx, s & 0x3FF)

    bench("take (default fill)", lambda s: jnp.sum(jnp.take(tbl, mix(s))))
    bench("take mode=clip", lambda s: jnp.sum(jnp.take(tbl, mix(s), mode="clip")))
    bench(
        "take mode=promise_in_bounds",
        lambda s: jnp.sum(jnp.take(tbl, mix(s), mode="promise_in_bounds")),
    )
    bench(
        "take promise + unique",
        lambda s: jnp.sum(
            jnp.take(tbl, mix(s), mode="promise_in_bounds", unique_indices=True)
        ),
    )
    bench(
        "take sorted idx (promise+sorted flags)",
        lambda s: jnp.sum(
            jnp.take(
                tbl,
                jnp.bitwise_or(idx_sorted, 0 * (s & 1)),
                mode="promise_in_bounds",
                indices_are_sorted=True,
            )
        ),
    )
    bench(
        "take width-2 rows (1M idx, 2 texels each)",
        lambda s: jnp.sum(
            jnp.take(tbl2, mix(s)[: N_IDX // 2] >> 1, axis=0,
                     mode="promise_in_bounds")
        ),
    )
    bench(
        "scatter 2M (at.set, drop mode)",
        lambda s: jnp.sum(
            jnp.zeros((TABLE // 4,), jnp.uint32)
            .at[mix(s) >> 2]
            .set(jnp.uint32(1), mode="drop")
        ),
    )


if __name__ == "__main__":
    main()
