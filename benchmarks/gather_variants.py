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
        "at.get promise_in_bounds",
        lambda s: jnp.sum(tbl.at[mix(s)].get(mode="promise_in_bounds")),
    )
    bench(
        "at.get promise + unique",
        lambda s: jnp.sum(
            tbl.at[mix(s)].get(mode="promise_in_bounds", unique_indices=True)
        ),
    )
    bench(
        "at.get sorted idx (promise+sorted flags)",
        lambda s: jnp.sum(
            tbl.at[jnp.bitwise_or(idx_sorted, 0 * (s & 1))].get(
                mode="promise_in_bounds", indices_are_sorted=True
            )
        ),
    )
    # ^ SUSPECT: 0*(s&1) folds to 0 => the gather is loop-invariant and XLA
    # can hoist it out of the R-step scan (27/8 = 3.4 ms would masquerade
    # as an 8x win). The next case stays sorted AND loop-variant:
    bench(
        "at.get sorted idx, loop-variant",
        lambda s: jnp.sum(
            tbl.at[jnp.minimum(idx_sorted + (s & 0xFF), TABLE - 1)].get(
                mode="promise_in_bounds", indices_are_sorted=True
            )
        ),
    )
    bench("sort 2M int32", lambda s: jnp.sum(jnp.sort(mix(s)).astype(jnp.uint32)))
    # end-to-end sorted-gather pipeline: sort (idx, position) pairs ->
    # sorted gather -> scatter values back to original positions. If this
    # beats the plain unsorted gather, the sky fetch has a faster form.
    def pipeline(s):
        i = mix(s)
        pos = jnp.arange(N_IDX, dtype=jnp.int32)
        i_s, pos_s = jax.lax.sort((i, pos), num_keys=1)
        vals = tbl.at[i_s].get(mode="promise_in_bounds", indices_are_sorted=True)
        out = jnp.zeros((N_IDX,), jnp.uint32).at[pos_s].set(
            vals, mode="drop", unique_indices=True
        )
        return jnp.sum(out)

    bench("sort+gather+unsort pipeline", pipeline)
    bench(
        "take width-2 rows (1M idx, 2 texels each)",
        lambda s: jnp.sum(
            jnp.take(tbl2, mix(s)[: N_IDX // 2] >> 1, axis=0, mode="clip")
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
