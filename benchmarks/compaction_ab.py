#!/usr/bin/env python
"""A/B: jnp.nonzero(size=bb) vs the exclusive-cumsum+scatter compaction
that replaced it in ops/cubemap.sparse_sky_lookup (round-3 commit 92023ae,
landed during the tunnel outage with CPU-only exactness proofs — VERDICT
r03 directive #4 asks for the hardware row).

Measures the block-id compaction alone at the real shape (1080p padded
plane / 128-px blocks = 17408 flags), repeated R times per call (scan over
distinct flag rows) so device time clears the ~25 ms tunnel dispatch floor.

Usage: python benchmarks/compaction_ab.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from ray_tracing_tpu.utils.timing import timed_marginal

NB = (1088 * 2048) // 128  # padded 1080p plane in 128-px blocks
BB = max(NB // 8, 256)     # the default sparse budget tier
R = 64                     # compactions per call


def nonzero_form(fb):
    return jnp.nonzero(fb, size=BB, fill_value=NB)[0].astype(jnp.int32)


def cumsum_form(fb):
    fbi = fb.astype(jnp.int32)
    slot = jnp.cumsum(fbi) - fbi
    return (
        jnp.full((BB,), NB, jnp.int32)
        .at[jnp.where(fb, slot, BB)]
        .set(jnp.arange(NB, dtype=jnp.int32), mode="drop")
    )


def build(form):
    def run(flags, _seed):
        def body(acc, fb):
            return acc + form(fb).sum(), None
        total, _ = jax.lax.scan(body, jnp.int32(0), flags)
        return total
    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    for density in (0.01, 0.12, 1.0):
        flags = jax.device_put(
            jnp.asarray(rng.random((R, NB)) < density)
        )
        for name, form in (("nonzero", nonzero_form), ("cumsum", cumsum_form)):
            f = build(form)
            jax.block_until_ready(f(flags, -1))
            dt = timed_marginal(f, lambda i: (flags, i)) / R
            print(f"density={density:5.2f} {name:8s} {dt * 1e3:7.3f} ms/compaction",
                  flush=True)


if __name__ == "__main__":
    main()
