"""Random direction sampling (SoA).

The reference draws directions by normalizing a uniform point in the
[-1,1]^3 cube (src/vector.c:99-111) — biased toward cube corners. Its
per-thread wyhash64 streams are all seeded to 0 (identical sequences,
src/utils.c:60-70); we replace that with counter-based threefry keys so
sampling is deterministic AND decorrelated across pixels/bounces — fixing
the reference's correlated-streams bug while keeping its sampling
*distribution* available for golden-image parity
(config.cube_biased_sampling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ray_tracing_tpu.ops.vec import Vec3


def random_direction(key, shape=(), cube_biased: bool = True, dtype=jnp.float32) -> Vec3:
    """Random unit directions as a Vec3 of `shape`-shaped components.

    cube_biased=True reproduces normalize(uniform([-1,1]^3))
    (src/vector.c:99-111); False gives exactly-uniform sphere directions.
    """
    if cube_biased:
        v = jax.random.uniform(key, (3, *shape), dtype, minval=-1.0, maxval=1.0)
    else:
        v = jax.random.normal(key, (3, *shape), dtype)
    return Vec3(v[0], v[1], v[2]).normalize()
