"""Random direction sampling.

The reference draws directions by normalizing a uniform point in the
[-1,1]^3 cube (src/vector.c:99-111) — a distribution biased toward cube
corners. Its per-thread wyhash64 streams are all seeded to 0 (identical
sequences, src/utils.c:60-70); we replace that with counter-based threefry
keys split per batch element x bounce, which is deterministic AND decorrelated
— fixing the reference bug while keeping its sampling *distribution*
available for golden-image parity (config.cube_biased_sampling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ray_tracing_tpu.ops.linalg import safe_normalize


def random_direction(key, shape=(), cube_biased: bool = True, dtype=jnp.float32):
    """Sample random unit directions with trailing dim 3.

    cube_biased=True reproduces normalize(uniform([-1,1]^3))
    (src/vector.c:99-111). False gives exactly-uniform sphere directions
    (Gaussian normalization).
    """
    if cube_biased:
        v = jax.random.uniform(key, (*shape, 3), dtype, minval=-1.0, maxval=1.0)
        return safe_normalize(v)
    v = jax.random.normal(key, (*shape, 3), dtype)
    return safe_normalize(v)
