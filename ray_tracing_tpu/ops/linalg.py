"""Batched 3-vector math on (..., 3) arrays.

TPU-native counterpart of the reference's scalar Vector3 ops
(src/vector.c:37-173). Everything broadcasts over arbitrary leading batch
dims and is differentiable; the reference's `combine` workhorse is just
`a*u + b*v` inline. Division guards use the double-where trick so gradients
stay NaN-free at the guarded points.
"""

from __future__ import annotations

import jax.numpy as jnp

NORMALIZE_EPS = 1e-5  # src/vector.c:35 (EPSILON)
ZERO_EPS = 1e-4       # src/vector.c:79 (iszerof)


def dot(a, b, keepdims: bool = False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def norm2(v):
    return dot(v, v)


def norm(v):
    return jnp.sqrt(norm2(v))


def cross(a, b):
    return jnp.cross(a, b)


def safe_normalize(v, eps: float = NORMALIZE_EPS):
    """normalize() with the reference's guard: if ||v|| < eps the vector is
    returned unchanged (src/vector.c:129-138). Gradient-safe at the guard."""
    n = norm(v)[..., None]
    small = n < eps
    # where-trick: never divide by a tiny norm, even in the dead branch.
    safe_n = jnp.where(small, jnp.ones_like(n), n)
    return jnp.where(small, v, v / safe_n)


def reflect(d, n):
    """Mirror `d` about the plane with normal `n` (src/vector.c:113-117).

    Matches the reference's call pattern `reflect(dir, -normal)` being the
    standard reflection: reflect(d, n) = d - 2*dot(n, d)*n when applied to
    a unit normal of either sign.
    """
    return d - 2.0 * dot(n, d, keepdims=True) * n


def fresnel_schlick(cos_theta, f0):
    """F = f0 + (1 - f0) * (1 - cos)^5 (src/main.c:126-129).

    cos_theta: (...,), f0: (..., 3) -> (..., 3).
    """
    return f0 + (1.0 - f0) * (1.0 - cos_theta[..., None]) ** 5


def lerp(a, b, t):
    return a * (1.0 - t) + b * t


def avg3(v):
    """Mean of the 3 components (src/vector.c:89-92)."""
    return jnp.mean(v, axis=-1)


def is_zero_vec(v, eps: float = ZERO_EPS):
    """All components within (-eps, eps) (src/vector.c:79-87)."""
    return jnp.all(jnp.abs(v) < eps, axis=-1)
