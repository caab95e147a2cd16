"""Batched ray-primitive intersection and closest-hit trace.

Replaces the reference's scalar per-object loop (src/scene.c:17-190) with a
single broadcast over (batch..., N objects): every ray tests every padded
object slot in one fused VPU pass, then a masked argmin picks the nearest.
For the tiny scene sizes of the reference (<=1024, typically <16) this is
the right TPU shape — no BVH, no divergence, fully static.

All math is differentiable w.r.t. scene geometry. Discrete outcomes
(which object was hit, which cube face) follow the detached-decision rule:
topology from argmin/comparisons, distances and normals smooth given that
topology.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ray_tracing_tpu.ops.linalg import dot, safe_normalize
from ray_tracing_tpu.scene.types import Scene

BIG = jnp.float32(3.4e38)  # stand-in for FLT_MAX (src/scene.c:160)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HitRecord:
    """Vectorized HitInfo (src/scene.h: HitInfo). All fields (batch...)."""

    t: jax.Array        # (...,) distance along the *normalized* direction
    obj: jax.Array      # (...,) int32 object index; -1 on miss
    point: jax.Array    # (..., 3) hit point
    normal: jax.Array   # (..., 3) unit surface normal (0 on miss)
    hit: jax.Array      # (...,) bool


def intersect_spheres(ro, rd, centers, radii):
    """Quadratic ray-sphere solve (src/scene.c:79-134).

    ro, rd: (..., 3); centers: (N, 3); radii: (N,).
    Returns t: (..., N) and valid: (..., N). rd need not be unit length
    (the reference uses a = dot(d, d)).
    """
    oc = centers - ro[..., None, :]                      # (..., N, 3)
    a = dot(rd, rd)[..., None]                           # (..., 1)
    b = -2.0 * dot(oc, rd[..., None, :])                 # (..., N)
    c = dot(oc, oc) - radii**2                           # (..., N)

    discr = b * b - 4.0 * a * c
    valid_d = discr > 0                                  # strict, src/scene.c:116
    sq = jnp.sqrt(jnp.where(valid_d, discr, 0.0))        # where-trick for grads
    inv2a = 0.5 / a
    s0 = (-b - sq) * inv2a                               # near root
    s1 = (-b + sq) * inv2a                               # far root
    # nearest non-negative root (src/scene.c:119-127)
    t = jnp.where(s0 < 0, s1, s0)
    valid = valid_d & (t >= 0)
    return jnp.where(valid, t, BIG), valid


def intersect_cubes(ro, rd, origins, sizes):
    """Slab-method ray-AABB with axis-aligned face normals (src/scene.c:17-77).

    ro, rd: (..., 3); origins, sizes: (N, 3).
    Returns t (..., N), valid (..., N), normal (..., N, 3).

    Mirrors the reference exactly: the hit axis is x unless the y (then z)
    slab strictly tightens tnear; normals point against the ray's direction
    component on the hit axis (sign of rd > 0 -> -1). Negative tnear (origin
    inside the box) is rejected by trace(), same as the reference's t >= 0
    check in trace_ray (src/scene.c:168).
    """
    a = origins                                          # (N, 3)
    b = origins + sizes
    ro_b = ro[..., None, :]                              # (..., 1, 3)
    rd_b = rd[..., None, :]

    # IEEE inf semantics on rd == 0 match the C code's raw divisions.
    inv = 1.0 / rd_b
    t_lo = (a - ro_b) * inv                              # (..., N, 3)
    t_hi = (b - ro_b) * inv
    pos = rd_b >= 0                                      # src/scene.c:31
    tmin = jnp.where(pos, t_lo, t_hi)
    tmax = jnp.where(pos, t_hi, t_lo)

    txmin, tymin, tzmin = tmin[..., 0], tmin[..., 1], tmin[..., 2]
    txmax, tymax, tzmax = tmax[..., 0], tmax[..., 1], tmax[..., 2]

    miss_xy = (txmin > tymax) | (tymin > txmax)          # src/scene.c:47
    y_tightens = tymin > txmin
    t_near = jnp.maximum(txmin, tymin)
    t_far = jnp.minimum(txmax, tymax)
    axis = jnp.where(y_tightens, 1, 0)

    miss_z = (t_near > tzmax) | (tzmin > t_far)          # src/scene.c:61
    z_tightens = tzmin > t_near
    t_near = jnp.maximum(t_near, tzmin)
    axis = jnp.where(z_tightens, 2, axis)

    valid = ~(miss_xy | miss_z)

    # normal = -sign(rd_axis) * e_axis, with rd > 0 -> -1 (src/scene.c:69-75)
    rd_full = jnp.broadcast_to(rd_b, (*axis.shape, 3))
    rd_on_axis = jnp.take_along_axis(rd_full, axis[..., None], axis=-1)[..., 0]
    sign = jnp.where(rd_on_axis > 0, -1.0, 1.0)
    normal = sign[..., None] * jax.nn.one_hot(axis, 3, dtype=ro.dtype)

    valid = valid & (t_near >= 0)
    return jnp.where(valid, t_near, BIG), valid, normal


def trace(scene: Scene, ro, rd) -> HitRecord:
    """Closest-hit over all padded object slots (src/scene.c:156-190).

    Normalizes the direction first (the reference's trace_ray does too) —
    t is measured along the unit direction regardless of |rd|.
    """
    d = safe_normalize(rd)

    t_s, valid_s = intersect_spheres(ro, d, scene.p0, scene.radius)
    t_c, valid_c, n_c = intersect_cubes(ro, d, scene.p0, scene.p1)

    is_sphere = scene.is_sphere                          # (N,)
    t = jnp.where(is_sphere, t_s, t_c)                   # (..., N)
    valid = jnp.where(is_sphere, valid_s, valid_c) & scene.active

    t = jnp.where(valid, t, BIG)
    obj = jnp.argmin(t, axis=-1).astype(jnp.int32)       # first-min wins, like the
    t_min = jnp.take_along_axis(t, obj[..., None], axis=-1)[..., 0]  # strict < scan
    hit = t_min < BIG

    point = ro + d * t_min[..., None]

    # Sphere normal from the hit point (src/scene.c:144-150); cube normal
    # from the slab axis. Gather the winning object's params, then select.
    center = scene.p0[obj]                               # (..., 3)
    sphere_n = safe_normalize(point - center)
    cube_n = jnp.take_along_axis(n_c, obj[..., None, None], axis=-2)[..., 0, :]
    winner_is_sphere = is_sphere[obj]
    normal = jnp.where(winner_is_sphere[..., None], sphere_n, cube_n)

    zero3 = jnp.zeros_like(point)
    return HitRecord(
        t=jnp.where(hit, t_min, -1.0),
        obj=jnp.where(hit, obj, -1),
        point=jnp.where(hit[..., None], point, zero3),
        normal=jnp.where(hit[..., None], normal, zero3),
        hit=hit,
    )
