"""Cubemap skybox sampling.

Reproduces the reference's dominant-axis face selection, per-face (u,v)
formulas, [-1,1] clamp, and nearest-texel lookup
(src/gpu_and_windowing.c:42-112) as a batched gather.

The cubemap itself is a pytree: a (6, H, W, 3) texel array (uint8, kept
compact in HBM and converted to float after the gather) in the reference's
face order CF_FRONT..CF_BOTTOM (src/gpu_and_windowing.h:8-15).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

CF_FRONT, CF_BACK, CF_LEFT, CF_RIGHT, CF_TOP, CF_BOTTOM = 0, 1, 2, 3, 4, 5


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CubemapData:
    faces: jax.Array  # (6, H, W, 3) uint8 or float32

    @property
    def height(self) -> int:
        return self.faces.shape[1]

    @property
    def width(self) -> int:
        return self.faces.shape[2]


def face_uv(d):
    """Map unit directions (..., 3) -> (face:int32, u, v) per the reference
    tables (src/gpu_and_windowing.c:54-94). u, v in [-1, 1] (pre-clamp)."""
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)

    x_dom = (ax > ay) & (ax > az)
    y_dom = (ay > ax) & (ay > az)          # else-branch: Z dominant (ties -> Z)

    # Guarded divisors (gradients through the texel *coordinate* are not
    # meaningful anyway — nearest-neighbor lookup — so treat as detached-ish).
    sx = jnp.where(ax > 0, ax, 1.0)
    sy = jnp.where(ay > 0, ay, 1.0)
    sz = jnp.where(az > 0, az, 1.0)

    u = jnp.where(
        x_dom,
        jnp.where(dx > 0, -dz / sx, dz / sx),
        jnp.where(
            y_dom,
            dx / sy,
            jnp.where(dz > 0, dx / sz, -dx / sz),
        ),
    )
    v = jnp.where(
        x_dom,
        -dy / sx,
        jnp.where(
            y_dom,
            jnp.where(dy > 0, dz / sy, -dz / sy),
            -dy / sz,
        ),
    )
    face = jnp.where(
        x_dom,
        jnp.where(dx > 0, CF_RIGHT, CF_LEFT),
        jnp.where(
            y_dom,
            jnp.where(dy > 0, CF_TOP, CF_BOTTOM),
            jnp.where(dz > 0, CF_FRONT, CF_BACK),
        ),
    ).astype(jnp.int32)
    return face, u, v


def sample_cubemap(cubemap: CubemapData, d):
    """Nearest-texel skybox lookup for unit directions d (..., 3) -> (..., 3)
    float32 in [0, 1]. Matches src/gpu_and_windowing.c:96-111: clamp to
    [-1,1], remap to [0,1], truncate to texel, bytes/255."""
    face, u, v = face_uv(d)
    u = jnp.clip(u, -1.0, 1.0)
    v = jnp.clip(v, -1.0, 1.0)
    u = 0.5 * (u + 1.0)
    v = 0.5 * (v + 1.0)

    h, w = cubemap.height, cubemap.width
    x = (u * (w - 1)).astype(jnp.int32)    # C float->int truncation (values >= 0)
    y = (v * (h - 1)).astype(jnp.int32)

    texel = cubemap.faces[face, y, x]      # (..., 3)
    if cubemap.faces.dtype == jnp.uint8:
        return texel.astype(jnp.float32) / 255.0
    return texel.astype(jnp.float32)


def constant_sky(color=(0.0, 0.0, 0.0)) -> CubemapData:
    """A 1x1 cubemap with a uniform color — the 'no skybox' mode the
    reference exposes only as commented-out code (src/main.c:166-169)."""
    c = jnp.asarray(color, jnp.float32)
    return CubemapData(faces=jnp.broadcast_to(c, (6, 1, 1, 3)))
