"""Pinhole camera: pose pytree + ray generation + interactive controls.

Replaces the reference's global mutable camera state (src/camera.c:23-35)
with an immutable pytree; move/rotate are pure functions returning a new
Camera, so the interactive loop composes with jit and the pose is a
differentiable parameter for inverse rendering.

Ray generation reproduces src/camera.c:95-125 exactly, including the
reference's degrees-as-radians quirk: ``screen_h = 2*tan(fov/2)`` is
evaluated with fov in DEGREES (tan(15 rad) ~ -0.856 => screen_h ~ -1.712,
a negative height that flips the image vertically). Disable with
config.fov_degrees_bug=False for a physically-sane camera.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ray_tracing_tpu.config import RenderConfig, DEFAULT_CONFIG
from ray_tracing_tpu.ops.linalg import cross, safe_normalize

UP, DOWN, LEFT, RIGHT = 0, 1, 2, 3  # Direction enum (src/camera.h)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """5-DOF pose. `front` is carried explicitly because the reference's
    initial front normalize({-1,-1,-1}) is NOT consistent with its initial
    yaw=-90/pitch=0 — front only snaps to yaw/pitch after the first mouse
    move (src/camera.c:24-35, 42-78). Differentiable leaves: pos, front."""

    pos: jax.Array    # (3,)
    front: jax.Array  # (3,) unit
    up: jax.Array     # (3,)
    yaw: jax.Array    # () degrees
    pitch: jax.Array  # () degrees

    @staticmethod
    def default() -> "Camera":
        inv_sqrt3 = 1.0 / math.sqrt(3.0)
        return Camera(
            pos=jnp.array([5.0, 5.0, 5.0], jnp.float32),
            front=jnp.array([-inv_sqrt3] * 3, jnp.float32),
            up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
            yaw=jnp.float32(-90.0),
            pitch=jnp.float32(0.0),
        )


def screen_height(config: RenderConfig) -> float:
    """2*tan(fov/2) with the degrees bug on by default (src/camera.c:107)."""
    half = config.fov / 2.0
    if not config.fov_degrees_bug:
        half = math.radians(half)
    return 2.0 * math.tan(half)


def ray_through_screen(camera: Camera, u, v, aspect_ratio, config: RenderConfig = DEFAULT_CONFIG):
    """Generate rays through normalized screen coords u, v (...,).

    Returns (ro, rd) with ro (..., 3) broadcast from the camera position and
    rd (..., 3) UNNORMALIZED — the reference keeps the raw screen vector and
    only normalizes inside trace_ray; shading uses the raw direction
    (src/main.c:214), so we must too for parity.
    """
    w = safe_normalize(-camera.front)
    ub = safe_normalize(cross(camera.up, w))
    vb = cross(w, ub)

    sh = screen_height(config)
    sw = aspect_ratio * sh

    horizontal = ub * sw
    vertical = vb * sh
    lower_left = camera.pos - 0.5 * horizontal - 0.5 * vertical - w

    u = jnp.asarray(u, camera.pos.dtype)[..., None]
    v = jnp.asarray(v, camera.pos.dtype)[..., None]
    rd = lower_left + u * horizontal + v * vertical - camera.pos
    ro = jnp.broadcast_to(camera.pos, rd.shape)
    return ro, rd


def pixel_grid(width: int, height: int):
    """Normalized (u, v) for every pixel, with the reference's flips:
    u = 1 - x/(W-1), v = 1 - y/(H-1) (src/main.c:293-296). Row 0 of the
    returned (H, W) grids corresponds to the reference's j=0 row, which its
    PNG writer flips on save — io.save_png applies the same flip."""
    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(height, dtype=jnp.float32)
    u = 1.0 - x / (width - 1)
    v = 1.0 - y / (height - 1)
    uu, vv = jnp.meshgrid(u, v)  # (H, W)
    return uu, vv


def move(camera: Camera, direction: int, speed: float | None = None,
         config: RenderConfig = DEFAULT_CONFIG) -> Camera:
    """WASD movement (src/camera.c:80-88): UP/DOWN along front, LEFT/RIGHT
    along normalize(cross(front, up))."""
    if speed is None:
        speed = config.move_speed
    right = safe_normalize(cross(camera.front, camera.up))
    delta = {
        UP: camera.front * speed,
        DOWN: -camera.front * speed,
        LEFT: -right * speed,
        RIGHT: right * speed,
    }[direction]
    return dataclasses.replace(camera, pos=camera.pos + delta)


def rotate(camera: Camera, dx: float, dy: float,
           config: RenderConfig = DEFAULT_CONFIG) -> Camera:
    """Mouse-look (src/camera.c:42-78). dx, dy are raw mouse deltas in
    pixels (dy already in 'screen-up' sense: the caller passes
    last_y - y). Sensitivity 0.1, pitch clamped to +/-89 deg."""
    yaw = camera.yaw + dx * config.mouse_sensitivity
    pitch = jnp.clip(camera.pitch + dy * config.mouse_sensitivity, -89.0, 89.0)
    yaw_r = jnp.deg2rad(yaw)
    pitch_r = jnp.deg2rad(pitch)
    front = safe_normalize(
        jnp.stack([
            jnp.cos(yaw_r) * jnp.cos(pitch_r),
            jnp.sin(pitch_r),
            jnp.sin(yaw_r) * jnp.cos(pitch_r),
        ])
    )
    return dataclasses.replace(camera, yaw=yaw, pitch=pitch, front=front)
