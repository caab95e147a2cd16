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
from ray_tracing_tpu.ops.vec import Vec3

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
        # The reference's initial front {-1,-1,-1} is UNNORMALIZED and
        # move_camera steps along it raw (src/camera.c:26, :80-88), so WASD
        # moves before the first rotation are sqrt(3)x a post-rotation step.
        # Kept raw for parity; ray generation normalizes independently.
        return Camera(
            pos=jnp.array([5.0, 5.0, 5.0], jnp.float32),
            front=jnp.array([-1.0, -1.0, -1.0], jnp.float32),
            up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
            yaw=jnp.float32(-90.0),
            pitch=jnp.float32(0.0),
        )

    @property
    def pos_v(self) -> Vec3:
        return Vec3(self.pos[0], self.pos[1], self.pos[2])

    @property
    def front_v(self) -> Vec3:
        return Vec3(self.front[0], self.front[1], self.front[2])

    @property
    def up_v(self) -> Vec3:
        return Vec3(self.up[0], self.up[1], self.up[2])


def screen_height(config: RenderConfig) -> float:
    """2*tan(fov/2) with the degrees bug on by default (src/camera.c:107)."""
    half = config.fov / 2.0
    if not config.fov_degrees_bug:
        half = math.radians(half)
    return 2.0 * math.tan(half)


def ray_through_screen(camera: Camera, u, v, aspect_ratio,
                       config: RenderConfig = DEFAULT_CONFIG):
    """Rays through normalized screen coords u, v (batch-shaped arrays).

    Returns (ro, rd) Vec3s; ro is the camera position (broadcast), rd is
    UNNORMALIZED — the reference keeps the raw screen vector and only
    normalizes inside trace_ray; shading uses the raw direction
    (src/main.c:214), so we must too for parity.
    """
    w = (-camera.front_v).normalize()
    ub = camera.up_v.cross(w).normalize()
    vb = w.cross(ub)

    sh = screen_height(config)
    sw = aspect_ratio * sh

    # dir = (pos - 0.5*sw*ub - 0.5*sh*vb - w) + u*sw*ub + v*sh*vb - pos
    #     = (u - 0.5)*sw*ub + (v - 0.5)*sh*vb - w        (src/camera.c:118-121)
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    cu = (u - 0.5) * sw
    cv = (v - 0.5) * sh
    rd = Vec3(
        cu * ub.x + cv * vb.x - w.x,
        cu * ub.y + cv * vb.y - w.y,
        cu * ub.z + cv * vb.z - w.z,
    )
    ro = camera.pos_v.broadcast_to(rd.shape)
    return ro, rd


def pixel_grid(width: int, height: int, row0=0, norm_height: int | None = None):
    """Normalized (u, v) for every pixel with the reference's flips:
    u = 1 - x/(W-1), v = 1 - y/(H-1) (src/main.c:293-296). Row j of the
    (H, W) grids is the reference's row j, which its PNG writer flips
    vertically on save (src/main.c:672) — io.save_png applies the same.

    row0/norm_height select a `height`-row slice starting at global row
    `row0` of a norm_height-tall frame (the sharded path's per-device
    tile; row0 may be traced). Divisors are guarded for 1-pixel
    dimensions like the megakernel's _tile_uv — the ONE copy of this
    formula; don't re-derive it at call sites."""
    if norm_height is None:
        norm_height = height
    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(height, dtype=jnp.float32) + row0
    u = 1.0 - x / max(width - 1, 1)
    v = 1.0 - y / max(norm_height - 1, 1)
    uu, vv = jnp.meshgrid(u, v)  # (H, W)
    return uu, vv


def move(camera: Camera, direction: int, speed: float | None = None,
         config: RenderConfig = DEFAULT_CONFIG) -> Camera:
    """WASD movement (src/camera.c:80-88): UP/DOWN along front, LEFT/RIGHT
    along normalize(cross(front, up))."""
    if speed is None:
        speed = config.move_speed
    front = camera.front_v
    right = front.cross(camera.up_v).normalize()
    delta = {
        UP: front * speed,
        DOWN: front * -speed,
        LEFT: right * -speed,
        RIGHT: right * speed,
    }[direction]
    new_pos = camera.pos + jnp.stack([delta.x, delta.y, delta.z])
    return dataclasses.replace(camera, pos=new_pos)


def rotate(camera: Camera, dx: float, dy: float,
           config: RenderConfig = DEFAULT_CONFIG) -> Camera:
    """Mouse-look (src/camera.c:42-78). dx, dy are raw mouse deltas in
    pixels (dy already in 'screen-up' sense: the caller passes last_y - y).
    Sensitivity 0.1, pitch clamped to +/-89 deg."""
    yaw = camera.yaw + dx * config.mouse_sensitivity
    pitch = jnp.clip(camera.pitch + dy * config.mouse_sensitivity, -89.0, 89.0)
    yaw_r = jnp.deg2rad(yaw)
    pitch_r = jnp.deg2rad(pitch)
    front = Vec3(
        jnp.cos(yaw_r) * jnp.cos(pitch_r),
        jnp.sin(pitch_r),
        jnp.sin(yaw_r) * jnp.cos(pitch_r),
    ).normalize()
    return dataclasses.replace(
        camera, yaw=yaw, pitch=pitch,
        front=jnp.stack([front.x, front.y, front.z]),
    )
