"""Pallas TPU megakernel: ray-gen + bounce loop + shading fused per tile.

The pure-XLA path (render/integrator.py) round-trips every (H, W) plane
through HBM at each fusion boundary of the 10-bounce loop. This kernel
keeps the ENTIRE ray state of a row-tile resident in VMEM for the whole
loop: ray origin/direction, throughput, radiance, masks — zero HBM traffic
except the final tile stores. Random numbers come from the hardware PRNG
(pltpu.prng_random_bits) instead of XLA threefry.

Semantics reuse: the kernel body calls the very same `trace`,
`trace_shadow`, Vec3 algebra, and shading steps as the XLA integrator
(they are pure jnp on component planes — Pallas runs them unchanged), so
there is a single source of truth for the reference physics
(src/main.c:131-272). Only the RNG source and the sky handling differ:

  * RNG: hardware PRNG seeded per (tile, sample); streams differ from the
    XLA path's threefry, so images agree statistically, not bitwise.
  * Sky: the cubemap gather stays OUTSIDE the kernel (TPU kernels have no
    per-lane HBM gather). The kernel emits (radiance, sky_dir,
    sky_throughput, died_by_miss) per pixel; the caller finishes with one
    XLA gather — same deferred-sky trick the integrator uses.

The kernel is forward-only; training/backward uses the XLA path (its
gradients are FD-validated). A Pallas backward with re-seeded identical
streams is the planned next step.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ray_tracing_tpu.config import RenderConfig, DEFAULT_CONFIG
from ray_tracing_tpu.ops.cubemap import CubemapData, constant_sky, sample_cubemap
from ray_tracing_tpu.ops.intersect import trace, trace_shadow
from ray_tracing_tpu.ops.vec import Vec3, fresnel_schlick
from ray_tracing_tpu.render.camera import Camera, screen_height
from ray_tracing_tpu.scene.types import Scene

LANE = 128          # TPU lane width: image width padded to a multiple
DEFAULT_TILE_H = 16
DEFAULT_TILE_W = 512  # bounds the kernel's live VMEM temporaries

# Packed scene layout (one SMEM row per object):
# cols 0-2 p0 | 3-5 p1 | 6-8 albedo | 9 roughness | 10 reflectance |
# 11 metallic | 12-14 emission_color * emission_power | 15 pad
SCENE_COLS = 16


def pack_scene(scene: Scene):
    emission = scene.emission_color * scene.emission_power[:, None]
    pad = jnp.zeros((scene.num_objects, 1), jnp.float32)
    return jnp.concatenate(
        [
            scene.p0,
            scene.p1,
            scene.albedo,
            scene.roughness[:, None],
            scene.reflectance[:, None],
            scene.metallic[:, None],
            emission,
            pad,
        ],
        axis=1,
    ).astype(jnp.float32)


class SceneView:
    """Duck-typed Scene over the packed SMEM ref — same accessor methods
    trace()/trace_shadow() use, static topology from the real Scene."""

    def __init__(self, ref, obj_type, light_index):
        self._r = ref
        self.obj_type = obj_type
        self.light_index = light_index

    @property
    def num_objects(self):
        return len(self.obj_type)

    @property
    def has_light(self):
        return self.light_index >= 0

    def is_sphere(self, i):
        from ray_tracing_tpu.scene.types import OBJ_SPHERE

        return self.obj_type[i] == OBJ_SPHERE

    def center(self, i):
        return Vec3(self._r[i, 0], self._r[i, 1], self._r[i, 2])

    def radius(self, i):
        return self._r[i, 3]

    def box_lo(self, i):
        return self.center(i)

    def box_hi(self, i):
        return Vec3(
            self._r[i, 0] + self._r[i, 3],
            self._r[i, 1] + self._r[i, 4],
            self._r[i, 2] + self._r[i, 5],
        )

    def albedo_of(self, i):
        return Vec3(self._r[i, 6], self._r[i, 7], self._r[i, 8])

    def roughness_of(self, i):
        return self._r[i, 9]

    def reflectance_of(self, i):
        return self._r[i, 10]

    def metallic_of(self, i):
        return self._r[i, 11]

    def emission_of(self, i):
        return Vec3(self._r[i, 12], self._r[i, 13], self._r[i, 14])

    def origin_of(self, i):
        if self.is_sphere(i):
            return self.center(i)
        return Vec3(
            self._r[i, 0] + 0.5 * self._r[i, 3],
            self._r[i, 1] + 0.5 * self._r[i, 4],
            self._r[i, 2] + 0.5 * self._r[i, 5],
        )


def _uniform(shape):
    """U[0,1) from the hardware PRNG (24-bit mantissa path). prng_random_bits
    yields SIGNED int32 — bitcast before shifting or >> sign-extends."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # >>8 leaves 24 bits => sign-safe as int32 (Mosaic lacks uint32->f32)
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return top24.astype(jnp.float32) * (1.0 / (1 << 24))


def _rand_dir(shape, cube_biased: bool) -> Vec3:
    if cube_biased:
        # normalize(U[-1,1]^3) — src/vector.c:99-111
        v = Vec3(
            _uniform(shape) * 2.0 - 1.0,
            _uniform(shape) * 2.0 - 1.0,
            _uniform(shape) * 2.0 - 1.0,
        )
        return v.normalize()
    # Box-Muller-free uniform sphere: z in [-1,1], phi in [0,2pi)
    z = _uniform(shape) * 2.0 - 1.0
    phi = _uniform(shape) * (2.0 * math.pi)
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return Vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def _kernel(
    scene_ref,  # SMEM (N, 16): packed scene (see pack_scene)
    cam_ref,    # SMEM (16,): pos3 ub3 vb3 w3 sw sh pad2
    seed_ref,   # SMEM (1,): int32 base seed
    out_r, out_g, out_b,          # VMEM (TILE_H, WP) radiance
    sky_x, sky_y, sky_z,          # VMEM: death direction
    skc_r, skc_g, skc_b,          # VMEM: throughput at death
    miss_ref,                     # VMEM: 1.0 where the ray left the scene
    *,
    obj_type: tuple,
    light_index: int,
    config: RenderConfig,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
):
    scene = SceneView(scene_ref, obj_type, light_index)
    i = pl.program_id(0)
    j = pl.program_id(1)
    # Knuth multiplicative hash (0x9E3779B1 as signed i32) decorrelates tiles.
    tile_id = i * pl.num_programs(1) + j
    pltpu.prng_seed(seed_ref[0] + tile_id * jnp.int32(-1640531535))

    shape = (tile_h, tile_w)
    xs = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
        + j.astype(jnp.float32) * tile_w
    )
    ys = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
        + i.astype(jnp.float32) * tile_h
    )

    # pixel -> screen coords with the reference flips (src/main.c:293-296)
    u = 1.0 - xs / (width - 1)
    v = 1.0 - ys / (height - 1)

    pos = Vec3(cam_ref[0], cam_ref[1], cam_ref[2])
    ub = Vec3(cam_ref[3], cam_ref[4], cam_ref[5])
    vb = Vec3(cam_ref[6], cam_ref[7], cam_ref[8])
    w = Vec3(cam_ref[9], cam_ref[10], cam_ref[11])
    sw, sh = cam_ref[12], cam_ref[13]

    cu = (u - 0.5) * sw
    cv = (v - 0.5) * sh
    rd = Vec3(
        cu * ub.x + cv * vb.x - w.x,
        cu * ub.y + cv * vb.y - w.y,
        cu * ub.z + cv * vb.z - w.z,
    )
    ro = Vec3(
        jnp.full(shape, pos.x), jnp.full(shape, pos.y), jnp.full(shape, pos.z)
    )

    contrib = Vec3.full(shape, 1.0)
    result = Vec3.zeros(shape)
    # NOTE: comparisons, not bool constants — Mosaic has no i8->i1 trunc.
    alive = xs >= 0.0
    sky_dir = Vec3.full(shape, 1.0)
    sky_contrib = Vec3.zeros(shape)
    died_miss = xs < 0.0

    if scene.has_light:
        light_origin = scene.origin_of(scene.light_index)

    # ---- the bounce loop, unrolled (static bounces; src/main.c:156-264)
    for _ in range(config.bounces):
        d = rd.normalize()
        h = trace(scene, ro, rd)

        miss_now = alive & ~h.hit
        sky_dir = Vec3.where(miss_now, d, sky_dir)
        sky_contrib = Vec3.where(miss_now, contrib, sky_contrib)
        died_miss = died_miss | miss_now
        active = alive & h.hit

        # next-event light sampling (src/main.c:180-210)
        if scene.has_light:
            shadow_sum = Vec3.zeros(shape)
            num = jnp.zeros(shape, jnp.float32)
            for _k in range(config.shadow_samples):
                rand_k = _rand_dir(shape, config.cube_biased_sampling)
                accept = rand_k.dot(h.normal) > 0
                to_light = light_origin - h.point
                sample_dir = (rand_k * config.shadow_spread + to_light).normalize()
                sample_ro = h.point + sample_dir * config.hit_offset
                hit2, emit2 = trace_shadow(scene, sample_ro, sample_dir)
                take = accept & hit2
                shadow_sum = Vec3(
                    shadow_sum.x + jnp.where(take, emit2.x, 0.0),
                    shadow_sum.y + jnp.where(take, emit2.y, 0.0),
                    shadow_sum.z + jnp.where(take, emit2.z, 0.0),
                )
                num = num + accept.astype(jnp.float32)
            sampled_light = shadow_sum * (1.0 / jnp.maximum(num, 1.0))
        else:
            sampled_light = Vec3.zeros(shape)

        # Fresnel with RAW incoming direction (src/main.c:214-222)
        NoV = jnp.clip(h.normal.dot(-rd), 0.0, 1.0)
        f0_d = 0.16 * h.reflectance * h.reflectance
        one_minus_m = 1.0 - h.metallic
        f0 = Vec3(
            f0_d * one_minus_m + h.albedo.x * h.metallic,
            f0_d * one_minus_m + h.albedo.y * h.metallic,
            f0_d * one_minus_m + h.albedo.z * h.metallic,
        )
        F = fresnel_schlick(NoV, f0)

        rand_dir = _rand_dir(shape, config.cube_biased_sampling)
        rand_dir = Vec3.where(rand_dir.dot(h.normal) < 0, -rand_dir, rand_dir)

        result = result + Vec3.where(active, h.emission * contrib, Vec3.zeros(shape))

        u_branch = _uniform(shape)
        specular = (h.metallic > 0.001) | (u_branch <= F.avg())
        reflect_dir = rd.reflect(h.normal)
        out_spec = (rand_dir * h.roughness + reflect_dir).normalize()
        out_dir = Vec3.where(specular, out_spec, rand_dir)
        contrib_new = Vec3.where(specular, contrib, contrib * h.albedo * one_minus_m)

        light_on = active & ~sampled_light.is_zero()
        result = result + Vec3.where(
            light_on,
            sampled_light * contrib_new * config.light_sample_weight,
            Vec3.zeros(shape),
        )
        contrib_new = Vec3.where(
            light_on, contrib_new * (1.0 - config.light_sample_weight), contrib_new
        )

        ro = Vec3.where(active, h.point + out_dir * config.hit_offset, ro)
        rd = Vec3.where(active, out_dir, rd)
        contrib = Vec3.where(active, contrib_new, contrib)
        alive = active

    out_r[...] = result.x
    out_g[...] = result.y
    out_b[...] = result.z
    sky_x[...] = sky_dir.x
    sky_y[...] = sky_dir.y
    sky_z[...] = sky_dir.z
    skc_r[...] = sky_contrib.x
    skc_g[...] = sky_contrib.y
    skc_b[...] = sky_contrib.z
    miss_ref[...] = died_miss.astype(jnp.float32)


def _camera_pack(camera: Camera, aspect: float, config: RenderConfig):
    w = (-camera.front_v).normalize()
    ub = camera.up_v.cross(w).normalize()
    vb = w.cross(ub)
    sh = screen_height(config)
    sw = aspect * sh
    return jnp.stack(
        [
            camera.pos[0], camera.pos[1], camera.pos[2],
            ub.x, ub.y, ub.z,
            vb.x, vb.y, vb.z,
            w.x, w.y, w.z,
            jnp.float32(sw), jnp.float32(sh),
            jnp.float32(0), jnp.float32(0),
        ]
    ).astype(jnp.float32)


def render_tiles_pallas(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    seed,
    config: RenderConfig = DEFAULT_CONFIG,
    tile_h: int = DEFAULT_TILE_H,
    tile_w: int = DEFAULT_TILE_W,
    interpret: bool = False,
):
    """One sample per pixel over a padded (HP, WP) grid. Returns a dict of
    (HP, WP) planes: radiance, sky direction, sky throughput, miss mask."""
    wp = pl.cdiv(width, tile_w) * tile_w
    hp = pl.cdiv(height, tile_h) * tile_h
    grid = (hp // tile_h, wp // tile_w)

    cam_pack = _camera_pack(camera, width / height, config)
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))

    plane = jax.ShapeDtypeStruct((hp, wp), jnp.float32)
    out_shape = [plane] * 10

    kernel = functools.partial(
        _kernel,
        obj_type=scene.obj_type,
        light_index=scene.light_index,
        config=config,
        width=width,
        height=height,
        tile_h=tile_h,
        tile_w=tile_w,
    )

    block = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[block] * 10,
        out_shape=out_shape,
        interpret=interpret,
    )(pack_scene(scene), cam_pack, seed)

    names = ["r", "g", "b", "sx", "sy", "sz", "cr", "cg", "cb", "miss"]
    return dict(zip(names, outs))


def render_image_pallas(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    seed=0,
    spp: int = 1,
    config: RenderConfig = DEFAULT_CONFIG,
    cubemap: CubemapData | None = None,
    tile_h: int = DEFAULT_TILE_H,
    tile_w: int = DEFAULT_TILE_W,
    interpret: bool = False,
):
    """Full forward render via the megakernel + deferred XLA sky gather.
    Drop-in for render_image (same statistics, different RNG streams)."""
    if cubemap is None:
        cubemap = constant_sky()
    seed = jnp.asarray(seed, jnp.int32)

    def one(s):
        t = render_tiles_pallas(
            scene, camera, width, height, s, config, tile_h, tile_w, interpret
        )
        sky = sample_cubemap(
            cubemap,
            Vec3(t["sx"], t["sy"], t["sz"]),
            bilinear=config.env_filter == "bilinear",
        )
        rgb = Vec3(t["r"], t["g"], t["b"]) + sky * Vec3(t["cr"], t["cg"], t["cb"]) * t["miss"]
        return rgb.clip(0.0, 1.0)

    if spp == 1:
        out = one(seed)
    else:
        hp = pl.cdiv(height, tile_h) * tile_h
        wp = pl.cdiv(width, tile_w) * tile_w

        def body(acc, s):
            return acc + one(s), None

        total, _ = jax.lax.scan(
            body,
            Vec3.zeros((hp, wp)),
            seed * jnp.int32(7919) + jnp.arange(spp, dtype=jnp.int32),
        )
        out = total * (1.0 / spp)

    img = out.to_array()
    return img[:height, :width]
