"""Pallas TPU megakernels: ray-gen + bounce loop + shading fused per tile,
forward AND backward.

The pure-XLA path (render/integrator.py) round-trips every (H, W) plane
through HBM at each fusion boundary of the 10-bounce loop. These kernels
keep the ENTIRE ray state of a pixel tile resident in VMEM for the whole
loop — zero HBM traffic except the final tile stores. Random numbers come
from the hardware PRNG (pltpu.prng_random_bits).

Architecture:

  * `tile_physics` — the reference estimator (src/main.c:131-272) as a pure
    jnp function over one tile, parameterized by a *draw provider*. The
    SAME function runs in the forward kernel, the backward kernel, and the
    tests.
  * draw providers — `StreamingDraws` generates random numbers on demand
    (forward); `PrecomputedDraws` generates the identical stream up front
    so the physics is a pure function of (params, draws) that `jax.vjp`
    can differentiate (backward). Both call the PRNG in the same order, so
    the backward re-materializes the exact forward paths from the seed: no
    residuals ever leave VMEM.
  * `_render_tiles_core` — jax.custom_vjp wrapper. Forward = fwd kernel;
    backward = bwd kernel computing d(all tile outputs)/d(packed scene,
    camera pack) via jax.vjp *inside* the kernel, accumulating parameter
    gradients across the sequential grid into a single (N,16) block.

Sky handling: the cubemap gather stays OUTSIDE the kernel (TPU kernels
have no per-lane HBM gather). The kernels emit (radiance, sky_dir,
sky_throughput, died_by_miss) per pixel; the caller finishes with one XLA
gather — the same deferred-sky trick the XLA integrator uses. Gradients
flow through those outputs automatically.
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
from ray_tracing_tpu.ops.intersect import (
    UNROLL_LIMIT,
    ShadowRecord,
    TraceRecord,
    _single_emissive_index,
    trace,
    trace_record,
    trace_replay,
    trace_replay_fetch,
    trace_shadow,
    trace_shadow_record,
    trace_shadow_replay,
    trace_shadow_replay_fetch,
)
from ray_tracing_tpu.ops.vec import Vec3, fresnel_schlick
from ray_tracing_tpu.render.camera import Camera, screen_height
from ray_tracing_tpu.scene.types import OBJ_SPHERE, Scene, light_origin_from

LANE = 128
# ONE tile shape for forward AND backward: the per-tile PRNG seed and the
# in-tile draw order define the random streams, so the backward can only
# re-materialize the forward's exact paths if it tiles the image the same
# way. The shape scales down with scene complexity because the backward's
# vjp residuals (~ objects x bounces x tile pixels) must fit scoped VMEM
# (~16MB): scene_2 (3 objects, no NEE) runs 16-row tiles; scene_0 (9
# objects + 3 shadow rays) needs 8 rows. Measured, not guessed — see
# default_tiles' docstring for the round-4 sweep numbers.
DEFAULT_TILE_H = 16
DEFAULT_TILE_W = 256


def default_tiles(scene: Scene, config: RenderConfig):
    """Complexity-scaled tile shape shared by fwd and bwd kernels.

    Unrolled-scene tiers re-measured round 4 on the current stack
    (benchmarks/tile_sweep.py, honest marginal timing): 128-wide tiles
    beat 256-wide on BOTH reference workloads — scene_2 full physics
    16x128 vs 16x256: fwd 7.14 vs 7.41, fwd+bwd 17.16 vs 17.77 ms/sample;
    scene_0 8x128 vs 8x256: fwd 30.7 vs 35.2, fwd+bwd 45.0 vs 52.5
    (8x512 / 16x256 OOM scene_0's backward). Narrower tiles also lower
    the backward's VMEM peak. The >UNROLL_LIMIT fori-trace tier was
    re-swept round 5 on hardware (benchmarks/large_scene.py, 201/1024
    objects, 1080p full physics + skybox): 8x128 wins the forward at both
    sizes (N=201: 597 vs 663 ms/sample at 8x256; N=1024: 2893 vs 3234)
    AND is the only shape whose replay backward fits scoped VMEM at
    N=201 (8x256/16x128/16x256 all overflow the 16MB stack)."""
    if scene.num_objects > UNROLL_LIMIT:
        # fori trace; the path-replay backward stores per-bounce winner
        # records (~bounces x (17 + 5*shadow_samples) planes) in VMEM, so
        # the scan tier takes the narrowest tile (see sweep above)
        eff = config.bounces * (
            1 + (config.shadow_samples if scene.has_light else 0)
        )
        return (16, 128) if eff <= 12 else (8, 128)
    eff = scene.num_objects * (
        1 + (config.shadow_samples if scene.has_light else 0)
    )
    if eff <= 12:
        return 16, 128
    return 8, 128

# Packed scene layout (one row per object) — Scene.packed_rows():
# cols 0-2 p0 | 3-5 p1 | 6-8 albedo | 9 roughness | 10 reflectance |
# 11 metallic | 12-14 emission_color * emission_power | 15 type tag (f32).
# NOTE: native/rt_native.cpp's parser uses a DIFFERENT layout (raw emission
# color at 12-14, emission_power at 15) — scene/native.py converts.
SCENE_COLS = 16


def pack_scene(scene: Scene):
    """Same row layout as Scene.packed_rows (col 15 = type tag, which the
    in-kernel SceneView ignores — its topology is static)."""
    return scene.packed_rows()


class SceneView:
    """Duck-typed Scene over a packed (N,16) ref OR array — same accessor
    methods trace()/trace_shadow() use, static topology carried alongside.
    in_kernel=True selects the Mosaic-compatible large-scene loop in
    ops/intersect._trace_scan (fori + dynamic SMEM scalar reads)."""

    in_kernel = True

    def __init__(self, ref, obj_type, light_index, emissive=None):
        self._r = ref
        self.obj_type = obj_type
        self.light_index = light_index
        # static build-time emissive tuple (None = unknown): gates the
        # occlusion-only shadow trace exactly like Scene.emissive
        self.emissive = emissive

    @property
    def num_objects(self):
        return len(self.obj_type)

    @property
    def has_light(self):
        return self.light_index >= 0

    def is_sphere(self, i):
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
        return light_origin_from(
            self.center(i),
            Vec3(self._r[i, 3], self._r[i, 4], self._r[i, 5]),
            self.is_sphere(i),
        )

    def packed_rows(self):
        """For the large-scene trace loop (ops/intersect.py): the ref/array
        itself — indexed per scalar, never materialized."""
        return self._r


# ---------------------------------------------------------------------------
# Random draws
# ---------------------------------------------------------------------------


def _uniform(shape):
    """U[0,1) from the hardware PRNG (24-bit mantissa path). prng_random_bits
    yields SIGNED int32 — bitcast before shifting or >> sign-extends."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return top24.astype(jnp.float32) * (1.0 / (1 << 24))


def _rand_dir_from_uniforms(ux, uy, uz, cube_biased: bool) -> Vec3:
    if cube_biased:
        # normalize(U[-1,1]^3) — src/vector.c:99-111
        return Vec3(ux * 2.0 - 1.0, uy * 2.0 - 1.0, uz * 2.0 - 1.0).normalize()
    z = ux * 2.0 - 1.0
    phi = uy * (2.0 * math.pi)
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return Vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


class StreamingDraws:
    """Draws generated on demand in a FIXED call order (forward kernel).
    The order contract per bounce b: shadow(b) [ns x 3 uniforms, only when
    the scene has a light — tile_physics never calls it otherwise], dir(b)
    [3 uniforms], branch(b) [1 uniform]."""

    def __init__(self, shape, config: RenderConfig, has_light: bool):
        # has_light is accepted for signature symmetry with
        # PrecomputedDraws but deliberately NOT stored: the shadow-draw
        # skip lives in tile_physics (gated on tracer.has_light), which
        # simply never calls shadow() for light-less scenes.
        del has_light
        self.shape = shape
        self.config = config

    def _dir(self, shape):
        return _rand_dir_from_uniforms(
            _uniform(shape), _uniform(shape), _uniform(shape),
            self.config.cube_biased_sampling,
        )

    def shadow(self, b) -> Vec3:
        return self._dir((self.config.shadow_samples, *self.shape))

    def direction(self, b) -> Vec3:
        return self._dir(self.shape)

    def branch(self, b):
        return _uniform(self.shape)


class PrecomputedDraws:
    """All draws generated up front in the SAME order StreamingDraws emits
    them (including skipping shadow draws for light-less scenes), so both
    providers see bit-identical streams from the same seed. Consumed by
    index — a pure function of its arrays, hence differentiable around."""

    def __init__(self, shape, config: RenderConfig, has_light: bool):
        cfg = config
        cube = cfg.cube_biased_sampling
        self._shadow = []
        self._dir = []
        self._branch = []
        for _ in range(cfg.bounces):
            if has_light:  # consumed only when the scene has a light
                self._shadow.append(
                    _rand_dir_from_uniforms(
                        _uniform((cfg.shadow_samples, *shape)),
                        _uniform((cfg.shadow_samples, *shape)),
                        _uniform((cfg.shadow_samples, *shape)),
                        cube,
                    )
                )
            self._dir.append(
                _rand_dir_from_uniforms(
                    _uniform(shape), _uniform(shape), _uniform(shape), cube
                )
            )
            self._branch.append(_uniform(shape))

    def shadow(self, b) -> Vec3:
        return self._shadow[b]

    def direction(self, b) -> Vec3:
        return self._dir[b]

    def branch(self, b):
        return self._branch[b]


# ---------------------------------------------------------------------------
# Tile physics — the reference estimator, pure jnp
# ---------------------------------------------------------------------------


def camera_rays_from_pack(cam, u, v, shape):
    """cam: length-16 indexable (ref or array) -> (ro, rd) for screen (u,v)."""
    ub = Vec3(cam[3], cam[4], cam[5])
    vb = Vec3(cam[6], cam[7], cam[8])
    w = Vec3(cam[9], cam[10], cam[11])
    cu = (u - 0.5) * cam[12]
    cv = (v - 0.5) * cam[13]
    rd = Vec3(
        cu * ub.x + cv * vb.x - w.x,
        cu * ub.y + cv * vb.y - w.y,
        cu * ub.z + cv * vb.z - w.z,
    )
    ro = Vec3(
        jnp.full(shape, cam[0]), jnp.full(shape, cam[1]), jnp.full(shape, cam[2])
    )
    return ro, rd


class DirectTracer:
    """Default tracer: closest-hit against the live scene (SceneView or
    Scene). tile_physics goes through a tracer so the path-replay backward
    can substitute recorded winners (RecordingTracer / ReplayTracer)."""

    def __init__(self, scene):
        self.scene = scene
        self.has_light = scene.has_light

    def trace(self, ro, rd):
        return trace(self.scene, ro, rd)

    def trace_shadow(self, ro, rd):
        return trace_shadow(self.scene, ro, rd)

    def light_origin(self):
        return self.scene.origin_of(self.scene.light_index)


class RecordingTracer(DirectTracer):
    """Pass 1 of path replay: trace against the scene (non-differentiable
    fori loop in-kernel) while recording each call's winner planes in call
    order."""

    def __init__(self, scene):
        super().__init__(scene)
        self.records = []

    def trace(self, ro, rd):
        h, rec = trace_record(self.scene, ro, rd)
        self.records.append(rec)
        return h

    def trace_shadow(self, ro, rd):
        out, rec = trace_shadow_record(self.scene, ro, rd)
        self.records.append(rec)
        return out


class IndexRecordingTracer(DirectTracer):
    """Forward-pass winner-INDEX recorder (fetch backward): appends each
    trace call's winner-index plane, in call order, to `objs`. Unlike
    RecordingTracer nothing else is stored — the backward re-fetches the
    winner parameters differentiably from the scene table
    (trace_replay_fetch), so one int32 plane per trace call is the entire
    residual."""

    def __init__(self, scene):
        super().__init__(scene)
        self.objs = []

    def trace(self, ro, rd):
        h = trace(self.scene, ro, rd)
        self.objs.append(h.obj)
        return h

    def trace_shadow(self, ro, rd):
        out, rec = trace_shadow_record(self.scene, ro, rd)
        self.objs.append(rec.obj)
        return out


class FetchReplayTracer:
    """Pass 2 of the fetch backward: loop-free differentiable tracer that
    pops recorded winner-index planes in tile_physics's call order and
    reconstructs each Hit by one-hot-fetching the winner's row from the
    DIFFERENTIABLE scene table (ops/intersect.fetch_winner_cols). The vjp
    of the fetch matmul routes per-pixel cotangents to (N,16) row
    gradients automatically — no manual routing pass."""

    def __init__(self, objs, rows, obj_type, light_index, emissive=None):
        self._objs = list(objs)
        self._i = 0
        self._rows = rows
        self._obj_type = obj_type
        self._light_index = light_index
        self.has_light = light_index >= 0
        self.emissive = emissive
        # single-light occlusion recordings hold only {emissive-index, -1}
        # (trace_shadow_record keys on the SAME helper): collapse the
        # shadow fetch to that row — not light_index, which a hand-built
        # emissive override may not match (see trace_shadow_replay_fetch)
        self._shadow_li = _single_emissive_index(self)

    def _next(self):
        o = self._objs[self._i]
        self._i += 1
        return o

    def trace(self, ro, rd):
        return trace_replay_fetch(self._rows, self._next(), ro, rd)

    def trace_shadow(self, ro, rd):
        del ro, rd  # occlusion is detached; emission comes from the fetch
        return trace_shadow_replay_fetch(
            self._rows, self._next(), light_index=self._shadow_li
        )

    def light_origin(self):
        li = self._light_index
        r = self._rows
        return light_origin_from(
            Vec3(r[li, 0], r[li, 1], r[li, 2]),
            Vec3(r[li, 3], r[li, 4], r[li, 5]),
            self._obj_type[li] == OBJ_SPHERE,
        )


class ReplayTracer:
    """Pass 2 of path replay: a loop-free differentiable stand-in. Pops
    the recorded winner planes in the SAME call order tile_physics makes
    its trace calls, recomputing each Hit from them (trace_replay). The
    light's geometry leaves come in explicitly so origin_of stays
    differentiable."""

    def __init__(self, records, has_light, light_geom=None,
                 light_is_sphere=False):
        self._records = list(records)
        self._i = 0
        self.has_light = has_light
        self._light_geom = light_geom  # (p0 Vec3, p1 Vec3) scalar leaves
        self._light_is_sphere = light_is_sphere

    def _next(self):
        rec = self._records[self._i]
        self._i += 1
        return rec

    def trace(self, ro, rd):
        return trace_replay(self._next(), ro, rd)

    def trace_shadow(self, ro, rd):
        del ro, rd  # occlusion is detached; emission is the recorded leaf
        return trace_shadow_replay(self._next())

    def light_origin(self):
        p0, p1 = self._light_geom
        return light_origin_from(p0, p1, self._light_is_sphere)


def tile_physics(scene: SceneView, cam, u, v, draws, config: RenderConfig,
                 shape, tracer=None):
    """Full per-tile estimator (src/main.c:131-272). Returns 10 planes:
    (r, g, b, sky_x, sky_y, sky_z, skc_r, skc_g, skc_b, miss_f32)."""
    if tracer is None:
        tracer = DirectTracer(scene)
    ro, rd = camera_rays_from_pack(cam, u, v, shape)

    contrib = Vec3.full(shape, 1.0)
    result = Vec3.zeros(shape)
    # NOTE: comparisons, not bool constants — Mosaic has no i8->i1 trunc.
    alive = u >= -1e30
    sky_dir = Vec3.full(shape, 1.0)
    sky_contrib = Vec3.zeros(shape)
    died_miss = u < -1e30

    has_light = tracer.has_light
    if has_light:
        light_origin = tracer.light_origin()

    for b in range(config.bounces):
        d = rd.normalize()
        h = tracer.trace(ro, rd)

        # miss: remember direction + throughput for the deferred sky gather
        miss_now = alive & ~h.hit
        sky_dir = Vec3.where(miss_now, d, sky_dir)
        sky_contrib = Vec3.where(miss_now, contrib, sky_contrib)
        died_miss = died_miss | miss_now
        active = alive & h.hit

        # next-event light sampling (src/main.c:180-210)
        if has_light:
            rand_dirs = draws.shadow(b)  # Vec3 of (ns, *shape)
            accept = rand_dirs.dot(h.normal) > 0
            to_light = light_origin - h.point
            sample_dir = (rand_dirs * config.shadow_spread + to_light).normalize()
            sample_ro = h.point + sample_dir * config.hit_offset
            hit2, emit2 = tracer.trace_shadow(sample_ro, sample_dir)
            take = accept & hit2
            shadow_sum = Vec3(
                jnp.sum(jnp.where(take, emit2.x, 0.0), axis=0),
                jnp.sum(jnp.where(take, emit2.y, 0.0), axis=0),
                jnp.sum(jnp.where(take, emit2.z, 0.0), axis=0),
            )
            num = jnp.sum(accept.astype(jnp.float32), axis=0)
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

        rand_dir = draws.direction(b)
        rand_dir = Vec3.where(rand_dir.dot(h.normal) < 0, -rand_dir, rand_dir)

        result = result + Vec3.where(active, h.emission * contrib, Vec3.zeros(shape))

        u_branch = draws.branch(b)
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

    return (
        result.x, result.y, result.z,
        sky_dir.x, sky_dir.y, sky_dir.z,
        sky_contrib.x, sky_contrib.y, sky_contrib.z,
        died_miss.astype(jnp.float32),
    )


def _tile_uv(i, j, tile_h, tile_w, width, norm_height, row0):
    """row0 (traced int32) offsets this kernel invocation's rows into a
    taller norm_height-row global image — the sharded path renders a row
    slice per device (parallel/render.py) but u/v must be normalized over
    the full frame."""
    shape = (tile_h, tile_w)
    xs = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
        + j.astype(jnp.float32) * tile_w
    )
    ys = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
        + i.astype(jnp.float32) * tile_h
        + row0.astype(jnp.float32)
    )
    # pixel -> screen coords with the reference flips (src/main.c:293-296);
    # max(dim-1, 1) guards 1-pixel-wide renders (film.py lowres pyramid)
    u = 1.0 - xs / max(width - 1, 1)
    v = 1.0 - ys / max(norm_height - 1, 1)
    return u, v


def _seed_tile(seed_scalar):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # Knuth multiplicative hash (0x9E3779B1 as signed i32) decorrelates tiles.
    tile_id = i * pl.num_programs(1) + j
    pltpu.prng_seed(seed_scalar + tile_id * jnp.int32(-1640531535))


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    scene_ref,  # SMEM (N, 16)
    cam_ref,    # SMEM (16,)
    scalars_ref,  # SMEM (2,) int32: [seed, row0]
    *out_refs,  # 10 x VMEM (tile_h, tile_w) [+ winner-index refs if record]
    obj_type,
    light_index,
    emissive,
    config,
    width,
    norm_height,
    tile_h,
    tile_w,
    record=False,
):
    _seed_tile(scalars_ref[0])
    scene = SceneView(scene_ref, obj_type, light_index, emissive)
    i, j = pl.program_id(0), pl.program_id(1)
    u, v = _tile_uv(i, j, tile_h, tile_w, width, norm_height, scalars_ref[1])
    if config.pixel_jitter:
        # stream contract: jitter uniforms are the FIRST two draws.
        # v jitter spans one GLOBAL pixel row (norm_height) — the slice
        # height would over-jitter sharded renders by n_tiles rows
        u = u + (_uniform((tile_h, tile_w)) - 0.5) / max(width - 1, 1)
        v = v + (_uniform((tile_h, tile_w)) - 0.5) / max(norm_height - 1, 1)
    draws = StreamingDraws((tile_h, tile_w), config, light_index >= 0)
    if record:
        # fetch-mode custom-VJP forward: identical physics and streams,
        # plus one int32 winner-index plane per trace call persisted to
        # HBM so the backward skips its recording pass entirely
        tracer = IndexRecordingTracer(scene)
        outs = tile_physics(scene, cam_ref, u, v, draws, config,
                            (tile_h, tile_w), tracer=tracer)
        outs = tuple(outs) + tuple(tracer.objs)
    else:
        outs = tile_physics(scene, cam_ref, u, v, draws, config, (tile_h, tile_w))
    for ref, val in zip(out_refs, outs):
        ref[...] = val


# ---------------------------------------------------------------------------
# Backward kernel — vjp of tile_physics inside the kernel, grads accumulated
# across the (sequential) grid
# ---------------------------------------------------------------------------


def _bwd_kernel(
    scene_ref,   # VMEM (N, 16) — differentiable input, read as a value
    cam_ref,     # VMEM (1, 16) — differentiable input
    scalars_ref,  # SMEM (2,) int32: [seed, row0]
    *rest,       # 10 cotangent refs, then grad_scene_ref, grad_cam_ref
    obj_type,
    light_index,
    emissive,
    config,
    width,
    norm_height,
    tile_h,
    tile_w,
):
    g_refs = rest[:10]
    grad_scene_ref, grad_cam_ref = rest[10], rest[11]

    _seed_tile(scalars_ref[0])
    i, j = pl.program_id(0), pl.program_id(1)
    u, v = _tile_uv(i, j, tile_h, tile_w, width, norm_height, scalars_ref[1])
    if config.pixel_jitter:
        # same stream position AND same amplitudes as the forward's jitter
        u = u + (_uniform((tile_h, tile_w)) - 0.5) / max(width - 1, 1)
        v = v + (_uniform((tile_h, tile_w)) - 0.5) / max(norm_height - 1, 1)

    # Regenerate the forward's exact random stream for this tile, BEFORE
    # tracing the differentiable closure (the PRNG is stateful).
    draws = PrecomputedDraws((tile_h, tile_w), config, light_index >= 0)

    scene_arr = scene_ref[...]           # (N, 16) value
    cam_arr = cam_ref[...]               # (1, 16) value

    def f(scene_arr, cam_arr):
        view = SceneView(scene_arr, obj_type, light_index, emissive)
        cam = cam_arr[0]
        return tile_physics(view, cam, u, v, draws, config, (tile_h, tile_w))

    _, vjp = jax.vjp(f, scene_arr, cam_arr)
    cotangents = tuple(ref[...] for ref in g_refs)
    g_scene, g_cam = vjp(cotangents)

    first = (i == 0) & (j == 0)

    @pl.when(first)
    def _():
        grad_scene_ref[...] = g_scene
        grad_cam_ref[...] = g_cam

    @pl.when(~first)
    def _():
        grad_scene_ref[...] += g_scene
        grad_cam_ref[...] += g_cam


# Fused shadow-routing one-hot budget: (N, ns*tile_px) f32 must stay small
# enough not to raise the replay backward's scoped-VMEM peak (~16MB total,
# already tight at 201 objects — CLAUDE.md). 2MB fuses every reference
# scene (scene_0: 9*3*2048*4 = 221KB) while 201-object scenes keep the
# per-sample loop (4.9MB would not fit next to the replay residuals).
_SHADOW_FUSE_BYTES = 2 * 1024 * 1024


# One-hot rows per routing dot for large N: a (n, tile_px) one-hot is
# n*tile_px*4 bytes on the Mosaic stack PER RECORD, and the unrolled
# record list peaked at 46MB scoped VMEM at N=1024 (16MB physical) —
# hardware compile error, benchmarks/large_scene.py round 5. 256 rows
# cap each one-hot at 1MB (P=1024) while N<=256 scenes keep the exact
# round-4-measured single-dot path.
_ROUTE_CHUNK = 256


def _route_record_grads(n: int, records, g_records):
    """Path-replay gradient routing: per-object (N, 16) row gradients from
    per-pixel winner-plane cotangents.

        G[i, c] = sum over {records r, pixels p : r.obj[p] == i} g_r[c][p]

    Expressed as one-hot matmuls so it runs on the MXU inside the Pallas
    backward kernel (a per-object fori of masked reductions would be ~50x
    more VPU work at N=201; dynamic row stores exist but the matmul is the
    TPU-idiomatic segment-sum). precision=HIGHEST — the default bf16
    passes round gradient sums at ~1e-3 relative. obj == -1 (miss) matches
    no one-hot row and so contributes nothing, exactly like the
    where-select trace whose non-winners get zero gradient.

    N > _ROUTE_CHUNK scenes route in object chunks (one dot per chunk per
    record, same total MACs, bounded live one-hot VMEM) — see
    _route_record_grads_chunked."""
    if n > _ROUTE_CHUNK:
        return _route_record_grads_chunked(n, records, g_records)
    G = jnp.zeros((n, SCENE_COLS), jnp.float32)

    def add(G, obj2d, cols):
        p = obj2d.size
        o = obj2d.reshape(1, p)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (n, p), 0) == o
        ).astype(jnp.float32)
        zeros = jnp.zeros(obj2d.shape, jnp.float32)
        gmat = jnp.concatenate(
            [(c if c is not None else zeros).reshape(1, p) for c in cols],
            axis=0,
        )  # (16, P)
        return G + jax.lax.dot_general(
            onehot, gmat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    for rec, g in zip(records, g_records):
        if isinstance(rec, TraceRecord):
            cols = [
                g.p0.x, g.p0.y, g.p0.z, g.p1.x, g.p1.y, g.p1.z,
                g.albedo.x, g.albedo.y, g.albedo.z,
                g.roughness, g.reflectance, g.metallic,
                g.emission.x, g.emission.y, g.emission.z, None,
            ]
            G = add(G, rec.obj, cols)
        else:  # ShadowRecord: (ns, th, tw) batch; only emission carries grad
            ns = rec.obj.shape[0]
            # The ns per-sample dots share 13 identically-zero gmat rows;
            # concatenating the samples along the LANE axis (Mosaic-safe,
            # unlike a rank-3 flatten) fuses them into ONE dot with the
            # same MACs, dropping (ns-1) fixed per-dot costs. Gated on the
            # fused one-hot's size so large-N replay keeps its measured
            # VMEM peak (the 201-object scene is already tight).
            if n * ns * rec.obj[0].size * 4 <= _SHADOW_FUSE_BYTES:
                def cat(a):
                    return jnp.concatenate([a[k] for k in range(ns)], axis=1)

                cols = [None] * 12 + [
                    cat(g.emission.x), cat(g.emission.y), cat(g.emission.z),
                    None,
                ]
                G = add(G, cat(rec.obj), cols)
            else:
                for k in range(ns):
                    cols = [None] * 12 + [
                        g.emission.x[k], g.emission.y[k], g.emission.z[k],
                        None,
                    ]
                    G = add(G, rec.obj[k], cols)
    return G


def _route_record_grads_chunked(n: int, records, g_records):
    """Large-N routing: same segment-sum as _route_record_grads, but each
    record's one-hot covers only _ROUTE_CHUNK object rows per dot, so the
    live one-hot is (<=256, P) f32 (~1MB at P=1024) instead of (N, P)
    (4MB at N=1024 — 10 trace + 30 shadow records of those overflowed the
    16MB scoped-VMEM stack on hardware). Total MACs are unchanged; only
    the fixed per-dot cost multiplies by ceil(N/256). Shadow records take
    the per-sample (unfused) form — the lane-concat fusion's one-hot is
    ns x wider and defeats the point here."""
    pairs = []  # (obj plane, 16 cotangent planes or None)
    for rec, g in zip(records, g_records):
        if isinstance(rec, TraceRecord):
            pairs.append((rec.obj, [
                g.p0.x, g.p0.y, g.p0.z, g.p1.x, g.p1.y, g.p1.z,
                g.albedo.x, g.albedo.y, g.albedo.z,
                g.roughness, g.reflectance, g.metallic,
                g.emission.x, g.emission.y, g.emission.z, None,
            ]))
        else:
            for k in range(rec.obj.shape[0]):
                pairs.append((rec.obj[k], [None] * 12 + [
                    g.emission.x[k], g.emission.y[k], g.emission.z[k], None,
                ]))

    chunks = []
    for base in range(0, n, _ROUTE_CHUNK):
        m = min(_ROUTE_CHUNK, n - base)
        Gc = jnp.zeros((m, SCENE_COLS), jnp.float32)
        for obj2d, cols in pairs:
            p = obj2d.size
            o = obj2d.reshape(1, p)
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (m, p), 0) + base == o
            ).astype(jnp.float32)
            zeros = jnp.zeros(obj2d.shape, jnp.float32)
            gmat = jnp.concatenate(
                [(c if c is not None else zeros).reshape(1, p) for c in cols],
                axis=0,
            )  # (16, P)
            Gc = Gc + jax.lax.dot_general(
                onehot, gmat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        chunks.append(Gc)
    return jnp.concatenate(chunks, axis=0)


def _bwd_kernel_replay(
    scene_ref,   # SMEM (N, 16) — NOT differentiated directly (path replay)
    cam_ref,     # VMEM (1, 16) — differentiable input
    scalars_ref,  # SMEM (2,) int32: [seed, row0]
    *rest,       # 10 cotangent refs, then grad_scene_ref, grad_cam_ref
    obj_type,
    light_index,
    emissive,
    config,
    width,
    norm_height,
    tile_h,
    tile_w,
):
    """Large-scene backward: PATH REPLAY. The fori-loop trace cannot be
    reverse-differentiated (Mosaic has no reverse while_loop), so:

      pass 1: run tile_physics with the fori trace, RECORDING each trace
              call's winner planes (non-differentiable);
      pass 2: jax.vjp over tile_physics with a ReplayTracer — a loop-free
              function of the records + camera + light geometry whose
              gradients match autodiff of the running-min trace (verified
              against the XLA scan path, tests/test_megakernel.py);
      route:  one-hot matmuls turn per-pixel winner cotangents into (N,16)
              row gradients, accumulated across the sequential grid.
    """
    g_refs = rest[:10]
    grad_scene_ref, grad_cam_ref = rest[10], rest[11]

    _seed_tile(scalars_ref[0])
    i, j = pl.program_id(0), pl.program_id(1)
    u, v = _tile_uv(i, j, tile_h, tile_w, width, norm_height, scalars_ref[1])
    if config.pixel_jitter:
        # same stream position AND same amplitudes as the forward's jitter
        u = u + (_uniform((tile_h, tile_w)) - 0.5) / max(width - 1, 1)
        v = v + (_uniform((tile_h, tile_w)) - 0.5) / max(norm_height - 1, 1)

    draws = PrecomputedDraws((tile_h, tile_w), config, light_index >= 0)
    view = SceneView(scene_ref, obj_type, light_index, emissive)
    cam_arr = cam_ref[...]  # (1, 16) value

    # pass 1: record winners along the exact forward paths
    recorder = RecordingTracer(view)
    tile_physics(view, cam_arr[0], u, v, draws, config, (tile_h, tile_w),
                 tracer=recorder)
    records = recorder.records

    has_light = light_index >= 0
    if has_light:
        li = light_index
        light_geom = (
            Vec3(scene_ref[li, 0], scene_ref[li, 1], scene_ref[li, 2]),
            Vec3(scene_ref[li, 3], scene_ref[li, 4], scene_ref[li, 5]),
        )
        light_is_sphere = obj_type[li] == OBJ_SPHERE
    else:
        light_geom = None
        light_is_sphere = False

    def f(records, cam_arr, light_geom):
        tracer = ReplayTracer(records, has_light, light_geom, light_is_sphere)
        return tile_physics(None, cam_arr[0], u, v, draws, config,
                            (tile_h, tile_w), tracer=tracer)

    _, vjpf = jax.vjp(f, records, cam_arr, light_geom)
    cotangents = tuple(ref[...] for ref in g_refs)
    g_records, g_cam, g_light = vjpf(cotangents)

    n = len(obj_type)
    G = _route_record_grads(n, records, g_records)

    first = (i == 0) & (j == 0)

    @pl.when(first)
    def _():
        grad_scene_ref[...] = G
        grad_cam_ref[...] = g_cam

    @pl.when(~first)
    def _():
        grad_scene_ref[...] += G
        grad_cam_ref[...] += g_cam

    if has_light:
        # origin_of(light) gradients land on the light's own row (static
        # index => static ref slice store)
        gp0, gp1 = g_light
        row = jnp.concatenate(
            [
                gp0.x.reshape(1, 1), gp0.y.reshape(1, 1), gp0.z.reshape(1, 1),
                gp1.x.reshape(1, 1), gp1.y.reshape(1, 1), gp1.z.reshape(1, 1),
            ]
            + [jnp.zeros((1, 1), jnp.float32)] * 10,
            axis=1,
        )
        grad_scene_ref[li:li + 1, :] += row


def _bwd_kernel_fetch(
    scene_ref,   # VMEM (N, 16) — differentiable input (fetch matmul operand)
    cam_ref,     # VMEM (1, 16) — differentiable input
    scalars_ref,  # SMEM (2,) int32: [seed, row0]
    *rest,       # 10 cotangent refs, n_rec winner-index refs,
                 # then grad_scene_ref, grad_cam_ref
    obj_type,
    light_index,
    emissive,
    config,
    width,
    norm_height,
    tile_h,
    tile_w,
    n_rec,
):
    """Fetch backward: the forward kernel already persisted each trace
    call's winner-index plane to HBM (core_fwd residuals), so this kernel
    skips the recording pass of _bwd_kernel_replay and goes straight to
    the differentiable replay: jax.vjp over tile_physics with a
    FetchReplayTracer, whose one-hot MXU fetch of the scene table both
    reconstructs winner parameters and (in reverse) routes their
    cotangents to (N, 16) row gradients — light-origin gradients ride the
    same table through tracer.light_origin's static row reads."""
    g_refs = rest[:10]
    rec_refs = rest[10:10 + n_rec]
    grad_scene_ref, grad_cam_ref = rest[10 + n_rec], rest[11 + n_rec]

    _seed_tile(scalars_ref[0])
    i, j = pl.program_id(0), pl.program_id(1)
    u, v = _tile_uv(i, j, tile_h, tile_w, width, norm_height, scalars_ref[1])
    if config.pixel_jitter:
        # same stream position AND same amplitudes as the forward's jitter
        u = u + (_uniform((tile_h, tile_w)) - 0.5) / max(width - 1, 1)
        v = v + (_uniform((tile_h, tile_w)) - 0.5) / max(norm_height - 1, 1)

    # Regenerate the forward's exact random stream for this tile (the
    # draws feed the replayed physics; winner records make the traces
    # replayable but branches/directions still come from the stream).
    draws = PrecomputedDraws((tile_h, tile_w), config, light_index >= 0)

    objs = [ref[...] for ref in rec_refs]
    scene_arr = scene_ref[...]   # (N, 16) value
    cam_arr = cam_ref[...]       # (1, 16) value

    def f(scene_arr, cam_arr):
        tracer = FetchReplayTracer(objs, scene_arr, obj_type, light_index,
                                   emissive=emissive)
        return tile_physics(None, cam_arr[0], u, v, draws, config,
                            (tile_h, tile_w), tracer=tracer)

    _, vjp = jax.vjp(f, scene_arr, cam_arr)
    cotangents = tuple(ref[...] for ref in g_refs)
    g_scene, g_cam = vjp(cotangents)

    first = (i == 0) & (j == 0)

    @pl.when(first)
    def _():
        grad_scene_ref[...] = g_scene
        grad_cam_ref[...] = g_cam

    @pl.when(~first)
    def _():
        grad_scene_ref[...] += g_scene
        grad_cam_ref[...] += g_cam


# ---------------------------------------------------------------------------
# custom_vjp core
# ---------------------------------------------------------------------------


def _plane_shape(width, height, tile_h, tile_w):
    wp = pl.cdiv(width, tile_w) * tile_w
    hp = pl.cdiv(height, tile_h) * tile_h
    return hp, wp


# HBM budget for the fetch backward's scan-stacked winner-index residuals
# (module-level so tests can shrink it to pin the fallback boundary).
FETCH_RECORD_BUDGET_BYTES = 4e9

# Largest scene the fetch backward compiles for: its vjp's per-record
# (N, tile_px) one-hot stack fits Mosaic's 16MB scoped VMEM at N=201/
# 8x128 tiles (measured working, round 5) but hit 46MB at N=1024; 256
# aligns with _ROUTE_CHUNK and is hardware-verified (see effective_bwd_mode).
_FETCH_MAX_OBJECTS = 256


def effective_bwd_mode(
    scene: Scene,
    config: RenderConfig,
    width: int,
    height: int,
    spp: int,
    tile_h: int | None = None,
    tile_w: int | None = None,
) -> str:
    """The backward mode render_image_pallas will actually EXECUTE.

    bwd_mode="fetch" persists one int32 winner-index plane per trace call
    per sample; under grad, the sample scan stacks them all in HBM. Past
    FETCH_RECORD_BUDGET_BYTES the renderer falls back to the in-kernel-
    recording replay backward (same gradients). Exposed so benchmarks can
    LOG the executed mode (a silent flip would silently change the number
    being reported) and tests can pin the boundary."""
    if config.bwd_mode != "fetch":
        return config.bwd_mode
    if scene.num_objects > _FETCH_MAX_OBJECTS:
        # Very large scenes: the fetch vjp materializes (N, tile_px)
        # one-hots whose unrolled stack hit 46MB scoped VMEM (16MB
        # physical) at N=1024 on hardware (benchmarks/large_scene.py,
        # round 5). The recording replay stores winner PLANES instead:
        # its backward VMEM is topology-free and its routing is chunked
        # (_route_record_grads_chunked). Below the boundary fetch stays
        # the default — at N=201 it is 2.0x FASTER than replay (665 vs
        # 1322 ms/sample fwd+bwd, 1080p full physics, 8x128 tiles,
        # measured round 5).
        return "replay"
    if tile_h is None or tile_w is None:
        dth, dtw = default_tiles(scene, config)
        tile_h = tile_h or dth
        tile_w = tile_w or dtw
    ns = config.shadow_samples if scene.has_light else 0
    n_rec_planes = config.bounces * (1 + ns)
    hp, wp = _plane_shape(width, height, tile_h, tile_w)
    if spp * n_rec_planes * hp * wp * 4 > FETCH_RECORD_BUDGET_BYTES:
        return "replay"
    return "fetch"



def _scene_spec(n: int):
    """Scene table placement: SMEM in every case — the unrolled loop reads
    static scalars, the large-scene fori loop reads dynamically-indexed
    scalars; both are SMEM-native access patterns."""
    del n
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _record_layout(config, has_light, tile_h, tile_w, hp, wp):
    """(out_shapes, out_specs) of the winner-index record planes, in
    tile_physics's call order: per bounce one (HP, WP) primary plane, then
    (when the scene has a light) one (ns, HP, WP) shadow volume."""
    ns = config.shadow_samples
    prim = jax.ShapeDtypeStruct((hp, wp), jnp.int32)
    prim_spec = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    shad = jax.ShapeDtypeStruct((ns, hp, wp), jnp.int32)
    shad_spec = pl.BlockSpec((ns, tile_h, tile_w), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM)
    shapes, specs = [], []
    for _ in range(config.bounces):
        shapes.append(prim)
        specs.append(prim_spec)
        if has_light:
            shapes.append(shad)
            specs.append(shad_spec)
    return shapes, specs


def _run_fwd(scene_packed, cam_pack, scalars_i32, *, meta, interpret=False,
             record=False):
    (obj_type, light_index, config, width, height, norm_height, tile_h,
     tile_w, emissive) = meta
    hp, wp = _plane_shape(width, height, tile_h, tile_w)
    grid = (hp // tile_h, wp // tile_w)
    plane = jax.ShapeDtypeStruct((hp, wp), jnp.float32)
    kernel = functools.partial(
        _fwd_kernel,
        obj_type=obj_type, light_index=light_index, emissive=emissive,
        config=config, width=width, norm_height=norm_height,
        tile_h=tile_h, tile_w=tile_w, record=record,
    )
    block = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    out_shape = [plane] * 10
    out_specs = [block] * 10
    if record:
        rec_shapes, rec_specs = _record_layout(
            config, light_index >= 0, tile_h, tile_w, hp, wp
        )
        out_shape += rec_shapes
        out_specs += rec_specs
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _scene_spec(len(obj_type)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(scene_packed, cam_pack, scalars_i32)


def _run_bwd(scene_packed, cam_pack, scalars_i32, cotangents, *, meta,
             records=()):
    (obj_type, light_index, config, width, height, norm_height, tile_h,
     tile_w, emissive) = meta
    n = len(obj_type)
    hp, wp = _plane_shape(width, height, tile_h, tile_w)
    # SAME tiling as the forward — the per-tile seeds and in-tile draw
    # order define the streams the backward re-materializes.
    grid = (hp // tile_h, wp // tile_w)

    block = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    whole = lambda shape: pl.BlockSpec(shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)

    if config.bwd_mode == "fetch":
        # fetch backward: winner-index records persisted by the forward
        # arrive as tiled inputs; scene rides in VMEM (matmul operand)
        _, rec_specs = _record_layout(
            config, light_index >= 0, tile_h, tile_w, hp, wp
        )
        assert len(records) == len(rec_specs), (len(records), len(rec_specs))
        kernel = functools.partial(
            _bwd_kernel_fetch,
            obj_type=obj_type, light_index=light_index, emissive=emissive,
            config=config, width=width, norm_height=norm_height, tile_h=tile_h, tile_w=tile_w,
            n_rec=len(records),
        )
        g_scene, g_cam = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                whole((n, SCENE_COLS)),
                whole((1, SCENE_COLS)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ]
            + [block] * 10
            + rec_specs,
            out_specs=[whole((n, SCENE_COLS)), whole((1, SCENE_COLS))],
            out_shape=[
                jax.ShapeDtypeStruct((n, SCENE_COLS), jnp.float32),
                jax.ShapeDtypeStruct((1, SCENE_COLS), jnp.float32),
            ],
        )(scene_packed, cam_pack.reshape(1, SCENE_COLS), scalars_i32,
          *cotangents, *records)
        return g_scene, g_cam.reshape(SCENE_COLS)

    if n > UNROLL_LIMIT or config.bwd_mode != "direct":
        # path-replay backward: scene stays in SMEM (the recording pass
        # reads it scalar-by-scalar like the fwd; small scenes unroll)
        kernel = functools.partial(
            _bwd_kernel_replay,
            obj_type=obj_type, light_index=light_index, emissive=emissive,
            config=config, width=width, norm_height=norm_height, tile_h=tile_h, tile_w=tile_w,
        )
        scene_spec = _scene_spec(n)
    else:
        kernel = functools.partial(
            _bwd_kernel,
            obj_type=obj_type, light_index=light_index, emissive=emissive,
            config=config, width=width, norm_height=norm_height, tile_h=tile_h, tile_w=tile_w,
        )
        scene_spec = whole((n, SCENE_COLS))  # VMEM value for jax.vjp

    g_scene, g_cam = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            scene_spec,
            whole((1, SCENE_COLS)),                    # cam pack (VMEM value)
            pl.BlockSpec(memory_space=pltpu.SMEM),     # seed
        ]
        + [block] * 10,
        out_specs=[whole((n, SCENE_COLS)), whole((1, SCENE_COLS))],
        out_shape=[
            jax.ShapeDtypeStruct((n, SCENE_COLS), jnp.float32),
            jax.ShapeDtypeStruct((1, SCENE_COLS), jnp.float32),
        ],
    )(scene_packed, cam_pack.reshape(1, SCENE_COLS), scalars_i32, *cotangents)
    return g_scene, g_cam.reshape(SCENE_COLS)


@functools.lru_cache(maxsize=64)
def _make_core(meta):
    """custom_vjp core for one (topology, config, geometry) signature."""
    config = meta[2]
    fetch = config.bwd_mode == "fetch"

    # The [seed, row0] scalars ride through the differentiable signature as
    # the BITCAST of their int32 values (a float32 cast would quantize seeds
    # >= 2^24 and collapse distinct per-sample streams).
    @jax.custom_vjp
    def core(scene_packed, cam_pack, scalar_bits):
        scalars = jax.lax.bitcast_convert_type(scalar_bits, jnp.int32)
        return tuple(_run_fwd(scene_packed, cam_pack, scalars, meta=meta))

    def core_fwd(scene_packed, cam_pack, scalar_bits):
        scalars = jax.lax.bitcast_convert_type(scalar_bits, jnp.int32)
        if fetch:
            # record-emitting forward: identical 10 planes + the winner-
            # index planes the backward replays from (HBM residuals)
            outs = _run_fwd(
                scene_packed, cam_pack, scalars, meta=meta, record=True
            )
            return tuple(outs[:10]), (
                scene_packed, cam_pack, scalar_bits, tuple(outs[10:])
            )
        out = core(scene_packed, cam_pack, scalar_bits)
        return out, (scene_packed, cam_pack, scalar_bits, ())

    def core_bwd(res, cotangents):
        scene_packed, cam_pack, scalar_bits, records = res
        scalars = jax.lax.bitcast_convert_type(scalar_bits, jnp.int32)
        g_scene, g_cam = _run_bwd(
            scene_packed, cam_pack, scalars, tuple(cotangents), meta=meta,
            records=records,
        )
        return g_scene, g_cam, jnp.zeros_like(scalar_bits)

    core.defvjp(core_fwd, core_bwd)
    return core


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


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
    tile_h: int | None = None,
    tile_w: int | None = None,
    interpret: bool = False,
    row0=0,
    norm_height: int | None = None,
    aspect: float | None = None,
):
    """One sample per pixel over the padded (HP, WP) grid. Returns a dict of
    (HP, WP) planes. Differentiable w.r.t. scene and camera (custom VJP:
    Pallas forward + Pallas backward with re-seeded identical streams).

    row0/norm_height render a row SLICE of a norm_height-tall frame whose
    rows start at global row row0 (row0 may be traced — the sharded path
    passes the mesh tile index, parallel/render.py); aspect overrides the
    camera frustum's aspect ratio (the progressive pyramid renders low-res
    grids with the full-res aspect, src/main.c:281)."""
    if tile_h is None or tile_w is None:
        dth, dtw = default_tiles(scene, config)
        tile_h = tile_h or dth
        tile_w = tile_w or dtw
    if norm_height is None:
        norm_height = height
    if aspect is None:
        aspect = width / norm_height
    # shadow_samples=0 is NEE-off: the XLA integrator's empty-axis sums
    # yield sampled_light=0 there, and the kernel must agree — running the
    # no-light path also avoids zero-sized shadow draws/record planes,
    # which Mosaic cannot lower.
    light_index = scene.light_index if config.shadow_samples > 0 else -1
    meta = (
        scene.obj_type, light_index, config, width, height, norm_height,
        tile_h, tile_w, getattr(scene, "emissive", None),
    )
    cam_pack = _camera_pack(camera, aspect, config)
    scalars_i32 = jnp.stack(
        [
            jnp.asarray(seed, jnp.int32).reshape(()),
            jnp.asarray(row0, jnp.int32).reshape(()),
        ]
    )

    if interpret:  # test path: fwd only, through the TPU interpreter
        outs = _run_fwd(
            pack_scene(scene), cam_pack, scalars_i32, meta=meta, interpret=interpret
        )
    else:
        core = _make_core(meta)
        scalar_bits = jax.lax.bitcast_convert_type(scalars_i32, jnp.float32)
        outs = core(pack_scene(scene), cam_pack, scalar_bits)

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
    tile_h: int | None = None,
    tile_w: int | None = None,
    interpret: bool = False,
    row0=0,
    norm_height: int | None = None,
    aspect: float | None = None,
    sky_cache=None,
    return_sky_cache: bool = False,
):
    """Full render via the megakernel + deferred XLA sky gather. Drop-in for
    render_image (same statistics, different RNG streams) and differentiable
    end-to-end (fwd+bwd both Pallas). row0/norm_height/aspect as in
    render_tiles_pallas (row-slice rendering for the sharded path).

    sky_cache / return_sky_cache thread the sparse sky cache ACROSS calls
    (the interactive film loop renders many passes at a fixed camera, and
    re-seeding the cache costs a full-frame gather per call): pass
    return_sky_cache=True to get (img, cache) back, and feed that cache
    into the next same-shaped call so every sample (including sample 0)
    takes the sparse path. Exact for ANY cache state — reuse is keyed on
    nearest-texel index EQUALITY, so a stale cache (moved camera) only
    lowers the hit rate, never changes a texel — but the cache is only
    valid for the cubemap it was gathered from: drop it if the cubemap
    changes. Returns cache=None when the workload can't use one
    (constant/bilinear sky, unpacked cubemap); keep passing None."""
    if tile_h is None or tile_w is None:
        dth, dtw = default_tiles(scene, config)
        tile_h = tile_h or dth
        tile_w = tile_w or dtw
    if cubemap is None:
        cubemap = constant_sky()
    if norm_height is None:
        norm_height = height
    if aspect is None:
        aspect = width / norm_height
    if config.bwd_mode == "fetch":
        # Under grad, a scan over samples stacks each sample's winner-index
        # residuals; cap that at FETCH_RECORD_BUDGET_BYTES of HBM and fall
        # back to the in-kernel-recording replay backward beyond it (same
        # gradients). effective_bwd_mode is the single source of truth.
        mode = effective_bwd_mode(
            scene, config, width, height, spp, tile_h, tile_w
        )
        if mode != config.bwd_mode:
            config = config.replace(bwd_mode=mode)
    seed = jnp.asarray(seed, jnp.int32)

    def tiles(s):
        return render_tiles_pallas(
            scene, camera, width, height, s, config, tile_h, tile_w, interpret,
            row0=row0, norm_height=norm_height, aspect=aspect,
        )

    def compose(t, sky):
        rgb = Vec3(t["r"], t["g"], t["b"]) + sky * Vec3(t["cr"], t["cg"], t["cb"]) * t["miss"]
        rgb = rgb.clip(0.0, 1.0)
        if config.soft_silhouette_temp > 0:
            # same compositing as the XLA integrator (shared helper); runs
            # in XLA over the padded planes with fresh primary rays
            from ray_tracing_tpu.render.camera import ray_through_screen
            from ray_tracing_tpu.render.integrator import soft_silhouette_composite

            hp_, wp_ = rgb.shape
            xs = jnp.broadcast_to(jnp.arange(wp_, dtype=jnp.float32), (hp_, wp_))
            ys = jnp.broadcast_to(
                jnp.arange(hp_, dtype=jnp.float32)[:, None], (hp_, wp_)
            ) + jnp.asarray(row0, jnp.float32)
            u = 1.0 - xs / max(width - 1, 1)
            v = 1.0 - ys / max(norm_height - 1, 1)
            ro0, rd0 = ray_through_screen(camera, u, v, aspect, config)
            rgb = soft_silhouette_composite(scene, ro0, rd0, rgb, config, cubemap)
        return rgb

    def one(s):
        t = tiles(s)
        sky = sample_cubemap(
            cubemap,
            Vec3(t["sx"], t["sy"], t["sz"]),
            bilinear=config.env_filter == "bilinear",
        )
        return compose(t, sky)

    # Sparse sky gather (bit-identical to the full path): sample 0 gathers
    # every miss texel and becomes the cache — unless a caller-threaded
    # cache exists, in which case EVERY sample gathers only pixels whose
    # nearest-texel INDEX changed (ops/cubemap.py rationale).
    sparse_capable = (
        config.sky_sparse_gather
        and config.env_filter == "nearest"
        and cubemap.packed is not None
        and cubemap.h * cubemap.w > 1
    )
    use_sparse = sparse_capable and (spp > 1 or sky_cache is not None)
    out_cache = None

    if use_sparse:
        from ray_tracing_tpu.ops.cubemap import (
            sparse_sky_lookup,
            texel_flat_index,
            unpack_texels,
        )

        # spp==1 (only reachable with a threaded cache) keeps the exact
        # PRNG stream of the uncached one(seed) path — the cache must
        # never change which sample gets rendered, only how its sky
        # texels are fetched
        if spp == 1:
            seeds = jnp.asarray(seed, jnp.int32).reshape(1)
        else:
            seeds = seed * jnp.int32(7919) + jnp.arange(spp, dtype=jnp.int32)
        if sky_cache is None:
            t0 = tiles(seeds[0])
            flat0 = texel_flat_index(
                cubemap, Vec3(t0["sx"], t0["sy"], t0["sz"])
            )
            miss0 = t0["miss"] > 0.5
            rest = seeds[1:]
        else:
            flat0, packed0, miss0 = sky_cache
            rest = seeds
        # budget is in 128-pixel blocks (ops/cubemap.SPARSE_BLOCK)
        budget = max(
            int(flat0.size * config.sky_sparse_budget_frac) // 128, 256
        )
        if sky_cache is None:
            # seed through the same block compaction (cache-less: every
            # miss pixel is fresh): indoor scenes gather only their sky
            # blocks; sky-dominated frames take the full-gather cond arm
            packed0 = sparse_sky_lookup(cubemap, flat0, miss0, budget=budget)
            acc0 = compose(t0, unpack_texels(packed0))
        else:
            acc0 = Vec3.zeros(flat0.shape)
        out_cache = (flat0, packed0, miss0)

        def body(acc, s):
            t = tiles(s)
            flat = texel_flat_index(cubemap, Vec3(t["sx"], t["sy"], t["sz"]))
            miss = t["miss"] > 0.5
            packed = sparse_sky_lookup(
                cubemap, flat, miss, flat0, packed0, miss0, budget
            )
            return acc + compose(t, unpack_texels(packed)), None

        total, _ = jax.lax.scan(body, acc0, rest)
        out = total * (1.0 / spp)
    elif spp == 1:
        out = one(seed)
    else:
        hp, wp = _plane_shape(width, height, tile_h, tile_w)

        def body(acc, s):
            return acc + one(s), None

        total, _ = jax.lax.scan(
            body,
            Vec3.zeros((hp, wp)),
            seed * jnp.int32(7919) + jnp.arange(spp, dtype=jnp.int32),
        )
        out = total * (1.0 / spp)

    img = out.to_array()
    img = img[:height, :width]
    if return_sky_cache:
        return img, out_cache
    return img
