"""Monte-Carlo path-tracing integrator — the hot kernel, pure-XLA path.

Re-expresses the reference's per-pixel recursive estimator
(``pixel()``, src/main.c:131-272) as a fixed-length `lax.scan` over bounces
with an active-ray mask, fully vectorized over (batch..., ) pixels/samples:
no data-dependent control flow, static shapes, everything fuses into a few
big VPU passes per bounce. Semantics are bit-faithful to the reference
modulo RNG streams (SURVEY.md §2 path-tracer row):

  * <= 10 bounces, early exit on miss -> masked-out lanes (src/main.c:156-173)
  * sky = cubemap sample of the normalized direction, weighted by throughput
  * explicit next-event sampling toward the FIRST emissive object only:
    3 jittered shadow rays, spread 0.5, hemisphere-rejected, averaged,
    blended with weight 0.05 and throughput renormalized by 0.95
    (src/main.c:180-210, 257-261)
  * Fresnel-Schlick with f0 = lerp(0.16*reflectance^2, albedo, metallic)
  * stochastic specular/diffuse branch: specular if metallic > 0.001 or
    u <= avg(F) (src/main.c:240-249)
  * emission added every bounce; hit offset 1e-3; final clamp to [0,1]
  * NoV/reflection use the RAW (unnormalized) incoming direction exactly
    like the reference does on the primary bounce (src/main.c:214, 243)

Differentiability: discrete decisions (hit object, cube face, specular
branch, texel index) are detached path topology; all continuous quantities
(distances, normals, Fresnel, throughput) carry gradients to scene geometry,
materials, and camera pose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ray_tracing_tpu.config import RenderConfig, DEFAULT_CONFIG
from ray_tracing_tpu.ops.cubemap import CubemapData, constant_sky, sample_cubemap
from ray_tracing_tpu.ops.intersect import trace
from ray_tracing_tpu.ops.linalg import (
    avg3,
    dot,
    fresnel_schlick,
    is_zero_vec,
    reflect,
    safe_normalize,
)
from ray_tracing_tpu.ops.sampling import random_direction
from ray_tracing_tpu.render.camera import Camera, pixel_grid, ray_through_screen
from ray_tracing_tpu.scene.types import Scene


def render_rays(
    scene: Scene,
    ro,
    rd,
    key,
    config: RenderConfig = DEFAULT_CONFIG,
    cubemap: CubemapData | None = None,
):
    """Trace a batch of rays to completion. ro, rd: (..., 3) -> rgb (..., 3).

    rd may be unnormalized (primary rays are — see camera.ray_through_screen).
    """
    if cubemap is None:
        cubemap = constant_sky()

    batch_shape = rd.shape[:-1]
    light_index, has_light = scene.light_info()
    light_origin = scene.origin_of()[light_index]  # (3,)

    def bounce(state, bounce_key):
        ro, rd, contrib, result, alive = state

        d = safe_normalize(rd)
        hit = trace(scene, ro, d)

        # --- miss: add sky * throughput, kill the ray (src/main.c:162-173)
        sky = sample_cubemap(cubemap, d)
        miss_now = alive & ~hit.hit
        result = result + jnp.where(miss_now[..., None], sky * contrib, 0.0)
        active = alive & hit.hit

        obj = jnp.maximum(hit.obj, 0)  # safe gather index; masked by `active`
        albedo = scene.albedo[obj]
        roughness = scene.roughness[obj]
        reflectance = scene.reflectance[obj]
        metallic = scene.metallic[obj]
        emission = scene.emission_color[obj] * scene.emission_power[obj][..., None]

        k_shadow, k_dir, k_branch = jax.random.split(bounce_key, 3)

        # --- next-event light sampling (src/main.c:180-210)
        ns = config.shadow_samples
        rand_dirs = random_direction(
            k_shadow, (*batch_shape, ns), config.cube_biased_sampling
        )  # (..., ns, 3)
        accept = dot(rand_dirs, hit.normal[..., None, :]) > 0  # ref rejects <= 0
        dir_to_light = light_origin - hit.point  # (..., 3)
        sample_dir = safe_normalize(
            config.shadow_spread * rand_dirs + dir_to_light[..., None, :]
        )
        sample_ro = hit.point[..., None, :] + config.hit_offset * sample_dir
        hit2 = trace(scene, sample_ro, sample_dir)  # batch (..., ns)
        obj2 = jnp.maximum(hit2.obj, 0)
        emit2 = scene.emission_color[obj2] * scene.emission_power[obj2][..., None]
        shadow_contrib = jnp.where((accept & hit2.hit)[..., None], emit2, 0.0)
        num_samples = jnp.sum(accept, axis=-1)  # (...,)
        sampled_light = jnp.sum(shadow_contrib, axis=-2) / jnp.maximum(
            num_samples, 1
        )[..., None]
        sampled_light = jnp.where(has_light, sampled_light, 0.0)

        # --- Fresnel (src/main.c:214-222); v is the RAW incoming direction
        v = -rd
        n = hit.normal
        NoV = jnp.clip(dot(n, v), 0.0, 1.0)
        f0_d = 0.16 * reflectance**2
        f0 = (
            f0_d[..., None] * (1.0 - metallic)[..., None]
            + albedo * metallic[..., None]
        )
        F = fresnel_schlick(NoV, f0)

        # --- bounce direction draw, flipped into the normal hemisphere
        rand_dir = random_direction(k_dir, batch_shape, config.cube_biased_sampling)
        rand_dir = jnp.where(
            dot(rand_dir, n, keepdims=True) < 0, -rand_dir, rand_dir
        )

        # --- emission every bounce, with pre-branch throughput (src/main.c:232)
        result = result + jnp.where(active[..., None], emission * contrib, 0.0)

        # --- stochastic specular/diffuse branch (src/main.c:240-249)
        u_branch = jax.random.uniform(k_branch, batch_shape)
        specular = (metallic > 0.001) | (u_branch <= avg3(F))
        reflect_dir = reflect(rd, n)  # raw rd, like the reference
        out_spec = safe_normalize(roughness[..., None] * rand_dir + reflect_dir)
        out_dir = jnp.where(specular[..., None], out_spec, rand_dir)
        diffuse_scale = albedo * (1.0 - metallic)[..., None]
        contrib_new = jnp.where(
            specular[..., None], contrib, contrib * diffuse_scale
        )

        # --- light-sample blend AFTER the branch throughput update
        # (src/main.c:257-261): result += 0.05 * light * contrib_new;
        # contrib *= 0.95 — but only when the sampled color is non-zero.
        light_on = active & ~is_zero_vec(sampled_light)
        result = result + jnp.where(
            light_on[..., None],
            config.light_sample_weight * sampled_light * contrib_new,
            0.0,
        )
        contrib_new = jnp.where(
            light_on[..., None],
            contrib_new * (1.0 - config.light_sample_weight),
            contrib_new,
        )

        new_ro = hit.point + config.hit_offset * out_dir
        ro = jnp.where(active[..., None], new_ro, ro)
        rd = jnp.where(active[..., None], out_dir, rd)
        contrib = jnp.where(active[..., None], contrib_new, contrib)

        return (ro, rd, contrib, result, active), None

    contrib0 = jnp.ones((*batch_shape, 3), rd.dtype)
    result0 = jnp.zeros((*batch_shape, 3), rd.dtype)
    alive0 = jnp.ones(batch_shape, bool)

    bounce_keys = jax.random.split(key, config.bounces)
    (ro, rd, contrib, result, alive), _ = jax.lax.scan(
        bounce, (ro, rd, contrib0, result0, alive0), bounce_keys
    )

    return jnp.clip(result, 0.0, 1.0)  # src/main.c:267-269


def render_pixels(
    scene: Scene,
    camera: Camera,
    u,
    v,
    aspect_ratio,
    key,
    config: RenderConfig = DEFAULT_CONFIG,
    cubemap: CubemapData | None = None,
):
    """pixel() for arbitrary screen coordinates u, v (...,) -> rgb (..., 3)."""
    ro, rd = ray_through_screen(camera, u, v, aspect_ratio, config)
    return render_rays(scene, ro, rd, key, config, cubemap)


def render_image(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    key,
    spp: int = 1,
    config: RenderConfig = DEFAULT_CONFIG,
    cubemap: CubemapData | None = None,
):
    """Render a full (H, W, 3) frame, averaging `spp` independent samples.

    Equivalent to `spp` accumulated reference frames at scale 1
    (src/main.c:274-322 with scale=1 and src/main.c:394-396 averaging).
    """
    uu, vv = pixel_grid(width, height)
    aspect = width / height

    def one_sample(k):
        return render_pixels(scene, camera, uu, vv, aspect, k, config, cubemap)

    if spp == 1:
        return one_sample(key)
    keys = jax.random.split(key, spp)
    # scan (not vmap) keeps peak memory at one sample's footprint.
    total0 = jnp.zeros((height, width, 3), jnp.float32)
    total, _ = jax.lax.scan(lambda acc, k: (acc + one_sample(k), None), total0, keys)
    return total / spp
