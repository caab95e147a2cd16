"""Integrator behavior tests (semantics of pixel(), src/main.c:131-272)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ray_tracing_tpu import Camera, RenderConfig, render_image
from ray_tracing_tpu.ops.cubemap import constant_sky
from ray_tracing_tpu.ops.vec import Vec3
from ray_tracing_tpu.render.integrator import render_rays
from ray_tracing_tpu.scene.types import ObjectSpec, Scene

KEY = jax.random.key(7)
FAST = RenderConfig(bounces=3, shadow_samples=2)


def small_render(scene, cubemap=None, config=FAST, key=KEY, spp=1):
    return render_image(
        scene, Camera.default(), 32, 24, key, spp=spp, config=config, cubemap=cubemap
    )


def test_empty_scene_returns_sky():
    scene = Scene.from_objects([ObjectSpec(kind="sphere", p0=(1e6, 1e6, 1e6))])
    sky = constant_sky((0.25, 0.5, 0.75))
    img = np.asarray(small_render(scene, cubemap=sky))
    np.testing.assert_allclose(img[..., 0], 0.25, atol=1e-6)
    np.testing.assert_allclose(img[..., 1], 0.5, atol=1e-6)
    np.testing.assert_allclose(img[..., 2], 0.75, atol=1e-6)


def test_black_sky_no_light_is_black():
    scene = Scene.from_objects([
        ObjectSpec(kind="sphere", p0=(3.0, 3.0, 3.0), p1=(1.0,) * 3, roughness=1.0),
    ])
    img = np.asarray(small_render(scene))
    assert img.max() == 0.0


def test_emissive_object_glows():
    scene = Scene.from_objects([
        ObjectSpec(kind="sphere", p0=(3.0, 3.0, 3.0), p1=(1.5,) * 3,
                   emission_power=5.0, emission_color=(1.0, 0.2, 0.1)),
    ])
    img = np.asarray(small_render(scene))
    # camera at (5,5,5) looking at -(1,1,1): the sphere fills the center
    assert img[..., 0].max() == 1.0  # clamped red channel
    assert img[..., 0].mean() > 0.1  # sphere covers a good chunk of the frame


def test_zero_shadow_samples_is_nee_off():
    """shadow_samples=0 on a lit scene must equal the same render with
    the light metadata dropped (NEE off), bit-for-bit: the empty-axis
    shadow sums contribute exactly zero and the per-bounce key splits are
    independent of the shadow branch. Pins the contract the Pallas entry
    relies on when it normalizes light_index to -1 for ns=0 (zero-sized
    shadow draws/record planes are not Mosaic-lowerable)."""
    import dataclasses

    scene = Scene.from_objects([
        ObjectSpec(kind="sphere", p0=(3.0, 3.0, 3.0), roughness=1.0),
        ObjectSpec(kind="cube", p0=(0.0, 0.0, 0.0), p1=(6.0, 0.1, 6.0)),
        ObjectSpec(kind="sphere", p0=(1.0, 4.0, 1.0), emission_power=3.0),
    ])
    assert scene.has_light
    cfg = RenderConfig(bounces=3, shadow_samples=0)
    sky = constant_sky((0.2, 0.3, 0.4))
    lit = np.asarray(small_render(scene, cubemap=sky, config=cfg))
    dark_meta = dataclasses.replace(scene, light_index=-1, emissive=None)
    off = np.asarray(small_render(dark_meta, cubemap=sky, config=cfg))
    np.testing.assert_array_equal(lit, off)


def test_determinism_and_key_sensitivity():
    scene = Scene.from_objects([
        ObjectSpec(kind="sphere", p0=(3.0, 3.0, 3.0), roughness=1.0),
        ObjectSpec(kind="cube", p0=(0.0, 0.0, 0.0), p1=(6.0, 0.1, 6.0)),
        ObjectSpec(kind="sphere", p0=(1.0, 4.0, 1.0), emission_power=3.0),
    ])
    sky = constant_sky((0.2, 0.2, 0.2))
    a = np.asarray(small_render(scene, cubemap=sky, key=jax.random.key(1)))
    b = np.asarray(small_render(scene, cubemap=sky, key=jax.random.key(1)))
    c = np.asarray(small_render(scene, cubemap=sky, key=jax.random.key(2)))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0  # MC noise differs across keys


def test_spp_reduces_variance():
    scene = Scene.from_objects([
        ObjectSpec(kind="cube", p0=(0.0, 0.0, 0.0), p1=(6.0, 0.1, 6.0), roughness=1.0),
        ObjectSpec(kind="sphere", p0=(3.0, 4.0, 3.0), emission_power=4.0),
    ])
    sky = constant_sky((0.3, 0.3, 0.3))
    r1a = np.asarray(small_render(scene, cubemap=sky, key=jax.random.key(1)))
    r1b = np.asarray(small_render(scene, cubemap=sky, key=jax.random.key(2)))
    r16a = np.asarray(small_render(scene, cubemap=sky, key=jax.random.key(3), spp=16))
    r16b = np.asarray(small_render(scene, cubemap=sky, key=jax.random.key(4), spp=16))
    assert np.abs(r16a - r16b).mean() < np.abs(r1a - r1b).mean()


def test_mirror_sphere_reflects_sky():
    # metallic=1, roughness=0 -> pure mirror: every bounce is specular,
    # throughput stays 1, so the sphere shows the sky color exactly.
    scene = Scene.from_objects([
        ObjectSpec(kind="sphere", p0=(3.0, 3.0, 3.0), p1=(1.0,) * 3,
                   metallic=1.0, roughness=0.0),
    ])
    sky = constant_sky((0.4, 0.6, 0.8))
    img = np.asarray(small_render(scene, cubemap=sky))
    np.testing.assert_allclose(img[..., 0], 0.4, atol=1e-5)
    np.testing.assert_allclose(img[..., 2], 0.8, atol=1e-5)


def test_render_rays_shapes():
    scene = Scene.from_objects([ObjectSpec(kind="sphere")])
    ro = Vec3.zeros((5, 7))
    rd = Vec3(jnp.ones((5, 7)), jnp.ones((5, 7)), jnp.ones((5, 7)))
    out = render_rays(scene, ro, rd, KEY, FAST)
    assert out.shape == (5, 7)
    assert out.to_array().shape == (5, 7, 3)


def test_max_bounces_terminate():
    # a closed mirror box never misses: rays survive all bounces, and with
    # no emission the result is black (reference loop just ends, line 158)
    scene = Scene.from_objects([
        ObjectSpec(kind="cube", p0=(-10.0, -10.0, -10.0), p1=(40.0, 40.0, 40.0),
                   metallic=1.0, roughness=0.0),
    ])
    img = np.asarray(small_render(scene))
    assert img.max() == 0.0


def test_diffuse_albedo_attenuation():
    # one diffuse bounce then sky: color ~ albedo * sky (before clamping)
    scene = Scene.from_objects([
        ObjectSpec(kind="cube", p0=(-100.0, -1.0, -100.0), p1=(200.0, 1.0, 200.0),
                   albedo=(1.0, 0.5, 0.0), roughness=1.0, reflectance=0.0),
    ])
    sky = constant_sky((1.0, 1.0, 1.0))
    cfg = RenderConfig(bounces=2, shadow_samples=1)
    cam = Camera.default()
    img = np.asarray(
        render_image(scene, cam, 32, 24, jax.random.key(0), spp=64,
                     config=cfg, cubemap=sky)
    )
    # pixels that hit the floor: red/green ratio should reflect albedo ratio.
    floor = img[..., 0] > 0.15
    assert floor.any()
    ratio = img[..., 1][floor] / np.maximum(img[..., 0][floor], 1e-6)
    # green channel should be ~0.5x red (both scaled by same light), but
    # specular (unattenuated sky) mixes in; accept a loose band
    assert 0.3 < ratio.mean() < 0.9
    # blue gets essentially no diffuse contribution
    assert (img[..., 2][floor] <= img[..., 0][floor] + 1e-6).mean() > 0.99


def test_pixel_jitter_antialiases():
    # a hard silhouette against a bright sky: jittered sampling produces
    # intermediate edge pixels (box-filter AA); means stay consistent
    scene = Scene.from_objects([
        ObjectSpec(kind="sphere", p0=(3.0, 3.0, 3.0), p1=(1.2,) * 3,
                   albedo=(0.0, 0.0, 0.0), roughness=1.0, reflectance=0.0),
    ])
    sky = constant_sky((1.0, 1.0, 1.0))
    cfg = RenderConfig(bounces=1, shadow_samples=1)
    hard = np.asarray(render_image(
        scene, Camera.default(), 32, 24, jax.random.key(0), spp=32,
        config=cfg, cubemap=sky))
    aa = np.asarray(render_image(
        scene, Camera.default(), 32, 24, jax.random.key(0), spp=32,
        config=cfg.replace(pixel_jitter=True), cubemap=sky))
    assert abs(hard.mean() - aa.mean()) < 0.02
    # pixel-center sampling yields (near-)binary pixels; jitter fills the
    # edge band with fractional coverage values
    def mid_band(x):
        return ((x[..., 0] > 0.1) & (x[..., 0] < 0.9)).mean()

    assert mid_band(aa) > mid_band(hard) + 0.01


def test_fov_fix_mode_differs():
    scene = Scene.from_objects([ObjectSpec(kind="sphere", p0=(3.0, 3.0, 3.0))])
    sky = constant_sky((0.1, 0.4, 0.9))
    bugged = np.asarray(small_render(scene, cubemap=sky))
    fixed = np.asarray(small_render(scene, cubemap=sky,
                                    config=FAST.replace(fov_degrees_bug=False)))
    assert np.abs(bugged - fixed).max() > 0.01  # different projection
