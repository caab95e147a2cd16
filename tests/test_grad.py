"""Gradient correctness: jax.grad through the renderer vs finite differences.

BASELINE.md target: "grad allclose vs finite-difference oracle".

Two regimes, both covered:

* Material/emission parameters enter the estimator multilinearly -> FD
  matches tightly even in reference-exact mode (nearest sky, Bernoulli
  branch).
* Geometry / camera / roughness parameters act through ray DIRECTIONS, and
  in reference-exact mode the per-key estimator is piecewise-constant in
  them (sky is nearest-texel, F only gates a discrete branch, NEE emission
  is constant) — so interior gradients are legitimately zero. The
  differentiable mode (env_filter="bilinear") makes radiance smooth in
  direction; with metallic=1 surfaces (branch always specular, no Bernoulli
  discontinuity) FD then validates the full chain rule through
  trace -> normal -> reflect -> sky.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ray_tracing_tpu import Camera, RenderConfig, render_image
from ray_tracing_tpu.diff.fd import finite_difference_grad
from ray_tracing_tpu.ops.cubemap import CubemapData, constant_sky
from ray_tracing_tpu.scene.types import ObjectSpec, Scene

KEY = jax.random.key(3)
CFG = RenderConfig(bounces=3, shadow_samples=2)
DIFF_CFG = RenderConfig(bounces=2, shadow_samples=1, env_filter="bilinear")
SKY = constant_sky((0.2, 0.3, 0.4))


def smooth_sky():
    """Small float cubemap with per-face linear gradients (smooth in uv)."""
    h = w = 8
    faces = np.zeros((6, h, w, 3), np.float32)
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    for f in range(6):
        faces[f, ..., 0] = 0.2 + 0.6 * xx * (f + 1) / 6
        faces[f, ..., 1] = 0.3 + 0.5 * yy
        faces[f, ..., 2] = 0.1 + 0.1 * f + 0.3 * xx * yy
    return CubemapData.from_faces(faces)


def make_scene():
    return Scene.from_objects([
        ObjectSpec(kind="sphere", p0=(3.0, 3.0, 3.0), p1=(1.2,) * 3,
                   albedo=(0.6, 0.4, 0.2), roughness=0.4, reflectance=0.3),
        ObjectSpec(kind="cube", p0=(-2.0, -0.5, -2.0), p1=(10.0, 0.4, 10.0),
                   albedo=(0.5, 0.5, 0.8), roughness=0.9),
        ObjectSpec(kind="sphere", p0=(0.0, 6.0, 0.0), p1=(0.8,) * 3,
                   emission_power=3.0, emission_color=(1.0, 0.9, 0.8)),
    ])


def mirror_scene(roughness=0.3):
    # metallic=1 -> the specular branch is taken unconditionally
    # (src/main.c:241), removing the Bernoulli discontinuity.
    return Scene.from_objects([
        ObjectSpec(kind="sphere", p0=(3.0, 3.0, 3.0), p1=(1.2,) * 3,
                   metallic=1.0, roughness=roughness),
    ])


def loss_full(scene, camera):
    img = render_image(scene, camera, 24, 18, KEY, spp=2, config=CFG, cubemap=SKY)
    return jnp.mean(img)


def loss_crop_diff(scene, camera):
    # center crop well inside the sphere silhouette -> geometry-smooth
    img = render_image(scene, camera, 24, 18, KEY, spp=2, config=DIFF_CFG,
                       cubemap=smooth_sky())
    return jnp.mean(img[7:11, 10:14])


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    denom = max(np.abs(a).max(), np.abs(b).max(), 1e-6)
    return np.abs(a - b).max() / denom


def test_grad_albedo_vs_fd():
    scene = make_scene()
    cam = Camera.default()

    def f(alb):
        return loss_full(dataclasses.replace(scene, albedo=alb), cam)

    g = jax.grad(f)(scene.albedo)
    fd = finite_difference_grad(f, scene.albedo, eps=2e-2)
    assert np.abs(np.asarray(g)).max() > 0
    assert rel_err(g, fd) < 0.08, (np.asarray(g), np.asarray(fd))


def test_grad_emission_vs_fd():
    scene = make_scene()
    cam = Camera.default()

    def f(ep):
        return loss_full(dataclasses.replace(scene, emission_power=ep), cam)

    g = jax.grad(f)(scene.emission_power)
    fd = finite_difference_grad(f, scene.emission_power, eps=2e-2)
    assert float(jnp.abs(g).max()) > 0
    assert rel_err(g, fd) < 0.08


def test_grad_roughness_vs_fd_diffmode():
    scene = mirror_scene(roughness=0.3)
    cam = Camera.default()

    def f(rough):
        return loss_crop_diff(dataclasses.replace(scene, roughness=rough), cam)

    g = jax.grad(f)(scene.roughness)
    fd = finite_difference_grad(f, scene.roughness, eps=5e-3)
    assert float(jnp.abs(g).max()) > 0
    assert rel_err(g, fd) < 0.15, (np.asarray(g), np.asarray(fd))


def test_grad_sphere_center_interior_vs_fd_diffmode():
    scene = mirror_scene(roughness=0.0)
    cam = Camera.default()

    def f(p0):
        return loss_crop_diff(dataclasses.replace(scene, p0=p0), cam)

    g = jax.grad(f)(scene.p0)
    fd = finite_difference_grad(f, scene.p0, eps=5e-3)
    g0, fd0 = np.asarray(g)[0], np.asarray(fd)[0]
    assert np.abs(g0).max() > 0
    assert rel_err(g0, fd0) < 0.15, (g0, fd0)


def test_grad_radius_interior_vs_fd_diffmode():
    scene = mirror_scene(roughness=0.0)
    cam = Camera.default()

    def f(p1):
        return loss_crop_diff(dataclasses.replace(scene, p1=p1), cam)

    g = jax.grad(f)(scene.p1)
    fd = finite_difference_grad(f, scene.p1, eps=5e-3)
    # only column 0 (the radius channel) is used by sphere intersection
    g0, fd0 = np.asarray(g)[0, 0], np.asarray(fd)[0, 0]
    assert abs(g0) > 0
    assert abs(g0 - fd0) / max(abs(g0), abs(fd0)) < 0.15, (g0, fd0)


def test_grad_camera_pos_interior_vs_fd_diffmode():
    scene = mirror_scene(roughness=0.0)
    cam = Camera.default()

    def f(pos):
        return loss_crop_diff(scene, dataclasses.replace(cam, pos=pos))

    g = jax.grad(f)(cam.pos)
    fd = finite_difference_grad(f, cam.pos, eps=5e-3)
    assert float(jnp.abs(g).max()) > 0
    assert rel_err(g, fd) < 0.15, (np.asarray(g), np.asarray(fd))


def test_grads_finite_on_reference_scene(scene0_text):
    from ray_tracing_tpu.scene.parser import parse_scene_string

    scene = parse_scene_string(scene0_text)
    cam = Camera.default()

    def f(s):
        img = render_image(s, cam, 16, 12, KEY, spp=1, config=CFG, cubemap=SKY)
        return jnp.mean(img)

    grads = jax.grad(f)(scene)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
