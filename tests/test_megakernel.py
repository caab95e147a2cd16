"""Pallas megakernel tests.

The kernel is TPU hardware code; tests here run it through the Pallas TPU
interpreter on CPU, which is very slow to compile (~minutes) — so they are
gated behind RTT_SLOW=1 and the fast path is covered by statistical
equivalence checks on real TPU (run manually / by the bench driver).
Packing/view logic is tested cheaply below without running the kernel.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ray_tracing_tpu import Camera, RenderConfig
from ray_tracing_tpu.kernels.megakernel import SceneView, pack_scene
from ray_tracing_tpu.ops.cubemap import constant_sky
from ray_tracing_tpu.ops.intersect import trace
from ray_tracing_tpu.ops.vec import Vec3
from ray_tracing_tpu.scene.types import ObjectSpec, Scene

SLOW = os.environ.get("RTT_SLOW") == "1"


def scene():
    return Scene.from_objects([
        ObjectSpec(kind="sphere", p0=(3.0, 3.0, 3.0), p1=(1.2,) * 3,
                   albedo=(0.7, 0.3, 0.2), roughness=0.4, reflectance=0.3,
                   metallic=0.1, emission_power=2.0, emission_color=(1.0, 0.8, 0.6)),
        ObjectSpec(kind="cube", p0=(-2.0, -0.5, -2.0), p1=(8.0, 0.4, 8.0),
                   albedo=(0.2, 0.5, 0.9), roughness=1.0),
    ])


def test_pack_scene_layout():
    s = scene()
    packed = np.asarray(pack_scene(s))
    assert packed.shape == (2, 16)
    np.testing.assert_allclose(packed[0, 0:3], [3, 3, 3])
    np.testing.assert_allclose(packed[0, 3:6], [1.2] * 3, rtol=1e-6)
    np.testing.assert_allclose(packed[0, 6:9], [0.7, 0.3, 0.2], rtol=1e-6)
    assert packed[0, 9] == pytest.approx(0.4)
    assert packed[0, 10] == pytest.approx(0.3)
    assert packed[0, 11] == pytest.approx(0.1)
    # emission premultiplied: color * power
    np.testing.assert_allclose(packed[0, 12:15], [2.0, 1.6, 1.2], rtol=1e-6)
    np.testing.assert_allclose(packed[1, 0:3], [-2, -0.5, -2])


def test_scene_view_trace_matches_scene():
    """trace() through the duck-typed SceneView (over a plain array) must
    equal trace() through the real Scene — same code path the kernel runs."""
    s = scene()
    view = SceneView(pack_scene(s), s.obj_type, s.light_index)

    n = 64
    rng = np.random.default_rng(0)
    ro = Vec3.from_array(jnp.asarray(rng.uniform(-6, 6, (n, 3)), jnp.float32))
    rd = Vec3.from_array(jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32))

    h1 = trace(s, ro, rd)
    h2 = trace(view, ro, rd)
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(h1.obj), np.asarray(h2.obj))
    np.testing.assert_allclose(
        np.asarray(h1.normal.to_array()), np.asarray(h2.normal.to_array()), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(h1.emission.to_array()), np.asarray(h2.emission.to_array()), rtol=1e-6
    )


@pytest.mark.skipif(not SLOW, reason="TPU-interpreter compile is minutes-slow; set RTT_SLOW=1")
def test_megakernel_interpret_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    from ray_tracing_tpu.kernels.megakernel import render_image_pallas
    from ray_tracing_tpu.render.integrator import render_image

    cfg = RenderConfig(bounces=2, shadow_samples=1)
    sky = constant_sky((0.3, 0.4, 0.5))
    cam = Camera.default()
    s = scene()
    img = np.asarray(
        render_image_pallas(s, cam, 128, 32, 0, spp=2, config=cfg, cubemap=sky,
                            interpret=pltpu.InterpretParams())
    )
    ref = np.asarray(
        render_image(s, cam, 128, 32, jax.random.key(0), spp=2, config=cfg, cubemap=sky)
    )
    assert abs(img.mean() - ref.mean()) < 0.03
