"""Film accumulation + progressive refinement (src/main.c:274-482 semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ray_tracing_tpu import Camera, RenderConfig
from ray_tracing_tpu.ops.cubemap import constant_sky
from ray_tracing_tpu.ops.vec import Vec3
from ray_tracing_tpu.render.film import (
    Film,
    lowres_grid,
    progressive_scales,
    render_pass,
    render_progressive,
    upsample_replicate,
)
from ray_tracing_tpu.scene.types import ObjectSpec, Scene

CFG = RenderConfig(bounces=2, shadow_samples=1)
SKY = constant_sky((0.5, 0.6, 0.7))
KEY = jax.random.key(11)


def scene():
    return Scene.from_objects([
        ObjectSpec(kind="sphere", p0=(3.0, 3.0, 3.0), p1=(1.0,) * 3, roughness=1.0),
        ObjectSpec(kind="cube", p0=(-3.0, -0.6, -3.0), p1=(12.0, 0.5, 12.0)),
    ])


def test_scale_weights():
    # a scale-s pass carries weight 1/s^2 (src/main.c:278, 394-396)
    film = Film.zero(32, 24)
    film = render_pass(scene(), Camera.default(), film, KEY, scale=4, config=CFG, cubemap=SKY)
    assert float(film.weight) == pytest.approx(1 / 16)
    film = render_pass(scene(), Camera.default(), film, KEY, scale=2, config=CFG, cubemap=SKY)
    assert float(film.weight) == pytest.approx(1 / 16 + 1 / 4)


def test_resolve_is_weighted_mean():
    cam = Camera.default()
    film = Film.zero(32, 24)
    film = render_pass(scene(), cam, film, KEY, scale=1, config=CFG, cubemap=SKY)
    once = film.resolve()
    film = render_pass(scene(), cam, film, KEY, scale=1, config=CFG, cubemap=SKY)
    twice = film.resolve()
    # same key twice -> identical sample -> mean unchanged
    np.testing.assert_allclose(np.asarray(once), np.asarray(twice), atol=1e-6)


def test_empty_film_resolves_to_zero():
    img = np.asarray(Film.zero(8, 6).resolve())
    assert img.shape == (6, 8, 3)
    assert img.max() == 0


def test_progressive_schedule():
    assert progressive_scales(RenderConfig(init_scale=8)) == [8, 4, 2, 1]
    assert progressive_scales(RenderConfig(init_scale=1)) == [1]
    assert progressive_scales(RenderConfig(init_scale=16)) == [16, 8, 4, 2, 1]


def test_lowres_grid_matches_reference_formula():
    # u = 1 - x/(lw-1), v = 1 - y/(lh-1) over floor-divided dims
    uu, vv, lw, lh = lowres_grid(33, 17, 4)
    assert (lw, lh) == (8, 4)
    assert float(uu[0, 0]) == pytest.approx(1.0)
    assert float(uu[0, -1]) == pytest.approx(0.0)
    assert float(vv[0, 0]) == pytest.approx(1.0)
    assert float(vv[-1, 0]) == pytest.approx(0.0)


def test_upsample_replicate():
    img = Vec3(
        jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        jnp.zeros((2, 3)),
        jnp.zeros((2, 3)),
    )
    up = upsample_replicate(img, 2, width=7, height=5)
    x = np.asarray(up.x)
    assert x.shape == (5, 7)
    assert x[0, 0] == 0 and x[1, 1] == 0
    assert x[0, 2] == 1 and x[3, 4] == 5
    # edge-extended remainder (col 6 copies col 5, row 4 copies row 3)
    assert x[0, 6] == 2 and x[4, 0] == 3


def test_progressive_render_converges_to_full_res():
    cam = Camera.default()
    film = render_progressive(
        scene(), cam, 32, 24, KEY, num_full_passes=2,
        config=CFG.replace(init_scale=4), cubemap=SKY,
    )
    img = np.asarray(film.resolve())
    assert img.shape == (24, 32, 3)
    # total weight: 1/16 + 1/4 + 1 + 1
    assert float(film.weight) == pytest.approx(1 / 16 + 1 / 4 + 2.0)
    assert img.max() <= 1.0 and img.min() >= 0.0
    assert img.std() > 0.01  # actual image content


def test_invalidation_is_fresh_film():
    # camera moved -> start over (reference: invalidate_accumulation,
    # src/main.c:115-124). Functional equivalent: a new zero film.
    cam = Camera.default()
    f1 = render_pass(scene(), cam, Film.zero(16, 12), KEY, 1, CFG, SKY)
    from ray_tracing_tpu.render.camera import UP, move

    cam2 = move(cam, UP, 0.5)
    f2 = render_pass(scene(), cam2, Film.zero(16, 12), KEY, 1, CFG, SKY)
    assert float(f2.weight) == pytest.approx(1.0)
    assert np.abs(np.asarray(f1.resolve()) - np.asarray(f2.resolve())).max() > 0


def test_render_pass_pallas_spp_weight(monkeypatch):
    """A batched pass (spp=k) must carry weight k/scale^2 so the resolved
    mean is unchanged — stub the kernel, check the accounting."""
    import jax.numpy as jnp

    from ray_tracing_tpu.kernels import megakernel as mk
    from ray_tracing_tpu.render.film import Film, render_pass_pallas

    W, H = 16, 8
    calls = {}

    def fake_render(scene, camera, w, h, seed, spp=1, config=None,
                    cubemap=None, aspect=None, **kw):
        calls["spp"] = spp
        return jnp.full((h, w, 3), 0.25, jnp.float32)

    monkeypatch.setattr(mk, "render_image_pallas", fake_render)

    film = Film.zero(W, H)
    film = render_pass_pallas(None, None, film, 0, scale=1, spp=4)
    assert calls["spp"] == 4
    assert float(film.weight) == 4.0
    np.testing.assert_allclose(np.asarray(film.resolve()), 0.25, atol=1e-6)
    # a scale-2 single-sample warmup still weighs 1/4
    film = render_pass_pallas(None, None, film, 1, scale=2, spp=1)
    assert float(film.weight) == 4.25
