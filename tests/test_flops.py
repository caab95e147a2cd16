"""Roofline cost-model invariants (utils/flops.py).

The MFU numerator for the fetch backward is `counted vjp flops - modeled
fetch-dot flops`; a wrong dot model (round-3 self-review: the replay
routing model priced every shadow record as a 6-pass (N,16) matmul,
~20x the real cost) clamps the numerator to zero and silently destroys
the reported bwd MFU. These tests pin the model to XLA's own counting
conventions so it cannot drift that way again.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/scene_0.txt"),
    reason="reference scenes not present",
)


@pytest.fixture(scope="module")
def cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def test_fetch_mxu_model_fits_inside_counted_vjp(cpu):
    """The modeled fetch-dot flops must be a PROPER share of the counted
    vjp graph: positive (the dots are in the graph) and strictly below
    the total (subtracting must leave a positive VPU numerator)."""
    from ray_tracing_tpu import RenderConfig
    from ray_tracing_tpu.scene.parser import parse_scene_file
    from ray_tracing_tpu.utils import flops as F

    # smaller physics than the default keeps the CPU compile cheap; the
    # share property is config-independent
    cfg = RenderConfig(bounces=3, shadow_samples=2)
    for name in ("scene_0", "scene_2"):
        scene = parse_scene_file(f"/root/reference/{name}.txt")
        vjp = F.fetch_vjp_cost_per_pixel(scene, cfg)["flops_per_px"]
        mxu = F.fetch_mxu_flops_per_pixel(scene, cfg)
        assert 0 < mxu < vjp, (name, mxu, vjp)
        # the TPU MXU-time convention is exactly the 6-pass scaling
        assert F.fetch_mxu_flops_per_pixel(scene, cfg, passes=6) == 6 * mxu


def test_xla_cpu_cost_analysis_prices_dots_at_one_pass(cpu):
    """fetch_mxu_flops_per_pixel's default passes=1 is justified by XLA
    pricing a dot at 2*M*N*K regardless of precision=HIGHEST; if a jax
    upgrade changes that, the subtraction convention must be revisited."""
    import jax
    import jax.numpy as jnp

    a, b = jnp.ones((9, 1024)), jnp.ones((16, 1024))

    def cost(f):
        c = jax.jit(f).lower(a, b).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0))

    dn = (((1,), (1,)), ((), ()))
    highest = cost(lambda a, b: jax.lax.dot_general(
        a, b, dn, precision=jax.lax.Precision.HIGHEST))
    default = cost(lambda a, b: jax.lax.dot_general(a, b, dn))
    assert highest == default == 2 * 9 * 16 * 1024


def test_physics_cost_tracks_occlusion_shadow_path(cpu):
    """physics_cost_per_pixel keys on Scene.emissive: the occlusion
    shadow path (1-plane trace) must be priced cheaper than the exact
    full scan the emissive=None opt-out runs."""
    import dataclasses

    from ray_tracing_tpu import RenderConfig
    from ray_tracing_tpu.scene.parser import parse_scene_file
    from ray_tracing_tpu.utils import flops as F

    cfg = RenderConfig(bounces=3, shadow_samples=2)
    scene = parse_scene_file("/root/reference/scene_0.txt")
    occl = F.physics_cost_per_pixel(scene, cfg)["flops_per_px"]
    exact = F.physics_cost_per_pixel(
        dataclasses.replace(scene, emissive=None), cfg)["flops_per_px"]
    assert occl < exact, (occl, exact)
