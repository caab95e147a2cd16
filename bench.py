#!/usr/bin/env python
"""Benchmark: Mrays/s/chip forward+backward on scene_2 (BASELINE.md target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Ray accounting matches the reference cost model (SURVEY.md §6 "work per
full-res frame"): every pixel-sample runs the fixed bounce loop of
`bounces * (1 primary + shadow_samples NEE)` closest-hit traces — the same
work the reference's pixel() dispatches per sample (src/main.c:156,189).

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is the reference's own trace_ray measured on this machine's CPU
(gcc -O2, scene_2: ~9.08 Mrays/s single-thread) scaled by its max thread
count 32 (src/main.c:46) => 290.6 Mrays/s, an *optimistic* CPU ceiling
that ignores shading/RNG/sync overhead the real program pays.

Timing method: N samples accumulated on-device inside one jit call
(per-call dispatch through the TPU tunnel costs ~40ms and would swamp
per-frame timing); the scalar reduction is the only host transfer.
"""

import json
import time

import jax
import jax.numpy as jnp

REF_CPU_MRAYS_32T = 290.6  # see module docstring

WIDTH, HEIGHT = 1920, 1080
SPP_FWD = 32
SPP_BWD = 8


def main():
    from ray_tracing_tpu import Camera, RenderConfig
    from ray_tracing_tpu.ops.cubemap import constant_sky
    from ray_tracing_tpu.render.integrator import render_image
    from ray_tracing_tpu.scene.parser import parse_scene_file

    scene = parse_scene_file("/root/reference/scene_2.txt")
    camera = Camera.default()
    config = RenderConfig()  # full reference physics: 10 bounces, 3 shadow rays
    cubemap = constant_sky((0.6, 0.7, 0.9))
    traces_per_sample = config.bounces * (1 + config.shadow_samples)

    def render_sum(scene, key, spp):
        img = render_image(
            scene, camera, WIDTH, HEIGHT, key, spp=spp, config=config, cubemap=cubemap
        )
        return jnp.sum(img)

    # ---- forward: Pallas megakernel (kernels/megakernel.py) ----
    from ray_tracing_tpu.kernels.megakernel import render_image_pallas

    def render_sum_pallas(scene, seed):
        img = render_image_pallas(
            scene, camera, WIDTH, HEIGHT, seed, spp=SPP_FWD,
            config=config, cubemap=cubemap,
        )
        return jnp.sum(img)

    fwd = jax.jit(render_sum_pallas)
    float(fwd(scene, 0))  # compile + warm
    t0 = time.perf_counter()
    float(fwd(scene, 1))
    dt_fwd = (time.perf_counter() - t0) / SPP_FWD
    rays = WIDTH * HEIGHT * traces_per_sample
    fwd_mrays = rays / dt_fwd / 1e6

    # ---- forward + backward: Pallas fwd + Pallas custom-VJP backward,
    # gradients w.r.t. all scene parameters ----
    def loss_pallas(scene, seed):
        img = render_image_pallas(
            scene, camera, WIDTH, HEIGHT, seed, spp=SPP_BWD,
            config=config, cubemap=cubemap,
        )
        return jnp.sum(img)

    bwd = jax.jit(jax.grad(loss_pallas))
    jax.block_until_ready(bwd(scene, 0))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(bwd(scene, 1))
    dt_bwd = (time.perf_counter() - t0) / SPP_BWD
    bwd_mrays = rays / dt_bwd / 1e6

    print(
        json.dumps(
            {
                "metric": "Mrays/s/chip fwd+bwd scene_2 1920x1080 (fwd-only %.0f)" % fwd_mrays,
                "value": round(bwd_mrays, 1),
                "unit": "Mrays/s",
                "vs_baseline": round(bwd_mrays / REF_CPU_MRAYS_32T, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
