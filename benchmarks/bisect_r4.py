#!/usr/bin/env python
"""Round-4 regression bisect: fwd+bwd per-sample time on the bench workload
(scene_2 1920x1080 + 2048^2 skybox, spp=8, grads to all scene params) under
config variants, to isolate the BENCH_r03 2x bwd slowdown (VERDICT.md weak #1).

Usage: python benchmarks/bisect_r4.py [variant ...]
Variants: default replay nosparse direct
"""
import os
import sys
import time

# compile cache: configured by ray_tracing_tpu/__init__.py (host-fingerprinted)

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ray_tracing_tpu import Camera, RenderConfig
from ray_tracing_tpu.io.image import load_cubemap
from ray_tracing_tpu.kernels.megakernel import render_image_pallas
from ray_tracing_tpu.scene.parser import parse_scene_file
from ray_tracing_tpu.utils.timing import timed_per_sample

WIDTH, HEIGHT = 1920, 1080
SPP = 8

VARIANTS = {
    "default": {},
    "replay": {"bwd_mode": "replay"},
    "nosparse": {"sky_sparse_gather": False},
    "direct": {"bwd_mode": "direct"},
}


def main():
    names = sys.argv[1:] or ["default", "replay", "nosparse"]
    scene = parse_scene_file("/root/reference/scene_2.txt")
    camera = Camera.default()
    skybox = load_cubemap()

    for name in names:
        config = RenderConfig(**VARIANTS[name])

        def loss(scene, seed):
            img = render_image_pallas(
                scene, camera, WIDTH, HEIGHT, seed, spp=SPP,
                config=config, cubemap=skybox,
            )
            return jnp.sum(img)

        f = jax.jit(jax.grad(loss))
        t0 = time.perf_counter()
        dt = timed_per_sample(f, scene, n=SPP)
        wall = time.perf_counter() - t0
        rays = WIDTH * HEIGHT * 40
        print(
            f"{name:10s} fwd+bwd {dt * 1e3:7.2f} ms/sample "
            f"{rays / dt / 1e9:6.2f} Grays/s  (wall {wall:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
