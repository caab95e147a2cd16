#!/usr/bin/env python
"""Per-call fwd+bwd time vs spp on the bench workload: separates the
per-sample cost (the scan body) from any O(1)-per-call overhead. Round-4
observation: spp=4 and spp=8 cost ~the same per CALL (~300 ms), so the
backward is dominated by per-call work, not per-sample physics.

Usage: python benchmarks/spp_scaling.py [sky|const] [spp ...]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from ray_tracing_tpu import Camera, RenderConfig
from ray_tracing_tpu.io.image import load_cubemap
from ray_tracing_tpu.kernels.megakernel import render_image_pallas
from ray_tracing_tpu.ops.cubemap import constant_sky
from ray_tracing_tpu.scene.parser import parse_scene_file
from ray_tracing_tpu.utils.timing import timed_marginal

WIDTH, HEIGHT = 1920, 1080


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "sky"
    spps = [int(a) for a in sys.argv[2:]] or [1, 2, 4, 8, 16]
    scene = parse_scene_file("/root/reference/scene_2.txt")
    camera = Camera.default()
    config = RenderConfig()
    cubemap = load_cubemap() if which == "sky" else constant_sky((0.6, 0.7, 0.9))

    for spp in spps:
        def loss(scene, seed):
            return jnp.sum(render_image_pallas(
                scene, camera, WIDTH, HEIGHT, seed, spp=spp,
                config=config, cubemap=cubemap))

        f = jax.jit(jax.grad(loss))
        t0 = time.perf_counter()
        jax.block_until_ready(f(scene, 999))
        compile_s = time.perf_counter() - t0
        dt = timed_marginal(f, lambda i: (scene, 1000 + i))
        print(f"{which} spp={spp:3d}  {dt * 1e3:8.2f} ms/call  "
              f"{dt * 1e3 / spp:7.2f} ms/sample  (compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
