#!/usr/bin/env python
"""Decompose the fwd+bwd per-sample time on the bench workload (round 4).

The current stack runs the backward ~2.3x slower than rounds 2-3 measured
(BENCH_NOTES round 4) with NO repo change — this isolates where the 34 ms
of backward time actually goes before optimizing anything:

  fwd            plain forward (no grad machinery)
  vjp-fwd        forward through jax.vjp (fetch: + record-plane writes)
  grad-const     full grad with a constant sky (no sky gather/scan glue)
  grad           full grad, real skybox (the bench headline)

Usage: python benchmarks/bwd_decompose.py [spp] [scene_path] [case ...]
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from ray_tracing_tpu import Camera, RenderConfig
from ray_tracing_tpu.io.image import load_cubemap
from ray_tracing_tpu.kernels.megakernel import render_image_pallas
from ray_tracing_tpu.ops.cubemap import constant_sky
from ray_tracing_tpu.scene.parser import parse_scene_file
from ray_tracing_tpu.utils.timing import timed_per_sample

WIDTH, HEIGHT = 1920, 1080


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scene_path = sys.argv[2] if len(sys.argv) > 2 else "/root/reference/scene_2.txt"
    scene = parse_scene_file(scene_path)
    camera = Camera.default()
    config = RenderConfig()
    skybox = load_cubemap()
    const = constant_sky((0.6, 0.7, 0.9))
    rays = WIDTH * HEIGHT * 40

    def loss_fn(cubemap):
        def loss(scene, seed):
            return jnp.sum(render_image_pallas(
                scene, camera, WIDTH, HEIGHT, seed, spp=spp,
                config=config, cubemap=cubemap))
        return loss

    cases = {
        "fwd": jax.jit(loss_fn(skybox)),
        "vjp-fwd": jax.jit(lambda s, seed: jax.vjp(
            loss_fn(skybox), s, jnp.asarray(seed))[0]),
        "grad-const": jax.jit(jax.grad(loss_fn(const))),
        "grad": jax.jit(jax.grad(loss_fn(skybox))),
    }
    want = set(sys.argv[3:])
    unknown = want - cases.keys()
    if unknown:
        # a typo'd case would otherwise skip every case with no output,
        # silently wasting a TPU tunnel session
        sys.exit(f"unknown cases: {sorted(unknown)} (have {sorted(cases)})")
    for name, f in cases.items():
        if want and name not in want:
            continue
        dt = timed_per_sample(f, scene, n=spp)
        print(f"{name:12s} {dt * 1e3:7.2f} ms/sample  "
              f"{rays / dt / 1e9:6.2f} Grays/s", flush=True)


if __name__ == "__main__":
    main()
