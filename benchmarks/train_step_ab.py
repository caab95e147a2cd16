#!/usr/bin/env python
"""A/B: make_train_step(sky_cache_mode=True) vs False on hardware —
the third sky-cache-threading row VERDICT r03 #4 asks for. fit() enables
the mode whenever it trains through the Pallas kernel; this measures what
that is worth per training step on the real 2048^2 skybox.

Usage: python benchmarks/train_step_ab.py [--width 960 --height 540 --spp 4]
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")
from ray_tracing_tpu import Camera, RenderConfig
from ray_tracing_tpu.diff.inverse import extract_params, make_train_step
from ray_tracing_tpu.io.image import load_cubemap
from ray_tracing_tpu.parallel.mesh import make_mesh
from ray_tracing_tpu.parallel.render import render_image_sharded
from ray_tracing_tpu.scene.parser import parse_scene_file


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    scene = parse_scene_file("/root/reference/scene_2.txt")
    cam = Camera.default()
    config = RenderConfig()
    cubemap = load_cubemap()
    mesh = make_mesh(1, 1)
    W, H = args.width, args.height

    target = render_image_sharded(
        scene, cam, W, H, jax.random.key(1), mesh, spp=args.spp,
        config=config, cubemap=cubemap)
    params = {"scene": extract_params(scene, ("p0", "albedo")), "camera": {}}
    optimizer = optax.adam(1e-2)

    def run(sky_cache_mode: bool):
        step = make_train_step(
            scene, cam, mesh, optimizer, W, H, spp=args.spp, config=config,
            cubemap=cubemap, kernel="pallas", sky_cache_mode=sky_cache_mode)
        opt = optimizer.init(params)

        def window(n, key0):
            p, o, cache = params, opt, None
            loss = None
            t0 = time.perf_counter()
            for i in range(n):
                k = jax.random.key(key0 + i)
                if sky_cache_mode:
                    p, o, loss, cache = step(p, o, target, k, cache)
                else:
                    p, o, loss = step(p, o, target, k)
            jax.block_until_ready(loss)
            float(loss)  # one materialization per window (timing rules)
            return time.perf_counter() - t0

        window(1, 50)  # compile + warm
        k1 = 2
        t_small = min(window(k1, 100), window(k1, 200))
        t_big = min(window(k1 + args.steps, 300), window(k1 + args.steps, 600))
        return (t_big - t_small) / args.steps

    t_off = run(False)
    t_on = run(True)
    print(f"scene_2 {W}x{H} spp={args.spp} train step:")
    print(f"  sky_cache_mode=False: {t_off*1e3:8.2f} ms/step")
    print(f"  sky_cache_mode=True:  {t_on*1e3:8.2f} ms/step  [{t_off/t_on:.2f}x]")


if __name__ == "__main__":
    main()
