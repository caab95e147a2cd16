#!/usr/bin/env python
"""Interactive film-pass benchmark: cross-pass sky-cache gain.

The viewer/serve accumulation loop renders full-res passes (spp=4) at a
fixed camera. Without the threaded cache every pass re-seeds the sparse
sky cache with a full-frame texel gather; with it, every sample of every
pass takes the sparse path (bit-identical — test_megakernel.py::
test_sky_cache_threading_bit_identical). This times both loops.

Usage: python benchmarks/film_pass.py [--scene scene_2] [--passes 16]
                                      [--width 1920 --height 1080]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from ray_tracing_tpu import Camera, RenderConfig
from ray_tracing_tpu.io.image import load_cubemap
from ray_tracing_tpu.kernels.megakernel import render_image_pallas
from ray_tracing_tpu.scene.parser import parse_scene_file


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="scene_2")
    ap.add_argument("--passes", type=int, default=16)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--spp", type=int, default=4)
    args = ap.parse_args()

    scene = parse_scene_file(f"/root/reference/{args.scene}.txt")
    cam = Camera.default()
    config = RenderConfig()
    cubemap = load_cubemap()

    @jax.jit
    def seeded(scene, seed):
        img, cache = render_image_pallas(
            scene, cam, args.width, args.height, seed, spp=args.spp,
            config=config, cubemap=cubemap, return_sky_cache=True)
        return jnp.sum(img), cache

    @jax.jit
    def cached(scene, seed, cache):
        img, cache = render_image_pallas(
            scene, cam, args.width, args.height, seed, spp=args.spp,
            config=config, cubemap=cubemap, sky_cache=cache,
            return_sky_cache=True)
        return jnp.sum(img), cache

    def loop(thread_cache: bool):
        # warmup + seed
        s, cache = seeded(scene, jnp.int32(0))
        float(s)
        t0 = time.perf_counter()
        for i in range(1, args.passes + 1):
            if thread_cache:
                s, cache = cached(scene, jnp.int32(i), cache)
            else:
                s, _ = seeded(scene, jnp.int32(i))
            float(s)  # host materialization each pass, like the viewer
        return (time.perf_counter() - t0) / args.passes

    t_seeded = loop(False)
    t_cached = loop(True)
    px_s = args.width * args.height * args.spp
    print(f"{args.scene} {args.width}x{args.height} spp={args.spp}, "
          f"{args.passes} passes:")
    print(f"  re-seeded pass: {t_seeded*1e3:8.2f} ms  "
          f"({px_s/t_seeded/1e6:.0f} Mpx-samples/s)")
    print(f"  cached pass:    {t_cached*1e3:8.2f} ms  "
          f"({px_s/t_cached/1e6:.0f} Mpx-samples/s)  "
          f"[{t_seeded/t_cached:.2f}x]")


if __name__ == "__main__":
    main()
