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

    # compile BOTH programs before any timed region (megakernel compiles
    # are minutes-slow; a first-call compile inside the window would
    # invert the comparison)
    s, cache0 = seeded(scene, jnp.int32(0))
    float(s)
    s, _ = cached(scene, jnp.int32(1), cache0)
    float(s)

    def window(thread_cache: bool, n_passes: int, seed0: int) -> float:
        """Wall time of n_passes viewer-like passes: distinct seeds per
        pass, LAST pass materialized (CLAUDE.md timing rules — a per-pass
        device_get costs ~29 ms over the tunnel and scales with window
        size, so it would NOT cancel in the marginal; the in-order device
        stream makes the last value prove the whole window ran)."""
        cache = cache0
        t0 = time.perf_counter()
        s = None
        for i in range(n_passes):
            seed = jnp.int32(seed0 + i)
            if thread_cache:
                s, cache = cached(scene, seed, cache)
            else:
                s, _ = seeded(scene, seed)
        jax.block_until_ready(s)
        float(s)
        return time.perf_counter() - t0

    def marginal(thread_cache: bool) -> float:
        """Marginal per-pass time: (k1+k)-pass window minus k1-pass
        window, so fixed per-window costs cancel (utils/timing.py
        methodology, expressed over host-driven pass loops)."""
        k1 = max(args.passes // 4, 2)
        t_small = window(thread_cache, k1, seed0=100)
        t_big = window(thread_cache, k1 + args.passes, seed0=1000)
        return (t_big - t_small) / args.passes

    t_seeded = marginal(False)
    t_cached = marginal(True)
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
