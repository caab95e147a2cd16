#!/usr/bin/env python
"""Measure sky-lookup statistics per scene: miss fraction, per-sample
fresh-texel fraction (vs the sample-0 cache), and fresh 128-px block count
— the numbers that decide whether pixel-exact compaction can beat the
full-gather fallback arm (round-5 backward attack; the scene_0 profile
shows the fallback gather is 14.8 ms/sample, ~30% of fwd+bwd time).

Usage: python benchmarks/sky_stats.py [--jitter] [--spp 4] [--scenes 0,2]
"""
import argparse
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from ray_tracing_tpu import Camera, RenderConfig
from ray_tracing_tpu.io.image import load_cubemap
from ray_tracing_tpu.kernels.megakernel import default_tiles, render_tiles_pallas
from ray_tracing_tpu.ops.cubemap import SPARSE_BLOCK, texel_flat_index
from ray_tracing_tpu.ops.vec import Vec3
from ray_tracing_tpu.scene.parser import parse_scene_file

WIDTH, HEIGHT = 1920, 1080


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--jitter", action="store_true")
    ap.add_argument("--scenes", default="0,1,2")
    args = ap.parse_args()
    cubemap = load_cubemap()

    for si in args.scenes.split(","):
        name = f"scene_{si}"
        scene = parse_scene_file(f"/root/reference/{name}.txt")
        camera = Camera.default()
        config = RenderConfig()
        if args.jitter:
            config = config.replace(pixel_jitter=True)
        th, tw = default_tiles(scene, config)

        @jax.jit
        def plane(seed):
            t = render_tiles_pallas(
                scene, camera, WIDTH, HEIGHT, seed, config, th, tw
            )
            flat = texel_flat_index(cubemap, Vec3(t["sx"], t["sy"], t["sz"]))
            return flat, t["miss"] > 0.5

        flat0, miss0 = jax.block_until_ready(plane(jnp.int32(7919)))
        print(f"{name}: miss0={float(jnp.mean(miss0)):.3f}  (tile {th}x{tw}, "
              f"jitter={args.jitter})", flush=True)

        @jax.jit
        def fresh_stats(seed, flat0, miss0):
            flat, miss = plane(seed)
            fresh = miss & ~(miss0 & (flat == flat0))
            nb = fresh.size // SPARSE_BLOCK
            fb = jnp.any(fresh.reshape(nb, SPARSE_BLOCK), axis=1)
            return jnp.mean(miss), jnp.mean(fresh), jnp.sum(fb), nb

        for s in range(1, args.spp):
            m, f, b, nb = jax.block_until_ready(
                fresh_stats(jnp.int32(7919 + s), flat0, miss0)
            )
            print(f"  sample {s}: miss={float(m):.3f} fresh_px={float(f):.3f} "
                  f"fresh_blocks={int(b)}/{int(nb)}", flush=True)


if __name__ == "__main__":
    main()
