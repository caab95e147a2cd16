#!/usr/bin/env python
"""Tile-shape sweep for the Pallas megakernel (VERDICT r2 directive #1b).

Forward and backward share ONE tile shape (the PRNG stream contract,
kernels/megakernel.py), so the only free perf knob is which shape both
use. default_tiles() picks a complexity-scaled shape that is known to
fit scoped VMEM; this sweep measures the alternatives on hardware so the
default stays measured, not guessed.

For each (scene, tile) it times fwd and fwd+bwd on the real workload
(1080p, full reference physics, 2048^2 skybox) with the marginal-window
methodology (utils/timing.py). Shapes whose residuals overflow VMEM
fail at compile time and are reported as OOM rows, not crashes.

Usage: python benchmarks/tile_sweep.py [--quick] [--scenes scene_2,scene_0]
                                       [--shapes 8x256,16x256,...]
"""

import argparse
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from ray_tracing_tpu import Camera, RenderConfig
from ray_tracing_tpu.io.image import load_cubemap
from ray_tracing_tpu.kernels.megakernel import default_tiles, render_image_pallas
from ray_tracing_tpu.scene.parser import parse_scene_file
from ray_tracing_tpu.utils.timing import timed_per_sample

WIDTH, HEIGHT = 1920, 1080
SHAPES = ["8x128", "8x256", "8x512", "16x128", "16x256", "16x512", "32x256"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--scenes", default="scene_2,scene_0")
    ap.add_argument("--shapes", default=",".join(SHAPES))
    args = ap.parse_args()

    spp_fwd = 8 if args.quick else 16
    spp_bwd = 4 if args.quick else 8
    cam = Camera.default()
    config = RenderConfig()
    skybox = load_cubemap()
    shapes = [tuple(map(int, s.split("x"))) for s in args.shapes.split(",")]

    rows = []
    for name in args.scenes.split(","):
        scene = parse_scene_file(f"/root/reference/{name}.txt")
        default = default_tiles(scene, config)

        for th, tw in shapes:
            def fwd(scene, seed):
                return jnp.sum(render_image_pallas(
                    scene, cam, WIDTH, HEIGHT, seed, spp=spp_fwd,
                    config=config, cubemap=skybox, tile_h=th, tile_w=tw))

            def loss(scene, seed):
                return jnp.sum(render_image_pallas(
                    scene, cam, WIDTH, HEIGHT, seed, spp=spp_bwd,
                    config=config, cubemap=skybox, tile_h=th, tile_w=tw))

            row = {"scene": name, "tile": f"{th}x{tw}",
                   "default": (th, tw) == default}
            try:
                row["fwd_ms"] = timed_per_sample(
                    jax.jit(fwd), scene, n=spp_fwd) * 1e3
                row["fwdbwd_ms"] = timed_per_sample(
                    jax.jit(jax.grad(loss)), scene, n=spp_bwd) * 1e3
            except Exception as e:  # VMEM overflow etc. — report, keep
                # going (a shape whose forward fits but whose backward
                # residuals overflow lands here with fwd_ms already set)
                row["error"] = type(e).__name__
                msg = (str(e).splitlines() or ["?"])[0][:100]
                print(f"  {name} {th}x{tw}: {msg}", file=sys.stderr)
            rows.append(row)
            print(f"  {name} {th}x{tw}"
                  + (" (default)" if row["default"] else "")
                  + (f": fwd {row.get('fwd_ms', float('nan')):.2f} ms, "
                     f"fwd+bwd {row.get('fwdbwd_ms', float('nan')):.2f} "
                     "ms/sample"
                     if "error" not in row else ": OOM/compile-fail"),
                  file=sys.stderr)

    print("\n| scene | tile | fwd ms/sample | fwd+bwd ms/sample |")
    print("|---|---|---|---|")
    for r in rows:
        mark = " *" if r["default"] else ""
        if "error" in r:
            fwd = f"{r['fwd_ms']:.2f}" if "fwd_ms" in r else r["error"]
            print(f"| {r['scene']} | {r['tile']}{mark} | {fwd} | "
                  f"{r['error']} |")
        else:
            print(f"| {r['scene']} | {r['tile']}{mark} | "
                  f"{r['fwd_ms']:.2f} | {r['fwdbwd_ms']:.2f} |")
    print(json.dumps({"rows": [
        {k: (round(v, 3) if isinstance(v, float) else v) for k, v in r.items()}
        for r in rows]}))


if __name__ == "__main__":
    main()
