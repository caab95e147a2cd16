#!/usr/bin/env python
"""Large-scene (>UNROLL_LIMIT) hardware rows + scan-tier tile sweep
(VERDICT r04 directive #4).

The reference supports MAX_OBJECTS=1024 (/root/reference/src/scene.h:3)
but ships no scene bigger than 9 objects; the megakernel's fori-trace
tier (kernels/megakernel.py, scene.num_objects > UNROLL_LIMIT) is
correctness-proven on TPU (tests/test_megakernel.py 201-object train)
yet its cost was never measured and its tile defaults kept round-2
shapes. This benchmark renders synthetic N-object scenes (uniform
sphere/cube mix + ONE emissive light so NEE and the shadow path run) at
1920x1080 full reference physics + the real 2048^2 skybox and reports
fwd and fwd+bwd ms/sample and Grays/s per tile shape, with the
marginal-window methodology (utils/timing.py).

Usage: python benchmarks/large_scene.py [--n 201,1024] [--spp 2]
                                        [--shapes default,8x128,...]
"""

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from ray_tracing_tpu import Camera, RenderConfig
from ray_tracing_tpu.io.image import load_cubemap
from ray_tracing_tpu.kernels.megakernel import default_tiles, render_image_pallas
from ray_tracing_tpu.scene.types import ObjectSpec, Scene
from ray_tracing_tpu.utils import flops as F
from ray_tracing_tpu.utils.timing import timed_per_sample

WIDTH, HEIGHT = 1920, 1080


def make_scene(n: int) -> Scene:
    """n random objects in a 30^3 box + one emissive sphere (the light) —
    the shape of workload MAX_OBJECTS exists for (src/scene.h:3)."""
    rng = np.random.default_rng(n)
    objs = []
    for i in range(n - 1):
        if i % 3 == 0:
            objs.append(ObjectSpec(
                kind="cube", p0=tuple(rng.uniform(-15, 15, 3)),
                p1=tuple(rng.uniform(0.3, 1.2, 3)),
                albedo=tuple(rng.uniform(0.2, 1, 3)),
                roughness=float(rng.uniform()),
            ))
        else:
            objs.append(ObjectSpec(
                kind="sphere", p0=tuple(rng.uniform(-15, 15, 3)),
                p1=(float(rng.uniform(0.2, 0.8)),) * 3,
                albedo=tuple(rng.uniform(0.2, 1, 3)),
                roughness=float(rng.uniform()),
                reflectance=float(rng.uniform()),
                metallic=float(rng.integers(0, 2)),
            ))
    objs.append(ObjectSpec(
        kind="sphere", p0=(0.0, 20.0, 0.0), p1=(3.0,) * 3,
        emission_power=5.0, emission_color=(1.0, 0.9, 0.8),
    ))
    return Scene.from_objects(objs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", default="201,1024")
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--shapes", default="default,8x128,8x256,16x128,16x256")
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    cam = Camera.default()
    config = RenderConfig()
    skybox = load_cubemap()
    spp = args.spp
    rays = F.rays_per_sample(WIDTH, HEIGHT, config)

    rows = []
    for n in [int(x) for x in args.n.split(",")]:
        scene = make_scene(n)
        assert scene.num_objects == n, (scene.num_objects, n)
        default = default_tiles(scene, config)
        for shape in args.shapes.split(","):
            th, tw = default if shape == "default" else map(int, shape.split("x"))

            def fwd(scene, seed):
                return jnp.sum(render_image_pallas(
                    scene, cam, WIDTH, HEIGHT, seed, spp=spp, config=config,
                    cubemap=skybox, tile_h=th, tile_w=tw))

            def bwd(scene, seed):
                def loss(scene):
                    return jnp.sum(render_image_pallas(
                        scene, cam, WIDTH, HEIGHT, seed, spp=spp,
                        config=config, cubemap=skybox, tile_h=th, tile_w=tw))
                return jax.grad(loss)(scene)

            for case, fn in [("fwd", jax.jit(fwd))] + (
                [] if args.fwd_only else [("fwd+bwd", jax.jit(bwd))]
            ):
                label = f"N={n} {case} {th}x{tw}" + (
                    " (default)" if (th, tw) == tuple(default) else "")
                try:
                    t = timed_per_sample(fn, scene, n=spp)
                except Exception as e:
                    print(f"{label:38s} FAILED: {type(e).__name__}: "
                          f"{str(e)[:120]}", flush=True)
                    rows.append({"n": n, "case": case, "tile": f"{th}x{tw}",
                                 "error": type(e).__name__})
                    continue
                grays = rays / t / 1e9
                print(f"{label:38s} {t*1e3:9.2f} ms/sample  {grays:7.3f} Grays/s",
                      flush=True)
                rows.append({"n": n, "case": case, "tile": f"{th}x{tw}",
                             "default": (th, tw) == tuple(default),
                             "ms_per_sample": round(t * 1e3, 2),
                             "grays_per_s": round(grays, 3)})
    print(json.dumps({"width": WIDTH, "height": HEIGHT, "spp": spp,
                      "rows": rows}))


if __name__ == "__main__":
    main()
