#!/usr/bin/env python
"""Time scene_2 1080p fwd+bwd (spp=8, grads to all scene params) for the
ray_tracing_tpu package at an ARBITRARY git worktree, with the CURRENT
marginal-timing methodology inlined (so every commit is measured the same
way regardless of what its own utils/timing.py looked like).

Usage: python benchmarks/bisect_commit.py /path/to/worktree [label]

This is the round-4 regression hunt (VERDICT weak #1): BENCH_r03 halved vs
r02, variants (fetch/replay/nosparse) all regressed equally, so the culprit
is in the shared kernel path — or the old numbers were artifacts. Timing a
known-good commit with today's methodology distinguishes the two.
"""
import os
import sys
import time

wt = os.path.abspath(sys.argv[1])
label = sys.argv[2] if len(sys.argv) > 2 else os.path.basename(wt)
assert os.path.isdir(os.path.join(wt, "ray_tracing_tpu")), wt
sys.path.insert(0, wt)

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", f"/tmp/jax_cache_rtt_bisect_{os.getuid()}"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

WIDTH, HEIGHT, SPP = 1920, 1080, 8


def materialize(out):
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel"):
            total += float(jax.device_get(jnp.ravel(leaf)[0]))
        else:
            total += float(leaf)
    return total


def timed_marginal(fn, make_args, k=1, k1=1, repeats=2):
    seq = [0]

    def window(n):
        args = []
        for _ in range(n):
            seq[0] += 1
            args.append(make_args(seq[0]))
        t0 = time.perf_counter()
        outs = [fn(*a) for a in args]
        for o in outs:
            jax.block_until_ready(o)
        for o in outs:
            materialize(o)
        return time.perf_counter() - t0

    t_small = min(window(k1) for _ in range(repeats))
    t_big = min(window(k1 + k) for _ in range(repeats))
    return (t_big - t_small) / k


def main():
    from ray_tracing_tpu import Camera, RenderConfig
    from ray_tracing_tpu.io.image import load_cubemap
    from ray_tracing_tpu.kernels.megakernel import render_image_pallas
    from ray_tracing_tpu.scene.parser import parse_scene_file

    scene = parse_scene_file("/root/reference/scene_2.txt")
    camera = Camera.default()
    config = RenderConfig()
    skybox = load_cubemap()

    def loss(scene, seed):
        img = render_image_pallas(
            scene, camera, WIDTH, HEIGHT, seed, spp=SPP,
            config=config, cubemap=skybox,
        )
        return jnp.sum(img)

    f = jax.jit(jax.grad(loss))
    t0 = time.perf_counter()
    jax.block_until_ready(f(scene, 999))  # compile + warm
    compile_s = time.perf_counter() - t0
    dt = timed_marginal(f, lambda i: (scene, 1000 + i)) / SPP
    rays = WIDTH * HEIGHT * 40
    print(
        f"BISECT {label}: fwd+bwd {dt * 1e3:7.2f} ms/sample "
        f"{rays / dt / 1e9:6.2f} Grays/s (compile {compile_s:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
