#!/usr/bin/env python
"""Full benchmark matrix over the BASELINE.json configs (single chip).

Writes a markdown table to stdout (and BENCH_NOTES.md with --write).
bench.py remains the driver's one-line headline; this is the detailed view.

Ray accounting = reference cost model: bounces x (1 + shadow_samples)
closest-hit traces per pixel-sample (src/main.c:156,189).
"""

import argparse
import dataclasses
import sys

import jax
import jax.numpy as jnp

from ray_tracing_tpu import Camera, RenderConfig
from ray_tracing_tpu.io.image import load_cubemap
from ray_tracing_tpu.kernels.megakernel import render_image_pallas
from ray_tracing_tpu.render.integrator import render_image
from ray_tracing_tpu.scene.parser import parse_scene_file
from ray_tracing_tpu.utils.profiling import rays_per_frame

REF = "/root/reference"


def timeit(fn, scene, *, n):
    """Marginal per-call time / n samples (utils/timing.py): distinct
    seeds per call + host materialization — immune to tunnel-side request
    caching and to a non-blocking block_until_ready."""
    from ray_tracing_tpu.utils.timing import timed_per_sample

    return timed_per_sample(fn, scene, n=n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true", help="write BENCH_NOTES.md")
    ap.add_argument("--quick", action="store_true", help="fewer samples")
    args = ap.parse_args()

    cam = Camera.default()
    cubemap = load_cubemap()
    full = RenderConfig()  # 10 bounces, 3 shadow rays
    rows = []

    # (label, scene, W, H, spp, config)  — mirrors BASELINE.json configs
    cases = [
        ("cfg1: scene_0 256x256 1spp 1-bounce", "scene_0", 256, 256, 8,
         RenderConfig(bounces=1, shadow_samples=3)),
        ("cfg2: scene_0 512x512 4spp 2-bounce", "scene_0", 512, 512, 8,
         RenderConfig(bounces=2, shadow_samples=3)),
        ("cfg3: scene_1 1024x1024 16spp 4-bounce", "scene_1", 1024, 1024, 16,
         RenderConfig(bounces=4, shadow_samples=3)),
        ("scene_2 1920x1080 full physics", "scene_2", 1920, 1080,
         8 if args.quick else 32, full),
        # pixel-jitter AA defeats the sparse sky cache's index-reuse
        # premise (config.py pixel_jitter note) — this row measures the
        # real cost an AA user pays on the skybox workload
        ("scene_2 1920x1080 full + pixel-jitter AA", "scene_2", 1920, 1080,
         8 if args.quick else 32, full.replace(pixel_jitter=True)),
        ("scene_0 1920x1080 full physics", "scene_0", 1920, 1080,
         4 if args.quick else 16, full),
        # A/B: the exact full-scan shadow trace (emissive=None) vs the
        # default single-light occlusion path the row above runs
        ("scene_0 1920x1080 full, exact shadow scan (A/B)", "scene_0",
         1920, 1080, 4 if args.quick else 16, full,
         lambda s: dataclasses.replace(s, emissive=None)),
    ]

    for case in cases:
        label, sname, W, H, spp, cfg = case[:6]
        scene = parse_scene_file(f"{REF}/{sname}.txt")
        if len(case) == 7:
            scene = case[6](scene)
        rays = rays_per_frame(W, H, 1, cfg)

        def fwd_pallas(s, seed):
            return jnp.sum(render_image_pallas(
                s, cam, W, H, seed, spp=spp, config=cfg, cubemap=cubemap))

        def fwd_xla(s, seed):
            return jnp.sum(render_image(
                s, cam, W, H, jax.random.key(seed), spp=spp, config=cfg,
                cubemap=cubemap))

        def bwd_pallas(s, seed):
            return jax.grad(lambda q: jnp.sum(render_image_pallas(
                q, cam, W, H, seed, spp=max(spp // 4, 1), config=cfg,
                cubemap=cubemap)))(s)

        tp = timeit(jax.jit(fwd_pallas), scene, n=spp)
        tx = timeit(jax.jit(fwd_xla), scene, n=spp)
        tb = timeit(jax.jit(bwd_pallas), scene, n=max(spp // 4, 1))
        rows.append(
            f"| {label} | {tp * 1e3:.2f} | {rays / tp / 1e9:.2f} | "
            f"{tx * 1e3:.2f} | {rays / tx / 1e9:.2f} | "
            f"{tb * 1e3:.2f} | {rays / tb / 1e9:.2f} |"
        )
        print(rows[-1], file=sys.stderr)

    dev = jax.devices()[0]
    out = [
        f"# BENCH NOTES — measured on {dev.device_kind} (1 chip)",
        "",
        "Per-frame = one full sample of every pixel at the listed physics.",
        "Rays counted per the reference cost model (bounces x (1+shadow)).",
        "",
        "| case | pallas fwd ms | Grays/s | xla fwd ms | Grays/s | pallas fwd+bwd ms | Grays/s |",
        "|---|---|---|---|---|---|---|",
        *rows,
        "",
        "Reference CPU baseline (same machine, gcc -O2, trace_ray only):",
        "scene_2 9.08 Mrays/s single-thread; x32 ideal threads = 0.29 Grays/s.",
    ]
    text = "\n".join(out)
    print(text)
    if args.write:
        # replace only the headline matrix (everything before the first
        # "## " section) — BENCH_NOTES.md accumulates curated sections
        # (sparse sky, scaling, config 5, replay bwd) below it
        try:
            with open("BENCH_NOTES.md") as f:
                old = f.read()
            idx = old.find("\n## ")
            tail = old[idx:] if idx >= 0 else "\n"
        except OSError:
            tail = "\n"
        with open("BENCH_NOTES.md", "w") as f:
            f.write(text + "\n" + tail)


if __name__ == "__main__":
    main()
