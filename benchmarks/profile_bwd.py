#!/usr/bin/env python
"""Capture a jax.profiler device trace of the bench fwd+bwd step and print
an op-level time breakdown (round-4 backward hunt).

Usage:
  python benchmarks/profile_bwd.py [--mode grad|fwd] [--spp 8] [--dir /tmp/rtt_prof]

Parsing: the xplane protobuf is summarized with tensorboard_plugin_profile
when available; otherwise the raw trace dir is left for offline inspection.
"""
import argparse
import glob
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from ray_tracing_tpu import Camera, RenderConfig
from ray_tracing_tpu.io.image import load_cubemap
from ray_tracing_tpu.kernels.megakernel import render_image_pallas
from ray_tracing_tpu.scene.parser import parse_scene_file

WIDTH, HEIGHT = 1920, 1080


def summarize(logdir):
    """Best-effort xplane -> per-op device-time table."""
    planes = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                              recursive=True))
    if not planes:
        print("no xplane.pb captured (backend may not support device "
              "tracing over the tunnel)", file=sys.stderr)
        return
    path = planes[-1]
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception as e:
        print(f"xplane parser unavailable ({e}); trace left at {path}",
              file=sys.stderr)
        return
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        # accumulate event durations by event-metadata name per plane
        totals = {}
        for line in plane.lines:
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                totals[name] = totals.get(name, 0) + ev.duration_ps
        if not totals:
            continue
        print(f"== plane: {plane.name} ==")
        top = sorted(totals.items(), key=lambda kv: -kv[1])[:25]
        whole = sum(totals.values())
        for name, ps in top:
            print(f"  {ps / 1e9:10.3f} ms  {100 * ps / whole:5.1f}%  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="grad", choices=["grad", "fwd"])
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--dir", default="/tmp/rtt_prof")
    args = ap.parse_args()

    scene = parse_scene_file("/root/reference/scene_2.txt")
    camera = Camera.default()
    config = RenderConfig()
    skybox = load_cubemap()

    def loss(scene, seed):
        return jnp.sum(render_image_pallas(
            scene, camera, WIDTH, HEIGHT, seed, spp=args.spp,
            config=config, cubemap=skybox))

    f = jax.jit(jax.grad(loss) if args.mode == "grad" else loss)
    jax.block_until_ready(f(scene, 1))  # compile + warm OUTSIDE the trace
    with jax.profiler.trace(args.dir):
        jax.block_until_ready(f(scene, 2))
        jax.block_until_ready(f(scene, 3))
    print(f"trace -> {args.dir}", file=sys.stderr)
    summarize(args.dir)


if __name__ == "__main__":
    main()
