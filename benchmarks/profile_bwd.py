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


def summarize(logdir, top_n=40):
    """xplane -> per-op device-time table via the xprof capsule parser
    (tensorboard_plugin_profile's tensorflow proto import is broken in this
    image; xprof.convert.raw_to_tool_data wraps the same C++ converter)."""
    planes = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                              recursive=True))
    if not planes:
        print("no xplane.pb captured (backend may not support device "
              "tracing over the tunnel)", file=sys.stderr)
        return
    path = planes[-1]
    try:
        import json as _json

        from xprof.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [path], "framework_op_stats", {"tqx": "out:json;"}
        )
        tbl = _json.loads(data)
        rows = tbl["table"]["rows"]
        cols = [c["label"] for c in tbl["table"]["cols"]]
        i_name = cols.index("Operation")
        i_self = cols.index("Total self time (us)")
        i_dev = cols.index("Host/device")
        dev_rows = [
            (r["c"][i_self]["v"], r["c"][i_name]["v"])
            for r in rows
            if r["c"][i_dev]["v"] == "Device"
        ]
        dev_rows.sort(reverse=True)
        whole = sum(t for t, _ in dev_rows)
        print(f"== device self-time by op ({path}) ==")
        print(f"   total device time: {whole / 1e3:.3f} ms")
        for t, name in dev_rows[:top_n]:
            print(f"  {t / 1e3:10.3f} ms  {100 * t / whole:5.1f}%  {name[:140]}")
    except Exception as e:
        print(f"xplane parser unavailable ({e}); trace left at {path}",
              file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="grad", choices=["grad", "fwd"])
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--dir", default="/tmp/rtt_prof")
    ap.add_argument("--scene", default="/root/reference/scene_2.txt")
    args = ap.parse_args()

    scene = parse_scene_file(args.scene)
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
