#!/usr/bin/env python
"""Final refinement stage for screenshot agreement: resume from the
poses benchmarks/screenshot_agreement.py recovered (pass them via
--poses JSON), fit pos+front at 640x480 (parallax and silhouette
gradients are strongest near full resolution), then re-render the
converged 1280x960 frame and re-measure MAE/correlation."""

import argparse
import dataclasses
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from screenshot_agreement import SHOTS, W, H  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", required=True,
                    help="JSON from screenshot_agreement.py (the final line)")
    ap.add_argument("--only", default="0,1,2,3")
    ap.add_argument("--spp", type=int, default=192)
    ap.add_argument("--assets", default="/root/reference/assets")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ray_tracing_tpu import Camera, RenderConfig
    from ray_tracing_tpu.diff.inverse import fit
    from ray_tracing_tpu.io.image import load_cubemap, save_png
    from ray_tracing_tpu.kernels.megakernel import render_image_pallas
    from ray_tracing_tpu.parallel.mesh import make_mesh
    from ray_tracing_tpu.scene.parser import parse_scene_file

    rows_in = {r["shot"]: r for r in json.load(open(args.poses))["rows"]}
    cubemap = load_cubemap(args.assets)
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    cfg_fit = RenderConfig(env_filter="bilinear", bounces=3, shadow_samples=1)
    rows = []

    for idx in [int(x) for x in args.only.split(",")]:
        scene = parse_scene_file(f"/root/reference/{SHOTS[idx]}.txt")
        raw = np.asarray(
            Image.open(f"{args.assets}/screenshot_{idx}.png").convert("RGB"),
            np.float32) / 255.0
        r = rows_in[idx]
        rec = dataclasses.replace(
            Camera.default(),
            pos=jnp.asarray(r["pos"], jnp.float32),
            front=jnp.asarray(r["front"], jnp.float32))

        t640 = np.asarray(
            Image.fromarray((raw * 255).astype(np.uint8)).resize((640, 480)),
            np.float32)[::-1] / 255.0
        _, rec, ls = fit(
            scene, rec, jnp.asarray(t640), mesh,
            scene_fields=(), camera_fields=("pos", "front"),
            steps=50, lr=1.5e-3, spp=2, config=cfg_fit, cubemap=cubemap)
        print(f"shot {idx}: 640x480 loss {ls[0]:.5f} -> {ls[-1]:.5f}",
              file=sys.stderr, flush=True)

        cfg = RenderConfig()
        chunk, done, acc, cache = 32, 0, np.zeros((H, W, 3), np.float64), None
        while done < args.spp:
            img, cache = render_image_pallas(
                scene, rec, W, H, 9000 + idx * 1000 + done, spp=chunk,
                config=cfg, cubemap=cubemap, sky_cache=cache,
                return_sky_cache=True)
            acc += np.asarray(img, np.float64) * chunk
            done += chunk
        conv = (acc / done).astype(np.float32)
        tgt = raw[::-1].copy()
        mae = float(np.abs(conv - tgt).mean())
        corr = float(np.corrcoef(conv.ravel(), tgt.ravel())[0, 1])
        print(f"shot {idx}: FULL-RES MAE {mae:.4f} corr {corr:.3f}", flush=True)
        save_png(conv, f"/root/repo/renders/screenshot_{idx}_recovered.png")
        rows.append({"shot": idx, "scene": SHOTS[idx],
                     "pos": np.asarray(rec.pos).round(4).tolist(),
                     "front": np.asarray(rec.front).round(4).tolist(),
                     "mae": round(mae, 4), "corr": round(corr, 4),
                     "spp": args.spp})
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
