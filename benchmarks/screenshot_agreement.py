#!/usr/bin/env python
"""Converged full-resolution agreement vs the reference's own screenshots
(VERDICT r04 directive #2 — the BASELINE north-star "image agreement"
line).

The reference ships four golden images (assets/screenshot_{0..3}.png,
1280x960, README.md:25-29: 0-1 are scene_0, 2 is scene_1, 3 is scene_2),
each taken in-app at an UNKNOWN camera pose after free WASD/mouse
movement (src/main.c:520-574). For each one this benchmark:

  1. recovers the pose (coarse_pose_search thumbnail tournament + the
     two-stage Adam refinement of apps/pose_recovery.py — the machinery
     ground-truth-validated by tests/test_pose_search.py),
  2. renders a CONVERGED 1280x960 frame at the recovered pose on
     hardware (Pallas megakernel, full reference physics, 2048^2 skybox,
     point-sampled pixel centers — the reference accumulates fixed pixel
     centers, src/main.c:293-296, so its converged mean has no spatial
     AA beyond the residual low-res warmup passes),
  3. reports full-res MAE + pixel correlation vs the raw screenshot
     (row-flipped: the reference PNG writer flips on save,
     src/main.c:672).

Writes renders/screenshot_<i>_recovered.png + a JSON line per row.

Usage: python benchmarks/screenshot_agreement.py [--only 0,1,2,3]
           [--spp 192] [--steps 150] [--refine-steps 40]
"""

import argparse
import dataclasses
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

SHOTS = {  # screenshot index -> scene file (SURVEY.md §4)
    0: "scene_0",
    1: "scene_0",
    2: "scene_1",
    3: "scene_2",
}
W, H = 1280, 960


def recover(scene, tgt_small, cubemap, args, mesh):
    """pose_recovery.py's flow: coarse tournament -> Adam -> fine-tune."""
    import jax
    import jax.numpy as jnp

    from ray_tracing_tpu import Camera, RenderConfig
    from ray_tracing_tpu.diff.inverse import coarse_pose_search, fit

    cfg = RenderConfig(env_filter="bilinear", bounces=3, shadow_samples=1)
    base = Camera.default()
    cands, scores = coarse_pose_search(
        scene, tgt_small, base_camera=base, config=cfg, cubemap=cubemap,
    )
    print(f"  coarse top MSEs: {[round(s, 4) for s in scores]}",
          file=sys.stderr, flush=True)
    starts = [base] + [
        dataclasses.replace(base, pos=jnp.asarray(p), front=jnp.asarray(f))
        for p, f in cands
    ]
    refined = []
    for k, st in enumerate(starts):
        _, rc, ls = fit(
            scene, st, jnp.asarray(tgt_small), mesh,
            scene_fields=(), camera_fields=("pos", "front"),
            steps=args.refine_steps, lr=args.lr, spp=args.fit_spp,
            config=cfg, cubemap=cubemap,
        )
        refined.append((ls[-1], rc))
    start = min(refined, key=lambda x: x[0])[1]
    _, rec, losses = fit(
        scene, start, jnp.asarray(tgt_small), mesh,
        scene_fields=(), camera_fields=("pos", "front"),
        steps=args.steps, lr=args.lr, spp=args.fit_spp,
        config=cfg, cubemap=cubemap,
    )
    _, rec, losses2 = fit(
        scene, rec, jnp.asarray(tgt_small), mesh,
        scene_fields=(), camera_fields=("pos", "front"),
        steps=max(args.steps // 2, 20), lr=args.lr / 5, spp=args.fit_spp * 4,
        config=cfg, cubemap=cubemap,
    )
    print(f"  fit loss {losses[0]:.5f} -> {losses2[-1]:.5f}",
          file=sys.stderr, flush=True)
    return rec


def local_polish(scene, raw, rec, cubemap, args, mesh, rounds=2):
    """Stage-2 polish: POSITION gradients are parallax-weak at thumbnail
    resolution (measured, tests/test_pose_search.py docstring), so the
    Adam stage converges look direction but can stall on distance/height.
    Each round brute-forces a local position grid around the fitted pose
    at fixed front (one vmapped jit), then refits pos+front at the fit
    resolution and again at 320x240 where parallax signal is strong."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ray_tracing_tpu import RenderConfig
    from ray_tracing_tpu.diff.inverse import fit
    from ray_tracing_tpu.render.integrator import render_image

    cfg = RenderConfig(env_filter="bilinear", bounces=3, shadow_samples=1)

    def tgt_at(w, h):
        return np.asarray(
            Image.fromarray((raw * 255).astype(np.uint8)).resize((w, h)),
            np.float32,
        )[::-1] / 255.0

    t96 = jnp.asarray(tgt_at(96, 72))

    @jax.jit
    def score(poss, fronts):
        def one(p, f):
            cam = dc.replace(rec, pos=p, front=f)
            img = render_image(scene, cam, 96, 72, jax.random.key(5), spp=2,
                               config=cfg, cubemap=cubemap)
            return jnp.mean((img - t96) ** 2)

        return jax.vmap(one)(poss, fronts)

    for rnd in range(rounds):
        base_pos = np.asarray(rec.pos, np.float32)
        front = np.asarray(rec.front, np.float32)
        f = front / (np.linalg.norm(front) + 1e-9)
        deltas = [np.zeros(3, np.float32)]
        for ax in range(3):
            for s in (1.0, -1.0):
                for m in (0.5, 1.2, 2.4):
                    d = np.zeros(3, np.float32)
                    d[ax] = s * m
                    deltas.append(d)
        for k in (0.6, 1.4, 2.8, -0.6, -1.4, -2.8):
            deltas.append((f * k).astype(np.float32))
        cand = np.stack([base_pos + d for d in deltas])
        sc = np.asarray(score(
            jnp.asarray(cand), jnp.broadcast_to(front, cand.shape)))
        best = int(np.argmin(sc))
        print(f"  polish round {rnd}: grid best mse {sc[best]:.5f} "
              f"(center {sc[0]:.5f}) at delta {np.round(cand[best]-base_pos,2)}",
              file=sys.stderr, flush=True)
        rec = dc.replace(rec, pos=jnp.asarray(cand[best]))
        _, rec, _ = fit(
            scene, rec, jnp.asarray(tgt_at(args.fit_width, args.fit_height)),
            mesh, scene_fields=(), camera_fields=("pos", "front"),
            steps=60, lr=args.lr / 2, spp=4, config=cfg, cubemap=cubemap,
        )
        _, rec, ls = fit(
            scene, rec, jnp.asarray(tgt_at(320, 240)), mesh,
            scene_fields=(), camera_fields=("pos", "front"),
            steps=50, lr=args.lr / 4, spp=2, config=cfg, cubemap=cubemap,
        )
        print(f"  polish round {rnd}: 320x240 loss -> {ls[-1]:.5f}",
              file=sys.stderr, flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="0,1,2,3")
    ap.add_argument("--polish", action="store_true",
                    help="stage-2 local position-grid polish + 320x240 refit")
    ap.add_argument("--spp", type=int, default=192,
                    help="converged full-res samples")
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--refine-steps", type=int, default=40)
    ap.add_argument("--fit-spp", type=int, default=4)
    ap.add_argument("--lr", type=float, default=6e-3)
    ap.add_argument("--fit-width", type=int, default=160)
    ap.add_argument("--fit-height", type=int, default=120)
    ap.add_argument("--assets", default="/root/reference/assets")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ray_tracing_tpu import RenderConfig
    from ray_tracing_tpu.io.image import load_cubemap, save_png
    from ray_tracing_tpu.kernels.megakernel import render_image_pallas
    from ray_tracing_tpu.parallel.mesh import make_mesh
    from ray_tracing_tpu.render.integrator import render_image
    from ray_tracing_tpu.scene.parser import parse_scene_file

    cubemap = load_cubemap(args.assets)
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    on_tpu = jax.default_backend() != "cpu"
    rows = []

    for idx in [int(x) for x in args.only.split(",")]:
        scene_name = SHOTS[idx]
        print(f"screenshot_{idx} ({scene_name}):", file=sys.stderr, flush=True)
        scene = parse_scene_file(f"/root/reference/{scene_name}.txt")
        raw = np.asarray(
            Image.open(f"{args.assets}/screenshot_{idx}.png").convert("RGB"),
            np.float32,
        ) / 255.0
        assert raw.shape == (H, W, 3), raw.shape
        tgt = raw[::-1].copy()  # undo the writer's vertical flip
        tgt_small = np.asarray(
            Image.fromarray((raw * 255).astype(np.uint8))
            .resize((args.fit_width, args.fit_height)),
            np.float32,
        )[::-1] / 255.0

        rec = recover(scene, tgt_small, cubemap, args, mesh)
        if args.polish:
            rec = local_polish(scene, raw, rec, cubemap, args, mesh)
        pos = np.asarray(rec.pos).round(4).tolist()
        front = np.asarray(rec.front).round(4).tolist()
        print(f"  pos {pos} front {front}", file=sys.stderr, flush=True)

        # converged full-res render at the recovered pose, full reference
        # physics (10 bounces, 3 shadow rays, nearest sky)
        cfg = RenderConfig()
        if on_tpu:
            chunk = 32  # spp per jit call (keeps device time per dispatch sane)
            acc = np.zeros((H, W, 3), np.float64)
            done = 0
            cache = None
            while done < args.spp:
                img, cache = render_image_pallas(
                    scene, rec, W, H, 7000 + idx * 1000 + done, spp=chunk,
                    config=cfg, cubemap=cubemap, sky_cache=cache,
                    return_sky_cache=True,
                )
                acc += np.asarray(img, np.float64) * chunk
                done += chunk
            conv = (acc / done).astype(np.float32)
        else:
            conv = np.asarray(render_image(
                scene, rec, 320, 240, jax.random.key(idx), spp=8,
                config=cfg, cubemap=cubemap,
            ))
            tgt = np.asarray(
                Image.fromarray((raw * 255).astype(np.uint8)).resize((320, 240)),
                np.float32,
            )[::-1] / 255.0

        mae = float(np.abs(conv - tgt).mean())
        corr = float(np.corrcoef(conv.ravel(), tgt.ravel())[0, 1])
        print(f"  FULL-RES ({conv.shape[1]}x{conv.shape[0]}) MAE {mae:.4f} "
              f"corr {corr:.3f}", flush=True)
        save_png(conv, f"renders/screenshot_{idx}_recovered.png")
        rows.append({"shot": idx, "scene": scene_name, "pos": pos,
                     "front": front, "mae": round(mae, 4),
                     "corr": round(corr, 4), "spp": args.spp})

    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
