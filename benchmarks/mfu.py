#!/usr/bin/env python
"""MFU / roofline report (VERDICT r2 directive #1).

For the two reference workloads (scene_2 mirrors, scene_0 NEE room, both
1920x1080 full reference physics — /root/reference/src/main.c:131-272):

  1. count the kernel's f32 FLOPs with XLA's own cost analysis over the
     exact tile_physics / replay-vjp graphs (utils/flops.py),
  2. measure wall time with the one-jit spp-accumulation methodology
     (BENCH_NOTES.md), and
  3. divide by the *measured* VPU FMA peak of this chip (FMA-chain Pallas
     microbenchmark) => MFU%.

The path tracer is VPU-bound elementwise math (select/compare/fma +
rsqrt), so the VPU FMA peak is the correct light-speed ceiling; the MXU
peak is unreachable by non-matmul code by construction. Sky-gather and
compose work is excluded from the FLOP count (counted time includes it),
so every MFU% printed here is a *floor*.

Usage:  python benchmarks/mfu.py [--quick] [--profile DIR] [--write]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from ray_tracing_tpu import Camera, RenderConfig
from ray_tracing_tpu.io.image import load_cubemap
from ray_tracing_tpu.kernels.megakernel import render_image_pallas
from ray_tracing_tpu.ops.cubemap import constant_sky
from ray_tracing_tpu.scene.parser import parse_scene_file
from ray_tracing_tpu.utils import flops as F
from ray_tracing_tpu.utils.timing import timed_per_sample

WIDTH, HEIGHT = 1920, 1080


def cpu_ctx():
    try:
        return jax.default_device(jax.devices("cpu")[0])
    except Exception:
        import contextlib

        return contextlib.nullcontext()


def timed(fn, scene, *, n):
    """Marginal per-call time (utils/timing.py) / n samples. Seeds vary
    per call so no two dispatches are identical requests."""
    return timed_per_sample(fn, scene, n=n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--profile", default=None,
                    help="jax.profiler trace dir (one fwd+bwd step)")
    ap.add_argument("--scenes", default="scene_2,scene_0")
    args = ap.parse_args()

    spp_fwd = 8 if args.quick else 32
    spp_bwd = 4 if args.quick else 8
    cam = Camera.default()
    config = RenderConfig()
    skybox = load_cubemap()
    const = constant_sky((0.6, 0.7, 0.9))
    px = WIDTH * HEIGHT

    print("measuring VPU peak (FMA chains)...", file=sys.stderr)
    pk = F.measured_vpu_peak()
    peak, ratio = pk["flops_per_s"], pk["ratio"]
    if not 1.6 <= ratio <= 2.5:
        raise SystemExit(
            f"VPU peak self-check failed: t(2N)/t(N) = {ratio:.2f} (want ~2). "
            "The FMA loop was folded or the timing never saw the execution — "
            "refusing to report an MFU built on a bogus ceiling."
        )
    print(f"VPU peak (measured, f32 FMA): {peak/1e12:.2f} TFLOP/s "
          f"(iters-doubling ratio {ratio:.2f})")

    print("measuring MXU peak (bf16 matmul chains)...", file=sys.stderr)
    mxu_pk = F.measured_mxu_peak()
    mxu_peak, mxu_ratio = mxu_pk["flops_per_s"], mxu_pk["ratio"]
    if not 1.6 <= mxu_ratio <= 2.5:
        raise SystemExit(
            f"MXU peak self-check failed: second-difference ratio = "
            f"{mxu_ratio:.2f} (want ~2); refusing a bogus MXU ceiling."
        )
    print(f"MXU peak (measured, bf16 matmul): {mxu_peak/1e12:.1f} TFLOP/s "
          f"(iters-doubling ratio {mxu_ratio:.2f})")

    rows = []
    for name in args.scenes.split(","):
        scene = parse_scene_file(f"/root/reference/{name}.txt")

        with cpu_ctx():
            phys = F.physics_cost_per_pixel(scene, config)
            if config.bwd_mode == "fetch":
                bwd_vjp = F.fetch_vjp_cost_per_pixel(scene, config)
                # the one-hot fetch matmuls sit inside this vjp graph but
                # run on the MXU — excluded from the VPU roofline
                bwd_vpu = max(
                    0.0,
                    bwd_vjp["flops_per_px"]
                    - F.fetch_mxu_flops_per_pixel(scene, config),
                )
                # fetch: NO recording pass — winner indices are residuals
                # persisted by the forward (IndexRecordingTracer)
                rec_passes = 1
            else:
                bwd_vjp = F.replay_vjp_cost_per_pixel(scene, config)
                bwd_vpu = bwd_vjp["flops_per_px"]
                # replay: the bwd kernel re-runs the recording pass
                rec_passes = 2
        prng = F.prng_flops_per_pixel(config, scene.has_light)
        fwd_flops = phys["flops_per_px"] + prng
        # grad() runtime = rec_passes x fwd kernel + the bwd vjp (VPU part)
        fwdbwd_flops = rec_passes * fwd_flops + bwd_vpu

        def fwd(cubemap, spp):
            @jax.jit
            def f(scene, seed):
                return jnp.sum(render_image_pallas(
                    scene, cam, WIDTH, HEIGHT, seed, spp=spp, config=config,
                    cubemap=cubemap))
            return f

        def bwd(cubemap, spp):
            def loss(scene, seed):
                return jnp.sum(render_image_pallas(
                    scene, cam, WIDTH, HEIGHT, seed, spp=spp, config=config,
                    cubemap=cubemap))
            return jax.jit(jax.grad(loss))

        t_const = timed(fwd(const, spp_fwd), scene, n=spp_fwd)
        t_sky = timed(fwd(skybox, spp_fwd), scene, n=spp_fwd)
        bwd_f = bwd(skybox, spp_bwd)
        t_bwd = timed(bwd_f, scene, n=spp_bwd)

        if args.profile:
            # device-side tracing may be unsupported through the axon
            # tunnel — a failed capture must not kill the MFU report
            try:
                with jax.profiler.trace(args.profile):
                    jax.block_until_ready(bwd_f(scene, 2))
                print(f"profiler trace -> {args.profile}", file=sys.stderr)
            except Exception as e:
                print(f"profiler capture failed (non-fatal): {e}",
                      file=sys.stderr)

        def row(label, t, fl, mxu_fl=0.0):
            tf = fl * px / t / 1e12
            r = {
                "scene": name, "case": label, "ms_per_sample": t * 1e3,
                "flops_per_px": fl, "tflops": tf, "mfu_pct": 100 * tf * 1e12 / peak,
            }
            # second roofline line (VERDICT r04 #5): the one-hot fetch /
            # routing dots priced in native bf16 MXU passes (x6 for the
            # precision=HIGHEST lowering) against the MEASURED MXU peak —
            # says whether the fetch matmuls are free or load-bearing
            r["mxu_pct"] = 100 * (mxu_fl * px / t) / mxu_peak
            return r

        mxu6 = (F.fetch_mxu_flops_per_pixel(scene, config, passes=6)
                if config.bwd_mode == "fetch"
                else F.routing_mxu_flops_per_pixel(scene, config))
        rows.append(row("fwd const-sky", t_const, fwd_flops))
        rows.append(row("fwd skybox", t_sky, fwd_flops))
        rows.append(row("fwd+bwd skybox", t_bwd, fwdbwd_flops, mxu6))
        mxu = (F.fetch_mxu_flops_per_pixel(scene, config)
               if config.bwd_mode == "fetch"
               else F.routing_mxu_flops_per_pixel(scene, config))
        print(f"  {name}: physics {phys['flops_per_px']:.0f} flops/px "
              f"(+{phys['transcendentals_per_px']:.0f} transc, {prng:.0f} prng), "
              f"{config.bwd_mode}-vjp {bwd_vjp['flops_per_px']:.0f} flops/px, "
              f"routing {mxu:.0f} MXU flops/px",
              file=sys.stderr)

    print("\n| scene | case | ms/sample | flops/px | TFLOP/s | VPU MFU% | MXU util% |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['scene']} | {r['case']} | {r['ms_per_sample']:.2f} | "
              f"{r['flops_per_px']:.0f} | {r['tflops']:.2f} | {r['mfu_pct']:.1f} | "
              f"{r['mxu_pct']:.2f} |")
    print(json.dumps({"vpu_peak_tflops": round(peak / 1e12, 2),
                      "mxu_peak_tflops": round(mxu_peak / 1e12, 1), "rows": [
        {k: (round(v, 3) if isinstance(v, float) else v) for k, v in r.items()}
        for r in rows]}))


if __name__ == "__main__":
    main()
