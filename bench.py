#!/usr/bin/env python
"""Benchmark: Mrays/s/chip forward+backward on scene_2 (BASELINE.md target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

THE HEADLINE IS THE REFERENCE'S REAL WORKLOAD: scene_2 at 1920x1080 with
the 2048^2 JPEG skybox the reference always renders (src/main.c:500-508),
full reference physics (10 bounces, 3 shadow rays), forward + backward
through the Pallas megakernel with gradients w.r.t. every scene parameter.
Constant-sky (gather-free) numbers are reported inside the metric string
as secondary context, not as the headline.

Ray accounting matches the reference cost model (SURVEY.md §6 "work per
full-res frame"): every pixel-sample runs the fixed bounce loop of
`bounces * (1 primary + shadow_samples NEE)` closest-hit traces — the same
work the reference's pixel() dispatches per sample (src/main.c:156,189).

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is the reference's own trace_ray measured on this machine's CPU
(gcc -O2, scene_2: ~9.08 Mrays/s single-thread) scaled by its max thread
count 32 (src/main.c:46) => 290.6 Mrays/s, an *optimistic* CPU ceiling
that ignores shading/RNG/sync overhead the real program pays.

Timing method: N samples accumulated on-device inside one jit call
(per-call dispatch through the TPU tunnel costs ~40ms and would swamp
per-frame timing); the scalar reduction is the only host transfer. The
wall clock is read with utils/timing.timed_marginal — per-call marginal
difference with distinct seeds and host materialization, so client-side
request caching, a non-blocking block_until_ready, and fixed dispatch/
fetch overheads all cancel out of the reported number.
"""

import json
import os

# compile cache: configured by ray_tracing_tpu/__init__.py (per-uid AND
# per-host-fingerprint path — cross-machine AOT reuse SIGILLs); the package
# applies it via jax.config even though jax is imported first here.

import subprocess
import sys


def _probe_tpu(attempts: int = 3, timeout_s: int = 120) -> bool:
    """True iff the TPU backend initializes in a throwaway subprocess.

    The axon tunnel can hang *indefinitely* inside backend discovery
    (make_c_api_client) when the remote side is down — an in-process
    jax.devices() would wedge the whole benchmark with no output. Probe
    in a child under a timeout so this process never touches a dead
    tunnel. The child inherits the environment (sitecustomize must stay
    on PYTHONPATH for the axon backend to exist at all)."""
    code = "import jax; assert jax.devices()[0].platform == 'tpu'"
    for _ in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=timeout_s,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


if not _probe_tpu():
    # Emit the one contractual JSON line instead of hanging the driver.
    # value=0 is honest: no hardware measurement happened this run. The
    # last measured numbers live in BENCH_NOTES.md / BENCH_r02.json.
    print(
        json.dumps(
            {
                "metric": (
                    "Mrays/s/chip fwd+bwd scene_2 1920x1080 + 2048^2 skybox"
                    " — NOT MEASURED: TPU tunnel down (axon PJRT backend"
                    " init hangs; see BENCH_NOTES.md round 3). Last"
                    " hardware run: BENCH_r02.json 4391.2 Mrays/s"
                ),
                "value": 0.0,
                "unit": "Mrays/s",
                "vs_baseline": 0.0,
            }
        )
    )
    sys.exit(0)

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ray_tracing_tpu.utils.timing import timed_per_sample

REF_CPU_MRAYS_32T = 290.6  # see module docstring

WIDTH, HEIGHT = 1920, 1080
SPP_FWD = 32
SPP_BWD = 8


def main():
    from ray_tracing_tpu import Camera, RenderConfig
    from ray_tracing_tpu.io.image import load_cubemap
    from ray_tracing_tpu.kernels.megakernel import render_image_pallas
    from ray_tracing_tpu.ops.cubemap import constant_sky
    from ray_tracing_tpu.scene.parser import parse_scene_file

    from ray_tracing_tpu.kernels.megakernel import effective_bwd_mode

    scene = parse_scene_file("/root/reference/scene_2.txt")
    camera = Camera.default()
    config = RenderConfig()  # full reference physics: 10 bounces, 3 shadow rays
    skybox = load_cubemap()  # the real 2048^2 cubemap — the reference workload
    const = constant_sky((0.6, 0.7, 0.9))
    # the backward mode that will actually EXECUTE at this resolution/spp
    # (fetch silently falls back to replay past the HBM record budget — a
    # flip must be visible in the artifact, not inferred)
    bwd_mode = effective_bwd_mode(scene, config, WIDTH, HEIGHT, SPP_BWD)
    traces_per_sample = config.bounces * (1 + config.shadow_samples)
    rays_fwd = WIDTH * HEIGHT * traces_per_sample

    def timed(fn, scene, *, spp):
        # marginal timing with per-call distinct seeds + host materialization
        # (utils/timing.py): immune to client-side request caching, to a
        # non-blocking block_until_ready, and to fixed dispatch/fetch costs.
        return timed_per_sample(fn, scene, n=spp)

    def mrays(dt):
        return rays_fwd / dt / 1e6

    def fwd_fn(cubemap):
        @jax.jit
        def f(scene, seed):
            img = render_image_pallas(
                scene, camera, WIDTH, HEIGHT, seed, spp=SPP_FWD,
                config=config, cubemap=cubemap,
            )
            return jnp.sum(img)
        return f

    def bwd_fn(cubemap):
        def loss(scene, seed):
            img = render_image_pallas(
                scene, camera, WIDTH, HEIGHT, seed, spp=SPP_BWD,
                config=config, cubemap=cubemap,
            )
            return jnp.sum(img)
        return jax.jit(jax.grad(loss))

    # ---- headline: real skybox, fwd+bwd (cold sky cache every call) ----
    t_bwd = timed(bwd_fn(skybox), scene, spp=SPP_BWD)
    sky_bwd = mrays(t_bwd)
    t_fwd = timed(fwd_fn(skybox), scene, spp=SPP_FWD)
    sky_fwd = mrays(t_fwd)
    # ---- secondary: steady-state TRAINING throughput — fit() threads the
    # sparse sky cache across steps (diff/inverse sky_cache_mode), so in a
    # training loop every step after the first skips the ~27 ms cold
    # seeding gather. Same estimator, same gradients; only the sky-texel
    # fetch strategy differs (exact by construction).
    _, cache = render_image_pallas(
        scene, camera, WIDTH, HEIGHT, 0, spp=2, config=config,
        cubemap=skybox, return_sky_cache=True,
    )
    cache = jax.block_until_ready(cache)

    def bwd_cached(scene, seed):
        def loss(scene):
            img = render_image_pallas(
                scene, camera, WIDTH, HEIGHT, seed, spp=SPP_BWD,
                config=config, cubemap=skybox, sky_cache=cache,
            )
            return jnp.sum(img)
        return jax.grad(loss)(scene)

    t_bwd_ss = timed(jax.jit(bwd_cached), scene, spp=SPP_BWD)
    sky_bwd_ss = mrays(t_bwd_ss)
    # ---- secondary: gather-free constant sky (fwd only; its fwd+bwd is
    # measured in BENCH_NOTES.md — one fewer multi-minute compile here) ----
    t_const = timed(fwd_fn(const), scene, spp=SPP_FWD)
    const_fwd = mrays(t_const)

    # ---- MFU vs the measured VPU FMA peak (benchmarks/mfu.py is the full
    # report; this inlines its cost model so the headline carries its own
    # roofline). Never let MFU accounting break the headline measurement —
    # but ALWAYS say what happened: the metric string carries either the
    # MFU segment or an explicit "MFU n/a: <reason>" so driver artifacts
    # are self-explaining (a silent omission is indistinguishable from a
    # broken roofline; VERDICT r03 weak #2).
    try:
        import contextlib

        from ray_tracing_tpu.utils import flops as F

        try:
            cpu = jax.default_device(jax.devices("cpu")[0])
        except Exception:
            cpu = contextlib.nullcontext()
        with cpu:
            phys = F.physics_cost_per_pixel(scene, config)
            if bwd_mode == "fetch":
                bwd_vpu = max(
                    0.0,
                    F.fetch_vjp_cost_per_pixel(scene, config)["flops_per_px"]
                    - F.fetch_mxu_flops_per_pixel(scene, config),
                )
                rec_passes = 1  # fwd persists winner indices: no re-record
            else:
                bwd_vpu = F.replay_vjp_cost_per_pixel(scene, config)["flops_per_px"]
                rec_passes = 2
        fwd_flops = phys["flops_per_px"] + F.prng_flops_per_pixel(
            config, scene.has_light
        )
        fwdbwd_flops = rec_passes * fwd_flops + bwd_vpu
        # the peak microbenchmark's iters-doubling self-check can be tripped
        # by one tunnel noise spike — retry before declaring it unusable
        pk = None
        for _ in range(3):
            pk = F.measured_vpu_peak()
            if 1.6 <= pk["ratio"] <= 2.5:
                break
        if 1.6 <= pk["ratio"] <= 2.5:
            px = WIDTH * HEIGHT
            peak = pk["flops_per_s"]
            tf_fwd = fwd_flops * px / t_const / 1e12
            tf_bwd = fwdbwd_flops * px / t_bwd / 1e12
            # second roofline line (VERDICT r04 #5): MXU utilization of the
            # one-hot fetch dots (priced at 6 native bf16 passes for the
            # precision=HIGHEST lowering) vs the measured bf16 matmul peak
            try:
                mxu6 = (
                    F.fetch_mxu_flops_per_pixel(scene, config, passes=6)
                    if bwd_mode == "fetch"
                    else F.routing_mxu_flops_per_pixel(scene, config)
                )
                mpk = F.measured_mxu_peak()
                if 1.6 <= mpk["ratio"] <= 2.5:
                    mxu_seg = " / MXU %.1f TFLOP/s measured, fwd+bwd %.2f%%" % (
                        mpk["flops_per_s"] / 1e12,
                        100 * (mxu6 * px / t_bwd) / mpk["flops_per_s"],
                    )
                else:
                    mxu_seg = (" / MXU n/a: peak self-check ratio %.2f"
                               % mpk["ratio"])
            except Exception as e2:  # pragma: no cover - diagnostics only
                mxu_seg = (" / MXU n/a: %s" % e2)[:80]
            mfu = (
                "; VPU peak %.1f TFLOP/s measured, const-sky fwd %.2f TFLOP/s"
                " = %.0f%% MFU, fwd+bwd %.2f TFLOP/s = %.0f%% MFU%s"
                % (peak / 1e12, tf_fwd, 100 * tf_fwd * 1e12 / peak,
                   tf_bwd, 100 * tf_bwd * 1e12 / peak, mxu_seg)
            )
        else:
            mfu = (
                "; MFU n/a: VPU-peak iters-doubling self-check failed"
                " (t2N/tN=%.2f after 3 tries; peak not trustworthy)"
                % pk["ratio"]
            )
    except Exception as e:  # pragma: no cover - diagnostics only
        mfu = ("; MFU n/a: %s: %s" % (type(e).__name__, e))[:220]
        print(f"MFU accounting skipped: {e}", file=sys.stderr)

    # session environment fingerprint (VERDICT r04 #6): the artifact must
    # self-describe its tunnel session so a future reader can separate a
    # code win from a tunnel mood (cross-session absolutes are ±~40%).
    try:
        from ray_tracing_tpu.utils.timing import environment_fingerprint

        fp = environment_fingerprint()
        env_seg = "; env: dispatch %.0f ms/call, device_get %.0f ms/fetch" % (
            fp["dispatch_ms_per_call"], fp["device_get_ms"])
    except Exception as e:  # pragma: no cover - diagnostics only
        env_seg = ("; env n/a: %s" % e)[:80]

    print(
        json.dumps(
            {
                "metric": (
                    "Mrays/s/chip fwd+bwd scene_2 1920x1080 + 2048^2 skybox "
                    "(bwd_mode=%s; steady-state training fwd+bwd %.0f; "
                    "fwd-only %.0f; const-sky fwd %.0f%s%s)"
                    % (bwd_mode, sky_bwd_ss, sky_fwd, const_fwd, mfu, env_seg)
                ),
                "value": round(sky_bwd, 1),
                "unit": "Mrays/s",
                "vs_baseline": round(sky_bwd / REF_CPU_MRAYS_32T, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
