"""Tracing & throughput metrics.

The reference has no profiling at all (SURVEY.md §5: only dead clock
helpers in src/os.c). Here: jax.profiler trace capture for xprof/tensorboard
plus rays/s meters used by the bench and the viewer HUD.
"""

from __future__ import annotations

import contextlib
import time

import jax

from ray_tracing_tpu.config import RenderConfig, DEFAULT_CONFIG


def traces_per_sample(config: RenderConfig = DEFAULT_CONFIG) -> int:
    """Closest-hit traces each pixel-sample dispatches: bounces x (1 primary
    + shadow_samples NEE rays) — the reference cost model (src/main.c:156,189)."""
    return config.bounces * (1 + config.shadow_samples)


def rays_per_frame(width: int, height: int, spp: int = 1,
                   config: RenderConfig = DEFAULT_CONFIG) -> int:
    return width * height * spp * traces_per_sample(config)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rtt_trace"):
    """jax.profiler trace context — open with xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, iters: int = 1, **kwargs):
    """(result, seconds/iter) with proper device synchronization."""
    result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    return result, (time.perf_counter() - t0) / iters


class RateMeter:
    """Sliding-window rays/s meter for interactive loops."""

    def __init__(self, window: int = 16):
        self.window = window
        self.samples: list[tuple[float, int]] = []

    def add(self, rays: int) -> None:
        self.samples.append((time.perf_counter(), rays))
        if len(self.samples) > self.window:
            self.samples.pop(0)

    @property
    def rays_per_second(self) -> float:
        if len(self.samples) < 2:
            return 0.0
        dt = self.samples[-1][0] - self.samples[0][0]
        rays = sum(r for _, r in self.samples[1:])
        return rays / dt if dt > 0 else 0.0

    def format(self) -> str:
        r = self.rays_per_second
        if r >= 1e9:
            return f"{r / 1e9:.2f} Grays/s"
        return f"{r / 1e6:.1f} Mrays/s"
