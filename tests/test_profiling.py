"""Observability utilities (SURVEY.md §5 tracing row — reference has none)."""

import glob
import time

import jax.numpy as jnp

from ray_tracing_tpu.config import RenderConfig
from ray_tracing_tpu.utils.profiling import (
    RateMeter,
    rays_per_frame,
    timed,
    trace,
    traces_per_sample,
)


def test_ray_accounting_matches_reference_cost_model():
    # bounces x (1 primary + shadow_samples NEE) — src/main.c:156,189
    assert traces_per_sample(RenderConfig()) == 10 * 4
    assert traces_per_sample(RenderConfig(bounces=2, shadow_samples=1)) == 4
    assert rays_per_frame(100, 50, 2, RenderConfig(bounces=1, shadow_samples=0)) == 10000


def test_trace_produces_artifacts(tmp_path):
    with trace(str(tmp_path)) as d:
        (jnp.arange(512.0) @ jnp.arange(512.0)).block_until_ready()
    assert glob.glob(f"{d}/**/*", recursive=True)


def test_timed_and_ratemeter():
    r, dt = timed(lambda: jnp.sum(jnp.arange(64.0)), iters=2)
    assert float(r) > 0 and dt >= 0
    m = RateMeter(window=4)
    assert m.rays_per_second == 0.0
    for _ in range(3):
        m.add(1_000_000)
        time.sleep(0.01)
    assert m.rays_per_second > 0
    assert "rays/s" in m.format()
