"""Sharded rendering: pixel tiles x MC samples over a device mesh.

`shard_map` SPMD program per device:
  * slice of image rows selected by its "tile" axis index (the reference's
    per-thread column, src/main.c:332-334, as a mesh coordinate);
  * a subset of the samples-per-pixel selected by its "sample" axis index;
  * local bounce-loop render (no communication — rays are independent);
  * one psum over "sample" to combine sample sums (the reference's weighted
    accumulation under frame_mutex, src/main.c:394-396, as a collective).

The output image lives sharded over rows ("tile"); resolve/transfer only
when displaying. Scene/camera/cubemap are replicated (tiny).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ray_tracing_tpu.config import RenderConfig, DEFAULT_CONFIG
from ray_tracing_tpu.ops.cubemap import CubemapData
from ray_tracing_tpu.ops.vec import Vec3
from ray_tracing_tpu.parallel.mesh import SAMPLE_AXIS, TILE_AXIS
from ray_tracing_tpu.render.camera import Camera, ray_through_screen
from ray_tracing_tpu.render.integrator import render_rays
from ray_tracing_tpu.scene.types import Scene


def _local_tile_render(
    scene: Scene,
    camera: Camera,
    key,
    width: int,
    height: int,
    spp: int,
    config: RenderConfig,
    cubemap: CubemapData | None,
):
    """Render this device's row-slice of the image, summing its local
    samples. Runs inside shard_map."""
    n_tiles = jax.lax.axis_size(TILE_AXIS)
    n_samples = jax.lax.axis_size(SAMPLE_AXIS)
    tile = jax.lax.axis_index(TILE_AXIS)
    samp = jax.lax.axis_index(SAMPLE_AXIS)

    local_h = height // n_tiles
    local_spp = spp // n_samples

    # Per-device decorrelated but deterministic key.
    key = jax.random.fold_in(key, tile * n_samples + samp)

    # This tile's pixel grid: global-row v, full-width u (src/main.c:293-296).
    x = jnp.arange(width, dtype=jnp.float32)
    y_local = jnp.arange(local_h, dtype=jnp.float32) + tile * local_h
    u = 1.0 - x / (width - 1)
    v = 1.0 - y_local / (height - 1)
    uu, vv = jnp.meshgrid(u, v)
    aspect = width / height

    ro, rd = ray_through_screen(camera, uu, vv, aspect, config)

    def one(k) -> Vec3:
        return render_rays(scene, ro, rd, k, config, cubemap)

    keys = jax.random.split(key, local_spp)
    total, _ = jax.lax.scan(
        lambda acc, k: (acc + one(k), None), Vec3.zeros((local_h, width)), keys
    )

    # Combine sample shards: the collective accumulation step.
    total = jax.tree_util.tree_map(
        lambda c: jax.lax.psum(c, SAMPLE_AXIS), total
    )
    return (total * (1.0 / spp)).to_array()  # (local_h, W, 3)


def render_image_sharded(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    key,
    mesh,
    spp: int = 1,
    config: RenderConfig = DEFAULT_CONFIG,
    cubemap: CubemapData | None = None,
):
    """Full-frame render sharded over (tile, sample). Returns (H, W, 3)
    with rows sharded over the tile axis.

    Requires height % n_tiles == 0 and spp % n_samples == 0 (pad upstream —
    unlike the reference, which silently never renders the rightmost
    column remainder, src/main.c:363).
    """
    n_tiles = mesh.shape[TILE_AXIS]
    n_samples = mesh.shape[SAMPLE_AXIS]
    if height % n_tiles:
        raise ValueError(f"height {height} not divisible by tile axis {n_tiles}")
    if spp % n_samples:
        raise ValueError(f"spp {spp} not divisible by sample axis {n_samples}")

    fn = jax.shard_map(
        partial(
            _local_tile_render,
            width=width,
            height=height,
            spp=spp,
            config=config,
            cubemap=cubemap,
        ),
        mesh=mesh,
        in_specs=(P(), P(), P()),            # scene, camera, key replicated
        out_specs=P(TILE_AXIS, None, None),  # rows sharded over tiles
        check_vma=False,
    )
    return fn(scene, camera, key)
