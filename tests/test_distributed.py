"""Multi-process (simulated multi-host) test: jax.distributed over two
local processes, 4 virtual CPU devices each -> one 8-device global mesh,
sharded render + per-process tile ownership (SURVEY.md §4 'multi-chip
without a pod', parallel/distributed.py)."""

import os
import subprocess
import sys
import tempfile

import pytest

CHILD = r'''
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
from ray_tracing_tpu import Camera, RenderConfig
from ray_tracing_tpu.scene.types import ObjectSpec, Scene
from ray_tracing_tpu.parallel.distributed import global_mesh, local_tile_range
from ray_tracing_tpu.parallel.render import render_image_sharded
from ray_tracing_tpu.ops.cubemap import constant_sky

assert jax.process_count() == 2
assert len(jax.devices()) == 8
mesh = global_mesh(num_samples=2)
scene = Scene.from_objects([ObjectSpec(kind="sphere", p0=(3.0, 3.0, 3.0))])
cfg = RenderConfig(bounces=2, shadow_samples=1)
img = render_image_sharded(scene, Camera.default(), 32, 16, jax.random.key(0),
                           mesh, spp=2, config=cfg, cubemap=constant_sky((0.3, 0.4, 0.5)))
assert img.shape == (16, 32, 3)
lo, hi = local_tile_range(mesh, 16)
assert (lo, hi) == ((0, 8) if pid == 0 else (8, 16)), (pid, lo, hi)
print(f"DIST-OK {pid}", flush=True)
'''


def test_two_process_distributed_render():
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(CHILD)
        path = f.name
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
        JAX_COMPILATION_CACHE_DIR=os.path.join(repo, ".jax_cache"),
    )
    port = "29517"
    procs = [
        subprocess.Popen(
            [sys.executable, path, str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=280)
            outs.append(out.decode(errors="ignore"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, out[-800:]
        assert f"DIST-OK {i}" in out
