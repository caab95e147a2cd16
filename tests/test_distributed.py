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


def _run_children(script: str, args_list, timeout=280):
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(script)
        path = f.name
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
        JAX_COMPILATION_CACHE_DIR=os.path.join(repo, ".jax_cache"),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, path] + [str(a) for a in args],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for args in args_list
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out.decode(errors="ignore"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return procs, outs


def test_two_process_distributed_render():
    procs, outs = _run_children(CHILD, [(0, "29517"), (1, "29517")])
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, out[-800:]
        assert f"DIST-OK {i}" in out


# Full reference physics (10 bounces, 3 shadow rays, NEE light) + a packed
# cubemap through ONE make_train_step step: the gradient psum over both
# mesh axes crosses the process boundary — the collective the reference's
# accumulation publish (src/main.c:380-399) maps to in training. pid=-1
# runs the IDENTICAL computation single-process on 8 local devices; the
# parent asserts loss and the updated params match across process layouts.
CHILD_TRAIN = r'''
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
ndev = 4 if pid >= 0 else 8
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
import jax
jax.config.update("jax_platforms", "cpu")
if pid >= 0:
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2
assert len(jax.devices()) == 8
import jax.numpy as jnp
import optax
from ray_tracing_tpu import Camera, RenderConfig
from ray_tracing_tpu.diff.inverse import extract_params, make_train_step
from ray_tracing_tpu.ops.cubemap import checker_sky
from ray_tracing_tpu.parallel.distributed import global_mesh
from ray_tracing_tpu.parallel.render import render_image_sharded
from ray_tracing_tpu.scene.types import ObjectSpec, Scene

mesh = global_mesh(num_samples=2)
cam = Camera.default()
cfg = RenderConfig()  # FULL reference physics
sky = checker_sky(16)
W, H, SPP = 48, 32, 2
true = Scene.from_objects([
    ObjectSpec(kind="sphere", p0=(3.0, 3.0, 3.0), p1=(1.2,) * 3,
               albedo=(0.8, 0.3, 0.2)),
    ObjectSpec(kind="cube", p0=(1.0, 6.0, 1.0), p1=(2.0, 0.5, 2.0),
               emission_power=4.0, emission_color=(1.0, 0.9, 0.8)),
    ObjectSpec(kind="cube", p0=(-4.0, -1.0, -4.0), p1=(12.0, 0.5, 12.0),
               albedo=(0.5, 0.5, 0.55)),
])
key = jax.random.key(5)
target = render_image_sharded(true, cam, W, H, key, mesh, spp=SPP,
                              config=cfg, cubemap=sky)
import dataclasses
base = dataclasses.replace(true, p0=true.p0 + 0.3, albedo=true.albedo * 0.7)
params = {"scene": extract_params(base, ("p0", "albedo")), "camera": {}}
opt = optax.adam(1e-2)
opt_state = opt.init(params)
step = make_train_step(base, cam, mesh, opt, W, H, spp=SPP, config=cfg,
                       cubemap=sky)
params, opt_state, loss = step(params, opt_state, target, jax.random.key(9))
vals = [float(loss)]
for name in ("p0", "albedo"):
    v = params["scene"][name]
    vals += [float(jnp.sum(v)), float(jnp.sum(jnp.abs(v)))]
print("TRAIN-VALS", pid, " ".join(f"{v:.9e}" for v in vals), flush=True)
'''


def test_two_process_distributed_train_step():
    procs, outs = _run_children(
        CHILD_TRAIN, [(0, "29531"), (1, "29531"), (-1, "0")], timeout=560,
    )
    vals = {}
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-1500:]
        line = [ln for ln in out.splitlines() if ln.startswith("TRAIN-VALS")]
        assert line, out[-1500:]
        parts = line[-1].split()
        vals[int(parts[1])] = [float(x) for x in parts[2:]]
    assert vals[0] == vals[1]  # replicated outputs agree across processes
    # 2-process vs single-process: same mesh shape, same device order, same
    # per-device RNG streams — only the psum transport differs (gloo
    # cross-process vs in-process). Loss and the post-Adam params must
    # match to reduction-order tolerance.
    import numpy as np

    np.testing.assert_allclose(vals[0], vals[-1], rtol=2e-4, atol=1e-6)
    assert vals[0][0] > 1e-6  # the step saw a real nonzero loss
