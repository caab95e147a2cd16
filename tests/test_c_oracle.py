"""Converged-image parity against the COMPILED REFERENCE (the C oracle).

tests/c_oracle/oracle_main.c links the reference's own pixel(), trace_ray,
camera and parser (src/main.c:131-272, src/scene.c, src/camera.c) into a
headless CLI; tests/goldens/c_oracle_*.npy are its converged (4096 spp)
default-pose renders of scene_0/1/2 at 96x72, with the real 2048^2 skybox
and with a constant sky (physics-only, no JPEG-decoder dependence).

These goldens are GROUND TRUTH — reference output, not self-goldens. The
framework's converged means must match them:

  * downsampled 4x4 MAE — per-region radiometry, insensitive to MC noise
    of the fresh framework render;
  * full-res MAE — structure agreement within the fresh render's noise.

Measured drift of the framework's own 128-spp goldens vs the oracle:
MAE 0.0003 (scene_2) … 0.0076 (scene_0, NEE noise), downsampled 0.002.
"""

import os
import pathlib
import subprocess

import numpy as np
import pytest

import jax

from ray_tracing_tpu import Camera, render_image
from ray_tracing_tpu.io.image import load_cubemap
from ray_tracing_tpu.ops.cubemap import constant_sky
from ray_tracing_tpu.scene.parser import parse_scene_file

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"
ORACLE_DIR = pathlib.Path(__file__).parent / "c_oracle"
W, H = 96, 72
CONST = (0.6, 0.7, 0.9)
SLOW = os.environ.get("RTT_SLOW") == "1"


def downsample(a, f=4):
    return a.reshape(H // f, f, W // f, f, 3).mean(axis=(1, 3))


def golden(scene, sky):
    return np.load(GOLDEN_DIR / f"c_oracle_{scene}_{sky}_{W}x{H}.npy")


def fresh_render(scene_name, sky, cubemap, spp):
    scene = parse_scene_file(f"/root/reference/{scene_name}.txt")
    return np.asarray(
        render_image(scene, Camera.default(), W, H, jax.random.key(42),
                     spp=spp, cubemap=cubemap)
    )


@pytest.mark.parametrize(
    "scene_name,sky",
    [("scene_0", "const"), ("scene_0", "skybox"),
     ("scene_1", "skybox"), ("scene_2", "skybox")],
)
def test_reference_parity(scene_name, sky, reference_dir):
    """Framework render vs the compiled reference's converged output."""
    if sky == "const":
        cm = constant_sky(CONST)
    else:
        cm = load_cubemap(reference_dir / "assets")
    img = fresh_render(scene_name, sky, cm, spp=32)
    ref = golden(scene_name, sky)

    mae = np.abs(img - ref).mean()
    ds_mae = np.abs(downsample(img) - downsample(ref)).mean()
    mean_diff = abs(img.mean() - ref.mean())
    # 32-spp MC noise dominates full-res MAE (sigma ~ 0.05/px); the 4x4
    # average beats it down ~4x, exposing radiometric drift at the % level.
    assert mae < 0.055, f"{scene_name}/{sky}: mae={mae:.4f}"
    assert ds_mae < 0.016, f"{scene_name}/{sky}: ds_mae={ds_mae:.4f}"
    assert mean_diff < 0.008, f"{scene_name}/{sky}: mean_diff={mean_diff:.4f}"


@pytest.mark.skipif(not SLOW, reason="converged 512-spp render; set RTT_SLOW=1")
@pytest.mark.parametrize("scene_name", ["scene_0", "scene_1", "scene_2"])
def test_reference_parity_converged(scene_name, reference_dir):
    """BASELINE 'bitwise-close to reference': converged full-res MAE < 0.015
    against the compiled reference, real skybox."""
    cm = load_cubemap(reference_dir / "assets")
    img = fresh_render(scene_name, "skybox", cm, spp=512)
    ref = golden(scene_name, "skybox")
    mae = np.abs(img - ref).mean()
    assert mae < 0.015, f"{scene_name}: converged mae={mae:.4f}"


@pytest.mark.skipif(not SLOW, reason="compiles the reference; set RTT_SLOW=1")
def test_golden_provenance(reference_dir):
    """The committed goldens really are oracle output: rebuild the oracle,
    re-render at 64 spp, and check agreement within its own MC noise."""
    subprocess.run(["make", "-s"], cwd=ORACLE_DIR, check=True)
    out = ORACLE_DIR / "build" / "prov.f32"
    subprocess.run(
        [str(ORACLE_DIR / "oracle"), "/root/reference/scene_2.txt",
         str(W), str(H), "64", str(out)],
        check=True, capture_output=True,
    )
    fresh = np.fromfile(out, np.float32).reshape(H, W, 3)
    ref = golden("scene_2", "skybox")
    assert np.abs(fresh - ref).mean() < 0.03


def _random_scene_dsl(rng, n):
    """Valid scene-DSL text (grammar of src/scene.c:206-609: plain decimal
    floats, {x y z} vectors) for n random objects."""
    f = lambda v: f"{v:.4f}"
    vec = lambda v: "{" + " ".join(f"{x:.4f}" for x in v) + "}"
    lines = []
    for i in range(n):
        mat = (
            f"albedo   {vec(rng.uniform(0.1, 1.0, 3))}\n"
            f"roughness {f(rng.uniform())}\n"
            f"reflectance {f(rng.uniform())}\n"
            f"metallic {f(float(rng.random() < 0.2))}\n"
        )
        emis = ""
        if i == 1 and rng.random() < 0.5:
            emis = (f"emission_power {f(rng.uniform(1, 4))}\n"
                    f"emission_color {vec(rng.uniform(0.5, 1.0, 3))}\n")
        if rng.random() < 0.4:
            lines.append(
                "cube\norigin " + vec(rng.uniform(-5, 4, 3))
                + "\nsize " + vec(rng.uniform(0.5, 3.0, 3)) + "\n" + mat + emis
            )
        else:
            lines.append(
                "sphere\ncenter " + vec(rng.uniform(-4, 4, 3))
                + f"\nradius {f(rng.uniform(0.4, 1.6))}\n" + mat + emis
            )
    return "\n".join(lines)


@pytest.mark.skipif(not SLOW, reason="compiles + renders the reference; RTT_SLOW=1")
@pytest.mark.parametrize("seed", [11, 23, 47])
def test_fuzz_parity_random_scenes(seed, tmp_path, reference_dir):
    """Property-based parity: RANDOM scenes (mixed primitives, materials,
    emissives) rendered by the compiled reference and by the framework
    must agree in converged mean — catches semantic drift anywhere in the
    parser/camera/intersection/shading chain beyond the 3 stock scenes."""
    import jax

    rng = np.random.default_rng(seed)
    dsl = _random_scene_dsl(rng, int(rng.integers(4, 10)))
    scene_file = tmp_path / "fuzz.txt"
    scene_file.write_text(dsl)

    subprocess.run(["make", "-s"], cwd=ORACLE_DIR, check=True)
    out = tmp_path / "oracle.f32"
    w, h = 64, 48
    subprocess.run(
        [str(ORACLE_DIR / "oracle"), str(scene_file), str(w), str(h), "1024",
         str(out), "const", "0.6", "0.7", "0.9"],
        check=True, capture_output=True,
    )
    ref = np.fromfile(out, np.float32).reshape(h, w, 3)

    scene = parse_scene_file(str(scene_file))
    img = np.asarray(
        render_image(scene, Camera.default(), w, h, jax.random.key(0),
                     spp=64, cubemap=constant_sky(CONST))
    )
    ds = lambda a: a.reshape(h // 4, 4, w // 4, 4, 3).mean(axis=(1, 3))
    mae = np.abs(img - ref).mean()
    ds_mae = np.abs(ds(img) - ds(ref)).mean()
    assert mae < 0.06, f"seed {seed}: mae={mae:.4f}\n{dsl}"
    assert ds_mae < 0.02, f"seed {seed}: ds_mae={ds_mae:.4f}\n{dsl}"
    assert abs(img.mean() - ref.mean()) < 0.012, f"seed {seed}\n{dsl}"


@pytest.mark.skipif(not SLOW, reason="compiles + renders the reference; RTT_SLOW=1")
def test_moved_pose_parity(reference_dir, tmp_path):
    """Camera-control parity: a WASD+mouse-look pose chain applied through
    the reference's own move_camera/rotate_camera (oracle pose ops) must
    converge to the same image as the framework's pure move()/rotate()."""
    import jax

    from ray_tracing_tpu.render import camera as cam_mod

    subprocess.run(["make", "-s"], cwd=ORACLE_DIR, check=True)
    w, h = 64, 48
    ops = [("rot", 140.0, -35.0), ("mov", "w", 0.5), ("mov", "d", 0.5),
           ("rot", -60.0, 10.0), ("mov", "s", 0.5)]

    out = tmp_path / "pose.f32"
    cmd = [str(ORACLE_DIR / "oracle"), "/root/reference/scene_0.txt",
           str(w), str(h), "768", str(out), "const", "0.6", "0.7", "0.9"]
    for op in ops:
        cmd += [op[0], str(op[1]), str(op[2])]
    subprocess.run(cmd, check=True, capture_output=True)
    ref = np.fromfile(out, np.float32).reshape(h, w, 3)

    cam = Camera.default()
    seeded = False
    for op in ops:
        if op[0] == "rot":
            if not seeded:
                cam = cam_mod.rotate(cam, 0.0, 0.0)  # first_mouse snap
                seeded = True
            cam = cam_mod.rotate(cam, op[1], op[2])
        else:
            d = {"w": cam_mod.UP, "s": cam_mod.DOWN,
                 "a": cam_mod.LEFT, "d": cam_mod.RIGHT}[op[1]]
            cam = cam_mod.move(cam, d, op[2])

    scene = parse_scene_file("/root/reference/scene_0.txt")
    img = np.asarray(
        render_image(scene, cam, w, h, jax.random.key(1), spp=64,
                     cubemap=constant_sky(CONST))
    )
    ds = lambda a: a.reshape(h // 4, 4, w // 4, 4, 3).mean(axis=(1, 3))
    assert np.abs(ds(img) - ds(ref)).mean() < 0.02
    assert abs(img.mean() - ref.mean()) < 0.012


@pytest.mark.skipif(not SLOW, reason="compiles + renders the reference; RTT_SLOW=1")
@pytest.mark.parametrize("seed", [5, 31])
def test_fuzz_parity_random_scenes_skybox(seed, tmp_path, reference_dir):
    """Fuzz parity with the REAL 2048^2 skybox: exercises the gather path
    (face select, uv, nearest texel) under random geometry. Slightly looser
    than the const-sky fuzz — the oracle decodes JPEGs with stb_image, the
    framework with PIL (IDCT differences of a few /255 on some texels)."""
    import jax

    rng = np.random.default_rng(seed)
    dsl = _random_scene_dsl(rng, int(rng.integers(4, 10)))
    scene_file = tmp_path / "fuzz.txt"
    scene_file.write_text(dsl)

    subprocess.run(["make", "-s"], cwd=ORACLE_DIR, check=True)
    out = tmp_path / "oracle.f32"
    w, h = 64, 48
    subprocess.run(
        [str(ORACLE_DIR / "oracle"), str(scene_file), str(w), str(h), "768",
         str(out)],
        check=True, capture_output=True,
    )
    ref = np.fromfile(out, np.float32).reshape(h, w, 3)

    scene = parse_scene_file(str(scene_file))
    img = np.asarray(
        render_image(scene, Camera.default(), w, h, jax.random.key(0),
                     spp=64, cubemap=load_cubemap(reference_dir / "assets"))
    )
    ds = lambda a: a.reshape(h // 4, 4, w // 4, 4, 3).mean(axis=(1, 3))
    ds_mae = np.abs(ds(img) - ds(ref)).mean()
    assert ds_mae < 0.025, f"seed {seed}: ds_mae={ds_mae:.4f}\n{dsl}"
    assert abs(img.mean() - ref.mean()) < 0.015, f"seed {seed}\n{dsl}"
