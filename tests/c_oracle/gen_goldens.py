#!/usr/bin/env python
"""Regenerate the C-oracle ground-truth goldens (tests/goldens/c_oracle_*.npy).

The oracle binary links the reference's own pixel()/trace_ray/camera/parser
(see oracle_main.c); these goldens are therefore REFERENCE output, not
self-goldens. Deterministic: the reference RNG is a fixed wyhash64 stream
seeded 0 (src/utils.c:60-75), so same args -> bitwise-same golden.

Usage: python tests/c_oracle/gen_goldens.py [--spp 4096]
"""

import argparse
import pathlib
import subprocess
import tempfile

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
GOLDENS = HERE.parent / "goldens"
W, H = 96, 72
SCENES = ("scene_0", "scene_1", "scene_2")
CONST_SKY = ("0.6", "0.7", "0.9")


def build():
    subprocess.run(["make", "-s"], cwd=HERE, check=True)
    return HERE / "oracle"


def render(oracle, scene, spp, sky):
    with tempfile.NamedTemporaryFile(suffix=".f32") as f:
        cmd = [str(oracle), f"/root/reference/{scene}.txt",
               str(W), str(H), str(spp), f.name]
        if sky == "const":
            cmd += ["const", *CONST_SKY]
        subprocess.run(cmd, check=True, capture_output=True)
        return np.fromfile(f.name, np.float32).reshape(H, W, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=4096)
    args = ap.parse_args()

    oracle = build()
    GOLDENS.mkdir(exist_ok=True)
    for scene in SCENES:
        for sky in ("const", "skybox"):
            img = render(oracle, scene, args.spp, sky)
            out = GOLDENS / f"c_oracle_{scene}_{sky}_{W}x{H}.npy"
            np.save(out, img)
            print(f"{out.name}: mean={img.mean():.4f}")


if __name__ == "__main__":
    main()
