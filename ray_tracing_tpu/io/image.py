"""Image IO: cubemap loading, PNG screenshots.

Replaces the reference's stb_image / stb_image_write usage
(src/gpu_and_windowing.c:24-33 JPEG decode; src/main.c:637-681 PNG write)
with PIL on the host. Device code never touches files.
"""

from __future__ import annotations

import os
import pathlib

import numpy as np

from ray_tracing_tpu.ops.cubemap import (
    CF_BACK,
    CF_BOTTOM,
    CF_FRONT,
    CF_LEFT,
    CF_RIGHT,
    CF_TOP,
    CubemapData,
)

# Default skybox paths relative to an asset root (src/main.c:500-507).
SKYBOX_FILES = {
    CF_RIGHT: "skybox/right.jpg",
    CF_LEFT: "skybox/left.jpg",
    CF_TOP: "skybox/top.jpg",
    CF_BOTTOM: "skybox/bottom.jpg",
    CF_FRONT: "skybox/front.jpg",
    CF_BACK: "skybox/back.jpg",
}

REFERENCE_ASSETS = "/root/reference/assets"


def load_image(path) -> np.ndarray:
    """Decode an image file to (H, W, 3) uint8."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def load_cubemap(
    asset_root: str | os.PathLike = REFERENCE_ASSETS,
    use_cache: bool = True,
) -> CubemapData:
    """Load the 6-face skybox in reference face order (src/main.c:500-508).

    Decoding six 2048^2 JPEGs costs ~6 s of single-core CPU, and every
    benchmark/test/app process pays it at startup — so the packed uint32
    result is memoized under /tmp keyed on the files' identity
    (path, mtime, size). Corrupt or stale cache entries fall back to a
    fresh decode."""
    root = pathlib.Path(asset_root)
    paths = [root / SKYBOX_FILES[face] for face in range(6)]

    cache = None
    if use_cache:
        import hashlib

        try:
            ident = "".join(
                f"{p}:{p.stat().st_mtime_ns}:{p.stat().st_size};"
                for p in paths
            )
        except OSError:
            ident = None  # let load_image raise its own error below
        if ident is not None:
            key = hashlib.sha1(ident.encode()).hexdigest()[:16]
            cache = (
                pathlib.Path(f"/tmp/rtt_skybox_{os.getuid()}") / f"{key}.npz"
            )
            if cache.exists():
                try:
                    with np.load(cache) as z:
                        packed = z["packed"]
                        h, w = int(z["h"]), int(z["w"])
                    if packed.dtype == np.uint32 and packed.size == 6 * h * w:
                        import jax.numpy as jnp

                        return CubemapData(
                            packed=jnp.asarray(packed), r=None, g=None,
                            b=None, h=h, w=w,
                        )
                except Exception:
                    pass  # fall through to the decode

    faces = [load_image(p) for p in paths]
    cm = CubemapData.from_faces(np.stack(faces))
    if cache is not None and cm.packed is not None:
        try:
            cache.parent.mkdir(parents=True, exist_ok=True)
            tmp = cache.with_suffix(f".{os.getpid()}.tmp")
            with open(tmp, "wb") as f:  # file object: savez must not
                # append .npz to the temp name, os.replace needs it exact
                np.savez(f, packed=np.asarray(cm.packed),
                         h=np.int64(cm.h), w=np.int64(cm.w))
            os.replace(tmp, cache)  # atomic: concurrent loaders see
            # either the old state or a complete file
        except Exception:
            pass  # caching is best-effort
    return cm


def to_uint8(img: np.ndarray) -> np.ndarray:
    """float [0,1] -> uint8 with the reference's conversion: x*255 truncated
    (src/main.c:666-670)."""
    img = np.asarray(img, np.float32)
    return (img * 255.0).astype(np.uint8)


def save_png(img, path, flip_vertically: bool = True, use_native: bool = True) -> None:
    """Write an (H, W, 3) float [0,1] frame as PNG.

    flip_vertically=True matches the reference screenshot path
    (stbi_flip_vertically_on_write, src/main.c:672): our row 0 is the
    reference's row 0, and its writer flips rows on save.

    The C++ encoder (native/rt_native.cpp rt_write_png, the framework's
    stb_image_write equivalent) is used when available; PIL otherwise.
    """
    import ctypes

    arr = to_uint8(img)
    if use_native:
        from ray_tracing_tpu import native

        lib = native.lib()
        if lib is not None:
            a = np.ascontiguousarray(arr)
            rc = lib.rt_write_png(
                str(path).encode(),
                a.shape[1],
                a.shape[0],
                a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                1 if flip_vertically else 0,
            )
            if rc == 0:
                return
    from PIL import Image

    if flip_vertically:
        arr = arr[::-1]
    Image.fromarray(arr).save(path)


def next_screenshot_path(directory=".") -> str | None:
    """First free screenshot_<i>.png for i < 1000 (src/main.c:642-659)."""
    for i in range(1000):
        path = os.path.join(directory, f"screenshot_{i}.png")
        if not os.path.exists(path):
            return path
    return None


def screenshot(img, directory=".") -> str | None:
    """Save the frame like the reference's SPACE handler (src/main.c:637-681)."""
    path = next_screenshot_path(directory)
    if path is not None:
        save_png(img, path, flip_vertically=True)
    return path
