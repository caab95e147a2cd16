"""io/image tests: the memoized skybox loader."""

import os
import pathlib
import time

import numpy as np

from ray_tracing_tpu.io.image import SKYBOX_FILES, load_cubemap


def _write_faces(root: pathlib.Path, base: int):
    """Six solid-color JPEG faces, distinct per face and per `base`."""
    from PIL import Image

    (root / "skybox").mkdir(parents=True, exist_ok=True)
    for face, rel in SKYBOX_FILES.items():
        img = Image.new("RGB", (8, 8), (base + 20 * face, base, 255 - base))
        img.save(root / rel, quality=95)


def test_load_cubemap_memoization_and_invalidation(tmp_path):
    """The /tmp memo returns bit-identical texels, and editing an asset
    (new mtime/size -> new key) must NOT serve the stale cache."""
    _write_faces(tmp_path, base=40)

    fresh = load_cubemap(tmp_path, use_cache=False)
    first = load_cubemap(tmp_path)   # decode + save
    cached = load_cubemap(tmp_path)  # served from the memo
    assert first.packed is not None and (first.h, first.w) == (8, 8)
    np.testing.assert_array_equal(np.asarray(first.packed),
                                  np.asarray(fresh.packed))
    np.testing.assert_array_equal(np.asarray(first.packed),
                                  np.asarray(cached.packed))
    cache_dir = pathlib.Path(f"/tmp/rtt_skybox_{os.getuid()}")
    assert cache_dir.is_dir() and any(cache_dir.glob("*.npz"))

    # rewrite the faces with different content: the key must change and
    # the loader must return the NEW texels, not the memoized old ones
    time.sleep(0.01)  # ensure a distinct mtime_ns even on coarse clocks
    _write_faces(tmp_path, base=200)
    reloaded = load_cubemap(tmp_path)
    fresh2 = load_cubemap(tmp_path, use_cache=False)
    np.testing.assert_array_equal(np.asarray(reloaded.packed),
                                  np.asarray(fresh2.packed))
    assert not np.array_equal(np.asarray(reloaded.packed),
                              np.asarray(first.packed))
