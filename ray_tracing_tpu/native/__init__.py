"""Native (C++) runtime components, loaded via ctypes.

The reference's runtime is entirely native C (SURVEY.md §2: every component
is native); this package provides the framework's native layer: scene DSL
parser, PNG screenshot encoder, and the keyboard event queue. Python
fallbacks exist for every function — the native layer is the fast path,
not a requirement (lib() returns None when no compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

_DIR = pathlib.Path(__file__).resolve().parent
_LIB_PATH = _DIR / "librt_native.so"
_lib = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile librt_native.so with the in-tree Makefile. Returns success."""
    if _LIB_PATH.exists() and not force:
        src_mtime = (_DIR / "rt_native.cpp").stat().st_mtime
        if _LIB_PATH.stat().st_mtime >= src_mtime:
            return True
    try:
        subprocess.run(
            ["make", "-C", str(_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def lib():
    """The loaded shared library, building it on first use; None if
    unavailable (callers must fall back to the Python implementations)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not build():
        return None
    try:
        l = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    l.rt_parse_scene.restype = ctypes.c_int
    l.rt_parse_scene.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_char_p, ctypes.c_long,
    ]
    l.rt_write_png.restype = ctypes.c_int
    l.rt_write_png.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    l.rt_events_start.restype = ctypes.c_int
    l.rt_events_start.argtypes = [ctypes.c_int]
    l.rt_events_stop.restype = None
    l.rt_events_pop.restype = ctypes.c_int
    l.rt_events_inject.argtypes = [ctypes.c_int]
    l.rt_mouse_pos.restype = None
    l.rt_mouse_pos.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    l.rt_events_parse.restype = None
    l.rt_events_parse.argtypes = [ctypes.c_char_p, ctypes.c_long]
    _lib = l
    return _lib
