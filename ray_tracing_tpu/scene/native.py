"""ctypes binding for the C++ scene parser (native/rt_native.cpp).

Fast path for scene loading; semantics are identical to the Python parser
(both implement the grammar of src/scene.c:206-609) and the test suite
cross-checks them object-for-object on the reference scenes plus generated
corpora. Falls back to the Python parser when no compiler is available.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ray_tracing_tpu import native
from ray_tracing_tpu.scene import parser as pyparser
from ray_tracing_tpu.scene.parser import MAX_OBJECTS, SceneParseError
from ray_tracing_tpu.scene.types import OBJ_CUBE, OBJ_SPHERE, ObjectSpec, Scene

NCOLS = 16


def parse_objects_native(src: str) -> list[ObjectSpec]:
    """Parse via the C++ library; raises SceneParseError on bad input.
    Falls back to the Python parser when the library is unavailable."""
    lib = native.lib()
    if lib is None:
        return pyparser.parse_objects(src)

    data = src.encode()
    params = np.zeros((MAX_OBJECTS, NCOLS), np.float32)
    types = np.zeros((MAX_OBJECTS,), np.int32)
    err = ctypes.create_string_buffer(256)
    n = lib.rt_parse_scene(
        data,
        len(data),
        params.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        types.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        MAX_OBJECTS,
        err,
        len(err),
    )
    if n < 0:
        msg = err.value.decode(errors="replace")
        # strip the native " (line N)" suffix and re-raise with the line
        line = 0
        if msg.endswith(")") and "(line " in msg:
            base, _, tail = msg.rpartition(" (line ")
            line = int(tail[:-1])
            msg = base
        raise SceneParseError(msg, line)

    out = []
    for i in range(n):
        out.append(
            ObjectSpec(
                kind="sphere" if types[i] == OBJ_SPHERE else "cube",
                p0=tuple(params[i, 0:3].tolist()),
                p1=tuple(params[i, 3:6].tolist()),
                albedo=tuple(params[i, 6:9].tolist()),
                roughness=float(params[i, 9]),
                reflectance=float(params[i, 10]),
                metallic=float(params[i, 11]),
                emission_power=float(params[i, 15]),
                emission_color=tuple(params[i, 12:15].tolist()),
            )
        )
    return out


def parse_scene_string_native(src: str) -> Scene:
    return Scene.from_objects(parse_objects_native(src))


def parse_scene_file_native(path: str) -> Scene:
    with open(path, "r") as f:
        return parse_scene_string_native(f.read())
