"""Scene data model as a JAX pytree (struct-of-arrays).

The reference stores an array-of-structs ``Object objects[1024]`` with a
tagged union of Sphere/Cube plus a Material (src/scene.h:5-43). A TPU-native
scene is the transpose: one padded array per field, so intersection tests
vectorize over the object axis and every continuous parameter is a
differentiable pytree leaf.

Geometry is unified: ``p0``/``p1`` mean (center, {radius,_,_}) for spheres
and (origin, size) for cubes, selected by the integer ``obj_type`` tag.
Padding slots carry ``obj_type == OBJ_NONE`` and never produce hits.

Object capacity is static (shapes must be jit-stable, mirroring
``MAX_OBJECTS`` src/scene.h:3) but chosen per scene, rounded up to a small
multiple so recompilation only happens when a scene crosses a capacity
bucket.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

OBJ_NONE = 0
OBJ_SPHERE = 1
OBJ_CUBE = 2

# Material defaults from the reference parser (src/scene.c:232-254).
DEFAULT_ALBEDO = (0.44, 0.68, 0.84)
DEFAULT_ROUGHNESS = 0.0
DEFAULT_REFLECTANCE = 0.2
DEFAULT_METALLIC = 0.0
DEFAULT_EMISSION_POWER = 0.0
DEFAULT_EMISSION_COLOR = (1.0, 1.0, 1.0)
DEFAULT_SPHERE_CENTER = (0.0, 0.0, 0.0)
DEFAULT_SPHERE_RADIUS = 1.0
DEFAULT_CUBE_ORIGIN = (0.0, 0.0, 0.0)
DEFAULT_CUBE_SIZE = (1.0, 1.0, 1.0)


@dataclasses.dataclass
class ObjectSpec:
    """Host-side description of one object, produced by the parser."""

    kind: str  # "sphere" | "cube"
    p0: tuple = DEFAULT_SPHERE_CENTER   # center / origin
    p1: tuple = (DEFAULT_SPHERE_RADIUS,) * 3  # (radius,)*3 / size
    albedo: tuple = DEFAULT_ALBEDO
    roughness: float = DEFAULT_ROUGHNESS
    reflectance: float = DEFAULT_REFLECTANCE
    metallic: float = DEFAULT_METALLIC
    emission_power: float = DEFAULT_EMISSION_POWER
    emission_color: tuple = DEFAULT_EMISSION_COLOR


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    """Padded struct-of-arrays scene. All leaves have leading dim = capacity.

    Differentiable leaves: p0, p1, albedo, roughness, reflectance, metallic,
    emission_power, emission_color. Non-differentiable: obj_type (int tag).
    """

    obj_type: jax.Array        # (N,) int32: OBJ_NONE / OBJ_SPHERE / OBJ_CUBE
    p0: jax.Array              # (N, 3) f32: sphere center / cube origin
    p1: jax.Array              # (N, 3) f32: (radius, radius, radius) / cube size
    albedo: jax.Array          # (N, 3) f32
    roughness: jax.Array       # (N,) f32
    reflectance: jax.Array     # (N,) f32
    metallic: jax.Array        # (N,) f32
    emission_power: jax.Array  # (N,) f32
    emission_color: jax.Array  # (N, 3) f32

    @property
    def capacity(self) -> int:
        return self.obj_type.shape[0]

    @property
    def active(self) -> jax.Array:
        """(N,) bool — true for real (non-padding) objects."""
        return self.obj_type != OBJ_NONE

    @property
    def num_objects(self) -> jax.Array:
        return jnp.sum(self.active.astype(jnp.int32))

    @property
    def is_sphere(self) -> jax.Array:
        return self.obj_type == OBJ_SPHERE

    @property
    def is_cube(self) -> jax.Array:
        return self.obj_type == OBJ_CUBE

    @property
    def radius(self) -> jax.Array:
        """(N,) sphere radii (garbage for cubes — mask with is_sphere)."""
        return self.p1[:, 0]

    def origin_of(self) -> jax.Array:
        """(N, 3) object 'origin' used for light sampling: sphere center, or
        cube origin + size/2 (src/scene.c:10-15)."""
        cube_center = self.p0 + 0.5 * self.p1
        return jnp.where(self.is_sphere[:, None], self.p0, cube_center)

    def light_info(self):
        """Index of the FIRST emissive object, matching the reference's lazy
        single-light next-event estimation (src/main.c:140-146).

        Returns (light_index:int32 scalar, has_light:bool scalar). For
        padding slots emission_power is 0 so they never win.
        """
        emissive = self.active & (self.emission_power > 0)
        has_light = jnp.any(emissive)
        light_index = jnp.argmax(emissive)  # first True (argmax of bools)
        return light_index, has_light

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_objects(objects: list[ObjectSpec], capacity: int | None = None) -> "Scene":
        """Pack host-side ObjectSpecs into a padded SoA pytree."""
        n = len(objects)
        if capacity is None:
            capacity = max(8, _round_up(n, 8))
        if n > capacity:
            raise ValueError(f"{n} objects > capacity {capacity}")

        def field(fn, shape, dtype=np.float32):
            out = np.zeros((capacity, *shape), dtype)
            for i, o in enumerate(objects):
                out[i] = fn(o)
            return jnp.asarray(out)

        obj_type = np.zeros((capacity,), np.int32)
        for i, o in enumerate(objects):
            obj_type[i] = OBJ_SPHERE if o.kind == "sphere" else OBJ_CUBE

        return Scene(
            obj_type=jnp.asarray(obj_type),
            p0=field(lambda o: o.p0, (3,)),
            p1=field(lambda o: o.p1, (3,)),
            albedo=field(lambda o: o.albedo, (3,)),
            roughness=field(lambda o: o.roughness, ()),
            reflectance=field(lambda o: o.reflectance, ()),
            metallic=field(lambda o: o.metallic, ()),
            emission_power=field(lambda o: o.emission_power, ()),
            emission_color=field(lambda o: o.emission_color, (3,)),
        )

    def to_objects(self) -> list[ObjectSpec]:
        """Inverse of from_objects (drops padding). Host-side / numpy."""
        host = {
            f.name: np.asarray(getattr(self, f.name))
            for f in dataclasses.fields(self)
        }
        out = []
        for i in range(self.capacity):
            if host["obj_type"][i] == OBJ_NONE:
                continue
            out.append(
                ObjectSpec(
                    kind="sphere" if host["obj_type"][i] == OBJ_SPHERE else "cube",
                    p0=tuple(host["p0"][i].tolist()),
                    p1=tuple(host["p1"][i].tolist()),
                    albedo=tuple(host["albedo"][i].tolist()),
                    roughness=float(host["roughness"][i]),
                    reflectance=float(host["reflectance"][i]),
                    metallic=float(host["metallic"][i]),
                    emission_power=float(host["emission_power"][i]),
                    emission_color=tuple(host["emission_color"][i].tolist()),
                )
            )
        return out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
