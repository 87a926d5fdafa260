"""Scene container + built-in test scenes.

A Scene aggregates everything the reference's Pipeline binds before a frame
(geometry mosaics, material SSBO, light uniforms, skybox) into one pytree
that jit-compiles cleanly and shards over a device mesh.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from prismarine_core_tpu.models.geometry import (
    TriangleSoup, make_box, make_quad, merge_meshes)
from prismarine_core_tpu.models.lights import SphereLights
from prismarine_core_tpu.models.materials import MaterialTable
from prismarine_core_tpu.models.textures import Environment, TextureStack


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Scene:
    triangles: TriangleSoup
    materials: MaterialTable
    lights: SphereLights
    environment: Environment
    textures: TextureStack
    #: acceleration structure; None until built (see ``with_bvh``).
    bvh: object = None
    #: packet-intersector block set (built together with the BVH).
    packets: object = None

    @staticmethod
    def assemble(triangles, materials, lights=None, environment=None,
                 textures=None, build_bvh: bool = True,
                 leaf_size: int = 4) -> "Scene":
        scene = Scene(
            triangles=triangles,
            materials=materials,
            lights=lights if lights is not None else SphereLights.suns(),
            environment=(environment if environment is not None
                         else Environment.constant((0.5, 0.6, 0.7))),
            textures=(textures if textures is not None
                      else TextureStack.empty()),
        )
        return scene.with_bvh(leaf_size) if build_bvh else scene

    def with_bvh(self, leaf_size: int = 4) -> "Scene":
        """(Re)build the acceleration structures — the analog of the
        reference's per-frame ``markDirty(); build()``
        (``Viewer.cpp:296-297``), but jittable and host-sync-free."""
        from prismarine_core_tpu.accel.lbvh import build_bvh as _build
        from prismarine_core_tpu.accel.packet import build_packet_set
        bvh = _build(self.triangles, leaf_size=leaf_size)
        return dataclasses.replace(
            self, bvh=bvh, packets=build_packet_set(bvh))

    def with_refit(self) -> "Scene":
        """Topology-reusing refit: re-union the existing BVH's AABBs
        (and rebuild the packet view's derived planes/boxes) after the
        soup's VERTICES moved without count/identity changes — the
        cheap per-frame animation path (reference ``refit.comp``),
        skipping the Morton sort and radix-tree passes entirely."""
        from prismarine_core_tpu.accel.lbvh import refit_bvh
        from prismarine_core_tpu.accel.packet import build_packet_set
        if self.bvh is None:
            raise ValueError("with_refit() needs an existing BVH — "
                             "build one with with_bvh() first")
        bvh = refit_bvh(self.bvh, self.triangles)
        return dataclasses.replace(
            self, bvh=bvh, packets=build_packet_set(bvh))


def make_cornell_scene(capacity: int | None = None) -> Scene:
    """Cornell-box-style test scene: an inward-facing room, one tall box,
    a small sphere light in the ceiling region, gray walls with one red and
    one green side (BASELINE.json config 1).
    """
    room = make_box((-1, -1, -1), (1, 1, 1), mat_id=0, inward=True,
                    skip_faces=("front",))
    # Re-tag wall materials: left wall (x=-1) red=1, right (x=+1) green=2.
    rv, rf, rm = room
    centers = rv[rf].mean(axis=1)
    rm = np.where(centers[:, 0] < -0.99, 1, rm)
    rm = np.where(centers[:, 0] > 0.99, 2, rm)
    block = make_box((-0.4, -1.0, -0.5), (0.1, 0.2, 0.0), mat_id=3)
    verts, faces, mids = merge_meshes([(rv, rf, rm.astype(np.int32)), block])

    tris = TriangleSoup.from_arrays(verts, faces, mat_ids=mids,
                                    capacity=capacity)
    mats = MaterialTable.build([
        {"diffuse": (0.75, 0.75, 0.75)},
        {"diffuse": (0.75, 0.15, 0.15)},
        {"diffuse": (0.15, 0.75, 0.15)},
        {"diffuse": (0.7, 0.7, 0.5), "roughness": 0.2, "metallic": 0.4},
    ])
    lights = SphereLights.single(
        center=(0.0, 0.8, 0.0), radius=0.15, color=(40.0, 40.0, 38.0))
    env = Environment.constant((0.0, 0.0, 0.0))
    return Scene.assemble(tris, mats, lights, env)


def make_sun_plane_scene(capacity: int | None = None) -> Scene:
    """Open plane + cube under the reference's default far sun — exercises
    env-map misses and long shadow rays."""
    plane = make_quad((-10, 0, -10), (-10, 0, 10), (10, 0, 10),
                      (10, 0, -10), mat_id=0)
    cube = make_box((-0.5, 0.0, -0.5), (0.5, 1.0, 0.5), mat_id=1)
    verts, faces, mids = merge_meshes([plane, cube])
    tris = TriangleSoup.from_arrays(verts, faces, mat_ids=mids,
                                    capacity=capacity)
    mats = MaterialTable.build([
        {"diffuse": (0.6, 0.6, 0.6)},
        {"diffuse": (0.8, 0.5, 0.3), "roughness": 0.3, "metallic": 0.2},
    ])
    return Scene.assemble(
        tris, mats, SphereLights.suns(),
        Environment.constant((0.4, 0.55, 0.75)))
