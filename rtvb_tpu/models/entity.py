"""Entities: transformable skinned/static triangle meshes in the world.

Capability parity with renderer/core/Entity.{h,cpp} (transform + device
vertex attributes + previous-frame attributes for motion vectors; entity
instance ids offset at 100000) — minus the BLAS machinery, which the TPU
design replaces with brute-force triangle intersection (ops/triangles.py).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax.numpy as jnp

from .skeleton import Skeleton
from .animation import AnimationClip

ENTITY_ID_BASE = 100000   # Entity.h:23


@dataclass
class MeshData:
    """Static mesh + optional skinning data (ModelManager LoadedGeometry)."""
    positions: np.ndarray          # (N, 3)
    normals: np.ndarray            # (N, 3)
    uvs: np.ndarray                # (N, 2)
    indices: np.ndarray            # (T, 3)
    joints: Optional[np.ndarray] = None    # (N, 4) int
    weights: Optional[np.ndarray] = None   # (N, 4)
    skeleton: Optional[Skeleton] = None
    clips: dict = field(default_factory=dict)  # name -> AnimationClip

    @property
    def n_triangles(self) -> int:
        return len(self.indices)


@dataclass
class Entity:
    mesh: MeshData
    material: str = "default"
    # authored albedo texture name (data/textures/<image>.png), sampled at
    # entity hits through the shared image_textures atlas — the reference's
    # per-entity GLTF textures role (GLTFUtils.cpp texture loading)
    image: str | None = None
    position: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    yaw: float = 0.0
    scale: float = 1.0
    entity_id: int = ENTITY_ID_BASE

    # device-side current + previous skinned vertices (motion vectors)
    _cur_pos: Optional[jnp.ndarray] = None
    _prev_pos: Optional[jnp.ndarray] = None
    _cur_norm: Optional[jnp.ndarray] = None

    # host-side per-frame pose: composed model∘skinning matrices, (J,4,4)
    # (or (1,4,4) plain model transform for unskinned meshes).  The device
    # packer (renderer.pack_entities) consumes these — only these tiny
    # matrices cross host→device per frame (Skeleton.h:96-105 d_jointMatrices
    # upload role); vertices never come back to the host.
    joint_mats: Optional[np.ndarray] = None
    prev_joint_mats: Optional[np.ndarray] = None

    def model_matrix_np(self) -> np.ndarray:
        c, s = np.cos(self.yaw), np.sin(self.yaw)
        return np.array([
            [c * self.scale, 0, s * self.scale, self.position[0]],
            [0, self.scale, 0, self.position[1]],
            [-s * self.scale, 0, c * self.scale, self.position[2]],
            [0, 0, 0, 1],
        ], np.float32)

    def model_matrix(self) -> jnp.ndarray:
        return jnp.asarray(self.model_matrix_np())

    def set_pose(self, mats: np.ndarray):
        """Publish this frame's composed (model ∘ skinning) matrices, shifting
        the previous frame's for motion vectors (Entity prevAttributes)."""
        mats = np.asarray(mats, np.float32)
        if mats.ndim == 2:
            mats = mats[None]
        self.prev_joint_mats = self.joint_mats \
            if self.joint_mats is not None else mats
        self.joint_mats = mats

    def update_vertices(self, skin_mats=None):
        """Recompute world-space vertices (skinned if skeleton present),
        keeping previous positions (Entity prevAttributes role)."""
        from .skinning import skin_vertices

        self._prev_pos = self._cur_pos
        pos = jnp.asarray(self.mesh.positions)
        norm = jnp.asarray(self.mesh.normals)
        if skin_mats is not None and self.mesh.joints is not None:
            pos, norm = skin_vertices(
                pos, norm, jnp.asarray(self.mesh.joints),
                jnp.asarray(self.mesh.weights), skin_mats)
        m = self.model_matrix()
        p4 = jnp.concatenate([pos, jnp.ones_like(pos[:, :1])], axis=-1)
        self._cur_pos = (p4 @ m.T)[:, :3]
        self._cur_norm = norm @ m[:3, :3].T
        if self._prev_pos is None:
            self._prev_pos = self._cur_pos

    def triangles(self):
        """(T, 3)-indexed world-space triangle vertices for the intersector."""
        assert self._cur_pos is not None, "call update_vertices first"
        idx = self.mesh.indices
        v = self._cur_pos
        return v[idx[:, 0]], v[idx[:, 1]], v[idx[:, 2]]


def make_cuboid(center, size, uv_scale=1.0):
    """Axis-aligned cuboid mesh (the building block of the procedural
    blocky character, meshlab/minecraft_character_generator.py role)."""
    cx, cy, cz = center
    sx, sy, sz = (s * 0.5 for s in size)
    corners = np.array([
        [cx - sx, cy - sy, cz - sz], [cx + sx, cy - sy, cz - sz],
        [cx + sx, cy + sy, cz - sz], [cx - sx, cy + sy, cz - sz],
        [cx - sx, cy - sy, cz + sz], [cx + sx, cy - sy, cz + sz],
        [cx + sx, cy + sy, cz + sz], [cx - sx, cy + sy, cz + sz],
    ], np.float32)
    faces = [  # quad corner ids + normal
        ((0, 1, 2, 3), (0, 0, -1)), ((5, 4, 7, 6), (0, 0, 1)),
        ((4, 0, 3, 7), (-1, 0, 0)), ((1, 5, 6, 2), (1, 0, 0)),
        ((3, 2, 6, 7), (0, 1, 0)), ((4, 5, 1, 0), (0, -1, 0)),
    ]
    pos, norm, uv, idx = [], [], [], []
    for quad, n in faces:
        base = len(pos)
        for j, ci in enumerate(quad):
            pos.append(corners[ci])
            norm.append(n)
            uv.append([(j in (1, 2)) * uv_scale, (j in (2, 3)) * uv_scale])
        idx += [[base, base + 1, base + 2], [base, base + 2, base + 3]]
    return (np.array(pos, np.float32), np.array(norm, np.float32),
            np.array(uv, np.float32), np.array(idx, np.int32))


def merge_meshes(parts):
    pos, norm, uv, idx = [], [], [], []
    joints, weights = [], []
    off = 0
    for (p, n, u, i), joint in parts:
        pos.append(p)
        norm.append(n)
        uv.append(u)
        idx.append(i + off)
        joints.append(np.full((len(p), 4), 0, np.int32) + np.array([joint, 0, 0, 0]))
        weights.append(np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (len(p), 1)))
        off += len(p)
    return MeshData(
        positions=np.concatenate(pos), normals=np.concatenate(norm),
        uvs=np.concatenate(uv), indices=np.concatenate(idx),
        joints=np.concatenate(joints), weights=np.concatenate(weights),
    )
