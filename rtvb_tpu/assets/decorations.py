"""Instanced decoration meshes for sub-voxel blocks (flowers, torches…).

Capability parity with the reference's instanced block models
(ModelManager-loaded OBJ decorations instanced per voxel via
geometryInstanceIdMap, OptixRenderer.cpp:696-743).  TPU design: decoration
blocks are *not* part of the column occupancy (rays pass through their
voxel); their triangles join the global entity triangle soup intersected
brute-force (render/pathtracer.EntityBuffers).  Each mesh is procedural and
tiny (≤ 12 triangles).
"""
from __future__ import annotations

import numpy as np


def flower_mesh():
    """Two crossed quads (classic sprite-cross plant), 4 triangles."""
    h, r = 0.8, 0.35
    quads = []
    for ang in (0.0, np.pi / 2):
        c, s = np.cos(ang), np.sin(ang)
        a = np.array([0.5 - r * c, 0.0, 0.5 - r * s], np.float32)
        b = np.array([0.5 + r * c, 0.0, 0.5 + r * s], np.float32)
        quads.append((a, b))
    v0, v1, v2 = [], [], []
    for a, b in quads:
        at = a + [0, h, 0]
        bt = b + [0, h, 0]
        v0 += [a, a]
        v1 += [b, bt]
        v2 += [bt, at]
    return np.stack(v0), np.stack(v1), np.stack(v2)


def torch_mesh():
    """Thin vertical box (8 side triangles + 2 top), ~0.15 wide, 0.7 tall."""
    r, h = 0.075, 0.7
    c = 0.5
    corners = np.array([
        [c - r, 0, c - r], [c + r, 0, c - r], [c + r, 0, c + r], [c - r, 0, c + r],
        [c - r, h, c - r], [c + r, h, c - r], [c + r, h, c + r], [c - r, h, c + r],
    ], np.float32)
    quads = [(0, 1, 5, 4), (1, 2, 6, 5), (2, 3, 7, 6), (3, 0, 4, 7), (4, 5, 6, 7)]
    v0, v1, v2 = [], [], []
    for a, b, cc, d in quads:
        v0 += [corners[a], corners[a]]
        v1 += [corners[b], corners[cc]]
        v2 += [corners[cc], corners[d]]
    return np.stack(v0), np.stack(v1), np.stack(v2)


DECORATION_MESHES = {
    "flower": flower_mesh,
    "torch": torch_mesh,
}


def decoration_triangles(name: str, positions: np.ndarray):
    """Instance a decoration mesh at voxel min-corner positions (N, 3).
    Returns (v0, v1, v2) stacked over all instances."""
    mesh_fn = DECORATION_MESHES.get(name)
    if mesh_fn is None or len(positions) == 0:
        z = np.zeros((0, 3), np.float32)
        return z, z, z
    v0, v1, v2 = mesh_fn()
    outs = [[], [], []]
    for p in positions:
        p = np.asarray(p, np.float32)
        outs[0].append(v0 + p)
        outs[1].append(v1 + p)
        outs[2].append(v2 + p)
    return tuple(np.concatenate(o) for o in outs)
