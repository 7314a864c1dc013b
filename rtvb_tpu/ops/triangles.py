"""Ray–triangle intersection for entity/decoration meshes.

The reference routes triangle content through OptiX BLAS/IAS; here entity
triangle budgets are tiny (a skinned blocky character is ~72 triangles,
decoration models a few dozen), so the TPU-native answer is brute force:
every ray tests every triangle in one vectorized Möller–Trumbore sweep with
a reduce-min over the triangle axis — pure VPU math, no acceleration
structure, no divergence.  Rays are processed in chunks (lax.map) so the
(rays × tris) intermediate stays in a few MB.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = 1e30
EPS = 1e-7
CHUNK = 65536


class TriHit(NamedTuple):
    hit: jnp.ndarray    # bool, shape of rays
    t: jnp.ndarray
    tri: jnp.ndarray    # i32 triangle index (-1 = miss)
    u: jnp.ndarray      # barycentrics
    v: jnp.ndarray


def _intersect_chunk(ox, oy, oz, dx, dy, dz, tcap, tri):
    """Rays (N,) vs triangles (T, 9) [v0|e1|e2]. Returns best-hit arrays."""
    v0x, v0y, v0z = tri[:, 0], tri[:, 1], tri[:, 2]
    e1x, e1y, e1z = tri[:, 3], tri[:, 4], tri[:, 5]
    e2x, e2y, e2z = tri[:, 6], tri[:, 7], tri[:, 8]

    # pvec = d × e2 : (N, T)
    px = dy[:, None] * e2z - dz[:, None] * e2y
    py = dz[:, None] * e2x - dx[:, None] * e2z
    pz = dx[:, None] * e2y - dy[:, None] * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > EPS, 1.0 / det, 0.0)
    tx = ox[:, None] - v0x
    ty = oy[:, None] - v0y
    tz = oz[:, None] - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx[:, None] * qx + dy[:, None] * qy + dz[:, None] * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    degenerate = (e1x == 0) & (e1y == 0) & (e1z == 0)
    ok = ((jnp.abs(det) > EPS) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t > 1e-4) & (t < tcap[:, None]) & ~degenerate)
    t_masked = jnp.where(ok, t, BIG)
    best = jnp.argmin(t_masked, axis=1)
    bt = jnp.take_along_axis(t_masked, best[:, None], axis=1)[:, 0]
    bu = jnp.take_along_axis(u, best[:, None], axis=1)[:, 0]
    bv = jnp.take_along_axis(v, best[:, None], axis=1)[:, 0]
    found = bt < BIG
    return (found, jnp.where(found, bt, BIG),
            jnp.where(found, best.astype(jnp.int32), -1), bu, bv)


def pack_triangles(v0, v1, v2):
    """(T,3)×3 vertices → (T, 9) packed [v0 | e1 | e2]. Degenerate (all-zero
    edge) triangles never hit — use zero rows as padding."""
    return jnp.concatenate([v0, v1 - v0, v2 - v0], axis=-1)


def intersect_packed(o, d, tri_packed, t_cap=None) -> TriHit:
    """o, d: SoA rays of shape S; tri_packed: (T, 9)."""
    ox, oy, oz = (jnp.asarray(a, jnp.float32) for a in o)
    dx, dy, dz = (jnp.asarray(a, jnp.float32) for a in d)
    shape = jnp.broadcast_shapes(ox.shape, dx.shape)
    n = 1
    for s in shape:
        n *= s
    tcap = (jnp.full(shape, BIG, jnp.float32) if t_cap is None
            else jnp.broadcast_to(jnp.asarray(t_cap, jnp.float32), shape))

    flat = [jnp.broadcast_to(a, shape).reshape(-1)
            for a in (ox, oy, oz, dx, dy, dz, tcap)]
    if n <= CHUNK:
        out = _intersect_chunk(*flat, tri_packed)
    else:
        pad = (-n) % CHUNK
        if pad:
            flat = [jnp.concatenate([a, jnp.zeros((pad,), a.dtype)]) for a in flat]
        chunked = [a.reshape(-1, CHUNK) for a in flat]

        def body(args):
            return _intersect_chunk(*args, tri_packed)

        out = jax.lax.map(body, tuple(chunked))
        out = tuple(a.reshape(-1)[:n] for a in out)
    hit, t, tri, u, v = (a.reshape(shape) for a in out)
    return TriHit(hit=hit, t=t, tri=tri, u=u, v=v)


def intersect(o, d, v0, v1, v2, active=None, t_cap=None) -> TriHit:
    """Convenience wrapper over raw vertex arrays."""
    packed = pack_triangles(jnp.asarray(v0, jnp.float32),
                            jnp.asarray(v1, jnp.float32),
                            jnp.asarray(v2, jnp.float32))
    if active is not None:
        packed = packed * active[:, None]
    return intersect_packed(o, d, packed, t_cap)


def triangle_normals(v0, v1, v2):
    """(T, 3) unit geometric normals."""
    n = jnp.cross(v1 - v0, v2 - v0)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
