"""Dynamic light system: emissive geometry → sampleable triangle-light table.

Capability parity with the reference's light pipeline (VoxelEngine.cu:386-716:
emissive-instance triangles packed into LightInfo[] (Light.h:13-23
TriangleLight), luminance·area alias table, instance→light mapping,
incremental light-ID remap for ReSTIR).

TPU-native shape: every light is a *triangle* with explicit v0/e1/e2, normal,
area and radiance — lantern/torch decorations contribute only their emissive
sub-mesh (the light part; the base mesh shadows, Light.h light/base pairing),
and plain emissive cube blocks contribute their 12 cube triangles.  Emissive
blocks always live in the world's bounded exception list (world/voxel.py), so
extraction is a fixed-size host scan on edits, exactly like the reference's
updateLight (off the hot path).

Light identity = voxel_key·16 + triangle ordinal; `light_id_remap` maps
previous slot → current slot after an edit (Restir.h:52-79 contract).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..assets.blocks import BlockRegistry
from ..assets.materials import MaterialTable
from ..ops import alias_table as at
from ..ops import mathutil as m
from .voxel import EXC_EMPTY, WorldConfig, VoxelWorld

MAX_LIGHT_TRIS = 256
# empty light-slot key sentinel: larger than any real key and sortable
# (keys stay ascending → branchless binary search in keyed_lookup)
LIGHT_KEY_EMPTY = 1 << 30


class LightTable(NamedTuple):
    """Fixed-size (K triangle slots) light table; inactive slots weight 0."""
    v0x: jnp.ndarray      # (K,) triangle origin
    v0y: jnp.ndarray
    v0z: jnp.ndarray
    e1x: jnp.ndarray      # (K,) edge vectors
    e1y: jnp.ndarray
    e1z: jnp.ndarray
    e2x: jnp.ndarray
    e2y: jnp.ndarray
    e2z: jnp.ndarray
    nx: jnp.ndarray       # (K,) unit normal (emission side)
    ny: jnp.ndarray
    nz: jnp.ndarray
    area: jnp.ndarray     # (K,)
    rad_r: jnp.ndarray    # (K,) emitted radiance
    rad_g: jnp.ndarray
    rad_b: jnp.ndarray
    key: jnp.ndarray      # (K,) i32 identity voxel_key*16 + ordinal
    ent: jnp.ndarray      # (K,) bool: triangle belongs to an instanced
                          # decoration mesh (reachable by BSDF rays only when
                          # entities are tested in bounces — MIS needs this)
    active: jnp.ndarray   # (K,) bool
    count: jnp.ndarray    # () i32 number of active light triangles
    prob: jnp.ndarray     # alias table over slots
    alias: jnp.ndarray
    pmf: jnp.ndarray


def _cube_triangles():
    """12 triangles of the unit cube, outward normals. Returns (v0, e1, e2)
    lists in a fixed ordinal order."""
    tris = []
    # per face: (origin, edge_u, edge_v) with outward winding
    faces = [
        ((0, 0, 0), (0, 0, 1), (0, 1, 0)),   # -x
        ((1, 0, 0), (0, 1, 0), (0, 0, 1)),   # +x
        ((0, 0, 0), (1, 0, 0), (0, 0, 1)),   # -y
        ((0, 1, 0), (0, 0, 1), (1, 0, 0)),   # +y
        ((0, 0, 0), (0, 1, 0), (1, 0, 0)),   # -z
        ((0, 0, 1), (1, 0, 0), (0, 1, 0)),   # +z
    ]
    for o, eu, ev in faces:
        o = np.array(o, np.float32)
        eu = np.array(eu, np.float32)
        ev = np.array(ev, np.float32)
        tris.append((o, eu, ev))               # lower tri of the quad
        tris.append((o + eu + ev, -eu, -ev))   # upper tri
    return tris


def emissive_triangles(cfg: WorldConfig, world: VoxelWorld,
                       mats: MaterialTable, blocks: BlockRegistry):
    """Host scan of the exception list → list of
    (voxel_key, ordinal, v0, e1, e2, radiance) for every emissive triangle.

    Instanced emissive blocks (lantern/torch) contribute their decoration
    light sub-mesh (assets/decorations.py); other emissive blocks contribute
    their 12 cube triangles (VoxelEngine.cu generateLightInfosKernel role).
    """
    from ..assets import decorations as deco

    exc_key = np.asarray(world.exc_key)
    exc_id = np.asarray(world.exc_id)
    emissive_ids = set(blocks.emissive_ids)
    b2m = np.asarray(mats.block_to_mat)
    emis = np.asarray(mats.emissive)

    out = []
    for i in range(exc_key.shape[0]):
        if exc_key[i] >= EXC_EMPTY or int(exc_id[i]) not in emissive_ids:
            continue
        bid = int(exc_id[i])
        c, y = divmod(int(exc_key[i]), cfg.y)
        x, z = divmod(c, cfg.z)
        pos = np.array([x, y, z], np.float32)
        e = emis[b2m[bid]]
        bdef = blocks[bid]
        light = deco.light_mesh(bdef.name) if bdef.instanced else None
        if light is not None:
            lv0, lv1, lv2 = light
            for t in range(len(lv0)):
                v0 = lv0[t] + pos
                e1 = lv1[t] - lv0[t]
                e2 = lv2[t] - lv0[t]
                out.append((int(exc_key[i]), t, v0, e1, e2, e, True))
        else:
            for t, (o, eu, ev) in enumerate(_cube_triangles()):
                out.append((int(exc_key[i]), t, o + pos, eu, ev, e, False))
    return out


def build_light_table(cfg: WorldConfig, world: VoxelWorld,
                      mats: MaterialTable, blocks: BlockRegistry,
                      k: int | None = None) -> LightTable:
    """Extract emissive triangles and build the sampling alias table
    (host-side; runs on world edits only, VoxelEngine.cu:635-656).

    k=None sizes the table to the next power of two ≥ the triangle count
    (min 8): every downstream one-hot gather scales with K, so a lightless
    or single-lantern scene pays for 8/16 slots, not 256.  Changing the
    bucket recompiles the frame once (cached per size)."""
    tris = emissive_triangles(cfg, world, mats, blocks)
    if k is None:
        k = 8
        while k < len(tris):
            k *= 2
        k = min(k, MAX_LIGHT_TRIS)
    if len(tris) > k:
        import warnings
        warnings.warn(f"light-triangle overflow: {len(tris)} > {k}; "
                      f"extra lights are dropped")
        tris = tris[:k]

    v0 = np.zeros((k, 3), np.float32)
    e1 = np.zeros((k, 3), np.float32)
    e2 = np.zeros((k, 3), np.float32)
    nrm = np.zeros((k, 3), np.float32)
    area = np.zeros(k, np.float32)
    rad = np.zeros((k, 3), np.float32)
    key = np.full(k, LIGHT_KEY_EMPTY, np.int32)
    ent = np.zeros(k, bool)
    active = np.zeros(k, bool)
    weights = np.zeros(k, np.float64)

    for s, (vk, t, a, b, c, e, is_ent) in enumerate(tris):
        ent[s] = is_ent
        v0[s] = a
        e1[s] = b
        e2[s] = c
        cr = np.cross(b, c)
        ln = np.linalg.norm(cr)
        nrm[s] = cr / max(ln, 1e-12)
        area[s] = 0.5 * ln
        rad[s] = e
        key[s] = vk * 16 + t
        active[s] = True
        lum = 0.2126 * e[0] + 0.7152 * e[1] + 0.0722 * e[2]
        weights[s] = lum * area[s]

    table = at.build(weights)
    j = jnp.asarray
    return LightTable(
        v0x=j(v0[:, 0]), v0y=j(v0[:, 1]), v0z=j(v0[:, 2]),
        e1x=j(e1[:, 0]), e1y=j(e1[:, 1]), e1z=j(e1[:, 2]),
        e2x=j(e2[:, 0]), e2y=j(e2[:, 1]), e2z=j(e2[:, 2]),
        nx=j(nrm[:, 0]), ny=j(nrm[:, 1]), nz=j(nrm[:, 2]),
        area=j(area),
        rad_r=j(rad[:, 0]), rad_g=j(rad[:, 1]), rad_b=j(rad[:, 2]),
        key=j(key),
        ent=j(ent),
        active=j(active),
        count=jnp.int32(int(active.sum())),
        prob=table.prob, alias=table.alias, pmf=table.pmf,
    )


def light_slot_of(lights: LightTable, voxel_key: int, ordinal: int) -> int:
    """Host-side slot lookup by identity (instance→light mapping role)."""
    keys = np.asarray(lights.key)
    want = voxel_key * 16 + ordinal
    hits = np.nonzero(keys == want)[0]
    return int(hits[0]) if len(hits) else -1


def light_id_remap(prev_lights: LightTable, lights: LightTable) -> jnp.ndarray:
    """(K,) i32: previous light slot → current slot (-1 if gone).  Feeds
    ReSTIR reservoir remapping across edits (buildIncrementalLightMapping,
    VoxelEngine.cu:503-633 equivalent)."""
    prev_key = np.asarray(prev_lights.key)
    cur_key = np.asarray(lights.key)
    cur_pos = {int(kk): i for i, kk in enumerate(cur_key) if kk < LIGHT_KEY_EMPTY}
    remap = np.full(prev_key.shape[0], -1, np.int32)
    for i, kk in enumerate(prev_key):
        if kk < LIGHT_KEY_EMPTY and int(kk) in cur_pos:
            remap[i] = cur_pos[int(kk)]
    return jnp.asarray(remap)


# ---------------------------------------------------------------------------
# Device-side sampling (used inside the path tracer)
# ---------------------------------------------------------------------------

def fold_barycentric(u, v):
    """Uniform point in the unit triangle from a unit square sample."""
    flip = (u + v) > 1.0
    return jnp.where(flip, 1.0 - u, u), jnp.where(flip, 1.0 - v, v)


def sample_light_point(lt: LightTable, slot, u1, u2, u3):
    """Uniform point on light triangle `slot` (TriangleLight::calcSample).

    Returns (pos SoA, unit normal SoA, pdf_area = 1/area, (fa, fb)
    folded barycentrics for reservoir storage).  u1 is unused (kept for the
    cube-light signature compatibility of round 1)."""
    from ..ops.gatherlib import fast_gather_multi
    (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
     nx, ny, nz, area) = fast_gather_multi(
        (lt.v0x, lt.v0y, lt.v0z, lt.e1x, lt.e1y, lt.e1z,
         lt.e2x, lt.e2y, lt.e2z, lt.nx, lt.ny, lt.nz, lt.area), slot)
    fa, fb = fold_barycentric(u2, u3)
    pos = (v0x + fa * e1x + fb * e2x,
           v0y + fa * e1y + fb * e2y,
           v0z + fa * e1z + fb * e2z)
    pdf_area = 1.0 / jnp.maximum(area, 1e-8)
    return pos, (nx, ny, nz), pdf_area, (fa, fb)


def reconstruct_light_point(lt: LightTable, slot, fa, fb):
    """Point for stored barycentrics (prev-frame sample reconstruction,
    Restir.h:348-381 role).  Gathers only the 9 geometry channels — the
    temporal taps run this per tap per pixel."""
    from ..ops.gatherlib import fast_gather_multi
    (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z) = fast_gather_multi(
        (lt.v0x, lt.v0y, lt.v0z, lt.e1x, lt.e1y, lt.e1z,
         lt.e2x, lt.e2y, lt.e2z), slot)
    pos = (v0x + fa * e1x + fb * e2x,
           v0y + fa * e1y + fb * e2y,
           v0z + fa * e1z + fb * e2z)
    return pos


def light_radiance(lt: LightTable, slot, gather=None):
    if gather is None:
        from ..ops.gatherlib import fast_gather_multi
        return fast_gather_multi((lt.rad_r, lt.rad_g, lt.rad_b), slot)
    return (gather(lt.rad_r, slot), gather(lt.rad_g, slot), gather(lt.rad_b, slot))
