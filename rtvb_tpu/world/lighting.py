"""Dynamic light system: emissive voxels → sampleable light table.

Capability parity with the reference's light pipeline (VoxelEngine.cu:386-716:
emissive-triangle extraction into packed LightInfo[], luminance·area alias
table, instance→light mapping, incremental light-ID remap for ReSTIR).

TPU-native shape: emissive blocks are never part of the terrain schema, so
they always live in the world's bounded *exception list* (world/voxel.py) —
the light extraction is a fixed-size scan of that list, no geometry pass.
Each light is an emissive voxel (cube); sampling draws a point on its
surface.  The alias table rebuild runs off the hot path on edits, exactly
like the reference (VoxelEngine.cu:635-656).

Light IDs are exception-slot indices, which are stable across unrelated
edits (top-k by voxel key), giving ReSTIR temporal reuse the same id-remap
contract as the reference (Restir.h:52-79): `light_id_remap` maps previous
slot → current slot after an edit.
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


class LightTable(NamedTuple):
    """Fixed-size (K slots) light table; inactive slots have weight 0."""
    px: jnp.ndarray       # (K,) f32 voxel min-corner position
    py: jnp.ndarray
    pz: jnp.ndarray
    rad_r: jnp.ndarray    # (K,) emitted radiance
    rad_g: jnp.ndarray
    rad_b: jnp.ndarray
    active: jnp.ndarray   # (K,) bool
    count: jnp.ndarray    # () i32 number of active lights
    prob: jnp.ndarray     # alias table over slots
    alias: jnp.ndarray
    pmf: jnp.ndarray


def build_light_table(cfg: WorldConfig, world: VoxelWorld,
                      mats: MaterialTable, blocks: BlockRegistry) -> LightTable:
    """Extract emissive voxels from the exception list and build the
    sampling alias table (host-side; runs on world edits only)."""
    exc_key = np.asarray(world.exc_key)
    exc_id = np.asarray(world.exc_id)
    emissive_ids = set(blocks.emissive_ids)
    b2m = np.asarray(mats.block_to_mat)
    emis = np.asarray(mats.emissive)

    k = exc_key.shape[0]
    px = np.zeros(k, np.float32)
    py = np.zeros(k, np.float32)
    pz = np.zeros(k, np.float32)
    rad = np.zeros((k, 3), np.float32)
    active = np.zeros(k, bool)
    weights = np.zeros(k, np.float64)

    for i in range(k):
        if exc_key[i] >= EXC_EMPTY or int(exc_id[i]) not in emissive_ids:
            continue
        c, y = divmod(int(exc_key[i]), cfg.y)
        x, z = divmod(c, cfg.z)
        e = emis[b2m[int(exc_id[i])]]
        px[i], py[i], pz[i] = x, y, z
        rad[i] = e
        active[i] = True
        # luminance × area weight (6 unit faces), VoxelEngine extractRadianceKernel
        weights[i] = (0.2126 * e[0] + 0.7152 * e[1] + 0.0722 * e[2]) * 6.0

    table = at.build(weights)
    return LightTable(
        px=jnp.asarray(px), py=jnp.asarray(py), pz=jnp.asarray(pz),
        rad_r=jnp.asarray(rad[:, 0]), rad_g=jnp.asarray(rad[:, 1]),
        rad_b=jnp.asarray(rad[:, 2]),
        active=jnp.asarray(active),
        count=jnp.int32(int(active.sum())),
        prob=table.prob, alias=table.alias, pmf=table.pmf,
    )


def light_id_remap(prev_world: VoxelWorld, world: VoxelWorld) -> jnp.ndarray:
    """(K,) i32: previous light slot → current slot (-1 if gone).  Feeds
    ReSTIR reservoir remapping across edits (buildIncrementalLightMapping,
    VoxelEngine.cu:503-633 equivalent)."""
    prev_key = np.asarray(prev_world.exc_key)
    cur_key = np.asarray(world.exc_key)
    cur_pos = {int(kk): i for i, kk in enumerate(cur_key) if kk < EXC_EMPTY}
    remap = np.full(prev_key.shape[0], -1, np.int32)
    for i, kk in enumerate(prev_key):
        if kk < EXC_EMPTY and int(kk) in cur_pos:
            remap[i] = cur_pos[int(kk)]
    return jnp.asarray(remap)


# ---------------------------------------------------------------------------
# Device-side sampling (used inside the path tracer)
# ---------------------------------------------------------------------------

def sample_light_point(lt: LightTable, slot, u1, u2, u3, gather=None):
    """Uniform point on the surface of the light voxel cube in slot.

    Returns SoA position, outward face normal, and area pdf (1/6 per unit²
    face). TriangleLight::calcSample equivalent for cube lights."""
    if gather is None:
        from ..ops.gatherlib import fast_gather_multi
        bx, by, bz = fast_gather_multi((lt.px, lt.py, lt.pz), slot)
    else:
        bx = gather(lt.px, slot)
        by = gather(lt.py, slot)
        bz = gather(lt.pz, slot)
    face = jnp.clip((u1 * 6.0).astype(jnp.int32), 0, 5)
    a = u2
    b = u3
    # face layout: 0:-x 1:+x 2:-y 3:+y 4:-z 5:+z
    fx = jnp.where(face == 0, 0.0, jnp.where(face == 1, 1.0, a))
    fy = jnp.where(face == 2, 0.0, jnp.where(face == 3, 1.0,
                   jnp.where(face < 2, a, b)))
    fz = jnp.where(face == 4, 0.0, jnp.where(face == 5, 1.0, b))
    pos = (bx + fx, by + fy, bz + fz)
    nx = jnp.where(face == 0, -1.0, jnp.where(face == 1, 1.0, 0.0))
    ny = jnp.where(face == 2, -1.0, jnp.where(face == 3, 1.0, 0.0))
    nz = jnp.where(face == 4, -1.0, jnp.where(face == 5, 1.0, 0.0))
    pdf_area = jnp.full_like(bx, 1.0 / 6.0)
    return pos, (nx, ny, nz), pdf_area, face


def light_radiance(lt: LightTable, slot, gather=None):
    if gather is None:
        from ..ops.gatherlib import fast_gather_multi
        return fast_gather_multi((lt.rad_r, lt.rad_g, lt.rad_b), slot)
    return (gather(lt.rad_r, slot), gather(lt.rad_g, slot), gather(lt.rad_b, slot))
