"""Voxel world representation — TPU-native, no meshes, no BVH.

Reference capability (voxelengine/Voxel.h, VoxelChunk.h, VoxelSceneGen.cu):
1 byte/voxel chunks of 32³, default world 2×1×2 chunks = 64×32×64, meshed into
triangles + BVH for OptiX.  Here the voxel grid itself is the acceleration
structure; the renderer never builds triangles for world blocks.  Derived
traversal tables are laid out for the Pallas lane-gather primitive
(ops/gatherlib.py):

* ``colmask``  (R, 128) uint32 — per (x, z) column, bit y = voxel occupied.
  One gather per DDA column step replaces the reference's per-voxel reads +
  BVH traversal (the whole 64×64 table is 16 KB and lives in VMEM).
* ``df_super`` (1, 128) int32 — Chebyshev distance field over supercolumns for
  empty-space skipping (replaces BVH early-out).
* ``schema``   (R, 128) int32 — packed terrain bands; block id at a hit is
  arithmetic ``f(schema, y)`` instead of a 3-D gather.
* ``exc_mask`` (R, 128) uint32 + bounded (key, id) list — voxels whose block id
  deviates from the column schema (player edits); resolved only at hits.

The dense ``blocks`` array stays the single source of truth (edits scatter
into it, persistence hashes it — WorldSceneManager.cpp:240-279 equivalent);
``build_tables`` re-derives everything in one cheap jitted sweep, replacing
the reference's incremental meshing machinery (VoxelSceneGen.cu:495-786).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.gatherlib import LANES

AIR = 0
# Empty exception-slot sentinel: larger than any real voxel key and SORTABLE
# (the exception list stays ascending, enabling branchless binary search in
# the shading kernel).
EXC_EMPTY = 1 << 30


@dataclass(frozen=True)
class WorldConfig:
    """Static world geometry (VoxelSceneGen.h:11-21 ChunkConfiguration)."""
    chunks_x: int = 2
    chunks_y: int = 1
    chunks_z: int = 2
    chunk_size: int = 32
    max_exceptions: int = 128

    @property
    def x(self) -> int:
        return self.chunks_x * self.chunk_size

    @property
    def y(self) -> int:
        return self.chunks_y * self.chunk_size

    @property
    def z(self) -> int:
        return self.chunks_z * self.chunk_size

    @property
    def n_cols(self) -> int:
        return self.x * self.z

    @property
    def col_rows(self) -> int:
        return (self.n_cols + LANES - 1) // LANES

    @property
    def super_size(self) -> int:
        """Supercolumn cell edge, chosen so all supercolumns fit in 128 lanes."""
        ss = 1
        while (self.x // ss) * (self.z // ss) > LANES:
            ss *= 2
        return ss

    @property
    def super_x(self) -> int:
        return self.x // self.super_size

    @property
    def super_z(self) -> int:
        return self.z // self.super_size

    def __post_init__(self):
        assert self.y <= 32, "column masks hold at most 32 vertical bits"
        assert self.n_cols % LANES == 0


class VoxelWorld(NamedTuple):
    """Device-resident world state (pytree)."""
    blocks: jnp.ndarray      # (X, Y, Z) uint8 block ids, 0 = air
    schema: jnp.ndarray      # (R, 128) int32 packed terrain bands per column
    colmask: jnp.ndarray     # (R, 128) uint32 occupancy bits per column
    exc_mask: jnp.ndarray    # (R, 128) uint32 exception bits per column
    exc_key: jnp.ndarray     # (K,) int32 column*Y + y, ascending; EXC_EMPTY = free
    exc_id: jnp.ndarray      # (K,) int32 block id for the exception voxel
    df_super: jnp.ndarray    # (1, 128) int32 Chebyshev DF over supercolumns
    maxh_super: jnp.ndarray  # (1, 128) int32 max occupied y+1 per supercolumn


# ---------------------------------------------------------------------------
# Schema packing: h1(5b) | h2(5b) | id_deep(6b) | id_mid(6b) | id_surf(6b)
# Terrain column = deep band [0,h1) + mid band [h1,h2) + surface band [h2,top].
# ---------------------------------------------------------------------------

def pack_schema(h1, h2, id_deep, id_mid, id_surf):
    return (
        h1.astype(jnp.int32)
        | (h2.astype(jnp.int32) << 5)
        | (id_deep.astype(jnp.int32) << 10)
        | (id_mid.astype(jnp.int32) << 16)
        | (id_surf.astype(jnp.int32) << 22)
    )


def schema_block_id(schema, y):
    """Arithmetic block id from a packed column schema at height y."""
    h1 = schema & 31
    h2 = (schema >> 5) & 31
    id_deep = (schema >> 10) & 63
    id_mid = (schema >> 16) & 63
    id_surf = (schema >> 22) & 63
    return jnp.where(y < h1, id_deep, jnp.where(y < h2, id_mid, id_surf))


# ---------------------------------------------------------------------------
# Table derivation
# ---------------------------------------------------------------------------

def col_index(cfg: WorldConfig, ix, iz):
    """Flat column index for voxel (ix, ·, iz)."""
    return ix * cfg.z + iz


def _as_rows(cfg: WorldConfig, flat):
    return flat.reshape(cfg.col_rows, LANES)


def build_colmask(cfg: WorldConfig, blocks, nonsolid_ids: tuple = ()):
    """nonsolid_ids: block ids rays pass through (instanced decoration meshes
    — their triangles are intersected separately, not as cubes)."""
    occ = blocks != AIR
    for nid in nonsolid_ids:
        occ = occ & (blocks != nid)
    bits = occ.astype(jnp.uint32) << jnp.arange(cfg.y, dtype=jnp.uint32)[None, :, None]
    mask = bits.sum(axis=1, dtype=jnp.uint32)           # (X, Z)
    return _as_rows(cfg, mask.reshape(-1))


def build_super_df(cfg: WorldConfig, colmask_rows):
    """Chebyshev distance (in supercolumn cells) to the nearest occupied
    supercolumn; 0 where the cell itself contains occupied columns."""
    ss = cfg.super_size
    occ_col = (colmask_rows.reshape(cfg.x, cfg.z) != 0)
    occ_super = occ_col.reshape(cfg.super_x, ss, cfg.super_z, ss).any(axis=(1, 3))
    sx = jnp.arange(cfg.super_x)
    sz = jnp.arange(cfg.super_z)
    # pairwise chebyshev over ≤128 cells — tiny, off the hot path
    dx = jnp.abs(sx[:, None, None, None] - sx[None, None, :, None])
    dz = jnp.abs(sz[None, :, None, None] - sz[None, None, None, :])
    cheb = jnp.maximum(dx, dz)                          # (SX, SZ, SX, SZ)
    big = cfg.super_x + cfg.super_z
    dist = jnp.min(jnp.where(occ_super[None, None], cheb, big), axis=(2, 3))
    dist = jnp.where(occ_super, 0, dist)
    flat = dist.reshape(-1).astype(jnp.int32)
    pad = LANES - flat.shape[0]
    if pad:
        flat = jnp.concatenate([flat, jnp.full((pad,), big, jnp.int32)])
    return flat.reshape(1, LANES)


def build_super_maxh(cfg: WorldConfig, colmask_rows):
    """Max occupied y+1 per supercolumn — the height envelope that lets rays
    flying above the terrain skip whole supercells (BVH-early-out analog)."""
    ss = cfg.super_size
    mask = colmask_rows.reshape(cfg.x, cfg.z)
    # height of a column = index of msb + 1 = 32 - clz(mask)
    h = jnp.zeros(mask.shape, jnp.int32)
    b = mask
    for shift in (16, 8, 4, 2, 1):
        big = (b >> jnp.uint32(shift)) != 0
        h = h + jnp.where(big, shift, 0)
        b = jnp.where(big, b >> jnp.uint32(shift), b)
    h = jnp.where(mask != 0, h + 1, 0)
    hs = h.reshape(cfg.super_x, ss, cfg.super_z, ss).max(axis=(1, 3))
    flat = hs.reshape(-1).astype(jnp.int32)
    pad = LANES - flat.shape[0]
    if pad:
        # Pad with the WORLD max height, not cfg.y: still an upper bound for
        # any cell a clipped out-of-range sidx can land on (skips stay
        # conservative), but it keeps max(maxh_row) == the real envelope so
        # the tracer's global ascending-ray exit cap (ops/dda.py) retires
        # unoccluded sun-shadow / sky rays in O(1) instead of climbing to
        # the world top (cfg.y padding made the global cap vacuous: the
        # terrain tops out ~11 of 32).
        flat = jnp.concatenate([flat, jnp.full((pad,), 1, jnp.int32) *
                                jnp.max(flat)])
    return flat.reshape(1, LANES)


def predicted_blocks(cfg: WorldConfig, schema_rows, colmask_rows):
    """Dense (X, Y, Z) block ids implied by schema + occupancy."""
    schema = schema_rows.reshape(cfg.x, cfg.z)
    y = jnp.arange(cfg.y, dtype=jnp.int32)[None, :, None]
    ids = schema_block_id(schema[:, None, :], y)
    occ = (colmask_rows.reshape(cfg.x, cfg.z)[:, None, :]
           >> y.astype(jnp.uint32)) & jnp.uint32(1)
    return jnp.where(occ == 1, ids, AIR).astype(jnp.uint8)


def build_tables(cfg: WorldConfig, blocks, schema_rows,
                 nonsolid_ids: tuple = ()) -> VoxelWorld:
    """Re-derive all traversal tables from the dense grid (jit-safe, fixed
    shapes). Called at world gen, load, and after each block edit."""
    colmask = build_colmask(cfg, blocks, nonsolid_ids)
    pred = predicted_blocks(cfg, schema_rows, colmask)
    occ = blocks != AIR
    is_exc = occ & (blocks != pred)                     # (X, Y, Z)

    # exception bitmask per column
    bits = is_exc.astype(jnp.uint32) << jnp.arange(cfg.y, dtype=jnp.uint32)[None, :, None]
    exc_mask = _as_rows(cfg, bits.sum(axis=1, dtype=jnp.uint32).reshape(-1))

    # bounded exception list via top-k on flags (voxel key = col*Y + y)
    flat_exc = is_exc.transpose(0, 2, 1).reshape(-1)    # (X*Z*Y,) key order c*Y+y
    k = cfg.max_exceptions
    n = flat_exc.shape[0]
    score = flat_exc.astype(jnp.int32) * (n + 1) - jnp.arange(n, dtype=jnp.int32)
    _, keys = jax.lax.top_k(score, k)
    valid = jnp.take(flat_exc, keys)
    exc_key = jnp.where(valid, keys.astype(jnp.int32), EXC_EMPTY)
    exc_key = jnp.sort(exc_key)   # ascending, EXC_EMPTY tail → binary-searchable
    ids_at = jnp.take(blocks.transpose(0, 2, 1).reshape(-1),
                      jnp.clip(exc_key, 0, n - 1)).astype(jnp.int32)
    exc_id = jnp.where(exc_key < EXC_EMPTY, ids_at, 0)

    return VoxelWorld(
        blocks=blocks,
        schema=schema_rows,
        colmask=colmask,
        exc_mask=exc_mask,
        exc_key=exc_key,
        exc_id=exc_id,
        df_super=build_super_df(cfg, colmask),
        maxh_super=build_super_maxh(cfg, colmask),
    )


_build_tables_jit = jax.jit(build_tables, static_argnums=0)


@partial(jax.jit, static_argnums=0)
def _exception_count_jit(cfg, blocks, schema_rows, colmask):
    pred = predicted_blocks(cfg, schema_rows, colmask)
    return jnp.sum((blocks != AIR) & (blocks != pred), dtype=jnp.int32)


def exception_count(cfg: WorldConfig, world: VoxelWorld) -> int:
    """Number of voxels deviating from the column schema.  When this exceeds
    cfg.max_exceptions the bounded list drops the highest-key entries
    silently (they render as the schema block and emissive edits lose their
    light) — Engine.set_block uses this to warn the caller."""
    return int(_exception_count_jit(cfg, world.blocks, world.schema,
                                    world.colmask))


def block_id_at(cfg: WorldConfig, world: VoxelWorld, ix, iy, iz):
    """Block id lookup used by gameplay code (vectorized, XLA path):
    reads the dense grid directly."""
    flat = world.blocks.reshape(-1)
    idx = (ix * cfg.y * cfg.z + iy * cfg.z + iz).astype(jnp.int32)
    inb = ((ix >= 0) & (ix < cfg.x) & (iy >= 0) & (iy < cfg.y)
           & (iz >= 0) & (iz < cfg.z))
    return jnp.where(inb, jnp.take(flat, jnp.clip(idx, 0, flat.shape[0] - 1)), AIR)


def set_block(cfg: WorldConfig, world: VoxelWorld, ix, iy, iz, block_id,
              nonsolid_ids: tuple = ()) -> VoxelWorld:
    """Place/remove one block (block_id=0 deletes) and rebuild tables.

    Replaces VoxelEngine::addBlock/deleteBlock + incremental meshing + BLAS
    rebuild (VoxelEngine.cu:1168-1328, VoxelSceneGen.cu:643-786): a scatter
    plus a table sweep, no geometry."""
    return _set_block_jit(cfg, world, ix, iy, iz, block_id, nonsolid_ids)


@partial(jax.jit, static_argnums=(0, 6))
def _set_block_jit(cfg, world, ix, iy, iz, block_id, nonsolid_ids):
    blocks = world.blocks.at[ix, iy, iz].set(jnp.asarray(block_id, jnp.uint8))
    return build_tables(cfg, blocks, world.schema, nonsolid_ids)


def set_blocks(cfg: WorldConfig, world: VoxelWorld, xyz, ids,
               nonsolid_ids: tuple = ()) -> VoxelWorld:
    """Bulk edit: scatter N blocks then rebuild tables ONCE (the batch
    analog of set_block, for scripted edits / world loading)."""
    return _set_blocks_jit(cfg, world, jnp.asarray(xyz, jnp.int32),
                           jnp.asarray(ids, jnp.uint8), nonsolid_ids)


@partial(jax.jit, static_argnums=(0, 4))
def _set_blocks_jit(cfg, world, xyz, ids, nonsolid_ids):
    blocks = world.blocks.at[xyz[:, 0], xyz[:, 1], xyz[:, 2]].set(ids)
    return build_tables(cfg, blocks, world.schema, nonsolid_ids)
