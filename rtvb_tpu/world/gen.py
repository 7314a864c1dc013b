"""Procedural world generation: Perlin-noise terrain with layered bands.

Capability parity with voxelengine/VoxelSceneGen.cu:61-165 + Noise.{h,cpp}
(per-chunk GPU kernel: 4-octave Perlin heightmap → sand/rocks/cliff/soil
bands, plus a hardcoded row of 10 shader-ball test blocks with a roughness
ramp) — re-expressed as one vectorized jitted sweep over the whole grid with
global-frequency noise so chunk borders are seamless (the reference achieves
the same by evaluating noise in global coordinates, VoxelSceneGen.cu:361-375).

The generator also emits the per-column band *schema* words that make block-id
lookups at ray hits pure arithmetic (see world/voxel.py).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..assets import blocks as B
from .voxel import WorldConfig, VoxelWorld, build_tables, pack_schema

DEFAULT_SEED = 124  # reference world seed (VoxelSceneGen.cu perlin seed 124)


# ---------------------------------------------------------------------------
# 2-D Perlin gradient noise (classic Ken Perlin formulation, public algorithm)
# ---------------------------------------------------------------------------

def _perm_table(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    p = rng.permutation(256).astype(np.int32)
    return np.concatenate([p, p])


def perlin2(x, z, perm):
    """Vectorized 2-D Perlin noise in [-1, 1]. x, z: arrays; perm: (512,) table."""
    xi = jnp.floor(x).astype(jnp.int32)
    zi = jnp.floor(z).astype(jnp.int32)
    xf = x - xi
    zf = z - zi
    xi = xi & 255
    zi = zi & 255

    def fade(t):
        return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)

    u = fade(xf)
    v = fade(zf)

    perm = jnp.asarray(perm)

    def hash2(ix, iz):
        return jnp.take(perm, jnp.take(perm, ix) + iz)

    def grad(h, dx, dz):
        # 8 gradient directions from low 3 bits
        h = h & 7
        gx = jnp.where(h < 4, jnp.where((h & 1) == 0, 1.0, -1.0),
                       jnp.where((h & 1) == 0, 1.0, -1.0) * 0.70710678)
        gz = jnp.where(h < 4, jnp.where((h & 2) == 0, 1.0, -1.0),
                       jnp.where((h & 2) == 0, 1.0, -1.0) * 0.70710678)
        return gx * dx + gz * dz

    n00 = grad(hash2(xi, zi), xf, zf)
    n10 = grad(hash2(xi + 1, zi), xf - 1.0, zf)
    n01 = grad(hash2(xi, zi + 1), xf, zf - 1.0)
    n11 = grad(hash2(xi + 1, zi + 1), xf - 1.0, zf - 1.0)

    nx0 = n00 + u * (n10 - n00)
    nx1 = n01 + u * (n11 - n01)
    return nx0 + v * (nx1 - nx0)


def fbm2(x, z, perm, octaves: int = 4, lacunarity: float = 2.0, gain: float = 0.5):
    """Fractal Brownian motion over perlin2 (octaves=4 matches the reference)."""
    total = jnp.zeros_like(jnp.asarray(x, dtype=jnp.float32))
    amp = 1.0
    freq = 1.0
    norm = 0.0
    for _ in range(octaves):
        total = total + amp * perlin2(x * freq, z * freq, perm)
        norm += amp
        amp *= gain
        freq *= lacunarity
    return total / norm


# ---------------------------------------------------------------------------
# Terrain
# ---------------------------------------------------------------------------

def _heightmap_from_perm(cfg: WorldConfig, perm,
                         base_height: float = 8.0, amplitude: float = 7.0,
                         frequency: float = 0.04):
    gx = jnp.arange(cfg.x, dtype=jnp.float32)[:, None]
    gz = jnp.arange(cfg.z, dtype=jnp.float32)[None, :]
    h = base_height + amplitude * fbm2(gx * frequency, gz * frequency, perm)
    return jnp.clip(jnp.round(h), 1, cfg.y - 2).astype(jnp.int32)


def terrain_heightmap(cfg: WorldConfig, seed: int = DEFAULT_SEED):
    """Height in voxels per (x, z) column, seamless across chunk borders."""
    return _heightmap_from_perm(cfg, jnp.asarray(_perm_table(seed)))


# Deterministic decoration spots (x, z): flowers on the terrain surface —
# the canonical scene's instanced-model content (ModelManager decorations
# role; the flower mesh ships as data/models/flower.obj).
FLOWER_SPOTS = ((20, 50), (22, 48), (45, 20), (50, 36))


def generate_world(cfg: WorldConfig | None = None, seed: int = DEFAULT_SEED,
                   shader_ball_row: bool = True, flowers: bool = True,
                   nonsolid_ids: tuple = ()) -> tuple[WorldConfig, VoxelWorld]:
    """Build the canonical world: layered terrain + shader-ball test row +
    flower decorations.

    Band rules (VoxelSceneGen.cu:61-119 equivalent behavior):
      * deep band  [0, h-4): cliff rock
      * mid band   [h-4, h-1): rocks
      * surface    [h-1, h): sand in low terrain, soil/grass higher

    nonsolid_ids: instanced block ids excluded from ray occupancy (their
    meshes render instead) — pass the registry's instanced set.
    """
    cfg = cfg or WorldConfig()
    perm = jnp.asarray(_perm_table(seed))
    return cfg, _generate_jit(cfg, perm, shader_ball_row, flowers,
                              tuple(nonsolid_ids))


@partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _generate_jit(cfg: WorldConfig, perm, shader_ball_row: bool,
                  flowers: bool = False,
                  nonsolid_ids: tuple = ()) -> VoxelWorld:
    heights = _heightmap_from_perm(cfg, perm)                # (X, Z)

    y = jnp.arange(cfg.y, dtype=jnp.int32)[None, :, None]
    h = heights[:, None, :]
    occupied = y < h

    low = heights <= 7
    surf_id = jnp.where(low, B.SAND, B.SOIL).astype(jnp.int32)   # (X, Z)
    h1 = jnp.maximum(h - 4, 0)                                    # deep/mid split
    h2 = jnp.maximum(h - 1, 0)                                    # mid/surface split
    ids = jnp.where(
        y < h1, B.CLIFF,
        jnp.where(y < h2, B.ROCKS, surf_id[:, None, :]),
    )
    blocks = jnp.where(occupied, ids, B.AIR).astype(jnp.uint8)

    # Shader-ball test row: 10 blocks, roughness ramp 0→1, hovering above the
    # terrain at global (x=30..39, y=7, z=43) — VoxelSceneGen.cu:121-161.
    if shader_ball_row:
        bx = jnp.arange(30, 40)
        ids_row = jnp.arange(B.SHADERBALL0, B.SHADERBALL0 + 10, dtype=jnp.uint8)
        blocks = blocks.at[bx, 7, 43].set(ids_row)

    if flowers:
        for fx, fz in FLOWER_SPOTS:
            blocks = blocks.at[fx, heights[fx, fz], fz].set(jnp.uint8(B.FLOWER))

    schema = pack_schema(
        h1[:, 0, :], h2[:, 0, :],
        jnp.full((cfg.x, cfg.z), B.CLIFF, jnp.int32),
        jnp.full((cfg.x, cfg.z), B.ROCKS, jnp.int32),
        surf_id,
    ).reshape(cfg.col_rows, -1)

    return build_tables(cfg, blocks, schema, nonsolid_ids)
