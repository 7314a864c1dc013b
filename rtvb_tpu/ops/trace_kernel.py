"""Pallas TPU kernel binding for the DDA tracer.

The traversal algorithm lives in ops/dda.py and is shared verbatim; this
module binds it into a `pallas_call` where:

* the column-mask table (R, 128) and supercolumn DF row live wholly in VMEM
  (16 KB for the default world — resident next to the compute units, the
  moral equivalent of the reference keeping its BVH in L2),
* rays are processed in (TILE, 128) pixel tiles over a 1-D grid,
* the per-step column gather is the 32-row lane-shuffle (ops/gatherlib.py),
* each tile's while-loop exits as soon as *its* rays all terminate —
  coherent tiles (sky, nearby ground) finish in a few steps, which is the
  TPU replacement for per-warp early exit on GPU.

Cost on v5e: ~0.35 ms per traversal step per 2M rays, typical frame ≈ a few
steps per tile thanks to DF jumps + early exit.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import dda
from .gatherlib import LANES, lane_gather, table_gather

TILE = 256


def _make_kernel(p: dda.TraceParams, any_hit: bool):
    def kernel(ox, oy, oz, dx, dy, dz, tcap, colmask, dfrow, maxhrow,
               hit_o, t_o, ix_o, iy_o, iz_o, nx_o, ny_o, nz_o):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        rec = dda.trace(
            o, d, colmask[:], dfrow[0, :], p,
            t_cap=tcap[:], any_hit=any_hit,
            gather=table_gather,
            row_gather=lambda row, idx: lane_gather(row, idx),
            maxh_row=maxhrow[0, :],
        )
        hit_o[:] = rec.hit.astype(jnp.int32)
        t_o[:] = rec.t
        ix_o[:] = rec.ix
        iy_o[:] = rec.iy
        iz_o[:] = rec.iz
        nx_o[:] = rec.nx
        ny_o[:] = rec.ny
        nz_o[:] = rec.nz
    return kernel


@partial(jax.jit, static_argnames=("p", "any_hit"))
def _trace_tiles(ox, oy, oz, dx, dy, dz, tcap, colmask, dfrow, maxhrow,
                 p: dda.TraceParams, any_hit: bool):
    rows = ox.shape[0]
    grid = (rows // TILE,)
    tile_spec = pl.BlockSpec((TILE, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(colmask.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    df_spec = pl.BlockSpec((1, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),    # hit
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),  # t
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),    # ix
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),    # iy
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),    # iz
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),  # nx
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),  # ny
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),  # nz
    ]
    fn = pl.pallas_call(
        _make_kernel(p, any_hit),
        grid=grid,
        in_specs=[tile_spec] * 7 + [table_spec, df_spec, df_spec],
        out_specs=[tile_spec] * 8,
        out_shape=out_shapes,
    )
    return fn(ox, oy, oz, dx, dy, dz, tcap, colmask, dfrow, maxhrow)


def trace(o, d, colmask2d, df_row, p: dda.TraceParams, t_cap=None,
          any_hit: bool = False, maxh_row=None) -> dda.HitRecord:
    """Drop-in replacement for dda.trace running as a Pallas TPU kernel.

    o, d: SoA arrays of any common shape; flattened into (TILE, 128) tiles.
    """
    ox, oy, oz = (jnp.asarray(a, jnp.float32) for a in o)
    dx, dy, dz = (jnp.asarray(a, jnp.float32) for a in d)
    shape = jnp.broadcast_shapes(ox.shape, dx.shape)
    n = 1
    for s in shape:
        n *= s
    per_tile = TILE * LANES
    pad = (-n) % per_tile
    rows = (n + pad) // LANES

    def prep(a, fill=0.0):
        a = jnp.broadcast_to(a, shape).reshape(-1)
        if pad:
            a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(rows, LANES)

    tcap = (jnp.full(shape, dda.BIG, jnp.float32) if t_cap is None
            else jnp.broadcast_to(jnp.asarray(t_cap, jnp.float32), shape))

    if maxh_row is None:
        # conservative envelope (= world height): skip only above the world
        maxh_row = jnp.full((LANES,), p.y, jnp.int32)
    outs = _trace_tiles(
        prep(ox), prep(oy), prep(oz),
        prep(dx), prep(dy, fill=1.0), prep(dz), prep(tcap),
        colmask2d, df_row.reshape(1, LANES), maxh_row.reshape(1, LANES),
        p, any_hit)

    def unprep(a):
        return a.reshape(-1)[:n].reshape(shape)

    hit, t, ix, iy, iz, nx, ny, nz = (unprep(a) for a in outs)
    return dda.HitRecord(hit=hit != 0, t=t, ix=ix, iy=iy, iz=iz,
                         nx=nx, ny=ny, nz=nz)
