"""Pallas TPU kernel binding for the DDA tracer.

The traversal algorithm lives in ops/dda.py and is shared verbatim; this
module binds it into a `pallas_call` where:

* the column-mask / schema / exception tables (16 KB each for the default
  world) live wholly in VMEM — resident next to the compute units, the moral
  equivalent of the reference keeping its BVH in L2,
* rays are processed in (TILE, 128) pixel tiles over a 1-D grid,
* the per-step column gather is the 32-row lane-shuffle (ops/gatherlib.py),
* each tile's while-loop exits as soon as *its* rays all terminate —
  coherent tiles (sky, nearby ground) finish in a few steps, which is the
  TPU replacement for per-warp early exit on GPU,
* radiance traces also fetch the hit column's schema word + exception mask
  while the tables are hot (block-id resolve needs no big XLA gather later).

Cost on v5e: ~7 ms per 1080p traversal wave, coherent or incoherent.
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


# NOTE: a range-bounded column gather (fori_loop over min..max of idx>>7
# with dynamic sublane loads) was measured SLOWER than the unrolled 32-row
# select loop on v5e (incoherent waves 17→24 ms): Mosaic's dynamic-bound
# loop + per-iteration dynamic sublane slice costs more per row than the
# static shuffle+select.  Keeping the oblivious table_gather.


def _make_kernel(p: dda.TraceParams, any_hit: bool, with_meta: bool):
    def kernel(ox, oy, oz, dx, dy, dz, tcap, colmask, dfrow, maxhrow,
               schema, excmask, *outs):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        rec = dda.trace(
            o, d, colmask[:], dfrow[0, :], p,
            t_cap=tcap[:], any_hit=any_hit,
            gather=table_gather,
            row_gather=lambda row, idx: lane_gather(row, idx),
            maxh_row=maxhrow[0, :],
            schema2d=schema[:] if with_meta else None,
            excmask2d=excmask[:] if with_meta else None,
        )
        vals = [rec.hit.astype(jnp.int32), rec.t, rec.ix, rec.iy, rec.iz,
                rec.nx, rec.ny, rec.nz]
        if with_meta:
            vals += [rec.schema,
                     jax.lax.bitcast_convert_type(rec.exc_mask, jnp.int32)]
        for ref, v in zip(outs, vals):
            ref[:] = v
    return kernel


@partial(jax.jit, static_argnames=("p", "any_hit", "with_meta"))
def _trace_tiles(ox, oy, oz, dx, dy, dz, tcap, colmask, dfrow, maxhrow,
                 schema, excmask, p: dda.TraceParams, any_hit: bool,
                 with_meta: bool):
    rows = ox.shape[0]
    grid = (rows // TILE,)
    tile_spec = pl.BlockSpec((TILE, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(colmask.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    df_spec = pl.BlockSpec((1, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM)

    def out(dtype):
        return jax.ShapeDtypeStruct((rows, LANES), dtype)

    out_shapes = [out(jnp.int32), out(jnp.float32), out(jnp.int32),
                  out(jnp.int32), out(jnp.int32), out(jnp.float32),
                  out(jnp.float32), out(jnp.float32)]
    if with_meta:
        out_shapes += [out(jnp.int32), out(jnp.int32)]
    fn = pl.pallas_call(
        _make_kernel(p, any_hit, with_meta),
        grid=grid,
        in_specs=[tile_spec] * 7 + [table_spec, df_spec, df_spec,
                                    table_spec, table_spec],
        out_specs=[tile_spec] * len(out_shapes),
        out_shape=out_shapes,
    )
    return fn(ox, oy, oz, dx, dy, dz, tcap, colmask, dfrow, maxhrow,
              schema, excmask)


def trace(o, d, colmask2d, df_row, p: dda.TraceParams, t_cap=None,
          any_hit: bool = False, maxh_row=None,
          schema2d=None, excmask2d=None) -> dda.HitRecord:
    """Drop-in replacement for dda.trace running as a Pallas TPU kernel.

    o, d: SoA arrays of any common shape; flattened into (TILE, 128) tiles.
    Pass schema2d/excmask2d to get hit-column metadata in the HitRecord.
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
    with_meta = schema2d is not None
    if schema2d is None:
        schema2d = jnp.zeros_like(colmask2d, jnp.int32)
        excmask2d = jnp.zeros_like(colmask2d)
    outs = _trace_tiles(
        prep(ox), prep(oy), prep(oz),
        prep(dx), prep(dy, fill=1.0), prep(dz), prep(tcap),
        colmask2d, df_row.reshape(1, LANES), maxh_row.reshape(1, LANES),
        schema2d, excmask2d.astype(jnp.uint32), p, any_hit, with_meta)

    def unprep(a):
        return a.reshape(-1)[:n].reshape(shape)

    hit, t, ix, iy, iz, nx, ny, nz = (unprep(a) for a in outs[:8])
    sch = em = None
    if with_meta:
        sch = unprep(outs[8])
        em = jax.lax.bitcast_convert_type(unprep(outs[9]), jnp.uint32)
    return dda.HitRecord(hit=hit != 0, t=t, ix=ix, iy=iy, iz=iz,
                         nx=nx, ny=ny, nz=nz, schema=sch, exc_mask=em)
