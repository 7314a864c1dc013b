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
# with dynamic sublane loads OR dynamic VMEM-ref row loads) was measured
# SLOWER than the unrolled static select loop on v5e (incoherent waves
# 17→24 ms round 3; re-tried round 5 with ref row loads: shadow wave
# 3.3→13.9 ms listed).  Mosaic's dynamic-bound loop costs far more per row
# than the static shuffle+select.  Instead the per-step fetch below uses a
# 4×-packed HEIGHT byte table for the (ubiquitous) pure-heightfield
# columns — see _pack_heights.


def _pack_heights(colmask2d):
    """Per-column height bytes, 4 columns per u32 word: (R, 128) colmask →
    (R/4, 128) packed table.

    A column whose occupancy is a pure heightfield (mask == (1<<h)-1) is
    fully described by its height h ∈ [0, 32]; byte 255 flags the
    irregular remainder (overhangs, player-carved caves), which falls back
    to the exact mask gather in-kernel.  The per-step column fetch is the
    trace loop's hottest sequence — the packed table needs R/4 lane
    shuffles instead of R (R = 32 for the 64×64 world)."""
    R = colmask2d.shape[0]
    cm = colmask2d
    h = jnp.zeros(cm.shape, jnp.int32)
    b = cm
    for shift in (16, 8, 4, 2, 1):
        big = (b >> jnp.uint32(shift)) != 0
        h = h + jnp.where(big, shift, 0)
        b = jnp.where(big, b >> jnp.uint32(shift), b)
    h = jnp.where(cm != 0, h + 1, 0)
    full = jnp.uint32(0xFFFFFFFF)
    synth = jnp.where(h >= 32, full,
                      (jnp.uint32(1) << jnp.clip(h, 0, 31).astype(jnp.uint32))
                      - jnp.uint32(1))
    hb = jnp.where(synth == cm, h, 255).astype(jnp.uint32)
    # byte-pack: flat column c = r*128 + 4q + k → packed word pc = c >> 2
    # at row pc>>7 = r>>2, lane (r&3)*32 + q, byte k (little-endian)
    hb = hb.reshape(R, 32, 4)
    w = (hb[:, :, 0] | (hb[:, :, 1] << 8) | (hb[:, :, 2] << 16)
         | (hb[:, :, 3] << 24))                      # (R, 32)
    return w.reshape(R // 4, LANES)


def _make_kernel(p: dda.TraceParams, any_hit: bool, with_meta: bool,
                 with_mat: bool = False, n_exc: int = 0):
    def kernel(ox, oy, oz, dx, dy, dz, tcap, colmask, htab, dfrow, maxhrow,
               schema, excmask, *rest):
        if with_mat:
            exc_key, exc_id, b2m, fields = rest[:4]
            outs = rest[4:]
        else:
            outs = rest
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])

        def col_gather(idx):
            # height-byte fast path: R/4-row gather + byte extract, exact
            # word synthesis for heightfield columns; tile-uniform fallback
            # to the full mask gather when any lane touches an irregular
            # column (rare: player-carved overhangs)
            pw = table_gather(htab[:], jnp.right_shift(idx, 2))
            sh = (jnp.bitwise_and(idx, 3) << 3).astype(jnp.uint32)
            h = (pw >> sh) & jnp.uint32(0xFF)
            full = jnp.uint32(0xFFFFFFFF)
            word = jnp.where(
                h >= 32, full,
                (jnp.uint32(1) << h) - jnp.uint32(1))
            irr = h == 255
            return jax.lax.cond(
                jnp.any(irr),
                lambda: jnp.where(irr, table_gather(colmask[:], idx), word),
                lambda: word)

        rec = dda.trace(
            o, d, colmask[:], dfrow[0, :], p,
            t_cap=tcap[:], any_hit=any_hit,
            gather=table_gather,
            row_gather=lambda row, idx: lane_gather(row, idx),
            col_gather=col_gather,
            maxh_row=maxhrow[0, :],
            schema2d=schema[:] if (with_meta or with_mat) else None,
            excmask2d=excmask[:] if (with_meta or with_mat) else None,
        )
        vals = [rec.hit.astype(jnp.int32), rec.t, rec.ix, rec.iy, rec.iz,
                rec.nx, rec.ny, rec.nz]
        if with_meta:
            vals += [rec.schema,
                     jax.lax.bitcast_convert_type(rec.exc_mask, jnp.int32)]
        if with_mat:
            # Block-id + material resolve while the tables sit in VMEM:
            # replaces the XLA-side one-hot keyed_lookup over the exception
            # list and the material field gathers (~17 ms/frame of
            # select/compare-reduce fusions at 1080p in the round-3 profile).
            # Equivalent of the reference's SBT materialIndex lookup
            # (closesthit.cu:854-901) done in the hit program.
            sch = rec.schema
            # schema_block_id (world/voxel.py:120) inlined — ops must not
            # import world (layering)
            h1 = sch & 31
            h2 = (sch >> 5) & 31
            bid = jnp.where(rec.iy < h1, (sch >> 10) & 63,
                            jnp.where(rec.iy < h2, (sch >> 16) & 63,
                                      (sch >> 22) & 63))
            iy_c = jnp.clip(rec.iy, 0, 31)
            has_exc = ((rec.exc_mask >> iy_c.astype(jnp.uint32))
                       & jnp.uint32(1)) == 1
            c = jnp.clip(rec.ix * p.z + rec.iz, 0, p.x * p.z - 1)
            key = c * p.y + rec.iy
            # lower_bound binary search over the sorted exception keys
            # (n_exc is a power of two >= 128)
            lo = jnp.zeros(key.shape, jnp.int32)
            b = n_exc >> 1
            while b:
                probe = table_gather(exc_key, lo + (b - 1))
                lo = jnp.where(probe < key, lo + b, lo)
                b >>= 1
            lo = jnp.clip(lo, 0, n_exc - 1)
            found = table_gather(exc_key, lo) == key
            exc_bid = table_gather(exc_id, lo)
            bid = jnp.where(has_exc & found, exc_bid, bid)
            mi = lane_gather(b2m[0, :], jnp.clip(bid, 0, LANES - 1))
            mi = jnp.where(rec.hit, mi, 0)
            vals.append(mi)
            mi_c = jnp.clip(mi, 0, LANES - 1)
            for k in range(N_MAT_FIELDS):
                vals.append(lane_gather(fields[k, :], mi_c))
        for ref, v in zip(outs, vals):
            ref[:] = v
    return kernel


N_MAT_FIELDS = 11   # albedo rgb, emissive rgb, rough, metal, trans, tex, uv


@partial(jax.jit, static_argnames=("p", "any_hit", "with_meta", "with_mat",
                                   "tile_r"))
def _trace_tiles(ox, oy, oz, dx, dy, dz, tcap, colmask, htab, dfrow, maxhrow,
                 schema, excmask, exc_key, exc_id, b2m, fields,
                 p: dda.TraceParams, any_hit: bool,
                 with_meta: bool, with_mat: bool, tile_r: int = TILE):
    """2-D grid of (tile_r, 128) pixel tiles over (H, W) arrays.

    Callers keep arrays in their native (H, W) screen layout — no
    flatten/relayout copies around the wave (the round-3 profile showed
    ~10 ms/frame of reshape fusions from the old (rows, 128) repacking)."""
    H, W = ox.shape
    grid = (H // tile_r, W // LANES)
    tile_spec = pl.BlockSpec((tile_r, LANES), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)

    def full_spec(a):
        return pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    def out(dtype):
        return jax.ShapeDtypeStruct((H, W), dtype)

    out_shapes = [out(jnp.int32), out(jnp.float32), out(jnp.int32),
                  out(jnp.int32), out(jnp.int32), out(jnp.float32),
                  out(jnp.float32), out(jnp.float32)]
    if with_meta:
        out_shapes += [out(jnp.int32), out(jnp.int32)]
    in_specs = [tile_spec] * 7 + [full_spec(colmask), full_spec(htab),
                                  full_spec(dfrow),
                                  full_spec(maxhrow), full_spec(schema),
                                  full_spec(excmask)]
    args = [ox, oy, oz, dx, dy, dz, tcap, colmask, htab, dfrow, maxhrow,
            schema, excmask]
    n_exc = 0
    if with_mat:
        out_shapes += [out(jnp.int32)] + [out(jnp.float32)] * N_MAT_FIELDS
        in_specs += [full_spec(exc_key), full_spec(exc_id),
                     full_spec(b2m), full_spec(fields)]
        args += [exc_key, exc_id, b2m, fields]
        n_exc = exc_key.shape[0] * exc_key.shape[1]
    fn = pl.pallas_call(
        _make_kernel(p, any_hit, with_meta, with_mat, n_exc),
        grid=grid,
        in_specs=in_specs,
        out_specs=[tile_spec] * len(out_shapes),
        out_shape=out_shapes,
    )
    return fn(*args)


def _pick_tile_r(hp: int) -> int:
    """Largest multiple-of-8 divisor of hp that is <= 24 (tile row count).

    Small-ish tiles win: the per-tile while-loop exits when *all* the
    tile's rays terminate, so smaller tiles stop waiting on stragglers
    sooner.  Measured on v5e at 1080p: incoherent waves 16.6 ms at 40
    rows → 15.8 ms at 24; coherent 3.16 → 3.09 at 16; below 16 rows the
    per-tile fixed cost wins back (8 rows: 20.1 ms incoherent).  They
    also keep the ~27 in/out channels + DDA loop state well inside the
    16 MB scoped-VMEM budget."""
    best = 8
    r = 8
    while r <= 24:
        if hp % r == 0:
            best = r
        r += 8
    return best


def trace(o, d, colmask2d, df_row, p: dda.TraceParams, t_cap=None,
          any_hit: bool = False, maxh_row=None,
          schema2d=None, excmask2d=None, mat_tables=None,
          tile_rows: int | None = None) -> dda.HitRecord:
    """Drop-in replacement for dda.trace running as a Pallas TPU kernel.

    o, d: SoA arrays of any common shape; 2-D (H, W) arrays are tiled in
    place, other ranks are flattened into (rows, 128) tiles.
    Pass schema2d/excmask2d to get hit-column metadata in the HitRecord.
    Pass mat_tables=(exc_key2d, exc_id2d, b2m_row, fields) (see
    build_mat_tables) to resolve block id -> material index + the 11
    material fields inside the kernel (HitRecord.mi / HitRecord.mat).
    """
    ox, oy, oz = (jnp.asarray(a, jnp.float32) for a in o)
    dx, dy, dz = (jnp.asarray(a, jnp.float32) for a in d)
    shape = jnp.broadcast_shapes(ox.shape, dx.shape)

    tcap = (jnp.full(shape, dda.BIG, jnp.float32) if t_cap is None
            else jnp.broadcast_to(jnp.asarray(t_cap, jnp.float32), shape))

    # choose a 2-D (Hp, Wp) layout: native (H, W) screen arrays stay put
    # (zero relayout when H%8 == 0 and W%128 == 0 — the 1080p / 720p case);
    # other ranks flatten to (n/128, 128) like before
    if len(shape) == 2:
        H, W = shape
        Hp = H + (-H) % 8
        Wp = W + (-W) % LANES
        if _pick_tile_r(Hp) < 16:
            # no decent tile divisor (e.g. half-res GI waves at 360 rows →
            # 8-row tiles, the measured-pathological size — see
            # _pick_tile_r): pad to the next multiple of 24 with neutral
            # rays instead (≤6.7% extra lanes ≪ the small-tile penalty)
            Hp = H + (-H) % 24

        def prep(a, fill=0.0):
            a = jnp.broadcast_to(a, shape)
            if Hp > H or Wp > W:
                # neutral rays in the pad: origin above the world, pointing
                # up, t_cap untouched (they miss in one envelope check)
                a = jnp.pad(a, ((0, Hp - H), (0, Wp - W)),
                            constant_values=fill)
            return a

        def unprep(a):
            return a[:H, :W] if (Hp > H or Wp > W) else a
    else:
        n = 1
        for s in shape:
            n *= s
        Wp = LANES
        pad = (-n) % (8 * LANES)
        Hp = (n + pad) // LANES

        def prep(a, fill=0.0):
            a = jnp.broadcast_to(a, shape).reshape(-1)
            if pad:
                a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
            return a.reshape(Hp, LANES)

        def unprep(a):
            return a.reshape(-1)[:n].reshape(shape)

    tile_r = tile_rows if (tile_rows is not None and Hp % tile_rows == 0) \
        else _pick_tile_r(Hp)

    if maxh_row is None:
        # conservative envelope (= world height): skip only above the world
        maxh_row = jnp.full((LANES,), p.y, jnp.int32)
    with_mat = mat_tables is not None
    with_meta = schema2d is not None and not with_mat
    if with_mat:
        schema2d, excmask2d, exc_key2d, exc_id2d, b2m_row, fields = mat_tables
    else:
        exc_key2d = exc_id2d = jnp.zeros((1, LANES), jnp.int32)
        b2m_row = jnp.zeros((1, LANES), jnp.int32)
        fields = jnp.zeros((N_MAT_FIELDS, LANES), jnp.float32)
    if schema2d is None:
        schema2d = jnp.zeros_like(colmask2d, jnp.int32)
        excmask2d = jnp.zeros_like(colmask2d)
    outs = _trace_tiles(
        prep(ox), prep(oy, fill=1e4), prep(oz),
        prep(dx), prep(dy, fill=1.0), prep(dz), prep(tcap),
        colmask2d, _pack_heights(colmask2d),
        df_row.reshape(1, LANES), maxh_row.reshape(1, LANES),
        schema2d, excmask2d.astype(jnp.uint32),
        exc_key2d, exc_id2d, b2m_row, fields,
        p, any_hit, with_meta, with_mat, tile_r)

    hit, t, ix, iy, iz, nx, ny, nz = (unprep(a) for a in outs[:8])
    sch = em = mi = mat = None
    if with_meta:
        sch = unprep(outs[8])
        em = jax.lax.bitcast_convert_type(unprep(outs[9]), jnp.uint32)
    if with_mat:
        mi = unprep(outs[8])
        mat = tuple(unprep(a) for a in outs[9:9 + N_MAT_FIELDS])
    return dda.HitRecord(hit=hit != 0, t=t, ix=ix, iy=iy, iz=iz,
                         nx=nx, ny=ny, nz=nz, schema=sch, exc_mask=em,
                         mi=mi, mat=mat)


def build_mat_tables(world, mats):
    """Pad the world exception list + material tables into the VMEM row
    layout the kernel's epilogue expects.  Cheap jnp ops — call inside jit
    with the traced world so edits flow through.

    Requires n_blocks <= 128 and n_materials <= 128 (both ~25 in practice;
    the exception list is any power of two >= 128).  The world schema +
    exception-bitmask tables ride along (the kernel needs them for the
    schema block-id arithmetic)."""
    exc_key2d = world.exc_key.reshape(-1, LANES)
    exc_id2d = world.exc_id.reshape(-1, LANES)

    def pad_row(a, dtype):
        a = jnp.asarray(a, dtype)
        assert a.shape[0] <= LANES, a.shape
        return jnp.pad(a, (0, LANES - a.shape[0]))[None, :]

    b2m_row = pad_row(mats.block_to_mat, jnp.int32)
    fields = jnp.concatenate([
        pad_row(mats.albedo[:, 0], jnp.float32),
        pad_row(mats.albedo[:, 1], jnp.float32),
        pad_row(mats.albedo[:, 2], jnp.float32),
        pad_row(mats.emissive[:, 0], jnp.float32),
        pad_row(mats.emissive[:, 1], jnp.float32),
        pad_row(mats.emissive[:, 2], jnp.float32),
        pad_row(mats.roughness, jnp.float32),
        pad_row(mats.metallic, jnp.float32),
        pad_row(mats.translucency, jnp.float32),
        pad_row(mats.texture_id, jnp.float32),
        pad_row(mats.uv_scale, jnp.float32),
    ], axis=0)
    return (world.schema, world.exc_mask, exc_key2d, exc_id2d, b2m_row,
            fields)
