"""Ray ↔ voxel-grid traversal: 2-D column DDA with y-bitmask resolution.

This replaces the reference's entire acceleration-structure stack — OptiX
BLAS/IAS builds, SBT, and per-ray BVH traversal (renderer/core/OptixRenderer.cpp:
557-770, 1369-1529) and the CPU picking DDA (voxelengine/VoxelEngine.cu:
1040-1166) — with a TPU-shaped algorithm:

* March over (x, z) *columns* only (classic 3-D DDA restricted to 2 axes).
* Per column step, one table gather fetches a 32-bit occupancy mask of the
  column; the voxels crossed in y over the segment become a bit *range mask*,
  so the vertical axis resolves in O(1) bit arithmetic instead of steps.
* Empty-space skipping via a Chebyshev distance field over supercolumns
  (one 128-lane gather), replacing BVH early-outs.

The function is written over an abstract `gather(table2d, idx)` so the exact
same code runs as a pure-XLA reference (tests, CPU) and inside Pallas kernels
(ops/trace_kernel.py) where `gather` is the VMEM lane-shuffle primitive.

All control flow is a fixed-shape while loop with masked lanes — no
divergence, no recursion, no dynamic shapes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gatherlib import lane_gather  # noqa: F401 (Pallas kernels pass it as row_gather)

BIG = 1e30   # plain floats: jnp scalars would be captured as pallas constants
EPS = 1e-6


class TraceParams(NamedTuple):
    """Static world-shape constants baked into the trace."""
    x: int
    y: int
    z: int
    super_size: int
    super_z: int
    max_steps: int


class HitRecord(NamedTuple):
    hit: jnp.ndarray     # bool
    t: jnp.ndarray       # f32 ray parameter at hit (BIG on miss)
    ix: jnp.ndarray      # i32 hit voxel
    iy: jnp.ndarray
    iz: jnp.ndarray
    nx: jnp.ndarray      # f32 face normal (axis aligned, unit)
    ny: jnp.ndarray
    nz: jnp.ndarray
    # column metadata at the hit, fetched while the tables are hot in VMEM
    # (schema word + exception bitmask; 0 when not requested / on miss)
    schema: jnp.ndarray = None
    exc_mask: jnp.ndarray = None
    # in-kernel material resolve (trace_kernel mat_tables mode): material
    # index + the 11 material fields at the hit voxel (None if not requested)
    mi: jnp.ndarray = None
    mat: tuple = None


def _bit_index_lsb(bits):
    """Index of least-significant set bit of a uint32 (exact, integer-only)."""
    b = bits & (~bits + jnp.uint32(1))      # isolate lsb
    idx = jnp.zeros(bits.shape, jnp.int32)
    for shift in (16, 8, 4, 2, 1):
        big = (b >> jnp.uint32(shift)) != 0
        idx = idx + jnp.where(big, shift, 0)
        b = jnp.where(big, b >> jnp.uint32(shift), b)
    return idx


def _bit_index_msb(bits):
    """Index of most-significant set bit of a uint32 (exact, integer-only)."""
    b = bits
    idx = jnp.zeros(bits.shape, jnp.int32)
    for shift in (16, 8, 4, 2, 1):
        big = (b >> jnp.uint32(shift)) != 0
        idx = idx + jnp.where(big, shift, 0)
        b = jnp.where(big, b >> jnp.uint32(shift), b)
    return idx


def _range_mask(ylo, yhi):
    """uint32 with bits [ylo, yhi] set (empty if yhi < ylo after clamping)."""
    ylo_c = jnp.clip(ylo, 0, 31)
    yhi_c = jnp.clip(yhi, 0, 31)
    ones = jnp.uint32(0xFFFFFFFF)
    hi_mask = jnp.where(
        yhi_c >= 31, ones,
        (jnp.uint32(1) << (yhi_c + 1).astype(jnp.uint32)) - jnp.uint32(1))
    lo_mask = (jnp.uint32(1) << ylo_c.astype(jnp.uint32)) - jnp.uint32(1)
    mask = hi_mask & ~lo_mask
    return jnp.where(yhi >= ylo, mask, jnp.uint32(0))


def trace(o, d, colmask2d, df_row, p: TraceParams, t_cap=None, any_hit: bool = False,
          gather=None, row_gather=None, maxh_row=None,
          schema2d=None, excmask2d=None, col_gather=None):
    """Trace rays against the voxel world.

    o, d:       SoA ray origins / unit directions, any common shape S.
    colmask2d:  (R, 128) uint32 column occupancy table.
    df_row:     (128,) int32 supercolumn Chebyshev distance field.
    maxh_row:   (128,) int32 supercolumn max-height envelope (y+1); rays above
                it skip whole supercells. None disables the skip.
    t_cap:      optional f32 max distance per ray (shadow rays).
    any_hit:    stop at first intersection without resolving hit details.
    gather:     gather(table2d, flat_idx) — defaults to jnp.take (XLA path).

    Returns HitRecord with shape S.
    """
    if gather is None:
        def gather(tbl, idx):
            return jnp.take(tbl.reshape(-1), idx)
    if row_gather is None:
        def row_gather(row, idx):
            return jnp.take(row, idx)
    if col_gather is None:
        # per-step column-mask fetch; kernels may pass a cheaper
        # range-bounded implementation (see ops/trace_kernel.py)
        col_gather = lambda idx: gather(colmask2d, idx)

    ox, oy, oz = o
    dx, dy, dz = d
    shape = jnp.broadcast_shapes(ox.shape, dx.shape)
    f32 = jnp.float32
    ox, oy, oz, dx, dy, dz = (jnp.broadcast_to(a, shape).astype(f32)
                              for a in (ox, oy, oz, dx, dy, dz))

    X, Y, Z = p.x, p.y, p.z
    safe = lambda v: jnp.where(jnp.abs(v) < EPS, jnp.where(v >= 0, EPS, -EPS), v)
    inv_dx, inv_dy, inv_dz = 1.0 / safe(dx), 1.0 / safe(dy), 1.0 / safe(dz)

    # --- entry/exit of the column slab [0,X]×[0,Z] and the y slab [0,Y] ---
    tx0 = (0.0 - ox) * inv_dx
    tx1 = (X - ox) * inv_dx
    tz0 = (0.0 - oz) * inv_dz
    tz1 = (Z - oz) * inv_dz
    ty0 = (0.0 - oy) * inv_dy
    ty1 = (Y - oy) * inv_dy
    # degenerate axes: if |d_axis|≈0, inside-slab ⇒ (-inf, +inf), else empty
    def slab(lo_t, hi_t, d_axis, o_axis, size):
        tin = jnp.minimum(lo_t, hi_t)
        tout = jnp.maximum(lo_t, hi_t)
        degen = jnp.abs(d_axis) < EPS
        inside = (o_axis >= 0.0) & (o_axis < size)
        tin = jnp.where(degen, jnp.where(inside, -BIG, BIG), tin)
        tout = jnp.where(degen, jnp.where(inside, BIG, -BIG), tout)
        return tin, tout

    txi, txo = slab(tx0, tx1, dx, ox, X)
    tzi, tzo = slab(tz0, tz1, dz, oz, Z)
    tyi, tyo = slab(ty0, ty1, dy, oy, Y)
    t_enter = jnp.maximum(jnp.maximum(txi, tzi), jnp.maximum(tyi, 0.0))
    t_exit = jnp.minimum(jnp.minimum(txo, tzo), tyo)
    if t_cap is not None:
        t_exit = jnp.minimum(t_exit, t_cap)
    if maxh_row is not None:
        # Global-envelope exit cap: an ASCENDING ray can never hit anything
        # once it climbs past the world's tallest voxel, so its effective
        # exit is where it crosses y = max(maxh).  This retires the
        # straggler lanes (unoccluded sun-shadow rays, sky rays) in O(1)
        # instead of one supercell-skip step per cell — they were what kept
        # whole tiles alive in the any-hit shadow wave (the biggest trace
        # op in the round-5 2/3-rung device trace, 3.3 ms listed).
        maxh_g = jnp.max(maxh_row).astype(f32)
        t_gm = (maxh_g - oy) * inv_dy
        t_exit = jnp.where(dy > EPS, jnp.minimum(t_exit, t_gm), t_exit)
    miss_from_start = t_enter >= t_exit

    t = t_enter + EPS
    px = ox + dx * t
    pz = oz + dz * t
    ix = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, X - 1)
    iz = jnp.clip(jnp.floor(pz).astype(jnp.int32), 0, Z - 1)

    step_x = jnp.where(dx >= 0, 1, -1).astype(jnp.int32)
    step_z = jnp.where(dz >= 0, 1, -1).astype(jnp.int32)
    tdelta_x = jnp.abs(inv_dx)
    tdelta_z = jnp.abs(inv_dz)
    tmax_x = ((ix + (step_x > 0)).astype(f32) - ox) * inv_dx
    tmax_z = ((iz + (step_z > 0)).astype(f32) - oz) * inv_dz

    ss = p.super_size
    max_d = jnp.abs(jnp.stack([dx, dz])).max(axis=0)

    # tie zero-inits to traced values so their sharding "varying" type matches
    # the loop body under shard_map (jax vma typing); XLA folds the arithmetic
    zero_i32 = ix * 0
    zero_f32 = t * 0.0

    # entry face axis: whichever slab bounded t_enter (y included: rays can
    # enter the world through its top/bottom plane)
    enter_axis = jnp.where(
        (tyi >= txi) & (tyi >= tzi), 1, jnp.where(txi >= tzi, 0, 2)
    ).astype(jnp.int32)

    # NOTE: alive/hit are carried as int32 masks, not bools — Mosaic's layout
    # inference chokes on i1 vectors in scf.while carries (observed on v5e).
    state = dict(
        t=t, ix=ix, iz=iz, tmax_x=tmax_x, tmax_z=tmax_z,
        alive=(~miss_from_start).astype(jnp.int32),
        hit=zero_i32,
        step=jnp.int32(0),
    )
    if not any_hit:
        # any-hit (shadow/visibility) rays only need the occlusion bit:
        # the voxel id / face / exact-t resolution below (bit scans + 6
        # masked state updates per step) is dead weight for them — the
        # batched 3H shadow wave was ~40% of all trace time at the 1/2
        # dynamic-resolution rung (__closesthit__ shadow vs radiance split
        # role, OptixRenderer.h:49 two ray types)
        state.update(
            # last_axis: axis of the face through which the current column
            # was entered (0 = x, 1 = y [first segment only], 2 = z)
            last_axis=enter_axis,
            hit_t=zero_f32 + BIG,
            hit_ix=zero_i32, hit_iy=zero_i32, hit_iz=zero_i32,
            hit_axis=zero_i32,   # 0=x, 1=y, 2=z
        )

    def cond(s):
        return (s["step"] < p.max_steps) & jnp.any(s["alive"] != 0)

    def _body_core(s):
        alive = s["alive"] != 0
        prev_hit = s["hit"] != 0
        t0 = s["t"]
        t1 = jnp.minimum(jnp.minimum(s["tmax_x"], s["tmax_z"]), t_exit)

        # defensive: tmax accumulation can drift a hair below t_exit, letting a
        # lane test one column past the border — treat such columns as empty
        inb = ((s["ix"] >= 0) & (s["ix"] < X) & (s["iz"] >= 0) & (s["iz"] < Z))
        c = jnp.clip(s["ix"] * Z + s["iz"], 0, X * Z - 1)
        word = jnp.where(inb, col_gather(c), jnp.uint32(0))

        ya = oy + dy * t0
        yb = oy + dy * t1
        ylo = jnp.floor(jnp.minimum(ya, yb)).astype(jnp.int32)
        yhi = jnp.floor(jnp.maximum(ya, yb) - EPS).astype(jnp.int32)
        # degenerate horizontal ray exactly on an integer y plane: the EPS
        # pull-back makes yhi < ylo (empty range) even though the ray runs
        # through voxel floor(y) by this codebase's floor convention —
        # restore the single-voxel range (measure-zero case, but the
        # gameplay pick ray is exactly horizontal at pitch 0)
        yhi = jnp.maximum(yhi, ylo)
        # clamp out-of-world vertical range to empty
        ylo_cl = jnp.maximum(ylo, 0)
        yhi_cl = jnp.minimum(yhi, Y - 1)
        rmask = _range_mask(ylo_cl, yhi_cl)
        hitbits = word & rmask
        got = alive & (hitbits != 0)

        if not any_hit:
            # resolve the first voxel along travel direction
            yv = jnp.where(dy >= 0, _bit_index_lsb(hitbits),
                           _bit_index_msb(hitbits))
            ty_enter = (jnp.where(dy >= 0, yv, yv + 1).astype(f32) - oy) * inv_dy
            t_hit = jnp.maximum(t0, ty_enter)
            y_face = ty_enter > t0
            axis = jnp.where(y_face, 1, s["last_axis"])
            new_hit = got & ~prev_hit
            s_hit_t = jnp.where(new_hit, t_hit, s["hit_t"])
        s_hit = prev_hit | got

        # --- advance the non-hit lanes to the next column ---
        take_x = s["tmax_x"] < s["tmax_z"]
        t_next = jnp.where(take_x, s["tmax_x"], s["tmax_z"])
        nix = jnp.where(take_x, s["ix"] + step_x, s["ix"])
        niz = jnp.where(take_x, s["iz"], s["iz"] + step_z)
        ntmx = jnp.where(take_x, s["tmax_x"] + tdelta_x, s["tmax_x"])
        ntmz = jnp.where(take_x, s["tmax_z"], s["tmax_z"] + tdelta_z)
        if not any_hit:
            nlast = jnp.where(take_x, 0, 2)

        # --- supercolumn empty-space skipping ---
        sl = _log2(ss)
        scx = nix >> sl
        scz = niz >> sl
        sidx = jnp.clip(scx * p.super_z + scz, 0, 127)

        # (a) height-envelope skip: if the ray at t_next is above everything
        # in the next supercell, advance to the cell's xz exit (descending
        # rays additionally stop where they meet the envelope)
        jt = t_next
        if maxh_row is not None:
            maxh = row_gather(maxh_row, sidx).astype(f32)
            y_next = oy + dy * t_next
            above = y_next >= maxh + EPS
            t_cx = (((scx + (step_x > 0)) << sl).astype(f32) - ox) * inv_dx
            t_cz = (((scz + (step_z > 0)) << sl).astype(f32) - oz) * inv_dz
            t_cell = jnp.minimum(t_cx, t_cz)
            t_env = jnp.where(dy < -EPS, (maxh - oy) * inv_dy, BIG)
            t_skip = jnp.minimum(t_cell, t_env)
            jt = jnp.where(above, jnp.maximum(jt, t_skip), jt)

        # (b) Chebyshev-DF jump through fully empty columns (caves/air shafts)
        df = row_gather(df_row, sidx)
        t_df = t_next + ((df - 1) * ss).astype(f32) / jnp.maximum(max_d, EPS)
        jt = jnp.where((word == 0) & (df >= 2) & (max_d > EPS),
                       jnp.maximum(jt, t_df), jt)

        can_jump = jt > t_next + EPS
        jt = jnp.minimum(jt + EPS, t_exit)
        # re-derive DDA state at the jump point
        jpx = ox + dx * jt
        jpz = oz + dz * jt
        jix = jnp.clip(jnp.floor(jpx).astype(jnp.int32), 0, X - 1)
        jiz = jnp.clip(jnp.floor(jpz).astype(jnp.int32), 0, Z - 1)
        jtmx = ((jix + (step_x > 0)).astype(f32) - ox) * inv_dx
        jtmz = ((jiz + (step_z > 0)).astype(f32) - oz) * inv_dz

        nix = jnp.where(can_jump, jix, nix)
        niz = jnp.where(can_jump, jiz, niz)
        ntmx = jnp.where(can_jump, jtmx, ntmx)
        ntmz = jnp.where(can_jump, jtmz, ntmz)
        t_next = jnp.where(can_jump, jt, t_next)

        oob = (nix < 0) | (nix >= X) | (niz < 0) | (niz >= Z)
        done = got | (t_next >= t_exit) | oob
        upd = alive & ~done

        out = dict(
            t=jnp.where(upd, t_next, s["t"]),
            ix=jnp.where(upd, nix, s["ix"]),
            iz=jnp.where(upd, niz, s["iz"]),
            tmax_x=jnp.where(upd, ntmx, s["tmax_x"]),
            tmax_z=jnp.where(upd, ntmz, s["tmax_z"]),
            alive=(alive & ~done).astype(jnp.int32),
            hit=s_hit.astype(jnp.int32),
            step=s["step"] + 1,
        )
        if not any_hit:
            out.update(
                last_axis=jnp.where(upd, nlast, s["last_axis"]),
                hit_t=s_hit_t,
                hit_ix=jnp.where(new_hit, s["ix"], s["hit_ix"]),
                hit_iy=jnp.where(new_hit, yv, s["hit_iy"]),
                hit_iz=jnp.where(new_hit, s["iz"], s["hit_iz"]),
                hit_axis=jnp.where(new_hit, axis, s["hit_axis"]),
            )
        return out

    def body(s):
        # 2x unrolled: two exact DDA sub-steps per while iteration.  A
        # sub-step on an all-done state is a masked no-op, so results are
        # bit-identical to the rolled loop; what it saves is the per-
        # iteration loop tax (tile-wide any(alive) reduce + branch in
        # Mosaic), which is a fixed cost per column marched.
        return _body_core(_body_core(s))

    s = jax.lax.while_loop(cond, body, state)

    hit = s["hit"] != 0
    if any_hit:
        # occlusion-only record: t is the hitting column's entry t (a lower
        # bound on the exact voxel-entry t — callers only use it to bound
        # a follow-up entity any-hit test, where a lower bound is exact:
        # a nearer entity hit can only add occlusion the voxel already has)
        zi = s["ix"] * 0
        zf = s["t"] * 0.0
        return HitRecord(
            hit=hit, t=jnp.where(hit, s["t"], BIG),
            ix=zi, iy=zi, iz=zi, nx=zf, ny=zf, nz=zf)

    axis = s["hit_axis"]
    nx = jnp.where(axis == 0, -jnp.sign(dx), 0.0)
    ny = jnp.where(axis == 1, -jnp.sign(dy), 0.0)
    nz = jnp.where(axis == 2, -jnp.sign(dz), 0.0)

    # optional hit-column metadata fetch while tables are VMEM-resident
    # (one gather each instead of a 4096-wide XLA lookup later)
    sch = em = None
    if schema2d is not None:
        c_hit = jnp.clip(s["hit_ix"] * Z + s["hit_iz"], 0, X * Z - 1)
        sch = gather(schema2d, c_hit)
        em = gather(excmask2d, c_hit)

    return HitRecord(
        hit=hit,
        t=jnp.where(hit, s["hit_t"], BIG),
        ix=s["hit_ix"], iy=s["hit_iy"], iz=s["hit_iz"],
        nx=nx, ny=ny, nz=nz,
        schema=sch, exc_mask=em,
    )


def _log2(n: int) -> int:
    assert n & (n - 1) == 0
    return n.bit_length() - 1
