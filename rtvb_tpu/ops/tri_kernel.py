"""Pallas TPU kernel for entity-triangle intersection.

The XLA formulation (ops/triangles.py) streams triangle blocks through HBM
with a (..., 16) minor axis — a sub-lane layout that tiles 8x wastefully and
costs ~2 ms per 1080p wave for 16 triangles (~13 ms at character scale,
measured on v5e).  Here instead:

* triangle data (v0 | e1 | e2 rows) sits in SMEM — scalar memory next to
  the scalar core, read once per triangle per tile, broadcast into vector
  registers (the role OptiX gives its BLAS nodes in L2,
  OptixRenderer.cpp:487-555),
* rays keep their (tile_r, 128) screen tiles in VMEM,
* each tile slab-tests the whole entity AABB first and SKIPS the triangle
  loop when no ray in the tile can reach it — the TPU analog of a BVH root
  test; a character covering 5% of the screen costs ~5% of the brute sweep,
* the per-triangle Möller–Trumbore update is straight vector FMA on
  (tile_r, 128) registers with a running best — no HBM intermediates at all.

Dispatches from ops/triangles.intersect_packed on TPU; the XLA path remains
the reference twin for CPU tests.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gatherlib import LANES

BIG = 1e30
EPS = 1e-7
TILE_R = 32
MAX_TRIS = 2048       # SMEM budget: 10 rows * 2048 * 4 B = 80 KB


def _make_kernel(n_tri: int, any_hit: bool):
    def kernel(trid, aabb, ox, oy, oz, dx, dy, dz, tcap,
               hit_o, t_o, tri_o, u_o, v_o):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        cap = tcap[:]

        # miss defaults (always written; the loop overwrites on hit)
        hit_o[:] = jnp.zeros_like(o[0], jnp.int32)
        t_o[:] = jnp.full_like(o[0], BIG)
        tri_o[:] = jnp.full_like(o[0], -1, jnp.int32)
        u_o[:] = jnp.zeros_like(o[0])
        v_o[:] = jnp.zeros_like(o[0])

        # --- entity-AABB slab test: can ANY ray in this tile reach it? ---
        inv = lambda c: 1.0 / jnp.where(jnp.abs(c) < 1e-12,
                                        jnp.where(c >= 0, 1e-12, -1e-12), c)
        t0x = (aabb[0, 0] - o[0]) * inv(d[0])
        t1x = (aabb[0, 3] - o[0]) * inv(d[0])
        t0y = (aabb[0, 1] - o[1]) * inv(d[1])
        t1y = (aabb[0, 4] - o[1]) * inv(d[1])
        t0z = (aabb[0, 2] - o[2]) * inv(d[2])
        t1z = (aabb[0, 5] - o[2]) * inv(d[2])
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        reach = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin <= cap)
        need = jnp.any(reach)

        @pl.when(need)
        def _sweep():
            def body(i, state):
                bt, bi, bu, bv, done = state
                v0x = trid[0, i]
                v0y = trid[1, i]
                v0z = trid[2, i]
                e1x = trid[3, i]
                e1y = trid[4, i]
                e1z = trid[5, i]
                e2x = trid[6, i]
                e2y = trid[7, i]
                e2z = trid[8, i]
                px = d[1] * e2z - d[2] * e2y
                py = d[2] * e2x - d[0] * e2z
                pz = d[0] * e2y - d[1] * e2x
                det = e1x * px + e1y * py + e1z * pz
                idet = jnp.where(jnp.abs(det) > EPS, 1.0 / det, 0.0)
                tx = o[0] - v0x
                ty = o[1] - v0y
                tz = o[2] - v0z
                u = (tx * px + ty * py + tz * pz) * idet
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (d[0] * qx + d[1] * qy + d[2] * qz) * idet
                t = (e2x * qx + e2y * qy + e2z * qz) * idet
                ok = ((idet != 0.0) & (u >= 0.0) & (v >= 0.0)
                      & (u + v <= 1.0) & (t > 1e-4) & (t < cap) & (t < bt))
                bt = jnp.where(ok, t, bt)
                bi = jnp.where(ok, i, bi)
                bu = jnp.where(ok, u, bu)
                bv = jnp.where(ok, v, bv)
                if any_hit:
                    done = jnp.all(bt < BIG)
                return bt, bi, bu, bv, done

            init = (t_o[:], tri_o[:], u_o[:], v_o[:], jnp.bool_(False))
            if any_hit:
                def cond(state_i):
                    i, st = state_i
                    return (i < n_tri) & ~st[4]

                def wbody(state_i):
                    i, st = state_i
                    return i + 1, body(i, st)
                _, (bt, bi, bu, bv, _) = jax.lax.while_loop(
                    cond, wbody, (jnp.int32(0), init))
            else:
                bt, bi, bu, bv, _ = jax.lax.fori_loop(0, n_tri, body, init)
            found = bt < BIG
            hit_o[:] = found.astype(jnp.int32)
            t_o[:] = bt
            tri_o[:] = jnp.where(found, bi, -1)
            u_o[:] = bu
            v_o[:] = bv
    return kernel


@partial(jax.jit, static_argnames=("n_tri", "any_hit", "tile_r"))
def _tri_tiles(trid, aabb, ox, oy, oz, dx, dy, dz, tcap,
               n_tri: int, any_hit: bool, tile_r: int):
    H, W = ox.shape
    grid = (H // tile_r, W // LANES)
    tile = pl.BlockSpec((tile_r, LANES), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(trid.shape, lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)
    smem_box = pl.BlockSpec(aabb.shape, lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    out = lambda dt: jax.ShapeDtypeStruct((H, W), dt)
    fn = pl.pallas_call(
        _make_kernel(n_tri, any_hit),
        grid=grid,
        in_specs=[smem, smem_box] + [tile] * 7,
        out_specs=[tile] * 5,
        out_shape=[out(jnp.int32), out(jnp.float32), out(jnp.int32),
                   out(jnp.float32), out(jnp.float32)],
    )
    return fn(trid, aabb, ox, oy, oz, dx, dy, dz, tcap)


def _pick_tile_r(hp: int) -> int:
    best = 8
    r = 8
    while r <= TILE_R:
        if hp % r == 0:
            best = r
        r += 8
    return best


def intersect_packed_tpu(o, d, tri_packed, t_cap=None):
    """Kernel twin of triangles.intersect_packed — same TriHit semantics."""
    from .triangles import TriHit

    ox, oy, oz = (jnp.asarray(a, jnp.float32) for a in o)
    dx, dy, dz = (jnp.asarray(a, jnp.float32) for a in d)
    shape = jnp.broadcast_shapes(ox.shape, dx.shape)
    tcap = (jnp.full(shape, BIG, jnp.float32) if t_cap is None
            else jnp.broadcast_to(jnp.asarray(t_cap, jnp.float32), shape))

    T = tri_packed.shape[0]
    assert T <= MAX_TRIS, f"entity soup {T} > {MAX_TRIS} tris"

    # SMEM row layout: (10, T) — 9 packed floats + a pad row (sublane align)
    trid = jnp.concatenate(
        [tri_packed.T, jnp.zeros((1, T), jnp.float32)], axis=0)
    # entity AABB over real (non-degenerate) triangles for the tile cull;
    # zero-row padding would otherwise pin the box to the origin
    v0 = tri_packed[:, 0:3]
    e1 = tri_packed[:, 3:6]
    e2 = tri_packed[:, 6:9]
    degen = jnp.all(tri_packed == 0.0, axis=1, keepdims=True)
    lo_d = jnp.where(degen, BIG, 0.0)
    hi_d = jnp.where(degen, -BIG, 0.0)
    pts_lo = jnp.minimum(jnp.minimum(v0, v0 + e1), v0 + e2) + lo_d
    pts_hi = jnp.maximum(jnp.maximum(v0, v0 + e1), v0 + e2) + hi_d
    box_lo = pts_lo.min(0) - 1e-3
    box_hi = pts_hi.max(0) + 1e-3
    aabb = jnp.concatenate([box_lo, box_hi]).reshape(1, 6)

    if len(shape) == 2:
        H, W = shape
        Hp = H + (-H) % 8
        Wp = W + (-W) % LANES

        def prep(a, fill=0.0):
            a = jnp.broadcast_to(a, shape)
            if Hp > H or Wp > W:
                a = jnp.pad(a, ((0, Hp - H), (0, Wp - W)),
                            constant_values=fill)
            return a

        def unprep(a):
            return a[:H, :W] if (Hp > H or Wp > W) else a
    else:
        n = 1
        for s in shape:
            n *= s
        pad = (-n) % (8 * LANES)
        Hp, Wp = (n + pad) // LANES, LANES

        def prep(a, fill=0.0):
            a = jnp.broadcast_to(a, shape).reshape(-1)
            if pad:
                a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
            return a.reshape(Hp, LANES)

        def unprep(a):
            return a.reshape(-1)[:n].reshape(shape)

    outs = _tri_tiles(trid, aabb,
                      prep(ox), prep(oy, fill=1e6), prep(oz),
                      prep(dx), prep(dy, fill=1.0), prep(dz),
                      prep(tcap),
                      n_tri=T, any_hit=False, tile_r=_pick_tile_r(Hp))
    hit, t, tri, u, v = (unprep(a) for a in outs)
    return TriHit(hit=hit != 0, t=t, tri=tri, u=u, v=v)
