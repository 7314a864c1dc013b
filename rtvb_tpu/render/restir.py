"""Temporal ReSTIR DI: reservoir storage, reprojection, reuse, id-remap.

Capability parity with renderer/shaders/Restir.h + the temporal-reuse block
of closesthit.cu:636-785: double-buffered per-pixel DI reservoirs
(DIReservoir{lightData, uvData, weightSum, targetPdf, M}), reservoir combine
with M-cap 20, surface-similarity validation on reprojection, light-ID
remapping across light-set changes (prevLightIdToCurrentId, Restir.h:52-79).

Convention (RTXDI-style): a *stored* reservoir carries the unbiased
contribution weight W = wsum / (M · p̂_self); combining treats each input
reservoir as one candidate with weight w = p̂(sample at current surface) ·
W · M.  Bias-correction shadow rays against the previous frame's geometry
(closesthit.cu:708-785) are approximated by the surface-similarity tests —
the voxel world changes only through tracked edits, which invalidate
reservoirs via the id-remap instead.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import mathutil as m
from ..ops import bsdf as B
from ..ops.dda import BIG
from ..world.lighting import LightTable, light_radiance
from . import sky as sky_mod

KIND_NONE, KIND_LOCAL, KIND_SUN, KIND_SKY = 0, 1, 2, 3
M_CAP = 20   # closesthit.cu temporal M-cap


class ReSTIRState(NamedTuple):
    """Per-pixel stored reservoirs + the surface they were built on."""
    kind: jnp.ndarray     # (H, W) i32
    slot: jnp.ndarray     # (H, W) i32 light slot (local lights)
    face: jnp.ndarray     # (H, W) i32 cube face of the light sample
    fa: jnp.ndarray       # (H, W) f32 uv on the face
    fb: jnp.ndarray
    dx: jnp.ndarray       # (H, W) f32 direction (sun/sky samples)
    dy: jnp.ndarray
    dz: jnp.ndarray
    W: jnp.ndarray        # (H, W) f32 unbiased contribution weight
    M: jnp.ndarray        # (H, W) f32 candidate count
    depth: jnp.ndarray    # (H, W) surface depth (validation)
    nx: jnp.ndarray       # (H, W) surface normal
    ny: jnp.ndarray
    nz: jnp.ndarray


def initial_state(h: int, w: int) -> ReSTIRState:
    z = jnp.zeros((h, w))
    zi = jnp.zeros((h, w), jnp.int32)
    return ReSTIRState(kind=zi, slot=zi, face=zi, fa=z, fb=z,
                       dx=z, dy=z, dz=z, W=z, M=z,
                       depth=jnp.full((h, w), BIG), nx=z, ny=z, nz=z)


def reconstruct_sample(state_kind, state_slot, state_face, fa, fb, sdir,
                       p, lights: LightTable, sky_state):
    """Re-derive (dir, dist, le) of a stored light sample at surface point p
    (prev-frame surface reconstruction role, Restir.h:348-381)."""
    from ..ops.gatherlib import fast_gather_multi
    # local light: point on cube face from (slot, face, fa, fb)
    cslot = jnp.clip(state_slot, 0, lights.px.shape[0] - 1)
    bx, by, bz = fast_gather_multi((lights.px, lights.py, lights.pz), cslot)
    f = state_face
    fx = jnp.where(f == 0, 0.0, jnp.where(f == 1, 1.0, fa))
    fy = jnp.where(f == 2, 0.0, jnp.where(f == 3, 1.0, jnp.where(f < 2, fa, fb)))
    fz = jnp.where(f == 4, 0.0, jnp.where(f == 5, 1.0, fb))
    lp = (bx + fx, by + fy, bz + fz)
    to_l = m.sub(lp, p)
    dist_l = jnp.sqrt(jnp.maximum(m.length_sq(to_l), 1e-6))
    dir_local = m.scale(to_l, 1.0 / dist_l)
    le_local = light_radiance(lights, cslot)

    d_stored = (sdir[0], sdir[1], sdir[2])
    le_sun = sky_mod.sun_radiance(d_stored, sky_state)
    le_sky = sky_mod.sky_radiance(d_stored, sky_state)

    is_local = state_kind == KIND_LOCAL
    is_sun = state_kind == KIND_SUN
    is_sky = state_kind == KIND_SKY

    wi = m.where3(is_local, dir_local, d_stored)
    dist = jnp.where(is_local, dist_l, BIG)
    le = m.where3(is_sun, le_sun, m.where3(is_sky, le_sky, m.splat(0.0, bx)))
    le = m.where3(is_local, le_local, le)
    return wi, dist, le


def target_pdf(mat, n, wo, wi, le):
    f, _ = B.evaluate(mat, n, wo, wi)
    cos_i = jnp.maximum(m.dot(n, wi), 0.0)
    return m.luminance(tuple(fc * cos_i * lc for fc, lc in zip(f, le)))


def temporal_combine(cur_kind, cur_slot, cur_face, cur_fa, cur_fb, cur_dir,
                     cur_dist, cur_le, cur_wsum, cur_M, cur_phat,
                     prev: ReSTIRState, motion_u, motion_v,
                     depth, n, p, wo, mat,
                     lights: LightTable, sky_state, remap, u_take,
                     disocclusion_threshold: float = 0.2):
    """Merge the current-frame RIS reservoir with the reprojected previous
    reservoir (GRIS with confidence weights: each input reservoir is one
    candidate with w = c/(c_cur+c_prev) · p̂(sample at current surface) · W;
    final W = wsum/p̂_winner). Returns merged reservoir fields + final W."""
    import jax.lax as lax

    H, W_img = depth.shape
    u_cur = (jnp.arange(W_img) + 0.5)[None, :] / W_img
    v_cur = 1.0 - (jnp.arange(H) + 0.5)[:, None] / H
    # clamp invalid motion to identity; inb rejects those pixels downstream
    inb = (jnp.abs(motion_u) < 1.5) & (jnp.abs(motion_v) < 1.5)
    mu = jnp.where(inb, motion_u, 0.0)
    mv = jnp.where(inb, motion_v, 0.0)

    # nearest-warped reservoir fetch via the Pallas windowed-gather kernel
    # (prev-frame reservoir read role, closesthit.cu:636-705); int fields
    # ride as f32 bit patterns — the gather is pure shuffle, no arithmetic
    from ..ops.warp_kernel import dispatch_nearest
    bc = lambda a: lax.bitcast_convert_type(a, jnp.float32)
    pack = jnp.stack([
        bc(prev.kind), bc(prev.slot), bc(prev.face), prev.fa, prev.fb,
        prev.dx, prev.dy, prev.dz, prev.W, prev.M, prev.depth,
        prev.nx, prev.ny, prev.nz,
    ])
    sx = (u_cur + mu) * W_img - 0.5
    sy = (1.0 - (v_cur + mv)) * H - 0.5
    got, wvalid = dispatch_nearest(pack, sy, sx)
    inb = inb & wvalid
    pk = lax.bitcast_convert_type(got[0], jnp.int32)
    pslot = lax.bitcast_convert_type(got[1], jnp.int32)
    pface = lax.bitcast_convert_type(got[2], jnp.int32)
    pfa, pfb = got[3], got[4]
    pdir = (got[5], got[6], got[7])
    pW = got[8]
    pM = got[9]
    pdepth = got[10]
    pn = (got[11], got[12], got[13])

    # surface similarity (closesthit.cu:636-705); threshold is the relative
    # depth tolerance directly (round-1 had a hidden 2× fudge)
    depth_ok = jnp.abs(pdepth - depth) <= disocclusion_threshold * jnp.maximum(depth, 1.0)
    normal_ok = m.dot(pn, n) > 0.8
    valid = inb & depth_ok & normal_ok & (pk != KIND_NONE) & (depth < BIG)

    # light-ID remap across edits (Restir.h:52-79)
    from ..ops.gatherlib import fast_gather
    remapped = fast_gather(remap, jnp.clip(pslot, 0, remap.shape[0] - 1))
    local_gone = (pk == KIND_LOCAL) & (remapped < 0)
    pslot = jnp.where(pk == KIND_LOCAL, jnp.maximum(remapped, 0), pslot)
    valid = valid & ~local_gone

    # re-evaluate previous sample at the current surface
    pwi, pdist, ple = reconstruct_sample(pk, pslot, pface, pfa, pfb, pdir,
                                         p, lights, sky_state)
    phat_prev = jnp.where(valid, target_pdf(mat, n, wo, pwi, ple), 0.0)

    # confidence weights: current frame = 1, history capped at M_CAP
    pM = jnp.where(valid, jnp.minimum(pM, float(M_CAP)), 0.0)
    c_total = jnp.maximum(pM + 1.0, 1.0)
    W_cur = jnp.where(cur_phat > 1e-9, cur_wsum / jnp.maximum(cur_phat, 1e-9), 0.0)
    w_cur = (1.0 / c_total) * cur_phat * W_cur
    w_prev = (pM / c_total) * phat_prev * pW

    wsum = w_cur + w_prev
    take_prev = valid & ((u_take * jnp.maximum(wsum, 1e-20)) < w_prev)

    kind = jnp.where(take_prev, pk, cur_kind)
    slot = jnp.where(take_prev, pslot, cur_slot)
    face = jnp.where(take_prev, pface, cur_face)
    fa = jnp.where(take_prev, pfa, cur_fa)
    fb = jnp.where(take_prev, pfb, cur_fb)
    dirs = m.where3(take_prev, pwi, cur_dir)
    le = m.where3(take_prev, ple, cur_le)
    phat = jnp.where(take_prev, phat_prev, cur_phat)
    M_new = pM + 1.0
    W_new = jnp.where(phat > 1e-9, wsum / jnp.maximum(phat, 1e-9), 0.0)
    dist = jnp.where(take_prev, pdist, cur_dist)
    return kind, slot, face, fa, fb, dirs, dist, le, phat, wsum, M_new, W_new
