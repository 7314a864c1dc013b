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
    """Per-pixel stored reservoirs + the surface they were built on,
    PACKED into 8 f32 planes (HalfPrecision.h / fp16 LightInfo role,
    Light.h:13-23):

        0  kind|slot        (int pack, 2 bits kind)
        1  fa|fb            (bf16 pair: triangle barycentrics)
        2  du|dv            (bf16 pair: octahedral sample direction)
        3  W                (f32 unbiased contribution weight)
        4  M|le_b           (bf16 pair: candidate count, radiance blue)
        5  depth            (f32, validation surface)
        6  nu|nv            (bf16 pair: octahedral surface normal)
        7  le_r|le_g        (bf16 pair: cached sample radiance — sun/sky
                             radiance is expensive to re-derive; LOCAL
                             samples re-read the light table instead.  A
                             big time-of-day jump resets reservoirs.)

    Storing the packed form (a) halves reservoir HBM traffic, (b) is
    exactly what the temporal warp kernel gathers — no per-frame pack
    pass, and (c) gives the frame ONE stacked (8, H, W) reservoir output
    root instead of 17 planes: XLA duplicated the whole temporal-combine
    chain into three per-plane loop fusions otherwise (~1.2 ms/frame at
    the 1/2 dynamic-resolution rung)."""
    data: jnp.ndarray     # (8, H, W) f32


def pack_state(kind, slot, fa, fb, dir3, W, M, depth, n3, le) -> ReSTIRState:
    """Build the packed per-pixel reservoir state (one stacked root)."""
    from ..ops.pack import pack2, pack_int, octa_encode
    du, dv = octa_encode(dir3)
    nu, nv = octa_encode(n3)
    return ReSTIRState(data=jnp.stack([
        pack_int(kind, slot, 2),
        pack2(fa, fb),
        pack2(du, dv),
        W,
        pack2(M, le[2]),
        depth,
        pack2(nu, nv),
        pack2(le[0], le[1]),
    ]))


def _shift_dyn(arr, dy, dx, axes, max_off: int = 2):
    """roll(+dy,+dx)-like shift with EDGE CLAMP instead of wraparound, for
    traced integer offsets |dy|,|dx| <= max_off: edge-pad once, then
    dynamic-slice at (max_off - dy, max_off - dx)."""
    import jax.lax as lax
    pad = [(0, 0)] * arr.ndim
    for ax in axes:
        pad[ax] = (max_off, max_off)
    padded = jnp.pad(arr, pad, mode="edge")
    starts = [jnp.int32(0)] * arr.ndim
    starts[axes[0]] = jnp.clip(max_off - dy, 0, 2 * max_off)
    starts[axes[1]] = jnp.clip(max_off - dx, 0, 2 * max_off)
    return lax.dynamic_slice(padded, starts, arr.shape)


def initial_state(h: int, w: int) -> ReSTIRState:
    # planes 0-4 zero (kind NONE, zero weights), plane 5 depth = BIG,
    # planes 6-7 zero (see the ReSTIRState plane table)
    z5 = jnp.zeros((5, h, w))
    return ReSTIRState(data=jnp.concatenate([
        z5, jnp.full((1, h, w), BIG, jnp.float32), jnp.zeros((2, h, w))]))


def reconstruct_sample(state_kind, state_slot, state_face, fa, fb, sdir,
                       p, lights: LightTable, sky_state, stored_le=None):
    """Re-derive (dir, dist, le) of a stored light sample at surface point p
    (prev-frame surface reconstruction role, Restir.h:348-381).  Local
    samples are triangle-light points from (slot, barycentrics fa/fb).

    stored_le: cached (r, g, b) of the sample.  When given, sun/sky radiance
    comes from the cache (static within a frame; saves two Preetham evals
    per tap); local radiance is always re-read from the light table."""
    from ..world.lighting import reconstruct_light_point
    cslot = jnp.clip(state_slot, 0, lights.v0x.shape[0] - 1)
    lp = reconstruct_light_point(lights, cslot, fa, fb)
    to_l = m.sub(lp, p)
    dist_l = jnp.sqrt(jnp.maximum(m.length_sq(to_l), 1e-6))
    dir_local = m.scale(to_l, 1.0 / dist_l)
    le_local = light_radiance(lights, cslot)

    d_stored = (sdir[0], sdir[1], sdir[2])
    is_local = state_kind == KIND_LOCAL
    is_sun = state_kind == KIND_SUN
    is_sky = state_kind == KIND_SKY

    if stored_le is None:
        le_sun = sky_mod.sun_radiance(d_stored, sky_state)
        le_sky = sky_mod.sky_radiance(d_stored, sky_state)
        le = m.where3(is_sun, le_sun,
                      m.where3(is_sky, le_sky, m.splat(0.0, lp[0])))
    else:
        le = m.where3(is_sun | is_sky, stored_le, m.splat(0.0, lp[0]))

    wi = m.where3(is_local, dir_local, d_stored)
    dist = jnp.where(is_local, dist_l, BIG)
    le = m.where3(is_local, le_local, le)
    return wi, dist, le


def target_pdf(mat, n, wo, wi, le):
    """RIS target p-hat — the luminance-proxy BSDF (ops/bsdf.eval_lum),
    matching the definition used for the current-frame candidates in
    pathtracer._nee_ris so stored and fresh reservoirs stay comparable."""
    f_lum, _ = B.eval_lum(mat, n, wo, wi)
    cos_i = jnp.maximum(m.dot(n, wi), 0.0)
    return f_lum * cos_i * m.luminance(le)


def warp_taps(prev: ReSTIRState, motion_u, motion_v, frame_idx,
              n_taps: int):
    """Warped previous-reservoir fetches for the temporal taps.

    Tap 0 is the exact nearest reprojection through the Pallas windowed
    gather; taps 1+ are edge-CLAMPED frame-varying integer offsets of tap 0
    (reflected-clamp role of closesthit.cu:660-671 — jnp.roll would wrap,
    letting border pixels read reservoirs from the opposite screen edge).
    Returns a list of (planes (8, H, W) f32, valid (H, W) bool) — the raw
    packed state; callers unpack (temporal_combine here, or the fused
    shading kernel render/ris_kernel.py in VMEM)."""
    H, W_img = motion_u.shape
    u_cur = (jnp.arange(W_img) + 0.5)[None, :] / W_img
    v_cur = 1.0 - (jnp.arange(H) + 0.5)[:, None] / H
    # clamp invalid motion to identity; inb rejects those pixels downstream
    inb0 = (jnp.abs(motion_u) < 1.5) & (jnp.abs(motion_v) < 1.5)
    mu = jnp.where(inb0, motion_u, 0.0)
    mv = jnp.where(inb0, motion_v, 0.0)

    from ..ops.warp_kernel import dispatch_nearest
    pack = prev.data
    sx = (u_cur + mu) * W_img - 0.5
    sy = (1.0 - (v_cur + mv)) * H - 0.5
    got0, wvalid = dispatch_nearest(pack, sy, sx)
    valid0 = inb0 & wvalid

    # frame-varying jitter offsets for the extra taps (R2-ish integer cycle);
    # generated programmatically so any n_taps works (primes decorrelate taps)
    fi = jnp.asarray(frame_idx, jnp.int32)
    _PRIMES = (2, 3, 5, 7, 11, 13, 17, 19)
    offs = [((fi * _PRIMES[i % len(_PRIMES)] + i + 1) % 5 - 2)
            * (-1 if i % 3 == 2 else 1)
            for i in range(2 * max(n_taps - 1, 0) + 2)]

    taps = [(got0, valid0)]
    for t in range(1, n_taps):
        dy = offs[2 * (t - 1)]
        dx = offs[2 * (t - 1) + 1]
        taps.append((_shift_dyn(got0, dy, dx, axes=(1, 2)),
                     _shift_dyn(valid0, dy, dx, axes=(0, 1))))
    return taps


def temporal_combine(cur_kind, cur_slot, cur_face, cur_fa, cur_fb, cur_dir,
                     cur_dist, cur_le, cur_wsum, cur_M, cur_phat,
                     prev: ReSTIRState, motion_u, motion_v,
                     depth, n, p, wo, mat,
                     lights: LightTable, sky_state, remap, u_takes,
                     frame_idx=0, n_taps: int = 3,
                     disocclusion_threshold: float = 0.2):
    """Merge the current-frame RIS reservoir with n_taps reprojected
    previous-frame reservoirs (closesthit.cu:636-785: 3 temporal samples
    with jittered offsets, surface-similarity per tap, M-cap 20).

    GRIS with confidence weights: each input reservoir is one candidate with
    w = c/c_total · p̂(sample at current surface) · W; final W = wsum/p̂ of
    the winner.  Tap 0 is the exact reprojection; further taps read small
    frame-varying offsets of the warped buffer (decorrelated neighbor reuse;
    each tap is independently re-validated and re-weighted at the current
    surface, so the offsets affect variance, not bias).

    u_takes: tuple of n_taps uniforms (one reservoir-selection draw per tap).
    Returns merged reservoir fields + final W."""
    # nearest-warped reservoir fetches via the Pallas windowed-gather kernel
    # (prev-frame reservoir read role).  The state is STORED bit-packed as
    # 8 channels (see ReSTIRState): ints and bf16 pairs ride as f32 bit
    # patterns through the pure-shuffle nearest gather — the kernel cost
    # halves vs a 17-plane layout and there is no per-frame pack pass.
    # `face` is not stored at all — triangle lights never set it.
    from ..ops.pack import unpack2, unpack_int, octa_decode
    from ..ops.gatherlib import fast_gather

    if not isinstance(u_takes, (tuple, list)):
        u_takes = (u_takes,)
    n_taps = min(n_taps, len(u_takes))
    raw_taps = warp_taps(prev, motion_u, motion_v, frame_idx, n_taps)

    # running merged reservoir, seeded with the current-frame candidate
    W_cur = jnp.where(cur_phat > 1e-9,
                      cur_wsum / jnp.maximum(cur_phat, 1e-9), 0.0)
    r_kind, r_slot, r_face = cur_kind, cur_slot, cur_face
    r_fa, r_fb, r_dir, r_dist = cur_fa, cur_fb, cur_dir, cur_dist
    r_le, r_phat = cur_le, cur_phat
    contribs = []   # (phat, W, M, valid, fields...) per tap

    taps = []
    for t in range(n_taps):
        tap, tvalid = raw_taps[t]
        pk, pslot = unpack_int(tap[0], 2)
        pfa, pfb = unpack2(tap[1])
        pdir = octa_decode(*unpack2(tap[2]))
        pW = tap[3]
        pM, ple_b = unpack2(tap[4])
        pdepth = tap[5]
        pn = octa_decode(*unpack2(tap[6]))
        ple_r, ple_g = unpack2(tap[7])
        pface = jnp.zeros_like(pk)
        ple_cache = (ple_r, ple_g, ple_b)

        # surface similarity per tap (closesthit.cu:636-705); the threshold
        # is the relative depth tolerance directly (no hidden fudge)
        depth_ok = jnp.abs(pdepth - depth) <= \
            disocclusion_threshold * jnp.maximum(depth, 1.0)
        normal_ok = m.dot(pn, n) > 0.8
        valid = tvalid & depth_ok & normal_ok & (pk != KIND_NONE) & (depth < BIG)

        # light-ID remap across edits (Restir.h:52-79)
        remapped = fast_gather(remap, jnp.clip(pslot, 0, remap.shape[0] - 1))
        local_gone = (pk == KIND_LOCAL) & (remapped < 0)
        pslot = jnp.where(pk == KIND_LOCAL, jnp.maximum(remapped, 0), pslot)
        valid = valid & ~local_gone

        # re-evaluate the stored sample at the current surface
        pwi, pdist, ple = reconstruct_sample(pk, pslot, pface, pfa, pfb,
                                             pdir, p, lights, sky_state,
                                             stored_le=ple_cache)
        phat_prev = jnp.where(valid, target_pdf(mat, n, wo, pwi, ple), 0.0)
        pM = jnp.where(valid, jnp.minimum(pM, float(M_CAP)), 0.0)
        taps.append((pk, pslot, pface, pfa, pfb, pwi, pdist, ple,
                     phat_prev, pW, pM, valid))

    c_total = 1.0 + sum(tp[10] for tp in taps)
    wsum = (1.0 / c_total) * cur_phat * W_cur
    for t, (pk, pslot, pface, pfa, pfb, pwi, pdist, ple,
            phat_prev, pW, pM, valid) in enumerate(taps):
        w_t = (pM / c_total) * phat_prev * pW
        new_wsum = wsum + w_t
        take = valid & ((u_takes[t] * jnp.maximum(new_wsum, 1e-20)) < w_t)
        r_kind = jnp.where(take, pk, r_kind)
        r_slot = jnp.where(take, pslot, r_slot)
        r_face = jnp.where(take, pface, r_face)
        r_fa = jnp.where(take, pfa, r_fa)
        r_fb = jnp.where(take, pfb, r_fb)
        r_dir = m.where3(take, pwi, r_dir)
        r_dist = jnp.where(take, pdist, r_dist)
        r_le = m.where3(take, ple, r_le)
        r_phat = jnp.where(take, phat_prev, r_phat)
        wsum = new_wsum

    M_new = c_total
    W_new = jnp.where(r_phat > 1e-9, wsum / jnp.maximum(r_phat, 1e-9), 0.0)
    return (r_kind, r_slot, r_face, r_fa, r_fb, r_dir, r_dist, r_le,
            r_phat, wsum, M_new, W_new)
