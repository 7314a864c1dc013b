"""Fused per-bounce shading: NEE streaming RIS + temporal-ReSTIR combine +
winner shading + BSDF continuation sample, as ONE Pallas TPU kernel.

Role parity: the direct-lighting + temporal-reuse + bounce block of the
reference's closest-hit megakernel (renderer/shaders/closesthit.cu:330-845 —
streaming RIS over local/sun/sky candidates, 3-tap temporal reservoir reuse
with M-cap 20, final-winner shading, Disney BSDF continuation sample).

Why a kernel: the round-3 profile (docs/PROFILE.md) measured the XLA
per-bounce shading fusions VPU-op-bound at ~14 ms/frame with ~9 ms more in
one-hot light-table gathers — every light-field fetch costs O(K) ops as a
compare-select-sum in XLA, but is ONE hardware lane shuffle in VMEM
(ops/gatherlib.lane_gather).  The whole estimator therefore runs here with
the light table resident in VMEM, the way the reference keeps its LightInfo
array in L2.

Two bindings of the SAME body (`_fused_body`, the ops/dda.py pattern):
  * `fused_shade(..., backend="pallas")` — (tile, 128) pixel tiles on TPU;
  * `fused_shade(..., backend="xla")`    — the body traced directly (CPU
    tests / goldens; lane shuffles are cheap under XLA:CPU).
Both consume the identical RNG stream (ops/rng.py — blue-noise byte planes
when cfg.blue_noise, else PCG + R2) and produce matching results
(tests/test_ris_kernel.py parity gate).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import bsdf as B
from ..ops import mathutil as m
from ..ops import rng
from ..ops.dda import BIG
from ..ops.gatherlib import LANES, lane_gather
from ..ops.pack import unpack2, unpack_int, octa_decode
from . import sky as sky_mod

KIND_NONE, KIND_LOCAL, KIND_SUN, KIND_SKY = 0, 1, 2, 3

# f32 light-field rows in the stacked (N_LF * R, 128) table
LF_V0X, LF_V0Y, LF_V0Z = 0, 1, 2
LF_E1X, LF_E1Y, LF_E1Z = 3, 4, 5
LF_E2X, LF_E2Y, LF_E2Z = 6, 7, 8
LF_NX, LF_NY, LF_NZ = 9, 10, 11
LF_AREA = 12
LF_RADR, LF_RADG, LF_RADB = 13, 14, 15
LF_PROB, LF_PMF = 16, 17
N_LF = 18
# i32 light-field rows in the stacked (N_LI * R, 128) table
LI_ALIAS, LI_ENT, LI_REMAP = 0, 1, 2
N_LI = 3

_ENV_OMEGA = 2.0 * jnp.pi / (sky_mod.ENV_W * sky_mod.ENV_H)


class ShadeConfig(NamedTuple):
    """Static (compile-time) shape of one bounce's estimator."""
    n_local: int          # local-light RIS candidates
    n_taps: int           # temporal reservoir taps (0 = no ReSTIR reuse)
    k_slots: int          # light-table slot count
    base_dim: int         # RNG dimension offset of this bounce
    ent_unreachable: bool  # entity lights carry full NEE MIS weight
    m_cap: float
    dis_thr: float        # temporal-tap relative depth tolerance
    approx: bool          # approximate reciprocals (TPU kernel only)
    blue_noise: bool = False   # draws from ops/rng.bn_draw byte planes


class ShadeOut(NamedTuple):
    """SoA outputs of one fused-shade pass (all pixel-shaped)."""
    kind: jnp.ndarray     # i32 winner kind
    slot: jnp.ndarray     # i32 winner light slot
    fa: jnp.ndarray       # winner barycentrics
    fb: jnp.ndarray
    dir: tuple            # winner direction
    dist: jnp.ndarray
    le: tuple             # winner radiance
    phat: jnp.ndarray
    M: jnp.ndarray        # merged confidence (candidates + capped tap M)
    W: jnp.ndarray        # unbiased contribution weight
    nee: tuple            # pre-visibility contribution f·cosθ·Le·W
    wi: tuple             # BSDF continuation direction
    weight: tuple         # BSDF throughput multiplier
    is_delta: jnp.ndarray         # i32 0/1
    is_transmission: jnp.ndarray  # i32 0/1
    prev_cos_pdf: jnp.ndarray     # eval_lum pdf proxy at wi (MIS)


def _flatten_out(o: ShadeOut):
    return [o.kind, o.slot, o.fa, o.fb, *o.dir, o.dist, *o.le, o.phat,
            o.M, o.W, *o.nee, *o.wi, *o.weight, o.is_delta,
            o.is_transmission, o.prev_cos_pdf]


def _unflatten_out(vs) -> ShadeOut:
    return ShadeOut(kind=vs[0], slot=vs[1], fa=vs[2], fb=vs[3],
                    dir=tuple(vs[4:7]), dist=vs[7], le=tuple(vs[8:11]),
                    phat=vs[11], M=vs[12], W=vs[13], nee=tuple(vs[14:17]),
                    wi=tuple(vs[17:20]), weight=tuple(vs[20:23]),
                    is_delta=vs[23], is_transmission=vs[24],
                    prev_cos_pdf=vs[25])


N_OUT = 26
_OUT_I32 = (0, 1, 23, 24)   # kind, slot, is_delta, is_transmission


def _g1(row, idx):
    """General small-row gather for the XLA twin (arbitrary trailing dim —
    lane_gather requires the 128-lane tile shape the Pallas binding has)."""
    return jnp.take(row, jnp.clip(idx, 0, row.shape[0] - 1))


def _fused_body(cfg: ShadeConfig, px, py, frame_u, sf,
                p, n, wo, alb, rough, metal, trans,
                depth, taps, lf, li, envf, envi,
                xla: bool = False, bn=None) -> ShadeOut:
    """The estimator over tile- or image-shaped SoA arrays.

    px/py: u32 global pixel coordinates; frame_u: u32 frame index.
    sf: (SF_LEN,) packed sky/sun scalars (render/sky.sky_scalar_pack).
    p: SHADING point (hit + normal·eps, the candidate convention);
    taps: list of n_taps (planes8, valid_i32) warped reservoir fetches.
    lf/li: stacked light-field tables (see LF_*/LI_* rows), R rows each.
    """
    shape = p[0].shape
    K = cfg.k_slots
    R = (K + LANES - 1) // LANES
    mat = B.Material(albedo_r=alb[0], albedo_g=alb[1], albedo_b=alb[2],
                     roughness=rough, metallic=metal, translucency=trans)

    if cfg.approx:
        rcp = lambda x: pl.reciprocal(x, approx=True)
    else:
        rcp = lambda x: 1.0 / x
    gat = _g1 if xla else lane_gather

    # --- light-table gather: one lane shuffle per field (R=1), or R
    # shuffles + selects (K > 128) ---
    def lgf(row, slot):
        if R == 1:
            return gat(lf[row, :], jnp.clip(slot, 0, LANES - 1))
        hi = slot >> 7
        lo = slot & (LANES - 1)
        acc = jnp.zeros(slot.shape, jnp.float32)
        for h in range(R):
            acc = jnp.where(hi == h, gat(lf[row * R + h, :], lo), acc)
        return acc

    def lgi(row, slot):
        if R == 1:
            return gat(li[row, :], jnp.clip(slot, 0, LANES - 1))
        hi = slot >> 7
        lo = slot & (LANES - 1)
        acc = jnp.zeros(slot.shape, jnp.int32)
        for h in range(R):
            acc = jnp.where(hi == h, gat(li[row * R + h, :], lo), acc)
        return acc

    # --- RNG: ops/rng.RandState formulas, dims statically unrolled ---
    if bn is None:
        h0 = rng.pcg_hash(jnp.uint32(0x9E3779B9) ^ px.astype(jnp.uint32))
        base = rng.pcg_hash(h0 ^ (py.astype(jnp.uint32) * jnp.uint32(9277)))
    dim_counter = [cfg.base_dim]

    def draw():
        dim = dim_counter[0]
        dim_counter[0] = dim + 1
        if bn is not None:
            return rng.bn_draw(bn, frame_u, dim)
        bits = rng.pcg_hash(base ^ (jnp.uint32(dim) * jnp.uint32(26699)))
        # NOTE: construct the stride INSIDE the traced body — module-level
        # jnp scalars are closed-over constants, which pallas_call rejects
        stride = jnp.uint32(rng.PHI2_X_BITS if dim % 2 == 0
                            else rng.PHI2_Y_BITS)
        return rng.to_unit_float(bits + frame_u * stride)

    # --- streaming RIS state (pathtracer._nee_ris role) ---
    zf = jnp.zeros(shape, jnp.float32)
    zi = jnp.zeros(shape, jnp.int32)
    r_kind, r_slot = zi, zi
    r_fa, r_fb = zf, zf
    r_dir = (zf, zf, zf)
    r_dist = jnp.full(shape, BIG)
    r_le = (zf, zf, zf)
    r_phat, wsum = zf, zf

    def stream(state, wi, dist, le, src_pdf, u, kind, slot=None,
               fa=None, fb=None, mis_w=1.0, force_full=None):
        (r_kind, r_slot, r_fa, r_fb, r_dir, r_dist, r_le, r_phat, wsum) = state
        f_lum, pdf_b = B.eval_lum(mat, n, wo, wi)
        cos_i = jnp.maximum(m.dot(n, wi), 0.0)
        p_hat = f_lum * cos_i * m.luminance(le)
        balance = src_pdf * rcp(jnp.maximum(src_pdf + pdf_b, 1e-9))
        if force_full is not None:
            balance = jnp.where(force_full, 1.0, balance)
        w = jnp.where(src_pdf > 1e-9,
                      mis_w * balance * p_hat * rcp(jnp.maximum(src_pdf, 1e-9)),
                      0.0)
        wsum = wsum + w
        take = (u * jnp.maximum(wsum, 1e-20)) < w
        sel = lambda a, b: jnp.where(take, a, b)
        return (sel(jnp.full(shape, kind, jnp.int32), r_kind),
                sel(slot if slot is not None else zi, r_slot),
                sel(fa if fa is not None else zf, r_fa),
                sel(fb if fb is not None else zf, r_fb),
                m.where3(take, wi, r_dir),
                sel(dist, r_dist),
                m.where3(take, le, r_le),
                sel(p_hat, r_phat),
                wsum)

    state = (r_kind, r_slot, r_fa, r_fb, r_dir, r_dist, r_le, r_phat, wsum)
    any_lights = sf[sky_mod.SF_ANY_LIGHTS] > 0.5

    # local light candidates (TriangleLight::calcSample role)
    for _ in range(cfg.n_local):
        u_slot, u_take = draw(), draw()
        u1, u2, u3 = draw(), draw(), draw()
        del u1  # third draw kept for stream parity (cube-light legacy slot)
        un = u_slot * K
        col = jnp.clip(un.astype(jnp.int32), 0, K - 1)
        frac = un - col.astype(jnp.float32)
        pr = lgf(LF_PROB, col)
        al = lgi(LI_ALIAS, col)
        slot = jnp.where(frac < pr, col, al)
        pmf = lgf(LF_PMF, slot)

        # fold_barycentric + triangle point
        flip = (u2 + u3) > 1.0
        fa = jnp.where(flip, 1.0 - u2, u2)
        fb = jnp.where(flip, 1.0 - u3, u3)
        lp = (lgf(LF_V0X, slot) + fa * lgf(LF_E1X, slot) + fb * lgf(LF_E2X, slot),
              lgf(LF_V0Y, slot) + fa * lgf(LF_E1Y, slot) + fb * lgf(LF_E2Y, slot),
              lgf(LF_V0Z, slot) + fa * lgf(LF_E1Z, slot) + fb * lgf(LF_E2Z, slot))
        ln = (lgf(LF_NX, slot), lgf(LF_NY, slot), lgf(LF_NZ, slot))
        area = lgf(LF_AREA, slot)
        to_l = m.sub(lp, p)
        dist2 = jnp.maximum(m.length_sq(to_l), 1e-6)
        inv_dist = jax.lax.rsqrt(dist2)
        dist = dist2 * inv_dist
        wi = m.scale(to_l, inv_dist)
        cos_l = jnp.maximum(m.dot(ln, m.neg(wi)), 0.0)
        pdf_sa = pmf * rcp(jnp.maximum(area, 1e-8)) * dist2 \
            * rcp(jnp.maximum(cos_l, 1e-6))
        le = (lgf(LF_RADR, slot), lgf(LF_RADG, slot), lgf(LF_RADB, slot))
        ok = (cos_l > 0.0) & any_lights
        le = m.where3(ok, le, (zf, zf, zf))
        force_full = (lgi(LI_ENT, slot) > 0) if cfg.ent_unreachable else None
        state = stream(state, wi, dist, le, pdf_sa, u_take, KIND_LOCAL,
                       slot=slot, fa=fa, fb=fb, mis_w=1.0 / cfg.n_local,
                       force_full=force_full)

    # sun candidate: uniform cone around sun_dir (miss.cu sun-disk NEE role)
    u1, u2 = draw(), draw()
    u_take = draw()
    cos_max = sf[sky_mod.SF_COS_SUN]
    cos_t = 1.0 - u1 * (1.0 - cos_max)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = (2.0 * jnp.pi) * u2
    local = (sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t)
    sun = (sf[sky_mod.SF_SUN_X], sf[sky_mod.SF_SUN_Y], sf[sky_mod.SF_SUN_Z])
    t_, bt_ = m.orthonormal_basis(sun)
    wi_sun = m.from_local(local, t_, bt_, sun)
    # spectral limb darkening: exact degree-5 RGB polynomial in the limb
    # sample cosine (sky_spectral.sun_rgb_poly; Sky.cu:238-251 role), fed by
    # the cone sample's sine already in hand
    le_sun = sky_mod.sun_radiance_scalars_cone(sin_t, sf)
    state = stream(state, wi_sun, jnp.full(shape, BIG), le_sun,
                   jnp.broadcast_to(sf[sky_mod.SF_PDF_SUN], shape), u_take,
                   KIND_SUN)

    # sky candidate: env alias sample + analytic radiance (Sky.cu:383-391)
    u1, u2, u3 = draw(), draw(), draw()
    u_take = draw()
    env_n = sky_mod.ENV_W * sky_mod.ENV_H
    un = u1 * env_n
    col = jnp.clip(un.astype(jnp.int32), 0, env_n - 1)
    frac = un - col.astype(jnp.float32)
    pr = gat(envf[0, :], col)
    al = gat(envi[0, :], col)
    texel = jnp.where(frac < pr, col, al)
    pmf = gat(envf[1, :], texel)
    iu = (texel % sky_mod.ENV_W).astype(jnp.float32)
    iv = (texel // sky_mod.ENV_W).astype(jnp.float32)
    phi = (2.0 * jnp.pi) * (iu + u2) * (1.0 / sky_mod.ENV_W)
    cos_t = 1.0 - (iv + u3) * (1.0 / sky_mod.ENV_H)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    wi_sky = (sin_t * jnp.cos(phi), cos_t, sin_t * jnp.sin(phi))
    pdf_sky = pmf * (1.0 / _ENV_OMEGA)
    le_sky = sky_mod.sky_radiance_scalars(wi_sky, sf, rcp=rcp,
                                          rsqrt=jax.lax.rsqrt)
    state = stream(state, wi_sky, jnp.full(shape, BIG), le_sky, pdf_sky,
                   u_take, KIND_SKY)

    (r_kind, r_slot, r_fa, r_fb, r_dir, r_dist, r_le, r_phat, wsum) = state

    # --- temporal reservoir combine (restir.temporal_combine role) ---
    if cfg.n_taps > 0:
        u_takes = [draw() for _ in range(cfg.n_taps)]
        cur_phat = r_phat
        W_cur = jnp.where(cur_phat > 1e-9,
                          wsum * rcp(jnp.maximum(cur_phat, 1e-9)), 0.0)
        tap_vals = []
        for planes, tvalid in taps:
            pk, pslot = unpack_int(planes[0], 2)
            pfa, pfb = unpack2(planes[1])
            pdir = octa_decode(*unpack2(planes[2]))
            pW = planes[3]
            pM, ple_b = unpack2(planes[4])
            pdepth = planes[5]
            pn = octa_decode(*unpack2(planes[6]))
            ple_r, ple_g = unpack2(planes[7])

            depth_ok = jnp.abs(pdepth - depth) <= \
                cfg.dis_thr * jnp.maximum(depth, 1.0)
            normal_ok = m.dot(pn, n) > 0.8
            valid = (tvalid != 0) & depth_ok & normal_ok \
                & (pk != KIND_NONE) & (depth < BIG)

            remapped = lgi(LI_REMAP, jnp.clip(pslot, 0, K - 1))
            local_gone = (pk == KIND_LOCAL) & (remapped < 0)
            pslot = jnp.where(pk == KIND_LOCAL,
                              jnp.maximum(remapped, 0), pslot)
            valid = valid & ~local_gone

            # reconstruct the stored sample at the current surface
            cslot = jnp.clip(pslot, 0, K - 1)
            lp = (lgf(LF_V0X, cslot) + pfa * lgf(LF_E1X, cslot)
                  + pfb * lgf(LF_E2X, cslot),
                  lgf(LF_V0Y, cslot) + pfa * lgf(LF_E1Y, cslot)
                  + pfb * lgf(LF_E2Y, cslot),
                  lgf(LF_V0Z, cslot) + pfa * lgf(LF_E1Z, cslot)
                  + pfb * lgf(LF_E2Z, cslot))
            to_l = m.sub(lp, p)
            d2 = jnp.maximum(m.length_sq(to_l), 1e-6)
            inv_d = jax.lax.rsqrt(d2)
            dir_local = m.scale(to_l, inv_d)
            le_local = (lgf(LF_RADR, cslot), lgf(LF_RADG, cslot),
                        lgf(LF_RADB, cslot))
            is_local = pk == KIND_LOCAL
            is_dist = (pk == KIND_SUN) | (pk == KIND_SKY)
            ple = m.where3(is_dist, (ple_r, ple_g, ple_b), (zf, zf, zf))
            pwi = m.where3(is_local, dir_local, pdir)
            pdist = jnp.where(is_local, d2 * inv_d, BIG)
            ple = m.where3(is_local, le_local, ple)

            f_lum, _ = B.eval_lum(mat, n, wo, pwi)
            cos_i = jnp.maximum(m.dot(n, pwi), 0.0)
            phat_prev = jnp.where(valid, f_lum * cos_i * m.luminance(ple),
                                  0.0)
            pM = jnp.where(valid, jnp.minimum(pM, cfg.m_cap), 0.0)
            tap_vals.append((pk, pslot, pfa, pfb, pwi, pdist, ple,
                             phat_prev, pW, pM, valid))

        c_total = 1.0 + sum(tv[9] for tv in tap_vals)
        inv_ct = rcp(c_total)
        wsum = inv_ct * cur_phat * W_cur
        for t, (pk, pslot, pfa, pfb, pwi, pdist, ple, phat_prev, pW, pM,
                valid) in enumerate(tap_vals):
            w_t = (pM * inv_ct) * phat_prev * pW
            wsum = wsum + w_t
            take = valid & ((u_takes[t] * jnp.maximum(wsum, 1e-20)) < w_t)
            sel = lambda a, b: jnp.where(take, a, b)
            r_kind = sel(pk, r_kind)
            r_slot = sel(pslot, r_slot)
            r_fa = sel(pfa, r_fa)
            r_fb = sel(pfb, r_fb)
            r_dir = m.where3(take, pwi, r_dir)
            r_dist = sel(pdist, r_dist)
            r_le = m.where3(take, ple, r_le)
            r_phat = sel(phat_prev, r_phat)
        M_new = c_total
    else:
        M_new = jnp.full(shape, float(cfg.n_local + 2))

    W_new = jnp.where(r_phat > 1e-9,
                      wsum * rcp(jnp.maximum(r_phat, 1e-9)), 0.0)

    # --- winner shading (pre-visibility): full per-channel BSDF ---
    fv, _ = B.evaluate(mat, n, wo, r_dir)
    cos2 = jnp.maximum(m.dot(n, r_dir), 0.0)
    nee = tuple(fc * cos2 * lc * W_new for fc, lc in zip(fv, r_le))

    # --- BSDF continuation sample + MIS pdf proxy ---
    u1, u2, u3 = draw(), draw(), draw()
    samp = B.sample(mat, n, wo, u1, u2, u3)
    _, pcp = B.eval_lum(mat, n, wo, samp.wi)
    pcp = jnp.where(samp.is_delta, 0.0, pcp)

    return ShadeOut(kind=r_kind, slot=r_slot, fa=r_fa, fb=r_fb, dir=r_dir,
                    dist=r_dist, le=r_le, phat=r_phat, M=M_new, W=W_new,
                    nee=nee, wi=samp.wi, weight=samp.weight,
                    is_delta=samp.is_delta.astype(jnp.int32),
                    is_transmission=samp.is_transmission.astype(jnp.int32),
                    prev_cos_pdf=pcp)


# ---------------------------------------------------------------------------
# Pallas binding
# ---------------------------------------------------------------------------

def _make_kernel(cfg: ShadeConfig, tile_r: int):
    n_taps = cfg.n_taps

    def kernel(si, sf, lf, li, envf, envi, *rest):
        k = 0

        def nxt():
            nonlocal k
            v = rest[k][:]
            k += 1
            return v

        p = (nxt(), nxt(), nxt())
        n = (nxt(), nxt(), nxt())
        wo = (nxt(), nxt(), nxt())
        alb = (nxt(), nxt(), nxt())
        rough, metal, trans = nxt(), nxt(), nxt()
        if n_taps:
            depth = nxt()
            taps = []
            for _ in range(n_taps):
                planes = [nxt() for _ in range(8)]
                valid = nxt()
                taps.append((planes, valid))
        else:
            depth = None
            taps = []
        bn = tuple(nxt() for _ in range(4)) if cfg.blue_noise else None
        outs = rest[k:]
        assert len(outs) == N_OUT, len(outs)

        i, j = pl.program_id(0), pl.program_id(1)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_r, LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_r, LANES), 1)
        px = (j * LANES + lane).astype(jnp.uint32)
        py = (i * tile_r + row + si[1]).astype(jnp.uint32)
        frame_u = si[0].astype(jnp.uint32)

        # sf stays a Ref: SMEM only supports scalar loads, and the body
        # indexes it element-wise (sf[SF_*]) which works on Ref and array
        out = _fused_body(cfg, px, py, frame_u, sf,
                          p, n, wo, alb, rough, metal, trans,
                          depth, taps, lf[:], li[:], envf[:], envi[:],
                          bn=bn)
        for ref, v in zip(outs, _flatten_out(out)):
            ref[:] = v

    return kernel


def _pick_tile_r(hp: int) -> int:
    best = 8
    r = 8
    while r <= 32:
        if hp % r == 0:
            best = r
        r += 8
    return best


@partial(jax.jit, static_argnames=("cfg", "tile_r"))
def _shade_tiles(si, sf, lf, li, envf, envi, tiled, cfg: ShadeConfig,
                 tile_r: int):
    H, W = tiled[0].shape
    grid = (H // tile_r, W // LANES)
    tile_spec = pl.BlockSpec((tile_r, LANES), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)

    def full_spec(a):
        return pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shapes = [jax.ShapeDtypeStruct(
        (H, W), jnp.int32 if idx in _OUT_I32 else jnp.float32)
        for idx in range(N_OUT)]
    fn = pl.pallas_call(
        _make_kernel(cfg, tile_r),
        grid=grid,
        in_specs=[smem_spec, smem_spec, full_spec(lf), full_spec(li),
                  full_spec(envf), full_spec(envi)]
        + [tile_spec] * len(tiled),
        out_specs=[tile_spec] * N_OUT,
        out_shape=out_shapes,
    )
    return fn(si, sf, lf, li, envf, envi, *tiled)


def pack_light_tables(lights, light_remap) -> tuple:
    """Stack the light-table channels into the kernel's (N_LF·R, 128) f32 and
    (N_LI·R, 128) i32 VMEM layouts (cheap jnp ops; call inside jit so edits
    flow through)."""
    K = lights.prob.shape[0]
    R = (K + LANES - 1) // LANES
    pad = R * LANES - K

    def prow(a, dtype):
        a = jnp.asarray(a, dtype)
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,), dtype)])
        return a.reshape(R, LANES)

    lf = jnp.concatenate([
        prow(lights.v0x, jnp.float32), prow(lights.v0y, jnp.float32),
        prow(lights.v0z, jnp.float32),
        prow(lights.e1x, jnp.float32), prow(lights.e1y, jnp.float32),
        prow(lights.e1z, jnp.float32),
        prow(lights.e2x, jnp.float32), prow(lights.e2y, jnp.float32),
        prow(lights.e2z, jnp.float32),
        prow(lights.nx, jnp.float32), prow(lights.ny, jnp.float32),
        prow(lights.nz, jnp.float32),
        prow(lights.area, jnp.float32),
        prow(lights.rad_r, jnp.float32), prow(lights.rad_g, jnp.float32),
        prow(lights.rad_b, jnp.float32),
        prow(lights.prob, jnp.float32), prow(lights.pmf, jnp.float32),
    ], axis=0)
    remap = light_remap if light_remap is not None \
        else jnp.arange(K, dtype=jnp.int32)
    # the remap is sized to the PREVIOUS frame's table (its domain is stored
    # prev-frame slot ids); normalize to K rows for the kernel layout —
    # identity-extend when the table grew (new slots have no prev-frame
    # reservoirs), truncate when it shrank (the kernel clips pslot to K-1)
    rlen = remap.shape[0]
    if rlen < K:
        remap = jnp.concatenate(
            [remap, jnp.arange(rlen, K, dtype=jnp.int32)])
    elif rlen > K:
        remap = remap[:K]
    li = jnp.concatenate([
        prow(lights.alias, jnp.int32),
        prow(lights.ent, jnp.int32),
        prow(remap, jnp.int32),
    ], axis=0)
    return lf, li


def pack_env_tables(sky_state) -> tuple:
    """(2, 128) f32 prob/pmf + (1, 128) i32 alias rows of the env sampler."""
    n = sky_state.env_prob.shape[0]
    pad = LANES - n
    assert pad >= 0, "env map exceeds one lane row"

    def prow(a, dtype):
        a = jnp.asarray(a, dtype)
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,), dtype)])
        return a.reshape(1, LANES)

    envf = jnp.concatenate([prow(sky_state.env_prob, jnp.float32),
                            prow(sky_state.env_pmf, jnp.float32)], axis=0)
    envi = prow(sky_state.env_alias, jnp.int32)
    return envf, envi


def fused_shade(cfg: ShadeConfig, frame_idx, y0, sf, lf, li, envf, envi,
                p, n, wo, alb, rough, metal, trans,
                depth=None, taps=(), backend: str = "pallas",
                bn=None) -> ShadeOut:
    """Run the fused estimator for one bounce.

    backend="pallas": (tile, 128) Pallas kernel (TPU).
    backend="xla":    trace `_fused_body` directly (CPU tests/goldens — the
    exact-twin contract of ops/trace_kernel).
    """
    shape = p[0].shape
    H, W = shape

    if backend == "xla":
        yy = jnp.arange(H, dtype=jnp.int32)[:, None] + jnp.asarray(y0, jnp.int32)
        xx = jnp.arange(W, dtype=jnp.int32)[None, :]
        px = jnp.broadcast_to(xx, shape).astype(jnp.uint32)
        py = jnp.broadcast_to(yy, shape).astype(jnp.uint32)
        return _fused_body(cfg, px, py, jnp.asarray(frame_idx, jnp.uint32),
                           sf, p, n, wo, alb, rough, metal, trans,
                           depth, list(taps), lf, li, envf, envi, xla=True,
                           bn=None if bn is None else tuple(bn))

    Hp = H + (-H) % 8
    Wp = W + (-W) % LANES

    def prep(a):
        a = jnp.broadcast_to(jnp.asarray(a, jnp.float32), shape)
        if Hp > H or Wp > W:
            a = jnp.pad(a, ((0, Hp - H), (0, Wp - W)))
        return a

    def prep_i(a):
        a = jnp.broadcast_to(jnp.asarray(a, jnp.int32), shape)
        if Hp > H or Wp > W:
            a = jnp.pad(a, ((0, Hp - H), (0, Wp - W)))
        return a

    tiled = [prep(a) for a in (*p, *n, *wo, *alb, rough, metal, trans)]
    if cfg.n_taps:
        assert depth is not None and len(taps) == cfg.n_taps
        tiled.append(prep(depth))
        for planes, valid in taps:
            tiled.extend(prep(pl_) for pl_ in planes)
            tiled.append(prep_i(valid))
    if cfg.blue_noise:
        assert bn is not None and len(bn) == 4
        for a in bn:
            if Hp > H or Wp > W:
                a = jnp.pad(a, ((0, Hp - H), (0, Wp - W)))
            tiled.append(a)

    si = jnp.stack([jnp.asarray(frame_idx, jnp.int32).astype(jnp.int32),
                    jnp.asarray(y0, jnp.int32)])
    tile_r = _pick_tile_r(Hp)
    outs = _shade_tiles(si, sf, lf, li, envf, envi, tuple(tiled), cfg, tile_r)
    if Hp > H or Wp > W:
        outs = [a[:H, :W] for a in outs]
    return _unflatten_out(list(outs))
