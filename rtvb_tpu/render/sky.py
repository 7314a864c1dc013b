"""Analytic daylight sky + sun model.

Capability parity with the reference's spectral sky stack (renderer/sky/
Sky.{h,cu} + SkyData.h — Hosek–Wilkie-style fitted model, sun disk with limb
darkening, time-of-day sun rotation about a tilted axis).  Rather than porting
the reference's 2541-line fitted coefficient tables, this implements the
published Preetham et al. 1999 analytic daylight model ("A Practical Analytic
Model for Daylight"): zenith chromaticity polynomials + Perez luminance
distribution — ~60 flops per direction, which on TPU beats a 512K-texel
texture lookup by orders of magnitude (gathers are the scarce resource, VPU
math is free).  The equal-area environment map + pdf of the reference
(Sky.cu:355-396) is still built for light-sampling parity tests, but the path
tracer evaluates the sky *analytically per ray*.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.config import SkySettings
from ..ops import mathutil as m

# Calibration from Preetham's kcd/m² to engine radiance units (exposure
# normalizes absolute scale; this keeps typical sky values O(1)).
SKY_RADIANCE_SCALE = 0.035
# Sun disk: 0.51° → Ω ≈ 6.2e-5 sr; radiance chosen so sun irradiance on a
# flat surface ≈ 5× sky irradiance (clear-day ratio), matching the role of
# the reference's physical solar datasets (Sky.cu:49-55).
SUN_RADIANCE_SCALE = 1.2e5


# Env-map sampler resolution: 8×4 equal-area texels.  Small on purpose — it
# shapes the sampling pdf only (the Perez luminance field is smooth, so 32
# texels already localize the solar aureole); radiance at the sampled
# direction is always evaluated analytically (unbiased).  Every texel the
# table grows costs a one-hot select per pixel per draw in the NEE stream
# (3 draws + 1 pdf per bounce), so this trades a little sampling variance
# for ~4x less VPU work than the 16×8 map.
ENV_W, ENV_H = 8, 4


class SkyState(NamedTuple):
    """Per-frame sky parameters (pytree) — recomputed when time/turbidity change."""
    sun_dir: tuple          # unit vector toward the sun
    turbidity: jnp.ndarray
    sky_intensity: jnp.ndarray
    sun_intensity: jnp.ndarray
    cos_sun_radius: jnp.ndarray   # cos of sun disk angular radius
    # equal-area env importance sampler (Sky.cu:383-391 alias-table role):
    # ENV_W*ENV_H-texel luminance pdf + alias table over the upper hemisphere
    env_prob: jnp.ndarray   # (ENV_W*ENV_H,)
    env_alias: jnp.ndarray  # (ENV_W*ENV_H,) i32
    env_pmf: jnp.ndarray    # (ENV_W*ENV_H,)


def sun_direction(time_of_day, axis_angle_deg):
    """Sun path: east → zenith → west rotated about x by the axis tilt
    (Sky.cu:363-369 time-of-day rotation equivalent)."""
    h = (time_of_day / 24.0) * 2.0 * jnp.pi
    c = jnp.cos(h - jnp.pi * 0.5)
    s = jnp.sin(h - jnp.pi * 0.5)
    a = jnp.deg2rad(axis_angle_deg)
    # base circle in xy plane, tilted about x axis
    return m.normalize((c, s * jnp.cos(a), s * jnp.sin(a)))


def make_sky_state(s: SkySettings) -> SkyState:
    f32 = jnp.float32
    base = SkyState(
        sun_dir=sun_direction(f32(s.time_of_day), f32(s.sun_axis_angle)),
        turbidity=f32(s.turbidity),
        sky_intensity=f32(s.sky_intensity),
        sun_intensity=f32(s.sun_intensity),
        cos_sun_radius=jnp.cos(jnp.deg2rad(f32(s.sun_angular_diameter) * 0.5)),
        env_prob=jnp.ones((ENV_W * ENV_H,)),
        env_alias=jnp.zeros((ENV_W * ENV_H,), jnp.int32),
        env_pmf=jnp.full((ENV_W * ENV_H,), 1.0 / (ENV_W * ENV_H)),
    )
    # luminance-weighted alias table over the equal-area map
    from ..ops import alias_table as at
    import numpy as np
    _, pdf = build_sky_map(base, ENV_W, ENV_H)
    tab = at.build(np.maximum(np.asarray(pdf).reshape(-1), 1e-9))
    return base._replace(env_prob=tab.prob, env_alias=tab.alias,
                         env_pmf=tab.pmf)


# ---------------------------------------------------------------------------
# Preetham model
# ---------------------------------------------------------------------------

def _perez(theta_cos, gamma, gamma_cos, A, B, C, D, E):
    theta_cos = jnp.maximum(theta_cos, 0.01)
    return ((1.0 + A * jnp.exp(B / theta_cos))
            * (1.0 + C * jnp.exp(D * gamma) + E * gamma_cos * gamma_cos))


def _zenith_chroma(T, ts):
    t2, t3 = ts * ts, ts * ts * ts
    xz = ((0.00166 * t3 - 0.00375 * t2 + 0.00209 * ts) * T * T
          + (-0.02903 * t3 + 0.06377 * t2 - 0.03202 * ts + 0.00394) * T
          + (0.11693 * t3 - 0.21196 * t2 + 0.06052 * ts + 0.25886))
    yz = ((0.00275 * t3 - 0.00610 * t2 + 0.00317 * ts) * T * T
          + (-0.04214 * t3 + 0.08970 * t2 - 0.04153 * ts + 0.00516) * T
          + (0.15346 * t3 - 0.26756 * t2 + 0.06670 * ts + 0.26688))
    return xz, yz


def _xyY_to_rgb(x, y, Y):
    Yy = Y / jnp.maximum(y, 1e-5)
    X = x * Yy
    Z = (1.0 - x - y) * Yy
    r = 3.2406 * X - 1.5372 * Y - 0.4986 * Z
    g = -0.9689 * X + 1.8758 * Y + 0.0415 * Z
    b = 0.0557 * X - 0.2040 * Y + 1.0570 * Z
    return (jnp.maximum(r, 0.0), jnp.maximum(g, 0.0), jnp.maximum(b, 0.0))


def sky_radiance(d, sky: SkyState):
    """Linear RGB sky radiance for unit directions d (SoA).  Below-horizon
    directions return a dim ground-haze color (the path tracer only asks for
    downward sky when rays escape below the world)."""
    T = sky.turbidity
    sd = sky.sun_dir

    # sun zenith angle (clamped just above horizon; twilight handled by fade)
    cos_ts = jnp.clip(sd[1], 0.02, 1.0)
    ts = jnp.arccos(cos_ts)

    cos_theta = jnp.clip(d[1], 0.0, 1.0)
    cos_gamma = jnp.clip(m.dot(d, sd), -1.0, 1.0)
    gamma = jnp.arccos(cos_gamma)

    # zenith values
    chi = (4.0 / 9.0 - T / 120.0) * (jnp.pi - 2.0 * ts)
    Yz = (4.0453 * T - 4.9710) * jnp.tan(chi) - 0.2155 * T + 2.4192   # kcd/m²
    xz, yz = _zenith_chroma(T, ts)

    # Perez coefficients (Preetham table)
    AY, BY = 0.1787 * T - 1.4630, -0.3554 * T + 0.4275
    CY, DY, EY = -0.0227 * T + 5.3251, 0.1206 * T - 2.5771, -0.0670 * T + 0.3703
    Ax, Bx = -0.0193 * T - 0.2592, -0.0665 * T + 0.0008
    Cx, Dx, Ex = -0.0004 * T + 0.2125, -0.0641 * T - 0.8989, -0.0033 * T + 0.0452
    Ay, By = -0.0167 * T - 0.2608, -0.0950 * T + 0.0092
    Cy, Dy, Ey = -0.0079 * T + 0.2102, -0.0441 * T - 1.6537, -0.0109 * T + 0.0529

    def ratio(A, B, C, D, E):
        num = _perez(cos_theta, gamma, cos_gamma, A, B, C, D, E)
        den = _perez(jnp.float32(1.0), ts, cos_ts, A, B, C, D, E)
        return num / jnp.maximum(den, 1e-6)

    Y = Yz * ratio(AY, BY, CY, DY, EY)
    x = xz * ratio(Ax, Bx, Cx, Dx, Ex)
    y = yz * ratio(Ay, By, Cy, Dy, Ey)

    r, g, b = _xyY_to_rgb(x, y, Y)

    # twilight fade when the sun is below ~horizon
    fade = jnp.clip((sd[1] + 0.1) * 8.0, 0.0, 1.0)
    scale = SKY_RADIANCE_SCALE * sky.sky_intensity * fade

    # below-horizon haze: reuse horizon color, dimmed
    horizon_dim = jnp.where(d[1] < 0.0, 0.35, 1.0)
    return (r * scale * horizon_dim, g * scale * horizon_dim, b * scale * horizon_dim)


def sun_radiance(d, sky: SkyState):
    """Sun disk radiance with limb darkening (miss.cu:41-77, SkySun kernel
    equivalent). Zero outside the disk."""
    cos_g = m.dot(d, sky.sun_dir)
    in_disk = cos_g > sky.cos_sun_radius
    # limb darkening: u in [0,1] from disk center to rim
    denom = jnp.maximum(1.0 - sky.cos_sun_radius, 1e-9)
    rim = jnp.clip((1.0 - cos_g) / denom, 0.0, 1.0)
    mu = jnp.sqrt(jnp.maximum(0.0, 1.0 - rim * rim))
    limb = 0.4 + 0.6 * mu
    # sun color warms as it approaches the horizon
    elev = jnp.clip(sky.sun_dir[1], 0.0, 1.0)
    warm_r = 1.0
    warm_g = 0.75 + 0.23 * jnp.sqrt(elev)
    warm_b = 0.52 + 0.44 * jnp.sqrt(elev)
    vis = jnp.clip((sky.sun_dir[1] + 0.05) * 12.0, 0.0, 1.0)
    base = SUN_RADIANCE_SCALE * sky.sun_intensity * limb * vis
    s = jnp.where(in_disk, base, 0.0)
    return (s * warm_r, s * warm_g, s * warm_b)


def sun_radiance_cone(u1, sky: SkyState):
    """Sun radiance at a direction drawn by uniform_sample_cone(u1, u2,
    cos_sun_radius) — algebraic shortcut for the NEE sun candidate: the
    cone sample's cosθ is 1 - u1·(1-cos_max), so the limb-darkening rim
    parameter of sun_radiance IS u1.  Per-pixel cost collapses to one
    sqrt (vs dot+clip+divide+2·sqrt), everything else is scalar."""
    mu = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1 * u1))
    limb = 0.4 + 0.6 * mu
    elev = jnp.clip(sky.sun_dir[1], 0.0, 1.0)
    warm_r = 1.0
    warm_g = 0.75 + 0.23 * jnp.sqrt(elev)
    warm_b = 0.52 + 0.44 * jnp.sqrt(elev)
    vis = jnp.clip((sky.sun_dir[1] + 0.05) * 12.0, 0.0, 1.0)
    base = SUN_RADIANCE_SCALE * sky.sun_intensity * vis * limb
    return (base * warm_r, base * warm_g, base * warm_b)


def sky_plus_sun(d, sky: SkyState):
    a = sky_radiance(d, sky)
    b = sun_radiance(d, sky)
    return m.add(a, b)


# ---------------------------------------------------------------------------
# Scalar pre-evaluation for the fused shading kernel (render/ris_kernel.py):
# everything in sky_radiance that does not depend on the per-pixel direction
# is folded into one flat f32 vector per frame, so the kernel's per-pixel
# work is 6 exp + 1 acos + the xyY→RGB matrix (the reference bakes the same
# split into its per-frame launch params, Sky.cu:19-83).
# ---------------------------------------------------------------------------

# layout indices of the packed scalar vector
SF_SUN_X, SF_SUN_Y, SF_SUN_Z = 0, 1, 2
SF_COS_SUN = 3          # cos of sun angular radius
SF_PDF_SUN = 4          # solid-angle pdf of the sun cone sample
SF_SUN_R, SF_SUN_G, SF_SUN_B = 5, 6, 7   # premultiplied sun radiance tint
SF_SKY_SCALE = 8        # SKY_RADIANCE_SCALE · intensity · twilight fade
SF_PEREZ = 9            # 15 slots: (A,B,C,D,E) × (Y, x, y)
SF_ZY, SF_ZCX, SF_ZCY = 24, 25, 26       # zenith value / Perez-den per channel
SF_ANY_LIGHTS = 27
SF_LEN = 32


def sky_scalar_pack(sky: SkyState, any_lights) -> jnp.ndarray:
    """(SF_LEN,) f32 vector of per-frame sky/sun scalars (see layout above)."""
    T = sky.turbidity
    sd = sky.sun_dir
    cos_ts = jnp.clip(sd[1], 0.02, 1.0)
    ts = jnp.arccos(cos_ts)

    chi = (4.0 / 9.0 - T / 120.0) * (jnp.pi - 2.0 * ts)
    Yz = (4.0453 * T - 4.9710) * jnp.tan(chi) - 0.2155 * T + 2.4192
    xz, yz = _zenith_chroma(T, ts)

    coefs = [
        (0.1787 * T - 1.4630, -0.3554 * T + 0.4275,
         -0.0227 * T + 5.3251, 0.1206 * T - 2.5771, -0.0670 * T + 0.3703),
        (-0.0193 * T - 0.2592, -0.0665 * T + 0.0008,
         -0.0004 * T + 0.2125, -0.0641 * T - 0.8989, -0.0033 * T + 0.0452),
        (-0.0167 * T - 0.2608, -0.0950 * T + 0.0092,
         -0.0079 * T + 0.2102, -0.0441 * T - 1.6537, -0.0109 * T + 0.0529),
    ]
    dens = [jnp.maximum(_perez(jnp.float32(1.0), ts, cos_ts, *c), 1e-6)
            for c in coefs]

    fade = jnp.clip((sd[1] + 0.1) * 8.0, 0.0, 1.0)
    scale = SKY_RADIANCE_SCALE * sky.sky_intensity * fade

    # sun cone-candidate constants (sun_radiance_cone minus the per-pixel limb)
    elev = jnp.clip(sd[1], 0.0, 1.0)
    warm = (jnp.float32(1.0), 0.75 + 0.23 * jnp.sqrt(elev),
            0.52 + 0.44 * jnp.sqrt(elev))
    vis = jnp.clip((sd[1] + 0.05) * 12.0, 0.0, 1.0)
    sun_base = SUN_RADIANCE_SCALE * sky.sun_intensity * vis
    pdf_sun = 1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - sky.cos_sun_radius), 1e-9)

    v = [sd[0], sd[1], sd[2], sky.cos_sun_radius, pdf_sun,
         sun_base * warm[0], sun_base * warm[1], sun_base * warm[2],
         scale]
    for c in coefs:
        v.extend(c)
    v.extend([Yz / dens[0], xz / dens[1], yz / dens[2]])
    v.append(jnp.asarray(any_lights, jnp.float32))
    v.extend([jnp.float32(0.0)] * (SF_LEN - len(v)))
    return jnp.stack([jnp.asarray(x, jnp.float32) for x in v])


def _acos_poly(x):
    """Branchless polynomial acos (Abramowitz–Stegun 4.4.45, |err| ≤ 7e-5
    rad) — Mosaic has no acos primitive; gamma only feeds exp(D·γ) so this
    is more than accurate enough."""
    ax = jnp.abs(x)
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * (
        1.5707963 + ax * (-0.2121144 + ax * (0.0742610 - 0.0187293 * ax)))
    return jnp.where(x >= 0.0, r, jnp.pi - r)


def sky_radiance_scalars(d, sf, rcp=None):
    """sky_radiance re-expressed over the packed scalar vector (kernel-side
    twin; rcp lets the kernel substitute an approximate reciprocal)."""
    if rcp is None:
        rcp = lambda x: 1.0 / x
    sun = (sf[SF_SUN_X], sf[SF_SUN_Y], sf[SF_SUN_Z])
    cos_theta = jnp.clip(d[1], 0.0, 1.0)
    cos_gamma = jnp.clip(m.dot(d, sun), -1.0, 1.0)
    gamma = _acos_poly(cos_gamma)
    inv_ct = rcp(jnp.maximum(cos_theta, 0.01))
    g2 = cos_gamma * cos_gamma

    def num(i):
        A, B, C, D, E = (sf[SF_PEREZ + 5 * i + k] for k in range(5))
        return ((1.0 + A * jnp.exp(B * inv_ct))
                * (1.0 + C * jnp.exp(D * gamma) + E * g2))

    Y = sf[SF_ZY] * num(0)
    x = sf[SF_ZCX] * num(1)
    y = sf[SF_ZCY] * num(2)

    Yy = Y * rcp(jnp.maximum(y, 1e-5))
    X = x * Yy
    Z = (1.0 - x - y) * Yy
    r = jnp.maximum(3.2406 * X - 1.5372 * Y - 0.4986 * Z, 0.0)
    g = jnp.maximum(-0.9689 * X + 1.8758 * Y + 0.0415 * Z, 0.0)
    b = jnp.maximum(0.0557 * X - 0.2040 * Y + 1.0570 * Z, 0.0)
    s = sf[SF_SKY_SCALE] * jnp.where(d[1] < 0.0, 0.35, 1.0)
    return (r * s, g * s, b * s)


# ---------------------------------------------------------------------------
# Equal-area environment map + pdf (Sky.cu:355-396 parity; used for light
# sampling diagnostics/tests, not by the hot path)
# ---------------------------------------------------------------------------

def equal_area_dirs(w: int, h: int):
    """Directions for an equal-area (lambert cylindrical) upper-hemisphere map."""
    u = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) / w
    v = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5) / h
    phi = 2.0 * jnp.pi * u
    cos_t = jnp.broadcast_to(1.0 - v, (h, w))          # v=0 → zenith
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    d = (sin_t * jnp.cos(phi + 0 * cos_t), cos_t, sin_t * jnp.sin(phi + 0 * cos_t))
    return d


def build_sky_map(sky: SkyState, w: int, h: int):
    """(h, w, 3) radiance map + luminance pdf (normalized)."""
    d = equal_area_dirs(w, h)
    r, g, b = sky_radiance(d, sky)
    lum = m.luminance(r, g, b)
    pdf = lum / jnp.maximum(lum.sum(), 1e-9)
    return jnp.stack([r, g, b], axis=-1), pdf


# ---------------------------------------------------------------------------
# Env importance sampling (the NEE sky candidate's distribution —
# closesthit.cu samples the sky via the equal-area map + alias table)
# ---------------------------------------------------------------------------

_ENV_OMEGA = 2.0 * jnp.pi / (ENV_W * ENV_H)   # equal-area texel solid angle


def sky_env_sample(sky: SkyState, u1, u2, u3):
    """Draw a sky direction ∝ the env luminance map.  Returns (dir SoA,
    pdf_solid_angle).  u1 picks the texel (alias), u2/u3 jitter within it."""
    from ..ops.gatherlib import fast_gather, fast_gather_multi
    n = ENV_W * ENV_H
    un = u1 * n
    col = jnp.clip(un.astype(jnp.int32), 0, n - 1)
    frac = un - col.astype(jnp.float32)
    pr, al = fast_gather_multi((sky.env_prob, sky.env_alias), col)
    texel = jnp.where(frac < pr, col, al)
    pmf = fast_gather(sky.env_pmf, texel)

    iu = (texel % ENV_W).astype(jnp.float32)
    iv = (texel // ENV_W).astype(jnp.float32)
    phi = 2.0 * jnp.pi * (iu + u2) / ENV_W
    cos_t = 1.0 - (iv + u3) / ENV_H          # v=0 → zenith (equal-area)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    d = (sin_t * jnp.cos(phi), cos_t, sin_t * jnp.sin(phi))
    pdf = pmf / _ENV_OMEGA
    return d, pdf


def sky_env_pdf(sky: SkyState, d):
    """Solid-angle pdf sky_env_sample would assign to direction d
    (0 below the horizon) — the BSDF-side MIS counterweight."""
    from ..ops.gatherlib import fast_gather
    phi = jnp.arctan2(d[2], d[0])
    u = jnp.mod(phi / (2.0 * jnp.pi), 1.0)
    iu = jnp.clip((u * ENV_W).astype(jnp.int32), 0, ENV_W - 1)
    iv = jnp.clip(((1.0 - d[1]) * ENV_H).astype(jnp.int32), 0, ENV_H - 1)
    pmf = fast_gather(sky.env_pmf, iv * ENV_W + iu)
    return jnp.where(d[1] > 0.0, pmf / _ENV_OMEGA, 0.0)
