"""Analytic daylight sky + sun model — spectral Hosek–Wilkie fidelity.

Capability parity with the reference's spectral sky stack (renderer/sky/
Sky.{h,cu} + SkyData.h — the published 10-channel Hosek–Wilkie fitted model,
solar disk with spectral limb darkening, time-of-day sun rotation about a
tilted axis).  The TPU split (render/sky_spectral.py):

* The EXACT 10-channel model runs in numpy at sun-change time only — it
  builds the env sampling tables, the fidelity gates, and the fit below.
* Per-pixel paths evaluate a 12-function RGB basis least-squares-fitted to
  the exact model per sun position (~1% residual; 3 exp + sqrt + rsqrt +
  ~40 MACs per lane — cheaper than the Preetham stack it replaced, and far
  cheaper on TPU than the reference's 512K-texel sky texture fetch).
* The sun disk is EXACT: limb darkening is polynomial in the sample cosine,
  so the spectral→RGB projection is a degree-5 RGB polynomial re-fit per
  sun elevation (sky_spectral.sun_rgb_poly).

``SkySettings.model`` selects the fit target: "hosek" (default — reference
parity) or "preetham" (the pre-r5 look; same per-pixel basis evaluation).
The equal-area environment map + pdf of the reference (Sky.cu:355-396) is
still built for light-sampling; radiance at a sampled direction is always
evaluated analytically (consistent estimator).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..core.config import SkySettings
from ..ops import mathutil as m
from . import sky_spectral as ss

# Calibration from Preetham's kcd/m² to engine radiance units (kept for the
# "preetham" fit target; exposure normalizes absolute scale).
SKY_RADIANCE_SCALE = 0.035
# Engine calibration of the Hosek model: matches the Preetham path's zenith
# luminance at the canonical sun so exposure stays in regime (the measured
# ratio is ≈3.3; see tools-side calibration note in docs/SKY_FIDELITY.md).
SPECTRAL_SCALE = 3.0
# Preetham-mode sun disk radiance (legacy constant; the hosek sun comes from
# the solar datasets — physical, ~1e6× the zenith sky, Sky.cu:176-256).
SUN_RADIANCE_SCALE = 1.2e5


# Env-map sampler resolution: 8×4 equal-area texels.  Small on purpose — it
# shapes the sampling pdf only (the sky luminance field is smooth, so 32
# texels already localize the solar aureole); radiance at the sampled
# direction is always evaluated analytically (unbiased).  Every texel the
# table grows costs a one-hot select per pixel per draw in the NEE stream
# (3 draws + 1 pdf per bounce), so this trades a little sampling variance
# for ~4x less VPU work than the 16×8 map.
ENV_W, ENV_H = 8, 4

N_BASIS = ss.N_BASIS


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
    # fitted per-sun RGB sky basis (engine units, twilight fade folded in):
    # params [B̄, Ē₁, Ē₂, H̄] + (12, 3) matrix (sky_spectral.fit_basis)
    basis_p: jnp.ndarray = None    # (4,)
    basis_m: jnp.ndarray = None    # (N_BASIS, 3)
    # sun disk RGB polynomial in the limb sample cosine (engine units,
    # horizon visibility folded in): radiance(s) = Σ_i sun_poly[i]·s^i
    sun_poly: jnp.ndarray = None   # (6, 3)


def sun_direction(time_of_day, axis_angle_deg):
    """Sun path: east → zenith → west rotated about x by the axis tilt
    (Sky.cu:363-369 time-of-day rotation equivalent)."""
    h = (time_of_day / 24.0) * 2.0 * jnp.pi
    c = jnp.cos(h - jnp.pi * 0.5)
    s = jnp.sin(h - jnp.pi * 0.5)
    a = jnp.deg2rad(axis_angle_deg)
    # base circle in xy plane, tilted about x axis
    return m.normalize((c, s * jnp.cos(a), s * jnp.sin(a)))


def _preetham_rgb_np(dirs: np.ndarray, sun: np.ndarray, T: float) -> np.ndarray:
    """Preetham et al. 1999 analytic model in numpy (fit target for
    SkySettings.model == "preetham"): zenith chromaticity polynomials +
    Perez luminance distribution, kcd/m² × SKY_RADIANCE_SCALE units."""
    cos_ts = float(np.clip(sun[1], 0.02, 1.0))
    ts = float(np.arccos(cos_ts))
    t2, t3 = ts * ts, ts ** 3
    xz = ((0.00166 * t3 - 0.00375 * t2 + 0.00209 * ts) * T * T
          + (-0.02903 * t3 + 0.06377 * t2 - 0.03202 * ts + 0.00394) * T
          + (0.11693 * t3 - 0.21196 * t2 + 0.06052 * ts + 0.25886))
    yz = ((0.00275 * t3 - 0.00610 * t2 + 0.00317 * ts) * T * T
          + (-0.04214 * t3 + 0.08970 * t2 - 0.04153 * ts + 0.00516) * T
          + (0.15346 * t3 - 0.26756 * t2 + 0.06670 * ts + 0.26688))
    chi = (4.0 / 9.0 - T / 120.0) * (np.pi - 2.0 * ts)
    Yz = (4.0453 * T - 4.9710) * np.tan(chi) - 0.2155 * T + 2.4192

    coefs = {
        "Y": (0.1787 * T - 1.4630, -0.3554 * T + 0.4275, -0.0227 * T + 5.3251,
              0.1206 * T - 2.5771, -0.0670 * T + 0.3703),
        "x": (-0.0193 * T - 0.2592, -0.0665 * T + 0.0008, -0.0004 * T + 0.2125,
              -0.0641 * T - 0.8989, -0.0033 * T + 0.0452),
        "y": (-0.0167 * T - 0.2608, -0.0950 * T + 0.0092, -0.0079 * T + 0.2102,
              -0.0441 * T - 1.6537, -0.0109 * T + 0.0529),
    }

    cos_t = np.clip(dirs[:, 1], 0.01, 1.0)
    cos_g = np.clip(dirs @ sun, -1.0, 1.0)
    gamma = np.arccos(cos_g)

    def perez(ct, g, cg, A, B, C, D, E):
        return (1.0 + A * np.exp(B / ct)) * (1.0 + C * np.exp(D * g) + E * cg * cg)

    def ratio(key):
        A, B, C, D, E = coefs[key]
        den = max(perez(1.0, ts, cos_ts, A, B, C, D, E), 1e-6)
        return perez(cos_t, gamma, cos_g, A, B, C, D, E) / den

    Y = Yz * ratio("Y")
    x = xz * ratio("x")
    y = yz * ratio("y")
    Yy = Y / np.maximum(y, 1e-5)
    X = x * Yy
    Z = (1.0 - x - y) * Yy
    rgb = np.stack([3.2406 * X - 1.5372 * Y - 0.4986 * Z,
                    -0.9689 * X + 1.8758 * Y + 0.0415 * Z,
                    0.0557 * X - 0.2040 * Y + 1.0570 * Z], -1)
    return np.maximum(rgb, 0.0) * SKY_RADIANCE_SCALE


def _fit_sky_basis(s: SkySettings, sun_np: np.ndarray):
    """(basis_p, basis_m, sun_poly) in engine units for the configured model."""
    fade = float(np.clip((sun_np[1] + 0.1) * 8.0, 0.0, 1.0))
    vis = float(np.clip((sun_np[1] + 0.05) * 12.0, 0.0, 1.0))
    model = getattr(s, "model", "hosek")
    if model == "hosek":
        params, M = ss.fit_basis(sun_np)
        M = M * (SPECTRAL_SCALE * s.sky_intensity * fade)
        poly = ss.sun_rgb_poly(float(sun_np[1]), s.sun_angular_diameter)
        poly = poly * (SPECTRAL_SCALE * s.sun_intensity * vis)
    else:
        # Preetham fit target through the same basis (one per-pixel path)
        params, M = _fit_preetham_basis(sun_np, s.turbidity)
        M = M * (s.sky_intensity * fade)
        # legacy warm/limb sun: limb = 0.4 + 0.6·s exactly (degree-1 poly)
        elev = float(np.clip(sun_np[1], 0.0, 1.0))
        warm = np.array([1.0, 0.75 + 0.23 * np.sqrt(elev),
                         0.52 + 0.44 * np.sqrt(elev)])
        base = SUN_RADIANCE_SCALE * s.sun_intensity * vis
        poly = np.zeros((6, 3))
        poly[0] = 0.4 * base * warm
        poly[1] = 0.6 * base * warm
    return (jnp.asarray(params, jnp.float32),
            jnp.asarray(M, jnp.float32),
            jnp.asarray(poly, jnp.float32))


def _fit_preetham_basis(sun_np: np.ndarray, T: float):
    """LS-fit the 12-function basis against the Preetham model (numpy)."""
    n = 4096
    i = np.arange(n, dtype=np.float64) + 0.5
    cos_t = 1.0 - i / n
    phi = i * (np.pi * (3.0 - np.sqrt(5.0)))
    sin_t = np.sqrt(np.maximum(0.0, 1.0 - cos_t ** 2))
    dirs = np.stack([sin_t * np.cos(phi), cos_t, sin_t * np.sin(phi)], -1)
    target = _preetham_rgb_np(dirs, sun_np, float(T)) / SKY_RADIANCE_SCALE
    # representative nonlinear constants from the Perez Y row
    B = float(-0.3554 * T + 0.4275)
    D = float(0.1206 * T - 2.5771)
    params = np.array([B, D, D * 0.35, 0.6], np.float64)
    cos_g = np.clip(dirs @ sun_np, -1.0, 1.0)
    gamma = np.arccos(cos_g)
    F = np.stack(ss._features(np.clip(dirs[:, 1], 0.0, 1.0), cos_g, gamma,
                              *params, xp=np), -1)
    wgt = 1.0 / np.maximum(np.linalg.norm(target, axis=-1, keepdims=True), 1e-3)
    M, *_ = np.linalg.lstsq(F * wgt, target * wgt, rcond=None)
    return params.astype(np.float32), (M * SKY_RADIANCE_SCALE).astype(np.float32)


def make_sky_state(s: SkySettings) -> SkyState:
    f32 = jnp.float32
    sun = sun_direction(f32(s.time_of_day), f32(s.sun_axis_angle))
    sun_np = np.array([float(v) for v in sun], np.float64)
    basis_p, basis_m, sun_poly = _fit_sky_basis(s, sun_np)
    base = SkyState(
        sun_dir=sun,
        turbidity=f32(s.turbidity),
        sky_intensity=f32(s.sky_intensity),
        sun_intensity=f32(s.sun_intensity),
        cos_sun_radius=jnp.cos(jnp.deg2rad(f32(s.sun_angular_diameter) * 0.5)),
        env_prob=jnp.ones((ENV_W * ENV_H,)),
        env_alias=jnp.zeros((ENV_W * ENV_H,), jnp.int32),
        env_pmf=jnp.full((ENV_W * ENV_H,), 1.0 / (ENV_W * ENV_H)),
        basis_p=basis_p, basis_m=basis_m, sun_poly=sun_poly,
    )
    # luminance-weighted alias table over the equal-area map
    from ..ops import alias_table as at
    _, pdf = build_sky_map(base, ENV_W, ENV_H)
    tab = at.build(np.maximum(np.asarray(pdf).reshape(-1), 1e-9))
    return base._replace(env_prob=tab.prob, env_alias=tab.alias,
                         env_pmf=tab.pmf)


# ---------------------------------------------------------------------------
# Per-pixel evaluation (fitted basis — one implementation for XLA + kernel)
# ---------------------------------------------------------------------------

def sky_radiance(d, sky: SkyState):
    """Linear RGB sky radiance for unit directions d (SoA).  Below-horizon
    directions return a dim ground-haze color (the path tracer only asks for
    downward sky when rays escape below the world)."""
    cos_t = jnp.clip(d[1], 0.0, 1.0)
    cos_g = jnp.clip(m.dot(d, sky.sun_dir), -1.0, 1.0)
    gamma = jnp.arccos(cos_g)
    r, g, b = ss.eval_basis(cos_t, cos_g, gamma, sky.basis_p, sky.basis_m)
    horizon_dim = jnp.where(d[1] < 0.0, 0.35, 1.0)
    return (r * horizon_dim, g * horizon_dim, b * horizon_dim)


def _sun_poly_eval(poly, s):
    """Horner eval of the degree-5 RGB limb polynomial at sample cosine s."""
    r = poly[5, 0]
    g = poly[5, 1]
    b = poly[5, 2]
    for i in (4, 3, 2, 1, 0):
        r = r * s + poly[i, 0]
        g = g * s + poly[i, 1]
        b = b * s + poly[i, 2]
    return r, g, b


def sun_radiance(d, sky: SkyState):
    """Sun disk radiance with spectral limb darkening (Sky.cu:176-256
    GetSunRadiance role). Zero outside the disk.  The per-direction work is
    the sample cosine s = √(1 − sin²γ/sin²r) + one degree-5 RGB Horner."""
    cos_g = m.dot(d, sky.sun_dir)
    in_disk = cos_g > sky.cos_sun_radius
    sin2_r = jnp.maximum(1.0 - sky.cos_sun_radius * sky.cos_sun_radius, 1e-12)
    s2 = 1.0 - (1.0 - cos_g * cos_g) / sin2_r
    s = jnp.sqrt(jnp.clip(s2, 0.0, 1.0))
    r, g, b = _sun_poly_eval(sky.sun_poly, s)
    z = jnp.where(in_disk, 1.0, 0.0)
    return (jnp.maximum(r, 0.0) * z, jnp.maximum(g, 0.0) * z,
            jnp.maximum(b, 0.0) * z)


def sun_radiance_cone(u1, sky: SkyState):
    """Sun radiance at a direction drawn by uniform_sample_cone(u1, u2,
    cos_sun_radius) — algebraic shortcut for the NEE sun candidate: the
    cone sample's cosγ is 1 − u1·(1 − cos_r), so the sample cosine follows
    directly from u1 without ever forming the direction."""
    cos_r = sky.cos_sun_radius
    cos_g = 1.0 - u1 * (1.0 - cos_r)
    sin2_r = jnp.maximum(1.0 - cos_r * cos_r, 1e-12)
    s = jnp.sqrt(jnp.clip(1.0 - (1.0 - cos_g * cos_g) / sin2_r, 0.0, 1.0))
    r, g, b = _sun_poly_eval(sky.sun_poly, s)
    return (jnp.maximum(r, 0.0), jnp.maximum(g, 0.0), jnp.maximum(b, 0.0))


def sky_plus_sun(d, sky: SkyState):
    a = sky_radiance(d, sky)
    b = sun_radiance(d, sky)
    return m.add(a, b)


# ---------------------------------------------------------------------------
# Scalar pre-evaluation for the fused shading kernel (render/ris_kernel.py):
# everything that does not depend on the per-pixel direction is folded into
# one flat f32 vector per frame — the fitted basis matrix, the sun polynomial
# and the sampling constants (the reference bakes the same split into its
# per-frame launch params, Sky.cu:19-83).
# ---------------------------------------------------------------------------

# layout indices of the packed scalar vector
SF_SUN_X, SF_SUN_Y, SF_SUN_Z = 0, 1, 2
SF_COS_SUN = 3          # cos of sun angular radius
SF_PDF_SUN = 4          # solid-angle pdf of the sun cone sample
SF_ANY_LIGHTS = 5
SF_INV_SIN2R = 6        # 1 / sin²(sun radius) — limb sample-cosine constant
SF_SUN_POLY = 8         # 18 slots: (6 powers) × RGB, row-major i*3+c
SF_BASIS_P = 26         # 4 slots: B̄, Ē₁, Ē₂, H̄
SF_BASIS_M = 30         # 36 slots: (12 basis fns) × RGB, row-major k*3+c
SF_LEN = 72


def sky_scalar_pack(sky: SkyState, any_lights) -> jnp.ndarray:
    """(SF_LEN,) f32 vector of per-frame sky/sun scalars (see layout above)."""
    sd = sky.sun_dir
    pdf_sun = 1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - sky.cos_sun_radius), 1e-9)
    inv_sin2r = 1.0 / jnp.maximum(1.0 - sky.cos_sun_radius ** 2, 1e-12)
    v = [sd[0], sd[1], sd[2], sky.cos_sun_radius, pdf_sun,
         jnp.asarray(any_lights, jnp.float32), inv_sin2r, jnp.float32(0.0)]
    v.extend(sky.sun_poly.reshape(-1))       # 8..25
    v.extend(sky.basis_p.reshape(-1))        # 26..29
    v.extend(sky.basis_m.reshape(-1))        # 30..65
    v.extend([jnp.float32(0.0)] * (SF_LEN - len(v)))
    return jnp.stack([jnp.asarray(x, jnp.float32) for x in v])


def sky_radiance_scalars(d, sf, rcp=None, rsqrt=None):
    """sky_radiance re-expressed over the packed scalar vector (kernel-side
    twin; rcp/rsqrt let the kernel substitute fast approximations)."""
    sun = (sf[SF_SUN_X], sf[SF_SUN_Y], sf[SF_SUN_Z])
    cos_t = jnp.clip(d[1], 0.0, 1.0)
    cos_g = jnp.clip(m.dot(d, sun), -1.0, 1.0)
    gamma = _acos_poly(cos_g)
    f = ss._features(cos_t, cos_g, gamma, sf[SF_BASIS_P], sf[SF_BASIS_P + 1],
                     sf[SF_BASIS_P + 2], sf[SF_BASIS_P + 3],
                     xp=jnp, rcp=rcp, rsqrt=rsqrt)
    r = g = b = None
    for k in range(N_BASIS):
        r = f[k] * sf[SF_BASIS_M + k * 3] if r is None \
            else r + f[k] * sf[SF_BASIS_M + k * 3]
        g = f[k] * sf[SF_BASIS_M + k * 3 + 1] if g is None \
            else g + f[k] * sf[SF_BASIS_M + k * 3 + 1]
        b = f[k] * sf[SF_BASIS_M + k * 3 + 2] if b is None \
            else b + f[k] * sf[SF_BASIS_M + k * 3 + 2]
    hz = jnp.where(d[1] < 0.0, 0.35, 1.0)
    return (jnp.maximum(r, 0.0) * hz, jnp.maximum(g, 0.0) * hz,
            jnp.maximum(b, 0.0) * hz)


def sun_radiance_scalars_cone(sin_t, sf):
    """Sun radiance for the kernel's cone candidate, from the sampled sine
    of the cone angle (already computed for the direction): the limb sample
    cosine is √(1 − sin²γ · SF_INV_SIN2R), then the degree-5 RGB Horner over
    the packed polynomial."""
    s = jnp.sqrt(jnp.clip(1.0 - sin_t * sin_t * sf[SF_INV_SIN2R], 0.0, 1.0))
    r = sf[SF_SUN_POLY + 15]
    g = sf[SF_SUN_POLY + 16]
    b = sf[SF_SUN_POLY + 17]
    for i in (4, 3, 2, 1, 0):
        r = r * s + sf[SF_SUN_POLY + i * 3]
        g = g * s + sf[SF_SUN_POLY + i * 3 + 1]
        b = b * s + sf[SF_SUN_POLY + i * 3 + 2]
    return (jnp.maximum(r, 0.0), jnp.maximum(g, 0.0), jnp.maximum(b, 0.0))


def _acos_poly(x):
    """Branchless polynomial acos (Abramowitz–Stegun 4.4.45, |err| ≤ 7e-5
    rad) — Mosaic has no acos primitive; gamma only feeds exp(D·γ) so this
    is more than accurate enough."""
    ax = jnp.abs(x)
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * (
        1.5707963 + ax * (-0.2121144 + ax * (0.0742610 - 0.0187293 * ax)))
    return jnp.where(x >= 0.0, r, jnp.pi - r)


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
