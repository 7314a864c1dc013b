"""Post-processing pipeline: exposure → bloom → lens flare → vignette →
tone map → upscale → sharpen.

Capability parity with renderer/postprocessing/ (PostProcessingPipeline.cu:
luminance histogram + percentile auto-exposure with temporal adaptation,
bloom extract/blur/composite, lens flare, vignette; FilmicToneMapping.h:
ACES/Uncharted2/Reinhard curves + lift/gain/contrast/saturation;
ScalingFilter.h: FSR-EASU upscale; SharpeningFilter.h: RCAS sharpen).

Everything is whole-image jnp ops — XLA fuses the elementwise chain into a
couple of kernels; the reductions (histogram/percentile) are tiny.
State that persists across frames (adapted exposure) travels in PostState.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import PostProcessingSettings, ToneMappingSettings
from ..ops import mathutil as m


class PostState(NamedTuple):
    exposure: jnp.ndarray     # adapted log2 exposure


def initial_post_state() -> PostState:
    return PostState(exposure=jnp.float32(0.0))


# ---------------------------------------------------------------------------
# Auto exposure (ComputeLuminanceHistogramKernel + ComputeAutoExposure)
# ---------------------------------------------------------------------------

def _box_down4(img):
    """4×4 average-pool via reduce_window: the reshape-to-(h/4,4,w/4,4)
    formulation relayouts the whole frame (~0.76 ms per channel at 1080p,
    measured); reduce_window keeps the native (8,128) tiling."""
    r = jax.lax.reduce_window(img, 0.0, jax.lax.add,
                              (4, 4) + (1,) * (img.ndim - 2),
                              (4, 4) + (1,) * (img.ndim - 2), "VALID")
    return r * (1.0 / 16.0)


def auto_exposure(rgb, state: PostState, cfg: PostProcessingSettings, dt):
    # 4×4 box-downsampled luminance (the reference reads a luminance mip,
    # PostProcessingPipeline.cu) — 16× fewer histogram samples, same stats
    h4 = (rgb.shape[0] // 4) * 4
    w4 = (rgb.shape[1] // 4) * 4
    small = _box_down4(rgb[:h4, :w4])
    lum = m.luminance(small[..., 0], small[..., 1], small[..., 2])
    log_lum = jnp.log2(jnp.maximum(lum, 1e-6))
    lo, hi = cfg.exposure_min_log, cfg.exposure_max_log
    nbins = 64
    t = jnp.clip((log_lum - lo) / (hi - lo), 0.0, 1.0)
    bins = jnp.clip((t * nbins).astype(jnp.int32), 0, nbins - 1)
    # binning as a fused one-hot reduction (TPU scatter-add is serial)
    ids = jax.lax.broadcasted_iota(jnp.int32, bins.shape + (nbins,), bins.ndim)
    hist = (ids == bins[..., None]).astype(jnp.float32).sum((0, 1))
    cdf = jnp.cumsum(hist) / jnp.maximum(hist.sum(), 1.0)
    centers = lo + (jnp.arange(nbins) + 0.5) / nbins * (hi - lo)
    in_win = (cdf >= cfg.exposure_low_percentile) & (cdf <= cfg.exposure_high_percentile)
    w = jnp.where(in_win, hist, 0.0)
    avg_log = jnp.sum(w * centers) / jnp.maximum(jnp.sum(w), 1.0)
    target = -avg_log - 1.0      # map windowed average to mid grey
    adapt = 1.0 - jnp.exp(-cfg.exposure_adapt_speed * dt)
    new_exp = state.exposure + (target - state.exposure) * adapt
    return new_exp


# ---------------------------------------------------------------------------
# Bloom (extract with firefly clamp → separable blur → additive composite)
# ---------------------------------------------------------------------------

def _box_blur(img, radius: int, axis: int):
    acc = img
    for r in range(1, radius + 1):
        acc = acc + jnp.roll(img, r, axis=axis) + jnp.roll(img, -r, axis=axis)
    return acc / (2 * radius + 1)


def bloom(rgb, cfg: PostProcessingSettings):
    # firefly clamp in the extract (the sun disk is ~1e5 — unclamped it would
    # wash the whole frame; PostProcessingPipeline.cu:12-80 does the same)
    rgb_c = jnp.minimum(rgb, 64.0)
    lum = m.luminance(rgb_c[..., 0], rgb_c[..., 1], rgb_c[..., 2])
    k = jnp.maximum(lum - cfg.bloom_threshold, 0.0) / jnp.maximum(lum, 1e-6)
    bright = rgb_c * k[..., None]
    # downsample 4x, blur, upsample (cheap pyramid)
    h, w = rgb.shape[:2]
    h4, w4 = h // 4, w // 4
    small = _box_down4(bright[: h4 * 4, : w4 * 4])
    small = _box_blur(_box_blur(small, 4, 0), 4, 1)
    small = _box_blur(_box_blur(small, 2, 0), 2, 1)
    up = jnp.repeat(jnp.repeat(small, 4, axis=0), 4, axis=1)
    up = jnp.pad(up, ((0, h - h4 * 4), (0, w - w4 * 4), (0, 0)), mode="edge")
    return rgb + cfg.bloom_intensity * up


def lens_flare(rgb, cfg: PostProcessingSettings):
    """Ghosts + chromatic halo (LensFlareKernel role,
    PostProcessingPipeline.cu:~223: mirrored ghost chain with per-channel
    dispersion + halo ring).  TPU shape: every element is a mirror/stride
    slice or an analytic radial mask — no resampling gathers.  Chromatic
    dispersion comes from per-ghost RGB tints and per-channel halo radii
    instead of per-channel UV scaling (same visual read, zero gathers)."""
    lum = m.luminance(rgb[..., 0], rgb[..., 1], rgb[..., 2])
    k = jnp.maximum(lum - cfg.bloom_threshold * 2.0, 0.0)
    bright = rgb * k[..., None]
    h, w = rgb.shape[:2]

    tint = lambda r, g, b: jnp.asarray([r, g, b], rgb.dtype)
    # ghost 1: full-size center mirror, cool (short wavelengths refract more)
    ghost1 = bright[::-1, ::-1] * tint(0.35, 0.55, 0.9)
    # ghost 2: half-scale, center-offset, warm
    g2 = bright[::2, ::2] * tint(0.9, 0.6, 0.3)
    ghost2 = jnp.zeros_like(rgb).at[h // 4: h // 4 + g2.shape[0],
                                    w // 4: w // 4 + g2.shape[1]].set(g2)
    # ghost 3: quarter-scale mirrored, magenta (iris reflection)
    g3 = bright[::-4, ::-4] * tint(0.8, 0.3, 0.8)
    ghost3 = jnp.zeros_like(rgb).at[(3 * h) // 8: (3 * h) // 8 + g3.shape[0],
                                    (3 * w) // 8: (3 * w) // 8 + g3.shape[1]
                                    ].set(g3)

    # chromatic halo: total bright energy smeared along a center ring whose
    # radius shifts per channel (dispersion) — the reference's halo/chromatic
    # sampling (per-channel uv-scaled gathers) expressed as analytic ring
    # weights × the scene's aggregate flare energy (a point source must light
    # the WHOLE ring, so the drive is the frame mean, not a local mirror)
    yy = ((jnp.arange(h) + 0.5) / h - 0.5)[:, None] * 2.0
    xx = ((jnp.arange(w) + 0.5) / w - 0.5)[None, :] * 2.0
    r = jnp.sqrt(yy * yy + xx * xx)
    energy = jnp.mean(bright, axis=(0, 1))          # (3,) scalar drive
    halo = jnp.stack([
        energy[0] * jnp.exp(-jnp.square((r - 0.42) / 0.05)),
        energy[1] * jnp.exp(-jnp.square((r - 0.46) / 0.05)),
        energy[2] * jnp.exp(-jnp.square((r - 0.50) / 0.05)),
    ], axis=-1) * 12.0

    return rgb + cfg.lens_flare_intensity * (
        0.5 * ghost1 + 0.3 * ghost2 + 0.25 * ghost3 + 0.8 * halo)


def vignette(rgb, cfg: PostProcessingSettings):
    h, w = rgb.shape[:2]
    y = (jnp.arange(h) / h - 0.5)[:, None] * 2.0
    x = (jnp.arange(w) / w - 0.5)[None, :] * 2.0
    r2 = x * x + y * y
    fall = 1.0 - cfg.vignette_strength * jnp.clip(r2 * 0.7, 0.0, 1.0)
    return rgb * fall[..., None]


# ---------------------------------------------------------------------------
# Tone mapping (FilmicToneMapping.h curves + grading)
# ---------------------------------------------------------------------------

def _aces(x):
    # Narkowicz ACES fit
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def _uncharted2(x, white):
    def f(v):
        A, Bc, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
        return ((v * (A * v + C * Bc) + D * E) / (v * (A * v + Bc) + D * F)) - E / F
    return jnp.clip(f(x) / jnp.maximum(f(jnp.float32(white)), 1e-6), 0.0, 1.0)


def tone_map(rgb, tm: ToneMappingSettings, exposure_log2):
    x = rgb * jnp.exp2(exposure_log2 + tm.exposure_compensation)
    if tm.curve == "aces":
        y = _aces(x)
    elif tm.curve == "uncharted2":
        y = _uncharted2(x, tm.white_point)
    elif tm.curve == "reinhard":
        y = jnp.clip(x / (1.0 + x), 0.0, 1.0)
    else:
        y = jnp.clip(x, 0.0, 1.0)
    # grading: lift/gain/contrast/saturation
    y = tm.lift + (tm.gain - tm.lift) * y
    y = jnp.clip(0.5 + (y - 0.5) * tm.contrast, 0.0, 1.0)
    grey = m.luminance(y[..., 0], y[..., 1], y[..., 2])[..., None]
    y = jnp.clip(grey + (y - grey) * tm.saturation, 0.0, 1.0)
    # sRGB encode
    return jnp.where(y <= 0.0031308, 12.92 * y, 1.055 * jnp.power(y, 1 / 2.4) - 0.055)


# ---------------------------------------------------------------------------
# Upscale — EASU (ScalingFilter.h:124 role) + Catmull-Rom bicubic fallback
# ---------------------------------------------------------------------------

def _src_base(out_size: int, in_size: int):
    pos = (jnp.arange(out_size) + 0.5) * in_size / out_size - 0.5
    base = jnp.floor(pos).astype(jnp.int32)
    return base, (pos - base).astype(jnp.float32)


def _take_rational(img, out_size: int, axis: int, delta: int):
    """img[..., base+delta, ...] along `axis` where base is the upscale
    source index — gather-free on TPU: for a rational out:in ratio p:q the
    index sequence is periodic (base[i+p] = base[i]+q), so each of the p
    phases is one q-strided slice; phases interleave with a reshape.  Falls
    back to jnp.take when the ratio isn't small-rational (CPU path, odd
    sizes)."""
    import math
    in_size = img.shape[axis]
    g = math.gcd(out_size, in_size)
    p, q = out_size // g, in_size // g
    base = np.floor((np.arange(out_size) + 0.5) * in_size / out_size - 0.5
                    ).astype(np.int64) + delta
    if p > 8:
        idx = jnp.asarray(np.clip(base, 0, in_size - 1), jnp.int32)
        return jnp.take(img, idx, axis=axis)
    # pad the axis so every phase slice [start : start + q*g : q] is in range
    lo_pad = max(0, -int(base[:p].min()))
    hi_pad = max(0, int(base[-p:].max()) + 1 - in_size)
    pad = [(0, 0)] * img.ndim
    pad[axis] = (lo_pad, hi_pad)
    imgp = jnp.pad(img, pad, mode="edge") if (lo_pad or hi_pad) else img
    phases = []
    for r in range(p):
        start = int(base[r]) + lo_pad
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(start, start + q * g, q) if q * g > 1 else \
            slice(start, start + 1)
        phases.append(imgp[tuple(sl)])
    # interleave phases: stack on a new minor axis then merge
    st = jnp.stack(phases, axis=axis + 1)
    new_shape = list(img.shape)
    new_shape[axis] = out_size
    return st.reshape(new_shape)


_EASU_TAPS12 = ((-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1), (0, 2),
                (1, -1), (1, 0), (1, 1), (1, 2), (2, 0), (2, 1))


def _easu_phase(tap_img, tap_fld, base_dy, base_dx, fy, fx):
    """One constant-frac EASU output phase: identical math to the generic
    path's per-pixel evaluation, but the source frac (fy, fx) is a python
    SCALAR so the tap displacement terms fold into the weight polynomial at
    trace time.  `tap_img(dy, dx)` / `tap_fld(dy, dx)` fetch the tap image
    relative to the phase's base texel."""
    # direction field: quad corners at (base+0/1, base+0/1), scalar blend
    wf = (1 - fx) * (1 - fy)
    wg = fx * (1 - fy)
    wj = (1 - fx) * fy
    wk = fx * fy
    blend = (tap_fld(base_dy, base_dx) * wf
             + tap_fld(base_dy, base_dx + 1) * wg
             + tap_fld(base_dy + 1, base_dx) * wj
             + tap_fld(base_dy + 1, base_dx + 1) * wk)
    dirx, diry, length = blend[..., 0], blend[..., 1], blend[..., 2]
    dr2 = dirx * dirx + diry * diry
    has_dir = dr2 > 1e-8
    inv = jnp.where(has_dir, 1.0 / jnp.sqrt(jnp.maximum(dr2, 1e-8)), 0.0)
    dirx_n = jnp.where(has_dir, dirx * inv, 1.0)
    diry_n = diry * inv
    inv_along = 1.0 / (1.0 + length)

    acc = None
    wsum = None
    for dy, dx in _EASU_TAPS12:
        t = tap_img(base_dy + dy, base_dx + dx)
        vx = dx - fx
        vy = dy - fy
        along = vx * dirx_n + vy * diry_n
        across = -vx * diry_n + vy * dirx_n
        d2 = jnp.square(along * inv_along) + jnp.square(across)
        d2 = jnp.minimum(d2, 4.0)
        w = jnp.square(0.4 * d2 - 1.0) * (25.0 / 16.0) - (25.0 / 16.0 - 1.0)
        w = jnp.maximum(w, 0.0)[..., None]
        acc = t * w if acc is None else acc + t * w
        wsum = w if wsum is None else wsum + w
    out = acc / jnp.maximum(wsum, 1e-5)
    f_ = tap_img(base_dy, base_dx)
    g_ = tap_img(base_dy, base_dx + 1)
    j_ = tap_img(base_dy + 1, base_dx)
    k_ = tap_img(base_dy + 1, base_dx + 1)
    qmin = jnp.minimum(jnp.minimum(f_, g_), jnp.minimum(j_, k_))
    qmax = jnp.maximum(jnp.maximum(f_, g_), jnp.maximum(j_, k_))
    return jnp.clip(out, qmin, qmax)


def _easu_2x(img, fields):
    """EASU specialization for the exact-2× upscale (the 1/2 dynamic-
    resolution rung — the settled steady state): each of the 4 output
    phases has a CONSTANT source frac (±0.25/±0.75), so every tap is an
    edge-clamped shift at input res and the phase blend weights are
    scalars.  The generic path's per-tap phase interleaves cost ~12
    relayout copies of (1080,960,2,3) per frame (~1.1 ms device at 1080p
    out); here the interleave happens ONCE on the final phase images."""
    H, W = img.shape[:2]

    def shift(a, dy, dx):
        # taps reach base_d(-1) + tap(-1..2) = [-2, 2]
        pr = ((2, 2), (2, 2)) + ((0, 0),) * (a.ndim - 2)
        p = jnp.pad(a, pr, mode="edge")
        return p[2 + dy: 2 + dy + H, 2 + dx: 2 + dx + W]

    tap_img = lambda dy, dx: shift(img, dy, dx)
    tap_fld = lambda dy, dx: shift(fields, dy, dx)

    # out row 2k   -> src pos k - 0.25: base k-1, frac 0.75
    # out row 2k+1 -> src pos k + 0.25: base k,   frac 0.25
    rows_out = []
    for base_dy, fy in ((-1, 0.75), (0, 0.25)):
        p0 = _easu_phase(tap_img, tap_fld, base_dy, -1, fy, 0.75)
        p1 = _easu_phase(tap_img, tap_fld, base_dy, 0, fy, 0.25)
        rows_out.append(jnp.stack([p0, p1], axis=2).reshape(H, 2 * W, 3))
    return jnp.stack(rows_out, axis=1).reshape(2 * H, 2 * W, 3)


def easu(img, out_h: int, out_w: int, force_generic: bool = False):
    """Edge-adaptive spatial upsampling (FSR-1.0-EASU-class,
    ScalingFilter.h:124 role): per output pixel, a direction-adaptive
    elliptical negative-lobe kernel over the 12-tap window

            b c
          e f g h
          i j k l
            m n

    Direction and anisotropy come from luma gradients at the inner 2×2 quad
    (bilinearly blended at the sample point); the kernel is stretched along
    the detected edge and sharpened across it; the result is clamped to the
    inner-quad min/max (deringing).

    The corner gradient/length terms depend only on INPUT pixels, so they
    are computed once per input pixel (one pass incl. the 2 divides) and
    phase-tapped to output res — evaluating them per output pixel redid
    identical math ratio² times (measured 7.5 → ~5 ms post at the 1/2 rung)."""
    H, W = img.shape[:2]
    if H == out_h and W == out_w:
        return img

    if not force_generic and jax.default_backend() == "tpu" \
            and not (out_h == 2 * H and out_w == 2 * W):
        # non-2× rung-rational ratios run as ONE Pallas pass
        # (ops/easu_kernel): zero phase-interleave relayouts, col gather on
        # the MXU — 7.2 → 1.9 ms at the 2/3 rung (1080p out, v5e).  The
        # exact-2× rung keeps the XLA specialization below (equally fast,
        # already golden-covered).
        from ..ops.easu_kernel import easu_tpu
        out = easu_tpu(img, out_h, out_w)
        if out is not None:
            return out

    by, fy = _src_base(out_h, H)
    bx, fx = _src_base(out_w, W)
    fy = fy[:, None, None]
    fx = fx[None, :, None]

    # --- input-res corner fields (dirx, diry, feature length) ---
    lum = 0.5 * img[..., 1] + 0.25 * (img[..., 0] + img[..., 2])

    def shift(a, dy, dx):
        # edge-clamped neighbor fetch (pad + slice keeps the native tiling)
        p = jnp.pad(a, ((1, 1), (1, 1)), mode="edge")
        return p[1 + dy: 1 + dy + H, 1 + dx: 1 + dx + W]

    lA = shift(lum, 0, -1)
    lB = shift(lum, 0, 1)
    lD = shift(lum, -1, 0)
    lE = shift(lum, 1, 0)
    dx_ = lB - lA
    dy_ = lE - lD
    rng_x = jnp.abs(lA - lum) + jnp.abs(lB - lum)
    rng_y = jnp.abs(lD - lum) + jnp.abs(lE - lum)
    lenx = jnp.square(jnp.clip(jnp.abs(dx_) / jnp.maximum(rng_x, 1e-4), 0, 1))
    leny = jnp.square(jnp.clip(jnp.abs(dy_) / jnp.maximum(rng_y, 1e-4), 0, 1))
    fields = jnp.stack([dx_, dy_, lenx + leny], axis=-1)

    if out_h == 2 * H and out_w == 2 * W and not force_generic:
        return _easu_2x(img, fields)

    rows = {dy: _take_rational(img, out_h, 0, dy) for dy in (-1, 0, 1, 2)}

    def tap(dy, dx):
        return _take_rational(rows[dy], out_w, 1, dx)

    # 12 taps
    b_ = tap(-1, 0); c_ = tap(-1, 1)
    e_ = tap(0, -1); f_ = tap(0, 0); g_ = tap(0, 1); h_ = tap(0, 2)
    i_ = tap(1, -1); j_ = tap(1, 0); k_ = tap(1, 1); l_ = tap(1, 2)
    m_ = tap(2, 0); n_ = tap(2, 1)

    # per-quad-corner fields, bilinearly blended at (fx, fy)
    fx2, fy2 = fx[..., 0], fy[..., 0]
    wf = (1 - fx2) * (1 - fy2)
    wg = fx2 * (1 - fy2)
    wj = (1 - fx2) * fy2
    wk = fx2 * fy2

    frows = {dy: _take_rational(fields, out_h, 0, dy) for dy in (0, 1)}
    cf = _take_rational(frows[0], out_w, 1, 0)
    cg = _take_rational(frows[0], out_w, 1, 1)
    cj = _take_rational(frows[1], out_w, 1, 0)
    ck = _take_rational(frows[1], out_w, 1, 1)
    blend = (cf * wf[..., None] + cg * wg[..., None]
             + cj * wj[..., None] + ck * wk[..., None])
    dirx, diry, length = blend[..., 0], blend[..., 1], blend[..., 2]

    dr2 = dirx * dirx + diry * diry
    has_dir = dr2 > 1e-8
    inv = jnp.where(has_dir, 1.0 / jnp.sqrt(jnp.maximum(dr2, 1e-8)), 0.0)
    dirx_n = jnp.where(has_dir, dirx * inv, 1.0)
    diry_n = diry * inv

    # anisotropy: stretch along the edge, keep unit across it
    stretch = 1.0 + length * 1.0            # in [1, 3]
    inv_along = 1.0 / stretch

    acc = jnp.zeros((out_h, out_w, img.shape[-1]))
    wsum = jnp.zeros((out_h, out_w, 1))
    taps = [(-1, 0, b_), (-1, 1, c_), (0, -1, e_), (0, 0, f_), (0, 1, g_),
            (0, 2, h_), (1, -1, i_), (1, 0, j_), (1, 1, k_), (1, 2, l_),
            (2, 0, m_), (2, 1, n_)]
    for dy, dx, t in taps:
        vx = dx - fx2
        vy = dy - fy2
        # rotate into the edge frame: a = along edge, c = across
        along = vx * dirx_n + vy * diry_n
        across = -vx * diry_n + vy * dirx_n
        d2 = jnp.square(along * inv_along) + jnp.square(across)
        d2 = jnp.minimum(d2, 4.0)
        # negative-lobe polynomial window (lanczos2-like, FSR constant set)
        base_w = jnp.square(0.4 * d2 - 1.0) * (25.0 / 16.0) - (25.0 / 16.0 - 1.0)
        w = jnp.maximum(base_w, 0.0)[..., None]
        acc = acc + t * w
        wsum = wsum + w
    out = acc / jnp.maximum(wsum, 1e-5)

    # deringing: clamp to the inner quad's bbox
    qmin = jnp.minimum(jnp.minimum(f_, g_), jnp.minimum(j_, k_))
    qmax = jnp.maximum(jnp.maximum(f_, g_), jnp.maximum(j_, k_))
    return jnp.clip(out, qmin, qmax)


def _catmull_rom_1d(img, out_size: int, axis: int):
    in_size = img.shape[axis]
    pos = (jnp.arange(out_size) + 0.5) * in_size / out_size - 0.5
    i1 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_size - 1)
    f = pos - i1
    i0 = jnp.clip(i1 - 1, 0, in_size - 1)
    i2 = jnp.clip(i1 + 1, 0, in_size - 1)
    i3 = jnp.clip(i1 + 2, 0, in_size - 1)
    w0 = f * (-0.5 + f * (1.0 - 0.5 * f))
    w1 = 1.0 + f * f * (-2.5 + 1.5 * f)
    w2 = f * (0.5 + f * (2.0 - 1.5 * f))
    w3 = f * f * (-0.5 + 0.5 * f)

    def take(idx):
        return jnp.take(img, idx, axis=axis)

    sh = [1] * img.ndim
    sh[axis] = out_size

    def wr(w):
        return w.reshape(sh)

    return (take(i0) * wr(w0) + take(i1) * wr(w1)
            + take(i2) * wr(w2) + take(i3) * wr(w3))


def upscale(img, out_h: int, out_w: int, mode: str = "easu"):
    """Resample to the output resolution: "easu" (edge-adaptive,
    ScalingFilter.h:124 role) or "bicubic" (Catmull-Rom, BicubicFilter.h)."""
    if img.shape[0] == out_h and img.shape[1] == out_w:
        return img
    if mode == "easu":
        return easu(img, out_h, out_w)
    t = _catmull_rom_1d(img, out_h, 0)
    return _catmull_rom_1d(t, out_w, 1)


def sharpen(img, strength: float):
    """Contrast-adaptive sharpen (RCAS-style, SharpeningFilter.h:8)."""
    up = jnp.roll(img, -1, 0)
    dn = jnp.roll(img, 1, 0)
    lf = jnp.roll(img, -1, 1)
    rt = jnp.roll(img, 1, 1)
    mn = jnp.minimum(jnp.minimum(up, dn), jnp.minimum(lf, rt))
    mn = jnp.minimum(mn, img)
    mx = jnp.maximum(jnp.maximum(up, dn), jnp.maximum(lf, rt))
    mx = jnp.maximum(mx, img)
    amp = jnp.sqrt(jnp.clip(jnp.minimum(mn, 1.0 - mx) / jnp.maximum(mx, 1e-4), 0.0, 1.0))
    # unit-DC sharpen: center (1 + 4a) minus neighbors a — the gains cancel
    # exactly, so no normalization divide is needed
    a = amp * strength * 0.2
    return jnp.clip(img * (1.0 + 4.0 * a) - (up + dn + lf + rt) * a, 0.0, 1.0)


def draw_crosshair(img):
    h, w = img.shape[:2]
    cy, cx = h // 2, w // 2
    img = img.at[cy - 6: cy + 7, cx - 1: cx + 1].set(1.0)
    img = img.at[cy - 1: cy + 1, cx - 6: cx + 7].set(1.0)
    return img


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------

def compose_overlay(rgb, overlay_u8):
    """Alpha-composite the (H, W, 4) u8 UI overlay onto the display-space
    frame — the reference's UIBuffer overlay in the compose pass
    (Denoiser.cu:375-392).  Raster happens host-side on UI events
    (rtvb_tpu/ui); this per-frame blend is one fused elementwise op."""
    ov = overlay_u8.astype(jnp.float32) * (1.0 / 255.0)
    a = ov[..., 3:4]
    return rgb * (1.0 - a) + ov[..., :3] * a


def run(rgb_linear, state: PostState, pp: PostProcessingSettings,
        tm: ToneMappingSettings, dt, out_h: int, out_w: int,
        overlay_u8=None, highlight=None):
    """(H, W, 3) linear HDR → (out_h, out_w, 3) display sRGB in [0,1].
    PostProcessor::run / PostProcessingPipeline::Execute equivalent.
    overlay_u8: optional (out_h, out_w, 4) u8 UI overlay (RGBA).
    highlight: optional (H, W) float mask — picked-block edge pixels forced
    white in display space (the reference's UIBuffer write,
    closesthit.cu:155-157), applied post-tonemap at internal res so the
    upscaler carries it to the output."""
    if pp.auto_exposure:
        exp = auto_exposure(rgb_linear, state, pp, dt)
    else:
        exp = state.exposure
    x = rgb_linear
    if pp.bloom:
        x = bloom(x, pp)
    if pp.lens_flare:
        x = lens_flare(x, pp)
    if pp.vignette:
        x = vignette(x, pp)
    y = tone_map(x, tm, exp)
    if highlight is not None:
        hl = highlight[..., None]
        y = y * (1.0 - hl) + hl
    if pp.upscale != "none":
        y = upscale(y, out_h, out_w, pp.upscale)
    if pp.sharpen:
        y = sharpen(y, pp.sharpen_strength)
    if pp.crosshair:
        y = draw_crosshair(y)
    if overlay_u8 is not None:
        y = compose_overlay(y, overlay_u8)
    return y, PostState(exposure=exp)
