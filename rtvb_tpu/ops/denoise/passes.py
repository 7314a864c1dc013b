"""Denoiser passes: firefly filter, reprojection, temporal accumulation,
history fix/clamp, a-trous wavelet — all as whole-frame jnp ops.

Capability parity with renderer/denoising/ (RELAX-style single-channel
denoiser, pass order per Denoiser.cu:24-408 and
docs/denoiser-technical-deep-dive.md).  TPU shape: fixed-offset stencils are
`jnp.roll` chains (register shifts, no gathers); only history reprojection
needs real per-pixel gathers (bilinear, 4 taps).  Edge-stopping weights follow
the reference's geometry/normal/luminance-variance form (DenoiserCommon.h).
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import mathutil as m

BIG = 1e30


def _shift(img, dy: int, dx: int):
    """Shifted copy with edge clamp (static offsets → cheap on TPU).

    Implemented as one edge-pad + a static slice: XLA fuses the slices of a
    shared padded array into the consuming stencil (the roll + two scatter
    formulation forced ~3 full-frame copies per tap)."""
    if not dy and not dx:
        return img
    H, W = img.shape[0], img.shape[1]
    py, px = abs(dy), abs(dx)
    pad = [(py, py), (px, px)] + [(0, 0)] * (img.ndim - 2)
    padded = jnp.pad(img, pad, mode="edge")
    # roll(+dy) semantics: out[y] = img[y - dy] (edge-clamped)
    return padded[py - dy:py - dy + H, px - dx:px - dx + W]


# ---------------------------------------------------------------------------
# 0. Firefly / boiling filter (FireflyFilter.h: bilateral RCRS outlier clamp)
# ---------------------------------------------------------------------------

def firefly_filter(rgb, depth=None, normal=None,
                   depth_tol: float = 0.1, normal_tol: float = 0.5):
    """Bilateral rank-conditioned rank selection (FireflyFilter.h:9 role):
    a pixel brighter than every *surface-compatible* neighbor is clamped to
    that neighborhood max; darker than every compatible neighbor is lifted
    to the min (boiling suppression).  Compatibility = relative depth +
    normal agreement, so edges don't bleed.  Without guides it degrades to
    the unconditioned RCRS clamp."""
    lum = m.luminance(rgb[..., 0], rgb[..., 1], rgb[..., 2])
    nmax = jnp.full_like(lum, -BIG)
    nmin = jnp.full_like(lum, BIG)
    any_ok = jnp.zeros(lum.shape, bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nl = _shift(lum, dy, dx)
            if depth is not None:
                nd = _shift(depth, dy, dx)
                ok = jnp.abs(nd - depth) <= depth_tol * jnp.maximum(depth, 1.0)
                if normal is not None:
                    nn = _shift(normal, dy, dx)
                    ok = ok & ((nn * normal).sum(-1) > normal_tol)
            else:
                ok = jnp.ones(lum.shape, bool)
            any_ok = any_ok | ok
            nmax = jnp.maximum(nmax, jnp.where(ok, nl, -BIG))
            nmin = jnp.minimum(nmin, jnp.where(ok, nl, BIG))
    target = jnp.clip(lum, nmin, nmax)
    scale = jnp.where(any_ok & (lum > 1e-6), target / jnp.maximum(lum, 1e-6), 1.0)
    return rgb * scale[..., None]


# ---------------------------------------------------------------------------
# 3. Pre-pass (PrePass.h:6: Poisson-disk spatial pre-blur before temporal
#    accumulation — softens 1-spp shot noise so history rejection is less
#    trigger-happy on young pixels)
# ---------------------------------------------------------------------------

# 8-point Poisson-disk offsets (radius 3 px, precomputed blue-noise-ish set)
_POISSON_TAPS = ((-3, 0), (3, 1), (0, -3), (-1, 3),
                 (2, -2), (-2, -2), (2, 2), (-2, 3))


def pre_pass(illum, depth, normal, strength: float = 0.5):
    """Edge-stopping Poisson-disk blur mixed into the input at `strength`."""
    acc = illum
    wsum = jnp.ones(depth.shape)
    for dy, dx in _POISSON_TAPS:
        nd = _shift(depth, dy, dx)
        nn = _shift(normal, dy, dx)
        w = jnp.exp(-jnp.abs(nd - depth) / jnp.maximum(0.05 * depth, 0.1))
        w = w * jnp.maximum((nn * normal).sum(-1), 0.0)
        w = jnp.where((nd >= BIG) | (depth >= BIG), 0.0, w)
        acc = acc + _shift(illum, dy, dx) * w[..., None]
        wsum = wsum + w
    blurred = acc / wsum[..., None]
    return illum + (blurred - illum) * strength


# ---------------------------------------------------------------------------
# Reprojection (bilinear history sample at motion-vector offsets)
# ---------------------------------------------------------------------------

def bilinear_sample(img, u, v):
    """Sample img (H, W, C) at uv in [0,1]² (v up, matching camera uv).
    Returns (value, in_bounds)."""
    H, W = img.shape[:2]
    x = u * W - 0.5
    y = (1.0 - v) * H - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    inb = (x0 >= 0) & (x0 < W - 1) & (y0 >= 0) & (y0 < H - 1)
    x0c = jnp.clip(x0, 0, W - 2)
    y0c = jnp.clip(y0, 0, H - 2)
    flat = img.reshape(H * W, -1)
    idx00 = y0c * W + x0c
    v00 = jnp.take(flat, idx00, axis=0)
    v10 = jnp.take(flat, idx00 + 1, axis=0)
    v01 = jnp.take(flat, idx00 + W, axis=0)
    v11 = jnp.take(flat, idx00 + W + 1, axis=0)
    out = (v00 * (1 - fx) * (1 - fy) + v10 * fx * (1 - fy)
           + v01 * (1 - fx) * fy + v11 * fx * fy)
    return out.reshape(img.shape[:2] + (img.shape[-1],)), inb


# ---------------------------------------------------------------------------
# 4. Temporal accumulation (TemporalAccumulation.h:228-448)
# ---------------------------------------------------------------------------

def temporal_accumulate(illum, moments_in, motion_u, motion_v, depth, normal,
                        slow_hist, fast_hist, moments_hist, hist_len,
                        prev_depth, prev_normal, max_slow: int, max_fast: int,
                        disocclusion_threshold: float):
    """Dual (slow/fast) exponential history with reprojection + disocclusion.

    illum: (H, W, 3); normal: (H, W, 3); histories same; hist_len (H, W).
    Returns (slow, fast, moments, hist_len).
    """
    H, W = depth.shape
    u_cur = (jnp.arange(W) + 0.5)[None, :] / W
    v_cur = 1.0 - (jnp.arange(H) + 0.5)[:, None] / H
    # invalid-motion sentinels (2.0) would scatter lookups to the image edge;
    # reproject invalid pixels to themselves and reject them via valid_mv
    valid_mv = (jnp.abs(motion_u) < 1.5) & (jnp.abs(motion_v) < 1.5)
    u_prev = u_cur + jnp.where(valid_mv, motion_u, 0.0)
    v_prev = v_cur + jnp.where(valid_mv, motion_v, 0.0)

    # warped history fetch: Pallas windowed-gather kernel on TPU
    # (TemporalAccumulation.h:228-448 reprojection reads).  The radiance /
    # moments / normal / length payload rides as bf16 pairs — 7 kernel
    # channels instead of 13 for the same 13 planes (HalfPrecision.h role;
    # the kernel's shuffle cost is linear in channel count).  Depth stays
    # f32: it gates disocclusion.
    from ..pack import pack2, octa_encode, octa_decode
    from ..warp_kernel import dispatch_bilinear
    nu, nv = octa_encode((prev_normal[..., 0], prev_normal[..., 1],
                          prev_normal[..., 2]))
    prev_pack = jnp.stack([
        pack2(slow_hist[..., 0], slow_hist[..., 1]),
        pack2(slow_hist[..., 2], fast_hist[..., 0]),
        pack2(fast_hist[..., 1], fast_hist[..., 2]),
        pack2(moments_hist[..., 0], moments_hist[..., 1]),
        pack2(nu, nv),
        pack2(hist_len, hist_len),
        prev_depth,
    ])
    sx = u_prev * W - 0.5
    sy = (1.0 - v_prev) * H - 0.5
    sampled, inb = dispatch_bilinear(prev_pack, sy, sx, pair_channels=6)
    s_slow = jnp.stack([sampled[0], sampled[1], sampled[2]], -1)
    s_fast = jnp.stack([sampled[3], sampled[4], sampled[5]], -1)
    s_mom = jnp.stack([sampled[6], sampled[7]], -1)
    s_norm = jnp.stack(octa_decode(sampled[8], sampled[9]), -1)
    s_len = sampled[10]
    s_depth = sampled[12]

    # disocclusion: relative depth difference + normal agreement.  The
    # threshold is the *relative depth tolerance* directly (no hidden fudge
    # factors; default set in DenoisingSettings.disocclusion_threshold).
    depth_ok = jnp.abs(s_depth - depth) <= disocclusion_threshold * jnp.maximum(
        jnp.maximum(s_depth, depth), 1.0)
    ndot = (s_norm * normal).sum(-1)
    normal_ok = ndot > 0.5
    surf_ok = inb & valid_mv & depth_ok & normal_ok & (depth < BIG)

    new_len = jnp.where(surf_ok, jnp.minimum(s_len + 1.0, float(max_slow)), 1.0)
    a_slow = 1.0 / jnp.minimum(new_len, float(max_slow))
    a_fast = 1.0 / jnp.minimum(new_len, float(max_fast))

    slow = jnp.where(surf_ok[..., None], s_slow + (illum - s_slow) * a_slow[..., None], illum)
    fast = jnp.where(surf_ok[..., None], s_fast + (illum - s_fast) * a_fast[..., None], illum)
    mom = jnp.where(surf_ok[..., None], s_mom + (moments_in - s_mom) * a_slow[..., None], moments_in)
    return slow, fast, mom, new_len


# ---------------------------------------------------------------------------
# 5. History fix (HistoryFix.h: wide blur where history is short)
# ---------------------------------------------------------------------------

def history_fix(slow, depth, hist_len, stride: int = 4):
    wide = jnp.zeros_like(slow)
    wsum = jnp.zeros(slow.shape[:2])
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nd = _shift(depth, dy * stride, dx * stride)
            w = jnp.exp(-jnp.abs(nd - depth) / jnp.maximum(depth * 0.1, 0.3))
            wide = wide + _shift(slow, dy * stride, dx * stride) * w[..., None]
            wsum = wsum + w
    wide = wide / jnp.maximum(wsum, 1e-6)[..., None]
    low = hist_len < 4.0
    return jnp.where(low[..., None], wide, slow)


# ---------------------------------------------------------------------------
# 6. History clamping (HistoryClamping.h: clamp slow to fast color bbox)
# ---------------------------------------------------------------------------

def history_clamp(slow, fast, sigma: float = 1.5):
    mean = jnp.zeros_like(fast)
    mean2 = jnp.zeros_like(fast)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            f = _shift(fast, dy, dx)
            mean = mean + f
            mean2 = mean2 + f * f
    mean = mean / 9.0
    mean2 = mean2 / 9.0
    std = jnp.sqrt(jnp.maximum(mean2 - mean * mean, 0.0))
    return jnp.clip(slow, mean - sigma * std, mean + sigma * std)


# ---------------------------------------------------------------------------
# 7. A-trous wavelet filter (Atrous.h / AtrousSmem.h edge-stopping blur)
# ---------------------------------------------------------------------------

def atrous_pass(illum, var, depth, normal, roughness, step: int,
                phi_lum: float, phi_normal: float, phi_depth: float):
    """One edge-stopping à-trous iteration on (H, W, 3) illum + variance."""
    lum_c = m.luminance(illum[..., 0], illum[..., 1], illum[..., 2])
    # variance-scaled luminance sigma (DenoiserCommon.h weighting form)
    sigma_l = phi_lum * jnp.sqrt(jnp.maximum(var, 1e-8)) + 1e-3

    w0 = 0.375 * 0.375
    acc = illum * w0
    acc_v = var * (w0 * w0)   # variance accumulates with squared weights
    wsum = jnp.full(depth.shape, w0)
    w1d = {0: 0.375, 1: 0.25, 2: 0.0625}
    for dy in (-2, -1, 0, 1, 2):
        for dx in (-2, -1, 0, 1, 2):
            if dy == 0 and dx == 0:
                continue
            wk = w1d[abs(dy)] * w1d[abs(dx)]
            oy, ox = dy * step, dx * step
            n_illum = _shift(illum, oy, ox)
            n_var = _shift(var, oy, ox)
            n_depth = _shift(depth, oy, ox)
            n_norm = _shift(normal, oy, ox)
            n_lum = m.luminance(n_illum[..., 0], n_illum[..., 1], n_illum[..., 2])

            # merged-exp + squaring-pow weights — must match the Pallas
            # kernel op-for-op (ops/denoise/atrous_kernel.py)
            e_z = jnp.abs(n_depth - depth) \
                / (phi_depth * jnp.maximum(depth, 1.0) * max(abs(dy) + abs(dx), 1))
            ndot = jnp.maximum((n_norm * normal).sum(-1), 0.0)
            w_n = m.pow_weight(ndot, phi_normal)
            e_l = jnp.abs(n_lum - lum_c) / sigma_l
            w = wk * jnp.exp(-(e_z + e_l)) * w_n
            sky = (n_depth >= BIG) | (depth >= BIG)
            w = jnp.where(sky, 0.0, w)
            acc = acc + n_illum * w[..., None]
            acc_v = acc_v + n_var * (w * w)
            wsum = wsum + w
    inv = 1.0 / jnp.maximum(wsum, 1e-6)
    return acc * inv[..., None], acc_v * inv * inv
