"""Pallas TPU kernel: EASU upscale at the dynamic-resolution rungs.

The post pipeline's upscale (ScalingFilter.h:124 role — FSR-1.0 EASU) runs
at EVERY non-native rung, i.e. at the product's settled operating point.
The XLA formulation needs ~22 phase-interleave relayouts of output-res
images for rational ratios (measured ~6 ms of the 2/3-rung frame at 1080p
out on v5e) because each of the 12 taps is a rational-stride gather.

Kernel formulation — one pass, zero relayouts:

* the output is tiled (24, 384): both tile dims are divisible by every
  rung's upscale numerator p ∈ {2, 3, 4} (scales 1/2 → p:q = 2:1,
  2/3 → 3:2, 3/4 → 4:3), so the source-index pattern
  base[o] = floor((o+0.5)·q/p − 0.5) advances by a WHOLE number of input
  texels per tile — the window start is an affine function of the grid
  index and the in-tile index/frac patterns are grid-invariant;
* each grid step DMAs the (3, wrows, wcols) input window into VMEM
  scratch and computes the direction field in-register (5 clamped shifts
  of window luma — border values are never tapped);
* the per-lane column gather (the thing VPUs can't do) becomes ONE-HOT
  MATMULS on the MXU: taps share a single (wcols−3, 384) 0/1 selection
  matrix, the four dx offsets are static column slices of the window;
  row selection is the same trick with a (24, wrows) matrix per dy.
  Selection matrices ride as pallas inputs (Mosaic rejects closed-over
  vector constants); fracs are rebuilt from iota — exact at tile range;
* the EASU weight math (direction-stretched negative-lobe kernel +
  inner-quad dering clamp) is identical to render/postprocess._easu_phase.

The XLA twin is render/postprocess.easu(force_generic=True); the kernel
matches it to f32 frac noise (the twin computes source fracs in f32 at
output-index magnitude, the kernel's iota fracs are exact rationals).
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _tile_sizes(p: int, q: int):
    """Smallest (8, 128)-divisible output tile, divisible by p, whose
    input-window step (tile·q/p) is also (8, 128)-aligned — Mosaic needs
    both the output block AND the DMA slice offsets tile-aligned.
    2:1 → (16, 256) step (8, 128); 3:2 → (24, 384) step (16, 256);
    4:3 → (32, 512) step (24, 384)."""
    def smallest(unit, align):
        t = unit
        while (t * q // p) % align or (t * q) % p:
            t += unit
        return t
    return smallest(8 * p // math.gcd(8, p), 8), \
        smallest(128 * p // math.gcd(128, p), 128)

_TAPS12 = ((-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1), (0, 2),
           (1, -1), (1, 0), (1, 1), (1, 2), (2, 0), (2, 1))


def supported_ratio(out_size: int, in_size: int):
    """Return (p, q) when out:in reduces to a supported upscale ratio."""
    g = math.gcd(out_size, in_size)
    p, q = out_size // g, in_size // g
    if q < p and p in (2, 3, 4):
        return p, q
    return None


def _axis_pattern(tile: int, p: int, q: int):
    """Static per-index source pattern over one output tile.

    Returns (K, base_rel, b0): K = input texels advanced per tile
    (tile·q/p, exact), base_rel[r] = source base of in-tile output r
    relative to the tile's first base, b0 = base of output 0."""
    K = tile * q // p
    base = [((2 * r + 1) * q - p) // (2 * p) for r in range(tile)]
    b0 = base[0]
    return K, [b - b0 for b in base], b0


def _onehot(idx, n_src):
    """(n_src, len(idx)) one-hot selection: (src^T @ M)[:, i] = src[idx[i]]."""
    m = np.zeros((n_src, len(idx)), np.float32)
    m[np.asarray(idx), np.arange(len(idx))] = 1.0
    return m


def _clamp_shift(a, dy, dx):
    """Edge-clamped shift of a 2D register array (border values are only
    consumed where the window halo guarantees real data)."""
    if dy == -1:
        a = jnp.concatenate([a[1:], a[-1:]], axis=0)
    elif dy == 1:
        a = jnp.concatenate([a[:1], a[:-1]], axis=0)
    if dx == -1:
        a = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    elif dx == 1:
        a = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
    return a


def _frac_vec(n, p, q, axis_rows: bool):
    """Exact per-index source frac over one tile via integer iota math:
    frac[r] = ((2r+1)q − p)/(2p) − floor(·)."""
    shape = (n, 1) if axis_rows else (1, n)
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 0 if axis_rows else 1)
    num = (2 * i + 1) * q - p
    den = 2 * p
    fl = jnp.floor_divide(num, den)
    return (num - fl * den).astype(jnp.float32) * (1.0 / den)


def _make_kernel(p: int, q: int, wrows: int, wcols: int):
    wc2 = wcols - 3
    TILE_R, TILE_C = _tile_sizes(p, q)
    K = TILE_R * q // p
    KC = TILE_C * q // p

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def kernel(colsel_ref, rowsel_ref, img_hbm, *rest):
        out_refs = rest[:3]
        win, sem = rest[3], rest[4]
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            img_hbm.at[:, pl.ds(i * K, wrows), pl.ds(j * KC, wcols)],
            win, sem)
        cp.start()
        cp.wait()

        P = colsel_ref[:]                       # (wc2, TILE_C)
        S = {dy: rowsel_ref[dy + 1] for dy in (-1, 0, 1, 2)}
        fy = _frac_vec(TILE_R, p, q, True)
        fx = _frac_vec(TILE_C, p, q, False)

        r = win[0]
        g = win[1]
        b = win[2]
        lum = 0.5 * g + 0.25 * (r + b)

        # direction field on the window (interior exact; borders unused)
        lA = _clamp_shift(lum, 0, -1)
        lB = _clamp_shift(lum, 0, 1)
        lD = _clamp_shift(lum, -1, 0)
        lE = _clamp_shift(lum, 1, 0)
        dx_ = lB - lA
        dy_ = lE - lD
        rng_x = jnp.abs(lA - lum) + jnp.abs(lB - lum)
        rng_y = jnp.abs(lD - lum) + jnp.abs(lE - lum)
        lenx = jnp.square(jnp.clip(jnp.abs(dx_) / jnp.maximum(rng_x, 1e-4),
                                   0, 1))
        leny = jnp.square(jnp.clip(jnp.abs(dy_) / jnp.maximum(rng_y, 1e-4),
                                   0, 1))
        flds = (dx_, dy_, lenx + leny)

        # gather: cols first on the MXU (window rows are few), rows second
        def col_taps(plane, dxs):
            # all dx offsets are static slices against ONE selection matrix
            return {dx: dot(plane[:, dx + 1: dx + 1 + wc2], P) for dx in dxs}

        def tap_of(cols, dy, dx):
            return dot(S[dy], cols[dx])

        ct_img = [col_taps(c, (-1, 0, 1, 2)) for c in (r, g, b)]
        ct_fld = [col_taps(f, (0, 1)) for f in flds]

        # bilinear field blend at the sample point
        wf = (1 - fx) * (1 - fy)
        wg = fx * (1 - fy)
        wj = (1 - fx) * fy
        wk = fx * fy
        bl = [tap_of(c, 0, 0) * wf + tap_of(c, 0, 1) * wg
              + tap_of(c, 1, 0) * wj + tap_of(c, 1, 1) * wk
              for c in ct_fld]
        dirx, diry, length = bl
        dr2 = dirx * dirx + diry * diry
        has_dir = dr2 > 1e-8
        inv = jnp.where(has_dir, jax.lax.rsqrt(jnp.maximum(dr2, 1e-8)), 0.0)
        dirx_n = jnp.where(has_dir, dirx * inv, 1.0)
        diry_n = diry * inv
        inv_along = 1.0 / (1.0 + length)

        accs = [None, None, None]
        wsum = None
        quads = {0: [], 1: [], 2: []}
        for dy, dx in _TAPS12:
            vx = dx - fx
            vy = dy - fy
            along = vx * dirx_n + vy * diry_n
            across = -vx * diry_n + vy * dirx_n
            d2 = jnp.square(along * inv_along) + jnp.square(across)
            d2 = jnp.minimum(d2, 4.0)
            w = jnp.square(0.4 * d2 - 1.0) * (25.0 / 16.0) - (25.0 / 16.0 - 1.0)
            w = jnp.maximum(w, 0.0)
            wsum = w if wsum is None else wsum + w
            for c in range(3):
                t = tap_of(ct_img[c], dy, dx)
                if (dy, dx) in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    quads[c].append(t)
                accs[c] = t * w if accs[c] is None else accs[c] + t * w

        inv_w = 1.0 / jnp.maximum(wsum, 1e-5)
        for c in range(3):
            f_, g_, j_, k_ = quads[c]
            qmin = jnp.minimum(jnp.minimum(f_, g_), jnp.minimum(j_, k_))
            qmax = jnp.maximum(jnp.maximum(f_, g_), jnp.maximum(j_, k_))
            out_refs[c][:] = jnp.clip(accs[c] * inv_w, qmin, qmax)

    return kernel


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "p", "q"))
def _easu_call(planes, out_h: int, out_w: int, p: int, q: int):
    """planes: (3, H, W) f32 input → (out_h, out_w, 3) via the kernel."""
    H, W = planes.shape[1:]
    TILE_R, TILE_C = _tile_sizes(p, q)
    gh = -(-out_h // TILE_R)
    gw = -(-out_w // TILE_C)

    K, row_base, rb0 = _axis_pattern(TILE_R, p, q)
    KC, col_base, cb0 = _axis_pattern(TILE_C, p, q)
    wrows = row_base[-1] + 4                  # base span + tap reach (−1..2)
    wrows += (-wrows) % 8
    wcols = col_base[-1] + 4
    wcols += (-wcols) % 128
    wc2 = wcols - 3

    # pad so every window (rows i·K+rb0−1 …, cols j·KC+cb0−1 …) is in-bounds
    lo_r, lo_c = 1 - rb0, 1 - cb0
    hi_r = max(0, (gh - 1) * K + wrows - H - lo_r)
    hi_c = max(0, (gw - 1) * KC + wcols - W - lo_c)
    planes = jnp.pad(planes, ((0, 0), (lo_r, hi_r), (lo_c, hi_c)),
                     mode="edge")

    colsel = jnp.asarray(_onehot(col_base, wc2))               # (wc2, 384)
    rowsel = jnp.stack([jnp.asarray(_onehot([b + 1 + dy for b in row_base],
                                            wrows).T)          # (24, wrows)
                        for dy in (-1, 0, 1, 2)])

    full = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((TILE_R, TILE_C), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_kernel(p, q, wrows, wcols),
        grid=(gh, gw),
        in_specs=[full(colsel), full(rowsel),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[tile] * 3,
        out_shape=[jax.ShapeDtypeStruct((gh * TILE_R, gw * TILE_C),
                                        jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((3, wrows, wcols), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(colsel, rowsel, planes)
    return jnp.stack(outs, axis=-1)[:out_h, :out_w]


def easu_tpu(img, out_h: int, out_w: int):
    """EASU upscale (H, W, 3) → (out_h, out_w, 3) on the kernel path, or
    None when the ratio isn't a supported rung rational (caller falls back
    to the XLA path)."""
    H, W = img.shape[:2]
    rh = supported_ratio(out_h, H)
    rw = supported_ratio(out_w, W)
    if rh is None or rh != rw:
        return None
    p, q = rh
    planes = jnp.transpose(jnp.asarray(img, jnp.float32), (2, 0, 1))
    return _easu_call(planes, out_h, out_w, p, q)
