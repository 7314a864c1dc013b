"""Authored PBR image textures: PNG files → device mip pyramid → per-tile
adaptive trilinear sampling (albedo + normal + roughness).

Role parity with renderer/assets/TextureManager.cu:222-240 (stb_image loads +
NVTT mip chains + CUDA texture objects, up to 64 textures at 1024²) and
data/assets/materials.yaml:10-13 (albedo/normal/roughness maps per material),
sampled with ray-cone LOD like closesthit.cu:195-200.  Authored sets drop
into data/textures/ as `<name>.png` (sRGB albedo) with optional `<name>_n.png`
(tangent-space normal) and `<name>_r.png` (roughness multiplier).

TPU formulation — no texture units, no fast gather, ~16 MB of VMEM.  A
512²-base 7-level pyramid × 32 slots (≈200 MB packed) cannot sit in VMEM the
way the r4 128² atlas did, so the reference's mip chain maps to a
**two-tier demand-paged pyramid**:

* **Resident tail** — levels 3..6 (64² … 8²) of EVERY texture live in one
  VMEM scratch (3 bf16-pair planes × 32 tex × 128 rows × 128 lanes ≈ 6.3 MB),
  DMA'd from HBM once on the first grid step.  Distant/oblique tiles (the
  vast majority) sample only this tier — exactly the r4 kernel's cost.
* **Demand tier** — levels 0..2 (512², 256², 128²) stay in HBM; each pixel
  tile that wants a level < 3 DMAs JUST the (texture, level) block pair it
  needs into a 4.7 MB scratch, keyed by an SMEM (texture, level) cache so
  spatially coherent tiles reuse the block without re-copying.  Worst-case
  thrash (every tile a different texture at level 0) is ~128 tiles × 3.1 MB
  ≈ 0.5 ms of DMA at v5e HBM bandwidth — and overlaps compute.
* A tile spanning several textures at close range samples its FINEST-level
  texture from the demand tier and the others from the resident tail
  (mip-biased to 64²) — a seam-tile-only compromise; the alternative is a
  DMA per texture per tile.

The per-tile level-pair choice (finest level any pixel wants, per-pixel
blend weight clamped into [l0t, l0t+1]) is unchanged from r4, and a
pure-XLA twin reproduces the EXACT kernel result (including the per-tile
level and hi-texture choices, emulated with block-reductions) for CPU
tests/goldens.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pack import pack2, unpack2

S0 = 512                      # base mip resolution
LEVELS = 7                    # 512, 256, 128, 64, 32, 16, 8
MIP_SIZES = tuple(S0 >> l for l in range(LEVELS))
HI_LEVELS = 3                 # levels 0..2 live in the HBM demand tier
HI_SIZES = (512, 256, 128)
HI_OFFS = (0, 512, 768)       # row offsets inside a texture's hi block
HI_ROWS = 896                 # 512 + 256 + 128 (each a multiple of 128)
LO_SIZES = (64, 32, 16, 8)    # resident-tail levels 3..6
LO_OFFS = (0, 64, 96, 112)
LO_ROWS = 128                 # 120 used, padded to the sublane multiple
LO_COLS = 128
MAX_TEXTURES = 32
TILE_R = 32                   # kernel pixel-tile rows
LANES = 128
# demand-tier VMEM scratch layout (column-grouped, 128 lanes wide): region A
# holds level l0t (worst G·S = 4·512 rows), region B level l0t+1 (≤ 2·256)
HI_B_ROW = 2048
HI_SCRATCH_ROWS = 2048 + 512

_NORMAL_SCALE = 8.0           # du/dv decode scale: RG ±0.5 maps to ±8 in
                              # perturb_normal's gradient units (the
                              # procedural sample_normal_delta emits ~±10)


class TextureAtlas(NamedTuple):
    """Two-tier packed mip pyramid (see module docstring).

    lo: (3, T*LO_ROWS, LO_COLS) f32 — bf16 pairs (r|g), (b|rough), (du|dv);
        level 3+l of texture t occupies rows [t*LO_ROWS + LO_OFFS[l], ...
        + LO_SIZES[l]), columns [0, S_l).  VMEM-resident in the kernel.
    hi: (3, T*HI_ROWS, S0) f32 — same packing; level l∈{0,1,2} of texture t
        occupies rows [t*HI_ROWS + HI_OFFS[l], ... + HI_SIZES[l]), columns
        [0, S_l).  HBM-resident, demand-DMA'd per tile.
    """
    lo: jnp.ndarray
    hi: jnp.ndarray


def atlas_count(atlas: TextureAtlas) -> int:
    return atlas.lo.shape[1] // LO_ROWS


def _box_down(img: np.ndarray, size: int) -> np.ndarray:
    """Box-filter a square pow2 image to (size, size, C) — upsampling
    smaller sources by nearest replication (their finest mips simply repeat
    the native data, the standard under-resolved-source behavior)."""
    h = img.shape[0]
    assert img.shape[0] == img.shape[1], "authored textures must be square"
    assert h & (h - 1) == 0 and size & (size - 1) == 0, "pow2 sizes only"
    while h > size:
        img = 0.25 * (img[0::2, 0::2] + img[1::2, 0::2]
                      + img[0::2, 1::2] + img[1::2, 1::2])
        h //= 2
    if h < size:
        img = np.repeat(np.repeat(img, size // h, 0), size // h, 1)
    return img.astype(np.float32)


def _read_optional(path: str):
    from ..utils.image import read_png
    if not os.path.exists(path):
        return None
    img = read_png(path).astype(np.float32) / 255.0
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    return img[..., :3]


def load_atlas(tex_dir: str, names: list[str]):
    """Read `<tex_dir>/<name>.png` (+ optional `_n`/`_r` planes) for each
    name into the packed two-tier device pyramid.

    Returns (TextureAtlas, kept_names) or (None, ()) when nothing loads.
    Albedo is sRGB-decoded; normal maps are standard RG-encoded tangent
    normals (0.5 = flat) converted to (du, dv) height-gradient deltas for
    textures.perturb_normal; roughness maps multiply the material value
    (flat 1.0 when absent)."""
    if not names or not os.path.isdir(tex_dir):
        return None, ()
    blocks = []
    kept = []
    for name in names[:MAX_TEXTURES]:
        alb = _read_optional(os.path.join(tex_dir, f"{name}.png"))
        if alb is None:
            continue
        alb = _box_down(alb ** 2.2, S0)                       # sRGB → linear
        nrm = _read_optional(os.path.join(tex_dir, f"{name}_n.png"))
        if nrm is None:
            duv = np.zeros((S0, S0, 2), np.float32)
        else:
            nrm = _box_down(nrm, S0)
            duv = (nrm[..., :2] * 2.0 - 1.0) * _NORMAL_SCALE  # RG → (du, dv)
        rgh = _read_optional(os.path.join(tex_dir, f"{name}_r.png"))
        rgh = np.ones((S0, S0, 1), np.float32) if rgh is None \
            else _box_down(rgh, S0)[..., :1]
        blocks.append(np.concatenate([alb, duv, rgh], axis=-1))  # (S0,S0,6)
        kept.append(name)
    if not blocks:
        return None, ()

    t = len(blocks)
    tex6 = np.stack(blocks)                                   # (T,S0,S0,6)
    hi = np.zeros((3, t * HI_ROWS, S0), np.float32)
    lo = np.zeros((3, t * LO_ROWS, LO_COLS), np.float32)
    lvl = tex6
    for l in range(LEVELS):
        s = MIP_SIZES[l]
        if lvl.shape[1] != s:
            lvl = 0.25 * (lvl[:, 0::2, 0::2] + lvl[:, 1::2, 0::2]
                          + lvl[:, 0::2, 1::2] + lvl[:, 1::2, 1::2])
        for ti in range(t):
            blk = lvl[ti]                                     # (s, s, 6)
            pr = np.asarray(pack2(blk[..., 0], blk[..., 1]))
            pb = np.asarray(pack2(blk[..., 2], blk[..., 5]))
            pd = np.asarray(pack2(blk[..., 3], blk[..., 4]))
            if l < HI_LEVELS:
                r0 = ti * HI_ROWS + HI_OFFS[l]
                hi[0, r0:r0 + s, :s] = pr
                hi[1, r0:r0 + s, :s] = pb
                hi[2, r0:r0 + s, :s] = pd
            else:
                r0 = ti * LO_ROWS + LO_OFFS[l - HI_LEVELS]
                lo[0, r0:r0 + s, :s] = pr
                lo[1, r0:r0 + s, :s] = pb
                lo[2, r0:r0 + s, :s] = pd
    return TextureAtlas(lo=jnp.asarray(lo), hi=jnp.asarray(hi)), tuple(kept)


# ---------------------------------------------------------------------------
# Shared sampling math
# ---------------------------------------------------------------------------

def _level_from_lod(lod):
    """Continuous mip level from the engine's ray-cone lod proxy: the
    footprint in texels is lod·S0; one level per footprint doubling."""
    f = jnp.maximum(jnp.asarray(lod, jnp.float32) * float(S0), 1.0)
    return jnp.clip(jnp.log2(f), 0.0, float(LEVELS - 1))


def _bilinear_coords(u, v, s):
    """Wrap-tiled bilinear tap coordinates + weights at a level of size s."""
    sf = s.astype(jnp.float32) if hasattr(s, "astype") else float(s)
    x = u * sf - 0.5
    y = v * sf - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = jnp.mod(x0f.astype(jnp.int32), s)
    y0 = jnp.mod(y0f.astype(jnp.int32), s)
    x1 = jnp.mod(x0 + 1, s)
    y1 = jnp.mod(y0 + 1, s)
    return x0, y0, x1, y1, wx, wy


def _lerp_taps(taps, wx, wy, accs, base):
    """Unpack pair taps and bilinear-lerp into 6 channels at accs[base:]."""
    for p in range(3):
        t00a, t00b = unpack2(taps[4 * p + 0])
        t01a, t01b = unpack2(taps[4 * p + 1])
        t10a, t10b = unpack2(taps[4 * p + 2])
        t11a, t11b = unpack2(taps[4 * p + 3])
        for h, (q00, q01, q10, q11) in enumerate(
                ((t00a, t01a, t10a, t11a), (t00b, t01b, t10b, t11b))):
            top = q00 * (1.0 - wx) + q01 * wx
            bot = q10 * (1.0 - wx) + q11 * wx
            accs[base + 2 * p + h] = top * (1.0 - wy) + bot * wy
    return accs


# ---------------------------------------------------------------------------
# Pallas kernel: per-tile adaptive-mip gather, two-tier demand paging
# ---------------------------------------------------------------------------

def _lo_level_dims(li):
    """(size, row offset) of resident-tail level li≥3 — closed forms
    (S_l = 64 >> (li-3), off = LO_ROWS - 8 - 2·S_l)."""
    s = jnp.int32(64) >> (li - HI_LEVELS)
    return s, jnp.int32(LO_ROWS - 8) - 2 * s


# per-tile prefetch-scalar slots (computed by _tile_scalars in XLA):
TS_L0T = 0        # tile level pair base (clipped)
TS_THI = 1        # demand-tier texture id (MAX_TEXTURES = none)
TS_K0LO, TS_K0HI = 2, 3    # row window of t_hi pixels at level l0t
TS_K1LO, TS_K1HI = 4, 5    # row window at level l0t+1
TS_ANY = 6        # any textured pixel in the tile
TS_ALLHI = 7      # every textured pixel is the demand texture (skip tail)
TS_N = 8


def _make_kernel(t_count: int):
    def kernel(ts_ref, tid_ref, u_ref, v_ref, lvl_ref, lo_hbm, hi_hbm,
               *rest):
        out_refs = rest[:6]
        lo_s, hi_s, sem_lo, sem_ab, cache = rest[6:11]
        i = pl.program_id(0)
        j = pl.program_id(1)
        tid = tid_ref[:]
        u = u_ref[:]
        v = v_ref[:]
        lvl = lvl_ref[:]                      # continuous per-pixel level

        # resident tail: DMA'd HBM → VMEM ONCE, on the first grid step
        @pl.when((i == 0) & (j == 0))
        def _load_tail():
            copy = pltpu.make_async_copy(lo_hbm, lo_s, sem_lo)
            copy.start()
            copy.wait()
            cache[0] = -1                     # demand-tier cache: empty
            cache[1] = -1

        # whole-tile early out: outputs of untextured pixels are don't-care
        # (the caller masks on image_id >= 0), so a tile with no textured
        # pixel writes zeros and skips everything
        for c in range(6):
            out_refs[c][:] = jnp.zeros(u.shape, jnp.float32)

        @pl.when(ts_ref[i, j, TS_ANY] != 0)
        def _tile_body():
            _sample_tile(t_count, ts_ref, i, j, tid, u, v, lvl, lo_s, hi_s,
                         hi_hbm, sem_ab, cache, out_refs)

    return kernel


def _lo_pass(t_count, tid, u, v, la, lo_ref):
    """Sample the resident tail at level pair (la, la+1), la ≥ 3, for every
    texture, returning 12 channel accumulators (6 × 2 levels).  The
    per-texture fori_loop over the level's rows is the r4 kernel's proven
    gather pattern."""
    zero = jnp.zeros(u.shape, jnp.float32)
    accs = [zero] * 12
    for step in range(2):
        li = jnp.clip(la + step, HI_LEVELS, LEVELS - 1)
        s, off = _lo_level_dims(li)
        x0, y0, x1, y1, wx, wy = _bilinear_coords(u, v, s)
        taps = [zero] * 12
        for t in range(t_count):
            use_t = tid == t

            def row_body(k, tp, t=t):
                row_i = t * LO_ROWS + off + k
                sel0 = use_t & (y0 == k)
                sel1 = use_t & (y1 == k)
                new = list(tp)
                for p in range(3):
                    row = lo_ref[p, row_i, :]
                    rowb = jnp.broadcast_to(row, u.shape)
                    g0 = jnp.take_along_axis(rowb, x0, axis=-1)
                    g1 = jnp.take_along_axis(rowb, x1, axis=-1)
                    new[4 * p + 0] = jnp.where(sel0, g0, new[4 * p + 0])
                    new[4 * p + 1] = jnp.where(sel0, g1, new[4 * p + 1])
                    new[4 * p + 2] = jnp.where(sel1, g0, new[4 * p + 2])
                    new[4 * p + 3] = jnp.where(sel1, g1, new[4 * p + 3])
                return new

            # lax.cond (NOT pl.when: values must flow out) skips the whole
            # row loop for textures no pixel in the tile uses
            taps = jax.lax.cond(
                jnp.any(use_t),
                lambda tp: jax.lax.fori_loop(0, s, row_body, tp),
                lambda tp: tp, taps)
        accs = _lerp_taps(taps, wx, wy, accs, 6 * step)
    return accs


def _hi_fetch6(use_t, u, v, S, row0, src_ref, k_lo, k_hi):
    """6 bilinear-filtered channels from one demand-tier level block stored
    COLUMN-GROUPED at src_ref rows [row0, row0+G·S): group g of the level's
    columns (lanes g·128 … g·128+127) occupies rows [row0+g·S, +S).  S is
    STATIC per lax.switch branch, so every vector load is a full 128-lane
    row — the r4 kernel's proven gather pattern (lane-offset vector loads
    from a 512-wide scratch are a Mosaic INTERNAL error).

    x = g·128 + xl: one lane shuffle per group + a select.  The row
    fori_loop runs only the [k_lo, k_hi] window (prefetch scalars) the
    tile's hi pixels actually touch — tile-coherent and small except when
    the uv wrap straddles the tile."""
    shape = u.shape
    zero = jnp.zeros(shape, jnp.float32)
    x0, y0, x1, y1, wx, wy = _bilinear_coords(u, v, S)
    G = max(S // LANES, 1)
    if G > 1:
        xg0, xl0 = x0 // LANES, x0 % LANES
        xg1, xl1 = x1 // LANES, x1 % LANES
    else:
        xg0 = xg1 = None
        xl0, xl1 = x0, x1

    def row_body(k, tp):
        sel0 = use_t & (y0 == k)
        sel1 = use_t & (y1 == k)
        new = list(tp)
        for p in range(3):
            g0 = zero
            g1 = zero
            for g in range(G):
                row = src_ref[p, row0 + g * S + k, :]
                rowb = jnp.broadcast_to(row, shape)
                v0 = jnp.take_along_axis(rowb, xl0, axis=-1)
                v1 = jnp.take_along_axis(rowb, xl1, axis=-1)
                if G > 1:
                    g0 = jnp.where(xg0 == g, v0, g0)
                    g1 = jnp.where(xg1 == g, v1, g1)
                else:
                    g0, g1 = v0, v1
            new[4 * p + 0] = jnp.where(sel0, g0, new[4 * p + 0])
            new[4 * p + 1] = jnp.where(sel0, g1, new[4 * p + 1])
            new[4 * p + 2] = jnp.where(sel1, g0, new[4 * p + 2])
            new[4 * p + 3] = jnp.where(sel1, g1, new[4 * p + 3])
        return new

    taps = jax.lax.fori_loop(k_lo, k_hi + 1, row_body, [zero] * 12)
    return _lerp_taps(taps, wx, wy, [zero] * 6, 0)


def _sample_tile(t_count, ts, i, j, tid, u, v, lvl, lo_ref, hi_ref,
                 hi_hbm, sem, cache, out_refs):
    l0t = ts[i, j, TS_L0T]                # SMEM per-tile scalars
    t_hi = ts[i, j, TS_THI]
    hi_valid = (l0t < HI_LEVELS) & (t_hi < t_count)

    # ---- resident-tail pass: level pair clamped to (max(l0t,3), +1).
    # Skipped outright when every textured pixel is the demand texture
    # (the common single-texture close-up tile): its values would be fully
    # overwritten by the hi pass
    la_lo = jnp.maximum(l0t, jnp.int32(HI_LEVELS))
    w_lo = jnp.clip(lvl - la_lo.astype(jnp.float32), 0.0, 1.0)
    need_tail = ~(hi_valid & (ts[i, j, TS_ALLHI] != 0))
    accs = jax.lax.cond(
        need_tail,
        lambda: _lo_pass(t_count, tid, u, v, la_lo, lo_ref),
        lambda: [jnp.zeros(u.shape, jnp.float32)] * 12)
    res = [accs[c] * (1.0 - w_lo) + accs[6 + c] * w_lo for c in range(6)]

    # ---- demand-tier pass for t_hi pixels (levels l0t, l0t+1) ----
    @pl.when(hi_valid)
    def _hi_pass():
        # block-pair DMA, keyed by the (texture, level) SMEM cache so
        # spatially coherent tiles reuse the copy
        @pl.when((cache[0] != t_hi) | (cache[1] != l0t))
        def _dma():
            # column-grouped copies: group g's lanes land at scratch rows
            # [base + g·S, +S) so the sampler only ever loads full 128-lane
            # rows.  All groups start, then all wait — one semaphore.
            def _block(level, base):
                s = HI_SIZES[level]
                G = max(s // LANES, 1)
                src_r = pl.ds(t_hi * HI_ROWS + HI_OFFS[level], s)
                cps = []
                for g in range(G):
                    cps.append(pltpu.make_async_copy(
                        hi_hbm.at[:, src_r, g * LANES:(g + 1) * LANES],
                        hi_ref.at[:, base + g * s:base + (g + 1) * s, :],
                        sem))
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()

            for la in range(HI_LEVELS):              # level l0t → region A
                @pl.when(l0t == la)
                def _(la=la):
                    _block(la, 0)
            for lb in range(1, HI_LEVELS):           # level l0t+1 → region B
                @pl.when(l0t + 1 == lb)
                def _(lb=lb):
                    _block(lb, HI_B_ROW)
            cache[0] = t_hi
            cache[1] = l0t

        use_hi = tid == t_hi
        w1 = jnp.clip(lvl - l0t.astype(jnp.float32), 0.0, 1.0)
        k0lo = ts[i, j, TS_K0LO]
        k0hi = ts[i, j, TS_K0HI]
        k1lo = ts[i, j, TS_K1LO]
        k1hi = ts[i, j, TS_K1HI]

        # step 0: level l0t ∈ {0, 1, 2} — switch gives each branch a
        # STATIC block size (group-count/loop structure specialize)
        step0 = jax.lax.switch(
            jnp.clip(l0t, 0, HI_LEVELS - 1),
            [lambda la=la: _hi_fetch6(use_hi, u, v, HI_SIZES[la], 0,
                                      hi_ref, k0lo, k0hi)
             for la in range(HI_LEVELS)])
        # step 1: level l0t+1 ∈ {1, 2, 3} — 3 reads region B; the tier
        # boundary (l0t+1 == 3) reads t_hi's resident-tail level instead
        def _step1_hi(lb):
            return _hi_fetch6(use_hi, u, v, HI_SIZES[lb], HI_B_ROW,
                              hi_ref, k1lo, k1hi)

        def _step1_lo():
            off = jnp.int32(LO_OFFS[0])
            return _hi_fetch6(use_hi, u, v, LO_SIZES[0],
                              t_hi * LO_ROWS + off, lo_ref, k1lo, k1hi)

        step1 = jax.lax.switch(
            jnp.clip(l0t, 0, HI_LEVELS - 1),
            [lambda: _step1_hi(1), lambda: _step1_hi(2), _step1_lo])

        for c in range(6):
            hi_v = step0[c] * (1.0 - w1) + step1[c] * w1
            out_refs[c][:] = jnp.where(use_hi, hi_v, res[c])

    @pl.when(~hi_valid)
    def _lo_only():
        for c in range(6):
            out_refs[c][:] = res[c]


def _tile_scalars(tid, u, v, lvl, t_count: int):
    """XLA pre-pass: the per-tile scalars the kernel prefetches — tile
    level, demand-tier texture id, and the two row windows.  Runs as a few
    fused elementwise ops + two block reductions per frame."""
    H, W = tid.shape
    Ht, Wt = H // TILE_R, W // LANES

    def block(x):
        return x.reshape(Ht, TILE_R, Wt, LANES)

    lvl_i = lvl.astype(jnp.int32)
    l0t = jnp.clip(block(lvl_i).min(axis=(1, 3)), 0, LEVELS - 2)   # (Ht, Wt)
    l0t_b = jnp.broadcast_to(l0t[:, None, :, None], block(lvl_i).shape)
    cand = jnp.where((block(lvl_i) == l0t_b) & (block(tid) >= 0),
                     block(tid), jnp.int32(MAX_TEXTURES))
    t_hi = cand.min(axis=(1, 3))
    any_t = (block(tid) >= 0).any(axis=(1, 3)).astype(jnp.int32)
    use_hi = (block(tid) == cand.min(axis=(1, 3), keepdims=True))

    windows = []
    for step in range(2):
        li = jnp.minimum(l0t + step, LEVELS - 1)
        s = (jnp.int32(S0) >> li)[:, None, :, None].astype(jnp.float32)
        y = block(v) * s - 0.5
        y0 = jnp.mod(jnp.floor(y).astype(jnp.int32), s.astype(jnp.int32))
        y1 = jnp.mod(y0 + 1, s.astype(jnp.int32))
        big = jnp.int32(S0)
        k_lo = jnp.where(use_hi, jnp.minimum(y0, y1), big).min(axis=(1, 3))
        k_hi = jnp.where(use_hi, jnp.maximum(y0, y1), -1).max(axis=(1, 3))
        windows += [jnp.minimum(k_lo, big - 1), k_hi]

    all_hi = ((block(tid) < 0) | use_hi).all(axis=(1, 3)).astype(jnp.int32)
    cols = [l0t, t_hi, windows[0], windows[1], windows[2], windows[3],
            any_t, all_hi]
    return jnp.stack(cols, axis=-1)          # (Ht, Wt, TS_N)


@functools.partial(jax.jit, static_argnames=("t_count",))
def _sample_tiles(tid, u, v, lvl, lo, hi, t_count: int):
    H, W = tid.shape
    grid = (H // TILE_R, W // LANES)
    ts = _tile_scalars(tid, u, v, lvl, t_count)
    tile = pl.BlockSpec((TILE_R, LANES), lambda i, j, ts_ref: (i, j),
                        memory_space=pltpu.VMEM)
    outs = [jax.ShapeDtypeStruct((H, W), jnp.float32)] * 6
    return pl.pallas_call(
        _make_kernel(t_count),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[tile, tile, tile, tile,
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[tile] * 6,
            scratch_shapes=[pltpu.VMEM(lo.shape, jnp.float32),
                            pltpu.VMEM((3, HI_SCRATCH_ROWS, LANES),
                                       jnp.float32),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA,
                            pltpu.SMEM((2,), jnp.int32)]),
        out_shape=outs,
    )(ts, tid, u, v, lvl, lo, hi)


# ---------------------------------------------------------------------------
# XLA twin (CPU tests / goldens) — EXACT kernel semantics including the
# per-tile level + demand-texture choices (emulated with block reductions)
# ---------------------------------------------------------------------------

def _tile_reduce(x, fn, pad_val):
    """Per-pixel map of a per-(TILE_R, LANES)-tile reduction of x, over the
    KERNEL's padded tiling."""
    H, W = x.shape
    Hp = H + (-H) % TILE_R
    Wp = W + (-W) % LANES
    xp = jnp.pad(x, ((0, Hp - H), (0, Wp - W)), constant_values=pad_val)
    bl = xp.reshape(Hp // TILE_R, TILE_R, Wp // LANES, LANES)
    m = fn(bl, axis=(1, 3), keepdims=True)
    return jnp.broadcast_to(m, bl.shape).reshape(Hp, Wp)[:H, :W]


def _fetch_level(atlas: TextureAtlas, li, tid, py, px, shape):
    """Gather the 3 packed planes at integer level li (per-pixel) from the
    right tier.  li, py, px are per-pixel arrays."""
    is_hi = li < HI_LEVELS
    # hi-tier flat address
    hi_off = jnp.where(li == 0, HI_OFFS[0],
                       jnp.where(li == 1, HI_OFFS[1], HI_OFFS[2]))
    hi_rows = atlas.hi.shape[1]
    hi_idx = (jnp.clip(tid * HI_ROWS + hi_off + py, 0, hi_rows - 1) * S0
              + px)
    # lo-tier flat address
    s_lo, off_lo = _lo_level_dims(jnp.maximum(li, HI_LEVELS))
    lo_rows = atlas.lo.shape[1]
    lo_idx = (jnp.clip(tid * LO_ROWS + off_lo + py, 0, lo_rows - 1)
              * LO_COLS + px)
    out = []
    for p in range(3):
        h = jnp.take(atlas.hi[p].reshape(-1), hi_idx.reshape(-1)).reshape(shape)
        l = jnp.take(atlas.lo[p].reshape(-1), lo_idx.reshape(-1)).reshape(shape)
        out.append(jnp.where(is_hi, h, l))
    return out


def _sample_level_ref(atlas: TextureAtlas, li, tid, u, v):
    """Bilinear-sample mip level li (per-pixel int) for 6 channels."""
    s = jnp.int32(S0) >> li
    x0, y0, x1, y1, wx, wy = _bilinear_coords(u, v, s)
    f00 = _fetch_level(atlas, li, tid, y0, x0, u.shape)
    f01 = _fetch_level(atlas, li, tid, y0, x1, u.shape)
    f10 = _fetch_level(atlas, li, tid, y1, x0, u.shape)
    f11 = _fetch_level(atlas, li, tid, y1, x1, u.shape)
    out = []
    for p in range(3):
        a00 = unpack2(f00[p])
        a01 = unpack2(f01[p])
        a10 = unpack2(f10[p])
        a11 = unpack2(f11[p])
        for h in range(2):
            top = a00[h] * (1.0 - wx) + a01[h] * wx
            bot = a10[h] * (1.0 - wx) + a11[h] * wx
            out.append(top * (1.0 - wy) + bot * wy)
    return out


def _sample_ref(atlas: TextureAtlas, t_count, tid, u, v, lvl):
    lvl_i = lvl.astype(jnp.int32)
    l0t = jnp.clip(_tile_reduce(lvl_i, jnp.min, LEVELS - 1), 0, LEVELS - 2)
    # the tile's demand-tier texture (kernel: min textured id at the tile
    # level; MAX_TEXTURES = none)
    cand = jnp.where((lvl_i == l0t) & (tid >= 0), tid,
                     jnp.int32(MAX_TEXTURES))
    t_hi = _tile_reduce(cand, jnp.min, MAX_TEXTURES)
    hi_valid = (l0t < HI_LEVELS) & (t_hi < t_count)
    # only the demand texture's pixels sample the demand pair; every other
    # textured pixel (seam textures, and whole tiles whose min level came
    # from an untextured pixel) clamps to the resident-tail pair — the
    # kernel's exact behavior
    main_hi = hi_valid & (tid == t_hi)
    la = jnp.where(main_hi, l0t, jnp.maximum(l0t, HI_LEVELS))
    w1 = jnp.clip(lvl - la.astype(jnp.float32), 0.0, 1.0)
    c0 = _sample_level_ref(atlas, la, tid, u, v)
    c1 = _sample_level_ref(atlas, jnp.minimum(la + 1, LEVELS - 1), tid, u, v)
    return [a * (1.0 - w1) + b * w1 for a, b in zip(c0, c1)]


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

class AuthoredSample(NamedTuple):
    rgb: tuple            # linear albedo (r, g, b)
    du: jnp.ndarray       # height-gradient deltas for perturb_normal
    dv: jnp.ndarray
    rough_mul: jnp.ndarray


def sample_atlas(atlas: TextureAtlas, image_id, u, v, lod=None,
                 backend: str | None = None) -> AuthoredSample:
    """Adaptive trilinear PBR sample.  Pixels with image_id < 0 return the
    neutral sample (albedo 1, flat normal, rough ×1) — callers keep their
    procedural/flat values there."""
    t_count = atlas_count(atlas)
    shape = u.shape
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    # keep -1 ids AS -1: the kernel's per-texture `tid == t` test then skips
    # every texture loop for tiles with no textured pixels (a clip to 0
    # would silently charge texture 0's loop to every untextured tile)
    tid = jnp.clip(jnp.asarray(image_id, jnp.int32), -1, t_count - 1)
    lvl = _level_from_lod(jnp.zeros(shape) if lod is None else lod)
    lvl = jnp.broadcast_to(lvl, shape)

    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        H, W = shape
        Hp = H + (-H) % TILE_R
        Wp = W + (-W) % LANES

        def prep(a, dtype=jnp.float32, fill=0.0):
            a = jnp.asarray(a, dtype)
            if Hp > H or Wp > W:
                a = jnp.pad(a, ((0, Hp - H), (0, Wp - W)),
                            constant_values=fill)
            return a

        # pad level with the coarsest value so boundary tiles' min level
        # is decided by REAL pixels only (matches the twin's padding);
        # pad tid with -1 so padding never charges a texture loop
        outs = _sample_tiles(prep(tid, jnp.int32, fill=-1), prep(u), prep(v),
                             prep(lvl, fill=float(LEVELS - 1)),
                             atlas.lo, atlas.hi, t_count)
        if Hp > H or Wp > W:
            outs = [a[:H, :W] for a in outs]
    else:
        outs = _sample_ref(atlas, t_count, tid, u, v, lvl)

    r, g, b, rough, du, dv = outs
    use = jnp.asarray(image_id) >= 0
    one = jnp.ones(shape, jnp.float32)
    zero = jnp.zeros(shape, jnp.float32)
    return AuthoredSample(
        rgb=(jnp.where(use, r, one), jnp.where(use, g, one),
             jnp.where(use, b, one)),
        du=jnp.where(use, du, zero),
        dv=jnp.where(use, dv, zero),
        rough_mul=jnp.where(use, rough, one))
