"""Authored PBR image textures: PNG files → device mip pyramid → per-tile
adaptive trilinear sampling (albedo + normal + roughness).

Role parity with renderer/assets/TextureManager.cu:222-240 (stb_image loads +
NVTT mip chains + CUDA texture objects) and data/assets/materials.yaml:10-13
(albedo/normal/roughness maps per material), sampled with ray-cone LOD like
closesthit.cu:195-200.  Authored sets drop into data/textures/ as
`<name>.png` (sRGB albedo) with optional `<name>_n.png` (tangent-space
normal) and `<name>_r.png` (roughness multiplier).

TPU formulation — no texture units, no fast gather; the reference's mip
chain maps to:

* a STACKED mip pyramid per texture (128² → 8², 5 levels, 248 rows padded
  to 256), all levels resident in VMEM as three bf16-PAIR packed f32
  planes: (r|g), (b|rough), (du|dv) — halving the gather passes exactly
  like ops/warp_kernel's pair channels;
* the sampling kernel picks ONE mip pair PER (8, 128) PIXEL TILE — the
  finest level any pixel in the tile wants (ray-cone LOD is smooth, so the
  per-tile min is almost always the per-pixel level).  The y-resolve is a
  fori_loop over that level's rows (16 iterations for a distant 16² tile,
  128 only up close) of lane shuffles with wrap-aware bilinear taps;
* a pure-XLA twin reproduces the EXACT kernel result (including the
  per-tile level choice, emulated with a block-min) for CPU tests/goldens.

The round-3 matmul sampler materialized a (N, T·S) 2-hot matrix through HBM
— 21.9 ms/frame at 32² albedo-only; this kernel keeps every intermediate in
VMEM/registers and scales to 128² with normal+roughness included.
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

S0 = 128                      # base mip resolution
LEVELS = 5                    # 128, 64, 32, 16, 8
MIP_SIZES = tuple(S0 >> l for l in range(LEVELS))        # (128,64,32,16,8)
MIP_OFFS = tuple(int(np.cumsum((0,) + MIP_SIZES)[l]) for l in range(LEVELS))
BLOCK_ROWS = 256              # per-texture rows (248 used, padded to 256)
MAX_TEXTURES = 16
TILE_R = 32                   # kernel pixel-tile rows (bigger tiles cut
                              # grid steps -> fewer atlas re-fetches; the
                              # per-tile texture/mip coherence that drives
                              # the skip logic holds at 32 rows too)
LANES = 128

_NORMAL_SCALE = 8.0           # du/dv decode scale: RG ±0.5 maps to ±8 in
                              # perturb_normal's gradient units (the
                              # procedural sample_normal_delta emits ~±10)


class TextureAtlas(NamedTuple):
    """Packed stacked-mip pyramid (see module docstring).

    planes: (3, T*BLOCK_ROWS, S0) f32 — bf16 pairs (r|g), (b|rough),
    (du|dv); mip level l of texture t occupies rows
    [t*BLOCK_ROWS + MIP_OFFS[l], ... + MIP_SIZES[l]), columns [0, S_l).
    """
    planes: jnp.ndarray


def atlas_count(atlas: TextureAtlas) -> int:
    return atlas.planes.shape[1] // BLOCK_ROWS


def _box_down(img: np.ndarray, size: int) -> np.ndarray:
    """Box-filter a square pow2 image down to (size, size, C)."""
    h = img.shape[0]
    assert img.shape[0] == img.shape[1], "authored textures must be square"
    assert h & (h - 1) == 0 and size & (size - 1) == 0, "pow2 sizes only"
    while h > size:
        img = 0.25 * (img[0::2, 0::2] + img[1::2, 0::2]
                      + img[0::2, 1::2] + img[1::2, 1::2])
        h //= 2
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
    name into the packed device pyramid.

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
    planes = np.zeros((3, t * BLOCK_ROWS, S0), np.float32)
    lvl = tex6
    for l in range(LEVELS):
        s = MIP_SIZES[l]
        if lvl.shape[1] != s:
            lvl = 0.25 * (lvl[:, 0::2, 0::2] + lvl[:, 1::2, 0::2]
                          + lvl[:, 0::2, 1::2] + lvl[:, 1::2, 1::2])
        for ti in range(t):
            r0 = ti * BLOCK_ROWS + MIP_OFFS[l]
            blk = lvl[ti]                                     # (s, s, 6)
            planes[0, r0:r0 + s, :s] = np.asarray(
                pack2(blk[..., 0], blk[..., 1]))
            planes[1, r0:r0 + s, :s] = np.asarray(
                pack2(blk[..., 2], blk[..., 5]))
            planes[2, r0:r0 + s, :s] = np.asarray(
                pack2(blk[..., 3], blk[..., 4]))
    return TextureAtlas(planes=jnp.asarray(planes)), tuple(kept)


# ---------------------------------------------------------------------------
# Shared sampling math
# ---------------------------------------------------------------------------

def _level_from_lod(lod):
    """Continuous mip level from the engine's ray-cone lod proxy: the
    footprint in texels is lod·S0; one level per footprint doubling."""
    f = jnp.maximum(jnp.asarray(lod, jnp.float32) * float(S0), 1.0)
    return jnp.clip(jnp.log2(f), 0.0, float(LEVELS - 1))


def _level_dims(li):
    """(size, row offset) of mip level li — closed forms, no table lookups
    (sizes are pow2: S_l = S0 >> l, off_l = BLOCK_ROWS - 2·S_l)."""
    s = jnp.int32(S0) >> li
    return s, jnp.int32(BLOCK_ROWS) - 2 * s


# ---------------------------------------------------------------------------
# Pallas kernel: per-tile adaptive-mip gather
# ---------------------------------------------------------------------------

def _make_kernel(t_count: int):
    def kernel(tid_ref, u_ref, v_ref, lvl_ref, planes_hbm, *rest):
        out_refs = rest[:6]
        scratch, sem = rest[6], rest[7]
        tid = tid_ref[:]
        u = u_ref[:]
        v = v_ref[:]
        lvl = lvl_ref[:]                      # continuous per-pixel level

        # the atlas stays in HBM and is DMA'd into the persistent VMEM
        # scratch ONCE, on the first grid step — a VMEM-blocked input would
        # be re-fetched every step (~3 ms/frame of pure copy at 1080p)
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _load_atlas():
            copy = pltpu.make_async_copy(planes_hbm, scratch, sem)
            copy.start()
            copy.wait()

        # whole-tile early out: outputs of untextured pixels are don't-care
        # (the caller masks on image_id >= 0), so a tile with no textured
        # pixel writes zeros and skips everything — the default-procedural
        # mode pays only for tiles the (textured) character actually covers
        for c in range(6):
            out_refs[c][:] = jnp.zeros(u.shape, jnp.float32)

        @pl.when(jnp.any(tid >= 0))
        def _tile_body():
            _sample_tile(t_count, tid, u, v, lvl, scratch, out_refs)

    return kernel


def _sample_tile(t_count, tid, u, v, lvl, planes_ref, out_refs):
        # per-tile level pair: the finest level any pixel wants
        l0t = jnp.min(lvl.astype(jnp.int32))  # scalar
        l0t = jnp.clip(l0t, 0, LEVELS - 2)
        # per-pixel blend between tile levels l0t and l0t+1 (clamped: pixels
        # wanting coarser than l0t+1 sample l0t+1 with weight 1)
        w1 = jnp.clip(lvl - l0t.astype(jnp.float32), 0.0, 1.0)

        zero = jnp.zeros(u.shape, jnp.float32)
        accs = [zero] * 12                    # 6 channels × 2 levels

        for step in range(2):                 # level l0t, then l0t+1
            li = jnp.clip(l0t + step, 0, LEVELS - 1)
            s, off = _level_dims(li)
            sf = s.astype(jnp.float32)
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

            taps = [zero] * 12   # (plane × [y0x0, y0x1, y1x0, y1x1]) packed
            for t in range(t_count):
                use_t = tid == t

                def row_body(k, tp, t=t):
                    row_i = t * BLOCK_ROWS + off + k
                    sel0 = use_t & (y0 == k)
                    sel1 = use_t & (y1 == k)
                    new = list(tp)
                    for p in range(3):
                        row = planes_ref[p, row_i, :]
                        rowb = jnp.broadcast_to(row, u.shape)
                        g0 = jnp.take_along_axis(rowb, x0, axis=-1)
                        g1 = jnp.take_along_axis(rowb, x1, axis=-1)
                        new[4 * p + 0] = jnp.where(sel0, g0, new[4 * p + 0])
                        new[4 * p + 1] = jnp.where(sel0, g1, new[4 * p + 1])
                        new[4 * p + 2] = jnp.where(sel1, g0, new[4 * p + 2])
                        new[4 * p + 3] = jnp.where(sel1, g1, new[4 * p + 3])
                    return new

                # lax.cond (NOT pl.when: values must flow out) skips the
                # whole row loop for textures no pixel in the tile uses —
                # most tiles pay for 1-2 textures, not all T
                taps = jax.lax.cond(
                    jnp.any(use_t),
                    lambda tp: jax.lax.fori_loop(0, s, row_body, tp),
                    lambda tp: tp, taps)

            # unpack pairs and bilinear-lerp each of the 6 channels
            for p in range(3):
                t00a, t00b = unpack2(taps[4 * p + 0])
                t01a, t01b = unpack2(taps[4 * p + 1])
                t10a, t10b = unpack2(taps[4 * p + 2])
                t11a, t11b = unpack2(taps[4 * p + 3])
                for h, (q00, q01, q10, q11) in enumerate(
                        ((t00a, t01a, t10a, t11a), (t00b, t01b, t10b, t11b))):
                    top = q00 * (1.0 - wx) + q01 * wx
                    bot = q10 * (1.0 - wx) + q11 * wx
                    accs[6 * step + 2 * p + h] = \
                        top * (1.0 - wy) + bot * wy

        for c in range(6):
            out_refs[c][:] = accs[c] * (1.0 - w1) + accs[6 + c] * w1


@functools.partial(jax.jit, static_argnames=("t_count",))
def _sample_tiles(tid, u, v, lvl, planes, t_count: int):
    H, W = tid.shape
    grid = (H // TILE_R, W // LANES)
    tile = pl.BlockSpec((TILE_R, LANES), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    outs = [jax.ShapeDtypeStruct((H, W), jnp.float32)] * 6
    return pl.pallas_call(
        _make_kernel(t_count),
        grid=grid,
        in_specs=[tile, tile, tile, tile,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[tile] * 6,
        out_shape=outs,
        scratch_shapes=[pltpu.VMEM(planes.shape, jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(tid, u, v, lvl, planes)


# ---------------------------------------------------------------------------
# XLA twin (CPU tests / goldens) — EXACT kernel semantics including the
# per-tile level choice (emulated with a block-min over (TILE_R, LANES))
# ---------------------------------------------------------------------------

def _tile_min_level(lvl):
    """Per-pixel map of each (TILE_R, LANES) tile's min integer level,
    computed over the KERNEL's padded tiling (pad value LEVELS-1 never
    drags a boundary tile's min down)."""
    H, W = lvl.shape
    Hp = H + (-H) % TILE_R
    Wp = W + (-W) % LANES
    lv = jnp.pad(lvl, ((0, Hp - H), (0, Wp - W)),
                 constant_values=float(LEVELS - 1))
    bl = lv.astype(jnp.int32).reshape(Hp // TILE_R, TILE_R,
                                      Wp // LANES, LANES)
    m = bl.min(axis=(1, 3), keepdims=True)
    return jnp.broadcast_to(m, bl.shape).reshape(Hp, Wp)[:H, :W]


def _sample_level_ref(planes, t_count, li, tid, u, v):
    """Bilinear-sample mip level li (per-pixel int) for 6 channels."""
    s, off = _level_dims(li)
    sf = s.astype(jnp.float32)
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
    base = tid * BLOCK_ROWS + off
    n_rows = planes.shape[1]

    def fetch(py, px):
        idx = (jnp.clip(base + py, 0, n_rows - 1) * S0 + px).reshape(-1)
        return [jnp.take(planes[p].reshape(-1), idx).reshape(u.shape)
                for p in range(3)]

    f00 = fetch(y0, x0)
    f01 = fetch(y0, x1)
    f10 = fetch(y1, x0)
    f11 = fetch(y1, x1)
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


def _sample_ref(planes, t_count, tid, u, v, lvl):
    l0t = jnp.clip(_tile_min_level(lvl), 0, LEVELS - 2)
    w1 = jnp.clip(lvl - l0t.astype(jnp.float32), 0.0, 1.0)
    c0 = _sample_level_ref(planes, t_count, l0t, tid, u, v)
    c1 = _sample_level_ref(planes, t_count, l0t + 1, tid, u, v)
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
        # is decided by REAL pixels only (matches _tile_min_level's twin);
        # pad tid with -1 so padding never charges texture 0's loop
        outs = _sample_tiles(prep(tid, jnp.int32, fill=-1), prep(u), prep(v),
                             prep(lvl, fill=float(LEVELS - 1)),
                             atlas.planes, t_count)
        if Hp > H or Wp > W:
            outs = [a[:H, :W] for a in outs]
    else:
        outs = _sample_ref(atlas.planes, t_count, tid, u, v, lvl)

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
