"""Pallas TPU kernel: per-pixel warped history gather (reprojection).

The denoiser's temporal accumulation and ReSTIR's temporal reuse both need
`out[p] = history[warp(p)]` with per-pixel warped coordinates — a 2-D
arbitrary gather, which XLA lowers to a serial ~150 ms/frame path on TPU
(measured: the round-1 temporal-accumulation pass cost 302 ms at 1080p).

TPU-native shape: the warp field is *locally coherent* (camera motion), so
each (8, 128) output tile reads from a small axis-aligned window of the
history.  Per grid step:

1. compute the tile's window origin = clamp(min of the tile's source coords),
2. DMA the (C, WIN_Y, WIN_X) window from HBM into VMEM scratch,
3. resolve the per-pixel gather inside the window with lane shuffles:
   a static loop over window rows (select by row match) × 128-lane chunks
   (select by chunk match) — no serial gather anywhere,
4. pixels whose source lands outside the window (violent parallax /
   disocclusion-scale motion) are flagged invalid — callers already treat
   invalid exactly like disocclusion, so the fallback is benign.

Replaces the reprojection reads of renderer/denoising/TemporalAccumulation.h
:228-448 and the prev-reservoir fetch of closesthit.cu:636-705.

A pure-XLA twin (`warp_nearest_ref` / `warp_bilinear_ref`) with unwindowed
gathers backs CPU tests: kernel-valid pixels must match it exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 8      # output rows per grid step
TILE_C = 128    # output lanes per grid step
WIN_Y = 16      # history rows DMA'd per tile (spread budget 14 rows)
WIN_X = 256     # history lanes per tile (2 chunks, spread budget 126)


def _window_origin(y0, x0, H, W):
    # HBM slices must be tile-aligned (sublane 8 / lane 128): round the
    # origin down, then clamp so the window stays inside the image
    ry0 = jnp.clip(jnp.min(y0) & ~7, 0, max(H - WIN_Y, 0))
    rx0 = jnp.clip(jnp.min(x0) & ~127, 0, max(W - WIN_X, 0))
    # H/W are multiples of the tiles, so the clamps preserve alignment;
    # tell Mosaic (it can't prove divisibility through min/and/clip)
    return pl.multiple_of(ry0, 8), pl.multiple_of(rx0, 128)


def _chunk_gather(scratch_row, lo, hi, n_chunks, acc):
    """acc = scratch_row[lx] where lx = hi*128 + lo, via per-chunk shuffles."""
    for h in range(n_chunks):
        row = jnp.broadcast_to(scratch_row[h * 128:(h + 1) * 128], lo.shape)
        g = jnp.take_along_axis(row, lo, axis=-1)
        acc = jnp.where(hi == h, g, acc)
    return acc


def _make_kernel(C: int, H: int, W: int, bilinear: bool,
                 pair_channels: int = 0):
    """pair_channels: the first N input channels carry two bf16 values
    bit-packed in each f32 lane (ops/pack.pack2).  The bilinear kernel
    unpacks the four taps and lerps each half separately, emitting TWO
    f32 output channels per pair — half the shuffle passes for the same
    payload (HalfPrecision.h role)."""
    n_chunks = WIN_X // 128

    def kernel(sy_ref, sx_ref, hist_ref, out_ref, valid_ref, scratch, sem):
        sy = sy_ref[:]
        sx = sx_ref[:]
        if bilinear:
            y0f = jnp.floor(sy)
            x0f = jnp.floor(sx)
            fy = sy - y0f
            fx = sx - x0f
            y0 = y0f.astype(jnp.int32)
            x0 = x0f.astype(jnp.int32)
            inb = (y0 >= 0) & (y0 < H - 1) & (x0 >= 0) & (x0 < W - 1)
            span = 1
        else:
            y0 = jnp.floor(sy + 0.5).astype(jnp.int32)
            x0 = jnp.floor(sx + 0.5).astype(jnp.int32)
            inb = (y0 >= 0) & (y0 < H) & (x0 >= 0) & (x0 < W)
            span = 0

        ry0, rx0 = _window_origin(jnp.where(inb, y0, TILE_R * 10**6),
                                  jnp.where(inb, x0, TILE_C * 10**6), H, W)
        copy = pltpu.make_async_copy(
            hist_ref.at[:, pl.ds(ry0, WIN_Y), pl.ds(rx0, WIN_X)], scratch, sem)
        copy.start()
        copy.wait()

        ly = y0 - ry0
        lx = x0 - rx0
        vwin = ((ly >= 0) & (ly < WIN_Y - span)
                & (lx >= 0) & (lx < WIN_X - span))
        valid = inb & vwin
        lyc = jnp.clip(ly, 0, WIN_Y - 1 - span)
        lxc = jnp.clip(lx, 0, WIN_X - 1 - span)
        hi0 = lxc >> 7
        lo0 = lxc & 127
        if bilinear:
            lxp = lxc + 1
            hi1 = lxp >> 7
            lo1 = lxp & 127

        zero = jnp.zeros(sy.shape, jnp.float32)
        out_c = 0
        for c in range(C):
            if bilinear:
                a00 = a01 = a10 = a11 = zero
                for k in range(WIN_Y):
                    srow = scratch[c, k, :]
                    g0 = _chunk_gather(srow, lo0, hi0, n_chunks, zero)
                    g1 = _chunk_gather(srow, lo1, hi1, n_chunks, zero)
                    sel0 = lyc == k
                    a00 = jnp.where(sel0, g0, a00)
                    a01 = jnp.where(sel0, g1, a01)
                    if k > 0:
                        sel1 = lyc == (k - 1)
                        a10 = jnp.where(sel1, g0, a10)
                        a11 = jnp.where(sel1, g1, a11)
                if c < pair_channels:
                    from .pack import unpack2
                    taps = [unpack2(t) for t in (a00, a01, a10, a11)]
                    for half in (0, 1):
                        t00, t01, t10, t11 = (t[half] for t in taps)
                        top = t00 * (1.0 - fx) + t01 * fx
                        bot = t10 * (1.0 - fx) + t11 * fx
                        out_ref[out_c, :, :] = top * (1.0 - fy) + bot * fy
                        out_c += 1
                else:
                    top = a00 * (1.0 - fx) + a01 * fx
                    bot = a10 * (1.0 - fx) + a11 * fx
                    out_ref[out_c, :, :] = top * (1.0 - fy) + bot * fy
                    out_c += 1
            else:
                acc = zero
                for k in range(WIN_Y):
                    srow = scratch[c, k, :]
                    g0 = _chunk_gather(srow, lo0, hi0, n_chunks, zero)
                    acc = jnp.where(lyc == k, g0, acc)
                out_ref[out_c, :, :] = acc
                out_c += 1
        valid_ref[:, :] = valid.astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("bilinear", "pair_channels"))
def _warp_call(hist, sy, sx, bilinear: bool, pair_channels: int = 0):
    C, H, W = hist.shape
    Co = C + (pair_channels if bilinear else 0)
    assert H % TILE_R == 0 and W % TILE_C == 0, (H, W)
    grid = (H // TILE_R, W // TILE_C)
    coord_spec = pl.BlockSpec((TILE_R, TILE_C), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
    out, valid = pl.pallas_call(
        _make_kernel(C, H, W, bilinear, pair_channels if bilinear else 0),
        grid=grid,
        in_specs=[coord_spec, coord_spec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((Co, TILE_R, TILE_C), lambda i, j: (0, i, j),
                                memory_space=pltpu.VMEM),
                   coord_spec],
        out_shape=[jax.ShapeDtypeStruct((Co, H, W), jnp.float32),
                   jax.ShapeDtypeStruct((H, W), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((C, WIN_Y, WIN_X), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(sy, sx, hist)
    return out, valid != 0


def _pad_to_tiles(hist, sy, sx):
    # Pad to tile multiples AND to at least the DMA window size: the kernel
    # always copies a (WIN_Y, WIN_X) history window, so a frame smaller than
    # the window would otherwise DMA past the buffer (silent garbage).
    C, H, W = hist.shape
    ph = max(WIN_Y, H + (-H) % TILE_R) - H
    pw = max(WIN_X, W + (-W) % TILE_C) - W
    if not ph and not pw:
        return hist, sy, sx, H, W
    hist = jnp.pad(hist, ((0, 0), (0, ph), (0, pw)))
    big = jnp.float32(-10**6)   # padded outputs: invalid
    sy = jnp.pad(sy, ((0, ph), (0, pw)), constant_values=big)
    sx = jnp.pad(sx, ((0, ph), (0, pw)), constant_values=big)
    return hist, sy, sx, H, W


def warp_nearest(hist, sy, sx):
    """out[c, p] = hist[c, round(sy[p]), round(sx[p])], valid where in-image
    and within the tile window. hist (C, H, W) f32 (bitcast ints to f32);
    sy/sx (H, W) f32 source pixel coords (array convention, y down)."""
    hist, syp, sxp, H, W = _pad_to_tiles(hist, sy, sx)
    out, valid = _warp_call(hist, syp, sxp, False)
    # re-check bounds against the ORIGINAL dims: the kernel only sees the
    # padded image, so a source coord in the zero-padding would pass its test
    y = jnp.floor(sy + 0.5).astype(jnp.int32)
    x = jnp.floor(sx + 0.5).astype(jnp.int32)
    vo = (y >= 0) & (y < H) & (x >= 0) & (x < W)
    return out[:, :H, :W], valid[:H, :W] & vo


def warp_bilinear(hist, sy, sx, pair_channels: int = 0):
    """Bilinear variant: blends the 2×2 neighborhood of (sy, sx).

    The first pair_channels channels of hist carry bf16 pairs
    (ops/pack.pack2); each yields TWO unpacked, separately-lerped f32
    output channels (so out has C + pair_channels channels)."""
    hist, syp, sxp, H, W = _pad_to_tiles(hist, sy, sx)
    out, valid = _warp_call(hist, syp, sxp, True, pair_channels)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    vo = (y0 >= 0) & (y0 < H - 1) & (x0 >= 0) & (x0 < W - 1)
    return out[:, :H, :W], valid[:H, :W] & vo


# ---------------------------------------------------------------------------
# Pure-XLA twins (CPU tests / non-TPU backends): unwindowed gathers.
# Kernel-valid pixels must match these exactly; the kernel may additionally
# invalidate pixels whose source falls outside its tile window.
# ---------------------------------------------------------------------------

def warp_nearest_ref(hist, sy, sx):
    C, H, W = hist.shape
    y = jnp.floor(sy + 0.5).astype(jnp.int32)
    x = jnp.floor(sx + 0.5).astype(jnp.int32)
    valid = (y >= 0) & (y < H) & (x >= 0) & (x < W)
    idx = jnp.clip(y, 0, H - 1) * W + jnp.clip(x, 0, W - 1)
    flat = hist.reshape(C, H * W)
    out = jnp.stack([jnp.take(flat[c], idx) for c in range(C)])
    return out, valid


def warp_bilinear_ref(hist, sy, sx, pair_channels: int = 0):
    if pair_channels:
        from .pack import unpack2
        parts = []
        for c in range(hist.shape[0]):
            if c < pair_channels:
                a, b = unpack2(hist[c])
                parts += [a, b]
            else:
                parts.append(hist[c])
        return warp_bilinear_ref(jnp.stack(parts), sy, sx)
    C, H, W = hist.shape
    y0f = jnp.floor(sy)
    x0f = jnp.floor(sx)
    fy = (sy - y0f)[None]
    fx = (sx - x0f)[None]
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)
    valid = (y0 >= 0) & (y0 < H - 1) & (x0 >= 0) & (x0 < W - 1)
    y0c = jnp.clip(y0, 0, H - 2)
    x0c = jnp.clip(x0, 0, W - 2)
    idx = y0c * W + x0c
    flat = hist.reshape(C, H * W)

    def tap(off):
        return jnp.stack([jnp.take(flat[c], idx + off) for c in range(C)])

    v00, v01, v10, v11 = tap(0), tap(1), tap(W), tap(W + 1)
    out = ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
           + (v10 * (1 - fx) + v11 * fx) * fy)
    return out, valid


def dispatch_nearest(hist, sy, sx):
    if jax.default_backend() == "tpu":
        return warp_nearest(hist, sy, sx)
    return warp_nearest_ref(hist, sy, sx)


def dispatch_bilinear(hist, sy, sx, pair_channels: int = 0):
    if jax.default_backend() == "tpu":
        return warp_bilinear(hist, sy, sx, pair_channels)
    return warp_bilinear_ref(hist, sy, sx, pair_channels)
