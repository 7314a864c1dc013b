"""Pallas TPU kernel: edge-stopping à-trous wavelet pass.

The denoiser's dominant cost is the 25-tap à-trous chain (Atrous.h /
AtrousSmem.h role): in XLA each shifted tap materializes full-frame
intermediates (~10 ms/pass at 1080p on v5e).  Here one grid step processes
an (8, 128) tile with the whole 5×5·step stencil resolved from a VMEM
window — taps are static sublane/lane slices, weights pure VPU math, one
HBM read per input channel.

Inputs are edge-padded in XLA (cheap, once per pass for data; once per
frame for guides) so every window stays in-bounds and aligned.  The XLA
twin is ops/denoise/passes.atrous_pass — kernel output must match it to
float tolerance (tests/test_atrous_kernel.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import mathutil as m

TILE_R = 32           # big tiles amortize the stencil halo (window area
TILE_C = 512          # = (TILE_R+32)(TILE_C+32) vs TILE_R·TILE_C useful)
MAX_STEP = 8          # supported step sizes: 1, 2, 4, 8
PAD_R = 2 * MAX_STEP  # 16 rows each side (multiple of 8)
PAD_C = 64            # lane halo; DMA slice *sizes* must be 128-aligned,
                      # so TILE_C + 2·PAD_C ≡ 0 (mod 128)

_W1D = {0: 0.375, 1: 0.25, 2: 0.0625}


def _make_kernel(step: int, phi_lum: float, phi_normal: float,
                 phi_depth: float, Hp: int, Wp: int):
    big = 1e30

    def kernel(data_ref, guide_ref, out_ref, dscr, gscr, sem_d, sem_g):
        i = pl.program_id(0)
        j = pl.program_id(1)
        r0 = pl.multiple_of(i * TILE_R, TILE_R)
        c0 = pl.multiple_of(j * TILE_C, TILE_C)
        cp_d = pltpu.make_async_copy(
            data_ref.at[:, pl.ds(r0, TILE_R + 2 * PAD_R),
                        pl.ds(c0, TILE_C + 2 * PAD_C)], dscr, sem_d)
        cp_g = pltpu.make_async_copy(
            guide_ref.at[:, pl.ds(r0, TILE_R + 2 * PAD_R),
                         pl.ds(c0, TILE_C + 2 * PAD_C)], gscr, sem_g)
        cp_d.start()
        cp_g.start()
        cp_d.wait()
        cp_g.wait()

        def tap(scr, ch, dy, dx):
            rr = PAD_R + dy * step
            cc = PAD_C + dx * step
            return scr[ch, rr:rr + TILE_R, cc:cc + TILE_C]

        ir = tap(dscr, 0, 0, 0)
        ig = tap(dscr, 1, 0, 0)
        ib = tap(dscr, 2, 0, 0)
        var = tap(dscr, 3, 0, 0)
        depth = tap(gscr, 0, 0, 0)
        nx = tap(gscr, 1, 0, 0)
        ny = tap(gscr, 2, 0, 0)
        nz = tap(gscr, 3, 0, 0)

        lum_c = m.luminance(ir, ig, ib)
        sigma_l = phi_lum * jnp.sqrt(jnp.maximum(var, 1e-8)) + 1e-3

        w0 = 0.375 * 0.375
        acc_r = ir * w0
        acc_g = ig * w0
        acc_b = ib * w0
        acc_v = var * (w0 * w0)
        wsum = jnp.full(ir.shape, w0)

        for dy in (-2, -1, 0, 1, 2):
            for dx in (-2, -1, 0, 1, 2):
                if dy == 0 and dx == 0:
                    continue
                wk = _W1D[abs(dy)] * _W1D[abs(dx)]
                n_r = tap(dscr, 0, dy, dx)
                n_g = tap(dscr, 1, dy, dx)
                n_b = tap(dscr, 2, dy, dx)
                n_v = tap(dscr, 3, dy, dx)
                n_depth = tap(gscr, 0, dy, dx)
                n_nx = tap(gscr, 1, dy, dx)
                n_ny = tap(gscr, 2, dy, dx)
                n_nz = tap(gscr, 3, dy, dx)
                n_lum = m.luminance(n_r, n_g, n_b)

                # one exp for the merged depth+luma terms; pow2-exponent
                # normal weight as repeated squaring (pow = log+exp on the
                # slow transcendental path; 50 exp + 25 pow/pixel/pass
                # dominated the kernel).  Same formulas in the XLA twin.
                e_z = jnp.abs(n_depth - depth) \
                    / (phi_depth * jnp.maximum(depth, 1.0)
                       * max(abs(dy) + abs(dx), 1))
                ndot = jnp.maximum(n_nx * nx + n_ny * ny + n_nz * nz, 0.0)
                w_n = m.pow_weight(ndot, phi_normal)
                e_l = jnp.abs(n_lum - lum_c) / sigma_l
                w = wk * jnp.exp(-(e_z + e_l)) * w_n
                sky = (n_depth >= big) | (depth >= big)
                w = jnp.where(sky, 0.0, w)
                acc_r = acc_r + n_r * w
                acc_g = acc_g + n_g * w
                acc_b = acc_b + n_b * w
                acc_v = acc_v + n_v * (w * w)
                wsum = wsum + w

        inv = 1.0 / jnp.maximum(wsum, 1e-6)
        out_ref[0, :, :] = acc_r * inv
        out_ref[1, :, :] = acc_g * inv
        out_ref[2, :, :] = acc_b * inv
        out_ref[3, :, :] = acc_v * inv * inv

    return kernel


@functools.partial(jax.jit, static_argnames=("H", "W", "step", "phi_lum",
                                             "phi_normal", "phi_depth"))
def _atrous_call(data_p, guide_p, H, W, step: int, phi_lum: float,
                 phi_normal: float, phi_depth: float):
    Hp = int(data_p.shape[1])
    Wp = int(data_p.shape[2])
    grid = (H // TILE_R, W // TILE_C)
    out = pl.pallas_call(
        _make_kernel(step, phi_lum, phi_normal, phi_depth, Hp, Wp),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((4, TILE_R, TILE_C), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, TILE_R + 2 * PAD_R, TILE_C + 2 * PAD_C), jnp.float32),
            pltpu.VMEM((4, TILE_R + 2 * PAD_R, TILE_C + 2 * PAD_C), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(data_p, guide_p)
    return out


def _pad_chan(x, hpad_extra, wpad_extra):
    """Edge-pad (C, H, W) by PAD_R/PAD_C (+ tile-rounding extras on the
    high side)."""
    return jnp.pad(x, ((0, 0), (PAD_R, PAD_R + hpad_extra),
                       (PAD_C, PAD_C + wpad_extra)), mode="edge")


def pad_guides(depth, normal, roughness):
    """Pad the guide channels once per frame (reused by all 4 passes).
    normal: (H, W, 3)."""
    H, W = depth.shape
    he = (-H) % TILE_R
    we = (-W) % TILE_C
    g = jnp.stack([depth, normal[..., 0], normal[..., 1], normal[..., 2]])
    return _pad_chan(g, he, we)


def atrous_pass_tpu(illum, var, guide_p, H, W, step: int, phi_lum: float,
                    phi_normal: float, phi_depth: float):
    """One à-trous iteration via the Pallas kernel.  illum (H, W, 3),
    var (H, W); guide_p from pad_guides.  Returns (illum', var')."""
    assert step <= MAX_STEP, (
        f"atrous step {step} > MAX_STEP {MAX_STEP}: the VMEM window only "
        f"holds a 2*MAX_STEP halo — use passes.atrous_pass for larger steps")
    he = (-H) % TILE_R
    we = (-W) % TILE_C
    data = jnp.stack([illum[..., 0], illum[..., 1], illum[..., 2], var])
    data_p = _pad_chan(data, he, we)
    out = _atrous_call(data_p, guide_p, H=H + he, W=W + we, step=step,
                       phi_lum=float(phi_lum), phi_normal=float(phi_normal),
                       phi_depth=float(phi_depth))
    out = out[:, :H, :W]
    return jnp.stack([out[0], out[1], out[2]], axis=-1), out[3]
