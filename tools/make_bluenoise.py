"""Generate the blue-noise sampler data: sobol bit-basis + 128x128 masks.

Role parity with the reference's shipped tile data
(renderer/shaders/RandGenData.h: sobol_256spp_256d, scramblingTile,
rankingTile, consumed by RandGen.h:21-46 as rand(px, py, frame, dim)).
The reference ships Heitz-Belcour 2019 optimized tiles as a ~1 MB C array
whose blue-noise property lives in an offline simulated-annealing
optimization; the TPU build instead uses blue-noise DITHERED sampling
(Georgiev & Fajardo 2016): value = frac(mask[px, py, dim] + sobol_dim(frame))
— spatially blue at EVERY frame by construction, per-pixel sobol-shifted
(Cranley-Patterson) across frames, and gather-free on the VPU.

* sobol basis — scipy's natural-order Sobol sequence direction values.
  Because the frame index is 8 bits (&255, as the reference wraps
  sampleIndex), the whole per-dimension sequence collapses to an 8-entry
  XOR basis (v[k] = sobol(2^k) as u32), evaluated on the SCALAR frame
  index at trace time cost only.
* masks — 16 independent 128x128 void-and-cluster blue-noise masks
  (Ulichney 1993), wraparound gaussian energy; dim selects mask dim & 15.

Output: data/assets/bluenoise.npz {sobol_basis32 (256,8) u32,
masks (16,128,128) u8}.

Run: python tools/make_bluenoise.py   (~60 s, numpy/scipy only)
"""
from __future__ import annotations

import os

import numpy as np

N_DIMS = 256
TILE = 128
SIGMA = 1.9


def sobol_basis(n_dims: int = N_DIMS) -> np.ndarray:
    from scipy.stats import qmc
    pts = qmc.Sobol(d=n_dims, scramble=False, bits=32).random(256)  # natural
    vals = np.floor(pts * 2**32).astype(np.uint64).astype(np.uint32)
    basis = np.stack([vals[1 << k] for k in range(8)], axis=1)  # (dims, 8) u32
    # verify the XOR-reconstruction property on a few indices
    for i in (3, 77, 255):
        x = np.zeros(n_dims, np.uint32)
        for k in range(8):
            if (i >> k) & 1:
                x ^= basis[:, k]
        assert np.array_equal(x, vals[i]), "sobol order is not natural"
    return basis


def _wrapped_gaussian(n: int, sigma: float) -> np.ndarray:
    ax = np.arange(n)
    d = np.minimum(ax, n - ax).astype(np.float64)
    g1 = np.exp(-(d * d) / (2 * sigma * sigma))
    return np.outer(g1, g1)


def void_and_cluster(n: int, seed: int) -> np.ndarray:
    """Ulichney void-and-cluster; returns ranks 0..n*n-1 as (n, n) int32."""
    rng = np.random.default_rng(seed)
    npix = n * n
    n_ones = npix // 10
    kern = _wrapped_gaussian(n, SIGMA)
    kf = np.fft.rfft2(kern)

    def energy(binary):
        return np.fft.irfft2(np.fft.rfft2(binary) * kf, s=(n, n))

    def roll_kern(y, x):
        return np.roll(np.roll(kern, y, axis=0), x, axis=1)

    # phase 0: prototype binary pattern, swap tightest cluster -> largest void
    b = np.zeros((n, n))
    idx = rng.choice(npix, n_ones, replace=False)
    b.flat[idx] = 1
    e = energy(b)
    for _ in range(npix):
        c = np.unravel_index(np.argmax(np.where(b > 0, e, -np.inf)), b.shape)
        b[c] = 0
        e -= roll_kern(*c)
        v = np.unravel_index(np.argmin(np.where(b > 0, np.inf, e)), b.shape)
        if v == c:
            b[c] = 1
            e += roll_kern(*c)
            break
        b[v] = 1
        e += roll_kern(*v)

    ranks = np.full((n, n), -1, np.int32)
    # phase 1: remove tightest cluster, rank n_ones-1 .. 0
    bb, ee = b.copy(), e.copy()
    for r in range(n_ones - 1, -1, -1):
        c = np.unravel_index(np.argmax(np.where(bb > 0, ee, -np.inf)), bb.shape)
        bb[c] = 0
        ee -= roll_kern(*c)
        ranks[c] = r
    # phase 2: fill largest void, rank n_ones .. npix-1
    bb, ee = b.copy(), e.copy()
    for r in range(n_ones, npix):
        v = np.unravel_index(np.argmin(np.where(bb > 0, np.inf, ee)), bb.shape)
        bb[v] = 1
        ee += roll_kern(*v)
        ranks[v] = r
    assert ranks.min() == 0 and ranks.max() == npix - 1
    return ranks


def make_tiles(n_slices: int = 8, seed0: int = 0) -> np.ndarray:
    out = np.empty((n_slices, TILE, TILE), np.uint8)
    for s in range(n_slices):
        ranks = void_and_cluster(TILE, seed0 + s)
        out[s] = (ranks.astype(np.uint64) * 256 // (TILE * TILE)).astype(np.uint8)
    return out


def main():
    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "data", "assets", "bluenoise.npz")
    print("sobol basis ...")
    basis = sobol_basis()
    print("blue-noise masks ...")
    masks = make_tiles(16, seed0=11)
    np.savez_compressed(out_path, sobol_basis32=basis, masks=masks)
    print("wrote", os.path.abspath(out_path),
          os.path.getsize(out_path), "bytes")


if __name__ == "__main__":
    main()
