"""Per-pixel low-discrepancy random numbers for sampling.

Capability parity with the reference's blue-noise sampler (renderer/shaders/
RandGen.h:21-46 + RandGenData.h sobol/scrambling/ranking tiles, consumed as
rand(sysParam, randIdx++) keyed by (pixel, frame, dimension),
SystemParameter.h:142-175).  Two samplers share the `rand(px,py,frame,dim)`
API shape:

* PCG + R2 (`rand`, `RandState(bn=None)`) — a PCG-style integer hash for
  decorrelation plus additive golden-ratio sequences; zero memory traffic,
  pure VPU.  The fallback / test sampler.
* Blue noise (`RandState(bn=...)`) — blue-noise DITHERED sampling
  (Georgiev & Fajardo 2016) re-shaped for the VPU:
  value = frac(mask[px, py, dim & 15] + sobol_dim(frame & 255)), with 16
  void-and-cluster 128x128 masks (tools/make_bluenoise.py,
  data/assets/bluenoise.npz) and the per-dimension sobol sequence evaluated
  on the SCALAR frame index via an 8-entry XOR basis (the 256-sample run
  collapses because XOR is linear over the index bits).  The masks enter as
  FOUR pre-tiled (H, W) u32 byte-plane packs (`bn_packed`), so each draw is
  ~8 VPU ops — cheaper than the PCG path, no gathers anywhere.  Spatially
  the pattern is the blue mask shifted mod 1 → blue at EVERY (frame, dim);
  temporally each pixel follows a Cranley-Patterson-rotated sobol sequence.
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

_PHI1 = 0.6180339887498949            # 1/φ
_PHI2_X = 0.7548776662466927          # R2 sequence (Roberts)
_PHI2_Y = 0.5698402909980532


def pcg_hash(x):
    """PCG output permutation on uint32 (public-domain hash construction)."""
    x = x.astype(jnp.uint32)
    x = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((x >> ((x >> jnp.uint32(28)) + jnp.uint32(4))) ^ x) * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def hash_combine(*xs):
    h = jnp.uint32(0x9E3779B9)
    for x in xs:
        h = pcg_hash(h ^ x.astype(jnp.uint32))
    return h


def to_unit_float(bits):
    """uint32 → [0, 1) float32 via mantissa injection: the top 23 bits
    become the mantissa of a float in [1, 2), minus 1.  Chosen over
    `astype(float32)·2⁻³²` because Mosaic (Pallas TPU) has no u32→f32
    cast — and the bitcast form is one VPU op cheaper anyway.  All RNG
    consumers (XLA paths, RandState, the fused shade kernel) share this
    formula, keeping every backend's sample stream bit-identical."""
    import jax
    b = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return jax.lax.bitcast_convert_type(b, jnp.float32) - 1.0


def to_unit_float_scalar(bits):
    """Scalar-safe `to_unit_float`: Mosaic's tpu.bitcast op is vector-only,
    so SCALAR operands (e.g. the per-frame sobol term inside the fused shade
    kernel) convert via an i32 cast instead.  Bit-identical to the bitcast
    form: (bits>>9) < 2²³ is exactly representable in float32, so
    (bits>>9)·2⁻²³ equals the mantissa-injection value for every input."""
    b = (bits >> jnp.uint32(9)).astype(jnp.int32)
    return b.astype(jnp.float32) * jnp.float32(2.0 ** -23)


# R2 strides as fixed-point uint32 (round(stride · 2³²)): the golden-ratio
# frame advance runs in exact modular arithmetic, so the sequence never
# degrades however large the frame counter grows (float32 frame·stride loses
# fractional precision past ~5e5 frames — a couple of hours at 60 fps).
PHI2_X_BITS = 3242174889   # round(0.7548776662466927 * 2**32)
PHI2_Y_BITS = 2447445413   # round(0.5698402909980532 * 2**32)
_PHI2_X_U32 = jnp.uint32(PHI2_X_BITS)
_PHI2_Y_U32 = jnp.uint32(PHI2_Y_BITS)


def rand(px, py, frame, dim):
    """Low-discrepancy sample in [0,1) keyed by (pixel, frame, dimension).

    Per-pixel hash gives a Cranley–Patterson rotation; frames advance along a
    golden-ratio sequence whose stride is itself decorrelated per dimension —
    good temporal accumulation behavior without stored tiles.
    """
    px = jnp.asarray(px)
    base_bits = hash_combine(px, py * jnp.uint32(9277), dim * jnp.uint32(26699))
    stride = jnp.where((jnp.asarray(dim) & 1) == 0, _PHI2_X_U32, _PHI2_Y_U32)
    bits = base_bits + jnp.asarray(frame, jnp.uint32) * stride   # mod 2³²
    return to_unit_float(bits)


def rand2(px, py, frame, dim):
    return rand(px, py, frame, dim), rand(px, py, frame, dim + 1)


# ---------------------------------------------------------------------------
# blue-noise sampler (RandGen.h:21-46 scheme, gather-free TPU form)
# ---------------------------------------------------------------------------

_BN_PATH = os.path.join(os.path.dirname(__file__), "..", "..",
                        "data", "assets", "bluenoise.npz")
_BN_DATA = None


def bn_tables():
    """Host-side numpy tables: sobol_basis32 (256, 8) u32 and the 16
    void-and-cluster masks pre-packed 4-slices-per-u32 as (4, 128, 128)."""
    global _BN_DATA
    if _BN_DATA is None:
        with np.load(_BN_PATH) as d:
            t = d["masks"].astype(np.uint32)              # (16,128,128) u8
            packs = [t[4 * i] | (t[4 * i + 1] << 8) | (t[4 * i + 2] << 16)
                     | (t[4 * i + 3] << 24) for i in range(4)]
            _BN_DATA = {"basis": d["sobol_basis32"],      # (256, 8) u32
                        "masks": np.stack(packs)}         # (4,128,128) u32
    return _BN_DATA


def bn_packed(H: int, W: int, y0=0, step: int = 1):
    """Tuple of FOUR (H, W) u32 byte-plane packs aligned with the pixel
    grid: the 128-periodic masks unrolled over the image (roll handles a
    traced band offset y0).  Pack c holds mask slices 4c..4c+3 in its
    bytes; a draw at dimension d reads byte (d & 15).  step=2 builds the
    planes a half-res wave sees at global pixels (y0 + 2r, 2c) — the stride
    lands on the CONSTANT 128x128 table (folds at compile time), never on a
    full image plane (strided slices lower to slow TPU gathers; see
    pathtracer._ds).  Call inside jit."""
    t = jnp.asarray(bn_tables()["masks"])                  # (4,128,128)
    if not (isinstance(y0, int) and y0 == 0):
        t = jnp.roll(t, -(jnp.asarray(y0, jnp.int32) % 128), axis=1)
    if step != 1:
        t = t[:, ::step, ::step]
    per = 128 // step
    ry, rx = -(-H // per) + 1, -(-W // per)
    return tuple(jnp.tile(t[c], (ry, rx))[:H, :W] for c in range(4))


def bn_sobol_scalar(frame, dim: int):
    """sobol_dim(frame & 255) as a u32 SCALAR: XOR basis over the 8 frame
    bits (static u32 consts per dim, tools/make_bluenoise.py)."""
    basis = bn_tables()["basis"][dim & 255]               # 8 numpy u32
    f = jnp.asarray(frame, jnp.uint32)
    v = jnp.uint32(0)
    for k in range(8):
        if int(basis[k]):
            bit = (f >> jnp.uint32(k)) & jnp.uint32(1)
            v = v ^ (bit * jnp.uint32(int(basis[k])))
    return v


def bn_draw(bn, frame, dim: int):
    """Blue-noise dithered sample in [0,1):
    frac((mask_byte + 0.5)/256 + sobol_dim(frame)/2^32).  The mask byte
    converts by mantissa injection (byte<<15 lands at mantissa bits 15-22 →
    1 + v/256) because Mosaic has no u32→f32 cast; the scalar sobol term
    reuses `to_unit_float`."""
    import jax
    d16 = dim & 15
    sh = jnp.uint32(8 * (d16 & 3))
    byte = (bn[d16 >> 2] >> sh) & jnp.uint32(0xFF)
    bits = (byte << jnp.uint32(15)) | jnp.uint32(0x3F800000)
    mask_f = jax.lax.bitcast_convert_type(bits, jnp.float32) \
        - (1.0 - 0.5 / 256.0)
    u = mask_f + to_unit_float_scalar(bn_sobol_scalar(frame, dim))
    return u - jnp.floor(u)


class RandState:
    """Mutable dimension counter mirroring the reference's randIdx++ usage.

    The (px, py) hash prefix is dim-independent, so it is computed ONCE here
    and reused by every draw — bit-identical to hash_combine(px, py·9277,
    dim·26699), but the shared two pcg stages stop being recomputed in every
    XLA fusion that consumes draws (~16 draws/bounce each re-deriving the
    prefix; XLA only CSEs within a single fusion).

    With `bn` (a `bn_packed` (4, H, W) u32 pack aligned with px/py) every
    draw comes from the blue-noise sampler instead; self.dim stays a PYTHON
    int, so each draw's sobol basis and byte-lane shifts are static."""

    def __init__(self, px, py, frame, base_dim: int = 0, bn=None):
        self.px = px
        self.py = py
        self.frame = frame
        self.dim = base_dim
        self.bn = bn
        if bn is None:
            h = pcg_hash(jnp.uint32(0x9E3779B9) ^ jnp.asarray(px).astype(jnp.uint32))
            self._base = pcg_hash(
                h ^ (jnp.asarray(py).astype(jnp.uint32) * jnp.uint32(9277)))

    def next(self):
        if self.bn is not None:
            v = bn_draw(self.bn, self.frame, self.dim)
            self.dim += 1
            return v
        dim = jnp.uint32(self.dim)
        bits = pcg_hash(self._base ^ (dim * jnp.uint32(26699)))
        stride = jnp.where((dim & jnp.uint32(1)) == 0, _PHI2_X_U32, _PHI2_Y_U32)
        v = to_unit_float(bits + jnp.asarray(self.frame, jnp.uint32) * stride)
        self.dim += 1
        return v

    def next2(self):
        return self.next(), self.next()

    def next3(self):
        return self.next(), self.next(), self.next()
