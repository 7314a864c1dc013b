"""Per-pixel low-discrepancy random numbers for sampling.

Capability parity with the reference's blue-noise sampler (renderer/shaders/
RandGen.h:21-46 + RandGenData.h sobol/scrambling/ranking tiles, consumed as
rand(sysParam, randIdx++) keyed by (pixel, frame, dimension),
SystemParameter.h:142-175).  The reference ships ~1 MB of precomputed tile
data; the TPU-native replacement is computed arithmetic: a PCG-style integer
hash for decorrelation across pixels/dimensions plus additive golden-ratio
(R2) sequences for low discrepancy across frames — zero memory traffic,
pure VPU, identical API shape: `rand(px, py, frame, dim)`.
"""
from __future__ import annotations

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


class RandState:
    """Mutable dimension counter mirroring the reference's randIdx++ usage.

    The (px, py) hash prefix is dim-independent, so it is computed ONCE here
    and reused by every draw — bit-identical to hash_combine(px, py·9277,
    dim·26699), but the shared two pcg stages stop being recomputed in every
    XLA fusion that consumes draws (~16 draws/bounce each re-deriving the
    prefix; XLA only CSEs within a single fusion)."""

    def __init__(self, px, py, frame, base_dim: int = 0):
        self.px = px
        self.py = py
        self.frame = frame
        self.dim = base_dim
        h = pcg_hash(jnp.uint32(0x9E3779B9) ^ jnp.asarray(px).astype(jnp.uint32))
        self._base = pcg_hash(
            h ^ (jnp.asarray(py).astype(jnp.uint32) * jnp.uint32(9277)))

    def next(self):
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
