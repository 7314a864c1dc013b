"""Bit-packing helpers: 2×bf16-in-f32 pairs + octahedral unit vectors.

The warped-history kernels (ops/warp_kernel.py) pay one lane-shuffle pass
per channel per window row; halving the channel count halves the kernel.
The reference stores its history and reservoir payloads in halves for the
same bandwidth reason (renderer/shaders/HalfPrecision.h, Light.h:13-23) —
on TPU the native 16-bit format is bfloat16, and packing two of them into
one f32 lane keeps every op a plain 32-bit VPU op (no 16-bit vector types).

Encoding uses round-to-nearest-even on the dropped mantissa bits, which
makes re-encoding a decoded value exact: a payload that survives N frames
of temporal reuse is quantized once, not N times (no drift random-walk).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _to_bf16_bits(x):
    """f32 -> bf16 bit pattern in the LOW 16 bits of an i32 (RNE rounding)."""
    b = jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.float32), jnp.int32)
    # round to nearest even: add 0x7fff + lsb-of-kept-part
    lsb = (b >> 16) & 1
    b = b + 0x7FFF + lsb
    return (b >> 16) & 0xFFFF


def _from_bf16_bits(lo16):
    """LOW 16 bits (bf16 pattern) -> f32."""
    return jax.lax.bitcast_convert_type(
        (lo16 & 0xFFFF) << 16, jnp.float32)


def pack2(a, b):
    """Two f32 arrays -> one f32 array holding (bf16(a) | bf16(b) << 16)."""
    bits = _to_bf16_bits(a) | (_to_bf16_bits(b) << 16)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def unpack2(p):
    """Inverse of pack2: f32 pair-carrier -> (a, b) as f32."""
    bits = jax.lax.bitcast_convert_type(p, jnp.int32)
    return _from_bf16_bits(bits), _from_bf16_bits(bits >> 16)


def pack_int(a, b, bits_a: int):
    """Two non-negative ints -> one f32 bit-carrier (a | b << bits_a).
    Total payload must fit 31 bits (bit patterns ride as f32 through
    nearest-warp kernels untouched)."""
    v = jnp.asarray(a, jnp.int32) | (jnp.asarray(b, jnp.int32) << bits_a)
    return jax.lax.bitcast_convert_type(v, jnp.float32)


def unpack_int(p, bits_a: int):
    v = jax.lax.bitcast_convert_type(p, jnp.int32)
    return v & ((1 << bits_a) - 1), v >> bits_a


def octa_encode(n):
    """Unit vector (SoA 3-tuple) -> octahedral (u, v) in [-1, 1]²
    (Meyer et al.; the reference packs normals the same way for its
    half-precision G-buffers)."""
    x, y, z = n
    norm = jnp.abs(x) + jnp.abs(y) + jnp.abs(z)
    norm = jnp.maximum(norm, 1e-12)
    u = x / norm
    v = y / norm
    # fold the lower hemisphere
    uf = (1.0 - jnp.abs(v)) * jnp.sign(jnp.where(u == 0.0, 1.0, u))
    vf = (1.0 - jnp.abs(u)) * jnp.sign(jnp.where(v == 0.0, 1.0, v))
    neg = z < 0.0
    return jnp.where(neg, uf, u), jnp.where(neg, vf, v)


def octa_decode(u, v):
    """Inverse of octa_encode -> unit vector (x, y, z)."""
    z = 1.0 - jnp.abs(u) - jnp.abs(v)
    uf = (1.0 - jnp.abs(v)) * jnp.sign(jnp.where(u == 0.0, 1.0, u))
    vf = (1.0 - jnp.abs(u)) * jnp.sign(jnp.where(v == 0.0, 1.0, v))
    neg = z < 0.0
    x = jnp.where(neg, uf, u)
    y = jnp.where(neg, vf, v)
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-12))
    return x * inv, y * inv, z * inv
