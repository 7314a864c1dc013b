"""Vector/graphics math helpers over jnp arrays.

Equivalent capability to the reference's header-only math layer
(renderer/shaders/LinearMath.h) but expressed as SoA operations: a "Float3"
here is any pytree of three equally-shaped arrays or a stacked (..., 3) array;
hot kernels use separate component arrays (SoA) so the TPU VPU sees plain
elementwise work with no awkward minor dimension.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# SoA 3-vectors: tuples (x, y, z) of same-shaped arrays.
# ---------------------------------------------------------------------------

Vec3 = tuple  # (x, y, z) of jnp arrays


def v3(x, y, z) -> Vec3:
    return (jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))


def splat(c, like=None) -> Vec3:
    if like is None:
        return (jnp.float32(c), jnp.float32(c), jnp.float32(c))
    z = jnp.full_like(like, c)
    return (z, z, z)


def add(a: Vec3, b: Vec3) -> Vec3:
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub(a: Vec3, b: Vec3) -> Vec3:
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def mul(a: Vec3, b: Vec3) -> Vec3:
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def scale(a: Vec3, s) -> Vec3:
    return (a[0] * s, a[1] * s, a[2] * s)


def neg(a: Vec3) -> Vec3:
    return (-a[0], -a[1], -a[2])


def dot(a: Vec3, b: Vec3):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a: Vec3, b: Vec3) -> Vec3:
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def length(a: Vec3):
    return jnp.sqrt(dot(a, a))


def length_sq(a: Vec3):
    return dot(a, a)


def normalize(a: Vec3, eps: float = 1e-20) -> Vec3:
    inv = jax.lax.rsqrt(jnp.maximum(dot(a, a), eps))
    return scale(a, inv)


def lerp(a: Vec3, b: Vec3, t) -> Vec3:
    return (
        a[0] + (b[0] - a[0]) * t,
        a[1] + (b[1] - a[1]) * t,
        a[2] + (b[2] - a[2]) * t,
    )


def where3(c, a: Vec3, b: Vec3) -> Vec3:
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]), jnp.where(c, a[2], b[2]))


def clamp3(a: Vec3, lo, hi) -> Vec3:
    return (jnp.clip(a[0], lo, hi), jnp.clip(a[1], lo, hi), jnp.clip(a[2], lo, hi))


def abs3(a: Vec3) -> Vec3:
    return (jnp.abs(a[0]), jnp.abs(a[1]), jnp.abs(a[2]))


def max3(a: Vec3):
    return jnp.maximum(a[0], jnp.maximum(a[1], a[2]))


def min3(a: Vec3):
    return jnp.minimum(a[0], jnp.minimum(a[1], a[2]))


def reflect(i: Vec3, n: Vec3) -> Vec3:
    """Reflect incident direction i about normal n (i points toward surface)."""
    d = 2.0 * dot(i, n)
    return sub(i, scale(n, d))


def refract(i: Vec3, n: Vec3, eta):
    """Refract i (pointing toward surface) through normal n with relative IOR eta.

    Returns (dir, total_internal_reflection_mask).
    """
    cosi = -dot(i, n)
    sin2t = eta * eta * jnp.maximum(0.0, 1.0 - cosi * cosi)
    tir = sin2t > 1.0
    cost = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2t))
    t = add(scale(i, eta), scale(n, eta * cosi - cost))
    return t, tir


def luminance(r, g=None, b=None):
    if g is None:
        r, g, b = r
    return 0.2126 * r + 0.7152 * g + 0.0722 * b


def pow_weight(x, e: float):
    """x**e with repeated squaring when e is a power-of-two integer (the
    denoiser's phi_normal=64 case): 6 multiplies instead of the log+exp
    transcendental path — identical math on VPU and XLA so kernel/twin
    parity holds."""
    n = int(e)
    if float(n) == float(e) and n > 0 and (n & (n - 1)) == 0:
        while n > 1:
            x = x * x
            n >>= 1
        return x
    return x ** e


def orthonormal_basis(n: Vec3):
    """Branchless ONB from a unit normal (Duff et al. 2017 'Building an
    Orthonormal Basis, Revisited'). Returns (tangent, bitangent)."""
    s = jnp.where(n[2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[2])
    b = n[0] * n[1] * a
    t = (1.0 + s * n[0] * n[0] * a, s * b, -s * n[0])
    bt = (b, s + n[1] * n[1] * a, -n[1])
    return t, bt


def to_local(v: Vec3, t: Vec3, bt: Vec3, n: Vec3) -> Vec3:
    return (dot(v, t), dot(v, bt), dot(v, n))


def from_local(v: Vec3, t: Vec3, bt: Vec3, n: Vec3) -> Vec3:
    return add(add(scale(t, v[0]), scale(bt, v[1])), scale(n, v[2]))


def cosine_sample_hemisphere(u1, u2) -> Vec3:
    """Cosine-weighted hemisphere sample in local (z-up) frame."""
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    return (x, y, z)


def uniform_sample_sphere(u1, u2) -> Vec3:
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u2
    return (r * jnp.cos(phi), r * jnp.sin(phi), z)


def uniform_sample_cone(u1, u2, cos_theta_max) -> Vec3:
    """Uniform direction in a cone around +z (local frame)."""
    cos_t = 1.0 - u1 * (1.0 - cos_theta_max)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u2
    return (sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t)


def oct_encode(n: Vec3):
    """Octahedral unit-vector encoding → (u, v) in [-1, 1]."""
    l1 = jnp.abs(n[0]) + jnp.abs(n[1]) + jnp.abs(n[2])
    x = n[0] / l1
    y = n[1] / l1
    wrap_x = (1.0 - jnp.abs(y)) * jnp.sign(x)
    wrap_y = (1.0 - jnp.abs(x)) * jnp.sign(y)
    u = jnp.where(n[2] >= 0.0, x, wrap_x)
    v = jnp.where(n[2] >= 0.0, y, wrap_y)
    return u, v


def oct_decode(u, v) -> Vec3:
    z = 1.0 - jnp.abs(u) - jnp.abs(v)
    wrap_x = (1.0 - jnp.abs(v)) * jnp.sign(u)
    wrap_y = (1.0 - jnp.abs(u)) * jnp.sign(v)
    x = jnp.where(z >= 0.0, u, wrap_x)
    y = jnp.where(z >= 0.0, v, wrap_y)
    return normalize((x, y, z))


def safe_div(a, b, eps: float = 1e-20):
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b >= 0, eps, -eps), b)


def nan_scrub(x, repl=0.0):
    return jnp.where(jnp.isfinite(x), x, repl)


def nan_scrub3(a: Vec3, repl=0.0) -> Vec3:
    return (nan_scrub(a[0], repl), nan_scrub(a[1], repl), nan_scrub(a[2], repl))


def stack3(a: Vec3, axis: int = -1):
    return jnp.stack([a[0], a[1], a[2]], axis=axis)


def unstack3(arr, axis: int = -1) -> Vec3:
    parts = jnp.split(arr, 3, axis=axis)
    return tuple(jnp.squeeze(p, axis=axis) for p in parts)
