"""Disney-style uber BSDF: sample / evaluate, fully branchless.

Capability parity with renderer/shaders/Bsdf.h (618 LoC):
  * lobes — Lambert diffuse, GGX microfacet reflection, perfect specular
    reflection (below-roughness-threshold), thin diffuse transmission
    ("translucency"/bi-Lambert, Bsdf.h:94-118)
  * Fresnel-weighted lobe selection with minimum lobe probability clamps
    (Bsdf.h:401-537), throughput clamp (disneyMaxThroughput),
    roughnessThreshold mirror cutoff (Bsdf.h:5-10)

TPU-native shape: compute-every-lobe-and-select — there is no divergence
penalty for evaluating all lobes on the VPU, so the reference's SER-based
reordering (RayGen.cu:49-64) has no equivalent and is unnecessary.
All functions operate on SoA arrays of any shape (wavefront style).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import mathutil as m

ROUGHNESS_THRESHOLD = 0.02    # below: treat as perfect mirror (Bsdf.h:5)
SMOOTH_TRANS_ROUGHNESS = 0.1  # below: translucency = specular pass-through
                              # (glass/water; Bsdf.h:94-118 specular branch).
                              # At or above: diffuse thin transmission (leaves).
MAX_THROUGHPUT = 32.0         # disneyMaxThroughput (Bsdf.h:10)
MIN_LOBE_PROB = 0.05
MIN_COS = 1e-4


class Material(NamedTuple):
    """SoA material parameters at shading points (SystemParameter.h:11-38)."""
    albedo_r: jnp.ndarray
    albedo_g: jnp.ndarray
    albedo_b: jnp.ndarray
    roughness: jnp.ndarray
    metallic: jnp.ndarray
    translucency: jnp.ndarray

    @property
    def albedo(self):
        return (self.albedo_r, self.albedo_g, self.albedo_b)


class BsdfSample(NamedTuple):
    wi: tuple            # sampled direction (world)
    weight: tuple        # f * cos / pdf throughput multiplier (rgb)
    pdf: jnp.ndarray     # solid-angle pdf (0 where delta)
    is_delta: jnp.ndarray
    is_transmission: jnp.ndarray


def _schlick(f0, cos_t):
    x = jnp.clip(1.0 - cos_t, 0.0, 1.0)
    x2 = x * x
    return f0 + (1.0 - f0) * x2 * x2 * x


def _ggx_d(alpha2, cos_h):
    c2 = cos_h * cos_h
    den = c2 * (alpha2 - 1.0) + 1.0
    return alpha2 / jnp.maximum(jnp.pi * den * den, 1e-8)


def _smith_g1(alpha2, cos_v):
    c2 = jnp.maximum(cos_v * cos_v, 1e-8)
    tan2 = (1.0 - c2) / c2
    return 2.0 / (1.0 + jnp.sqrt(1.0 + alpha2 * tan2))


def _lobe_probs(mat: Material, f_avg):
    """Lobe selection probabilities (diffuse, specular, transmission)."""
    spec_w = jnp.clip(f_avg + mat.metallic, 0.0, 1.0)
    trans_w = mat.translucency * (1.0 - mat.metallic)
    diff_w = (1.0 - spec_w) * (1.0 - trans_w)
    p_spec = jnp.maximum(spec_w, MIN_LOBE_PROB)
    p_trans = jnp.where(trans_w > 0.0, jnp.maximum(trans_w, MIN_LOBE_PROB), 0.0)
    p_diff = jnp.maximum(diff_w, MIN_LOBE_PROB)
    total = p_spec + p_trans + p_diff
    return p_diff / total, p_spec / total, p_trans / total


def _f0(mat: Material):
    return tuple(0.04 + (a - 0.04) * mat.metallic for a in mat.albedo)


def evaluate(mat: Material, n, wo, wi):
    """BSDF value f(wo, wi) (rgb) and sampling pdf for MIS (Bsdf.h:539-618).

    wo: direction toward viewer; wi: direction toward light (both unit,
    world space). Delta lobes contribute nothing to `f` here (standard).
    """
    cos_o = m.dot(n, wo)
    cos_i = m.dot(n, wi)
    reflect_side = (cos_i > MIN_COS) & (cos_o > MIN_COS)
    trans_side = (cos_i < -MIN_COS) & (cos_o > MIN_COS)

    alpha = jnp.maximum(mat.roughness, ROUGHNESS_THRESHOLD) ** 2
    alpha2 = alpha * alpha

    h = m.normalize(m.add(wo, wi))
    cos_h = jnp.maximum(m.dot(n, h), 0.0)
    cos_oh = jnp.maximum(m.dot(wo, h), MIN_COS)

    f0r, f0g, f0b = _f0(mat)
    Fr = _schlick(f0r, cos_oh)
    Fg = _schlick(f0g, cos_oh)
    Fb = _schlick(f0b, cos_oh)
    D = _ggx_d(alpha2, cos_h)
    G = _smith_g1(alpha2, jnp.abs(cos_o)) * _smith_g1(alpha2, jnp.abs(cos_i))
    spec_den = jnp.maximum(4.0 * jnp.abs(cos_o) * jnp.abs(cos_i), 1e-6)
    spec = tuple(F * D * G / spec_den for F in (Fr, Fg, Fb))

    diff_scale = (1.0 - mat.metallic) * (1.0 - mat.translucency) / jnp.pi
    diff = tuple(a * diff_scale for a in mat.albedo)

    # thin diffuse transmission: albedo-tinted lambert through the surface
    # (smooth translucents transmit as a delta lobe instead — excluded here)
    is_smooth_trans = mat.roughness < SMOOTH_TRANS_ROUGHNESS
    trans_scale = jnp.where(is_smooth_trans, 0.0,
                            (1.0 - mat.metallic) * mat.translucency / jnp.pi)
    trans = tuple(a * trans_scale for a in mat.albedo)

    is_mirror = mat.roughness < ROUGHNESS_THRESHOLD
    f = tuple(
        jnp.where(
            reflect_side,
            d + jnp.where(is_mirror, 0.0, s),
            jnp.where(trans_side, t, 0.0),
        )
        for d, s, t in zip(diff, spec, trans)
    )

    # pdf of the sampling strategy below
    f_avg = (Fr + Fg + Fb) / 3.0
    p_diff, p_spec, p_trans = _lobe_probs(mat, _schlick((f0r + f0g + f0b) / 3.0, cos_o))
    pdf_diff = jnp.maximum(cos_i, 0.0) / jnp.pi
    pdf_spec = D * cos_h / jnp.maximum(4.0 * cos_oh, 1e-6)
    pdf_trans = jnp.maximum(-cos_i, 0.0) / jnp.pi
    pdf = (p_diff * jnp.where(reflect_side, pdf_diff, 0.0)
           + jnp.where(is_mirror, 0.0, p_spec * jnp.where(reflect_side, pdf_spec, 0.0))
           + jnp.where(is_smooth_trans, 0.0,
                       p_trans * jnp.where(trans_side, pdf_trans, 0.0)))
    return f, pdf


def eval_lum(mat: Material, n, wo, wi):
    """Luminance-only BSDF proxy: returns (f_lum, pdf_proxy).

    ~4x cheaper than `evaluate` (2 divides + 1 normalize vs ~10 divides +
    3 sqrt and 3x per-channel math): scalar-luminance albedo/Fresnel,
    Smith G dropped (G <= 1 — variance only), the whole specular chain
    fused into one divide.  Used wherever the value only *steers* sampling:

      * RIS candidate target pdfs (p-hat) — any non-negative target is
        unbiased as long as W = wsum / p-hat uses the same definition
        (RestirCommon.h contract), and p-hat > 0 wherever f > 0 holds
        (diffuse + specular + translucent lobes all covered);
      * temporal-ReSTIR re-evaluation of stored samples (same p-hat);
      * the light-vs-BSDF balance weights on BOTH sides (pdf_proxy here,
        and the pathtracer's prev_cos_pdf on the emissive/sky-hit side) —
        the two MIS halves still partition unity because they evaluate the
        SAME function, so this is a variance trade, not bias
        (LightBrdfMisWeight role, Restir.h:286-328).

    The final shading contribution always re-evaluates the winner with the
    full per-channel `evaluate`.
    """
    cos_o = m.dot(n, wo)
    cos_i = m.dot(n, wi)
    reflect_side = (cos_i > MIN_COS) & (cos_o > MIN_COS)
    trans_side = (cos_i < -MIN_COS) & (cos_o > MIN_COS)

    alpha = jnp.maximum(mat.roughness, ROUGHNESS_THRESHOLD) ** 2
    alpha2 = alpha * alpha
    h = m.normalize(m.add(wo, wi))
    cos_h = jnp.maximum(m.dot(n, h), 0.0)
    cos_oh = jnp.maximum(m.dot(wo, h), MIN_COS)

    alb_lum = m.luminance(mat.albedo_r, mat.albedo_g, mat.albedo_b)
    F = _schlick(0.04 + (alb_lum - 0.04) * mat.metallic, cos_oh)

    c2 = cos_h * cos_h
    den = c2 * (alpha2 - 1.0) + 1.0
    is_mirror = mat.roughness < ROUGHNESS_THRESHOLD
    # F * D / (4 cos_o cos_i) with G == 1: one divide for the whole chain
    d_base = alpha2 / jnp.maximum(
        jnp.pi * den * den * 4.0 * cos_oh, 1e-7)
    spec = jnp.where(is_mirror, 0.0,
                     F * d_base * cos_oh / jnp.maximum(
                         cos_o * jnp.maximum(cos_i, MIN_COS), 1e-6))
    one_m_metal = 1.0 - mat.metallic
    diff = alb_lum * one_m_metal * (1.0 - mat.translucency) * (1.0 / jnp.pi)
    is_smooth_trans = mat.roughness < SMOOTH_TRANS_ROUGHNESS
    trans = jnp.where(is_smooth_trans, 0.0,
                      alb_lum * one_m_metal * mat.translucency * (1.0 / jnp.pi))
    f_lum = jnp.where(reflect_side, diff + spec,
                      jnp.where(trans_side, trans, 0.0))

    # pdf proxy: equal diffuse/GGX mixture (no lobe-probability divides);
    # GGX half reuses d_base (= D/(4 cos_oh))
    pdf_spec = jnp.where(is_mirror, 0.0, d_base * cos_h)
    pdf = jnp.where(
        reflect_side,
        0.5 * jnp.maximum(cos_i, 0.0) * (1.0 / jnp.pi) + 0.5 * pdf_spec,
        jnp.where(trans_side & ~is_smooth_trans,
                  jnp.maximum(-cos_i, 0.0) * (1.0 / jnp.pi), 0.0))
    return f_lum, pdf


def sample(mat: Material, n, wo, u1, u2, u3) -> BsdfSample:
    """Sample an outgoing direction (Bsdf.h:401-537 DisneyBSDFSample).

    u1 selects the lobe, (u2, u3) sample within it.  All lobes are computed
    and the result selected — branchless wavefront style.
    """
    t, bt = m.orthonormal_basis(n)
    cos_o = jnp.maximum(m.dot(n, wo), MIN_COS)

    alpha = jnp.maximum(mat.roughness, ROUGHNESS_THRESHOLD) ** 2
    alpha2 = alpha * alpha
    f0r, f0g, f0b = _f0(mat)
    f0_avg = (f0r + f0g + f0b) / 3.0
    p_diff, p_spec, p_trans = _lobe_probs(mat, _schlick(f0_avg, cos_o))

    # --- lobe 0: cosine diffuse ---
    wi_d_local = m.cosine_sample_hemisphere(u2, u3)
    wi_d = m.from_local(wi_d_local, t, bt, n)

    # --- lobe 1: GGX half-vector ---
    phi = 2.0 * jnp.pi * u2
    cos_h = jnp.sqrt(jnp.clip((1.0 - u3) / (1.0 + (alpha2 - 1.0) * u3), 0.0, 1.0))
    sin_h = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_h * cos_h))
    h_local = (sin_h * jnp.cos(phi), sin_h * jnp.sin(phi), cos_h)
    h = m.from_local(h_local, t, bt, n)
    wi_s = m.reflect(m.neg(wo), h)

    # mirror shortcut for sub-threshold roughness
    is_mirror = mat.roughness < ROUGHNESS_THRESHOLD
    wi_mirror = m.reflect(m.neg(wo), n)
    wi_s = m.where3(is_mirror, wi_mirror, wi_s)

    # --- lobe 2: transmission --- diffuse flip for rough translucents
    # (leaves), straight-through delta for smooth ones (glass/water,
    # Bsdf.h:94-118 specular transmission role)
    smooth_trans = mat.roughness < SMOOTH_TRANS_ROUGHNESS
    wi_t = m.where3(smooth_trans, m.neg(wo), m.neg(wi_d))

    # --- select lobe by u1 ---
    sel_spec = u1 < p_spec
    sel_trans = (~sel_spec) & (u1 < p_spec + p_trans)
    wi = m.where3(sel_spec, wi_s, m.where3(sel_trans, wi_t, wi_d))

    delta_trans = sel_trans & smooth_trans
    delta = (sel_spec & is_mirror) | delta_trans

    f, pdf = evaluate(mat, n, wo, wi)
    cos_i = jnp.abs(m.dot(n, wi))
    safe_pdf = jnp.maximum(pdf, 1e-8)
    w_rough = tuple(jnp.clip(fc * cos_i / safe_pdf, 0.0, MAX_THROUGHPUT) for fc in f)

    # delta mirror: weight = Fresnel (f/pdf collapses), pdf reported as 0
    Fd = (_schlick(f0r, cos_o), _schlick(f0g, cos_o), _schlick(f0b, cos_o))
    # energy balance: the mirror lobe is chosen with prob p_spec
    w_delta = tuple(jnp.clip(Fc / jnp.maximum(p_spec, MIN_LOBE_PROB), 0.0, MAX_THROUGHPUT)
                    for Fc in Fd)
    # delta transmission: albedo tint, normalized by the lobe probability
    trans_w = mat.translucency * (1.0 - mat.metallic)
    w_dtrans = tuple(
        jnp.clip(a * trans_w / jnp.maximum(p_trans, MIN_LOBE_PROB),
                 0.0, MAX_THROUGHPUT) for a in mat.albedo)

    weight = tuple(
        jnp.where(delta_trans, wt, jnp.where(delta, wd, wr))
        for wt, wd, wr in zip(w_dtrans, w_delta, w_rough))
    valid = (pdf > 0.0) | delta
    weight = tuple(jnp.where(valid, w, 0.0) for w in weight)

    return BsdfSample(
        wi=wi,
        weight=weight,
        pdf=jnp.where(delta, 0.0, pdf),
        is_delta=delta,
        is_transmission=sel_trans,
    )
