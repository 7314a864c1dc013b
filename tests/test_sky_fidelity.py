"""Sky-model fidelity gates (VERDICT r3 item 9).

The reference uses a 10-channel Hosek-style spectral fit (Sky.cu:19-83 +
SkyData.h); this engine uses Preetham — a deliberate redesign.  These tests
bound the LOOK-relevant invariants both models share for a clear sky
(turbidity 2.5), so a regression in either the Perez evaluation or the
radiance scaling shows up as a broken ratio rather than an unquantified
drift.  Expected bands derive from the published behavior of both models
(horizon brightening, circumsolar peaking, direct/diffuse irradiance split)
and from the measured values of this implementation recorded in
docs/SKY_FIDELITY.md.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from rtvb_tpu.core.config import SkySettings
from rtvb_tpu.render import sky as S


def _lum(rgb):
    return 0.2126 * rgb[0] + 0.7152 * rgb[1] + 0.0722 * rgb[2]


def _state(elev_deg):
    base = S.make_sky_state(SkySettings())
    e = np.deg2rad(elev_deg)
    sd = (jnp.float32(np.cos(e)), jnp.float32(np.sin(e)), jnp.float32(0.0))
    return base._replace(sun_dir=sd)


def _ratios(elev_deg):
    st = _state(elev_deg)
    zen = float(_lum(S.sky_radiance(
        (jnp.zeros(()), jnp.ones(()), jnp.zeros(())), st)))
    hz = float(_lum(S.sky_radiance(
        (jnp.zeros(()), jnp.full((), 0.02), jnp.full((), 0.9998)), st)))
    g = np.deg2rad(10)
    e = np.deg2rad(elev_deg)
    ns = np.array([np.cos(e), np.sin(e), 0.0]) * np.cos(g) \
        + np.array([0.0, 0.0, 1.0]) * np.sin(g)
    ns /= np.linalg.norm(ns)
    circ = float(_lum(S.sky_radiance(tuple(jnp.float32(v) for v in ns), st)))
    return hz / zen, circ / zen


# measured (docs/SKY_FIDELITY.md): h/z 2.61 / 2.09 / 1.17,
# circumsolar(10°)/zenith 10.0 / 5.2 / 1.96 at sun elevation 10/30/60°
@pytest.mark.parametrize("elev,hz_band,circ_band", [
    (10, (1.8, 4.0), (6.0, 16.0)),
    (30, (1.4, 3.0), (3.0, 9.0)),
    (60, (0.9, 1.8), (1.3, 3.5)),
])
def test_horizon_and_circumsolar_ratios(elev, hz_band, circ_band):
    """Clear-sky gradients: horizon brighter than zenith (more at low sun),
    strong circumsolar peaking that relaxes as the sun rises — the shared
    qualitative shape of Preetham and the reference's Hosek fit."""
    hz, circ = _ratios(elev)
    assert hz_band[0] < hz < hz_band[1], (elev, hz)
    assert circ_band[0] < circ < circ_band[1], (elev, circ)


def test_ratios_monotonic_in_elevation():
    r10 = _ratios(10)
    r30 = _ratios(30)
    r60 = _ratios(60)
    assert r10[0] > r30[0] > r60[0]      # horizon ratio falls as sun rises
    assert r10[1] > r30[1] > r60[1]      # circumsolar peak relaxes


@pytest.mark.parametrize("elev,band", [
    (10, (0.8, 3.5)), (30, (2.0, 6.0)), (60, (3.0, 9.0)),
])
def test_direct_diffuse_split(elev, band):
    """Sun vs sky irradiance on a horizontal surface: clear-sky
    direct/diffuse ≈ 1.7 / 3.5 / 5.3 at 10/30/60° here (measured) — within
    the clear-sky range pyranometer references report (roughly 2-8 at high
    sun, approaching ~1 near the horizon)."""
    st = _state(elev)
    d = S.equal_area_dirs(128, 64)
    rgb = S.sky_radiance(d, st)
    omega = 2 * np.pi / (128 * 64)
    e_sky = float((np.asarray(_lum(rgb))
                   * np.maximum(np.asarray(d[1]), 0)).sum() * omega)
    e = np.deg2rad(elev)
    sun_rgb = S.sun_radiance(
        (jnp.float32(np.cos(e)), jnp.float32(np.sin(e)), jnp.float32(0.0)),
        st)
    omega_sun = 2 * np.pi * (1 - float(st.cos_sun_radius))
    e_sun = float(_lum(sun_rgb)) * omega_sun * np.sin(e) * 0.8  # mean limb
    ratio = e_sun / e_sky
    assert band[0] < ratio < band[1], (elev, ratio)
