"""Sky-model fidelity gates (VERDICT r3 item 9, tightened r5 item 5).

The engine now evaluates the SAME 10-channel Hosek–Wilkie spectral model the
reference uses (Sky.cu:19-260 + SkyData.h datasets, extracted to
data/assets/skydata.npz): exact in numpy at sun-change time, per-pixel via
the 12-function RGB basis fit (render/sky_spectral.py).  The gates here pin

1. the per-pixel basis fit against the EXACT reference model (≤10% on every
   gate ratio, measured ≤1% — VERDICT r4 "Done" bar), and
2. the absolute clear-sky invariants (horizon/circumsolar structure,
   direct/diffuse split) so a regression in the fit, the scalar pack or the
   engine scaling shows up as a broken ratio rather than unquantified drift.

Measured values (docs/SKY_FIDELITY.md, r5): h/z 1.86 / 2.10 / 0.97,
circumsolar(10°)/zenith 36.6 / 14.6 / 3.9, direct/diffuse 1.2 / 4.6 / 7.8
at sun elevation 10/30/60°.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from rtvb_tpu.core.config import SkySettings
from rtvb_tpu.render import sky as S
from rtvb_tpu.render import sky_spectral as ss


def _lum(rgb):
    return 0.2126 * rgb[0] + 0.7152 * rgb[1] + 0.0722 * rgb[2]


def _state(elev_deg):
    # time-of-day with a zero axis tilt puts the sun at exactly this
    # elevation (sky.sun_direction: dir = (cos h', sin h', 0))
    tod = (np.deg2rad(elev_deg) + np.pi / 2) * 24.0 / (2.0 * np.pi)
    return S.make_sky_state(SkySettings(time_of_day=float(tod),
                                        sun_axis_angle=0.0))


def _gate_dirs(elev_deg):
    """(zenith, horizon, circumsolar-10°) unit directions."""
    e = np.deg2rad(elev_deg)
    g = np.deg2rad(10)
    ns = np.array([np.cos(e), np.sin(e), 0.0]) * np.cos(g) \
        + np.array([0.0, 0.0, 1.0]) * np.sin(g)
    dirs = np.stack([[0, 1, 0], [0, 0.02, 0.9998], ns / np.linalg.norm(ns)])
    return dirs / np.linalg.norm(dirs, axis=1, keepdims=True)


def _ratios(st, elev_deg):
    dirs = _gate_dirs(elev_deg)
    d = tuple(jnp.asarray(dirs[:, k], jnp.float32) for k in range(3))
    lum = np.asarray(_lum(S.sky_radiance(d, st)))
    return lum[1] / lum[0], lum[2] / lum[0]


def _ratios_exact(st, elev_deg):
    dirs = _gate_dirs(elev_deg)
    sd = np.array([float(v) for v in st.sun_dir])
    lum = ss.sky_radiance_exact(dirs, sd) @ [0.2126, 0.7152, 0.0722]
    return lum[1] / lum[0], lum[2] / lum[0]


@pytest.mark.parametrize("elev", [10, 30, 60])
def test_basis_matches_reference_model(elev):
    """The per-pixel basis eval reproduces the exact reference-model gate
    ratios within 10% (measured ≤1%) — the VERDICT r4 item-5 'Done' bar."""
    st = _state(elev)
    hz, circ = _ratios(st, elev)
    hz_e, circ_e = _ratios_exact(st, elev)
    assert abs(hz / hz_e - 1.0) < 0.10, (elev, hz, hz_e)
    assert abs(circ / circ_e - 1.0) < 0.10, (elev, circ, circ_e)


@pytest.mark.parametrize("elev,hz_band,circ_band", [
    (10, (1.4, 2.5), (25.0, 50.0)),
    (30, (1.6, 2.8), (10.0, 20.0)),
    (60, (0.7, 1.3), (2.5, 6.0)),
])
def test_horizon_and_circumsolar_ratios(elev, hz_band, circ_band):
    """Clear-sky gradients of the Hosek model: horizon brightening, strong
    circumsolar peaking that relaxes as the sun rises."""
    hz, circ = _ratios(_state(elev), elev)
    assert hz_band[0] < hz < hz_band[1], (elev, hz)
    assert circ_band[0] < circ < circ_band[1], (elev, circ)


def test_circumsolar_monotonic_in_elevation():
    """The circumsolar peak relaxes monotonically as the sun rises.  (The
    horizon/zenith ratio is NOT monotonic in the Hosek model — it peaks near
    30° — which the per-elevation bands above pin instead.)"""
    c = [_ratios(_state(e), e)[1] for e in (10, 30, 60)]
    assert c[0] > c[1] > c[2]


@pytest.mark.parametrize("elev,band", [
    (10, (0.6, 2.2)), (30, (2.5, 7.5)), (60, (4.5, 12.0)),
])
def test_direct_diffuse_split(elev, band):
    """Sun vs sky irradiance on a horizontal surface: the spectral solar
    datasets give clear-sky direct/diffuse ≈ 1.2 / 4.6 / 7.8 at 10/30/60°
    (sunnier than the old Preetham substitute — matching the reference's
    physical solar radiance, Sky.cu:176-256)."""
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


def test_sun_disk_limb_profile():
    """The sun-disk polynomial is the EXACT spectral projection: center
    brighter than rim, rim a small positive fraction of center, and the
    kernel cone twin agrees with the full direction eval."""
    st = _state(45)
    sd = np.array([float(v) for v in st.sun_dir])
    perp = np.cross(sd, [0, 1, 0])
    perp /= np.linalg.norm(perp)
    cos_r = float(st.cos_sun_radius)
    th_r = np.arccos(cos_r)
    vals = []
    for f in (0.0, 0.5, 0.98):
        dd = np.cos(th_r * f) * sd + np.sin(th_r * f) * perp
        dt = tuple(jnp.asarray(np.array([v], np.float32)) for v in dd)
        vals.append(float(_lum([v[0] for v in S.sun_radiance(dt, st)])))
    assert vals[0] > vals[1] > vals[2] > 0.0, vals
    assert vals[2] < 0.5 * vals[0]           # real limb darkening at the rim
    # cone shortcut parity (u1 ↔ rim fraction of the cone sample)
    u1 = jnp.asarray(np.linspace(0, 1, 9, dtype=np.float32))
    fast = np.stack([np.asarray(v) for v in S.sun_radiance_cone(u1, st)], -1)
    cg = 1.0 - np.asarray(u1) * (1.0 - cos_r)
    sf = S.sky_scalar_pack(st, False)
    sin_t = np.sqrt(np.maximum(0.0, 1.0 - cg * cg))
    twin = np.stack([np.asarray(v) for v in
                     S.sun_radiance_scalars_cone(jnp.asarray(sin_t), sf)], -1)
    np.testing.assert_allclose(twin, fast, rtol=2e-3, atol=1e-2)
