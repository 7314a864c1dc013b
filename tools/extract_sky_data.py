#!/usr/bin/env python3
"""Extract the public Hosek–Wilkie sky-model datasets into data/assets/skydata.npz.

The reference ships the published Hosek–Wilkie fitted datasets (spectral sky
configuration/radiance beziers, solar-disk radiance piecewise polynomials and
limb-darkening coefficients — Hosek & Wilkie 2012/2013, public data) embedded
as C arrays in renderer/sky/SkyData.h plus the CIE spectral→XYZ projection
weights (Sky.cu:87-131).  This tool parses the numeric data (data only — no
code) into a compressed npz consumed by rtvb_tpu/render/sky_spectral.py.

Layouts (C source → npz):
  skyDataSets        (540,) → sky_config (10, 6, 9): channel × elevation-knot
                      × param; getFittingData indexes elevMatrix[i + 9*k]
  skyDataSetsRad     (60,)  → sky_rad (10, 6): channel × elevation-knot
  hSolarDatasets     (1800,)→ solar (10, 180): channel × (45 pieces × 4 coefs)
  hLimbDarkening     (60,)  → limb (10, 6)
  spectrumCieX/Y/Z   (10,)×3→ cie_xyz (3, 10) / CIE_Y_integral
plus xyz_to_rgb (3, 3): the sRGB D65 matrix (ColorSpace.h:21-24).

Run from the repo root:  python tools/extract_sky_data.py [path/to/SkyData.h]
"""
import re
import sys

import numpy as np

DEFAULT_SRC = "/root/reference/renderer/sky/SkyData.h"
OUT = "data/assets/skydata.npz"

XYZ_TO_RGB = np.array([
    [3.2404542, -1.5371385, -0.4985314],
    [-0.9692660, 1.8760108, 0.0415560],
    [0.0556434, -0.2040259, 1.0572252],
], np.float32)

CIE_Y_INTEGRAL = 106.856895


def parse_array(src: str, name: str) -> np.ndarray:
    m = re.search(re.escape(name) + r"\[\]\s*=\s*\{(.*?)\};", src, re.S)
    if m is None:
        raise KeyError(name)
    body = re.sub(r"//[^\n]*", "", m.group(1))
    vals = [float(v.rstrip("f")) for v in re.split(r"[,\s]+", body) if v]
    return np.asarray(vals, np.float32)


def main(argv):
    src_path = argv[1] if len(argv) > 1 else DEFAULT_SRC
    src = open(src_path).read()
    sky_config = parse_array(src, "skyDataSets").reshape(10, 6, 9)
    sky_rad = parse_array(src, "skyDataSetsRad").reshape(10, 6)
    solar = parse_array(src, "hSolarDatasets").reshape(10, 180)
    limb = parse_array(src, "hLimbDarkeningDatasets").reshape(10, 6)
    cie = np.stack([parse_array(src, "spectrumCie" + c) for c in "XYZ"])
    assert cie.shape == (3, 10)
    np.savez_compressed(
        OUT, sky_config=sky_config, sky_rad=sky_rad, solar=solar, limb=limb,
        cie_xyz=cie, xyz_to_rgb=XYZ_TO_RGB,
        cie_y_integral=np.float32(CIE_Y_INTEGRAL))
    print(f"wrote {OUT}: sky_config{sky_config.shape} sky_rad{sky_rad.shape} "
          f"solar{solar.shape} limb{limb.shape}")


if __name__ == "__main__":
    main(sys.argv)
