"""Scripted-interaction golden gates — the dynamic-geometry/light path.

Reference regime: mainOffline.cpp:273-408 scripted click sequences
(--test-sequence: place light / remove / place; --test-remove20: 20
deletions; --test-remove-circle: 8 directions × 5 deletions), gated on
golden images (mainOffline.cpp:423-498).  Re-bless with
tools/bless_goldens.py after intentional estimator changes.
"""
import os

import pytest

from rtvb_tpu.apps import offline
from rtvb_tpu.utils import image, image_diff

# whole-frame / multi-frame jit compiles dominate a cold CPU run of this
# file; `pytest -m 'not slow'` is the <5-min default pass (README)
pytestmark = pytest.mark.slow

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "data",
                          "canonical", "scripted")

CASES = [
    ("sequence", "--test-sequence", 12),
    ("remove20", "--test-remove20", 44),
    ("remove_circle", "--test-remove-circle", 44),
]


@pytest.mark.parametrize("name,flag,frames", CASES)
def test_scripted_golden(tmp_path, name, flag, frames):
    golden_path = os.path.join(GOLDEN_DIR, f"{name}_final.png")
    if not os.path.exists(golden_path):
        pytest.skip(f"no golden for {name}")
    out = str(tmp_path / name)
    rc = offline.main(["--width", "96", "--height", "96",
                       "--frames", str(frames), "--out-dir", out, flag])
    assert rc == 0
    final = image.read_png(os.path.join(out, f"frame_{frames:04d}.png"))
    golden = image.read_png(golden_path)
    res = image_diff.compare(final.astype("float32") / 255.0, golden)
    assert res.verdict in ("identical", "veryClose", "close"), (name, str(res))


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="512² 64-frame canonical: set RUN_SLOW=1")
def test_canonical_512_64frames(tmp_path):
    """Full-strength canonical regression (the reference's primary gate:
    converged 64-frame image, mainOffline.cpp:423-498)."""
    golden_path = os.path.join(GOLDEN_DIR, "..", "canonical_512.png")
    if not os.path.exists(golden_path):
        pytest.skip("no 512² canonical committed")
    rc = offline.main(["--width", "512", "--height", "512", "--frames", "64",
                       "--out-dir", str(tmp_path / "c512"),
                       "--canonical", golden_path, "--test-canonical"])
    assert rc == 0


def test_flythrough_midflight_golden(tmp_path):
    """Moving-camera golden: 24 realtime frames along the shared flythrough
    path (utils/flypath — same path bench.py times), gating frame 16.
    A static camera flatters reprojection/ReSTIR; this locks the dynamic
    behavior (mainOffline.cpp:273-408 scripted-camera goldens role)."""
    import numpy as np
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.render.renderer import Engine
    from rtvb_tpu.utils.flypath import apply_flythrough

    golden_path = os.path.join(GOLDEN_DIR, "flythrough_f16.png")
    if not os.path.exists(golden_path):
        pytest.skip("no flythrough golden")
    eng = Engine(settings=Settings(), width=96, height=96)
    pos0 = yaw0 = None
    out = None
    for i in range(17):
        pos0, yaw0 = apply_flythrough(eng, i, 24, pos0, yaw0)
        out = eng.render_realtime()
    golden = image.read_png(golden_path)
    res = image_diff.compare(out, golden)
    assert res.verdict in ("identical", "veryClose", "close"), str(res)
