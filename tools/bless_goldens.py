"""Regenerate the committed golden images after an INTENTIONAL estimator
change (the reference's workflow: re-run mainOffline's test scenes and
commit the new goldens, mainOffline.cpp:423-498).

Usage:
    python tools/bless_goldens.py            # 128² canonical + 96² scripted
    python tools/bless_goldens.py --full     # also the 512² 64-frame canonical
                                             # and the flythrough golden (slow)

Renders with the SAME code paths the tests use (tests/test_render.py::
test_golden_canonical, tests/test_scripted_goldens.py), writes into
data/canonical/, and prints an RMSE/SSIM line against the previous golden so
the re-bless is an explicit, reviewable step — eyeball the images before
committing.
"""
from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# EXACT test environment (tests/conftest.py): goldens must be blessed under
# the same XLA config the tests compile with — the 1-spp estimator is
# numerically chaotic, so even reassociation differences between compiles
# (e.g. a different host device count) change the noise pattern wholesale.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

CANON = os.path.join(os.path.dirname(__file__), "..", "data", "canonical")


def _report(path, img):
    """img: u8 or float [0,1] — image_diff.compare normalizes either."""
    import numpy as np
    from rtvb_tpu.utils import image, image_diff
    if os.path.exists(path):
        old = image.read_png(path)
        if old.shape == np.asarray(img).shape:
            res = image_diff.compare(img, old)
            print(f"  vs old: rmse={res.rmse:.2f} ssim={res.ssim:.4f} "
                  f"({res.verdict})")
    image.write_png(path, img)
    print(f"  blessed {os.path.relpath(path)}")


def bless_canonical_128():
    import numpy as np
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.render.renderer import Engine
    print("canonical 128² (8-frame accumulation)...")
    eng = Engine(settings=Settings(), width=128, height=128)
    out = None
    for _ in range(8):
        out = eng.render_accumulated()
    _report(os.path.join(CANON, "canonical_render.png"), out)


def bless_scripted():
    from rtvb_tpu.apps import offline
    from rtvb_tpu.utils import image
    import tempfile
    cases = [("sequence", "--test-sequence", 12),
             ("remove20", "--test-remove20", 44),
             ("remove_circle", "--test-remove-circle", 44)]
    for name, flag, frames in cases:
        print(f"scripted golden {name} ({frames} frames @96²)...")
        with tempfile.TemporaryDirectory() as td:
            rc = offline.main(["--width", "96", "--height", "96",
                               "--frames", str(frames), "--out-dir", td, flag])
            assert rc == 0, (name, rc)
            img = image.read_png(os.path.join(td, f"frame_{frames:04d}.png"))
        _report(os.path.join(CANON, "scripted", f"{name}_final.png"), img)


def bless_flythrough():
    import numpy as np
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.render.renderer import Engine
    from rtvb_tpu.utils.flypath import apply_flythrough
    print("flythrough mid-flight golden (17 realtime frames @96²)...")
    eng = Engine(settings=Settings(), width=96, height=96)
    pos0 = yaw0 = None
    out = None
    for i in range(17):
        pos0, yaw0 = apply_flythrough(eng, i, 24, pos0, yaw0)
        out = eng.render_realtime()
    _report(os.path.join(CANON, "scripted", "flythrough_f16.png"), out)


def bless_canonical_procedural():
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.render.renderer import Engine
    print("procedural-stack canonical 128² (8-frame accumulation)...")
    s = Settings().replace(rendering={"authored_textures": False})
    eng = Engine(settings=s, width=128, height=128)
    out = None
    for _ in range(8):
        out = eng.render_accumulated()
    _report(os.path.join(CANON, "canonical_procedural.png"), out)


def bless_character_reflection():
    """Character standing beside the mirror shader ball (roughness 0 at
    x=30 of the ball row, world/gen.py): the golden pins entities appearing
    in SECONDARY rays (entity_in_bounces, OptixRenderer's all-geometry IAS
    role)."""
    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.models.character import Character
    from rtvb_tpu.render.renderer import Engine
    print("character-in-reflection golden (8-frame accumulation @128²)...")
    import numpy as np
    eng = Engine(settings=Settings(), width=128, height=128)
    ch = Character(cfg_world=eng.cfg, move=eng.settings.character_movement)
    # beside the mirror shader ball at (30, 7, 43)
    ch.position = np.array([31.5, 8.0, 45.0], np.float32)
    ch._update_pose()
    eng.add_entity(ch.entity)
    eng.set_camera(pos=(33.5, 8.6, 46.5), yaw=3.95, pitch=-0.25)
    out = None
    for _ in range(8):
        out = eng.render_accumulated()
    _report(os.path.join(CANON, "scripted", "character_reflection.png"), out)


def bless_canonical_512():
    from rtvb_tpu.apps import offline
    from rtvb_tpu.utils import image
    import tempfile
    print("canonical 512² (64-frame convergence — slow)...")
    with tempfile.TemporaryDirectory() as td:
        rc = offline.main(["--width", "512", "--height", "512",
                           "--frames", "64", "--out-dir", td])
        assert rc == 0
        img = image.read_png(os.path.join(td, "frame_0064.png"))
    _report(os.path.join(CANON, "canonical_512.png"), img)


def main():
    full = "--full" in sys.argv
    bless_canonical_128()
    bless_canonical_procedural()
    bless_character_reflection()
    bless_scripted()
    bless_flythrough()
    if full:
        bless_canonical_512()
    print("done — eyeball the new goldens, then commit data/canonical/.")


if __name__ == "__main__":
    main()
