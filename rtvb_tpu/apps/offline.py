"""Offline headless renderer CLI — voxelgame_offline equivalent.

Parity with mainOffline.cpp: CLI flags (--width/--height/--scene/--frames/
--test-canonical/--update-canonical/--test-sequence/--test-remove20/
--test-remove-circle, mainOffline.cpp:57-133), N-frame accumulation loop
saving frames {1,4,16,64} (mainOffline.cpp:273-408), canonical-image diff
with verdicts + perf report append (mainOffline.cpp:417-498,
OfflineBackend.cpp renderFrame stage instrumentation).

Scripted interaction sequences exercise the dynamic-geometry/light path
deterministically (VoxelEngine::configureOfflineClickSequence role).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..assets import blocks as B
from ..core.config import Settings
from ..core.scene import SceneConfig
from ..render.renderer import Engine
from ..utils import image, image_diff
from ..utils.perf import PerformanceTracker

SAVE_FRAMES = (1, 4, 16, 64)
DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "data")


def build_argparser():
    ap = argparse.ArgumentParser("rtvb-offline", description=__doc__)
    ap.add_argument("--width", type=int, default=720)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--scene", type=str, default=None, help="scene YAML path")
    ap.add_argument("--settings", type=str, default=None, help="settings YAML path")
    ap.add_argument("--out-dir", type=str, default=os.path.join(DATA_DIR, "frames"))
    ap.add_argument("--canonical", type=str,
                    default=os.path.join(DATA_DIR, "canonical", "canonical_render.png"))
    ap.add_argument("--test-canonical", action="store_true",
                    help="compare final frame against the canonical image")
    ap.add_argument("--update-canonical", action="store_true",
                    help="re-bless the canonical image from this run")
    ap.add_argument("--test-sequence", action="store_true",
                    help="scripted: place light frame 2, remove frame 5, place frame 8")
    ap.add_argument("--test-remove20", action="store_true",
                    help="scripted: 20 block deletions across the run")
    ap.add_argument("--test-remove-circle", action="store_true",
                    help="scripted: 8 camera directions x 5 deletions")
    ap.add_argument("--authored", action="store_true",
                    help="render with authored PBR textures (the r5 default "
                         "— kept as an explicit no-op for older scripts)")
    ap.add_argument("--procedural", action="store_true",
                    help="render with the procedural texture stack "
                         "(rendering.authored_textures=False; pair with "
                         "--canonical data/canonical/canonical_procedural.png)")
    ap.add_argument("--realtime", action="store_true",
                    help="use the 1spp+denoiser path instead of accumulation")
    ap.add_argument("--save-all", action="store_true", help="save every frame")
    ap.add_argument("--perf-report", type=str, default=None,
                    help="append the run's stage rows to this ledger file "
                         "(opt-in: ad-hoc CPU runs are compile-dominated "
                         "noise and must not pollute the committed "
                         "data/perf/performance_report.txt)")
    ap.add_argument("--label", type=str, default="offline run")
    ap.add_argument("--platform", type=str, default=None, choices=("cpu", "tpu"),
                    help="force a jax platform (goldens are CPU-rendered; "
                         "note: the axon plugin ignores JAX_PLATFORMS env)")
    return ap


def scripted_edits(engine: Engine, frame: int, args) -> bool:
    """Returns True if the world changed this frame (resets accumulation)."""
    changed = False
    if args.test_sequence:
        # place light / remove / place (mainOffline.cpp:377-395)
        spot = (34, 10, 40)
        if frame == 2:
            engine.set_block(*spot, B.LANTERN)
            changed = True
        elif frame == 5:
            engine.delete_block(*spot)
            changed = True
        elif frame == 8:
            engine.set_block(*spot, B.LANTERN)
            changed = True
    if args.test_remove20 and frame in range(2, 42, 2):
        k = (frame - 2) // 2
        x = 20 + (k % 10) * 2
        z = 30 + (k // 10) * 3
        h = int(np.asarray(engine.world.blocks[x, :, z] != 0).nonzero()[0].max())
        engine.delete_block(x, h, z)
        changed = True
    if args.test_remove_circle and frame in range(2, 42, 1):
        k = frame - 2
        direction = k // 5
        yaw = direction * (2 * np.pi / 8)
        engine.set_camera(yaw=yaw, pitch=-0.5)
        hit, (x, y, z), _ = engine.pick_block(max_dist=20.0)
        if hit:
            engine.delete_block(x, y, z)
        changed = True
    return changed


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    settings = Settings.load(args.settings) if args.settings else Settings()
    rend = {"render_width": args.width, "render_height": args.height}
    if args.authored:
        rend["authored_textures"] = True
    if args.procedural:
        rend["authored_textures"] = False
    settings = settings.replace(rendering=rend)
    scene = SceneConfig.load(args.scene) if args.scene else SceneConfig()

    engine = Engine(settings=settings, scene=scene,
                    width=args.width, height=args.height)
    os.makedirs(args.out_dir, exist_ok=True)

    perf = PerformanceTracker()
    final = None
    batch_paths, batch_frames = [], []
    for frame in range(1, args.frames + 1):
        perf.begin_frame()
        with perf.segment("scenePrep"):
            if scripted_edits(engine, frame, args) and not args.realtime:
                engine.reset_accumulation()
        if args.realtime:
            out = perf.timed("pathTracing", engine.render_realtime)
        else:
            out = perf.timed("pathTracing", engine.render_accumulated)
        perf.end_frame()
        final = out
        if args.save_all or frame in SAVE_FRAMES or frame == args.frames:
            # batch in host RAM, encode in parallel at exit
            # (OfflineBackend.cpp:133-184 storeFrameInBatch +
            # writeAllBatchedFrames with std::execution::par)
            path = os.path.join(args.out_dir, f"frame_{frame:04d}.png")
            batch_paths.append(path)
            batch_frames.append(np.asarray(out))
            print(f"[offline] frame {frame}/{args.frames} -> {path}")
        else:
            print(f"[offline] frame {frame}/{args.frames}")
    image.write_pngs(batch_paths, batch_frames)

    if args.perf_report:
        perf.save_report(args.perf_report,
                         f"{args.label} {args.width}x{args.height}")
    print("[offline]", perf.summary_row(args.label))

    if args.update_canonical:
        os.makedirs(os.path.dirname(args.canonical), exist_ok=True)
        image.write_png(args.canonical, final)
        print(f"[offline] canonical updated: {args.canonical}")
    if args.test_canonical:
        if not os.path.exists(args.canonical):
            print("[offline] NO CANONICAL IMAGE — run --update-canonical first")
            return 2
        golden = image.read_png(args.canonical)
        res = image_diff.compare(final, golden)
        print("[offline] canonical test:", res)
        diff_img = image_diff.amplified_diff(image.to_u8(final), golden)
        image.write_png(os.path.join(args.out_dir, "canonical_diff.png"), diff_img)
        return 0 if res.verdict in ("identical", "veryClose", "close") else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
