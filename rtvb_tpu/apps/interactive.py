"""Interactive frame driver — the `voxelgame` (windowed) equivalent.

Capability parity with renderer/core/Backend.{h,cpp} (frame loop: timer with
FPS limiter → history camera → sky update → dynamic resolution → input →
render → denoise → post → display) and ui/ (GameUIManager 4-state machine
MainMenu/NewGame/LoadGame/Gameplay) plus DeveloperGUIOverlay (live stats).

There is no windowing system on a TPU host; the presenter abstraction covers
what CUDA↔GL interop did: `PngPresenter` streams frames to disk, `null` just
drives the loop (benchmarks), and anything with a socket can subclass
Presenter.  Input comes from an InputSource (scripted for tests/benchmarks,
stdin-keyboard optional).
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from dataclasses import dataclass

import numpy as np

from ..core.config import Settings
from ..core.controllers import InputHandler, InputState, CameraPose
from ..core.scene import SceneConfig
from ..models.character import Character
from ..render.renderer import Engine
from ..utils import image
from ..utils.perf import FrameTimer, PerformanceTracker
from ..world.persistence import WorldStore

# ---------------------------------------------------------------------------
# UI state machine (GameUIState.h:3-9)
# ---------------------------------------------------------------------------

MAIN_MENU, NEW_GAME, LOAD_GAME, GAMEPLAY = range(4)
STATE_NAMES = {MAIN_MENU: "MainMenu", NEW_GAME: "NewGame",
               LOAD_GAME: "LoadGame", GAMEPLAY: "Gameplay"}


class GameUI:
    """Headless UI state machine (GameUIManager role): menu → world select /
    create → gameplay; drives world lifecycle hooks.

    Navigation (GameUIManager.cpp:698-788 GLFW event routing role): a
    cursor over the current state's item list, driven by InputState
    menu_up/menu_down/menu_select/menu_back — so every transition the
    programmatic `menu_action` API offers is reachable from the keyboard."""

    def __init__(self, store: WorldStore):
        self.state = MAIN_MENU
        self.store = store
        self.selected_world: str | None = None
        self.cursor = 0
        self.quit_requested = False

    # ---- keyboard navigation -------------------------------------------

    def menu_items(self) -> list[tuple[str, str, str | None]]:
        """(label, action, world) rows for the current state's screen."""
        if self.state == MAIN_MENU:
            items = []
            if self.store.last_world():
                items.append(("CONTINUE", "continue", None))
            items += [("NEW GAME", "new", None), ("LOAD GAME", "load", None),
                      ("QUIT", "quit", None)]
            return items
        if self.state == NEW_GAME:
            return [("CREATE", "select", None), ("BACK", "back", None)]
        if self.state == LOAD_GAME:
            worlds = self.store.list_worlds()
            return [(w.upper(), "select", w) for w in worlds] + \
                [("BACK", "back", None)]
        return []

    def navigate(self, delta: int) -> None:
        n = len(self.menu_items())
        if n:
            self.cursor = (self.cursor + delta) % n

    def activate(self):
        """Trigger the item under the cursor (Enter).  Returns the new
        state; sets quit_requested for the QUIT item."""
        items = self.menu_items()
        if not items:
            return self.state
        label, action, world = items[min(self.cursor, len(items) - 1)]
        if action == "quit":
            self.quit_requested = True
            return self.state
        if self.state == NEW_GAME and action == "select":
            world = world or "default"
        prev = self.state
        out = self.menu_action(action, world)
        if out != prev:
            self.cursor = 0
        return out

    def back(self):
        """Escape: back out of submenus, or open the menu from gameplay."""
        prev = self.state
        out = self.menu_action("back" if self.state in (NEW_GAME, LOAD_GAME)
                               else "menu")
        if out != prev:
            self.cursor = 0
        return out

    def menu_action(self, action: str, world_name: str | None = None):
        if self.state == MAIN_MENU:
            if action == "new":
                self.state = NEW_GAME
            elif action == "load":
                self.state = LOAD_GAME
            elif action == "continue" and self.store.last_world():
                self.selected_world = self.store.last_world()
                self.state = GAMEPLAY
        elif self.state in (NEW_GAME, LOAD_GAME):
            if action == "select":
                self.selected_world = world_name
                self.state = GAMEPLAY
            elif action == "back":
                self.state = MAIN_MENU
        elif self.state == GAMEPLAY and action == "menu":
            self.state = MAIN_MENU
        return self.state


# ---------------------------------------------------------------------------
# Presenters (display abstraction; Backend CUDA↔GL PBO role)
# ---------------------------------------------------------------------------

class Presenter:
    """Frames arrive as DEVICE arrays (u8 RGB) — the frame loop never copies
    pixels to host (the reference's CUDA→GL interop contract,
    Backend.cpp:454-485); presenters pull with np.asarray only when they
    actually consume pixels."""

    def present(self, frame, index: int):
        raise NotImplementedError

    def close(self):
        pass


class NullPresenter(Presenter):
    def present(self, frame, index):
        pass


class PngPresenter(Presenter):
    def __init__(self, out_dir: str, every: int = 1):
        self.out_dir = out_dir
        self.every = every
        os.makedirs(out_dir, exist_ok=True)

    def present(self, frame, index):
        if index % self.every == 0:
            image.write_png(os.path.join(self.out_dir, f"live_{index:05d}.png"),
                            np.asarray(frame))


# ---------------------------------------------------------------------------
# Dev overlay (DeveloperGUIOverlay.cpp:33-90: live stats + settings list)
# ---------------------------------------------------------------------------

def dev_overlay_text(engine: Engine, timer: FrameTimer, cam_pose: CameraPose,
                     render_w: int) -> str:
    lines = [
        f"FPS {timer.fps:6.1f} | frame {engine.frame_index} | "
        f"render {engine.width}x{engine.height} "
        f"-> {engine.out_width}x{engine.out_height} "
        f"(scale {engine.render_scale:.2f})",
        f"cam ({cam_pose.pos[0]:.2f}, {cam_pose.pos[1]:.2f}, {cam_pose.pos[2]:.2f}) "
        f"yaw {cam_pose.yaw:.2f} pitch {cam_pose.pitch:.2f}",
        f"lights {int(engine.lights.count)} | exceptions "
        f"{int((np.asarray(engine.world.exc_key) < (1 << 30)).sum())}",
    ]
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Input sources (InputHandler.h GLFW-callback role, headless)
# ---------------------------------------------------------------------------

class StdinInputSource:
    """Line-oriented keyboard input over stdin (the headless stand-in for
    GLFW key callbacks, InputHandler.h:19-95).  Non-blocking: reads whatever
    lines arrived since the last frame.  Commands (one or more per line):

      w/s/a/d  move    q/e   descend/ascend     j/l  yaw    i/k  pitch
      r        toggle run    空 (space)  jump
      x        left click (dig)     b    right click (place)
      1-9      select block id      c    toggle camera mode
      F3       toggle dev panel     F5/F9 save/load world    quit exit
      up/down/enter/esc   menu navigation (GameUI cursor)
      n        dev panel: next field    +/-   adjust selected field
    """

    def __init__(self, stream=None):
        self.stream = stream if stream is not None else sys.stdin
        self.run_held = False
        self.selected = 1

    def _pending_lines(self):
        import select
        lines = []
        try:
            while True:
                r, _, _ = select.select([self.stream], [], [], 0.0)
                if not r:
                    break
                line = self.stream.readline()
                if not line:
                    break
                lines.append(line.strip())
        except (OSError, ValueError):
            pass
        return lines

    def __call__(self, frame: int) -> InputState:
        inp = InputState(run=self.run_held, selected_block=self.selected)
        for line in self._pending_lines():
            for tok in line.split():
                if tok == "w":
                    inp.forward += 1.0
                elif tok == "s":
                    inp.forward -= 1.0
                elif tok == "a":
                    inp.strafe -= 1.0
                elif tok == "d":
                    inp.strafe += 1.0
                elif tok == "e":
                    inp.ascend += 1.0
                elif tok == "q":
                    inp.ascend -= 1.0
                elif tok == "j":
                    inp.mouse_dx -= 10.0
                elif tok == "l":
                    inp.mouse_dx += 10.0
                elif tok == "i":
                    inp.mouse_dy -= 10.0
                elif tok == "k":
                    inp.mouse_dy += 10.0
                elif tok == "r":
                    self.run_held = not self.run_held
                    inp.run = self.run_held
                elif tok == "space":
                    inp.jump = True
                elif tok == "x":
                    inp.left_click = True
                elif tok == "b":
                    inp.right_click = True
                elif tok == "c":
                    inp.toggle_camera_mode = True
                elif tok == "F3":
                    inp.toggle_dev_panel = True
                elif tok == "F5":
                    inp.save_world = True
                elif tok == "F9":
                    inp.load_world = True
                elif tok == "quit":
                    inp.quit = True
                elif tok == "up":
                    inp.menu_up = True
                elif tok == "down":
                    inp.menu_down = True
                elif tok == "enter":
                    inp.menu_select = True
                elif tok == "esc":
                    inp.menu_back = True
                elif tok == "n":
                    inp.dev_next_field = True
                elif tok == "+":
                    inp.dev_adjust = 1
                elif tok == "-":
                    inp.dev_adjust = -1
                elif tok.isdigit():
                    self.selected = int(tok)
                    inp.selected_block = self.selected
        return inp


# ---------------------------------------------------------------------------
# Dynamic resolution (Backend.cpp:191-232 role).  The reference steps render
# width by 16 px; under XLA every shape is a separate compilation, so the
# TPU-native controller walks a small ladder of fixed scale rungs — each rung
# compiles once (cached) and switching costs only a history reset.
# ---------------------------------------------------------------------------

class DynamicResolution:
    RUNGS = (1.0, 0.75, 2.0 / 3.0, 0.5)

    def __init__(self, target_fps: float, min_scale: float = 0.5,
                 start_scale: float = 1.0, hysteresis: int = 8):
        self.target = target_fps
        self.rungs = [r for r in self.RUNGS if r >= min_scale - 1e-6]
        self.idx = min(range(len(self.rungs)),
                       key=lambda i: abs(self.rungs[i] - start_scale))
        self.hysteresis = hysteresis
        self._streak = 0
        self._ema = None

    @property
    def scale(self) -> float:
        return self.rungs[self.idx]

    def update(self, frame_ms: float) -> float:
        """Feed one frame time; returns the scale to use next frame."""
        self._ema = frame_ms if self._ema is None else \
            0.8 * self._ema + 0.2 * frame_ms
        budget = 1000.0 / self.target
        if self._ema > budget * 1.08:
            self._streak = min(self._streak + 1, self.hysteresis)
        elif self._ema < budget * 0.55:
            self._streak = max(self._streak - 1, -self.hysteresis)
        else:
            self._streak = 0
        if self._streak >= self.hysteresis and self.idx + 1 < len(self.rungs):
            self.idx += 1
            self._streak = 0
            self._ema = None
        elif self._streak <= -self.hysteresis and self.idx > 0:
            self.idx -= 1
            self._streak = 0
            self._ema = None
        return self.rungs[self.idx]


# ---------------------------------------------------------------------------
# Main loop
# ---------------------------------------------------------------------------

@dataclass
class InteractiveApp:
    settings: Settings
    scene: SceneConfig
    presenter: Presenter
    store: WorldStore
    max_frames: int | None = None
    # True: jump straight into gameplay (benchmarks / scripted flythroughs,
    # the mainOffline-style drivers).  False: boot into MainMenu and let
    # InputState menu events drive the GameUI state machine — the
    # GameUIManager.cpp:698-788 interactive path.
    auto_start: bool = True
    # frames kept in flight on the device (Backend.cpp:101-189 async-stream
    # pipelining role): the loop submits frame N+k while frame N renders,
    # blocking only on the OLDEST pending frame.  Per-frame time for the
    # dynamic-resolution controller comes from COMPLETED-frame timestamps.
    # 1 = classic submit-then-block; 2 hides the host dispatch + tunnel
    # latency behind device render time (round-3 measured ~84 ms/frame at
    # 720p with per-frame blocking, dominated by serialized dispatch).
    frames_in_flight: int = 2

    def run(self, input_source=None):
        eng = Engine(settings=self.settings, scene=self.scene)
        ui = GameUI(self.store)
        if self.auto_start:
            ui.menu_action("new")
            ui.menu_action("select", "default")
        character = Character(cfg_world=eng.cfg,
                              move=self.settings.character_movement)
        character._update_pose()
        eng.add_entity(character.entity)
        handler = InputHandler(self.settings.camera_movement, mode="free")
        pose = CameraPose(np.array(self.scene.camera_pos, np.float32),
                          self.scene.camera_yaw, self.scene.camera_pitch)
        timer = FrameTimer(self.settings.rendering.target_fps)
        perf = PerformanceTracker()
        dynres = DynamicResolution(
            self.settings.rendering.target_fps,
            self.settings.rendering.min_render_scale,
            start_scale=eng.render_scale) \
            if self.settings.rendering.dynamic_resolution else None
        # graphical UI overlay (ui/GameUIManager + DeveloperGUIOverlay
        # roles): menus raster on state change, the dev panel twice a
        # second while toggled; eng composites the RGBA buffer on device
        from .. import ui as ui_gfx
        canvas = ui_gfx.OverlayCanvas(eng.out_height, eng.out_width)
        dev_panel = False
        ui_drawn_state = None
        dev_field = 0     # dev-panel selected settings field (reflection idx)
        inflight: list = []       # (frame index, device frame) pending
        last_done = None
        render_ms = 0.0
        frame = 0
        while self.max_frames is None or frame < self.max_frames:
            dt = timer.tick()
            inp = input_source(frame) if input_source else InputState()
            if inp.quit or ui.quit_requested:
                break
            in_menu = ui.state != GAMEPLAY
            if in_menu:
                # menu navigation (GameUIManager key routing role); movement
                # and edit input never reaches gameplay while a menu is up
                if inp.menu_up:
                    ui.navigate(-1)
                if inp.menu_down:
                    ui.navigate(1)
                if inp.menu_select:
                    ui.activate()
                if inp.menu_back:
                    ui.back()
                ui_drawn_state = None if (inp.menu_up or inp.menu_down
                                          or inp.menu_select or inp.menu_back) \
                    else ui_drawn_state
                inp = InputState(selected_block=inp.selected_block)
            elif inp.menu_back:
                ui.back()        # Escape in gameplay opens the main menu
                ui_drawn_state = None
            if dev_panel and (inp.dev_next_field or inp.dev_adjust):
                # live settings editing (DeveloperGUIOverlay sliders role):
                # +/- applies Settings.adjust to the selected field and the
                # engine recompiles-on-change (frozen-dataclass design)
                rows = self.settings.value_list()
                if inp.dev_next_field:
                    dev_field = (dev_field + 1) % len(rows)
                if inp.dev_adjust:
                    self.settings = self.settings.adjust(
                        rows[dev_field][0], inp.dev_adjust)
                    eng.apply_settings(self.settings)
                ui_drawn_state = None
            perf.begin_frame()
            with perf.segment("scenePrep"):
                pose = handler.update(pose, inp, dt, character)
                eng.set_camera(pos=tuple(map(float, pose.pos)),
                               yaw=pose.yaw, pitch=pose.pitch)
                if handler.mode != "free":
                    character.update(eng.world, dt,
                                     (inp.forward, inp.strafe), inp.run, inp.jump,
                                     inp.left_click)
                if inp.right_click:
                    hit, (x, y, z), n = eng.pick_block()
                    if hit:
                        eng.set_block(int(x + n[0]), int(y + n[1]), int(z + n[2]),
                                      inp.selected_block)
                if inp.left_click and handler.mode == "free":
                    hit, (x, y, z), _ = eng.pick_block()
                    if hit:
                        eng.delete_block(x, y, z)
                if inp.save_world:
                    self.store.save(ui.selected_world or "default", eng.cfg,
                                    eng.world,
                                    camera={"pos": [float(v) for v in pose.pos],
                                            "yaw": float(pose.yaw),
                                            "pitch": float(pose.pitch)})
            # device endpoint, pipelined: submit this frame, then block only
            # on the oldest in-flight frame (no per-frame host copy of the
            # frame buffer; presenters pull pixels only when consuming)
            out = perf.timed("pathTracing", eng.render_realtime_device, dt)
            import jax as _jax
            inflight.append((frame, out))
            while len(inflight) >= max(1, self.frames_in_flight) + 1 \
                    or (self.max_frames is not None
                        and frame == self.max_frames - 1 and inflight):
                done_idx, done_out = inflight.pop(0)
                _jax.block_until_ready(done_out)
                now = time.perf_counter()
                if last_done is not None:
                    # completed-frame throughput drives dynamic resolution
                    # (the reference's GPU-timer role, Backend.cpp:191-232)
                    render_ms = (now - last_done) * 1e3
                    if dynres is not None:
                        eng.set_render_scale(dynres.update(render_ms))
                last_done = now
                self.presenter.present(done_out, done_idx)
            perf.end_frame()
            if frame == 0 and (self.max_frames is None
                               or self.max_frames > 120):
                # background-compile the lights-on frame variant so the
                # first placed lantern doesn't hitch (renderer.warm_*).
                # Skipped for short scripted sessions: the daemon thread
                # would still be mid-compile at interpreter exit.
                eng.warm_light_variant_async()
            if inp.toggle_dev_panel:
                dev_panel = not dev_panel
                ui_drawn_state = None
            state_name = STATE_NAMES[ui.state]
            ui_key = (state_name, dev_panel, ui.cursor, dev_field,
                      frame // 15 if dev_panel else 0)
            if ui_key != ui_drawn_state:
                if state_name != "Gameplay":
                    ui_gfx.render_menu(canvas, state_name,
                                       self.store.list_worlds(),
                                       selected=ui.cursor,
                                       items=[r[0] for r in ui.menu_items()])
                elif dev_panel:
                    ui_gfx.render_dev_panel(canvas, self.settings, {
                        "fps": timer.fps, "frame_ms": render_ms,
                        "internal": (eng.width, eng.height),
                        "output": (eng.out_width, eng.out_height),
                        "cam": tuple(map(float, pose.pos)),
                        "yaw": float(pose.yaw), "pitch": float(pose.pitch)},
                        selected=dev_field)
                else:
                    canvas.clear()
                eng.set_ui_overlay(canvas.buf)
                ui_drawn_state = ui_key
            if frame % 30 == 0:
                print(dev_overlay_text(eng, timer, pose, eng.width))
            frame += 1
        # drain frames still in flight (quit path)
        import jax as _jax
        for done_idx, done_out in inflight:
            _jax.block_until_ready(done_out)
            self.presenter.present(done_out, done_idx)
        # autosave on quit (Backend.cpp:236-237)
        self.store.save(ui.selected_world or "default", eng.cfg, eng.world,
                        camera={"pos": [float(v) for v in pose.pos],
                                "yaw": float(pose.yaw), "pitch": float(pose.pitch)})
        return perf


def main(argv=None):
    ap = argparse.ArgumentParser("rtvb-interactive")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--out-dir", type=str, default=None,
                    help="stream frames as PNGs (default: no display)")
    ap.add_argument("--worlds-dir", type=str, default="data/savedata")
    ap.add_argument("--stdin-input", action="store_true",
                    help="drive the session from stdin key commands "
                         "(see StdinInputSource; default: scripted flythrough)")
    ap.add_argument("--platform", type=str, default=None,
                    choices=("cpu", "tpu"),
                    help="force a jax platform (headless CPU smoke runs; "
                         "note: the axon plugin ignores JAX_PLATFORMS env)")
    args = ap.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    settings = Settings().replace(rendering={
        "render_width": args.width, "render_height": args.height,
        # gameplay feedback: picked-block edge highlight lives in the
        # interactive config (VoxelEngine.cu:884-903 role)
        "block_highlight": True})
    presenter = PngPresenter(args.out_dir, every=10) if args.out_dir else NullPresenter()

    if args.stdin_input:
        source = StdinInputSource()
    else:
        # scripted flythrough input (deterministic; benchmark config 5)
        def source(frame):
            return InputState(forward=0.6, mouse_dx=2.0, run=False)

    app = InteractiveApp(settings=settings, scene=SceneConfig(),
                         presenter=presenter, store=WorldStore(args.worlds_dir),
                         max_frames=None if args.stdin_input else args.frames,
                         # keyboard sessions boot into the MainMenu and
                         # navigate with up/down/enter/esc; scripted
                         # flythroughs jump straight to gameplay
                         auto_start=not args.stdin_input)
    perf = app.run(source)
    print("[interactive]", perf.summary_row("flythrough"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
