"""Interactive app: menu FSM, stdin input, dynamic resolution, and one real
frame-loop session with UI, edits and autosave (Backend.cpp mainloop +
GameUIManager + InputHandler roles)."""
import io
import os
import tempfile

import numpy as np
import pytest

from rtvb_tpu.apps.interactive import (DynamicResolution, GameUI,
                                       InteractiveApp, Presenter,
                                       StdinInputSource, GAMEPLAY, MAIN_MENU,
                                       NEW_GAME)
from rtvb_tpu.core.config import Settings
from rtvb_tpu.core.scene import SceneConfig
from rtvb_tpu.world.persistence import WorldStore

# whole-frame / multi-frame jit compiles dominate a cold CPU run of this
# file; `pytest -m 'not slow'` is the <5-min default pass (README)
pytestmark = pytest.mark.slow


def test_game_ui_state_machine(tmp_path):
    """GameUIState.h:3-9 transitions: menu → new/load → gameplay → menu."""
    ui = GameUI(WorldStore(str(tmp_path)))
    assert ui.state == MAIN_MENU
    assert ui.menu_action("new") == NEW_GAME
    assert ui.menu_action("back") == MAIN_MENU
    ui.menu_action("new")
    assert ui.menu_action("select", "alpha") == GAMEPLAY
    assert ui.selected_world == "alpha"
    assert ui.menu_action("menu") == MAIN_MENU
    # continue requires a last world
    assert ui.menu_action("continue") == MAIN_MENU


def test_game_ui_keyboard_navigation(tmp_path):
    """GameUIManager.cpp:698-788 key-routing role: every menu transition is
    reachable through the cursor (up/down/enter/esc), not just the
    programmatic menu_action API."""
    ui = GameUI(WorldStore(str(tmp_path)))
    # MainMenu (no last world): NEW GAME / LOAD GAME / QUIT
    labels = [r[0] for r in ui.menu_items()]
    assert labels == ["NEW GAME", "LOAD GAME", "QUIT"]
    ui.navigate(1)
    assert ui.cursor == 1
    ui.navigate(-1)
    assert ui.activate() == NEW_GAME            # enter on NEW GAME
    assert [r[0] for r in ui.menu_items()] == ["CREATE", "BACK"]
    ui.navigate(1)
    assert ui.back() == MAIN_MENU               # esc backs out
    ui.activate()                               # NEW GAME again
    assert ui.activate() == GAMEPLAY            # CREATE → gameplay
    assert ui.selected_world == "default"
    assert ui.back() == MAIN_MENU               # esc in gameplay → menu
    # QUIT item sets the flag instead of changing state
    ui.cursor = len(ui.menu_items()) - 1
    ui.activate()
    assert ui.quit_requested


def test_settings_adjust_reflection():
    """Settings.adjust — the dev panel's edit primitive: bool toggles,
    int steps, float scales; unknown strings untouched."""
    s = Settings()
    s2 = s.adjust("denoising.enabled", 1)
    assert s2.denoising.enabled is False
    s3 = s2.adjust("rendering.total_bounce_limit", 1)
    assert s3.rendering.total_bounce_limit == 4
    s4 = s3.adjust("tone_mapping.gain", 1)
    assert abs(s4.tone_mapping.gain - 1.25) < 1e-9
    assert s4.adjust("tone_mapping.curve", 1).tone_mapping.curve == "aces"


def test_stdin_input_source_parsing():
    src = StdinInputSource(stream=io.StringIO(""))
    lines = ["w d 3", "F3 F5", "space x b", "up down enter esc", "n +", "quit"]
    src._pending_lines = lambda: [lines.pop(0)] if lines else []
    i0 = src(0)
    assert i0.forward == 1.0 and i0.strafe == 1.0 and i0.selected_block == 3
    i1 = src(1)
    assert i1.toggle_dev_panel and i1.save_world
    i2 = src(2)
    assert i2.jump and i2.left_click and i2.right_click
    i3 = src(3)
    assert i3.menu_up and i3.menu_down and i3.menu_select and i3.menu_back
    i4 = src(4)
    assert i4.dev_next_field and i4.dev_adjust == 1
    assert src(5).quit


def test_dynamic_resolution_walks_rungs():
    """Backend.cpp:191-232 role: over budget → lower rung, headroom → raise,
    with hysteresis (no oscillation on borderline frames)."""
    dr = DynamicResolution(target_fps=60.0, min_scale=0.5, start_scale=1.0)
    s = 1.0
    for _ in range(50):
        s = dr.update(40.0)          # way over 16.7 ms budget
    assert s == 0.5
    for _ in range(200):
        s = dr.update(4.0)           # deep headroom
    assert s == 1.0
    # borderline: must not bounce every frame
    flips = 0
    prev = s
    for _ in range(60):
        s = dr.update(16.9)
        flips += (s != prev)
        prev = s
    assert flips <= 2


class _CollectPresenter(Presenter):
    def __init__(self):
        self.frames = []

    def present(self, frame, index):
        self.frames.append((index, np.asarray(frame)))


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="compiles a frame fn (~3 min CPU): RUN_SLOW=1")
def test_interactive_session_end_to_end(tmp_path):
    """A real 8-frame session: scripted input toggles the dev panel, digs a
    block, saves; frames render and the world autosaves on exit."""
    lines = ["F3", "w", "x", "F5", "", "", "", "quit"]
    src = StdinInputSource(stream=io.StringIO(""))
    src._pending_lines = lambda: [lines.pop(0)] if lines else []
    store = WorldStore(str(tmp_path / "worlds"))
    pres = _CollectPresenter()
    app = InteractiveApp(
        settings=Settings().replace(rendering={"render_width": 96,
                                               "render_height": 96,
                                               "dynamic_resolution": False}),
        scene=SceneConfig(), presenter=pres, store=store, max_frames=8)
    app.run(input_source=src)
    assert len(pres.frames) >= 4
    idx, f0 = pres.frames[0]
    assert f0.shape == (96, 96, 3) and f0.dtype == np.uint8
    assert f0.std() > 1.0                      # not a blank frame
    assert store.list_worlds()                 # autosave happened


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="compiles two frame-fn variants (CPU): RUN_SLOW=1")
def test_session_menu_navigation_and_live_edit(tmp_path):
    """VERDICT r3 item 4 done-criterion: a scripted session that reaches
    Gameplay purely through menu INPUT (MainMenu → NewGame → CREATE), then
    edits a setting live from the dev panel (cursor + '+' steps) and
    renders with it — the frame brightens under the raised tone-map gain
    and the app's settings object reflects the edit."""
    from rtvb_tpu.core.controllers import InputState

    settings = Settings().replace(rendering={"render_width": 64,
                                             "render_height": 64,
                                             "dynamic_resolution": False})
    names = [n for n, _ in settings.value_list()]
    gi = names.index("tone_mapping.gain")

    def src(frame):
        if frame in (0, 1):
            return InputState(menu_select=True)     # NEW GAME, then CREATE
        if frame == 2:
            return InputState(toggle_dev_panel=True)
        if 4 <= frame < 4 + gi:
            return InputState(dev_next_field=True)  # walk cursor to gain
        if frame == 4 + gi:
            return InputState(dev_adjust=1)         # gain ×1.25 (1 recompile)
        return InputState()

    store = WorldStore(str(tmp_path / "worlds"))
    pres = _CollectPresenter()
    app = InteractiveApp(settings=settings, scene=SceneConfig(),
                         presenter=pres, store=store,
                         max_frames=gi + 8, auto_start=False)
    app.run(input_source=src)

    assert abs(app.settings.tone_mapping.gain - 1.25) < 1e-6
    before = pres.frames[3][1].astype(np.float32).mean()
    after = pres.frames[-1][1].astype(np.float32).mean()
    assert after > before * 1.04, (before, after)
