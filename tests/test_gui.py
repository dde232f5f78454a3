"""--gui smoke test under a stubbed cv2 (no display needed).

The reference's UX is four live OpenCV windows plus waitKey dispatch
(source/autoencoder.cpp:55-66, 211-246).  ``cli/main._run_gui`` is the one
application component that needs a physical display; this pins its
view→window wiring, the keycode masking (GUI backends set modifier/high
bits), the Esc exit, and the headless failure message — all against a fake
cv2 module, so the test runs on any rig.
"""

import sys
import types

import pytest


class _FakeCV2(types.ModuleType):
    WINDOW_NORMAL = 0

    class error(Exception):
        pass

    def __init__(self, keys, fail_windows=False):
        super().__init__("cv2")
        self._keys = list(keys)
        self._fail_windows = fail_windows
        self.named = []
        self.shown = []          # (window, shape) per imshow
        self.destroyed = False

    def namedWindow(self, name, flags=0):
        if self._fail_windows:
            raise self.error("no display")
        self.named.append(name)

    def moveWindow(self, name, x, y):
        pass

    def resizeWindow(self, name, w, h):
        pass

    def imshow(self, name, img):
        self.shown.append((name, img.shape))

    def waitKey(self, ms=0):
        return self._keys.pop(0) if self._keys else -1

    def destroyAllWindows(self):
        self.destroyed = True


def _gui_args(frames):
    return types.SimpleNamespace(frames=frames, nx=64, ny=64)


def _engine():
    from spectralae.core.config import Config
    from spectralae.model.engine import Engine
    return Engine(Config(nx=64, ny=64, d=3), seed=0)


def test_gui_loop_views_keys_and_esc(monkeypatch, capsys):
    """3 frames of views + 2 keys (one with high modifier bits) + Esc."""
    from spectralae.cli import main as cli_main
    from spectralae.data import pipeline
    # frame 0: no key; frame 1: 'q' (cycle feature map); frame 2: 'q' with
    # GUI-backend modifier bits set (masking, cli/main.py:120-127);
    # frame 3: Esc -> break before exhausting the 10-frame budget
    fake = _FakeCV2(keys=[-1, ord("q"), ord("q") | 0x100000, 27])
    monkeypatch.setitem(sys.modules, "cv2", fake)
    eng = _engine()
    src = pipeline.synthetic_frames(64, 64, seed=0)
    cli_main._run_gui(eng, src, _gui_args(frames=10))
    # the reference's four windows were created and fed every frame
    assert fake.named == ["input", "output", "feature map", "kernel"]
    frames_shown = len(fake.shown) // 4
    assert frames_shown == 4          # Esc on the 4th waitKey
    assert {n for n, _ in fake.shown} == {"input", "output",
                                          "feature map", "kernel"}
    # every shown image is HxWx3 uint8-ish (2-D views are expanded)
    assert all(len(s) == 3 and s[2] == 3 for _, s in fake.shown)
    assert fake.destroyed
    out = capsys.readouterr().out
    # both 'q' presses reached the dispatcher (the modifier-masked one
    # included): feature index stepped 0 -> 1 -> 2
    assert "key 'q' -> 1" in out
    assert "key 'q' -> 2" in out
    assert eng.flags.feat == 2
    assert not eng.flags.sel          # no training key was pressed


def test_gui_headless_fails_with_message(monkeypatch):
    from spectralae.cli import main as cli_main
    from spectralae.data import pipeline
    fake = _FakeCV2(keys=[], fail_windows=True)
    monkeypatch.setitem(sys.modules, "cv2", fake)
    eng = _engine()
    src = pipeline.synthetic_frames(64, 64, seed=0)
    with pytest.raises(SystemExit, match="needs a display"):
        cli_main._run_gui(eng, src, _gui_args(frames=1))
