"""GUI smoke tests.

The real-display test (construct -> load ex1 -> board drawn -> destroy)
needs a Tk display; it skips cleanly where none exists (this container has
no X server), but runs under xvfb or a desktop. The import test always
runs and catches module-level wiring breakage in gui/app.py.
"""

import pathlib

import numpy as np
import pytest


def test_gui_module_imports():
    import img2sgf_tpu.gui.app as app

    assert callable(app.run_gui)
    # layout constants the widget tree builds from
    assert app.IMAGE_SIZE > 0 and app.BORDER >= 0


def _display_available():
    try:
        import tkinter as tk

        root = tk.Tk()
        root.destroy()
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _display_available(), reason="no Tk display")
def test_gui_construct_load_destroy(monkeypatch):
    import tkinter as tk

    import img2sgf_tpu.gui.app as app

    src = pathlib.Path("/root/reference/test_images/ex1.jpg")
    if not src.exists():
        pytest.skip("fixture image missing")

    errors = []
    sessions = []

    orig_session = app.DetectSession

    class SpySession(orig_session):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            sessions.append(self)

    monkeypatch.setattr(app, "DetectSession", SpySession)

    def fake_mainloop(self):
        # pump the event queue so the after(100) open_file fires, then exit
        import time

        deadline = time.time() + 120
        while time.time() < deadline:
            self.update()
            if sessions and sessions[0].board_ready:
                break
            time.sleep(0.05)
        self.destroy()

    monkeypatch.setattr(tk.Tk, "mainloop", fake_mainloop)
    monkeypatch.setattr(
        tk.Tk, "report_callback_exception",
        lambda self, et, ev, tb: errors.append(ev),
    )

    rc = app.run_gui(str(src), None)
    assert rc == 0
    assert not errors, f"Tk callback raised: {errors[0]!r}"
    assert sessions and sessions[0].board_ready
    board = np.asarray(sessions[0].full_board)
    assert (board != 0).sum() == 14  # ex1: 9 black + 5 white stones
