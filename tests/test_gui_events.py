"""Event-driven GUI tests: real Tk events through the bound handlers.

These drive the widget bindings with `event_generate` — board-editor
clicks (stone cycling + alignment dots, img2sgf.py:955-1002), the
histogram threshold drag (:1041-1048, :740-766), and the drag-zoom /
double-click-reset gestures (:663-737) — and assert the session state
transitions. They need a Tk display (xvfb or a desktop); in a headless
container they skip, and the pure coordinate math they exercise is still
covered display-free by tests/test_gui_geometry.py.
"""

import pathlib

import numpy as np
import pytest

from img2sgf_tpu.core import Alignment, BoardStates


def _display_available():
    try:
        import tkinter as tk

        root = tk.Tk()
        root.destroy()
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _display_available(), reason="no Tk display")

EX9 = pathlib.Path("/root/reference/test_images/ex9.jpg")


def _pump(root, predicate, timeout_s=180):
    import time

    deadline = time.time() + timeout_s
    while time.time() < deadline:
        root.update()
        if predicate():
            return True
        time.sleep(0.05)
    return False


def _grid_coords(canvas):
    w, h = canvas.winfo_width(), canvas.winfo_height()
    width = min(w, h) - 60
    return [i * width / 18 + 30 for i in range(19)], w, h


def test_event_driven_board_edit_hist_and_zoom(monkeypatch):
    import tkinter as tk

    import img2sgf_tpu.gui.app as app

    if not EX9.exists():
        pytest.skip("fixture image missing")

    errors, report = [], {}

    def drive(root):
        hs = root.testing_handles
        session = hs["session"]
        assert _pump(root, lambda: session.board_ready), "never board_ready"
        out = hs["output_canvas"]
        root.update_idletasks()

        # --- stone cycling (left: EMPTY->WHITE->BLACK->EMPTY; right:
        # EMPTY->BLACK->WHITE->EMPTY) at a real grid intersection
        coords, w, h = _grid_coords(out)
        empty = np.argwhere(np.asarray(session.full_board) == 0)
        i, j = (int(empty[0][0]), int(empty[0][1]))
        x, y = int(round(coords[i])), int(round(coords[j]))
        seq = []
        for _ in range(3):
            out.event_generate("<ButtonRelease-1>", x=x, y=y)
            root.update()
            seq.append(int(session.full_board[i, j]))
        report["left_cycle"] = seq
        out.event_generate("<ButtonRelease-3>", x=x, y=y)
        root.update()
        report["right_after_empty"] = int(session.full_board[i, j])
        out.event_generate("<ButtonRelease-3>", x=x, y=y)
        out.event_generate("<ButtonRelease-3>", x=x, y=y)
        root.update()
        report["right_cycle_back_to_empty"] = int(session.full_board[i, j])

        # --- alignment dots: ex9 is a corner position (8x6 < 19), so a
        # click outside BOTH bands moves the board to that corner
        report["align_before"] = tuple(session.board_alignment)
        stones_before = int((np.asarray(session.full_board) != 0).sum())
        s = min(w, h)
        out.event_generate("<ButtonRelease-1>", x=s - 5, y=s - 5)
        root.update()
        report["align_after"] = tuple(session.board_alignment)
        board = np.asarray(session.full_board)
        # the detected sub-board is re-placed, not edited: count preserved
        report["stones_preserved"] = int((board != 0).sum()) == stones_before
        hsize, vsize = int(session.result.hsize), int(session.result.vsize)
        report["stones_outside_corner_gone"] = not (
            board[: 19 - hsize, :].any() or board[:, : 19 - vsize].any())

        # --- histogram threshold drag: map data x=200 to a widget pixel,
        # press+drag there, release applies the reclassify
        hs["settings"].deiconify()
        root.update()
        hw = hs["hist_widget"]
        ax = hs["hist_ax"]
        px, py_disp = ax.transData.transform((200.0, 0.0))
        hgt = hw.winfo_height()
        ev_x, ev_y = int(round(px)), int(round(hgt - py_disp))
        hw.event_generate("<Button-1>", x=ev_x, y=ev_y)
        root.update()
        report["thresh_after_press"] = float(session.black_stone_threshold)
        hw.event_generate("<ButtonRelease-1>", x=ev_x, y=ev_y)
        root.update()
        report["board_ready_after_reclassify"] = session.board_ready

        # --- drag-zoom on the input canvas, then double-click reset
        ic = hs["input_canvas"]
        sel_before = np.asarray(session.selection, float).copy()
        cw, ch = ic.winfo_width(), ic.winfo_height()
        x0, y0 = int(cw * 0.1), int(ch * 0.1)
        x1, y1 = int(cw * 0.8), int(ch * 0.8)
        ic.event_generate("<Button-1>", x=x0, y=y0)
        ic.event_generate("<B1-Motion>", x=x1, y=y1)
        ic.event_generate("<ButtonRelease-1>", x=x1, y=y1)
        root.update()
        report["zoom_changed_selection"] = bool(
            (np.asarray(session.selection, float) != sel_before).any())
        ic.event_generate("<Double-Button-1>", x=x1, y=y1)
        root.update()
        report["zoomout_restored_selection"] = bool(
            (np.asarray(session.selection, float) == sel_before).all())

    def fake_mainloop(self):
        try:
            drive(self)
        finally:
            self.destroy()

    monkeypatch.setattr(tk.Tk, "mainloop", fake_mainloop)
    monkeypatch.setattr(
        tk.Tk, "report_callback_exception",
        lambda self, et, ev, tb: errors.append(ev),
    )

    rc = app.run_gui(str(EX9), None)
    assert rc == 0
    assert not errors, f"Tk callback raised: {errors[0]!r}"
    W, B = int(BoardStates.WHITE), int(BoardStates.BLACK)
    assert report["left_cycle"] == [W, B, 0]
    assert report["right_after_empty"] == B
    assert report["right_cycle_back_to_empty"] == 0
    assert report["align_after"] == (Alignment.RIGHT, Alignment.BOTTOM)
    assert report["stones_preserved"]
    assert report["stones_outside_corner_gone"]
    assert abs(report["thresh_after_press"] - 200.0) <= 1.0
    assert report["board_ready_after_reclassify"]
    assert report["zoom_changed_selection"]
    assert report["zoomout_restored_selection"]
