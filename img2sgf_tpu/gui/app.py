"""Tkinter GUI shim over the pure detection pipeline (placeholder).

The full three-pane editor (input/processed/board, settings, log,
histogram drag, alignment dots — img2sgf.py:1005-1254) lands in a later
milestone; run_gui currently falls back to headless mode when given an
input file.
"""

from __future__ import annotations


def run_gui(input_path=None, output_path=None) -> int:
    if input_path is not None:
        from ..cli import run_headless

        print("GUI not yet available in this build; running headless.")
        return run_headless(input_path, output_path)
    print("GUI not yet available in this build; pass an input image.")
    return 2
