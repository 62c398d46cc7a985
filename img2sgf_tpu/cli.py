"""Headless CLI: python -m img2sgf_tpu input_image [output.sgf]

Mirrors the reference's argv semantics (img2sgf.py:1256-1269): arg1 is the
input image, arg2 the output SGF (default: input stem + .sgf). Unlike the
reference it runs without a GUI; pass --gui to open the editor instead.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compile cache: image sizes recur, compiles are slow."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("IMG2SGF_CACHE", "/tmp/jax_cache_tpu"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def run_headless(input_path: str, output_path: str | None, verbose: bool = True) -> int:
    _enable_compile_cache()
    from .config import DetectionConfig, choose_line_threshold
    from .core import to_sgf
    from .hostio import load_rgb
    from .pipeline import detect_board_auto

    try:
        rgb = load_rgb(input_path)
    except (OSError, ValueError) as e:
        # reference shows an error dialog (img2sgf.py:650-656); headless
        # prints the same message and fails cleanly
        print(f"Error opening file {input_path}:\n{e}", file=sys.stderr)
        return 1
    cfg = DetectionConfig()
    thr = choose_line_threshold(rgb.shape[0], rgb.shape[1])
    if verbose:
        print(f"Image size {rgb.shape[1]}x{rgb.shape[0]}, line threshold {thr}")
    # shape-bucketed execution: one compiled program per canvas bucket (plus
    # the persistent cache above) instead of a 20-90 s compile per image size
    res = detect_board_auto(rgb, cfg, thr)
    ready = bool(res.board_ready)
    if verbose:
        n_circ = int(np.asarray(res.circles_valid).sum())
        print(f"Found {n_circ} circles; grid "
              f"{int(res.hsize)}x{int(res.vsize)} valid={bool(res.valid_grid)}")
    if not ready:
        print("Board not detected! Things to try: select a smaller region, "
              "rotate the image, increase contrast or threshold.")
        return 1
    board = np.asarray(res.full_board)
    side = int(res.side_to_move)
    print(f"Detected {int(res.num_black)} black and {int(res.num_white)} white "
          f"stones on a {int(res.hsize)}x{int(res.vsize)} board; "
          f"{'black' if side == 1 else 'white'} to play")
    sgf = to_sgf(board, side_to_move=side)
    if output_path is None:
        output_path = os.path.splitext(input_path)[0] + ".sgf"
    with open(output_path, "w") as f:
        f.write(sgf)
    print(f"Saved to file {output_path}")
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    use_gui = "--gui" in argv
    if use_gui:
        argv.remove("--gui")
    if len(argv) > 2:
        sys.exit("Too many command line arguments.")
    input_path = argv[0] if len(argv) > 0 else None
    output_path = argv[1] if len(argv) > 1 else None

    if use_gui or input_path is None:
        from .gui.app import run_gui

        return run_gui(input_path, output_path)
    return run_headless(input_path, output_path)


if __name__ == "__main__":
    raise SystemExit(main())
