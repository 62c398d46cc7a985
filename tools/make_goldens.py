"""Generate reference-parity goldens for all fixture images.

Writes, per fixture, into tests/golden/<name>/:
  summary.json  - stage counts, grid geometry, stone counts, timings
  board.npy     - full 19x19 board (int8) when board_ready
  out.sgf       - SGF text when board_ready

Large intermediates (grey/edges/circles_removed) go to /tmp/img2sgf_stages
for local debugging and are NOT committed.

Usage: python tools/make_goldens.py [fixture ...]
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from reference_headless import run_pipeline  # noqa: E402

FIXTURES = pathlib.Path("/root/reference/test_images")
GOLDEN = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden"
STAGES = pathlib.Path("/tmp/img2sgf_stages")


def main(names):
    GOLDEN.mkdir(parents=True, exist_ok=True)
    STAGES.mkdir(parents=True, exist_ok=True)
    files = sorted(FIXTURES.glob("*.jpg")) if not names else [FIXTURES / n for n in names]
    rows = []
    for f in files:
        img = Image.open(f).convert("RGB")
        res = run_pipeline(img)
        name = f.stem
        outdir = GOLDEN / name
        outdir.mkdir(exist_ok=True)
        summary = {
            "image": f.name,
            "size": list(img.size),
            "line_threshold": res.line_threshold,
            "n_circles_raw": 0 if res.circles_raw is None else int(len(res.circles_raw)),
            "n_circles_filtered": 0 if res.circles is None else int(len(res.circles)),
            "valid_grid": bool(res.valid_grid),
            "board_ready": bool(res.board_ready),
            "reasons": res.reasons,
            "hsize": res.hsize,
            "vsize": res.vsize,
            "hspace": float(res.hspace),
            "vspace": float(res.vspace),
            "hcentres": [] if res.hcentres is None else [float(x) for x in res.hcentres],
            "vcentres": [] if res.vcentres is None else [float(x) for x in res.vcentres],
            "hcentres_complete": [] if res.hcentres_complete is None else [float(x) for x in res.hcentres_complete],
            "vcentres_complete": [] if res.vcentres_complete is None else [float(x) for x in res.vcentres_complete],
            "num_black": res.num_black,
            "num_white": res.num_white,
            "side_to_move": res.side_to_move,
            "timings_ms": {k: round(v * 1000, 2) for k, v in res.timings.items()},
        }
        (outdir / "summary.json").write_text(json.dumps(summary, indent=1))
        if res.board_ready:
            np.save(outdir / "board.npy", res.full_board.astype(np.int8))
            (outdir / "out.sgf").write_text(res.sgf)
        np.savez_compressed(
            STAGES / f"{name}.npz",
            grey=res.grey,
            edges=res.edges,
            circles_removed=res.circles_removed,
            circles_raw=res.circles_raw,
        )
        rows.append(summary)
        status = "OK " if res.board_ready else ("GRID" if res.valid_grid else "FAIL")
        print(
            f"{name:12s} {status} circles={summary['n_circles_raw']:4d} "
            f"grid={res.hsize}x{res.vsize} B={res.num_black} W={res.num_white} "
            f"total={summary['timings_ms'].get('total', summary['timings_ms'].get('circles', 0)):.0f}ms"
        )
    tot = [r["timings_ms"].get("total") for r in rows if r["timings_ms"].get("total")]
    if tot:
        print(f"\nreference CPU total: mean {np.mean(tot):.1f}ms  median {np.median(tot):.1f}ms")


if __name__ == "__main__":
    main(sys.argv[1:])
