"""CLI argv handling (reference semantics: img2sgf.py:1256-1269)."""

import numpy as np
import pytest
from PIL import Image


def test_headless_bad_file(tmp_path, capsys):
    from img2sgf_tpu.cli import run_headless

    bad = tmp_path / "nope.jpg"
    bad.write_text("not an image")
    assert run_headless(str(bad), None) == 1
    assert "Error opening file" in capsys.readouterr().err


@pytest.mark.slow
def test_headless_default_output_name(tmp_path):
    """Default output = input stem + .sgf; negative fixture path exits 1
    without writing."""
    from img2sgf_tpu.cli import run_headless

    img = tmp_path / "empty.png"
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(img)
    rc = run_headless(str(img), None)
    assert rc == 1  # black square: board not detected
    assert not (tmp_path / "empty.sgf").exists()


def test_main_too_many_args():
    import pytest

    from img2sgf_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["a.jpg", "b.sgf", "extra"])


def test_main_fast_flag_routes(monkeypatch, tmp_path):
    from img2sgf_tpu import cli

    seen = {}

    def fake_headless(inp, out, fast=False):
        seen["args"] = (inp, out, fast)
        return 0

    monkeypatch.setattr(cli, "run_headless", fake_headless)
    assert cli.main(["--fast", "x.jpg", "y.sgf"]) == 0
    assert seen["args"] == ("x.jpg", "y.sgf", True)
