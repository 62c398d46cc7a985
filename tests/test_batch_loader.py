"""Native batch loader: decode correctness vs PIL, fallback path."""

import glob

import numpy as np
import pytest
from PIL import Image

import img2sgf_tpu.hostio.batch_loader as bl


@pytest.fixture(scope="module")
def jpeg_paths(test_images_dir):
    return sorted(glob.glob(str(test_images_dir / "*.jpg")))[:4]


def test_decode_batch_matches_pil_closely(jpeg_paths):
    out = bl.decode_batch(jpeg_paths, 256, 256)
    assert out.shape == (len(jpeg_paths), 256, 256, 3)
    for i, p in enumerate(jpeg_paths):
        ref = np.asarray(
            Image.open(p).convert("RGB").resize((256, 256), Image.BILINEAR)
        ).astype(np.int32)
        diff = np.abs(out[i].astype(np.int32) - ref)
        # different bilinear implementations: expect close but not identical
        assert diff.mean() < 4.0, f"{p}: mean diff {diff.mean()}"


def test_missing_file_falls_back_cleanly(tmp_path, jpeg_paths):
    bad = [jpeg_paths[0], str(tmp_path / "nope.jpg")]
    with pytest.raises(Exception):
        bl.decode_batch(bad, 64, 64)


def test_reuses_output_buffer(jpeg_paths):
    buf = np.empty((len(jpeg_paths), 128, 128, 3), np.uint8)
    out = bl.decode_batch(jpeg_paths, 128, 128, out=buf)
    assert out is buf
