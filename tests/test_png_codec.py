"""PNG codec sanity: read golden PNGs, round-trip write/read."""

import numpy as np

from swf_renderer_tpu.utils.png import read_png, write_png


def test_read_golden_png(reference_tests):
    rgba = read_png(reference_tests / "flat-shapes" / "triangle" / "shape.png")
    assert rgba.shape == (317, 502, 4)
    # Triangle fill color is (51, 102, 153, 255) (ast solid fill 5).
    interior = rgba[200, 250]
    assert tuple(interior) == (51, 102, 153, 255)
    # Corners are transparent (stage cleared, no background fill).
    assert rgba[0, 0, 3] == 0


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(37, 61, 4), dtype=np.uint8)
    path = tmp_path / "roundtrip.png"
    write_png(path, img)
    assert np.array_equal(read_png(path), img)
