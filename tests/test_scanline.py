"""Scanline cell-accumulation rasterizer: must agree exactly with the
direct analytic coverage (same winding integral, different evaluation)."""

import numpy as np
import jax.numpy as jnp
import pytest

from swf_renderer_tpu.ops import coverage as cov
from swf_renderer_tpu.ops import scanline as sl
from tests.test_coverage import CW_SQUARE, STAR, TRIANGLE, closed_polygon_edges


@pytest.mark.parametrize(
    "edges,fill_rule",
    [
        (TRIANGLE, cov.FILL_RULE_NONZERO),
        (CW_SQUARE, cov.FILL_RULE_NONZERO),
        (STAR, cov.FILL_RULE_NONZERO),
        (STAR, cov.FILL_RULE_EVENODD),
    ],
)
def test_scanline_numpy_matches_direct(edges, fill_rule):
    got = sl.coverage_scanline_numpy(edges, 16, 16, fill_rule)
    want = cov.coverage_numpy(edges, 16, 16, fill_rule)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_scanline_random_polygons():
    rng = np.random.default_rng(11)
    for _ in range(5):
        pts = rng.uniform(-5, 40, size=(9, 2))
        edges = closed_polygon_edges(pts)  # includes off-viewport geometry
        got = sl.coverage_scanline_numpy(edges, 32, 32)
        want = cov.coverage_numpy(edges, 32, 32)
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_scanline_offscreen_left_contributes_cover():
    # A square extending past the left viewport edge must still fill the
    # visible columns (cover from clipped-left geometry).
    square = closed_polygon_edges([(-10, 2), (8, 2), (8, 10), (-10, 10)])
    got = sl.coverage_scanline_numpy(square, 16, 16)
    want = cov.coverage_numpy(square, 16, 16)
    np.testing.assert_allclose(got, want, atol=1e-9)
    assert got[5, 0] == pytest.approx(1.0)


def test_scanline_device_matches_numpy():
    edges = STAR
    rows, cols, area, cover = sl.edges_to_cells(edges, 16, 16)
    r, c, a, v = sl.pack_cells([(rows, cols, area, cover)], pad_multiple=64)
    got = np.asarray(
        sl.coverage_scanline(
            jnp.asarray(r), jnp.asarray(c), jnp.asarray(a), jnp.asarray(v),
            16, 16,
        )
    )[0]
    want = sl.coverage_scanline_numpy(edges, 16, 16)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cell_count_scales_with_perimeter():
    big = closed_polygon_edges([(1, 1), (31, 1), (31, 31), (1, 31)])
    rows, _, _, _ = sl.edges_to_cells(big, 32, 32)
    # 2 vertical sides of 30 rows each; horizontal edges contribute nothing.
    assert len(rows) == 60


def test_backends_agree_on_random_scenes():
    """Fuzz: scanline and direct backends produce identical u8 frames."""
    from swf_renderer_tpu.ops.style import solid_paint
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from swf_renderer_tpu.runtime.scene import Draw

    rng = np.random.default_rng(21)
    for trial in range(4):
        draws = []
        for _ in range(3):
            pts = rng.uniform(-10, 70, size=(rng.integers(3, 9), 2))
            draws.append(
                Draw(
                    edges=closed_polygon_edges(pts.astype(np.float32)),
                    paint=solid_paint(rng.uniform(0.1, 1.0, 4)),
                )
            )
        a = TpuRenderer(56, 48, use_pallas=False,
                        backend="scanline").execute(draws)
        b = TpuRenderer(56, 48, use_pallas=False,
                        backend="direct").execute(draws)
        np.testing.assert_array_equal(a, b)
