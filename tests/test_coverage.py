"""Coverage kernel correctness: analytic area vs supersampling oracle, and
Pallas (interpret mode) vs the XLA reference implementation."""

import numpy as np
import pytest

from swf_renderer_tpu.ops import coverage as cov


def supersample_oracle(edges, height, width, fill_rule, ss=16):
    """Brute-force winding-number rasterization at ss*ss samples per pixel."""
    ys = (np.arange(height * ss) + 0.5) / ss
    xs = (np.arange(width * ss) + 0.5) / ss
    px, py = np.meshgrid(xs, ys)
    w = np.zeros_like(px)
    for x0, y0, x1, y1 in edges:
        if y0 == y1:
            continue
        ymin, ymax = min(y0, y1), max(y0, y1)
        mask = (py >= ymin) & (py < ymax)
        t = (py - y0) / (y1 - y0)
        x_at = x0 + t * (x1 - x0)
        crossing = mask & (x_at < px)
        w += np.where(crossing, np.sign(y1 - y0), 0.0)
    if fill_rule == cov.FILL_RULE_NONZERO:
        inside = w != 0
    else:
        inside = np.mod(np.abs(w), 2) == 1
    return inside.reshape(height, ss, width, ss).mean(axis=(1, 3))


def closed_polygon_edges(points):
    pts = np.asarray(points, dtype=np.float32)
    closed = np.concatenate([pts, pts[:1]], axis=0)
    return np.concatenate([closed[:-1], closed[1:]], axis=1)


TRIANGLE = closed_polygon_edges([(2.3, 1.7), (13.2, 4.1), (5.5, 12.8)])
# Self-intersecting star: distinguishes nonzero from even-odd.
STAR = closed_polygon_edges(
    [(8, 1), (11, 13), (2, 5.5), (14, 5.5), (5, 13)]
)
CW_SQUARE = closed_polygon_edges([(3, 3), (3, 10), (10, 10), (10, 3)])


@pytest.mark.parametrize(
    "edges,fill_rule,tol",
    [
        # Simple polygons: analytic area is exact; only supersampling noise.
        (TRIANGLE, cov.FILL_RULE_NONZERO, 0.03),
        (CW_SQUARE, cov.FILL_RULE_NONZERO, 0.03),
        # Self-intersecting star: pixels that contain the crossing points
        # have winding spanning {0,1,2} within one pixel, where accumulated
        # area is an approximation (same tradeoff as font rasterizers).
        (STAR, cov.FILL_RULE_NONZERO, 0.35),
        (STAR, cov.FILL_RULE_EVENODD, 0.35),
    ],
)
def test_numpy_matches_supersampling(edges, fill_rule, tol):
    got = cov.coverage_numpy(edges, 16, 16, fill_rule)
    want = supersample_oracle(edges, 16, 16, fill_rule, ss=32)
    err = np.abs(got - want)
    assert np.max(err) < tol
    # Any disagreement beyond sampling noise must be confined to a handful
    # of crossing pixels.
    assert (err > 0.06).sum() <= 4
    # Exact checks away from edges:
    if fill_rule == cov.FILL_RULE_NONZERO:
        assert got[7, 7] == pytest.approx(1.0, abs=1e-6)  # inside all shapes
    assert got[0, 15] == pytest.approx(0.0, abs=1e-6)


def test_star_center_fill_rules():
    # The star's center pentagon has winding 2: filled under nonzero,
    # empty under even-odd.
    nz = cov.coverage_numpy(STAR, 16, 16, cov.FILL_RULE_NONZERO)
    eo = cov.coverage_numpy(STAR, 16, 16, cov.FILL_RULE_EVENODD)
    assert nz[7, 8] == pytest.approx(1.0, abs=1e-6)
    assert eo[7, 8] == pytest.approx(0.0, abs=1e-6)


def test_xla_matches_numpy():
    edges_t = np.zeros((1, 4, 128), np.float32)
    edges_t[0, :, : len(STAR)] = STAR.T
    got = np.asarray(cov.coverage_xla(edges_t, 16, 16, cov.FILL_RULE_NONZERO))[0]
    want = cov.coverage_numpy(STAR, 16, 16, cov.FILL_RULE_NONZERO)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_interpret_matches_xla():
    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 40, size=(9, 2))
    edges = closed_polygon_edges(pts)
    edges_t = np.zeros((2, 4, 128), np.float32)
    edges_t[0, :, : len(edges)] = edges.T
    edges_t[1, :, : len(TRIANGLE)] = TRIANGLE.T
    want = np.asarray(cov.coverage_xla(edges_t, 40, 40))
    got = np.asarray(cov.coverage_pallas(edges_t, 40, 40, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_padding_edges_are_noops():
    edges_t = np.zeros((1, 4, 256), np.float32)
    edges_t[0, :, : len(TRIANGLE)] = TRIANGLE.T
    small = np.zeros((1, 4, 128), np.float32)
    small[0, :, : len(TRIANGLE)] = TRIANGLE.T
    a = np.asarray(cov.coverage_xla(edges_t, 16, 16))
    b = np.asarray(cov.coverage_xla(small, 16, 16))
    np.testing.assert_array_equal(a, b)


def test_banded_interpret_matches_numpy():
    from swf_renderer_tpu.models.geometry import split_edges_y

    # Long edges (unsplit) still render correctly: windows widen by the
    # actual max y-extent.
    got = np.asarray(
        cov.coverage_banded(
            np.concatenate(
                [TRIANGLE.T, np.zeros((4, 128 - len(TRIANGLE)), np.float32)],
                axis=1,
            )[None],
            16, 16, interpret=True,
        )
    )[0]
    want = cov.coverage_numpy(TRIANGLE, 16, 16)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # Split edges give identical coverage.
    split = split_edges_y(TRIANGLE, max_extent=3.0)
    assert len(split) > len(TRIANGLE)
    e = np.zeros((1, 4, 128), np.float32)
    e[0, :, : len(split)] = split.T
    got2 = np.asarray(cov.coverage_banded(e, 16, 16, interpret=True))[0]
    np.testing.assert_allclose(got2, want, atol=1e-4)


def test_split_edges_y_preserves_coverage():
    from swf_renderer_tpu.models.geometry import split_edges_y

    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 30, size=(7, 2)).astype(np.float32)
    edges = closed_polygon_edges(pts)
    split = split_edges_y(edges, max_extent=4.0)
    a = cov.coverage_numpy(edges, 32, 32)
    b = cov.coverage_numpy(split, 32, 32)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_pallas_scalar_loop_matches_oracle():
    """The Mosaic scalar-loop path (production on TPU) must match the
    numpy oracle — it reads edge scalars from SMEM and carries its own
    clipped-segment arithmetic, which the interpret-mode tests otherwise
    never execute (a wrong xb parameter hid here: x-at-clipped-upper-y
    must be measured from the segment START)."""
    import numpy as np

    from swf_renderer_tpu.ops import coverage as cov

    rng = np.random.default_rng(17)
    pts = rng.uniform(2, 60, size=(7, 2)).astype(np.float32)
    closed = np.concatenate([pts, pts[:1]])
    edges = np.concatenate([closed[:-1], closed[1:]], axis=1)
    want = cov.coverage_numpy(edges, 64, 64)
    edges_t = np.zeros((1, 4, 128), np.float32)
    edges_t[0, :, : len(edges)] = edges.T
    got = np.asarray(cov.coverage_pallas(
        edges_t, 64, 64, interpret=True, scalar_loop=True))[0]
    np.testing.assert_allclose(got, want, atol=1e-4)
