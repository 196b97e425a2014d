"""Geometry lowering unit tests: transforms, flattening, stroking."""

import math

import numpy as np
import pytest

from swf_renderer_tpu.models import ir
from swf_renderer_tpu.models.geometry import (
    Affine,
    flatten_quad,
    path_to_subpaths,
    polygons_to_edges,
    quad_subdivisions,
    stroke_subpath,
    subpaths_to_fill_edges,
)
from swf_renderer_tpu.ops.coverage import coverage_numpy


def polygon_area(edges):
    return float(
        np.sum((edges[:, 2] - edges[:, 0]) * (edges[:, 1] + edges[:, 3])) / 2
    )


def test_affine_compose_and_inverse():
    a = Affine.scaling(2.0, 3.0).then(Affine.translation(5.0, -1.0))
    pts = np.array([[1.0, 1.0], [0.0, 0.0], [-2.0, 4.0]])
    out = a.apply(pts)
    # scale(2,3) ∘ translate(5,-1): translate happens first.
    np.testing.assert_allclose(out[0], [(1 + 5) * 2, (1 - 1) * 3])
    back = a.inverse().apply(out)
    np.testing.assert_allclose(back, pts, atol=1e-12)


def test_affine_matches_canvas_transform_order():
    # ctx.transform composes new matrices on the RIGHT of the CTM.
    ctm = Affine.scaling(1 / 20, 1 / 20).then(Affine.translation(100, 0))
    # A point at local (0, 0) lands at translate/20.
    np.testing.assert_allclose(ctm.apply(np.zeros((1, 2)))[0], [5.0, 0.0])


def test_quad_flattening_tolerance():
    p0 = np.array([0.0, 0.0])
    ctrl = np.array([50.0, 100.0])
    p1 = np.array([100.0, 0.0])
    for tol in (1.0, 0.1, 0.01):
        n = quad_subdivisions(p0, ctrl, p1, tol)
        pts = np.concatenate([[p0], flatten_quad(p0, ctrl, p1, n)])
        # Max deviation of the true curve from the polyline stays within
        # tolerance: sample the curve densely and measure.
        t = np.linspace(0, 1, 500)[:, None]
        curve = (1 - t) ** 2 * p0 + 2 * (1 - t) * t * ctrl + t**2 * p1
        # Distance from each curve point to the polyline (segment-wise).
        def dist_to_polyline(q):
            best = np.inf
            for a, b in zip(pts[:-1], pts[1:]):
                ab = b - a
                denom = float(ab @ ab)
                u = 0.0 if denom == 0 else np.clip((q - a) @ ab / denom, 0, 1)
                best = min(best, float(np.hypot(*(q - (a + u * ab)))))
            return best

        max_dev = max(dist_to_polyline(q) for q in curve[::25])
        assert max_dev <= tol * 1.01, (tol, n, max_dev)


def test_fill_edges_close_subpaths():
    cmds = [
        ir.MoveTo(0, 0), ir.LineTo(10, 0), ir.LineTo(10, 10),
        # not closed back to (0, 0) — fill() must close it
    ]
    subs = path_to_subpaths(cmds, Affine.identity())
    edges = subpaths_to_fill_edges(subs)
    assert len(edges) == 3  # 2 drawn + 1 implicit closing edge
    assert polygon_area(edges) == pytest.approx(-50.0)  # CCW triangle


def test_stroke_area_straight_line():
    # A horizontal stroke of length 20 and width 4 covers ~area 80 plus caps.
    pts = np.array([[5.0, 10.0], [25.0, 10.0]])
    for cap, extra in (("butt", 0.0), ("square", 16.0)):
        polys = stroke_subpath(pts, 4.0, cap=cap, join="miter")
        edges = polygons_to_edges(polys)
        cov = coverage_numpy(edges, 24, 40)
        assert cov.sum() == pytest.approx(80.0 + extra, abs=0.3)
    # Round caps add ~a full disk of radius 2 (slightly less: the arcs are
    # polygonized inscribed; tighten the tolerance for a closer bound).
    polys = stroke_subpath(pts, 4.0, cap="round", join="round",
                           tolerance=0.01)
    cov = coverage_numpy(polygons_to_edges(polys), 24, 40)
    assert cov.sum() == pytest.approx(80.0 + math.pi * 4, abs=0.5)


def test_stroke_right_angle_joins():
    pts = np.array([[5.0, 5.0], [25.0, 5.0], [25.0, 25.0]])
    # Width 4, two 20-long legs: quad union = 2*80 - 4 (overlap) = 156;
    # the 90-degree miter fills the outer 2x2 corner square -> 160.
    polys = stroke_subpath(pts, 4.0, cap="butt", join="miter")
    cov = coverage_numpy(polygons_to_edges(polys), 32, 36)
    assert cov.sum() == pytest.approx(160.0, abs=0.3)
    # Bevel fills only the corner triangle (half the square) -> 158.
    polys = stroke_subpath(pts, 4.0, cap="butt", join="bevel")
    cov = coverage_numpy(polygons_to_edges(polys), 32, 36)
    assert cov.sum() == pytest.approx(158.0, abs=0.3)
    # Round join: quarter disc of radius 2 -> 156 + pi.
    polys = stroke_subpath(pts, 4.0, cap="butt", join="round",
                           tolerance=0.01)
    cov = coverage_numpy(polygons_to_edges(polys), 32, 36)
    assert cov.sum() == pytest.approx(156.0 + math.pi, abs=0.3)


def test_stroke_degenerate_point_round_cap_dot():
    polys = stroke_subpath(np.array([[10.0, 10.0]]), 6.0, cap="round",
                           tolerance=0.01)
    assert polys  # a dot
    cov = coverage_numpy(polygons_to_edges(polys), 20, 20)
    assert cov.sum() == pytest.approx(math.pi * 9, rel=0.02)
    # Butt cap: nothing drawn.
    assert stroke_subpath(np.array([[10.0, 10.0]]), 6.0, cap="butt") == []


def test_stroke_closed_subpath_annulus():
    # Closed square path (perimeter 4*20 at width 4) strokes to an annulus:
    # outer 24x24 minus inner 16x16 = 320.  The closed stroker emits two
    # reversed rings whose windings cancel in the hole.
    pts = np.array([[5.0, 5.0], [25.0, 5.0], [25.0, 25.0], [5.0, 25.0],
                    [5.0, 5.0]])
    polys = stroke_subpath(pts, 4.0, cap="butt", join="miter")
    assert len(polys) == 2  # outer ring + reversed inner ring
    cov = coverage_numpy(polygons_to_edges(polys), 32, 32)
    assert cov.sum() == pytest.approx(24 * 24 - 16 * 16, abs=0.3)
    # The hole is empty (winding canceled, not merely clamped).
    assert cov[12:18, 12:18].sum() == pytest.approx(0.0, abs=1e-3)


def test_deoverlap_union_of_crossing_strokes():
    from swf_renderer_tpu.models.geometry import deoverlap_edges

    # An X of two crossing strokes: the de-overlapped boundary must cover
    # the same region (coverage_numpy clamps per sub-span, so it reads the
    # union for BOTH inputs — the conflation only exists in the device
    # pipeline's integrate-then-clamp; deoverlap removes the overlap so
    # the device matches this union too, asserted at the corpus level by
    # tests/test_max_error.py).
    a = stroke_subpath(np.array([[5.0, 5.0], [25.0, 25.0]]), 6.0)
    b = stroke_subpath(np.array([[5.0, 25.0], [25.0, 5.0]]), 6.0)
    edges = polygons_to_edges(a + b)
    cov_soup = coverage_numpy(edges, 30, 30)
    cov_union = coverage_numpy(deoverlap_edges(edges), 30, 30)
    np.testing.assert_allclose(cov_union, cov_soup, atol=0.05)
    # Sanity: the union region itself is right — two 6-wide diagonal
    # bands minus the central rhombus (both leave the raster; compare the
    # fully-visible central area instead of totals): the crossing pixel
    # is covered exactly once.
    assert cov_union[14:16, 14:16].sum() == pytest.approx(4.0, abs=1e-3)


def test_deoverlap_identity_on_disjoint_geometry():
    from swf_renderer_tpu.models.geometry import deoverlap_edges

    sq1 = np.array([[2.0, 2.0], [8.0, 2.0], [8.0, 8.0], [2.0, 8.0]])
    sq2 = sq1 + 10.0
    edges = polygons_to_edges([sq1, sq2])
    out = deoverlap_edges(edges)
    a = coverage_numpy(edges, 20, 20)
    b = coverage_numpy(out, 20, 20)
    assert np.allclose(a, b, atol=1e-6)


def test_miter_tip_is_offset_line_intersection():
    """The miter tip must lie on BOTH offset lines (x . n = h) — i.e.
    at distance h / cos(phi/2) from the vertex, phi = angle between the
    offset normals.  The round-1 implementation used h / sin(phi/2),
    which coincides ONLY at 90° turns (every prior test's geometry);
    at sharp turns it produced a spike far too short and at gentle
    turns it beveled valid miters (hb1 forensics, PERF.md round 4)."""
    from swf_renderer_tpu.models.geometry import _outer_join_points

    p = np.zeros(2)
    for phi_deg in (30.0, 60.0, 120.0, 150.0):
        phi = math.radians(phi_deg)
        a = np.array([math.cos(math.pi / 2 + phi / 2),
                      math.sin(math.pi / 2 + phi / 2)])
        b = np.array([math.cos(math.pi / 2 - phi / 2),
                      math.sin(math.pi / 2 - phi / 2)])
        ratio = 1.0 / math.cos(phi / 2)
        out = _outer_join_points(p, a, b, 1.0, "miter", 10.0, 0.01)
        assert len(out) == 3, f"phi={phi_deg}: expected a miter tip"
        tip = out[1]
        np.testing.assert_allclose(tip, [0.0, ratio], atol=1e-9)
        for n in (a, b):
            assert float(np.dot(tip, n)) == pytest.approx(1.0, abs=1e-9)
        # A limit just under the ratio degrades to a bevel.
        out2 = _outer_join_points(p, a, b, 1.0, "miter", ratio * 0.999,
                                  0.01)
        assert len(out2) == 2


def test_stroke_sharp_miter_area():
    """End-to-end: a 2h-wide V at interior angle 2*atan(1/2) gets a
    miter of analytic area; the buggy tip formula loses ~40% of the
    join area here."""
    pts = np.array([[5.0, 25.0], [25.0, 15.0], [5.0, 5.0]])
    h = 2.0
    d = 20.0 / math.sqrt(500.0)  # cos of half the interior angle... see below
    # interior angle theta between the legs: legs (+-20, -+10);
    # cos(theta) = (400 - 100) / 500 = 0.6 -> theta = 53.13 deg.
    theta = math.acos(0.6)
    leg = math.sqrt(500.0)
    # Union area of the two leg quads: 2 * leg * 2h - overlap kite.
    # Overlap kite of two 2h slabs crossing at angle theta, both ending
    # at the vertex: the quarter at the vertex = h^2 / tan(theta/2) ...
    # measure the bevel variant and assert the miter ADDS the exact
    # miter-over-bevel triangle: area = h^2 * (1/sin + ... ) —
    # difference form is robust: miter kite h^2/tan(theta/2)*... use:
    # miter area over bevel = h^2 * (cos(theta/2) / sin(theta/2)
    #                               - sin(theta/2)*... )
    polys_b = stroke_subpath(pts, 2 * h, cap="butt", join="bevel")
    cov_b = coverage_numpy(polygons_to_edges(polys_b), 32, 36)
    polys_m = stroke_subpath(pts, 2 * h, cap="butt", join="miter",
                             miter_limit=10.0)
    cov_m = coverage_numpy(polygons_to_edges(polys_m), 32, 36)
    # bevel chord: corners at p +- h*n; chord length 2h sin(phi/2),
    # tip height above chord: h/cos(phi/2) - h cos(phi/2).
    phi = math.pi - theta
    chord = 2 * h * math.sin(phi / 2)
    height = h / math.cos(phi / 2) - h * math.cos(phi / 2)
    assert (cov_m.sum() - cov_b.sum()) == pytest.approx(
        0.5 * chord * height, abs=0.05)


@pytest.mark.parametrize("seed", range(8))
def test_stroke_round_round_matches_distance_field_fuzz(seed):
    """Round/round stroking is EXACTLY the Minkowski sum of the path
    with a radius-h disk, so de-overlapped stroke coverage must match
    the supersampled indicator of dist(p, path) <= h — an oracle
    independent of the outline construction (offset sides, arc
    caps/joins, inner-join folds, closed-ring winding, and the
    deoverlap union).  Randomized polylines include short segments,
    an EXACT collinear retrace (seed 5 — the case that exposed the
    coincident-fragment doubling bug in deoverlap_edges), and closed
    rings."""
    from swf_renderer_tpu.models.geometry import deoverlap_edges

    rng = np.random.default_rng(seed)
    H = W = 48
    ss = 8
    n = int(rng.integers(2, 7))
    pts = rng.uniform(8.0, 40.0, size=(n, 2))
    if seed == 3 and n >= 3:
        pts[1] = pts[0] + [0.4, 0.1]  # segment shorter than the width
    if seed == 5 and n >= 3:
        pts[2] = pts[0] + (pts[1] - pts[0]) * 0.1  # exact retrace fold
    if seed == 6:
        pts = np.vstack([pts, pts[:1]])  # closed ring
    width = float(rng.uniform(2.0, 7.0))
    h = width / 2.0

    polys = stroke_subpath(pts, width, cap="round", join="round",
                           tolerance=1e-4)
    cov = coverage_numpy(deoverlap_edges(polygons_to_edges(polys)), H, W)

    centers_x = (np.arange(W * ss) + 0.5) / ss
    centers_y = (np.arange(H * ss) + 0.5) / ss
    px, py = np.meshgrid(centers_x, centers_y)
    d2 = np.full(px.shape, np.inf)
    for a, b in zip(pts[:-1], pts[1:]):
        ab = b - a
        l2 = float(ab @ ab)
        t = ((px - a[0]) * ab[0] + (py - a[1]) * ab[1]) / max(l2, 1e-12)
        t = np.clip(t, 0.0, 1.0)
        d2 = np.minimum(d2, (px - (a[0] + t * ab[0])) ** 2
                        + (py - (a[1] + t * ab[1])) ** 2)
    ind = (d2 <= h * h).reshape(H, ss, W, ss).mean(axis=(1, 3))

    err = np.abs(cov - ind)
    # Boundary pixels carry ~1/(2*ss) supersampling quantization plus
    # the inscribed-arc polygonization; interiors must be exact.
    assert err.max() < 0.1, f"max {err.max():.3f} at seed {seed}"
    assert err.mean() < 0.002, f"mean {err.mean():.5f} at seed {seed}"


def test_deoverlap_exact_retrace_watertight():
    """A stroke path that retraces itself along the SAME line used to
    emit the shared boundary twice from its coincident parent edges —
    the doubled fragments leaked half-plane winding (hundreds of px^2
    of spurious fill).  The collinear split + net-multiplicity collapse
    keeps the output watertight: total area must match the two-capsule
    union, and far-field pixels must be empty."""
    pts = np.array([[10.0, 10.0], [30.0, 20.0], [14.0, 12.0],
                    [26.0, 30.0]])
    # middle leg retraces exactly along the first leg's line
    polys = stroke_subpath(pts, 3.0, cap="round", join="round",
                           tolerance=1e-3)
    edges = polygons_to_edges(polys)
    from swf_renderer_tpu.models.geometry import deoverlap_edges

    cov = coverage_numpy(deoverlap_edges(edges), 40, 40)
    raw = coverage_numpy(edges, 40, 40)
    # union area <= raw conflated area, and not wildly different
    assert cov.sum() <= raw.sum() + 0.5
    assert cov.sum() > 0.8 * raw.sum()
    # far field (right border strip) stays empty
    assert cov[:, 38:].sum() == pytest.approx(0.0, abs=1e-6)


@pytest.mark.parametrize("seed", range(6))
def test_stroke_caps_joins_match_piece_union_fuzz(seed):
    """Butt/square caps with miter/bevel joins: the stroked region is
    the union of per-segment rectangles (+ square cap extensions) and
    the per-vertex outer join piece — a miter quad [p, a, tip, b] when
    miterLength/lineWidth = 1/sin(theta/2) <= limit, else the bevel
    triangle [p, a, b].  The oracle below rebuilds those convex pieces
    from the Canvas2D spec independently of _outer_join_points and
    compares supersampled union membership against the de-overlapped
    outline coverage — across random angles, widths, and miter limits
    (incl. limit-crossing sharp turns)."""
    from swf_renderer_tpu.models.geometry import deoverlap_edges

    rng = np.random.default_rng(100 + seed)
    H = W = 48
    ss = 8
    n = int(rng.integers(2, 6))
    pts = rng.uniform(10.0, 38.0, size=(n, 2))
    width = float(rng.uniform(2.0, 6.0))
    h = width / 2.0
    cap = ("butt", "square")[seed % 2]
    join = ("miter", "bevel")[(seed // 2) % 2]
    ml = float(rng.uniform(1.2, 6.0))

    polys = stroke_subpath(pts, width, cap=cap, join=join, miter_limit=ml)
    cov = coverage_numpy(deoverlap_edges(polygons_to_edges(polys)), H, W)

    centers = (np.arange(H * ss) + 0.5) / ss
    px, py = np.meshgrid(centers[: W * ss], centers)
    inside = np.zeros(px.shape, bool)

    def in_convex(poly):
        m = np.ones(px.shape, bool)
        k = len(poly)
        for i in range(k):
            ax, ay = poly[i]
            bx, by = poly[(i + 1) % k]
            m &= (bx - ax) * (py - ay) - (by - ay) * (px - ax) >= 0
        return m

    segs = [(pts[i], pts[i + 1]) for i in range(n - 1)
            if np.hypot(*(pts[i + 1] - pts[i])) > 1e-9]
    ext = h if cap == "square" else 0.0
    for k, (a, b) in enumerate(segs):
        d = (b - a) / np.hypot(*(b - a))
        nr = np.array([-d[1], d[0]])
        e0 = ext if k == 0 else 0.0
        e1 = ext if k == len(segs) - 1 else 0.0
        quad = [a - d * e0 + nr * h, b + d * e1 + nr * h,
                b + d * e1 - nr * h, a - d * e0 - nr * h]
        # orient CCW-independent: test both windings
        m = in_convex(quad) | in_convex(quad[::-1])
        inside |= m
    for k in range(1, len(segs)):
        p = segs[k][0]
        d1 = segs[k - 1][1] - segs[k - 1][0]
        d2 = segs[k][1] - segs[k][0]
        d1 = d1 / np.hypot(*d1)
        d2 = d2 / np.hypot(*d2)
        turn = d1[0] * d2[1] - d1[1] * d2[0]
        if abs(turn) < 1e-12:
            continue
        sgn = -1.0 if turn > 0 else 1.0  # outer side normal sign
        n1 = np.array([-d1[1], d1[0]]) * sgn
        n2 = np.array([-d2[1], d2[0]]) * sgn
        a = p + n1 * h
        b = p + n2 * h
        cos_half = math.sqrt(max(0.0, (1.0 + float(n1 @ n2)) / 2.0))
        if join == "miter" and cos_half > 1e-9 \
                and 1.0 / cos_half <= ml:
            bis = (n1 + n2)
            bis = bis / np.hypot(*bis)
            tip = p + bis * (h / cos_half)
            poly = [p, a, tip, b]
        else:
            poly = [p, a, b]
        inside |= in_convex(poly) | in_convex(poly[::-1])

    ind = inside.reshape(H, ss, W, ss).mean(axis=(1, 3))
    err = np.abs(cov - ind)
    assert err.max() < 0.1, f"max {err.max():.3f} seed {seed} {cap}/{join}"
    assert err.mean() < 0.002, f"mean {err.mean():.5f} seed {seed}"


@pytest.mark.parametrize("seed", range(6))
def test_clip_edges_rect_matches_winding_oracle_fuzz(seed):
    """Exact-stage clipping (the Flash fractional stage bounds,
    scene.py) vs a supersampled point-winding oracle: coverage of the
    clipped soup must equal the indicator of (nonzero winding) AND
    (inside the clip rect), for random self-intersecting polygons
    spanning far outside the stage.  split_edges_y must leave the
    clipped coverage bit-unchanged (interior splits preserve the
    integral)."""
    from swf_renderer_tpu.models.geometry import (
        clip_edges_rect, split_edges_y,
    )

    rng = np.random.default_rng(200 + seed)
    H = W = 32
    ss = 8
    xmax = W - (0.3 if seed % 2 else 0.0)
    ymax = H - (0.7 if seed % 3 else 0.0)
    polys = []
    for _ in range(int(rng.integers(1, 4))):
        k = int(rng.integers(3, 9))
        polys.append(rng.uniform(-15.0, 47.0, size=(k, 2)))
    edges = polygons_to_edges(polys)

    clipped = clip_edges_rect(edges, xmax, ymax)
    cov = coverage_numpy(clipped, H, W)
    cov2 = coverage_numpy(split_edges_y(clipped, 7.0), H, W)
    np.testing.assert_allclose(cov2, cov, atol=1e-4)

    centers = (np.arange(H * ss) + 0.5) / ss
    px, py = np.meshgrid(centers[: W * ss], centers)
    e = edges.astype(np.float64)
    x0, y0, x1, y1 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
    dy = y1 - y0
    wind = np.zeros(px.shape, np.int64)
    for j in range(len(e)):
        if dy[j] == 0.0:
            continue
        t = (py - y0[j]) / dy[j]
        xc = x0[j] + t * (x1[j] - x0[j])
        if dy[j] > 0:
            wind += ((py >= y0[j]) & (py < y1[j]) & (xc > px))
        else:
            wind -= ((py >= y1[j]) & (py < y0[j]) & (xc > px))
    # The engine INTEGRATES winding across the pixel before the fill
    # rule clamps (min(|w|, 1) nonzero — the documented conflation
    # model), so the oracle averages the signed winding, then clamps.
    # The clip rect is weighted EXACTLY per subsample cell (the clip
    # line is axis-aligned; only polygon edges stay ss-quantized).
    wx = np.clip((xmax - (px - 0.5 / ss)) * ss, 0.0, 1.0)
    wy = np.clip((ymax - (py - 0.5 / ss)) * ss, 0.0, 1.0)
    wmask = wind * wx * wy
    ind = np.clip(np.abs(wmask.reshape(H, ss, W, ss).mean(axis=(1, 3))),
                  0.0, 1.0)

    err = np.abs(cov - ind)
    assert err.max() < 0.1, f"max {err.max():.3f} seed {seed}"
    assert err.mean() < 0.002, f"mean {err.mean():.5f} seed {seed}"


def test_stroke_retrace_separation_sweep_never_leaks():
    """Sweep a nearly-retraced stroke from exact collinearity through
    1e-1 px of separation.  Exact (and f32-coincident) retraces must
    match the disk distance field tightly (the 180-degree round join
    emits the forward half-disk; coincident boundaries collapse to net
    multiplicity); the probe-ambiguous band (separation below the
    winding-probe offset) falls back to the raw conflated soup via the
    watertightness check — localized seam over-count is allowed, but
    winding must NEVER leak into the far field."""
    from swf_renderer_tpu.models.geometry import deoverlap_edges

    H = W = 48
    ss = 8
    h = 1.5
    for perp in (0.0, 1e-7, 1e-6, 1e-5, 1e-4, 1e-3, 1e-2, 0.1):
        pts = np.array([[10.0, 10.0], [30.0, 20.0],
                        [14.0, 12.0 + perp], [26.0, 30.0]])
        polys = stroke_subpath(pts, 2 * h, cap="round", join="round",
                               tolerance=1e-4)
        cov = coverage_numpy(deoverlap_edges(polygons_to_edges(polys)),
                             H, W)
        centers = (np.arange(H * ss) + 0.5) / ss
        px, py = np.meshgrid(centers[: W * ss], centers)
        d2 = np.full(px.shape, np.inf)
        for a, b in zip(pts[:-1], pts[1:]):
            ab = b - a
            l2 = float(ab @ ab)
            t = np.clip(((px - a[0]) * ab[0] + (py - a[1]) * ab[1])
                        / max(l2, 1e-12), 0.0, 1.0)
            d2 = np.minimum(d2, (px - (a[0] + t * ab[0])) ** 2
                            + (py - (a[1] + t * ab[1])) ** 2)
        ind = (d2 <= h * h).reshape(H, ss, W, ss).mean(axis=(1, 3))
        err = np.abs(cov - ind)
        assert err.mean() < 0.01, (perp, err.mean())
        assert cov[:, 40:].sum() == 0.0, (perp, "far-field leak")
        if perp in (0.0, 1e-7, 1e-2, 0.1):  # outside the bail band
            assert err.max() < 0.1, (perp, err.max())
