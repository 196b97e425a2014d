"""Geometry lowering: styled paths -> flat, dense edge tables.

This layer goes further than the reference (which replays path commands into
Cairo, reference ts/src/lib/renderers/canvas-renderer.ts:269-290): it flattens
quadratic curves and expands strokes host-side, producing padded ``(E, 4)``
float32 edge tables in *device* (pixel) space.  Those dense tables are what
the Pallas coverage kernel consumes — the TPU-native replacement for Cairo's
scanline fill (canvas-renderer.ts:335) and for the reference Rust lyon
tessellation (rs/src/renderer.rs:24-64).

Conventions:
* All transforms are Canvas2D-style affines ``(a, b, c, d, e, f)``:
  ``x' = a x + c y + e``, ``y' = b x + d y + f``.
* Fills implicitly close every subpath (Canvas2D ``fill()`` semantics).
* Strokes do NOT implicitly close; open ends get caps.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from . import ir

TWIPS_PER_PX = 20.0


@dataclasses.dataclass(frozen=True)
class Affine:
    """Canvas2D affine transform (a, b, c, d, e, f)."""

    a: float = 1.0
    b: float = 0.0
    c: float = 0.0
    d: float = 1.0
    e: float = 0.0
    f: float = 0.0

    @staticmethod
    def identity() -> "Affine":
        return Affine()

    @staticmethod
    def scaling(sx: float, sy: float) -> "Affine":
        return Affine(a=sx, d=sy)

    @staticmethod
    def translation(tx: float, ty: float) -> "Affine":
        return Affine(e=tx, f=ty)

    @staticmethod
    def from_swf_matrix(m) -> "Affine":
        return Affine(*m.to_affine())

    def then(self, other: "Affine") -> "Affine":
        """Return ``self ∘ other`` — apply ``other`` first, then ``self``.

        Matches ``ctx.transform(other)`` applied on a CTM of ``self``."""
        return Affine(
            a=self.a * other.a + self.c * other.b,
            b=self.b * other.a + self.d * other.b,
            c=self.a * other.c + self.c * other.d,
            d=self.b * other.c + self.d * other.d,
            e=self.a * other.e + self.c * other.f + self.e,
            f=self.b * other.e + self.d * other.f + self.f,
        )

    def apply(self, pts: np.ndarray) -> np.ndarray:
        """Transform an (N, 2) point array."""
        pts = np.asarray(pts, dtype=np.float64)
        x = self.a * pts[..., 0] + self.c * pts[..., 1] + self.e
        y = self.b * pts[..., 0] + self.d * pts[..., 1] + self.f
        return np.stack([x, y], axis=-1)

    def inverse(self) -> "Affine":
        det = self.a * self.d - self.b * self.c
        if abs(det) < 1e-12:
            raise ValueError("singular transform")
        ia = self.d / det
        ib = -self.b / det
        ic = -self.c / det
        id_ = self.a / det
        ie = -(ia * self.e + ic * self.f)
        if_ = -(ib * self.e + id_ * self.f)
        return Affine(ia, ib, ic, id_, ie, if_)

    def max_scale(self) -> float:
        """Upper bound on length scaling (for flatness tolerances)."""
        return math.sqrt(
            max(self.a * self.a + self.b * self.b, self.c * self.c + self.d * self.d)
        ) * math.sqrt(2.0)

    def as_tuple(self) -> Tuple[float, float, float, float, float, float]:
        return (self.a, self.b, self.c, self.d, self.e, self.f)


def quad_subdivisions(
    p0: np.ndarray, ctrl: np.ndarray, p1: np.ndarray, tolerance: float
) -> int:
    """Number of uniform-`t` line segments so a quadratic stays within
    ``tolerance`` of its polyline.

    The curve's second derivative is ``2 (p0 - 2c + p1)``; the max deviation
    of an n-piece uniform subdivision from its chords is
    ``|p0 - 2c + p1| / (4 n^2)``."""
    dev = np.hypot(*(p0 - 2.0 * ctrl + p1))
    if dev <= 4.0 * tolerance:
        return 1
    return int(math.ceil(math.sqrt(dev / (4.0 * tolerance))))


def flatten_quad(
    p0: np.ndarray, ctrl: np.ndarray, p1: np.ndarray, n: int
) -> np.ndarray:
    """Evaluate the quadratic at uniform t (excluding t=0), shape (n, 2)."""
    t = (np.arange(1, n + 1, dtype=np.float64) / n)[:, None]
    omt = 1.0 - t
    return omt * omt * p0 + 2.0 * omt * t * ctrl + t * t * p1


def path_to_subpaths(
    commands: Sequence[ir.Command],
    transform: Affine,
    tolerance: float = 0.1,
) -> List[np.ndarray]:
    """Replay MoveTo/LineTo/CurveTo into device-space polylines.

    Curves are flattened adaptively with ``tolerance`` in device pixels
    (transform applied to control points first; affine maps commute with
    Bezier evaluation).  Returns a list of (K, 2) float arrays.
    """
    subpaths: List[np.ndarray] = []
    current: List[np.ndarray] = []
    pos = np.zeros(2)

    def flush():
        nonlocal current
        if len(current) >= 2:
            subpaths.append(np.asarray(current))
        current = []

    for cmd in commands:
        if isinstance(cmd, ir.MoveTo):
            flush()
            pos = transform.apply(np.array([cmd.x, cmd.y], dtype=np.float64))
            current = [pos]
        elif isinstance(cmd, ir.LineTo):
            end = transform.apply(np.array([cmd.end_x, cmd.end_y], dtype=np.float64))
            if not current:
                current = [pos]
            current.append(end)
            pos = end
        elif isinstance(cmd, ir.CurveTo):
            ctrl = transform.apply(
                np.array([cmd.control_x, cmd.control_y], dtype=np.float64)
            )
            end = transform.apply(np.array([cmd.end_x, cmd.end_y], dtype=np.float64))
            if not current:
                current = [pos]
            n = quad_subdivisions(pos, ctrl, end, tolerance)
            current.extend(flatten_quad(pos, ctrl, end, n))
            pos = end
        else:
            raise ValueError(f"UnexpectedCommand: {cmd!r}")
    flush()
    return subpaths


def subpaths_to_fill_edges(subpaths: Sequence[np.ndarray]) -> np.ndarray:
    """Edge table for filling: every polyline edge plus the implicit closing
    edge of each subpath (Canvas2D ``fill()`` closes subpaths)."""
    rows: List[np.ndarray] = []
    for pts in subpaths:
        if len(pts) < 2:
            continue
        seg = np.concatenate([pts[:-1], pts[1:]], axis=1)  # (K-1, 4)
        rows.append(seg)
        if not np.array_equal(pts[0], pts[-1]):
            rows.append(np.concatenate([pts[-1], pts[0]])[None, :])
    if not rows:
        return np.zeros((0, 4), dtype=np.float32)
    return np.concatenate(rows, axis=0).astype(np.float32)


# ---------------------------------------------------------------------------
# Stroke expansion
# ---------------------------------------------------------------------------


def _orient_ccw(poly: np.ndarray) -> np.ndarray:
    """Normalize a closed polygon to positive signed area so that stroke
    pieces reinforce (winding +1) instead of canceling where they overlap."""
    x, y = poly[:, 0], poly[:, 1]
    area2 = np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)
    return poly if area2 >= 0 else poly[::-1]


def _arc_points(
    center: np.ndarray, radius: float, a0: float, a1: float, tolerance: float
) -> np.ndarray:
    """Polygonize an arc from angle a0 to a1 (shorter way respecting sign)."""
    sweep = a1 - a0
    max_step = 2.0 * math.acos(max(0.0, 1.0 - tolerance / max(radius, 1e-6)))
    n = max(1, int(math.ceil(abs(sweep) / max(max_step, 1e-3))))
    angles = a0 + sweep * np.arange(0, n + 1) / n
    return center + radius * np.stack([np.cos(angles), np.sin(angles)], axis=-1)


def stroke_subpath(
    pts: np.ndarray,
    width: float,
    cap: str = "butt",
    join: str = "miter",
    miter_limit: float = 10.0,
    tolerance: float = 0.1,
) -> List[np.ndarray]:
    """Expand one polyline into closed polygons covering its stroke.

    Emitted as a union of per-segment quads, join wedges and caps; every
    polygon is CCW-normalized so overlaps accumulate winding with the same
    sign (rendered with the nonzero rule, overlap is harmless).
    Canvas2D defaults: butt cap + miter join (limit 10); the reference's
    morph strokes use round/round (canvas-renderer.ts:263-264).
    """
    # Drop zero-length segments.
    keep = [0]
    for i in range(1, len(pts)):
        if np.hypot(*(pts[i] - pts[keep[-1]])) > 1e-9:
            keep.append(i)
    pts = pts[keep]
    h = width / 2.0
    polys: List[np.ndarray] = []
    if len(pts) < 2:
        # Degenerate subpath: Canvas draws a dot only for round caps.
        if len(pts) == 1 and cap == "round" and h > 0:
            circle = _arc_points(pts[0], h, 0.0, 2.0 * math.pi, tolerance)
            polys.append(_orient_ccw(circle[:-1]))
        return polys

    d = pts[1:] - pts[:-1]
    lengths = np.hypot(d[:, 0], d[:, 1])
    units = d / lengths[:, None]
    normals = np.stack([-units[:, 1], units[:, 0]], axis=-1) * h

    # Segment quads.
    for i in range(len(units)):
        p0, p1, n = pts[i], pts[i + 1], normals[i]
        polys.append(_orient_ccw(np.array([p0 + n, p1 + n, p1 - n, p0 - n])))

    # Joins at interior vertices.
    for i in range(len(units) - 1):
        p = pts[i + 1]
        u0, u1 = units[i], units[i + 1]
        n0, n1 = normals[i], normals[i + 1]
        cross = u0[0] * u1[1] - u0[1] * u1[0]
        dot = float(np.dot(u0, u1))
        if abs(cross) < 1e-12 and dot > 0:
            continue  # collinear, no gap
        side = 1.0 if cross < 0 else -1.0  # outer side of the turn
        a = p + side * n0
        b = p + side * n1
        if join == "round":
            a0 = math.atan2(*(a - p)[::-1])
            a1 = math.atan2(*(b - p)[::-1])
            # Sweep on the outer side (shorter way around).
            sweep = (a1 - a0 + math.pi) % (2.0 * math.pi) - math.pi
            arc = _arc_points(p, h, a0, a0 + sweep, tolerance)
            polys.append(_orient_ccw(np.concatenate([[p], arc])))
        elif join == "miter":
            # Half-angle: miter length ratio = 1 / sin(theta/2).
            sin_half = math.sqrt(max(0.0, (1.0 - dot) / 2.0))
            if sin_half > 1e-9 and 1.0 / sin_half <= miter_limit:
                bis = (a - p) + (b - p)
                norm = np.hypot(*bis)
                if norm > 1e-12:
                    tip = p + bis / norm * (h / sin_half)
                    polys.append(_orient_ccw(np.array([p, a, tip, b])))
                    continue
            polys.append(_orient_ccw(np.array([p, a, b])))  # fallback bevel
        else:  # bevel
            polys.append(_orient_ccw(np.array([p, a, b])))

    # Caps on open ends.
    if cap != "butt" and h > 0:
        for p_end, u in ((pts[0], -units[0]), (pts[-1], units[-1])):
            n = np.array([-u[1], u[0]]) * h
            if cap == "round":
                a0 = math.atan2(n[1], n[0])
                arc = _arc_points(p_end, h, a0, a0 - math.pi, tolerance)
                polys.append(_orient_ccw(arc))
            elif cap == "square":
                ext = u * h
                polys.append(
                    _orient_ccw(
                        np.array([p_end + n, p_end + n + ext, p_end - n + ext, p_end - n])
                    )
                )
    return polys


def polygons_to_edges(polys: Sequence[np.ndarray]) -> np.ndarray:
    """Closed polygons -> edge table (each polygon closed explicitly)."""
    rows: List[np.ndarray] = []
    for poly in polys:
        closed = np.concatenate([poly, poly[:1]], axis=0)
        rows.append(np.concatenate([closed[:-1], closed[1:]], axis=1))
    if not rows:
        return np.zeros((0, 4), dtype=np.float32)
    return np.concatenate(rows, axis=0).astype(np.float32)


def stroke_to_edges(
    subpaths: Sequence[np.ndarray],
    width: float,
    cap: str = "butt",
    join: str = "miter",
    miter_limit: float = 10.0,
    tolerance: float = 0.1,
) -> np.ndarray:
    polys: List[np.ndarray] = []
    for pts in subpaths:
        polys.extend(
            stroke_subpath(
                pts, width, cap=cap, join=join, miter_limit=miter_limit,
                tolerance=tolerance,
            )
        )
    return polygons_to_edges(polys)


def _clip_halfplane(edges: np.ndarray, coord: int, bound: float,
                    keep_below: bool) -> np.ndarray:
    """Clip an edge soup against ``coord <= bound`` (or ``>=`` when
    ``keep_below`` is False), preserving the winding integral of the kept
    region: outside portions are PROJECTED onto the boundary line rather
    than dropped, so the clipped shape stays closed (projected segments are
    parallel to the clip line and the scanline integral never sees
    boundary-collinear geometry as interior coverage)."""
    if edges.shape[0] == 0:
        return edges
    c0 = edges[:, coord]
    c1 = edges[:, coord + 2]
    if keep_below:
        in0, in1 = c0 <= bound, c1 <= bound
    else:
        in0, in1 = c0 >= bound, c1 >= bound
    if (in0 & in1).all():
        return edges
    parts = [edges[in0 & in1]]
    both_out = ~in0 & ~in1
    if both_out.any():
        seg = edges[both_out].copy()
        seg[:, coord] = bound
        seg[:, coord + 2] = bound
        parts.append(seg)
    cross = in0 ^ in1
    if cross.any():
        ce = edges[cross]
        cc0, cc1 = ce[:, coord], ce[:, coord + 2]
        t = (bound - cc0) / (cc1 - cc0)
        oc = ce[:, 1 - coord] + t * (ce[:, 3 - coord] - ce[:, 1 - coord])
        start_in = in0[cross]
        # first: start -> crossing point, second: crossing point -> end;
        # whichever half is outside collapses onto the boundary line.
        first = ce.copy()
        first[:, coord + 2] = bound
        first[:, 3 - coord] = oc
        first[:, coord] = np.where(start_in, first[:, coord], bound)
        second = ce.copy()
        second[:, coord] = bound
        second[:, 1 - coord] = oc
        second[:, coord + 2] = np.where(start_in, bound,
                                        second[:, coord + 2])
        parts.extend([first, second])
    return np.concatenate(parts, axis=0)


def clip_edges_rect(edges: np.ndarray, width: float, height: float,
                    xmin: float = 0.0, ymin: float = 0.0) -> np.ndarray:
    """Clip an edge table to the stage rect [xmin, width] x [ymin, height].

    The Flash player clips content at the EXACT stage bounds — which are
    fractional in pixels (stage size = bounds twips / 20, e.g. 709.3 px for
    flat-shapes/homestuck-beta-1) — while the raster is the ceil'd integer
    size; border pixels are therefore only partially coverable.  The golden
    captures reflect that (alpha 72 = 255 * 0.3 at the right edge of hb1).
    """
    edges = np.asarray(edges, dtype=np.float32)
    for coord, bound, keep_below in ((0, xmin, False), (0, width, True),
                                     (1, ymin, False), (1, height, True)):
        edges = _clip_halfplane(edges, coord, float(bound), keep_below)
    return edges.astype(np.float32)


def split_edges_y(edges: np.ndarray, max_extent: float = 64.0) -> np.ndarray:
    """Split segments so every edge's |y1 - y0| <= max_extent.

    Splitting a segment at interior points leaves the coverage integral
    unchanged; it bounds each edge's vertical footprint so the banded
    coverage kernel's per-tile-row windows stay tight."""
    edges = np.asarray(edges, dtype=np.float32)
    if edges.shape[0] == 0:
        return edges
    yext = np.abs(edges[:, 3] - edges[:, 1])
    n = np.maximum(1, np.ceil(yext / max_extent).astype(int))
    if (n == 1).all():
        return edges
    rows = []
    for (x0, y0, x1, y1), k in zip(edges, n):
        if k == 1:
            rows.append([[x0, y0, x1, y1]])
        else:
            t = np.linspace(0.0, 1.0, k + 1)
            xs = x0 + t * (x1 - x0)
            ys = y0 + t * (y1 - y0)
            rows.append(np.stack([xs[:-1], ys[:-1], xs[1:], ys[1:]], axis=1))
    return np.concatenate(rows, axis=0).astype(np.float32)


def pad_edges(edges: np.ndarray, multiple: int = 128) -> np.ndarray:
    """Pad an (E, 4) edge table to a multiple of ``multiple`` rows.

    Padding rows are all-zero degenerate edges, which contribute exactly
    nothing to coverage — the kernel needs no edge count."""
    count = edges.shape[0]
    padded = max(multiple, ((count + multiple - 1) // multiple) * multiple)
    out = np.zeros((padded, 4), dtype=np.float32)
    out[:count] = edges
    return out
