"""Scanline cell-accumulation rasterization: O(perimeter + pixels).

The direct coverage kernels (ops/coverage.py) pay O(edges × pixels).  This
module implements the classic cell-accumulation algorithm (the same model as
FreeType/stb_truetype rasterizers, recast for TPU):

1. **Cell split (host)** — every edge is split at integer x and y crossings
   so each sub-segment lies inside one pixel cell.  Total sub-segments are
   O(path perimeter in pixels), independent of the fill area.
2. For a sub-segment in cell (r, c) from (x0, y0) to (x1, y1):
   * ``area``  = dy * (c + 1 - (x0 + x1)/2) — the exact trapezoid area to
     the right of the segment inside this cell (signed by direction), the
     segment's winding-integral contribution to its OWN pixel;
   * ``cover`` = dy — its contribution to every pixel strictly to the right.
3. **Scatter + prefix sum (device)** — scatter ``area`` into an (H, W)
   plane and ``cover`` into column c+1 of an (H, W+1) plane, then

       winding_integral = area_plane + cumsum_x(cover_plane)[:, :W]

   which equals the analytic winding integral per pixel exactly, at HBM
   bandwidth.  The fill rule then maps it to coverage as usual.

Both steps are dense-shape friendly: cell lists are padded (padding rows
carry zero area/cover and scatter to a dump slot).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .coverage import FILL_RULE_NONZERO, apply_fill_rule


# ---------------------------------------------------------------------------
# Host: edge -> cell list
# ---------------------------------------------------------------------------


def edges_to_cells(
    edges: np.ndarray, height: int, width: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Split edges into pixel-cell crossings.

    Returns (rows, cols, area, cover) int32/int32/f32/f32 arrays, one entry
    per cell crossing.  Geometry outside the viewport is clipped: x is
    clamped into [0, W] (preserving the vertical extent so left-of-viewport
    geometry still contributes cover), y spans are clipped to [0, H].
    """
    edges = np.asarray(edges, dtype=np.float64)
    if edges.shape[0] == 0:
        z = np.zeros(0)
        return z.astype(np.int32), z.astype(np.int32), z.astype(np.float64), z
    if not np.isfinite(edges).all():
        raise ValueError("non-finite edge coordinates")

    x0, y0, x1, y1 = edges[:, 0], edges[:, 1], edges[:, 2], edges[:, 3]
    # Drop horizontal edges (dy == 0 contributes nothing).
    keep = y0 != y1
    x0, y0, x1, y1 = x0[keep], y0[keep], x1[keep], y1[keep]
    if x0.size == 0:
        z = np.zeros(0)
        return z.astype(np.int32), z.astype(np.int32), z.astype(np.float64), z

    # Clip y spans to the viewport (x at the clip computed by interpolation).
    t_lo = np.clip((0.0 - y0) / (y1 - y0), 0.0, 1.0)
    t_hi = np.clip((height - y0) / (y1 - y0), 0.0, 1.0)
    ta = np.minimum(t_lo, t_hi)
    tb = np.maximum(t_lo, t_hi)
    nx0 = x0 + (x1 - x0) * ta
    ny0 = y0 + (y1 - y0) * ta
    nx1 = x0 + (x1 - x0) * tb
    ny1 = y0 + (y1 - y0) * tb
    keep = ny0 != ny1
    x0, y0, x1, y1 = nx0[keep], ny0[keep], nx1[keep], ny1[keep]
    if x0.size == 0:
        z = np.zeros(0)
        return z.astype(np.int32), z.astype(np.int32), z.astype(np.float64), z

    rows_out = []
    cols_out = []
    area_out = []
    cover_out = []
    for ex0, ey0, ex1, ey1 in zip(x0, y0, x1, y1):
        # Split at every integer y crossing and at integer x crossings
        # inside [0, W] (x is NOT pre-clamped — clamping before splitting
        # would bend the line; whole sub-pieces outside [0, W] are handled
        # exactly by midpoint clamping below).
        ts = [0.0, 1.0]
        dy = ey1 - ey0
        dx = ex1 - ex0
        ylo, yhi = sorted((ey0, ey1))
        for yc in range(int(np.floor(ylo)) + 1, int(np.ceil(yhi))):
            ts.append((yc - ey0) / dy)
        if dx != 0.0:
            xlo, xhi = sorted((ex0, ex1))
            xc_start = max(0, int(np.floor(xlo)) + 1)
            xc_stop = min(width, int(np.ceil(xhi)) - 1)
            for xc in range(xc_start, xc_stop + 1):
                if xlo < xc < xhi:
                    ts.append((xc - ex0) / dx)
        ts = np.unique(np.clip(np.asarray(ts), 0.0, 1.0))
        sx = ex0 + dx * ts
        sy = ey0 + dy * ts
        for i in range(len(ts) - 1):
            ax, ay, bx, by = sx[i], sy[i], sx[i + 1], sy[i + 1]
            sub_dy = by - ay
            if sub_dy == 0.0:
                continue
            # A sub-piece is either inside one cell column or entirely
            # outside [0, W]; clamping its midpoint maps left-of-viewport
            # pieces to full coverage of column 0 (area = dy) and
            # right-of-viewport pieces to zero area in column W-1.
            mx = min(max(0.5 * (ax + bx), 0.0), float(width))
            my = 0.5 * (ay + by)
            r = int(np.floor(my))
            c = int(np.floor(mx))
            r = min(max(r, 0), height - 1)
            c = min(max(c, 0), width - 1)
            rows_out.append(r)
            cols_out.append(c)
            area_out.append(sub_dy * (c + 1.0 - mx))
            cover_out.append(sub_dy)

    return (
        np.asarray(rows_out, dtype=np.int32),
        np.asarray(cols_out, dtype=np.int32),
        np.asarray(area_out, dtype=np.float64),
        np.asarray(cover_out, dtype=np.float64),
    )


def coverage_scanline_numpy(edges, height, width,
                            fill_rule=FILL_RULE_NONZERO) -> np.ndarray:
    """NumPy reference of the scanline pipeline (tests)."""
    rows, cols, area, cover = edges_to_cells(edges, height, width)
    area_plane = np.zeros((height, width))
    cover_plane = np.zeros((height, width + 1))
    np.add.at(area_plane, (rows, cols), area)
    np.add.at(cover_plane, (rows, cols + 1), cover)
    acc = area_plane + np.cumsum(cover_plane, axis=1)[:, :width]
    if fill_rule == FILL_RULE_NONZERO:
        return np.minimum(np.abs(acc), 1.0)
    m = np.mod(acc, 2.0)
    return 1.0 - np.abs(m - 1.0)


def edges_to_point_cells(edges: np.ndarray, height: int, width: int,
                         ss: int = 4):
    """Cell deltas for POINT-SAMPLED winding on an ss x ss subsample grid.

    The Flash player at quality "high" supersamples 4x4 per pixel with
    binary point-inside tests; the golden corpus was captured from it.  For
    each edge and each subsample row (line y = R + 0.5 on the ss-scaled
    grid, half-open [ymin, ymax) span), the crossing column is
    ``floor(x + 0.5)``: samples at C >= that column count the edge.
    Returns (rows, cols, delta) for an (ss*H, ss*W + 1) delta plane whose
    x-cumsum is the integer winding at every subsample.
    """
    edges = np.asarray(edges, dtype=np.float64) * ss
    out_r, out_c, out_d = [], [], []
    sh, sw = height * ss, width * ss
    for x0, y0, x1, y1 in edges:
        if y0 == y1:
            continue
        sign = 1.0 if y1 > y0 else -1.0
        ylo, yhi = min(y0, y1), max(y0, y1)
        r_start = max(0, int(np.ceil(ylo - 0.5)))
        r_stop = min(sh - 1, int(np.floor(yhi - 0.5 - 1e-12)))
        if (yhi - 0.5) == np.floor(yhi - 0.5):  # half-open upper bound
            r_stop = min(r_stop, int(yhi - 0.5) - 1)
        for r in range(r_start, r_stop + 1):
            yline = r + 0.5
            if not (ylo <= yline < yhi):
                continue
            t = (yline - y0) / (y1 - y0)
            x = x0 + t * (x1 - x0)
            c = int(np.floor(x + 0.5))
            c = min(max(c, 0), sw)
            out_r.append(r)
            out_c.append(c)
            out_d.append(sign)
    return (
        np.asarray(out_r, dtype=np.int32),
        np.asarray(out_c, dtype=np.int32),
        np.asarray(out_d, dtype=np.float64),
    )


def coverage_flash4x4_numpy(edges, height, width,
                            fill_rule=FILL_RULE_NONZERO,
                            ss: int = 4) -> np.ndarray:
    """NumPy reference of the point-sampled (Flash quality-high) coverage."""
    rows, cols, delta = edges_to_point_cells(edges, height, width, ss)
    plane = np.zeros((height * ss, width * ss + 1))
    np.add.at(plane, (rows, cols), delta)
    winding = np.cumsum(plane, axis=1)[:, : width * ss]
    if fill_rule == FILL_RULE_NONZERO:
        inside = (np.abs(winding) >= 0.5).astype(np.float64)
    else:
        inside = (np.mod(np.abs(np.round(winding)), 2) == 1).astype(np.float64)
    return inside.reshape(height, ss, width, ss).mean(axis=(1, 3))


def pack_cells(cell_lists, pad_multiple: int = 512, sort: bool = True):
    """Pad per-draw cell lists to a common static length.

    Returns (rows, cols, area, cover) of shape (P, N); padding entries have
    zero area/cover (harmless wherever they scatter).  With ``sort`` (the
    default) each draw's cells are ordered row-major — cell order never
    affects the accumulated planes, but sorted order lets the device scatter
    take the sorted-segment fast path."""
    count = max(1, max(r.shape[0] for r, _, _, _ in cell_lists))
    n = ((count + pad_multiple - 1) // pad_multiple) * pad_multiple
    p = len(cell_lists)
    rows = np.zeros((p, n), np.int32)
    cols = np.zeros((p, n), np.int32)
    area = np.zeros((p, n), np.float32)
    cover = np.zeros((p, n), np.float32)
    for i, (r, c, a, v) in enumerate(cell_lists):
        k = r.shape[0]
        if sort and k:
            order = np.lexsort((c, r))
            r, c, a, v = r[order], c[order], a[order], v[order]
        rows[i, :k] = r
        cols[i, :k] = c
        area[i, :k] = a
        cover[i, :k] = v
    return rows, cols, area, cover


# ---------------------------------------------------------------------------
# Device: scatter + prefix sum
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("height", "width", "fill_rule", "ss")
)
def coverage_scanline_points(
    rows: jax.Array,   # (P, N) int32 on the ss-scaled grid
    cols: jax.Array,   # (P, N) int32
    delta: jax.Array,  # (P, N) f32 crossing signs
    height: int,
    width: int,
    fill_rule: int = FILL_RULE_NONZERO,
    ss: int = 4,
) -> jax.Array:
    """Point-sampled (Flash quality-high) coverage from point cells:
    scatter + cumsum -> binary inside test per subsample -> box average."""
    p, n = rows.shape
    sh, sw = height * ss, width * ss
    stride = sw + 1
    base = jnp.arange(p, dtype=jnp.int32)[:, None] * (sh * stride)
    idx = (base + rows * stride + cols).reshape(-1)
    plane = jax.ops.segment_sum(
        delta.reshape(-1), idx, num_segments=p * sh * stride
    ).reshape(p, sh, stride)
    winding = jnp.cumsum(plane, axis=2)[:, :, :sw]

    def _inside(w, rule):
        if rule == FILL_RULE_NONZERO:
            return (jnp.abs(w) >= 0.5).astype(jnp.float32)
        return (jnp.mod(jnp.abs(jnp.round(w)), 2.0) == 1.0).astype(
            jnp.float32)

    if isinstance(fill_rule, tuple) and len(set(fill_rule)) > 1:
        # One rule PER PLANE (mixed even-odd / nonzero draw lists).
        inside = jnp.stack([_inside(winding[i], fill_rule[i])
                            for i in range(p)])
    else:
        inside = _inside(winding, fill_rule[0]
                         if isinstance(fill_rule, tuple) else fill_rule)
    return inside.reshape(p, height, ss, width, ss).mean(axis=(2, 4))


@functools.partial(jax.jit, static_argnames=("height", "width", "fill_rule"))
def coverage_scanline(
    rows: jax.Array,   # (P, N) int32
    cols: jax.Array,   # (P, N) int32
    area: jax.Array,   # (P, N) f32
    cover: jax.Array,  # (P, N) f32
    height: int,
    width: int,
    fill_rule: int = FILL_RULE_NONZERO,
) -> jax.Array:
    """Cell lists -> (P, H, W) coverage via scatter-add + cumsum."""
    p, n = rows.shape
    # Flatten to one scatter per plane: index = draw * H * (W+1) + r*(W+1)+c.
    stride = width + 1
    base = jnp.arange(p, dtype=jnp.int32)[:, None] * (height * stride)
    flat_area_idx = base + rows * stride + cols
    flat_cover_idx = base + rows * stride + (cols + 1)

    planes = jnp.zeros((p * height * stride,), jnp.float32)
    area_plane = planes.at[flat_area_idx.reshape(-1)].add(area.reshape(-1))
    cover_plane = planes.at[flat_cover_idx.reshape(-1)].add(cover.reshape(-1))

    area_plane = area_plane.reshape(p, height, stride)
    cover_plane = cover_plane.reshape(p, height, stride)
    acc = area_plane + jnp.cumsum(cover_plane, axis=2)
    acc = acc[:, :, :width]
    if isinstance(fill_rule, tuple):
        # One rule PER PLANE (mixed even-odd / nonzero draw lists).
        if len(set(fill_rule)) == 1:
            return apply_fill_rule(acc, fill_rule[0])
        return jnp.stack([apply_fill_rule(acc[i], fill_rule[i])
                          for i in range(p)])
    return apply_fill_rule(acc, fill_rule)


@functools.partial(jax.jit, static_argnames=("height", "width", "fill_rule"))
def render_scanline_batch(
    rows: jax.Array,    # (F, L, N) int32
    cols: jax.Array,    # (F, L, N) int32
    area: jax.Array,    # (F, L, N) f32
    cover: jax.Array,   # (F, L, N) f32
    colors: jax.Array,  # (F, L, 4) f32 straight RGBA
    height: int,
    width: int,
    fill_rule: int = FILL_RULE_NONZERO,
) -> jax.Array:
    """Batched frames from cell lists: coverage -> composite -> u8.

    Scans over frames so peak memory is one frame's L coverage planes, not
    the whole batch.  Returns (F, H, W, 4) uint8.
    """
    from .composite import composite_solid_layers, premul_to_straight_u8

    def one_frame(_, inputs):
        fr, fc, fa, fv, fcol = inputs
        cov = coverage_scanline(fr, fc, fa, fv, height, width, fill_rule)
        frame_pm = composite_solid_layers(cov, fcol)
        return None, premul_to_straight_u8(frame_pm)

    _, frames = jax.lax.scan(one_frame, None, (rows, cols, area, cover, colors))
    return frames


def lower_draws_to_cells(draw_edge_tables, height, width,
                         pad_multiple: int = 512):
    """Host helper: list of (E_i, 4) edge tables -> packed cell arrays."""
    cells = [edges_to_cells(e, height, width) for e in draw_edge_tables]
    return pack_cells(cells, pad_multiple)
