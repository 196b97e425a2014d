"""Stroke piece-composite model study (round 3) — COMMITTED simulation.

Three candidate models for how the player rasterizes strokes:

1. **union** (production): one outline loop, de-overlapped to the union
   boundary, winding-integral AA.  hb1 residual = 6 seam pixels; hb29
   residual = ~20 near-border curve pixels, gold 12-22 HIGHER alpha.
2. **winding conflation** (round 1, rejected): per-segment quads + join
   wedges in ONE winding integral — seams over-count (16 pixels >= 40
   off on hb1).
3. **piece composite** (this experiment): each segment quad / join wedge
   / cap rasterized as its OWN draw with analytic AA, composited
   source-over with the same color — overlap saturates as
   1-(1-c1)(1-c2), between union's max() and conflation's sum().

This tool renders hb29@0 under models 1 and 3 at quality='flash'
semantics (pow2 flattening, SWF caps, exact-stage clip) and reports the
golden error for each.  Usage: python tools/exp_stroke_pieces.py

RESULT (round 3): model 3 is BIT-IDENTICAL to the union on hb29 — on a
smooth curve, piece overlaps concentrate where coverage is already ~1
and the per-pixel composite difference stays below one u8 quantum.  The
hb29 near-border residual (gold 12-22 alpha HIGHER along x<6 curve
columns) is therefore NOT a piece-composite effect; it remains a
player-rasterizer curve/stroke model difference (budgeted in the
ratchet).  Together with exp_border_stroke.py this closes round 3's
border-model investigation: union stays.
"""

import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from swf_renderer_tpu.models import ast, display, ir
from swf_renderer_tpu.models.ast_io import (
    parse_define_morph_shape, parse_define_shape,
)
from swf_renderer_tpu.models.geometry import (
    Affine, TWIPS_PER_PX, _arc_points, clip_edges_rect, path_to_subpaths,
    polygons_to_edges,
)
from swf_renderer_tpu.ops.composite import (
    composite_draws, premul_to_straight_u8,
)
from swf_renderer_tpu.ops.coverage import coverage_numpy
from swf_renderer_tpu.runtime.renderer import (
    render_morph_shape, render_shape,
)
from swf_renderer_tpu.runtime.scene import SceneCompiler, lerp_morph_commands, lerp_rgba, lerp
from swf_renderer_tpu.utils.png import read_png

REF = pathlib.Path("/root/reference/tests")


def stroke_pieces(pts, width, cap="round", join="round", tolerance=0.1):
    """Per-segment quads + join wedges + caps as SEPARATE polygons."""
    keep = [0]
    for i in range(1, len(pts)):
        if np.hypot(*(pts[i] - pts[keep[-1]])) > 1e-9:
            keep.append(i)
    pts = pts[keep]
    h = width / 2.0
    out = []
    if len(pts) < 2:
        if len(pts) == 1 and cap == "round" and h > 0:
            out.append(_arc_points(pts[0], h, 0.0, 2 * math.pi, tolerance))
        return out
    closed = len(pts) >= 4 and np.hypot(*(pts[0] - pts[-1])) < 1e-9
    seg_pts = pts if not closed else pts
    n = len(seg_pts) - 1
    d = seg_pts[1:] - seg_pts[:-1]
    ln = np.hypot(d[:, 0], d[:, 1])
    u = d / ln[:, None]
    nr = np.stack([-u[:, 1], u[:, 0]], -1) * h
    for i in range(n):
        a, b = seg_pts[i], seg_pts[i + 1]
        out.append(np.asarray([a + nr[i], b + nr[i], b - nr[i],
                               a - nr[i]]))
    # Round join disks at interior vertices (the player's round join is a
    # full disk of radius h in the conflation model; as separate draws a
    # disk is the natural piece).
    interior = range(1, n) if not closed else range(len(seg_pts))
    for i in interior:
        out.append(_arc_points(seg_pts[i % len(seg_pts)], h, 0.0,
                               2 * math.pi, tolerance)[:-1])
    if not closed and cap == "round":
        for p in (seg_pts[0], seg_pts[-1]):
            out.append(_arc_points(p, h, 0.0, 2 * math.pi,
                                   tolerance)[:-1])
    return out


def render_piece_model(draw_specs, height, width, clip):
    """draw_specs: list of ('fill', edges, color) or
    ('stroke', subpaths, width, cap, join, tol, ctm, color)."""
    covs, cols = [], []
    for spec in draw_specs:
        if spec[0] == "fill":
            _, edges, color = spec
            covs.append(coverage_numpy(edges, height, width))
            cols.append(color)
        else:
            _, subpaths, w_, cap, join, tol, ctm, color = spec
            for pts in subpaths:
                for poly in stroke_pieces(pts, w_, cap, join, tol):
                    edges = polygons_to_edges([ctm.apply(poly)])
                    if clip is not None:
                        edges = clip_edges_rect(edges, clip[0], clip[1])
                    if edges.shape[0] == 0:
                        continue
                    covs.append(coverage_numpy(edges, height, width))
                    cols.append(color)
    fields = np.broadcast_to(
        np.asarray(cols, np.float32)[:, None, None, :],
        (len(covs), height, width, 4))
    pm = composite_draws(jnp.asarray(np.stack(covs), jnp.float32),
                         jnp.asarray(fields))
    return np.asarray(premul_to_straight_u8(pm))


def hb29_specs(ratio):
    d = REF / "flat-morph-shapes" / "homestuck-beta-29"
    tag = parse_define_morph_shape((d / "ast.json").read_text())
    stage = display.stage_for_morph_shape(tag, ratio)
    ctm = Affine.scaling(1 / TWIPS_PER_PX, 1 / TWIPS_PER_PX).then(
        Affine.from_swf_matrix(stage.children[0].matrix))
    from swf_renderer_tpu.models.decode_morph_shape import (
        decode_morph_shape,
    )

    compiled = decode_morph_shape(tag)
    clip = (stage.exact_width, stage.exact_height)
    specs = []
    for path in compiled.paths:
        commands = lerp_morph_commands(path.commands, ratio)
        if path.fill is not None:
            color = lerp_rgba(path.fill.start_color, path.fill.end_color,
                              ratio)
            subpaths = path_to_subpaths(commands, ctm, 0.1, True)
            from swf_renderer_tpu.models.geometry import (
                subpaths_to_fill_edges,
            )

            edges = clip_edges_rect(subpaths_to_fill_edges(subpaths),
                                    *clip)
            specs.append(("fill", edges, color))
        if path.line is not None:
            w_ = lerp(path.line.width[0], path.line.width[1], ratio)
            color = lerp_rgba(path.line.fill.start_color,
                              path.line.fill.end_color, ratio)
            scale = max(ctm.max_scale(), 1e-6)
            tol = 0.1 / scale
            subpaths = path_to_subpaths(commands, Affine.identity(), tol,
                                        True)
            specs.append(("stroke", subpaths, w_, "round", "round", tol,
                          ctm, color))
    return specs, stage, (d / f"{int(ratio * (1 << 16))}.png")


def stats(actual, golden):
    diff = np.abs(actual.astype(np.int32) - golden.astype(np.int32))
    return (int(diff.max()), int((diff.max(-1) > 10).sum()),
            float(diff.mean()))


def main():
    specs, stage, gold_path = hb29_specs(0.0)
    golden = read_png(gold_path)
    union = render_morph_shape(
        parse_define_morph_shape(
            (REF / "flat-morph-shapes" / "homestuck-beta-29" /
             "ast.json").read_text()), 0.0, quality="flash")
    pieces = render_piece_model(specs, stage.height, stage.width,
                                (stage.exact_width, stage.exact_height))
    print("hb29@0  union :", stats(union, golden))
    print("hb29@0  pieces:", stats(pieces, golden))


if __name__ == "__main__":
    main()
