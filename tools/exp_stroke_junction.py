"""Stroke junction model study (round 4) — COMMITTED simulation.

VERDICT r3 #1 proposed per-piece caps + junction-local coverage
summation for hb1's six seam pixels.  This study disproved that family
and identified the real mechanism (PERF.md round 4):

1. the round-1 miter tip distance bug (h/sin(phi/2) instead of
   h/cos(phi/2); identical only at 90° turns), and
2. the player drawing v1 LINESTYLE strokes with BUTT caps + MITER
   joins (limit 3), not the ast's nominal round/round defaults.

Running this sweeps cap/join models over the full hb1 render (white
fill + two black stroke paths, exact stage clip, premul-u8 metric) and
prints the per-model golden error, plus the measured coverage
decomposition at the two remaining bottom-border T-junction pixels
(645,308/309) under the rejected combination rules.

Usage: python tools/exp_stroke_junction.py

RESULT (round 4): round/round pm-max 130, butt/miter(3) 52,
butt/round 131, square/miter 92.  At (645,308)/(645,309):
union 0.527/0.750, saturating piece-sum 0.723/0.814, gold 0.702/0.953
— no tested model reaches the golden there (see PERF.md for the full
list of rejected T-junction variants).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from swf_renderer_tpu.models import display
from swf_renderer_tpu.models.ast_io import parse_define_shape
from swf_renderer_tpu.models.decode_shape import decode_shape
from swf_renderer_tpu.models.geometry import (
    Affine, TWIPS_PER_PX, clip_edges_rect, deoverlap_edges,
    path_to_subpaths, polygons_to_edges, stroke_subpath,
    subpaths_to_fill_edges,
)
from swf_renderer_tpu.ops.coverage import coverage_numpy
from swf_renderer_tpu.utils.png import read_png

REF = pathlib.Path("/root/reference/tests")


def setup():
    d = REF / "flat-shapes" / "homestuck-beta-1"
    tag = parse_define_shape((d / "ast.json").read_text())
    compiled = decode_shape(tag)
    stage = display.stage_for_shape(tag)
    ctm = Affine.scaling(1 / TWIPS_PER_PX, 1 / TWIPS_PER_PX).then(
        Affine.from_swf_matrix(stage.children[0].matrix))
    gold = read_png(d / "shape.png").astype(np.float64)
    return compiled, stage, ctm, gold


def render(compiled, stage, ctm, cap, join, ml):
    scale = max(ctm.max_scale(), 1e-6)
    tol = 0.1 / scale
    clip = (stage.exact_width, stage.exact_height)
    H, W = stage.height, stage.width
    fill_sub = path_to_subpaths(compiled.paths[0].commands, ctm, 0.1, True)
    fill_cov = coverage_numpy(
        clip_edges_rect(subpaths_to_fill_edges(fill_sub), *clip), H, W)
    pm = fill_cov[..., None] * np.array([1, 1, 1, 1.0])
    for pi in (1, 2):
        sps = path_to_subpaths(compiled.paths[pi].commands,
                               Affine.identity(), tol, True)
        polys = []
        for pts in sps:
            polys.extend(stroke_subpath(pts, 60.0, cap=cap, join=join,
                                        miter_limit=ml, tolerance=tol))
        polys = [ctm.apply(p) for p in polys]
        e = clip_edges_rect(deoverlap_edges(polygons_to_edges(polys)),
                            *clip)
        c = coverage_numpy(e, H, W)[..., None]
        pm = pm * (1 - c) + np.array([0, 0, 0, 1.0]) * c
    a = pm[..., 3:4]
    with np.errstate(invalid="ignore", divide="ignore"):
        rgb = np.where(a > 0, pm[..., :3] / a, 0)
    return np.round(np.clip(np.concatenate([rgb, a], -1), 0, 1) * 255)


def pm_diff(o, g):
    ao, ag = o[..., 3:4] / 255.0, g[..., 3:4] / 255.0
    pmo = np.concatenate([np.round(o[..., :3] * ao), o[..., 3:4]], -1)
    pmg = np.concatenate([np.round(g[..., :3] * ag), g[..., 3:4]], -1)
    return np.abs(pmo - pmg).max(-1)


def main():
    compiled, stage, ctm, gold = setup()
    for cap, join, ml in [("round", "round", 3), ("butt", "miter", 3),
                          ("butt", "round", 3), ("square", "miter", 3),
                          ("butt", "miter", 10)]:
        out = render(compiled, stage, ctm, cap, join, ml)
        diff = pm_diff(out, gold)
        print(f"cap={cap:6s} join={join:5s} ml={ml:2d}: "
              f"pm_max={diff.max():4.0f} n>10={(diff > 10).sum():4d} "
              f"mean={diff.mean():.4f}")

    # T-junction decomposition at the remaining two pixels.
    scale = max(ctm.max_scale(), 1e-6)
    tol = 0.1 / scale
    clip = (stage.exact_width, stage.exact_height)
    H, W = stage.height, stage.width
    sps = path_to_subpaths(compiled.paths[1].commands, Affine.identity(),
                           tol, True)

    def cov(polys):
        e = clip_edges_rect(deoverlap_edges(polygons_to_edges(polys)),
                            *clip)
        return coverage_numpy(e, H, W)

    p0 = [ctm.apply(p) for p in stroke_subpath(
        sps[0], 60.0, cap="butt", join="miter", miter_limit=3,
        tolerance=tol)]
    p2 = [ctm.apply(p) for p in stroke_subpath(
        sps[2], 60.0, cap="butt", join="miter", miter_limit=3,
        tolerance=tol)]
    c0, c2, cu = cov(p0), cov(p2), cov(p0 + p2)
    for (y, x) in ((645, 308), (645, 309)):
        s = min(1.0, c0[y, x] + c2[y, x])
        print(f"({y},{x}) sub0={c0[y, x]:.3f} sub2={c2[y, x]:.3f} "
              f"union={cu[y, x]:.3f} sat-sum={s:.3f} "
              f"gold={gold[y, x, 3] / 255:.3f}")


if __name__ == "__main__":
    main()
