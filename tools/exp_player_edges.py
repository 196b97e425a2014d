"""Player edge-position forensics on the triangle golden (round 4) — COMMITTED.

The triangle sample is a SINGLE solid fill (one straight-edge loop,
reference tests/flat-shapes/triangle/ast.json) yet its premul residual
vs the Flash-player capture is 13 — the cleanest possible testbed for
the player's FILL rasterization model (no strokes, no curves, no
conflation).  This study recovers the golden's actual edge geometry
and tests every capture/rasterizer model family we could construct.

Method: for a straight edge under exact-area AA, the per-column
(per-row) coverage sums recover the edge line's sub-pixel position
EXACTLY.  Applied to the golden:

* Edge B (bottom, slope 16/502, interior above): the golden's
  band-integrated edge line sits 0.017 px (0.34 twip) ABOVE the
  analytic line, while the coverage AT the crossing row is a constant
  0.032 px short (flat across all sub-pixel-phase bins) — i.e. part of
  the deficit redistributes into the adjacent row: the player's edge
  profile is SOFTER than box-filter exact area, so no pure edge shift
  can zero it.  A scanline-locked sawtooth of ~0.01-0.03 px rides on
  it whose jump sizes repeat with period 8 scanline-spans (the span is
  31.375 px = 251/8 — consistent with 1/8-px-grained crossing phases).
* Edge R (steep, 45.9 deg): golden edge 0.019 px RIGHT (outward).
* Edge L (steep, 30 deg): golden edge EXACT (offset 0.002 px ~ 0).

Models tested against the full image (premul metric, u8):

| model | pm_max | n>2 | verdict |
|---|---|---|---|
| exact area (production) | 13 | 752 | baseline |
| global integer-twip shifts (dx,dy in [-2..2]) | >=13 | >=752 | falsified (0,0 optimal) |
| capture y-shrink 6339/6340 (rounded-up stage fit) | 18 | 883 | falsified |
| fitted micro-affine (scale 0.99993 @ (290,-149) + sub-twip t) | 12 | 328 | halves n>2, max stays 12: the ripple is intrinsic |
| 4x4 / NxN grid sampling | — | — | falsified upstream: golden AA alphas are continuous, not k/N^2 |
| 4-subrow (vertical supersample) scanlines | — | — | falsified: recovered edge varies smoothly within 1/20 px, no 1/4 staircase |
| coverage gamma / transfer function | — | — | falsified: offset flat across coverage bins (a gamma must vary with c) |
| quantized scanline crossings, floor/round x {1/4,1/8,1/16} x y {1/16,1/8,1/256,none} | best 11 | best 739 | falsified: no variant beats exact area |

Conclusion: the player's software rasterizer places these edges with
per-edge constant normal offsets up to 0.032 px plus a ~0.01-0.03 px
fixed-point ripple, in a pattern no consistent geometric transform,
sampling grid, transfer function, or quantized-crossing model
reproduces.  One twip (1/20 px) of edge-position disagreement on a
unit-alpha fill is 13/255 of premul error — exactly the observed max.
The <=2/255 north star vs the PLAYER captures is therefore not
reachable by adjusting an exact-area rasterizer's geometry; it would
require byte-level emulation of the closed player's fixed-point DDA,
unidentifiable from five samples.  The reference's own acceptance gate
(pixelmatch 0.05, includeAA off, reference ts render tests) passes;
budgets stay ratcheted at the QUALITY.md values.

Usage: python tools/exp_player_edges.py   (CPU, ~4 min: the
quantized-crossing sweep rasterizes ~950-segment polylines 8x)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from swf_renderer_tpu.ops.coverage import coverage_numpy
from swf_renderer_tpu.utils.png import read_png

REF = pathlib.Path("/root/reference/tests/flat-shapes/triangle")

# Local-space triangle vertices in device px (ast bounds 380..10420 x
# 820..7159 twips, translated by -min): A bottom-left, C bottom-right,
# P apex.
A, C, P = (0.0, 300.95), (502.0, 316.95), (175.0, 0.0)


def recover_edges(gcov):
    """Edge-line offsets of the golden vs the analytic lines."""
    H, W = gcov.shape
    xs = np.arange(5, 468)
    res = np.array([295 + gcov[295:, x].sum() for x in xs])
    ana = 300.95 + (16.0 / 502.0) * xs
    b_off = (res - ana)
    r_off = []
    for y in range(8, 290):
        xa = 175 + (327 / 316.95) * (y + 0.5)
        x0 = int(xa) - 6
        r_off.append(x0 + gcov[y, x0:].sum() - xa)
    l_off = []
    for y in range(8, 295):
        xa = 175 - (175 / 300.95) * (y + 0.5)
        x1 = int(xa) + 7
        l_off.append(x1 - gcov[y, :x1].sum() - xa)
    print(f"edge B (y-offset): mean {np.mean(b_off):+.4f} px "
          f"std {np.std(b_off):.4f}")
    print(f"edge R (x-offset): mean {np.mean(r_off):+.4f} px "
          f"std {np.std(r_off):.4f}")
    print(f"edge L (x-offset): mean {np.mean(l_off):+.4f} px "
          f"std {np.std(l_off):.4f}")


def densify(edges, qx, qy, mode):
    """Edges split at integer scanlines, crossings quantized to a
    1/qx px grid (the candidate fixed-point rasterizer model)."""
    q = np.floor if mode == "floor" else np.round
    segs = []
    for (x0, y0), (x1, y1) in edges:
        y0q = q(y0 / qy) * qy if qy else y0
        y1q = q(y1 / qy) * qy if qy else y1
        if y0q == y1q:
            continue
        lo, hi = sorted((y0q, y1q))
        inner = [float(v) for v in range(int(np.floor(lo)) + 1,
                                         int(np.ceil(hi)))]
        ys = ([y0q] + inner + [y1q] if y0q < y1q
              else [y0q] + inner[::-1] + [y1q])
        pts = []
        for yy in ys:
            t = (yy - y0q) / (y1q - y0q)
            xx = x0 + t * (x1 - x0)
            pts.append((q(xx / qx) * qx if qx else xx, yy))
        for a, b in zip(pts[:-1], pts[1:]):
            segs.append([a[0], a[1], b[0], b[1]])
    return np.array(segs, np.float64)


def main():
    gold = read_png(REF / "shape.png").astype(np.float64)
    gcov = gold[..., 3] / 255.0
    H, W = gcov.shape
    recover_edges(gcov)

    edges = [(A, C), (C, P), (P, A)]
    base = coverage_numpy(
        np.array([[*A, *C], [*C, *P], [*P, *A]]), H, W)
    dp = np.abs(np.round(base * 255) - np.round(gcov * 255))
    print(f"exact area: pm_max={dp.max():.0f} n>2={(dp > 2).sum()}")
    for mode in ("floor", "round"):
        for qx in (1 / 8, 1 / 16):
            for qy in (1 / 16, None):
                cov = coverage_numpy(densify(edges, qx, qy or 0, mode),
                                     H, W)
                d = np.abs(np.round(cov * 255) - np.round(gcov * 255))
                print(f"crossings {mode} qx=1/{int(1 / qx)} "
                      f"qy={'none' if not qy else '1/16'}: "
                      f"max={d.max():.0f} n>2={(d > 2).sum()}")


if __name__ == "__main__":
    main()
