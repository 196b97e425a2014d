"""Border-stroke model study (round 3) — COMMITTED simulation.

VERDICT r2 #3 asked to implement the characterized "inner-half stroke at
the stage border" model under quality='flash' and re-measure hb1/hb29.
This tool IS the simulation (round 2's scripts were ephemeral); running it
reproduces the falsification recorded in PERF.md:

* The candidate model (subtract the stroke's outer half along
  border-parallel path stretches — scene._border_subtraction_rings,
  plumbed through SceneCompiler(border_inner_half=True)) makes hb1 WORSE:
  max 130 -> 255, >40-diff pixels 3 -> 527.  The golden keeps the FULL
  (exact-clip) stroke along the right border (x=707..709, alpha
  255/255/77), so the player does NOT halve border strokes in general.
* The CURRENT union-stroke render already matches the left border's
  "inner-half-looking" values (col 0 rows 170+: ours 142..159 vs gold
  144..159 — within 2/255); PERF.md round 2's description of that stretch
  predates the outline-stroking fix.
* The remaining hb1 residual is SIX pixels, all stroke-JUNCTION /
  piece-overlap locations where the golden's value matches the SUM of the
  overlapping stroke pieces' coverages (the round-1 "conflation"
  renderer) rather than the union: (168,0)/(169,0) cap start,
  (419,12)/(458,693) join seams, (645,308)/(645,309) bottom junction.
  The conflation model scores worse globally (16 pixels >= 40 diff vs 3,
  PERF.md round 2), so the union stays; the player evidently rasterizes
  stroke pieces separately and sums their AA coverage at these seams.

Usage: python tools/exp_border_stroke.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import swf_renderer_tpu.runtime.scene as scene_mod
from swf_renderer_tpu.models.ast_io import parse_define_shape
from swf_renderer_tpu.runtime.renderer import render_shape
from swf_renderer_tpu.utils.png import read_png

REF = pathlib.Path("/root/reference/tests")


def render_with_model(tag, enabled: bool, quality="flash"):
    orig = scene_mod.SceneCompiler.__init__

    def patched(self, *a, **kw):
        kw["border_inner_half"] = enabled
        orig(self, *a, **kw)

    scene_mod.SceneCompiler.__init__ = patched
    try:
        return render_shape(tag, quality=quality).astype(np.int32)
    finally:
        scene_mod.SceneCompiler.__init__ = orig


def main():
    d = REF / "flat-shapes" / "homestuck-beta-1"
    tag = parse_define_shape((d / "ast.json").read_text())
    golden = read_png(d / "shape.png").astype(np.int32)
    h, w = golden.shape[:2]

    for name, enabled in (("union (production)", False),
                          ("inner-half model", True)):
        out = render_with_model(tag, enabled)
        diff = np.abs(out - golden).max(axis=-1)
        ys, xs = np.nonzero(diff > 40)
        print(f"{name}: max {diff.max()}  mean "
              f"{np.abs(out - golden).mean():.4f}  >40px {len(ys)}")
        for y, x in list(zip(ys, xs))[:12]:
            print(f"    ({y},{x}) gold {golden[y, x].tolist()} "
                  f"ours {out[y, x].tolist()}")

    out = render_with_model(tag, False)
    print("\nleft border col 0, rows 166..180 (gold vs ours, alpha):")
    print("  gold", golden[166:181, 0, 3].tolist())
    print("  ours", out[166:181, 0, 3].tolist())
    print("right border rows 212..216 (gold vs ours, alpha at x=707..709):")
    for y in range(212, 217):
        print(f"  y={y} gold {golden[y, 707:710, 3].tolist()} "
              f"ours {out[y, 707:710, 3].tolist()}")


if __name__ == "__main__":
    main()
