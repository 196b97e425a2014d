"""Round-5 hb29 study: PER-ROLE curve-flattening tolerance.

The round-4 family study (tools/exp_curve_model.py) showed hb29's
residual has TWO families with OPPOSITE preferences under a GLOBAL
tolerance: the left-border pixels match near-exact curves (tol x0.05)
while 140 other stroke-AA pixels match the production chords (tol
x1.0) exactly.  It swept only a global scale — the obvious untested
model is that the player flattens FILL edges and STROKE outlines with
different effective fidelity (e.g. exact fill edge walk, chorded
stroke offsetting).  This sweeps (fill_scale, stroke_scale)
independently and reports the golden error per cell, at all three
morph ratios.

Usage: python tools/exp_role_tol.py
"""

import pathlib
import sys
from unittest import mock

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from swf_renderer_tpu.models.ast_io import parse_define_morph_shape  # noqa: E402
from swf_renderer_tpu.runtime import renderer as rmod  # noqa: E402
from swf_renderer_tpu.runtime import scene as smod  # noqa: E402
from swf_renderer_tpu.utils.png import read_png  # noqa: E402

REF = pathlib.Path("/root/reference/tests")


def pm(x):
    a = x[..., 3:4].astype(np.float64) / 255.0
    return np.concatenate([np.round(x[..., :3] * a), x[..., 3:4]], -1)


def main():
    d = REF / "flat-morph-shapes" / "homestuck-beta-29"
    tag = parse_define_morph_shape((d / "ast.json").read_text())
    golds = {r: read_png(d / f"{n}.png").astype(np.int32)
             for r, n in ((0.0, "0"), (0.5, "32768"), (1.0, "65536"))}

    orig_fill = smod.SceneCompiler._emit_fill
    orig_stroke = smod.SceneCompiler._emit_stroke

    def run(name, fill_scale=1.0, stroke_scale=1.0, pixels=()):
        def patched_fill(self, *a, **kw):
            saved = self.curve_tolerance
            self.curve_tolerance = saved * fill_scale
            try:
                return orig_fill(self, *a, **kw)
            finally:
                self.curve_tolerance = saved

        def patched_stroke(self, *a, **kw):
            saved = self.curve_tolerance
            self.curve_tolerance = saved * stroke_scale
            try:
                return orig_stroke(self, *a, **kw)
            finally:
                self.curve_tolerance = saved

        with mock.patch.object(smod.SceneCompiler, "_emit_fill",
                               patched_fill), \
                mock.patch.object(smod.SceneCompiler, "_emit_stroke",
                                  patched_stroke):
            tot = {}
            for ratio, gold in golds.items():
                ours = rmod.render_morph_shape(
                    tag, ratio, quality="flash").astype(np.int32)
                diff = np.abs(pm(ours) - pm(gold)).max(-1)
                tot[ratio] = (int(diff.max()), int((diff > 2).sum()))
                if ratio == 0.0:
                    for (y, x) in pixels:
                        print(f"  ({y},{x}) ours={ours[y, x, 3]} "
                              f"gold={gold[y, x, 3]}")
        cells = " ".join(f"r{r}: max={mx} n>2={n}"
                         for r, (mx, n) in sorted(tot.items()))
        print(f"{name}: {cells}", flush=True)

    fam_left = [(31, 4), (48, 0), (43, 0), (37, 2)]
    fam_other = [(84, 12), (13, 15), (62, 55)]
    run("production (fill x1, stroke x1)", pixels=fam_left + fam_other)
    run("fill x0.05, stroke x1", fill_scale=0.05,
        pixels=fam_left + fam_other)
    run("fill x1, stroke x0.05", stroke_scale=0.05,
        pixels=fam_left + fam_other)
    run("fill x0.05, stroke x0.05", fill_scale=0.05, stroke_scale=0.05)
    run("fill x0.2, stroke x1", fill_scale=0.2)
    run("fill x0.05, stroke x2", fill_scale=0.05, stroke_scale=2.0)
    run("fill x0.05, stroke x0.5", fill_scale=0.05, stroke_scale=0.5)


if __name__ == "__main__":
    main()
