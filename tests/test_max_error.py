"""Max-channel-error ratchet vs the golden corpus (BASELINE north star).

BASELINE.json's correctness target is <=2/255 max channel error against the
TS Canvas2D reference.  That reference is not runnable here (no node), so
this gate ratchets against the Flash-player golden captures instead: every
sample asserts its CURRENT measured max channel error and >2/255 pixel
fraction as a per-sample budget, so any regression fails and improvements
can tighten the budgets.  ``tools/measure_error.py`` regenerates the table
(also recorded in PERF.md).

Quality 'flash' targets the player's semantics (SWF caps/joins, hairlines,
0.02 px curve tolerance); renders clip at the exact fractional stage bounds
and quantize through premultiplied u8 (ARGB32 parity) — both required for
golden agreement at AA edges.
"""

import numpy as np
import pytest

from swf_renderer_tpu.models.ast_io import (
    parse_define_bitmap,
    parse_define_morph_shape,
    parse_define_shape,
)
from swf_renderer_tpu.runtime.renderer import render_morph_shape, render_shape
from swf_renderer_tpu.utils.png import read_png

# sample -> (max channel budget, >2/255 pixel-fraction budget, quality).
# Measured 2026-08 (round 2); these RATCHET — tighten when the renderer
# improves.  The textured sample gates at 'canvas': its golden's
# pattern-edge alphas match Canvas no-repeat fade semantics exactly.
SHAPE_BUDGETS = {
    "flat-shapes/triangle": (255, 0.0065, "flash"),  # 2 alpha-1 px
    "flat-shapes/squares": (2, 0.0, "flash"),        # MEETS <=2/255
    # Outline stroking + union de-overlap: interior stroke-overlap pixels
    # now match the golden exactly (PERF.md round-2 stroke study); the max
    # sits at 3 stage-border pixels where the player's value matches the
    # old conflation artifact instead of the true union (the TS/Cairo
    # oracle takes the union).  >=40-diff pixel count dropped 16 -> 3.
    "flat-shapes/homestuck-beta-1": (130, 0.0125, "flash"),
    # Exact box-filter pattern downscaling (pixman GOOD / player area
    # averaging) + no-repeat edge fade: MEETS the <=2/255 north star at
    # BOTH qualities (gated at 'flash', the stricter player target).
    "textured-shapes/homestuck-beta-4": (2, 0.0, "flash"),
}
# pow2 (recursive-midpoint) curve flattening at 0.1 px: >2/255 fraction
# halved vs uniform-count flattening (player parity, PERF.md round 2).
MORPH_BUDGETS = {
    0.0: (22, 0.010),
    0.5: (22, 0.009),
    1.0: (22, 0.010),
}
BITMAPS = {"textured-shapes/homestuck-beta-4": ["bitmap/homestuck-beta-3"]}


def _assert_budget(actual, golden, budget, name):
    diff = np.abs(actual.astype(np.int32) - golden.astype(np.int32))
    max_err = int(diff.max())
    gt2 = float((diff > 2).any(axis=-1).mean())
    assert max_err <= budget[0], (
        f"{name}: max channel error {max_err} exceeds ratchet {budget[0]}"
    )
    assert gt2 <= budget[1], (
        f"{name}: >2/255 pixel fraction {gt2:.4f} exceeds ratchet {budget[1]}"
    )


@pytest.mark.parametrize("sample", sorted(SHAPE_BUDGETS),
                         ids=lambda s: s.replace("/", "_"))
def test_max_channel_error_shape(sample, reference_tests):
    d = reference_tests / sample
    tag = parse_define_shape((d / "ast.json").read_text())
    bitmaps = [
        parse_define_bitmap((reference_tests / f"{b}.ast.json").read_text())
        for b in BITMAPS.get(sample, [])
    ]
    budget = SHAPE_BUDGETS[sample]
    actual = render_shape(tag, bitmaps=bitmaps, quality=budget[2])
    golden = read_png(d / "shape.png")
    _assert_budget(actual, golden, budget, sample)


@pytest.mark.parametrize("ratio", sorted(MORPH_BUDGETS))
def test_max_channel_error_morph(ratio, reference_tests):
    d = reference_tests / "flat-morph-shapes" / "homestuck-beta-29"
    tag = parse_define_morph_shape((d / "ast.json").read_text())
    actual = render_morph_shape(tag, ratio, quality="flash")
    golden = read_png(d / f"{int(ratio * (1 << 16))}.png")
    _assert_budget(actual, golden, MORPH_BUDGETS[ratio], f"hb29@{ratio}")
