"""Measure max channel error + >2/255 pixel fraction vs the golden corpus
for each renderer quality mode.  Feeds the PERF.md error table and the
ratchet budgets in tests/test_max_error.py."""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize override

from swf_renderer_tpu.models.ast_io import (
    parse_define_bitmap, parse_define_morph_shape, parse_define_shape,
)
from swf_renderer_tpu.runtime.renderer import render_morph_shape, render_shape
from swf_renderer_tpu.utils.png import read_png

REF = pathlib.Path("/root/reference/tests")

SHAPES = [
    ("flat-shapes/triangle", []),
    ("flat-shapes/squares", []),
    ("flat-shapes/homestuck-beta-1", []),
    ("textured-shapes/homestuck-beta-4", ["bitmap/homestuck-beta-3"]),
]
MORPHS = [("flat-morph-shapes/homestuck-beta-29", r) for r in (0.0, 0.5, 1.0)]


def premul_u8(frame):
    """Straight-u8 RGBA -> premultiplied bytes (the representation both
    oracles actually store: Cairo ARGB32 and the player's capture).  At
    alpha~0 the straight channels amplify quantization noise to full
    scale; premul-space error shows the true agreement (VERDICT r2 #5)."""
    x = frame.astype(np.float64)
    pm = np.round(x[..., :3] * x[..., 3:4] / 255.0)
    return np.concatenate([pm, x[..., 3:4]], axis=-1).astype(np.int32)


def stats(actual, golden):
    a = actual.astype(np.int32)
    g = golden.astype(np.int32)
    diff = np.abs(a - g)
    pm_diff = np.abs(premul_u8(actual) - premul_u8(golden))
    return {
        "max": int(diff.max()),
        "gt2_frac": float((diff > 2).any(axis=-1).mean()),
        "mean": float(diff.mean()),
        "p999": int(np.quantile(diff, 0.999)),
        "pm_max": int(pm_diff.max()),
        "pm_gt2_frac": float((pm_diff > 2).any(axis=-1).mean()),
    }


def main():
    qualities = sys.argv[1:] or ["canvas", "flash", "flash-pointaa"]
    for quality in qualities:
        for sample, bitmaps in SHAPES:
            d = REF / sample
            tag = parse_define_shape((d / "ast.json").read_text())
            bts = [parse_define_bitmap((REF / f"{b}.ast.json").read_text())
                   for b in bitmaps]
            actual = render_shape(tag, bitmaps=bts, quality=quality)
            golden = read_png(d / "shape.png")
            print(json.dumps({"sample": sample, "quality": quality,
                              **stats(actual, golden)}))
        for sample, ratio in MORPHS:
            d = REF / sample
            tag = parse_define_morph_shape((d / "ast.json").read_text())
            actual = render_morph_shape(tag, ratio, quality=quality)
            golden = read_png(d / f"{int(ratio * (1 << 16))}.png")
            print(json.dumps({"sample": f"{sample}@{ratio}",
                              "quality": quality,
                              **stats(actual, golden)}))


if __name__ == "__main__":
    main()
