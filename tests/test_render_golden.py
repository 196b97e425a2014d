"""Render integration tests: image diff vs the reference golden PNGs.

Mirrors reference ts/src/test/node-canvas-renderer.spec.ts — same stage
construction, same acceptance gate (pixelmatch threshold 0.05, differing
pixel ratio <= 1e-4), same artifact outputs (*-out.png / *-diff.png).
"""

import pathlib

import numpy as np
import pytest

from swf_renderer_tpu.models.ast_io import (
    parse_define_bitmap,
    parse_define_morph_shape,
    parse_define_shape,
)
from swf_renderer_tpu.runtime.renderer import render_morph_shape, render_shape
from swf_renderer_tpu.utils.imagediff import pixelmatch
from swf_renderer_tpu.utils.png import read_png, write_png

THRESHOLD = 0.05
MAX_DIFF_RATIO = 1e-4

# (sample, bitmap deps, quality).  The textured golden's pattern-edge
# behavior is CANVAS-like (no-repeat fade — its boundary alphas match the
# Canvas semantics exactly once bitmap filtering happens premultiplied),
# so it renders at the default canvas quality like the rest.
SHAPE_SAMPLES = [
    ("flat-shapes/homestuck-beta-1", [], "canvas"),
    ("textured-shapes/homestuck-beta-4", ["bitmap/homestuck-beta-3"],
     "canvas"),
    ("flat-shapes/squares", [], "canvas"),
    ("flat-shapes/triangle", [], "canvas"),
]

MORPH_SAMPLES = [
    ("flat-morph-shapes/homestuck-beta-29", 0.0),
    ("flat-morph-shapes/homestuck-beta-29", 0.5),
    ("flat-morph-shapes/homestuck-beta-29", 1.0),
]


def _check(actual, golden_path, artifacts_dir, name):
    expected = read_png(golden_path)
    out_dir = artifacts_dir / name
    out_dir.mkdir(parents=True, exist_ok=True)
    write_png(out_dir / "out.png", actual)
    assert actual.shape == expected.shape, (
        f"size mismatch: {actual.shape} vs {expected.shape}"
    )
    result = pixelmatch(actual, expected, threshold=THRESHOLD)
    write_png(out_dir / "diff.png", result.diff_image)
    assert result.diff_ratio <= MAX_DIFF_RATIO, (
        f"{result.diff_count} / {result.total} differing pixels "
        f"(ratio {result.diff_ratio:.2e} > {MAX_DIFF_RATIO}); "
        f"max channel diff {result.max_channel_diff}; "
        f"artifacts in {out_dir}"
    )
    return result


@pytest.mark.parametrize("sample,bitmaps,quality", SHAPE_SAMPLES,
                         ids=[s for s, _, _ in SHAPE_SAMPLES])
def test_render_shape_golden(sample, bitmaps, quality, reference_tests,
                             artifacts_dir):
    sample_dir = reference_tests / sample
    tag = parse_define_shape((sample_dir / "ast.json").read_text())
    bitmap_tags = [
        parse_define_bitmap((reference_tests / f"{b}.ast.json").read_text())
        for b in bitmaps
    ]
    actual = render_shape(tag, bitmaps=bitmap_tags, quality=quality)
    _check(actual, sample_dir / "shape.png", artifacts_dir,
           sample.replace("/", "_"))


def test_render_with_sanitizer_enabled(reference_tests, artifacts_dir):
    """The validate flag (NaN/OOB coverage guard — the §5 sanitizer analog)
    passes on a clean corpus render and trips on poisoned geometry."""
    sample_dir = reference_tests / "flat-shapes" / "squares"
    tag = parse_define_shape((sample_dir / "ast.json").read_text())
    actual = render_shape(tag, validate=True)
    _check(actual, sample_dir / "shape.png", artifacts_dir,
           "flat-shapes_squares_validated")

    # Poisoned coverage must raise: drive the validator directly with the
    # same check the renderer applies to kernel output.
    from swf_renderer_tpu.models import display
    from swf_renderer_tpu.runtime.renderer import TpuRenderer

    stage = display.stage_for_shape(tag)
    renderer = TpuRenderer(stage.width, stage.height, use_pallas=False,
                           validate=True)
    from swf_renderer_tpu.runtime.scene import Draw
    from swf_renderer_tpu.ops import style as style_ops

    bad = Draw(edges=np.array([[0.0, 0.0, np.inf, 8.0]], np.float32),
               paint=style_ops.solid_paint((1, 0, 0, 1)))
    with pytest.raises((FloatingPointError, ValueError)):
        renderer.execute([bad])


@pytest.mark.parametrize("sample,ratio", MORPH_SAMPLES,
                         ids=[f"{s}@{r}" for s, r in MORPH_SAMPLES])
def test_render_morph_shape_golden(sample, ratio, reference_tests,
                                   artifacts_dir):
    sample_dir = reference_tests / sample
    tag = parse_define_morph_shape((sample_dir / "ast.json").read_text())
    actual = render_morph_shape(tag, ratio)
    golden = sample_dir / f"{int(ratio * (1 << 16))}.png"
    _check(actual, golden, artifacts_dir,
           sample.replace("/", "_") + f"_{int(ratio * 65536)}")


def test_render_batch_stages_matches_single(reference_tests):
    """TpuRenderer.render_batch fuses a stage sequence into one kernel
    launch and matches per-stage render() output."""
    import dataclasses

    from swf_renderer_tpu.models import display
    from swf_renderer_tpu.runtime.renderer import TpuRenderer

    sample_dir = reference_tests / "flat-morph-shapes" / "homestuck-beta-29"
    tag = parse_define_morph_shape((sample_dir / "ast.json").read_text())
    base = display.stage_for_morph_shape(tag, 0.0)
    stages = [
        dataclasses.replace(
            base,
            children=(dataclasses.replace(base.children[0], ratio=r),))
        for r in (0.0, 0.5, 1.0)
    ]
    rd = TpuRenderer(base.width, base.height)
    batch = rd.render_batch(stages)
    assert batch.shape == (3, base.height, base.width, 4)
    for i, stage in enumerate(stages):
        single = TpuRenderer(base.width, base.height).render(stage)
        np.testing.assert_array_equal(batch[i], single)


@pytest.mark.parametrize("sample", ["flat-shapes/triangle",
                                    "flat-shapes/homestuck-beta-1"],
                         ids=lambda s: s.replace("/", "_"))
def test_pallas_and_xla_pipelines_agree(sample, reference_tests):
    """The Pallas flat-block path and the pure-XLA path are independent
    implementations of the same semantics; corpus renders must agree to
    within one quantization step per channel."""
    import numpy as np

    from swf_renderer_tpu.models.ast_io import parse_define_shape
    from swf_renderer_tpu.runtime.renderer import render_shape

    tag = parse_define_shape(
        (reference_tests / sample / "ast.json").read_text())
    a = render_shape(tag, quality="flash", use_pallas=True)
    b = render_shape(tag, quality="flash", use_pallas=False)
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert diff.max() <= 1, (sample, int(diff.max()))
