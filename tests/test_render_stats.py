"""RenderStats.path observability + graceful styled fallbacks.

VERDICT r2 weak #4/#5: batches that leave the fused fast path must say so
(stats + log) instead of silently serializing, and the styled pipeline must
fall back gracefully on wide frames instead of raising.
"""

import logging

import numpy as np
import pytest

from swf_renderer_tpu.models import ast, display
from swf_renderer_tpu.ops import style as style_ops
from swf_renderer_tpu.runtime.renderer import TpuRenderer


def _solid_shape_tag(color=(255, 0, 0, 255), size=400):
    """A tiny DefineShape: one solid triangle in twips."""
    return ast.DefineShape(
        id=1,
        bounds=ast.Rect(x_min=0, x_max=size, y_min=0, y_max=size),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=[ast.SolidFill(color=ast.StraightSRgba8(*color))],
                line=[],
            ),
            records=[
                ast.StyleChangeRecord(
                    left_fill=None, right_fill=1, line_style=None,
                    move_to=ast.Vector2D(x=0, y=0), new_styles=None),
                ast.EdgeRecord(delta=ast.Vector2D(x=size, y=0),
                               control_delta=None),
                ast.EdgeRecord(delta=ast.Vector2D(x=0, y=size),
                               control_delta=None),
                ast.EdgeRecord(delta=ast.Vector2D(x=-size, y=-size),
                               control_delta=None),
            ],
        ),
    )


def _stage(tag, w=32, h=32):
    return display.Stage(
        width=w, height=h,
        children=[display.ShapeInstance(definition=tag)],
    )


def test_render_path_flatblock():
    tag = _solid_shape_tag()
    r = TpuRenderer(32, 32)
    r.render(_stage(tag))
    assert r.last_stats.path == "flatblock"


def test_render_path_scanline_backend_override():
    tag = _solid_shape_tag()
    r = TpuRenderer(32, 32, backend="scanline")
    r.render(_stage(tag))
    assert r.last_stats.path == "scanline"


def test_render_path_empty():
    r = TpuRenderer(16, 16)
    r.render(display.Stage(width=16, height=16, children=[]))
    assert r.last_stats.path == "empty"


def test_render_batch_path_fused():
    tag = _solid_shape_tag()
    r = TpuRenderer(32, 32)
    out = r.render_batch([_stage(tag), _stage(tag)])
    assert out.shape == (2, 32, 32, 4)
    assert r.last_stats.path == "batched-styled"


def test_render_batch_nonuniform_falls_back_with_reason(caplog):
    tag1 = _solid_shape_tag()
    tag2 = _solid_shape_tag(size=200)
    r = TpuRenderer(32, 32)
    # Frame 2 renders two instances -> different draw count than frame 1.
    uneven = display.Stage(
        width=32, height=32,
        children=[display.ShapeInstance(definition=tag1),
                  display.ShapeInstance(definition=tag2)],
    )
    with caplog.at_level(logging.WARNING, logger="swf_renderer_tpu"):
        out = r.render_batch([_stage(tag1), uneven])
    assert out.shape == (2, 32, 32, 4)
    assert r.last_stats.path.startswith("per-stage:")
    assert "non-uniform" in r.last_stats.path
    assert any("falling back" in rec.message for rec in caplog.records)


def test_flatblock_refusal_reasons():
    tag = _solid_shape_tag()
    r = TpuRenderer(32, 32, validate=True)
    stage = _stage(tag)
    r.render(stage)
    assert r.last_stats.path in ("scanline", "direct")

    # Deep draw lists are NO LONGER refused (multi-pass composition).
    r2 = TpuRenderer(32, 32)
    from swf_renderer_tpu.runtime.scene import Draw

    draws = [Draw(edges=np.zeros((1, 4), np.float32),
                  paint=style_ops.solid_paint((1, 0, 0, 1)))] * 17
    assert r2._flatblock_refusal(draws) is None


def test_styled_wide_frame_falls_back_not_raises():
    """A stage wider than the chunk-major cap renders via the layered
    path (previously raised with a stale 'width < 2048' message)."""
    from swf_renderer_tpu.ops.pipeline import render_batch_styled

    h, w = 8, 8200  # stride > MAX_CHUNKS * LANE = 8192
    edges = np.array([[1.0, 1.0, 8195.0, 1.0],
                      [8195.0, 1.0, 8195.0, 7.0],
                      [8195.0, 7.0, 1.0, 7.0],
                      [1.0, 7.0, 1.0, 1.0]], np.float32)
    paints = [style_ops.solid_paint((0.0, 0.5, 1.0, 1.0))]
    out = render_batch_styled([[edges]], paints, h, w)
    assert out.shape == (1, h, w, 4)
    # The rectangle interior is fully covered.
    assert tuple(out[0, 4, 4000]) == (0, 128, 255, 255)
    assert tuple(out[0, 4, 8193]) == (0, 128, 255, 255)
    assert out[0, 0, 0, 3] == 0


def test_render_deep_stage_rides_flatblock():
    """A stage with >16 draws renders through the flat-block path (multi-
    pass chained composition) and matches the scanline backend within one
    u8 step."""
    tags = [_solid_shape_tag(color=(30 + i * 10, 255 - i * 10, 60, 220),
                             size=420 - 12 * i) for i in range(20)]
    stage = display.Stage(
        width=32, height=32,
        children=[display.ShapeInstance(definition=t) for t in tags])
    r = TpuRenderer(32, 32)
    got = r.render(stage)
    assert r.last_stats.path == "flatblock"
    assert r.last_stats.draws == 20

    r2 = TpuRenderer(32, 32, backend="scanline")
    want = r2.render(stage)
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1
