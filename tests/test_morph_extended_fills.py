"""Gradient and bitmap MORPH fills (framework extension).

The reference throws on every non-solid morph fill
(decode-swf-morph-shape.ts:94-106).  Here they decode as [start, end]
static-fill pairs (ir.MorphExtendedFill), lerp at the draw ratio
(matrix components, stop ratios/colors, focal points — the
per-coordinate twin of the geometry lerp), and round-trip the
DefineMorphShape wire format's paired matrices / MORPHGRADIENT records.
Ratio-varying timelines with extended fills refuse the morph sweep and
render per frame.
"""

import numpy as np
import pytest

from swf_renderer_tpu.models import ast, display, swf_binary
from swf_renderer_tpu.models.decode_morph_shape import decode_morph_shape
from swf_renderer_tpu.models import ir
from swf_renderer_tpu.runtime.renderer import TpuRenderer
from swf_renderer_tpu.utils.fixed import Sfixed16P16


def _mat(scale, tx, ty, rot0=0.0, rot1=0.0):
    return ast.Matrix(
        scale_x=Sfixed16P16.from_value(scale),
        scale_y=Sfixed16P16.from_value(scale),
        rotate_skew0=Sfixed16P16.from_value(rot0),
        rotate_skew1=Sfixed16P16.from_value(rot1),
        translate_x=tx, translate_y=ty)


def _grad(stop_ratios, colors, spread=ast.GradientSpread.PAD):
    return ast.Gradient(
        spread=spread, color_space=ast.ColorSpace.S_RGB,
        colors=tuple(ast.GradientStop(ratio=r, color=ast.StraightSRgba8(*c))
                     for r, c in zip(stop_ratios, colors)))


GRAD_FILL = ast.MorphExtendedFill(
    start=ast.LinearGradientFill(
        matrix=_mat(0.05, 400, 300),
        gradient=_grad([0, 255], [(255, 0, 0, 255), (0, 0, 255, 255)])),
    end=ast.LinearGradientFill(
        matrix=_mat(0.08, 500, 350),
        gradient=_grad([40, 220], [(0, 255, 0, 255), (255, 255, 0, 128)])))


def _morph_records():
    return (
        ast.MorphStyleChangeRecord(
            move_to=ast.Vector2D(0, 0), morph_move_to=ast.Vector2D(100, 50),
            left_fill=1),
        ast.MorphEdgeRecord(delta=ast.Vector2D(800, 0),
                            morph_delta=ast.Vector2D(700, 100)),
        ast.MorphEdgeRecord(delta=ast.Vector2D(0, 600),
                            morph_delta=ast.Vector2D(100, 500)),
        ast.MorphEdgeRecord(delta=ast.Vector2D(-800, -600),
                            morph_delta=ast.Vector2D(-800, -650)),
    )


def _morph_tag(fill, morph_id=1):
    return ast.DefineMorphShape(
        id=morph_id,
        bounds=ast.Rect(0, 900, 0, 700),
        morph_bounds=ast.Rect(0, 900, 0, 700),
        shape=ast.MorphShapeBody(
            initial_styles=ast.MorphShapeStyles(fill=(fill,), line=()),
            records=_morph_records()))


def _static_twin(fill, which):
    """The DefineShape equivalent of the morph at ratio 0 (start) or 1
    (end)."""
    recs = _morph_records()
    if which == "start":
        records = (
            ast.StyleChangeRecord(move_to=recs[0].move_to, left_fill=1),
        ) + tuple(ast.EdgeRecord(delta=r.delta) for r in recs[1:])
        f = fill.start
    else:
        records = (
            ast.StyleChangeRecord(move_to=recs[0].morph_move_to,
                                  left_fill=1),
        ) + tuple(ast.EdgeRecord(delta=r.morph_delta) for r in recs[1:])
        f = fill.end
    return ast.DefineShape(
        id=1, bounds=ast.Rect(0, 900, 0, 700),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(fill=(f,), line=()),
            records=records))


def _render_morph(tag, ratio, bitmaps=()):
    r = TpuRenderer(45, 35)
    for b in bitmaps:
        r.add_bitmap(b)
    stage = display.Stage(
        width=45, height=35,
        background_color=ast.StraightSRgba8(0, 0, 0, 0),
        children=(display.MorphShapeInstance(definition=tag, ratio=ratio),))
    return r.render(stage)


def _render_static(tag, bitmaps=()):
    r = TpuRenderer(45, 35)
    for b in bitmaps:
        r.add_bitmap(b)
    stage = display.Stage(
        width=45, height=35,
        background_color=ast.StraightSRgba8(0, 0, 0, 0),
        children=(display.ShapeInstance(definition=tag),))
    return r.render(stage)


@pytest.mark.parametrize("shape2", [False, True])
def test_gradient_morph_fill_wire_roundtrip(shape2):
    tag = _morph_tag(GRAD_FILL)
    blob = swf_binary.emit_define_morph_shape(tag, shape2=shape2)
    head = int.from_bytes(blob[:2], "little")
    off = 2 + (4 if (head & 0x3F) == 0x3F else 0)
    parse = (swf_binary.parse_define_morph_shape2_tag if shape2
             else swf_binary.parse_define_morph_shape_tag)
    assert parse(blob[off:]) == tag


def test_radial_and_bitmap_morph_fill_wire_roundtrip():
    radial = ast.MorphExtendedFill(
        start=ast.RadialGradientFill(
            matrix=_mat(0.05, 400, 300),
            gradient=_grad([0, 128, 255], [(255, 0, 0, 255),
                                           (0, 255, 0, 200),
                                           (0, 0, 255, 255)])),
        end=ast.RadialGradientFill(
            matrix=_mat(0.03, 450, 350),
            gradient=_grad([10, 100, 250], [(9, 9, 9, 255),
                                            (0, 9, 0, 200),
                                            (9, 0, 9, 25)])))
    bitmap = ast.MorphExtendedFill(
        start=ast.BitmapFill(bitmap_id=7, matrix=_mat(10.0, 0, 0),
                             repeating=True, smoothed=False),
        end=ast.BitmapFill(bitmap_id=7, matrix=_mat(14.0, 100, 60),
                           repeating=True, smoothed=False))
    for fill in (radial, bitmap):
        tag = _morph_tag(fill)
        blob = swf_binary.emit_define_morph_shape(tag)
        head = int.from_bytes(blob[:2], "little")
        off = 2 + (4 if (head & 0x3F) == 0x3F else 0)
        assert swf_binary.parse_define_morph_shape_tag(blob[off:]) == tag


def test_decode_produces_extended_pair():
    compiled = decode_morph_shape(_morph_tag(GRAD_FILL))
    (path,) = compiled.paths
    assert isinstance(path.fill, ir.MorphExtendedFill)
    assert isinstance(path.fill.start, ir.LinearGradientFill)
    assert path.fill.to_golden()["type"] == 1


@pytest.mark.parametrize("ratio,which", [(0.0, "start"), (1.0, "end")])
def test_gradient_morph_endpoints_match_static_twin(ratio, which):
    got = _render_morph(_morph_tag(GRAD_FILL), ratio)
    want = _render_static(_static_twin(GRAD_FILL, which))
    np.testing.assert_array_equal(got, want)


def test_gradient_morph_mid_ratio_interpolates():
    lo = _render_morph(_morph_tag(GRAD_FILL), 0.0).astype(int)
    mid = _render_morph(_morph_tag(GRAD_FILL), 0.5).astype(int)
    hi = _render_morph(_morph_tag(GRAD_FILL), 1.0).astype(int)
    assert (mid != lo).any() and (mid != hi).any()
    assert mid[..., 3].max() > 0


def test_bitmap_morph_endpoints_match_static_twin():
    from swf_renderer_tpu.runtime.bitmap_service import (
        encode_x_swf_bmp2_argb,
    )

    rgba = np.random.default_rng(3).integers(0, 256, (6, 6, 4)).astype(
        np.uint8)
    bmp = ast.DefineBitmap(id=7, width=6, height=6,
                           media_type="image/x-swf-bmp2",
                           data=encode_x_swf_bmp2_argb(rgba))
    fill = ast.MorphExtendedFill(
        start=ast.BitmapFill(bitmap_id=7, matrix=_mat(8.0, 0, 0),
                             repeating=True, smoothed=True),
        end=ast.BitmapFill(bitmap_id=7, matrix=_mat(12.0, 200, 100),
                           repeating=True, smoothed=True))
    for ratio, which in ((0.0, "start"), (1.0, "end")):
        got = _render_morph(_morph_tag(fill), ratio, bitmaps=[bmp])
        want = _render_static(_static_twin(fill, which), bitmaps=[bmp])
        np.testing.assert_array_equal(got, want)


def test_ratio_varying_timeline_refuses_morph_sweep():
    """A ratio track over an extended-fill morph falls back to
    per-frame rendering and matches the per-frame renders."""
    tag = _morph_tag(GRAD_FILL)
    stages = [display.Stage(
        width=45, height=35,
        background_color=ast.StraightSRgba8(0, 0, 0, 0),
        children=(display.MorphShapeInstance(definition=tag, ratio=t),))
        for t in (0.0, 0.25, 0.5, 0.75)]
    r = TpuRenderer(45, 35)
    out = r.render_batch(stages)
    assert "sweep" not in (r.last_stats.path or "")
    for k, t in enumerate((0.0, 0.25, 0.5, 0.75)):
        np.testing.assert_array_equal(out[k], _render_morph(tag, t),
                                      err_msg=f"frame {k}")


def test_solid_morph_goldens_unchanged(reference_tests):
    """The extension leaves the reference-parity solid path bit-alone:
    hb29's golden decode re-emits byte-equal."""
    import json

    from swf_renderer_tpu.models.ast_io import parse_define_morph_shape
    from swf_renderer_tpu.utils import jsjson

    case = (reference_tests / "flat-morph-shapes" / "homestuck-beta-29")
    tag = parse_define_morph_shape((case / "ast.json").read_text())
    want = (case / "shape.ts.json").read_text()
    got = jsjson.stringify(decode_morph_shape(tag).to_golden()) + "\n"
    assert got == want
