"""Decoder edge cases not exercised by the golden corpus."""

import pytest

from swf_renderer_tpu.models import ast, ir
from swf_renderer_tpu.models.decode_shape import decode_shape
from swf_renderer_tpu.models.decode_morph_shape import decode_morph_shape


def _shape(records, fills=None, lines=None):
    return ast.DefineShape(
        id=1,
        bounds=ast.Rect(0, 100, 0, 100),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=tuple(fills or []), line=tuple(lines or [])
            ),
            records=tuple(records),
        ),
    )


SOLID = ast.SolidFill(color=ast.StraightSRgba8(255, 0, 0, 255))


def test_empty_shape():
    shape = decode_shape(_shape([]))
    assert shape.paths == []


def test_edges_without_selected_styles_are_dropped():
    # Edges before any style-change selecting a fill go nowhere.
    records = [
        ast.EdgeRecord(delta=ast.Vector2D(10, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, 10)),
    ]
    shape = decode_shape(_shape(records, fills=[SOLID]))
    assert shape.paths == []


def test_fill_id_zero_clears_slot():
    records = [
        ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), left_fill=1),
        ast.EdgeRecord(delta=ast.Vector2D(10, 0)),
        ast.StyleChangeRecord(left_fill=0),
        ast.EdgeRecord(delta=ast.Vector2D(0, 10)),  # goes nowhere
    ]
    shape = decode_shape(_shape(records, fills=[SOLID]))
    assert len(shape.paths) == 1
    # MoveTo + single LineTo from the first edge only.
    assert len(shape.paths[0].commands) == 2


def test_new_styles_layer_ordering():
    blue = ast.SolidFill(color=ast.StraightSRgba8(0, 0, 255, 255))
    records = [
        ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), left_fill=1),
        ast.EdgeRecord(delta=ast.Vector2D(10, 0)),
        ast.StyleChangeRecord(
            new_styles=ast.ShapeStyles(fill=(blue,), line=()),
            left_fill=1,
            move_to=ast.Vector2D(50, 50),
        ),
        ast.EdgeRecord(delta=ast.Vector2D(5, 5)),
    ]
    shape = decode_shape(_shape(records, fills=[SOLID]))
    assert len(shape.paths) == 2
    # Layer order: initial layer first, then the new_styles layer.
    assert shape.paths[0].fill.color[0] == 1.0  # red
    assert shape.paths[1].fill.color[2] == 1.0  # blue
    # new_styles resets the pen only via move_to; the new path starts there.
    move = shape.paths[1].commands[0]
    assert (move.x, move.y) == (50, 50)


def test_invalid_fill_id_raises():
    records = [ast.StyleChangeRecord(left_fill=5)]
    with pytest.raises(ValueError, match="Invalid fill ID"):
        decode_shape(_shape(records, fills=[SOLID]))


def test_right_fill_reversal_orientation():
    # A square drawn with rightFill must decode with reversed segments so
    # the winding sign flips relative to leftFill.
    def square(use_right):
        kw = {"right_fill": 1} if use_right else {"left_fill": 1}
        records = [
            ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), **kw),
            ast.EdgeRecord(delta=ast.Vector2D(10, 0)),
            ast.EdgeRecord(delta=ast.Vector2D(0, 10)),
            ast.EdgeRecord(delta=ast.Vector2D(-10, 0)),
            ast.EdgeRecord(delta=ast.Vector2D(0, -10)),
        ]
        return decode_shape(_shape(records, fills=[SOLID]))

    import numpy as np

    from swf_renderer_tpu.models.geometry import (
        Affine,
        path_to_subpaths,
        subpaths_to_fill_edges,
    )

    def signed_area(shape):
        subs = path_to_subpaths(shape.paths[0].commands, Affine.identity())
        edges = subpaths_to_fill_edges(subs)
        return np.sum(
            (edges[:, 2] - edges[:, 0]) * (edges[:, 1] + edges[:, 3])
        ) / 2

    a_left = signed_area(square(False))
    a_right = signed_area(square(True))
    assert a_left == pytest.approx(-a_right)
    assert abs(a_left) == pytest.approx(100)


def test_morph_move_to_requires_morph_twin():
    tag = ast.DefineMorphShape(
        id=1,
        bounds=ast.Rect(0, 10, 0, 10),
        morph_bounds=ast.Rect(0, 10, 0, 10),
        shape=ast.MorphShapeBody(
            initial_styles=ast.MorphShapeStyles(fill=(), line=()),
            records=(
                ast.MorphStyleChangeRecord(move_to=ast.Vector2D(1, 1)),
            ),
        ),
    )
    with pytest.raises(ValueError, match="morphMoveTo"):
        decode_morph_shape(tag)


def test_morph_default_control_midpoint():
    fill = ast.MorphSolidFill(
        color=ast.StraightSRgba8(0, 0, 0, 255),
        morph_color=ast.StraightSRgba8(0, 0, 0, 255),
    )
    tag = ast.DefineMorphShape(
        id=1,
        bounds=ast.Rect(0, 10, 0, 10),
        morph_bounds=ast.Rect(0, 10, 0, 10),
        shape=ast.MorphShapeBody(
            initial_styles=ast.MorphShapeStyles(fill=(fill,), line=()),
            records=(
                ast.MorphStyleChangeRecord(
                    move_to=ast.Vector2D(0, 0),
                    morph_move_to=ast.Vector2D(0, 0),
                    left_fill=1,
                ),
                # Curved on the start shape only; morph control defaults to
                # the morph delta midpoint (decode-swf-morph-shape.ts:341-346)
                ast.MorphEdgeRecord(
                    delta=ast.Vector2D(10, 0),
                    morph_delta=ast.Vector2D(7, 0),
                    control_delta=ast.Vector2D(5, 5),
                ),
            ),
        ),
    )
    morph = decode_morph_shape(tag)
    curve = morph.paths[0].commands[1]
    assert isinstance(curve, ir.MorphCurveTo)
    assert curve.control_x == (5, 3.5)
    assert curve.control_y == (5, 0)
