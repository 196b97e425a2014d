"""DefineScalingGrid (9-slice) tests.

The scale-9 map is separable piecewise-linear (scene.SceneCompiler.
_scale9_bands): corner bands translate rigidly, the center band absorbs
the object's own scale.  These tests pin the three defining behaviors —
corner invariance, center stretch, seam-exact slicing of a full-bounds
fill — plus the rotation fallback (the player ignores scale9Grid under
rotation) and the DefineScalingGrid wire round-trip.

The reference has no scaling-grid support (framework extension; tag 78,
SWF spec v19).
"""

import numpy as np

from swf_renderer_tpu.models import ast, display, swf_binary
from swf_renderer_tpu.runtime.movie import load_movie_stage, render_movie
from swf_renderer_tpu.runtime.renderer import TpuRenderer
from swf_renderer_tpu.utils.fixed import Sfixed16P16

RED = ast.StraightSRgba8(255, 0, 0, 255)
GREEN = ast.StraightSRgba8(0, 200, 0, 255)
BLUE = ast.StraightSRgba8(0, 0, 255, 255)


def _mat(sx=1.0, sy=1.0, tx=0, ty=0, skew0=0.0, skew1=0.0) -> ast.Matrix:
    return ast.Matrix(
        scale_x=Sfixed16P16.from_value(sx),
        scale_y=Sfixed16P16.from_value(sy),
        rotate_skew0=Sfixed16P16.from_value(skew0),
        rotate_skew1=Sfixed16P16.from_value(skew1),
        translate_x=tx, translate_y=ty)


def _rect_shape(shape_id, w_twips, h_twips, color):
    records = (
        ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), left_fill=1),
        ast.EdgeRecord(delta=ast.Vector2D(w_twips, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, h_twips)),
        ast.EdgeRecord(delta=ast.Vector2D(-w_twips, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, -h_twips)),
    )
    return ast.DefineShape(
        id=shape_id, bounds=ast.Rect(0, w_twips, 0, h_twips),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=(ast.SolidFill(color=color),), line=()),
            records=records))


def _stage(children, px=200):
    return display.Stage(width=px, height=px,
                         background_color=ast.StraightSRgba8(0, 0, 0, 0),
                         children=tuple(children))


def _render(stage):
    return TpuRenderer(stage.width, stage.height).render(stage)


def _assert_close(a, b, tol=1):
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32)).max()
    assert diff <= tol, f"max channel diff {diff}"


def test_corner_squares_keep_natural_size():
    # Two 10 px squares pinned to opposite corners of a 100 px character,
    # scaled 2x through a centered grid: the squares must stay 10 px,
    # repositioned to the 200 px output's corners.
    red = _rect_shape(1, 200, 200, RED)
    green = _rect_shape(2, 200, 200, GREEN)
    group = display.ScaleGridGroup(
        children=(display.ShapeInstance(definition=red),
                  display.ShapeInstance(definition=green,
                                        matrix=_mat(tx=1800, ty=1800))),
        grid=(800.0, 800.0, 1200.0, 1200.0),
        bounds=(0.0, 0.0, 2000.0, 2000.0),
        matrix=_mat(sx=2.0, sy=2.0))
    got = _render(_stage([group]))
    want = _render(_stage([
        display.ShapeInstance(definition=red),
        display.ShapeInstance(definition=green, matrix=_mat(tx=3800,
                                                            ty=3800))]))
    _assert_close(got, want)


def test_full_bounds_fill_is_seam_exact():
    # A fill spanning the whole character maps to the plain uniformly
    # scaled rect: the nine slices partition it and the merged edge
    # tables must reconstruct it with no seams (fractional scale on
    # purpose, so band boundaries land mid-pixel).
    rect = _rect_shape(1, 2000, 2000, BLUE)
    group = display.ScaleGridGroup(
        children=(display.ShapeInstance(definition=rect),),
        grid=(500.0, 500.0, 1500.0, 1500.0),
        bounds=(0.0, 0.0, 2000.0, 2000.0),
        matrix=_mat(sx=1.75, sy=1.75))
    got = _render(_stage([group]))
    want = _render(_stage([
        display.ShapeInstance(definition=rect, matrix=_mat(sx=1.75,
                                                           sy=1.75))]))
    _assert_close(got, want, tol=0)


def test_too_small_scale_partitions_without_overlap():
    # Below the fixed-band budget (scale*extent < left+right bands) the
    # corners compress to meet: a full-bounds solid rect must still
    # exactly equal the plain uniformly scaled rect — any band overlap
    # (double cover) or gap breaks this equality.
    rect = _rect_shape(1, 2000, 2000, BLUE)
    group = display.ScaleGridGroup(
        children=(display.ShapeInstance(definition=rect),),
        grid=(800.0, 800.0, 1200.0, 1200.0),
        bounds=(0.0, 0.0, 2000.0, 2000.0),
        matrix=_mat(sx=0.45, sy=0.45))
    got = _render(_stage([group]))
    want = _render(_stage([
        display.ShapeInstance(definition=rect, matrix=_mat(sx=0.45,
                                                           sy=0.45))]))
    _assert_close(got, want, tol=0)


def test_center_rect_stretches():
    # A rect covering exactly the grid center under 2x scale: with
    # bounds [0, 2000] and grid [500, 1500], the center slope is
    # (4000 - 500 - 500) / 1000 = 3, so [500, 1500] maps to [500, 3500].
    center = _rect_shape(1, 1000, 1000, RED)
    group = display.ScaleGridGroup(
        children=(display.ShapeInstance(definition=center,
                                        matrix=_mat(tx=500, ty=500)),),
        grid=(500.0, 500.0, 1500.0, 1500.0),
        bounds=(0.0, 0.0, 2000.0, 2000.0),
        matrix=_mat(sx=2.0, sy=2.0))
    got = _render(_stage([group]))
    stretched = _rect_shape(2, 3000, 3000, RED)
    want = _render(_stage([
        display.ShapeInstance(definition=stretched,
                              matrix=_mat(tx=500, ty=500))]))
    _assert_close(got, want)


def test_rotation_ignores_grid():
    # Any rotation/skew on the group disables the grid (player
    # semantics): the render must equal the plain Container walk.
    red = _rect_shape(1, 600, 600, RED)
    children = (display.ShapeInstance(definition=red),
                display.ShapeInstance(definition=red,
                                      matrix=_mat(tx=1400, ty=1400)))
    m = _mat(sx=1.5, sy=1.5, skew0=0.4, skew1=-0.4, tx=800, ty=400)
    grid_render = _render(_stage([display.ScaleGridGroup(
        children=children, grid=(800.0, 800.0, 1200.0, 1200.0),
        bounds=(0.0, 0.0, 2000.0, 2000.0), matrix=m)]))
    plain_render = _render(_stage([display.Container(children=children,
                                                     matrix=m)]))
    _assert_close(grid_render, plain_render, tol=0)


def test_scaling_grid_wire_round_trip():
    # DefineScalingGrid survives emit -> parse and the loader wraps the
    # sprite instance in a ScaleGridGroup whose render matches the
    # hand-built direct stage.
    red = _rect_shape(1, 200, 200, RED)
    green = _rect_shape(2, 200, 200, GREEN)
    sprite_frames = [[
        swf_binary.Placement(depth=1, character_id=1),
        swf_binary.Placement(depth=2, character_id=2,
                             matrix=_mat(tx=1800, ty=1800)),
    ]]
    data = swf_binary.emit_movie_timeline(
        frames=[[swf_binary.Placement(depth=1, character_id=10,
                                      matrix=_mat(sx=2.0, sy=2.0))]],
        shapes=[red, green],
        sprites=((10, sprite_frames),),
        scaling_grids=((10, ast.Rect(800, 1200, 800, 1200)),),
        background=ast.StraightSRgba8(0, 0, 0, 0),
        stage_rect=ast.Rect(0, 4000, 0, 4000))
    movie = swf_binary.parse_movie(data)
    grid = movie.scaling_grids[10]
    assert (grid.x_min, grid.x_max, grid.y_min, grid.y_max) == (
        800, 1200, 800, 1200)
    stage, _bitmaps = load_movie_stage(data)
    assert any(isinstance(c, display.ScaleGridGroup)
               for c in stage.children)
    got = render_movie(data)
    # The wire background is opaque (SetBackgroundColor carries RGB only).
    want = _render(display.Stage(
        width=200, height=200,
        background_color=ast.StraightSRgba8(0, 0, 0, 255),
        children=(
            display.ShapeInstance(definition=red),
            display.ShapeInstance(definition=green,
                                  matrix=_mat(tx=3800, ty=3800)))))
    _assert_close(got, want)


def test_button_scaling_grid():
    # DefineScalingGrid names buttons too: the selected state's records
    # render 9-sliced against their union bounds.
    red = _rect_shape(1, 200, 200, RED)
    green = _rect_shape(2, 200, 200, GREEN)
    button = swf_binary.Button(id=20, records=(
        swf_binary.ButtonRecord(character_id=1, depth=1, matrix=None,
                                states=0x01),
        swf_binary.ButtonRecord(character_id=2, depth=2,
                                matrix=_mat(tx=1800, ty=1800),
                                states=0x01)))
    data = swf_binary.emit_movie_timeline(
        frames=[[swf_binary.Placement(depth=1, character_id=20,
                                      matrix=_mat(sx=2.0, sy=2.0))]],
        shapes=[red, green], buttons=(button,),
        scaling_grids=((20, ast.Rect(800, 1200, 800, 1200)),),
        background=ast.StraightSRgba8(0, 0, 0, 0),
        stage_rect=ast.Rect(0, 4000, 0, 4000))
    stage, _bitmaps = load_movie_stage(data)
    assert any(isinstance(c, display.ScaleGridGroup)
               for c in stage.children)
    got = render_movie(data)
    want = _render(display.Stage(
        width=200, height=200,
        background_color=ast.StraightSRgba8(0, 0, 0, 255),
        children=(
            display.ShapeInstance(definition=red),
            display.ShapeInstance(definition=green,
                                  matrix=_mat(tx=3800, ty=3800)))))
    _assert_close(got, want)


def test_grid_inside_masked_group_slices_slice_major():
    # A scale-9 group nested under a clip: group tokens force the
    # slice-major emission path; the masked composite must still equal
    # the same scene rendered with the grid content pre-flattened.
    red = _rect_shape(1, 2000, 2000, RED)
    mask = _rect_shape(3, 2000, 4000, GREEN)
    group = display.ScaleGridGroup(
        children=(display.ShapeInstance(definition=red),),
        grid=(500.0, 500.0, 1500.0, 1500.0),
        bounds=(0.0, 0.0, 2000.0, 2000.0),
        matrix=_mat(sx=1.75, sy=1.75))
    masked = display.MaskedGroup(
        mask=display.ShapeInstance(definition=mask),
        children=(group,))
    got = _render(_stage([masked]))
    want = _render(_stage([display.MaskedGroup(
        mask=display.ShapeInstance(definition=mask),
        children=(display.ShapeInstance(
            definition=red, matrix=_mat(sx=1.75, sy=1.75)),))]))
    _assert_close(got, want)
