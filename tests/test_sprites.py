"""DefineSprite (tag 39): embedded looping timelines.

A capability beyond the reference (whose display list has containers
but whose loaders never construct them, ts/src/lib/display/
display-object-container.ts:5-9): sprites parse into resolved frame
snapshots, instances replay them as looping Containers phased from
their placement frame, and nesting recurses.
"""

import numpy as np
import pytest

from swf_renderer_tpu.models import ast, display, swf_binary
from swf_renderer_tpu.runtime.movie import load_movie_timeline
from swf_renderer_tpu.utils.fixed import Sfixed16P16

P = swf_binary.Placement
R = swf_binary.RemoveObject


def _tl(tx: int, ty: int) -> ast.Matrix:
    return ast.Matrix(
        scale_x=Sfixed16P16.from_value(1),
        scale_y=Sfixed16P16.from_value(1),
        rotate_skew0=Sfixed16P16.from_value(0),
        rotate_skew1=Sfixed16P16.from_value(0),
        translate_x=tx, translate_y=ty)


def _unit_shape(shape_id: int,
                color=(10, 20, 200, 255)) -> ast.DefineShape:
    records = (
        ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), left_fill=1),
        ast.EdgeRecord(delta=ast.Vector2D(200, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, 200)),
        ast.EdgeRecord(delta=ast.Vector2D(-200, -200)),
    )
    fill = ast.SolidFill(color=ast.StraightSRgba8(*color))
    return ast.DefineShape(
        id=shape_id, bounds=ast.Rect(0, 220, 0, 220),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(fill=(fill,), line=()),
            records=records))


_RECT = ast.Rect(0, 1200, 0, 1200)


def _movie(frames, sprites=(), shapes=None, **kw):
    return swf_binary.emit_movie_timeline(
        frames, shapes=shapes if shapes is not None else [_unit_shape(1)],
        stage_rect=_RECT, sprites=sprites, **kw)


def _three_step_sprite(sprite_id=10, char=1):
    """A sprite whose 3 frames move character ``char`` along x."""
    return (sprite_id, [
        [P(depth=1, character_id=char, matrix=_tl(0, 0))],
        [P(depth=1, move=True, matrix=_tl(400, 0))],
        [P(depth=1, move=True, matrix=_tl(800, 0))],
    ])


def test_sprite_parse_resolves_frames():
    movie = swf_binary.parse_movie(_movie(
        [[P(depth=1, character_id=10)]], sprites=[_three_step_sprite()]))
    sprite = movie.sprites[10]
    assert len(sprite.frames) == 3
    assert [f[0].matrix.translate_x for f in sprite.frames] == [0, 400, 800]
    # Move-modify keeps the character and the placement frame.
    assert all(f[0].character_id == 1 for f in sprite.frames)
    assert all(f[0].placed_frame == 0 for f in sprite.frames)


def test_sprite_instance_loops_with_phase():
    # Place the sprite at root frame 0 and let 7 root frames elapse.
    frames = [[P(depth=1, character_id=10)]] + [[] for _ in range(6)]
    stages, _ = load_movie_timeline(_movie(
        frames, sprites=[_three_step_sprite()]))
    assert len(stages) == 7
    for k, stage in enumerate(stages):
        (child,) = stage.children
        assert isinstance(child, display.Container)
        (inner,) = child.children
        assert inner.definition.id == 1
        assert inner.matrix.translate_x == [0, 400, 800][k % 3]


def test_sprite_placed_mid_timeline_phases_from_placement():
    frames = [[], [], [P(depth=1, character_id=10)], [], []]
    stages, _ = load_movie_timeline(_movie(
        frames, sprites=[_three_step_sprite()]))
    assert stages[0].children == () and stages[1].children == ()
    for k in (2, 3, 4):
        (child,) = stages[k].children
        (inner,) = child.children
        assert inner.matrix.translate_x == [0, 400, 800][(k - 2) % 3]


def test_sprite_move_keeps_phase_replace_restarts():
    sprites = [_three_step_sprite(10), _three_step_sprite(11)]
    frames = [
        [P(depth=1, character_id=10)],
        [P(depth=1, move=True, matrix=_tl(0, 100))],  # modify: keep phase
        [P(depth=1, move=True, character_id=11)],     # replace: restart
        [],
    ]
    stages, _ = load_movie_timeline(_movie(frames, sprites=sprites))
    inner = [s.children[0].children[0] for s in stages]
    assert inner[0].matrix.translate_x == 0
    assert inner[1].matrix.translate_x == 400   # phase 1 survives the move
    assert inner[2].matrix.translate_x == 0     # replacement restarts
    assert inner[3].matrix.translate_x == 400


def test_nested_sprites_recurse():
    inner = _three_step_sprite(10)
    outer = (20, [
        [P(depth=1, character_id=10, matrix=_tl(0, 200))],
        [],
    ])
    frames = [[P(depth=1, character_id=20)]] + [[] for _ in range(5)]
    stages, _ = load_movie_timeline(_movie(
        frames, sprites=[inner, outer]))
    for k, stage in enumerate(stages):
        (outer_c,) = stage.children
        (inner_c,) = outer_c.children
        assert isinstance(inner_c, display.Container)
        assert inner_c.matrix.translate_y == 200
        (shape,) = inner_c.children
        # Outer has 2 frames; the inner sprite's clock is the outer
        # phase, so its 3-frame loop folds through the outer loop.
        outer_phase = k % 2
        assert shape.matrix.translate_x == [0, 400, 800][outer_phase % 3]


def test_sprite_render_matches_flat_equivalent():
    """Each frame of a sprite movie rasterizes pixel-identical to a flat
    movie placing the same shape with the same matrix."""
    from swf_renderer_tpu.runtime.movie import render_movie_timeline

    frames = [[P(depth=1, character_id=10)]] + [[] for _ in range(4)]
    got = render_movie_timeline(_movie(
        frames, sprites=[_three_step_sprite()]))
    for k in range(5):
        flat = _movie([[P(depth=1, character_id=1,
                          matrix=_tl([0, 400, 800][k % 3], 0))]])
        want = render_movie_timeline(flat)[0]
        np.testing.assert_array_equal(got[k], want, err_msg=f"frame {k}")


def test_sprite_color_transform_applies_to_children():
    from swf_renderer_tpu.runtime.movie import render_movie_timeline

    ct = ((0.5, 0.5, 0.5, 1.0), (0.0, 0.0, 0.0, 0.0))
    sprite = (10, [[P(depth=1, character_id=1)]])
    got = render_movie_timeline(_movie(
        [[P(depth=1, character_id=10, color_transform=ct)]],
        sprites=[sprite]))
    want = render_movie_timeline(_movie(
        [[P(depth=1, character_id=1, color_transform=ct)]]))
    np.testing.assert_array_equal(got, want)


def test_sprite_rejects_nested_define_tags():
    shape_tag = swf_binary.emit_define_shape(_unit_shape(9))
    body = (np.uint16(5).tobytes() + np.uint16(1).tobytes()
            + shape_tag + swf_binary._tag(swf_binary.TAG_END, b""))
    with pytest.raises(ValueError):
        swf_binary.parse_define_sprite(body)


def test_frame_labels_roundtrip():
    frames = [[P(depth=1, character_id=1)], [], []]
    movie = swf_binary.parse_movie(_movie(
        frames, frame_labels={0: "intro", 2: "loop"}))
    assert movie.frame_labels == {0: "intro", 2: "loop"}


def test_sprite_empty_frames_render_background_only():
    sprite = (10, [[]])
    stages, _ = load_movie_timeline(_movie(
        [[P(depth=1, character_id=10)]], sprites=[sprite]))
    (child,) = stages[0].children
    assert isinstance(child, display.Container) and child.children == ()
