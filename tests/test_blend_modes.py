"""PlaceObject3 blend modes (framework extension; the reference has
none).  A blended object composites as a group against the backdrop:
Co_pm = (1-ab)Cs_pm + (1-as)Cb_pm + as*ab*B(Cb,Cs) with the W3C
separable B per mode (Flash-style clamped add/subtract and
source-ignoring invert).  The layer-alpha family ("layer", "alpha",
"erase") operates on the enclosing group buffer as a whole: alpha
scales the buffer's premul planes by the source alpha (soft mask),
erase by its complement; with no enclosing offscreen group the player
draws the object not at all.
"""

import numpy as np
import pytest

from swf_renderer_tpu.models import ast, display, swf_binary
from swf_renderer_tpu.runtime.renderer import TpuRenderer
from tests.test_masks import _rect_shape, _stage, _tl


def _render(stage, backend="auto"):
    r = TpuRenderer(stage.width, stage.height, backend=backend)
    return r.render(stage), r


BACK = _rect_shape(1, 800, 600, ast.StraightSRgba8(200, 100, 50, 255))
SRC = ast.StraightSRgba8(128, 255, 64, 255)


def _blend_stage(mode, src_color=SRC, src_alpha=None):
    c = (src_color if src_alpha is None
         else ast.StraightSRgba8(src_color.r, src_color.g, src_color.b,
                                 src_alpha))
    top = _rect_shape(2, 400, 600, c)  # left half
    return _stage([
        display.ShapeInstance(definition=BACK),
        display.ShapeInstance(definition=top, blend_mode=mode),
    ])


def _expected_opaque(mode):
    cb = np.array([200, 100, 50], np.float64) / 255.0
    cs = np.array([128, 255, 64], np.float64) / 255.0
    B = {
        "multiply": cb * cs,
        "screen": cb + cs - cb * cs,
        "lighten": np.maximum(cb, cs),
        "darken": np.minimum(cb, cs),
        "difference": np.abs(cb - cs),
        "add": np.minimum(1.0, cb + cs),
        "subtract": np.maximum(0.0, cb - cs),
        "invert": 1.0 - cb,
        "overlay": np.where(cb <= 0.5, cs * 2 * cb,
                            cs + (2 * cb - 1) - cs * (2 * cb - 1)),
        "hardlight": np.where(cs <= 0.5, cb * 2 * cs,
                              cb + (2 * cs - 1) - cb * (2 * cs - 1)),
    }[mode]
    return np.round(B * 255.0).astype(np.uint8)


@pytest.mark.parametrize("mode", [
    "multiply", "screen", "lighten", "darken", "difference", "add",
    "subtract", "invert", "overlay", "hardlight",
])
def test_opaque_blend_matches_formula(mode):
    got, r = _render(_blend_stage(mode))
    assert r._exec_path == "flatblock"
    want = _expected_opaque(mode)
    # Interior pixels (away from AA edges) of the blended left half.
    np.testing.assert_array_equal(got[5:25, 2:18, :3],
                                  np.broadcast_to(want, (20, 16, 3)))
    # Right half: bare backdrop.
    np.testing.assert_array_equal(got[5:25, 22:38, :3],
                                  np.broadcast_to([200, 100, 50],
                                                  (20, 16, 3)))
    assert (got[..., 3] == 255).all()


@pytest.mark.parametrize("mode", ["multiply", "add", "difference",
                                  "overlay"])
def test_fused_blend_matches_layered(mode):
    stage = _blend_stage(mode, src_alpha=140)
    fused, r = _render(stage, backend="auto")
    assert r._exec_path == "flatblock"
    layered, _ = _render(stage, backend="scanline")
    np.testing.assert_array_equal(fused, layered)


def test_blend_group_composes_children_first():
    """A blended CONTAINER blends its composed children once, not each
    child separately: two half-alpha children must first source-over
    each other, then multiply the backdrop."""
    a = _rect_shape(3, 400, 600, ast.StraightSRgba8(255, 0, 0, 128))
    b = _rect_shape(4, 400, 600, ast.StraightSRgba8(0, 0, 255, 128))
    grouped = _stage([
        display.ShapeInstance(definition=BACK),
        display.Container(children=(
            display.ShapeInstance(definition=a),
            display.ShapeInstance(definition=b),
        ), blend_mode="multiply"),
    ])
    fused, _ = _render(grouped, backend="auto")
    layered, _ = _render(grouped, backend="scanline")
    np.testing.assert_array_equal(fused, layered)

    # And it differs from blending each child separately.
    separate = _stage([
        display.ShapeInstance(definition=BACK),
        display.ShapeInstance(definition=a, blend_mode="multiply"),
        display.ShapeInstance(definition=b, blend_mode="multiply"),
    ])
    sep, _ = _render(separate, backend="auto")
    assert (sep != fused).any()


def test_blend_inside_mask_and_mask_inside_blend():
    half = _rect_shape(5, 400, 600, ast.StraightSRgba8(0, 200, 0, 255))
    top = _rect_shape(6, 800, 300, ast.StraightSRgba8(0, 200, 0, 255))
    mul = display.ShapeInstance(
        definition=_rect_shape(7, 700, 500, ast.StraightSRgba8(
            90, 160, 220, 255)), blend_mode="multiply")
    stage = _stage([
        display.ShapeInstance(definition=BACK),
        display.MaskedGroup(
            mask=display.ShapeInstance(definition=half),
            children=(mul,)),
        display.Container(children=(
            display.MaskedGroup(
                mask=display.ShapeInstance(definition=top),
                children=(display.ShapeInstance(definition=BACK),)),
        ), blend_mode="screen"),
    ])
    fused, r = _render(stage, backend="auto")
    assert r._exec_path == "flatblock"
    layered, _ = _render(stage, backend="scanline")
    np.testing.assert_array_equal(fused, layered)


def test_alpha_and_erase_without_group_draw_nothing():
    """The player only applies alpha/erase inside an offscreen group
    buffer ("parent must be LAYER"); at top level the object simply
    does not draw."""
    bare, _ = _render(_stage([display.ShapeInstance(definition=BACK)]))
    for mode in ("alpha", "erase"):
        got, _ = _render(_blend_stage(mode))
        np.testing.assert_array_equal(got, bare)


GREEN_FULL = _rect_shape(8, 800, 600, ast.StraightSRgba8(0, 200, 0, 255))


def _layer_stage(child_mode, child_alpha):
    """Backdrop + a LAYER group [full green, left-half alpha/erase]."""
    knock = _rect_shape(9, 400, 600, ast.StraightSRgba8(
        255, 255, 255, child_alpha))
    return _stage([
        display.ShapeInstance(definition=BACK),
        display.Container(children=(
            display.ShapeInstance(definition=GREEN_FULL),
            display.ShapeInstance(definition=knock, blend_mode=child_mode),
        ), blend_mode="layer"),
    ])


def test_erase_knocks_out_group_not_backdrop():
    """An opaque erase child removes the GROUP's coverage where it
    lands — the backdrop beneath survives untouched."""
    got, r = _render(_layer_stage("erase", 255))
    assert r._exec_path == "flatblock"
    # Left half: group fully erased -> bare backdrop.
    np.testing.assert_array_equal(
        got[5:25, 2:18], np.broadcast_to([200, 100, 50, 255], (20, 16, 4)))
    # Right half: the group's green, composited normally.
    np.testing.assert_array_equal(
        got[5:25, 22:38], np.broadcast_to([0, 200, 0, 255], (20, 16, 4)))


def test_alpha_is_a_soft_mask_on_the_group():
    """alpha rescales the group's premul planes by the source alpha:
    where the source is absent the group vanishes; where it is
    half-transparent the group shows at that alpha."""
    got, r = _render(_layer_stage("alpha", 128))
    assert r._exec_path == "flatblock"
    # Left half: green at 128/255 over the backdrop; premul-u8 exact:
    # pm = round(src_pm*255) with src_pm = g*(128/255) + b*(127/255).
    want = [round(0 * 128 / 255 + 200 * 127 / 255),
            round(200 * 128 / 255 + 100 * 127 / 255),
            round(0 * 128 / 255 + 50 * 127 / 255), 255]
    np.testing.assert_array_equal(
        got[5:25, 2:18], np.broadcast_to(want, (20, 16, 4)))
    # Right half: the alpha source is absent (src_a = 0) -> the group
    # is fully masked away; bare backdrop.
    np.testing.assert_array_equal(
        got[5:25, 22:38], np.broadcast_to([200, 100, 50, 255], (20, 16, 4)))


@pytest.mark.parametrize("mode,alpha", [
    ("alpha", 128), ("alpha", 255), ("erase", 255), ("erase", 90),
])
def test_fused_group_modes_match_layered(mode, alpha):
    stage = _layer_stage(mode, alpha)
    fused, r = _render(stage, backend="auto")
    assert r._exec_path == "flatblock"
    layered, _ = _render(stage, backend="scanline")
    np.testing.assert_array_equal(fused, layered)


def test_alpha_under_nested_blend_targets_inner_buffer():
    """A non-normal blend child composites its own offscreen group —
    an alpha grandchild under it rewrites THAT buffer, and the outer
    layer group does not additionally materialize."""
    knock = _rect_shape(9, 400, 600, ast.StraightSRgba8(255, 255, 255, 200))
    inner = display.Container(children=(
        display.ShapeInstance(definition=GREEN_FULL),
        display.ShapeInstance(definition=knock, blend_mode="alpha"),
    ), blend_mode="multiply")
    stage = _stage([
        display.ShapeInstance(definition=BACK),
        display.Container(children=(inner,), blend_mode="layer"),
    ])
    fused, _ = _render(stage, backend="auto")
    layered, _ = _render(stage, backend="scanline")
    np.testing.assert_array_equal(fused, layered)
    # Equivalent without the outer layer wrapper (it must not buffer).
    plain, _ = _render(_stage([
        display.ShapeInstance(definition=BACK), inner]), backend="auto")
    np.testing.assert_array_equal(fused, plain)


def test_place_object3_layer_alpha_erase_roundtrip():
    P = swf_binary.Placement
    knock = _rect_shape(2, 400, 600, ast.StraightSRgba8(255, 255, 255, 255))
    movie_bytes = _movie(
        [[P(depth=1, character_id=1),
          P(depth=2, character_id=2, blend="layer")],
         [P(depth=3, character_id=2, blend="alpha"),
          P(depth=4, character_id=2, blend="erase")]],
        [BACK, knock])
    movie = swf_binary.parse_movie(movie_bytes)
    assert movie.frames[0][1].blend == "layer"
    assert movie.frames[1][2].blend == "alpha"  # depth 2 carries over
    assert movie.frames[1][3].blend == "erase"


def test_layer_and_normal_are_plain_over():
    plain, _ = _render(_blend_stage(None))
    for mode in ("normal", "layer"):
        got, _ = _render(_blend_stage(mode))
        np.testing.assert_array_equal(got, plain)


# ---------------------------------------------------------------------------
# Wire format: PlaceObject3
# ---------------------------------------------------------------------------


def _movie(frames, shapes):
    return swf_binary.emit_movie_timeline(
        frames, shapes=shapes, stage_rect=ast.Rect(0, 800, 0, 600))


def test_place_object3_roundtrip_and_render():
    from swf_renderer_tpu.runtime.movie import load_movie_timeline

    P = swf_binary.Placement
    top = _rect_shape(2, 400, 600, SRC)
    movie_bytes = _movie(
        [[P(depth=1, character_id=1)],
         [P(depth=2, character_id=2, blend="multiply", name="fx")],
         [P(depth=2, move=True, matrix=_tl(100, 0))]],
        [BACK, top])
    movie = swf_binary.parse_movie(movie_bytes)
    assert movie.frames[1][1].blend == "multiply"
    assert movie.frames[2][1].blend == "multiply"  # retained on move
    assert movie.frames[2][1].name == "fx"

    stages, _ = load_movie_timeline(movie_bytes)
    assert stages[1].children[1].blend_mode == "multiply"
    got, _ = _render(stages[1])
    want, _ = _render(_stage([
        display.ShapeInstance(definition=BACK),
        display.ShapeInstance(definition=top, blend_mode="multiply"),
    ]))
    np.testing.assert_array_equal(got, want)


def test_place_object3_rejects_unknown_filter_id():
    # flags2 HasFilterList; one filter with an undefined id (8).
    body = (bytes([0x02, 0x01]) + (1).to_bytes(2, "little")
            + (2).to_bytes(2, "little") + bytes([1, 8]))
    with pytest.raises(ValueError):
        swf_binary._parse_place_object3(body)


def test_blend_refuses_sweep_routing():
    """A moving blended layer cannot ride the transform sweep — the
    batch falls back and still renders correctly."""
    top = _rect_shape(2, 400, 600, SRC)
    stages = []
    for k in range(4):
        stages.append(_stage([
            display.ShapeInstance(definition=BACK),
            display.ShapeInstance(definition=top, matrix=_tl(40 * k, 0),
                                  blend_mode="multiply"),
        ]))
    r = TpuRenderer(40, 30)
    out = r.render_batch(stages)
    assert r.last_stats.path != "transform-sweep"
    single = TpuRenderer(40, 30).render(stages[2])
    np.testing.assert_array_equal(out[2], single)


def test_place_object3_visible_flag():
    """HasVisible=0 hides the instance (depth slot retained, nothing
    drawn); a later move without the flag keeps it hidden, and
    visible=True restores it."""
    from swf_renderer_tpu.runtime.movie import render_movie_timeline

    P = swf_binary.Placement
    top = _rect_shape(2, 400, 600, SRC)
    movie_bytes = _movie(
        [[P(depth=1, character_id=1),
          P(depth=2, character_id=2, visible=False)],
         [P(depth=2, move=True, matrix=_tl(100, 0))],
         [P(depth=2, move=True, visible=True)]],
        [BACK, top])
    movie = swf_binary.parse_movie(movie_bytes)
    assert movie.frames[0][1].visible is False
    assert movie.frames[1][1].visible is False  # retained across move
    assert movie.frames[2][1].visible is True

    frames = render_movie_timeline(movie_bytes)
    bare, _ = _render(_stage([display.ShapeInstance(definition=BACK)]))
    np.testing.assert_array_equal(frames[0], bare)
    np.testing.assert_array_equal(frames[1], bare)
    assert (frames[2] != bare).any()  # visible again
