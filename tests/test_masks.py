"""Clip groups (PlaceObject2 clip depth -> display.MaskedGroup).

A capability beyond the reference (canvas-renderer.ts never reads clip
depths): a mask object's fill coverage multiplies its children's
coverage.  Semantics pinned here: masks are not painted, mask strokes
contribute nothing, color transforms on the mask are ignored, masking
follows the mask's own matrix, nesting intersects, and depths beyond
clip_depth are unaffected.
"""

import numpy as np
import pytest

from swf_renderer_tpu.models import ast, display, swf_binary
from swf_renderer_tpu.runtime.renderer import TpuRenderer
from swf_renderer_tpu.utils.fixed import Sfixed16P16

RED = ast.StraightSRgba8(255, 0, 0, 255)
BLUE = ast.StraightSRgba8(0, 0, 255, 255)
GREEN = ast.StraightSRgba8(0, 200, 0, 255)


def _tl(tx: int, ty: int) -> ast.Matrix:
    return ast.Matrix(
        scale_x=Sfixed16P16.from_value(1),
        scale_y=Sfixed16P16.from_value(1),
        rotate_skew0=Sfixed16P16.from_value(0),
        rotate_skew1=Sfixed16P16.from_value(0),
        translate_x=tx, translate_y=ty)


def _rect_shape(shape_id, w_twips, h_twips, color, line=None):
    records = (
        ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), left_fill=1,
                              line_style=(1 if line is not None else None)),
        ast.EdgeRecord(delta=ast.Vector2D(w_twips, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, h_twips)),
        ast.EdgeRecord(delta=ast.Vector2D(-w_twips, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, -h_twips)),
    )
    lines = ()
    if line is not None:
        lines = (ast.LineStyle(
            width=line, start_cap="round", end_cap="round",
            join={"type": "round"}, no_h_scale=False, no_v_scale=False,
            no_close=False, pixel_hinting=False,
            fill=ast.SolidFill(color=RED)),)
    return ast.DefineShape(
        id=shape_id, bounds=ast.Rect(0, w_twips, 0, h_twips),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=(ast.SolidFill(color=color),), line=lines),
            records=records))


def _stage(children, w=40, h=30):
    return display.Stage(width=w, height=h,
                         background_color=ast.StraightSRgba8(0, 0, 0, 0),
                         children=tuple(children))


def _render(stage, backend="scanline"):
    r = TpuRenderer(stage.width, stage.height, backend=backend)
    return r.render(stage), r


# A 40x30 px blue canvas child; masks are 20x30 px (left half).
FULL = _rect_shape(1, 800, 600, BLUE)
HALF = _rect_shape(2, 400, 600, GREEN)


def test_mask_clips_children_and_is_not_painted():
    masked = _stage([display.MaskedGroup(
        mask=display.ShapeInstance(definition=HALF),
        children=(display.ShapeInstance(definition=FULL),))])
    got, r = _render(masked)
    want, _ = _render(_stage([display.ShapeInstance(definition=FULL)]))
    # Interior of the mask: identical to the unmasked render.
    np.testing.assert_array_equal(got[:, :19], want[:, :19])
    # Outside the mask: fully transparent — and NOT green (the mask
    # itself is never painted).
    assert (got[:, 21:] == 0).all()
    assert (got[..., 1] == 0).all()


def test_mask_follows_its_own_matrix():
    masked = _stage([display.MaskedGroup(
        mask=display.ShapeInstance(definition=HALF, matrix=_tl(400, 0)),
        children=(display.ShapeInstance(definition=FULL),))])
    got, _ = _render(masked)
    assert (got[:, :19] == 0).all()
    assert (got[:, 21:39, 2] == 255).all()


def test_mask_strokes_contribute_nothing():
    fat_stroke = _rect_shape(3, 400, 600, GREEN, line=200)  # 10 px stroke
    with_stroke = _stage([display.MaskedGroup(
        mask=display.ShapeInstance(definition=fat_stroke),
        children=(display.ShapeInstance(definition=FULL),))])
    plain = _stage([display.MaskedGroup(
        mask=display.ShapeInstance(definition=HALF),
        children=(display.ShapeInstance(definition=FULL),))])
    got, _ = _render(with_stroke)
    want, _ = _render(plain)
    np.testing.assert_array_equal(got, want)


def test_mask_color_transform_is_ignored():
    ct = display.ColorTransform(mult=(1.0, 1.0, 1.0, 0.0),
                                add=(0.0, 0.0, 0.0, 0.0))  # alpha -> 0
    masked = _stage([display.MaskedGroup(
        mask=display.ShapeInstance(definition=HALF, color_transform=ct),
        children=(display.ShapeInstance(definition=FULL),))])
    got, _ = _render(masked)
    assert (got[:, :19, 2] == 255).all()  # still clips by geometry


def test_nested_masks_intersect():
    top = _rect_shape(4, 800, 300, GREEN)  # top half
    inner = display.MaskedGroup(
        mask=display.ShapeInstance(definition=top),
        children=(display.ShapeInstance(definition=FULL),))
    outer = _stage([display.MaskedGroup(
        mask=display.ShapeInstance(definition=HALF),
        children=(inner,))])
    got, _ = _render(outer)
    assert (got[:14, :19, 2] == 255).all()   # intersection
    assert (got[16:, :, :] == 0).all()       # below the inner mask
    assert (got[:, 21:, :] == 0).all()       # right of the outer mask


def test_sibling_after_group_unmasked():
    stage = _stage([
        display.MaskedGroup(
            mask=display.ShapeInstance(definition=HALF),
            children=(display.ShapeInstance(definition=FULL),)),
        display.ShapeInstance(definition=_rect_shape(5, 800, 600, RED),
                              matrix=_tl(0, 0)),
    ])
    got, _ = _render(stage)
    assert (got[:, :, 0] == 255).all()  # red covers everything


def test_empty_mask_clips_everything():
    stage = _stage([display.MaskedGroup(
        mask=display.Container(children=()),
        children=(display.ShapeInstance(definition=FULL),))])
    got, _ = _render(stage)
    assert (got == 0).all()


def test_direct_backend_agrees_with_scanline():
    stage = _stage([display.MaskedGroup(
        mask=display.ShapeInstance(definition=HALF),
        children=(display.ShapeInstance(definition=FULL),))])
    a, _ = _render(stage, backend="scanline")
    b, _ = _render(stage, backend="direct")
    np.testing.assert_array_equal(a, b)


def _overlap_scene():
    """Nested groups + OVERLAPPING translucent content — exercises the
    group-level semantics (content composites before the mask scales
    it) and the union of a multi-fill mask."""
    blue50 = _rect_shape(6, 700, 500, ast.StraightSRgba8(0, 0, 255, 128))
    red50 = _rect_shape(7, 700, 500, ast.StraightSRgba8(255, 0, 0, 128))
    top = _rect_shape(8, 800, 340, GREEN)
    inner = display.MaskedGroup(
        mask=display.ShapeInstance(definition=top),
        children=(
            display.ShapeInstance(definition=blue50, matrix=_tl(30, 20)),
            display.ShapeInstance(definition=red50, matrix=_tl(130, 90)),
        ))
    return _stage([
        display.ShapeInstance(definition=_rect_shape(9, 800, 600,
                                                     GREEN)),
        display.MaskedGroup(
            mask=display.ShapeInstance(definition=HALF, matrix=_tl(50, 30)),
            children=(inner,)),
        display.ShapeInstance(
            definition=_rect_shape(10, 300, 200, RED),
            matrix=_tl(450, 350)),
    ])


def test_fused_masked_path_matches_layered_oracle():
    """The fused premul-plane mask program (backend auto -> flatblock)
    agrees with the layered group-level compositor on a scene with
    nesting, overlap, translucency, and unmasked siblings."""
    stage = _overlap_scene()
    fused, r = _render(stage, backend="auto")
    assert r._exec_path == "flatblock"
    layered, _ = _render(stage, backend="scanline")
    np.testing.assert_array_equal(fused, layered)


def test_fused_masked_deep_content_multipass():
    """Masked content deeper than one kernel pass's layer budget (>16)
    chains passes inside the group."""
    layers = [display.ShapeInstance(
        definition=_rect_shape(20 + i, 400, 300,
                               ast.StraightSRgba8(10 * i, 255 - 10 * i,
                                                  40, 200)),
        matrix=_tl(15 * i, 10 * i)) for i in range(18)]
    stage = _stage([display.MaskedGroup(
        mask=display.ShapeInstance(definition=HALF),
        children=tuple(layers))])
    fused, r = _render(stage, backend="auto")
    assert r._exec_path == "flatblock"
    layered, _ = _render(stage, backend="scanline")
    # The in-group multipass chain regroups f32 ops vs the one-scan
    # layered composite — same one-quantum envelope as unmasked deep
    # scenes across paths.
    diff = np.abs(fused.astype(np.int32) - layered.astype(np.int32))
    assert diff.max() <= 1, f"max diff {diff.max()}"


# ---------------------------------------------------------------------------
# Wire format: PlaceObject2 clip depth
# ---------------------------------------------------------------------------


def _movie(frames, shapes):
    return swf_binary.emit_movie_timeline(
        frames, shapes=shapes, stage_rect=ast.Rect(0, 800, 0, 600))


def test_clip_depth_roundtrip_and_render():
    from swf_renderer_tpu.runtime.movie import load_movie_timeline

    P = swf_binary.Placement
    movie_bytes = _movie(
        [[P(depth=1, character_id=2, clip_depth=3),
          P(depth=2, character_id=1),
          P(depth=4, character_id=5)]],
        [FULL, HALF, _rect_shape(5, 800, 600, RED)])
    movie = swf_binary.parse_movie(movie_bytes)
    assert movie.frames[0][0].clip_depth == 3

    stages, _ = load_movie_timeline(movie_bytes)
    (group, sibling) = stages[0].children
    assert isinstance(group, display.MaskedGroup)
    assert group.mask.definition.id == 2
    assert len(group.children) == 1
    assert sibling.definition.id == 5  # depth 4 > clip 3: unmasked

    got, _ = _render(stages[0])
    assert (got[:, :, 0] == 255).all()  # the unmasked red sibling on top


def test_clip_depth_masks_content_in_movie_render():
    from swf_renderer_tpu.runtime.movie import render_movie

    P = swf_binary.Placement
    movie_bytes = _movie(
        [[P(depth=1, character_id=2, clip_depth=3),
          P(depth=2, character_id=1)]],
        [FULL, HALF])
    got = render_movie(movie_bytes, backend="scanline")
    # Inside the mask: blue over the white movie background.
    assert (got[:, :19, 2] == 255).all() and (got[:, :19, 0] == 0).all()
    # Outside: bare background (white).
    assert (got[:, 21:] == 255).all()


def test_clip_depth_survives_move_modify():
    P = swf_binary.Placement
    movie_bytes = _movie(
        [[P(depth=1, character_id=2, clip_depth=3),
          P(depth=2, character_id=1)],
         [P(depth=1, move=True, matrix=_tl(100, 0))]],
        [FULL, HALF])
    movie = swf_binary.parse_movie(movie_bytes)
    assert movie.frames[1][0].clip_depth == 3
    assert movie.frames[1][0].matrix == _tl(100, 0)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_random_mask_scenes(seed):
    """Randomized mask trees (random rects/triangles, translucent
    colors, optional nesting and siblings): the fused premul-plane
    program and the layered group compositor agree within one quantum
    (exactly, single-pass; the envelope covers pass-boundary f32
    regrouping)."""
    rng = np.random.default_rng(7000 + seed)

    def rand_shape(sid):
        w = int(rng.integers(100, 700))
        h = int(rng.integers(100, 500))
        color = ast.StraightSRgba8(*rng.integers(0, 256, 3), 
                                   int(rng.integers(60, 256)))
        if rng.uniform() < 0.5:
            return _rect_shape(sid, w, h, color)
        records = (
            ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), left_fill=1),
            ast.EdgeRecord(delta=ast.Vector2D(w, int(rng.integers(0, h)))),
            ast.EdgeRecord(delta=ast.Vector2D(-int(rng.integers(0, w)), h)),
            ast.EdgeRecord(delta=ast.Vector2D(
                -w + int(rng.integers(0, w)),
                -h - int(rng.integers(0, h)))),
        )
        return ast.DefineShape(
            id=sid, bounds=ast.Rect(0, w, 0, h),
            shape=ast.ShapeBody(
                initial_styles=ast.ShapeStyles(
                    fill=(ast.SolidFill(color=color),), line=()),
                records=records))

    sid = [1]

    def inst():
        sid[0] += 1
        return display.ShapeInstance(
            definition=rand_shape(sid[0]),
            matrix=_tl(int(rng.integers(0, 400)), int(rng.integers(0, 300))))

    def rand_items(depth):
        items = []
        for _ in range(int(rng.integers(1, 4))):
            if depth < 2 and rng.uniform() < 0.4:
                items.append(display.MaskedGroup(
                    mask=inst(),
                    children=tuple(rand_items(depth + 1))))
            else:
                items.append(inst())
        return items

    stage = _stage(rand_items(0))
    fused, r = _render(stage, backend="auto")
    assert r._exec_path == "flatblock"
    layered, _ = _render(stage, backend="scanline")
    diff = np.abs(fused.astype(np.int32) - layered.astype(np.int32))
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_uniform_masked_timeline_rides_batched_path():
    """Frames sharing one clip-group structure batch through the fused
    masked program (no per-stage fallback) and match per-stage renders."""
    stages = []
    for k in range(4):
        stages.append(_stage([display.MaskedGroup(
            mask=display.ShapeInstance(definition=HALF),
            children=(display.ShapeInstance(definition=FULL,
                                            matrix=_tl(60 * k, 0)),))]))
    r = TpuRenderer(40, 30)
    out = r.render_batch(stages)
    assert r.last_stats.path == "batched-styled"
    for k, stage in enumerate(stages):
        single, _ = _render(stage, backend="auto")
        np.testing.assert_array_equal(out[k], single, err_msg=f"frame {k}")


def test_deep_mask_chains_white_passes():
    """A mask whose own coverage has more layers than one kernel pass
    (>16 fills) chains white passes — source-over of unit-alpha
    coverages IS the union, so the fused result matches the layered
    compositor."""
    tiles = tuple(
        display.ShapeInstance(
            definition=_rect_shape(30 + i, 140, 700, GREEN),
            matrix=_tl(120 * (i % 6), 60 * (i // 6)))
        for i in range(18))
    stage = _stage([display.MaskedGroup(
        mask=display.Container(children=tiles),
        children=(display.ShapeInstance(definition=FULL),))])
    fused, r = _render(stage, backend="auto")
    assert r._exec_path == "flatblock"
    layered, _ = _render(stage, backend="scanline")
    diff = np.abs(fused.astype(np.int32) - layered.astype(np.int32))
    assert diff.max() <= 1, f"max diff {diff.max()}"
