"""Movie loader tests: .swf files round-trip to bit-identical renders.

``runtime.movie`` reverses ``swf_binary.emit_movie``: a corpus sample
assembled into a movie (define tags + PlaceObject2 matrix/ratio/color
transform + SetBackgroundColor + frame RECT) must rasterize exactly like
a hand-built Stage of the same content — placements, depth order, morph
ratios, bitmaps, and color transforms all survive the wire format.
"""

import json
import math
from pathlib import Path

import numpy as np
import pytest

from swf_renderer_tpu.models import ast, display, swf_binary
from swf_renderer_tpu.models.ast_io import (
    parse_define_bitmap,
    parse_define_morph_shape,
    parse_define_shape,
)
from swf_renderer_tpu.runtime.movie import load_movie_stage, render_movie
from swf_renderer_tpu.runtime.renderer import TpuRenderer
from swf_renderer_tpu.utils.fixed import Sfixed16P16

WHITE = ast.StraightSRgba8(255, 255, 255, 255)


def _translate(tx: int, ty: int) -> ast.Matrix:
    return ast.Matrix(
        scale_x=Sfixed16P16.from_value(1),
        scale_y=Sfixed16P16.from_value(1),
        rotate_skew0=Sfixed16P16.from_value(0),
        rotate_skew1=Sfixed16P16.from_value(0),
        translate_x=tx, translate_y=ty)


def _load_shape(reference_tests: Path, case: str) -> ast.DefineShape:
    return parse_define_shape(
        json.loads((reference_tests / case / "ast.json").read_text()))


def _render_stage(stage: display.Stage, bitmaps=()) -> np.ndarray:
    r = TpuRenderer(stage.width, stage.height)
    for b in bitmaps:
        r.add_bitmap(b)
    return r.render(stage)


def _span_rect(b: ast.Rect) -> ast.Rect:
    return ast.Rect(0, b.x_max - b.x_min, 0, b.y_max - b.y_min)


def _stage_like(tag_bounds: ast.Rect, children) -> display.Stage:
    span_x = tag_bounds.x_max - tag_bounds.x_min
    span_y = tag_bounds.y_max - tag_bounds.y_min
    return display.Stage(
        width=math.ceil(span_x / 20), height=math.ceil(span_y / 20),
        background_color=WHITE, children=tuple(children),
        exact_width=span_x / 20, exact_height=span_y / 20)


@pytest.mark.parametrize("case", [
    "flat-shapes/triangle", "flat-shapes/squares",
    "flat-shapes/homestuck-beta-1",
])
def test_movie_render_matches_direct_stage(reference_tests, case):
    tag = _load_shape(reference_tests, case)
    m = _translate(-tag.bounds.x_min, -tag.bounds.y_min)
    movie = swf_binary.emit_movie(
        [tag], shape_matrices=[m], stage_rect=_span_rect(tag.bounds))
    got = render_movie(movie)
    want = _render_stage(_stage_like(
        tag.bounds, [display.ShapeInstance(definition=tag, matrix=m)]))
    np.testing.assert_array_equal(got, want)


def test_movie_render_morph_ratio(reference_tests):
    tag = parse_define_morph_shape(
        (reference_tests / "flat-morph-shapes" / "homestuck-beta-29"
         / "ast.json").read_text())
    x_min = min(tag.bounds.x_min, tag.morph_bounds.x_min)
    x_max = max(tag.bounds.x_max, tag.morph_bounds.x_max)
    y_min = min(tag.bounds.y_min, tag.morph_bounds.y_min)
    y_max = max(tag.bounds.y_max, tag.morph_bounds.y_max)
    m = _translate(-x_min, -y_min)
    rect = ast.Rect(0, x_max - x_min, 0, y_max - y_min)
    movie = swf_binary.emit_movie(
        [], morphs=[(tag, 0.5)], morph_matrices=[m], stage_rect=rect)
    got = render_movie(movie)
    want = _render_stage(_stage_like(
        ast.Rect(x_min, x_max, y_min, y_max),
        [display.MorphShapeInstance(definition=tag, ratio=0.5, matrix=m)]))
    np.testing.assert_array_equal(got, want)
    # The placed ratio survives quantization to within one u16 step.
    stage, _ = load_movie_stage(movie)
    assert abs(stage.children[0].ratio - 0.5) < 1e-4


def test_movie_render_textured_bitmap(reference_tests):
    bitmap = parse_define_bitmap(
        (reference_tests / "bitmap" / "homestuck-beta-3.ast.json")
        .read_text())
    tag = _load_shape(reference_tests, "textured-shapes/homestuck-beta-4")
    m = _translate(-tag.bounds.x_min, -tag.bounds.y_min)
    movie = swf_binary.emit_movie(
        [tag], bitmaps=[bitmap], shape_matrices=[m],
        stage_rect=_span_rect(tag.bounds))
    got = render_movie(movie)
    want = _render_stage(
        _stage_like(tag.bounds,
                    [display.ShapeInstance(definition=tag, matrix=m)]),
        bitmaps=[bitmap])
    np.testing.assert_array_equal(got, want)


def test_movie_color_transform(reference_tests):
    """CXFORMWITHALPHA survives the wire (exactly-representable fixed
    8.8 mults / integer adds) and renders like the display-list
    ColorTransform it maps to."""
    tag = _load_shape(reference_tests, "flat-shapes/triangle")
    m = _translate(-tag.bounds.x_min, -tag.bounds.y_min)
    ct = ((0.5, 1.0, 0.25, 1.0), (64 / 255.0, 0.0, 0.0, 0.0))
    movie = swf_binary.emit_movie(
        [tag], shape_matrices=[m], stage_rect=_span_rect(tag.bounds),
        shape_color_transforms=[ct])
    stage, _ = load_movie_stage(movie)
    child = stage.children[0]
    assert child.color_transform == display.ColorTransform(
        mult=ct[0], add=ct[1])
    got = render_movie(movie)
    want = _render_stage(_stage_like(tag.bounds, [
        display.ShapeInstance(
            definition=tag, matrix=m,
            color_transform=display.ColorTransform(mult=ct[0],
                                                   add=ct[1]))]))
    np.testing.assert_array_equal(got, want)
    plain = render_movie(swf_binary.emit_movie(
        [tag], shape_matrices=[m], stage_rect=_span_rect(tag.bounds)))
    assert np.any(got != plain), "color transform changed nothing"


def test_movie_nonzero_origin_rect(reference_tests):
    """A frame RECT with a nonzero origin shifts the stage like the
    player's origin: content placed at the rect min renders at (0, 0)."""
    tag = _load_shape(reference_tests, "flat-shapes/triangle")
    base = _translate(-tag.bounds.x_min, -tag.bounds.y_min)
    off = _translate(base.translate_x + 400, base.translate_y + 800)
    span = _span_rect(tag.bounds)
    rect = ast.Rect(400, span.x_max + 400, 800, span.y_max + 800)
    movie = swf_binary.emit_movie(
        [tag], shape_matrices=[off], stage_rect=rect)
    got = render_movie(movie)
    want = _render_stage(_stage_like(
        tag.bounds, [display.ShapeInstance(definition=tag, matrix=base)]))
    np.testing.assert_array_equal(got, want)


def test_movie_undefined_character_raises():
    movie = swf_binary.emit_movie(
        [], morphs=[], stage_rect=ast.Rect(0, 200, 0, 200))
    # Splice in a dangling placement.
    place = swf_binary._emit_place_object2(
        swf_binary.Placement(depth=1, character_id=99))
    end = movie.rindex(b"\x40\x00")  # ShowFrame header is before END
    patched = movie[:end] + place + movie[end:]
    patched = patched[:4] + len(patched).to_bytes(4, "little") + patched[8:]
    with pytest.raises(KeyError):
        load_movie_stage(patched)


# ---------------------------------------------------------------------------
# Timelines (multi-frame movies)
# ---------------------------------------------------------------------------


def test_movie_timeline_move_and_remove(reference_tests):
    """A three-frame movie: place, move (retaining unspecified
    attributes), remove.  Snapshots resolve correctly and the batched
    render equals rendering the same hand-built stages."""
    tag = _load_shape(reference_tests, "flat-shapes/triangle")
    base = _translate(-tag.bounds.x_min, -tag.bounds.y_min)
    moved = _translate(base.translate_x + 400, base.translate_y + 200)
    ct = ((0.5, 0.5, 0.5, 1.0), (0.0, 0.0, 0.0, 0.0))
    span = _span_rect(tag.bounds)
    rect = ast.Rect(0, span.x_max + 400, 0, span.y_max + 200)
    movie = swf_binary.emit_movie_timeline(
        frames=[
            [swf_binary.Placement(depth=1, character_id=tag.id,
                                  matrix=base, color_transform=ct)],
            [swf_binary.Placement(depth=1, matrix=moved, move=True)],
            [swf_binary.RemoveObject(depth=1)],
        ],
        shapes=[tag], stage_rect=rect)

    parsed = swf_binary.parse_movie(movie)
    assert len(parsed.frames) == 3
    f0, f1, f2 = parsed.frames
    assert f0[0].matrix == base and f0[0].color_transform == ct
    # The move changed the matrix and RETAINED the color transform.
    assert f1[0].matrix == moved and f1[0].color_transform == ct
    assert f1[0].character_id == tag.id
    assert f2 == ()

    from swf_renderer_tpu.runtime.movie import (
        load_movie_timeline, render_movie_timeline,
    )

    stages, _ = load_movie_timeline(movie)
    got = render_movie_timeline(movie)
    want = np.stack([_render_stage(s) for s in stages])
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    # render_batch may take the fused batch path; its contract vs
    # per-frame renders is one premul-u8 quantum.
    assert diff.max() <= 1, diff.max()
    assert got.shape[0] == 3
    assert np.any(got[0] != got[1]), "move changed nothing"
    # The removed frame shows only the background.
    bg = np.array([255, 255, 255, 255], np.uint8)
    assert (got[2] == bg).all()


def test_movie_timeline_replace_retains_matrix(reference_tests):
    """PlaceFlagMove WITH a character id swaps the definition at the
    depth but keeps the unspecified matrix (player semantics)."""
    tri = _load_shape(reference_tests, "flat-shapes/triangle")
    sq = _load_shape(reference_tests, "flat-shapes/squares")
    import dataclasses as dc
    sq = dc.replace(sq, id=tri.id + 1)
    base = _translate(-tri.bounds.x_min, -tri.bounds.y_min)
    movie = swf_binary.emit_movie_timeline(
        frames=[
            [swf_binary.Placement(depth=1, character_id=tri.id,
                                  matrix=base)],
            [swf_binary.Placement(depth=1, character_id=sq.id,
                                  move=True)],
        ],
        shapes=[tri, sq],
        stage_rect=_span_rect(tri.bounds))
    parsed = swf_binary.parse_movie(movie)
    assert parsed.frames[1][0].character_id == sq.id
    assert parsed.frames[1][0].matrix == base


def test_movie_timeline_morph_ratio_track(reference_tests):
    """A morph whose ratio advances per frame via PlaceFlagMove — the
    wire form of the renderer's morph timeline tracks."""
    tag = parse_define_morph_shape(
        (reference_tests / "flat-morph-shapes" / "homestuck-beta-29"
         / "ast.json").read_text())
    x_min = min(tag.bounds.x_min, tag.morph_bounds.x_min)
    x_max = max(tag.bounds.x_max, tag.morph_bounds.x_max)
    y_min = min(tag.bounds.y_min, tag.morph_bounds.y_min)
    y_max = max(tag.bounds.y_max, tag.morph_bounds.y_max)
    m = _translate(-x_min, -y_min)
    rect = ast.Rect(0, x_max - x_min, 0, y_max - y_min)
    ratios = [0.0, 0.25, 0.5, 0.75]
    frames = [[swf_binary.Placement(depth=1, character_id=tag.id,
                                    matrix=m, ratio=ratios[0])]]
    for r in ratios[1:]:
        frames.append([swf_binary.Placement(depth=1, ratio=r, move=True)])
    movie = swf_binary.emit_movie_timeline(
        frames=frames, morphs=[tag], stage_rect=rect)
    parsed = swf_binary.parse_movie(movie)
    got_ratios = [f[0].ratio for f in parsed.frames]
    assert np.allclose(got_ratios, ratios, atol=1e-4)

    from swf_renderer_tpu.runtime.movie import render_movie_timeline

    got = render_movie_timeline(movie)
    assert got.shape[0] == len(ratios)
    # Frames differ as the morph advances.
    assert np.any(got[0] != got[-1])


def test_movie_timeline_rejects_bad_ops():
    with pytest.raises(ValueError):
        swf_binary._emit_place_object2(swf_binary.Placement(depth=1))
    tri_rect = ast.Rect(0, 200, 0, 200)
    movie = swf_binary.emit_movie_timeline(
        frames=[[swf_binary.Placement(depth=1, matrix=None, ratio=0.5,
                                      move=True)]],
        stage_rect=tri_rect)
    with pytest.raises(ValueError):
        swf_binary.parse_movie(movie)  # move at an empty depth


def test_movie_timeline_routes_to_transform_sweep(reference_tests):
    """A moving-matrix movie timeline doesn't just render correctly —
    it auto-routes to the on-device transform sweep (the perf path the
    timeline feature exists for), observable via RenderStats.path."""
    from swf_renderer_tpu.runtime.movie import load_movie_timeline

    tag = _load_shape(reference_tests, "flat-shapes/triangle")
    base = _translate(-tag.bounds.x_min, -tag.bounds.y_min)
    frames = [[swf_binary.Placement(depth=1, character_id=tag.id,
                                    matrix=base)]]
    for i in range(1, 6):
        frames.append([swf_binary.Placement(
            depth=1, move=True,
            matrix=_translate(base.translate_x + 60 * i,
                              base.translate_y + 20 * i))])
    # Whole-pixel stage rect (multiples of 20 twips) — what every real
    # movie declares; fractional rects legitimately stay on the fused
    # batch path (the sweep has no sub-pixel exact clipping).
    span_x = -(-(tag.bounds.x_max - tag.bounds.x_min + 400) // 20) * 20
    span_y = -(-(tag.bounds.y_max - tag.bounds.y_min + 200) // 20) * 20
    movie = swf_binary.emit_movie_timeline(
        frames, shapes=[tag],
        stage_rect=ast.Rect(0, span_x, 0, span_y))
    stages, bitmaps = load_movie_timeline(movie)
    renderer = TpuRenderer(stages[0].width, stages[0].height)
    out = renderer.render_batch(stages)
    assert out.shape[0] == 6
    assert renderer.last_stats.path.startswith("transform-sweep"), \
        renderer.last_stats.path


def test_interactive_movie_render_upgrades_to_1f_sweep(reference_tests):
    """Repeated render() of movie frames (same definitions, moved
    matrices — interactive .swf playback) self-upgrades to the F=1
    on-device sweep, same as hand-built stages."""
    from swf_renderer_tpu.runtime.movie import load_movie_timeline

    tag = _load_shape(reference_tests, "flat-shapes/triangle")
    base = _translate(-tag.bounds.x_min, -tag.bounds.y_min)
    frames = [[swf_binary.Placement(depth=1, character_id=tag.id,
                                    matrix=base)]]
    for i in range(1, 5):
        frames.append([swf_binary.Placement(
            depth=1, move=True,
            matrix=_translate(base.translate_x + 40 * i,
                              base.translate_y))])
    span_x = -(-(tag.bounds.x_max - tag.bounds.x_min + 200) // 20) * 20
    span_y = -(-(tag.bounds.y_max - tag.bounds.y_min) // 20) * 20
    movie = swf_binary.emit_movie_timeline(
        frames, shapes=[tag],
        stage_rect=ast.Rect(0, span_x, 0, span_y))
    stages, _ = load_movie_timeline(movie)
    renderer = TpuRenderer(stages[0].width, stages[0].height)
    paths = []
    for s in stages:
        renderer.render(s)
        paths.append(renderer.last_stats.path)
    assert any(p == "transform-sweep-1f" for p in paths), paths


def test_movie_timeline_fuzz_sweep_vs_per_stage(reference_tests):
    """Randomized rotating/translating movie timelines: the batched
    render (transform sweep) agrees with fresh per-stage renders
    (flat-block per-frame path) within the documented one-quantum
    sweep envelope — a routing-consistency net across the two
    pipelines, fed through the .swf wire format."""
    tag = _load_shape(reference_tests, "flat-shapes/triangle")
    rng = np.random.default_rng(4646)
    for trial in range(3):
        cx = float(tag.bounds.x_min + tag.bounds.x_max) / 2
        cy = float(tag.bounds.y_min + tag.bounds.y_max) / 2
        frames = []
        n = int(rng.integers(3, 6))
        for i in range(n):
            th = float(rng.uniform(0, 2 * np.pi))
            ca, sa = np.cos(th), np.sin(th)
            # Rotate about the shape center, then translate to origin
            # plus jitter (all in twips; Sfixed16P16 quantizes the
            # rotation terms identically on emit and parse).
            tx = int(-tag.bounds.x_min + cx - ca * cx + sa * cy
                     + rng.integers(0, 200))
            ty = int(-tag.bounds.y_min + cy - sa * cx - ca * cy
                     + rng.integers(0, 200))
            m = ast.Matrix(
                scale_x=Sfixed16P16.from_value(ca),
                scale_y=Sfixed16P16.from_value(ca),
                rotate_skew0=Sfixed16P16.from_value(sa),
                rotate_skew1=Sfixed16P16.from_value(-sa),
                translate_x=tx, translate_y=ty)
            if i == 0:
                frames.append([swf_binary.Placement(
                    depth=1, character_id=tag.id, matrix=m)])
            else:
                frames.append([swf_binary.Placement(
                    depth=1, move=True, matrix=m)])
        span = max(tag.bounds.x_max - tag.bounds.x_min,
                   tag.bounds.y_max - tag.bounds.y_min)
        side = -(-int(span * 1.6 + 400) // 20) * 20
        movie = swf_binary.emit_movie_timeline(
            frames, shapes=[tag], stage_rect=ast.Rect(0, side, 0, side))

        from swf_renderer_tpu.runtime.movie import load_movie_timeline

        stages, _ = load_movie_timeline(movie)
        renderer = TpuRenderer(stages[0].width, stages[0].height)
        got = renderer.render_batch(stages)
        assert renderer.last_stats.path == "transform-sweep", \
            renderer.last_stats.path
        for i, s in enumerate(stages):
            want = _render_stage(s)
            diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
            assert diff.max() <= 1, (trial, i, diff.max())


def test_movie_timeline_gradient_fill_sweeps(reference_tests):
    """A gradient-filled shape animated through the wire format routes
    to the sweep (in-kernel gradient eval under per-frame composed
    matrices) and agrees with per-stage renders."""
    stops = (ast.GradientStop(ratio=0, color=ast.StraightSRgba8(
        255, 40, 0, 255)),
        ast.GradientStop(ratio=255, color=ast.StraightSRgba8(
            0, 60, 255, 200)))
    grad = ast.Gradient(spread=ast.GradientSpread.PAD,
                        color_space=ast.ColorSpace.S_RGB, colors=stops)
    gm = ast.Matrix(
        scale_x=Sfixed16P16.from_value(0.04),
        scale_y=Sfixed16P16.from_value(0.04),
        rotate_skew0=Sfixed16P16.from_value(0),
        rotate_skew1=Sfixed16P16.from_value(0),
        translate_x=400, translate_y=400)
    fill = ast.LinearGradientFill(matrix=gm, gradient=grad)
    records = (
        ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), left_fill=1),
        ast.EdgeRecord(delta=ast.Vector2D(800, 100)),
        ast.EdgeRecord(delta=ast.Vector2D(-100, 700)),
        ast.EdgeRecord(delta=ast.Vector2D(-700, -800)),
    )
    tag = ast.DefineShape(
        id=3, bounds=ast.Rect(0, 800, 0, 800),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(fill=(fill,), line=()),
            records=records))
    frames = [[swf_binary.Placement(depth=1, character_id=3,
                                    matrix=_translate(100, 100))]]
    for i in range(1, 4):
        frames.append([swf_binary.Placement(
            depth=1, move=True, matrix=_translate(100 + 120 * i, 100))])
    movie = swf_binary.emit_movie_timeline(
        frames, shapes=[tag], stage_rect=ast.Rect(0, 1400, 0, 1000))

    from swf_renderer_tpu.runtime.movie import load_movie_timeline

    stages, _ = load_movie_timeline(movie)
    renderer = TpuRenderer(stages[0].width, stages[0].height)
    got = renderer.render_batch(stages)
    assert renderer.last_stats.path == "transform-sweep", \
        renderer.last_stats.path
    for i, s in enumerate(stages):
        want = _render_stage(s)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1, (i, diff.max())


def test_movie_timeline_bitmap_fill_sweeps(reference_tests):
    """A bitmap-filled shape (hb4 + its corpus bitmap) animated through
    the wire format routes to the sweep via per-frame field planes and
    agrees with per-stage renders (axis-aligned frames take the same
    separable filter both ways)."""
    bitmap = parse_define_bitmap(
        (reference_tests / "bitmap" / "homestuck-beta-3.ast.json")
        .read_text())
    tag = _load_shape(reference_tests, "textured-shapes/homestuck-beta-4")
    base = _translate(-tag.bounds.x_min, -tag.bounds.y_min)
    frames = [[swf_binary.Placement(depth=1, character_id=tag.id,
                                    matrix=base)]]
    for i in range(1, 3):
        frames.append([swf_binary.Placement(
            depth=1, move=True,
            matrix=_translate(base.translate_x + 60 * i,
                              base.translate_y + 40 * i))])
    span_x = -(-(tag.bounds.x_max - tag.bounds.x_min + 200) // 20) * 20
    span_y = -(-(tag.bounds.y_max - tag.bounds.y_min + 200) // 20) * 20
    movie = swf_binary.emit_movie_timeline(
        frames, shapes=[tag], bitmaps=[bitmap],
        stage_rect=ast.Rect(0, span_x, 0, span_y))

    from swf_renderer_tpu.runtime.movie import load_movie_timeline

    stages, bitmaps = load_movie_timeline(movie)
    renderer = TpuRenderer(stages[0].width, stages[0].height)
    for b in bitmaps:
        renderer.add_bitmap(b)
    got = renderer.render_batch(stages)
    assert renderer.last_stats.path == "transform-sweep", \
        renderer.last_stats.path
    for i, s in enumerate(stages):
        want = _render_stage(s, bitmaps=bitmaps)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1, (i, diff.max())


def test_movie_timeline_morph_ratio_track_sweeps():
    """A fills-only morph whose ratio advances per frame through the
    wire format routes to the on-device morph sweep plan (stroked
    morphs legitimately fall back — outlines are not linear in the
    ratio)."""
    fills = (ast.MorphSolidFill(
        color=ast.StraightSRgba8(200, 30, 30, 255),
        morph_color=ast.StraightSRgba8(30, 30, 200, 255)),)
    records = (
        ast.MorphStyleChangeRecord(
            move_to=ast.Vector2D(20, 20), morph_move_to=ast.Vector2D(40, 10),
            left_fill=1),
        ast.MorphEdgeRecord(delta=ast.Vector2D(600, 40),
                            morph_delta=ast.Vector2D(500, 120)),
        ast.MorphEdgeRecord(delta=ast.Vector2D(-60, 560),
                            morph_delta=ast.Vector2D(40, 480)),
        ast.MorphEdgeRecord(delta=ast.Vector2D(-540, -600),
                            morph_delta=ast.Vector2D(-540, -600)),
    )
    tag = ast.DefineMorphShape(
        id=5, bounds=ast.Rect(0, 660, 0, 660),
        morph_bounds=ast.Rect(0, 660, 0, 660),
        shape=ast.MorphShapeBody(
            initial_styles=ast.MorphShapeStyles(fill=fills, line=()),
            records=records))
    frames = [[swf_binary.Placement(depth=1, character_id=5,
                                    matrix=_translate(0, 0), ratio=0.0)]]
    for r in (0.3, 0.6, 0.9):
        frames.append([swf_binary.Placement(depth=1, move=True, ratio=r)])
    movie = swf_binary.emit_movie_timeline(
        frames, morphs=[tag], stage_rect=ast.Rect(0, 660, 0, 660))

    from swf_renderer_tpu.runtime.movie import load_movie_timeline

    stages, _ = load_movie_timeline(movie)
    renderer = TpuRenderer(stages[0].width, stages[0].height)
    got = renderer.render_batch(stages)
    assert renderer.last_stats.path == "transform-sweep", \
        renderer.last_stats.path
    for i, s in enumerate(stages):
        want = _render_stage(s)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1, (i, diff.max())


def test_exact_height_only_stage_stays_off_the_sweep(reference_tests):
    """A stage with only a FRACTIONAL exact_height set (exact_width
    None) must stay off the sweep — the one-sided form used to slip
    through the gate and skip the sub-pixel clip."""
    tag = _load_shape(reference_tests, "flat-shapes/triangle")
    base = _translate(-tag.bounds.x_min, -tag.bounds.y_min)
    w = math.ceil((tag.bounds.x_max - tag.bounds.x_min) / 20)
    h = math.ceil((tag.bounds.y_max - tag.bounds.y_min) / 20)
    stages = []
    for i in range(3):
        m = _translate(base.translate_x + 50 * i, base.translate_y)
        stages.append(display.Stage(
            width=w, height=h, children=(
                display.ShapeInstance(definition=tag, matrix=m),),
            exact_width=None, exact_height=h - 0.5))
    renderer = TpuRenderer(w, h)
    renderer.render_batch(stages)
    assert not renderer.last_stats.path.startswith("transform-sweep"), \
        renderer.last_stats.path
