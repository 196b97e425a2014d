"""Fonts and static text (framework extension; the reference renders
shapes only).  Glyphs are style-less SHAPEs on the 1024-unit em square
(DefineFont3: 1/20th units); DefineText/2 lays them out with per-run
font/height/color/offset state and per-glyph advances.  The loader
expands text into white-filled glyph ShapeInstances tinted by a
pure-MULT color transform, so text rides every existing path —
draw caches, the fused kernel, and the transform sweep.
"""

import numpy as np
import pytest

from swf_renderer_tpu.models import ast, display, swf_binary
from swf_renderer_tpu.runtime.movie import load_movie_timeline, render_movie
from swf_renderer_tpu.runtime.renderer import TpuRenderer
from swf_renderer_tpu.utils.fixed import Sfixed16P16

# Two glyphs on the em square: a triangle and a square (baseline at
# y=0, glyphs extend upward with negative y like real fonts).
TRIANGLE = (
    ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), left_fill=1),
    ast.EdgeRecord(delta=ast.Vector2D(900, 0)),
    ast.EdgeRecord(delta=ast.Vector2D(-450, -900)),
    ast.EdgeRecord(delta=ast.Vector2D(-450, 900)),
)
SQUARE = (
    ast.StyleChangeRecord(move_to=ast.Vector2D(100, -800), left_fill=1),
    ast.EdgeRecord(delta=ast.Vector2D(700, 0)),
    ast.EdgeRecord(delta=ast.Vector2D(0, 800)),
    ast.EdgeRecord(delta=ast.Vector2D(-700, 0)),
    ast.EdgeRecord(delta=ast.Vector2D(0, -800),
                   control_delta=ast.Vector2D(-200, -400)),
)

FONT = swf_binary.Font(id=1, glyphs=(TRIANGLE, SQUARE))
RECT = ast.Rect(0, 4000, 0, 2400)


def _identity():
    one = Sfixed16P16.from_value(1)
    zero = Sfixed16P16.from_value(0)
    return ast.Matrix(scale_x=one, scale_y=one, rotate_skew0=zero,
                      rotate_skew1=zero, translate_x=0, translate_y=0)


def _scale_translate(s, tx, ty):
    sv = Sfixed16P16.from_value(s)
    zero = Sfixed16P16.from_value(0)
    return ast.Matrix(scale_x=sv, scale_y=sv, rotate_skew0=zero,
                      rotate_skew1=zero, translate_x=tx, translate_y=ty)


def _strip(blob, code):
    head = int.from_bytes(blob[:2], "little")
    assert head >> 6 == code
    return blob[2 + (4 if (head & 0x3F) == 0x3F else 0):]


def test_define_font_roundtrip():
    blob = swf_binary.emit_define_font(FONT)
    parsed = swf_binary.parse_define_font_tag(
        _strip(blob, swf_binary.TAG_DEFINE_FONT))
    assert parsed.glyphs == FONT.glyphs and parsed.id == 1
    assert parsed.divisor == 1


def test_define_font2_and_font3_roundtrip():
    f2 = swf_binary.Font(id=2, glyphs=(TRIANGLE, SQUARE), name="Tri",
                         code_table=(65, 66))
    parsed = swf_binary.parse_define_font2_tag(
        _strip(swf_binary.emit_define_font2(f2),
               swf_binary.TAG_DEFINE_FONT2))
    assert (parsed.glyphs, parsed.name, parsed.code_table) == (
        f2.glyphs, "Tri", (65, 66))
    f3 = swf_binary.Font(id=3, glyphs=(SQUARE,), divisor=20, name="S",
                         code_table=(83,))
    parsed3 = swf_binary.parse_define_font2_tag(
        _strip(swf_binary.emit_define_font2(f3),
               swf_binary.TAG_DEFINE_FONT3), font3=True)
    assert parsed3.divisor == 20 and parsed3.glyphs == f3.glyphs


RED = ast.StraightSRgba8(200, 30, 30, 255)
BLUE_T = ast.StraightSRgba8(20, 40, 220, 128)


def _text(runs, text_id=5, matrix=None):
    return swf_binary.Text(id=text_id, bounds=RECT,
                           matrix=matrix or _identity(), runs=tuple(runs))


def test_define_text_roundtrip():
    text = _text([
        swf_binary.TextRun(glyphs=((0, 1100), (1, -200), (0, 950)),
                           font_id=1, height=2048, color=RED,
                           x_offset=100, y_offset=1000),
        swf_binary.TextRun(glyphs=((1, 800),),
                           color=ast.StraightSRgba8(1, 2, 3, 255)),
    ])
    parsed = swf_binary.parse_define_text_tag(
        _strip(swf_binary.emit_define_text(text),
               swf_binary.TAG_DEFINE_TEXT))
    assert parsed == text


def test_define_text2_rgba_roundtrip():
    text = _text([swf_binary.TextRun(glyphs=((1, 900),), font_id=1,
                                     height=1024, color=BLUE_T,
                                     x_offset=0, y_offset=900)])
    parsed = swf_binary.parse_define_text_tag(
        _strip(swf_binary.emit_define_text(text, text2=True),
               swf_binary.TAG_DEFINE_TEXT2), text2=True)
    assert parsed == text


def _movie_with_text(text, fonts=(FONT,)):
    return swf_binary.emit_movie_timeline(
        [[swf_binary.Placement(depth=1, character_id=text.id)]],
        stage_rect=RECT, fonts=fonts, texts=[text])


def _glyph_twin_stage(entries, bg=ast.StraightSRgba8(255, 255, 255, 255)):
    """Hand-built equivalent: each entry = (records, scale, x, y, color)
    placed as a DIRECTLY colored shape (no tint transform) — pins the
    white-fill x MULT-ct == direct-color exactness."""
    children = []
    for i, (records, s, x, y, color) in enumerate(entries):
        shape = ast.DefineShape(
            id=100 + i, bounds=ast.Rect(-20480, 40960, -40960, 20480),
            shape=ast.ShapeBody(
                initial_styles=ast.ShapeStyles(
                    fill=(ast.SolidFill(color=color),), line=()),
                records=records))
        children.append(display.ShapeInstance(
            definition=shape, matrix=_scale_translate(s, x, y)))
    return display.Stage(width=200, height=120, background_color=bg,
                         children=tuple(children),
                         exact_width=200.0, exact_height=120.0)


def test_text_renders_like_equivalent_shapes():
    text = _text([swf_binary.TextRun(
        glyphs=((0, 1100), (1, 900)), font_id=1, height=2048,
        color=RED, x_offset=100, y_offset=2000)])
    got = render_movie(_movie_with_text(text))
    want = TpuRenderer(200, 120).render(_glyph_twin_stage([
        (TRIANGLE, 2.0, 100, 2000, RED),
        (SQUARE, 2.0, 1200, 2000, RED),
    ]))
    np.testing.assert_array_equal(got, want)


def test_text_run_state_retention_and_pen():
    """A second run with only a color change keeps the font, height,
    and pen position (x continues from the advances)."""
    text = _text([
        swf_binary.TextRun(glyphs=((0, 1000),), font_id=1, height=1024,
                           color=RED, x_offset=0, y_offset=1200),
        swf_binary.TextRun(glyphs=((1, 800),),
                           color=ast.StraightSRgba8(10, 180, 60, 255)),
    ])
    got = render_movie(_movie_with_text(text))
    want = TpuRenderer(200, 120).render(_glyph_twin_stage([
        (TRIANGLE, 1.0, 0, 1200, RED),
        (SQUARE, 1.0, 1000, 1200, ast.StraightSRgba8(10, 180, 60, 255)),
    ]))
    np.testing.assert_array_equal(got, want)


def test_font3_twentieth_units():
    font3 = swf_binary.Font(id=1, glyphs=(SQUARE,), divisor=20,
                            name="S", code_table=(83,))
    text = _text([swf_binary.TextRun(glyphs=((0, 600),), font_id=1,
                                     height=2048, color=RED,
                                     x_offset=200, y_offset=1500)])
    got = render_movie(_movie_with_text(text, fonts=(font3,)))
    want = TpuRenderer(200, 120).render(_glyph_twin_stage([
        (SQUARE, 0.1, 200, 1500, RED),  # 2048 / (1024 * 20)
    ]))
    np.testing.assert_array_equal(got, want)


def test_text_matrix_and_translucent_color():
    matrix = _scale_translate(1.5, 300, 0)
    text = _text([swf_binary.TextRun(glyphs=((0, 1000),), font_id=1,
                                     height=1024, color=BLUE_T,
                                     x_offset=0, y_offset=1000)],
                 matrix=matrix)
    got = render_movie(_movie_with_text(text))
    # Twin: the text matrix composes outside the glyph placement.
    shape = ast.DefineShape(
        id=100, bounds=ast.Rect(-20480, 40960, -40960, 20480),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=(ast.SolidFill(color=BLUE_T),), line=()),
            records=TRIANGLE))
    stage = display.Stage(
        width=200, height=120,
        background_color=ast.StraightSRgba8(255, 255, 255, 255),
        children=(display.Container(
            children=(display.ShapeInstance(
                definition=shape,
                matrix=_scale_translate(1.0, 0, 1000)),),
            matrix=matrix),),
        exact_width=200.0, exact_height=120.0)
    want = TpuRenderer(200, 120).render(stage)
    np.testing.assert_array_equal(got, want)


def test_moving_text_rides_transform_sweep():
    """A timeline that moves a text placement auto-routes to the
    on-device transform sweep (glyph definitions are identity-stable)."""
    text = _text([swf_binary.TextRun(glyphs=((0, 1100), (1, 900)),
                                     font_id=1, height=1024, color=RED,
                                     x_offset=0, y_offset=1100)])
    P = swf_binary.Placement
    frames = [[P(depth=1, character_id=5,
                 matrix=_scale_translate(1.0, 0, 0))]]
    for k in range(1, 6):
        frames.append([P(depth=1, move=True,
                         matrix=_scale_translate(1.0, 120 * k, 40 * k))])
    movie = swf_binary.emit_movie_timeline(
        frames, stage_rect=RECT, fonts=[FONT], texts=[text])
    stages, _ = load_movie_timeline(movie)
    r = TpuRenderer(stages[0].width, stages[0].height)
    out = r.render_batch(stages)
    assert "sweep" in (r.last_stats.path or "")
    single = TpuRenderer(stages[3].width, stages[3].height).render(
        stages[3])
    np.testing.assert_array_equal(out[3], single)


# ---------------------------------------------------------------------------
# DefineEditText (dynamic text fields, rendered via embedded fonts)
# ---------------------------------------------------------------------------

# Code table maps 'A' -> triangle, 'B' -> square.
LAYOUT_FONT = swf_binary.Font(
    id=1, glyphs=(TRIANGLE, SQUARE), name="AB", code_table=(65, 66),
    ascent=900, descent=200, leading=60, advances=(1000, 850))


def test_font2_layout_roundtrip():
    parsed = swf_binary.parse_define_font2_tag(
        _strip(swf_binary.emit_define_font2(LAYOUT_FONT),
               swf_binary.TAG_DEFINE_FONT2))
    assert (parsed.ascent, parsed.descent, parsed.leading) == (900, 200, 60)
    assert parsed.advances == (1000, 850)
    assert parsed.glyphs == LAYOUT_FONT.glyphs


def _edit_field(**kw):
    defaults = dict(id=6, bounds=ast.Rect(0, 4000, 0, 2400), font_id=1,
                    height=1024, color=ast.StraightSRgba8(10, 10, 10, 255),
                    text="AB A", use_outlines=True)
    defaults.update(kw)
    return swf_binary.EditText(**defaults)


def test_edit_text_tag_roundtrip():
    field = _edit_field(word_wrap=True, multiline=True, align=2,
                        left_margin=80, right_margin=40, indent=20,
                        leading=100, var_name="score")
    parsed = swf_binary.parse_define_edit_text_tag(
        _strip(swf_binary.emit_define_edit_text(field),
               swf_binary.TAG_DEFINE_EDIT_TEXT))
    assert parsed == field


def _movie_with_field(field, font=LAYOUT_FONT):
    return swf_binary.emit_movie_timeline(
        [[swf_binary.Placement(depth=1, character_id=field.id)]],
        stage_rect=ast.Rect(0, 4000, 0, 2400), fonts=[font],
        texts=[field])


def test_edit_text_renders_like_manual_layout():
    """Single-line field: pen math (gutter + margins, baseline at the
    ascent, advance table) replicated by hand renders pixel-equal."""
    field = _edit_field(text="AB", left_margin=100)
    got = render_movie(_movie_with_field(field))
    g, asc = 40, 900  # gutter twips, ascent em-units at height 1024
    x = 0 + g + 100
    entries = [(TRIANGLE, 1.0, x, g + asc, field.color),
               (SQUARE, 1.0, x + 1000, g + asc, field.color)]
    want = TpuRenderer(200, 120).render(_glyph_twin_stage(entries))
    np.testing.assert_array_equal(got, want)


def test_edit_text_word_wrap_and_multiline():
    narrow = _edit_field(text="AB AB", word_wrap=True, multiline=True,
                         bounds=ast.Rect(0, 2200, 0, 2400))
    got = render_movie(_movie_with_field(narrow),
                       )
    # 'AB ' is ~2850 twips with the space advance; the second 'AB'
    # wraps.  Line height = (900 + 200) * 1 + 0 leading = 1100 twips.
    g, asc = 40, 900
    entries = [
        (TRIANGLE, 1.0, g, g + asc, narrow.color),
        (SQUARE, 1.0, g + 1000, g + asc, narrow.color),
        (TRIANGLE, 1.0, g, g + asc + 1100, narrow.color),
        (SQUARE, 1.0, g + 1000, g + asc + 1100, narrow.color),
    ]
    want = TpuRenderer(200, 120).render(_glyph_twin_stage(entries))
    np.testing.assert_array_equal(got, want)


def test_edit_text_alignment_shifts_lines():
    left = render_movie(_movie_with_field(_edit_field(align=0)))
    right = render_movie(_movie_with_field(_edit_field(align=1)))
    center = render_movie(_movie_with_field(_edit_field(align=2)))
    def ink_cols(frame):
        ink = (frame[..., :3] < 200).any(axis=(0, 2))
        idx = np.nonzero(ink)[0]
        return idx[0], idx[-1]
    l0, l1 = ink_cols(left)
    r0, r1 = ink_cols(right)
    c0, c1 = ink_cols(center)
    assert l0 < c0 < r0 and l1 < c1 < r1


def test_edit_text_unmapped_chars_drop():
    got = render_movie(_movie_with_field(_edit_field(text="AZB")))
    want = render_movie(_movie_with_field(_edit_field(text="AB")))
    np.testing.assert_array_equal(got, want)


# Space glyph (empty outline) so justify has stretchable word gaps.
SPACE_FONT = swf_binary.Font(
    id=1, glyphs=(TRIANGLE, SQUARE, ()), name="AB ",
    code_table=(65, 66, 32), ascent=900, descent=200, leading=60,
    advances=(1000, 850, 500))


def test_edit_text_justify_matches_manual_layout():
    """align=3: wrapped lines stretch their word gaps to fill the
    margin box; the last line stays left-set.  Pinned against a
    hand-laid glyph twin (VERDICT r4 item 10)."""
    field = _edit_field(text="AB AB AB AB", height=512, align=3,
                        word_wrap=True, multiline=True)
    got = render_movie(_movie_with_field(field, font=SPACE_FONT))
    # scale 0.5: A=500, B=425, space=250 twips; bounds 4000 - gutters ->
    # x_right 3960.  Three words fit (40+3*1175 < 3960), the fourth
    # wraps.  Line 1 justified: stripped width 3275, slack 645 over two
    # gaps -> +322.5 per space.
    g, asc, lh = 40, 450, 550  # gutter, 900*0.5 ascent, (900+200)*0.5
    s = 0.5
    entries = []
    x = 40.0
    y1 = g + asc
    for adv, records in ((500, TRIANGLE), (425, SQUARE), (250 + 322.5, None),
                         (500, TRIANGLE), (425, SQUARE), (250 + 322.5, None),
                         (500, TRIANGLE), (425, SQUARE)):
        if records is not None:
            entries.append((records, s, int(round(x)), y1, field.color))
        x += adv
    x = 40.0
    for adv, records in ((500, TRIANGLE), (425, SQUARE)):
        entries.append((records, s, int(round(x)), y1 + lh, field.color))
        x += adv
    want = TpuRenderer(200, 120).render(_glyph_twin_stage(entries))
    np.testing.assert_array_equal(got, want)
    # And the justified line really reaches the right margin.
    ink = (got[..., :3] < 200).any(axis=(0, 2))
    assert np.nonzero(ink)[0][-1] >= 3960 / 20 - 4


# ---------------------------------------------------------------------------
# Buttons (UP state) and DefineFontInfo
# ---------------------------------------------------------------------------


def test_button2_roundtrip_and_up_state_render():
    """A DefineButton2 renders its UP-state records as a depth-ordered
    container; over/down/hit-only records draw nothing."""
    import numpy as np

    from swf_renderer_tpu.runtime.movie import render_movie

    sq = ast.DefineShape(
        id=2, bounds=ast.Rect(0, 800, 0, 600),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=(ast.SolidFill(color=RED),), line=()),
            records=(
                ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0),
                                      left_fill=1),
                ast.EdgeRecord(delta=ast.Vector2D(800, 0)),
                ast.EdgeRecord(delta=ast.Vector2D(0, 600)),
                ast.EdgeRecord(delta=ast.Vector2D(-800, 0)),
                ast.EdgeRecord(delta=ast.Vector2D(0, -600)),
            )))
    blue = ast.StraightSRgba8(10, 10, 200, 255)
    sq_blue = ast.DefineShape(
        id=3, bounds=sq.bounds,
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=(ast.SolidFill(color=blue),), line=()),
            records=sq.shape.records))
    button = swf_binary.Button(id=9, records=(
        swf_binary.ButtonRecord(character_id=2, depth=1,
                                matrix=_identity(), states=0x01),  # up
        swf_binary.ButtonRecord(character_id=3, depth=2,
                                matrix=_scale_translate(1.0, 400, 0),
                                states=0x06),  # over | down only
    ))
    blob = swf_binary.emit_define_button2(button)
    head = int.from_bytes(blob[:2], "little")
    off = 2 + (4 if (head & 0x3F) == 0x3F else 0)
    parsed = swf_binary.parse_define_button2_tag(blob[off:])
    assert parsed.id == 9 and len(parsed.records) == 2
    assert parsed.records[0].states == 0x01
    assert [r.character_id for r in parsed.state_records(0x01)] == [2]

    movie = swf_binary.emit_movie_timeline(
        [[swf_binary.Placement(depth=1, character_id=9)]],
        shapes=[sq, sq_blue], buttons=[button],
        stage_rect=ast.Rect(0, 1600, 0, 600))
    got = render_movie(movie)
    want = render_movie(swf_binary.emit_movie_timeline(
        [[swf_binary.Placement(depth=1, character_id=2)]],
        shapes=[sq, sq_blue], stage_rect=ast.Rect(0, 1600, 0, 600)))
    np.testing.assert_array_equal(got, want)


def _button_movie_shapes():
    sq = ast.DefineShape(
        id=2, bounds=ast.Rect(0, 800, 0, 600),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=(ast.SolidFill(color=RED),), line=()),
            records=(
                ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0),
                                      left_fill=1),
                ast.EdgeRecord(delta=ast.Vector2D(800, 0)),
                ast.EdgeRecord(delta=ast.Vector2D(0, 600)),
                ast.EdgeRecord(delta=ast.Vector2D(-800, 0)),
                ast.EdgeRecord(delta=ast.Vector2D(0, -600)),
            )))
    blue = ast.StraightSRgba8(10, 10, 200, 255)
    sq_blue = ast.DefineShape(
        id=3, bounds=sq.bounds,
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=(ast.SolidFill(color=blue),), line=()),
            records=sq.shape.records))
    return sq, sq_blue


def test_button_state_selection_renders_down_records():
    """load/render with button_state='down' draws the over|down records
    instead of up; up|hit records still draw in the up state."""
    from swf_renderer_tpu.runtime.movie import render_movie

    sq, sq_blue = _button_movie_shapes()
    button = swf_binary.Button(id=9, records=(
        swf_binary.ButtonRecord(character_id=2, depth=1,
                                matrix=_identity(), states=0x09),  # up|hit
        swf_binary.ButtonRecord(character_id=3, depth=2,
                                matrix=_scale_translate(1.0, 400, 0),
                                states=0x06),  # over | down
    ))
    movie = swf_binary.emit_movie_timeline(
        [[swf_binary.Placement(depth=1, character_id=9)]],
        shapes=[sq, sq_blue], buttons=[button],
        stage_rect=ast.Rect(0, 1600, 0, 600))
    up = render_movie(movie)  # default state: the up|hit red square
    want_up = render_movie(swf_binary.emit_movie_timeline(
        [[swf_binary.Placement(depth=1, character_id=2)]],
        shapes=[sq, sq_blue], stage_rect=ast.Rect(0, 1600, 0, 600)))
    np.testing.assert_array_equal(up, want_up)
    down = render_movie(movie, button_state="down")
    want_down = render_movie(swf_binary.emit_movie_timeline(
        [[swf_binary.Placement(depth=1, character_id=3,
                               matrix=_scale_translate(1.0, 400, 0))]],
        shapes=[sq, sq_blue], stage_rect=ast.Rect(0, 1600, 0, 600)))
    np.testing.assert_array_equal(down, want_down)
    with pytest.raises(ValueError, match="unknown button state"):
        render_movie(movie, button_state="hover")


def test_button2_record_filters_and_blend_roundtrip_and_render():
    """SWF8 per-record filter/blend trailers: emit -> parse preserves
    them, and the record renders exactly like the equivalent
    PlaceObject3 placement carrying the same filters + blend."""
    from swf_renderer_tpu.ops.filters import BlurFilter
    from swf_renderer_tpu.runtime.movie import render_movie

    sq, sq_blue = _button_movie_shapes()
    blur = BlurFilter(blur_x=2.0, blur_y=2.0, passes=1)
    button = swf_binary.Button(id=9, records=(
        swf_binary.ButtonRecord(character_id=2, depth=1,
                                matrix=_scale_translate(1.0, 100, 100),
                                states=0x01, filters=(blur,),
                                blend="add"),))
    blob = swf_binary.emit_define_button2(button)
    head = int.from_bytes(blob[:2], "little")
    off = 2 + (4 if (head & 0x3F) == 0x3F else 0)
    parsed = swf_binary.parse_define_button2_tag(blob[off:])
    assert parsed.records[0].filters == (blur,)
    assert parsed.records[0].blend == "add"

    movie = swf_binary.emit_movie_timeline(
        [[swf_binary.Placement(depth=1, character_id=9)]],
        shapes=[sq, sq_blue], buttons=[button],
        stage_rect=ast.Rect(0, 1600, 0, 600))
    got = render_movie(movie)
    want = render_movie(swf_binary.emit_movie_timeline(
        [[swf_binary.Placement(depth=1, character_id=2,
                               matrix=_scale_translate(1.0, 100, 100),
                               filters=(blur,), blend="add")]],
        shapes=[sq, sq_blue], stage_rect=ast.Rect(0, 1600, 0, 600)))
    np.testing.assert_array_equal(got, want)


def test_font_info_attaches_codes_to_v1_font():
    """DefineFontInfo gives a tag-10 font its character codes, making
    it usable by EditText."""
    base = swf_binary.emit_movie_timeline(
        [[swf_binary.Placement(
            depth=1, character_id=6)]],
        stage_rect=ast.Rect(0, 4000, 0, 2400),
        fonts=[swf_binary.Font(id=1, glyphs=(TRIANGLE, SQUARE))],
        texts=[swf_binary.Text(
            id=6, bounds=ast.Rect(0, 4000, 0, 2400), matrix=_identity(),
            runs=(swf_binary.TextRun(glyphs=((0, 1000),), font_id=1,
                                     height=1024, color=RED,
                                     x_offset=0, y_offset=1000),))])
    info = swf_binary.emit_define_font_info(1, "TriFont", (65, 66))
    end = base.rindex(b"\x40\x00")
    movie = base[:end] + info + base[end:]
    movie = movie[:4] + len(movie).to_bytes(4, "little") + movie[8:]
    parsed = swf_binary.parse_movie(movie)
    assert parsed.fonts[1].code_table == (65, 66)
    assert parsed.fonts[1].name == "TriFont"
    assert parsed.fonts[1].glyph_for_code(66) == 1


def test_frame_server_button_state_switch():
    """POST /movie?button_state=down renders the over|down records over
    HTTP — the interactive state switch exposed through the embedding
    surface (VERDICT r4 item 10)."""
    import threading
    import urllib.request

    from tools.frame_server import FrameServer, Handler
    from swf_renderer_tpu.runtime.movie import render_movie
    from swf_renderer_tpu.utils.png import read_png

    sq, sq_blue = _button_movie_shapes()
    button = swf_binary.Button(id=9, records=(
        swf_binary.ButtonRecord(character_id=2, depth=1,
                                matrix=_identity(), states=0x01),
        swf_binary.ButtonRecord(character_id=3, depth=2,
                                matrix=_scale_translate(1.0, 400, 0),
                                states=0x06),
    ))
    movie = swf_binary.emit_movie_timeline(
        [[swf_binary.Placement(depth=1, character_id=9)]],
        shapes=[sq, sq_blue], buttons=[button],
        stage_rect=ast.Rect(0, 1600, 0, 600))
    server = FrameServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(query=""):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/movie{query}", data=movie,
            method="POST")
        with urllib.request.urlopen(req) as resp:
            return read_png(resp.read())

    try:
        np.testing.assert_array_equal(post(), render_movie(movie))
        np.testing.assert_array_equal(
            post("?button_state=down"),
            render_movie(movie, button_state="down"))
        np.testing.assert_array_equal(
            post("?button_state=hit"),
            render_movie(movie, button_state="hit"))
    finally:
        server.shutdown()


def test_define_button_cxform_tints_records():
    """DefineButtonCxform (tag 23) round-trips the wire and tints the
    button's records exactly like an equivalent placement color
    transform on the record's character."""
    sq, sq_blue = _button_movie_shapes()
    button = swf_binary.Button(id=9, records=(
        swf_binary.ButtonRecord(character_id=2, depth=1,
                                matrix=_identity(), states=0x01),))
    # wire-exact terms: mults are /256 fixed, adds /255
    bct = ((0.5, 1.0, 0.25, 1.0), (0.2, 0.0, 0.2, 0.0))
    movie = swf_binary.emit_movie_timeline(
        [[swf_binary.Placement(depth=1, character_id=9)]],
        shapes=[sq, sq_blue], buttons=[button], button_cxforms={9: bct},
        stage_rect=ast.Rect(0, 1600, 0, 600))
    parsed = swf_binary.parse_movie(movie)
    assert parsed.button_cxforms[9] == bct
    got = render_movie(movie)
    want = render_movie(swf_binary.emit_movie_timeline(
        [[swf_binary.Placement(depth=1, character_id=2,
                               color_transform=bct)]],
        shapes=[sq, sq_blue], stage_rect=ast.Rect(0, 1600, 0, 600)))
    np.testing.assert_array_equal(got, want)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="RGB terms only"):
        swf_binary.emit_define_button_cxform(
            9, ((1.0, 1.0, 1.0, 0.5), (0.0,) * 4))
