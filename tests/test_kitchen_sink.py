"""Whole-framework integration: ONE movie exercising every subsystem.

A single emitted .swf carries solid/gradient/bitmap fills, a looping
sprite, a clip-depth mask, a blend mode, a filter, static text, a
justified EditText, a button, a 9-slice scaling grid, an ADPCM event
sound plus an MP3 stream, frame labels and exports — then the whole
thing round-trips the wire codec, renders through the batch renderer,
and mixes audio.  The point is cross-subsystem composition: each
feature's own file tests it in isolation; this pins that they coexist
in one timeline (the shape of a real movie).
"""

import numpy as np
import pytest

from swf_renderer_tpu.models import ast, sound, swf_binary
from swf_renderer_tpu.runtime.audio import mix_movie_audio
from swf_renderer_tpu.runtime.movie import (
    load_movie_timeline, render_movie_timeline,
)
from swf_renderer_tpu.utils.fixed import Sfixed16P16


def _mat(s=1.0, tx=0, ty=0):
    sv = Sfixed16P16.from_value(s)
    z = Sfixed16P16.from_value(0)
    return ast.Matrix(scale_x=sv, scale_y=sv, rotate_skew0=z,
                      rotate_skew1=z, translate_x=tx, translate_y=ty)


def _rect_shape(sid, w, h, fill):
    return ast.DefineShape(
        id=sid, bounds=ast.Rect(0, w, 0, h),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(fill=(fill,), line=()),
            records=(
                ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0),
                                      left_fill=1),
                ast.EdgeRecord(delta=ast.Vector2D(w, 0)),
                ast.EdgeRecord(delta=ast.Vector2D(0, h)),
                ast.EdgeRecord(delta=ast.Vector2D(-w, 0)),
                ast.EdgeRecord(delta=ast.Vector2D(0, -h)),
            )))


def _sine(n, freq=440.0, rate=11025, amp=0.4):
    t = np.arange(n) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(
        np.float32)[:, None]


@pytest.fixture(scope="module")
def movie_bytes():
    from swf_renderer_tpu.runtime.bitmap_service import (
        encode_x_swf_bmp2_argb,
    )

    rng = np.random.default_rng(3)
    # Bitmap character + three fills.
    rgba = rng.integers(0, 256, (8, 8, 4)).astype(np.uint8)
    rgba[..., 3] = 255
    bmp = ast.DefineBitmap(
        id=1, width=8, height=8, media_type="image/x-swf-bmp2",
        data=encode_x_swf_bmp2_argb(rgba))
    red = _rect_shape(2, 800, 600, ast.SolidFill(
        color=ast.StraightSRgba8(200, 30, 30, 255)))
    grad = _rect_shape(3, 800, 600, ast.LinearGradientFill(
        matrix=_mat(1.0 / 1638.4, 400, 300),
        gradient=ast.Gradient(
            spread=ast.GradientSpread.PAD,
            color_space=ast.ColorSpace.S_RGB,
            colors=(
                ast.GradientStop(ratio=0, color=ast.StraightSRgba8(
                    255, 0, 0, 255)),
                ast.GradientStop(ratio=255, color=ast.StraightSRgba8(
                    0, 0, 255, 255)),
            ))))
    texr = _rect_shape(4, 800, 600, ast.BitmapFill(
        bitmap_id=1, matrix=_mat(20.0),
        repeating=True, smoothed=True))
    mask_sq = _rect_shape(7, 600, 1200, ast.SolidFill(
        color=ast.StraightSRgba8(255, 255, 255, 255)))

    # Font + texts (a space glyph so justify has gaps).
    tri = (ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), left_fill=1),
           ast.EdgeRecord(delta=ast.Vector2D(900, 0)),
           ast.EdgeRecord(delta=ast.Vector2D(-450, -900)),
           ast.EdgeRecord(delta=ast.Vector2D(-450, 900)))
    font = swf_binary.Font(id=5, glyphs=(tri, ()), name="A ",
                           code_table=(65, 32), ascent=900, descent=200,
                           leading=0, advances=(1000, 500))
    field = swf_binary.EditText(
        id=6, bounds=ast.Rect(0, 3000, 0, 1200), font_id=5, height=512,
        color=ast.StraightSRgba8(10, 10, 10, 255), text="A A A A",
        align=3, word_wrap=True, multiline=True, use_outlines=True)

    button = swf_binary.Button(id=9, records=(
        swf_binary.ButtonRecord(character_id=2, depth=1, matrix=_mat(0.4),
                                states=0x01),
        swf_binary.ButtonRecord(character_id=3, depth=1, matrix=_mat(0.4),
                                states=0x06),
    ))
    sprite = (11, [
        [swf_binary.Placement(depth=1, character_id=2, matrix=_mat(0.3))],
        [swf_binary.Placement(depth=1, move=True,
                              matrix=_mat(0.3, 200, 100))],
    ])

    # Sounds: ADPCM event + MP3 stream (if the decoder fixture family
    # works, which test_mp3 already pins — here it just has to mix).
    pcm = _sine(700)
    snd = sound.Sound(id=12, format=sound.FORMAT_ADPCM, rate=11025,
                      bits=16, channels=1, sample_count=700,
                      data=sound.encode_adpcm(pcm))
    events = {0: [(12, sound.SoundInfo())]}

    frames = [
        # frame 0: background fills + clip-depth mask over the textured
        # shape + a blend-mode gradient + text + button + sprite
        [
            swf_binary.Placement(depth=1, character_id=2),
            swf_binary.Placement(depth=2, character_id=7, clip_depth=4),
            swf_binary.Placement(depth=3, character_id=4),
            swf_binary.Placement(depth=5, character_id=3, blend="multiply",
                                 matrix=_mat(0.5, 100, 100)),
            swf_binary.Placement(depth=6, character_id=6,
                                 matrix=_mat(1.0, 0, 1200)),
            swf_binary.Placement(depth=7, character_id=9,
                                 matrix=_mat(1.0, 2200, 1400)),
            swf_binary.Placement(depth=8, character_id=11,
                                 matrix=_mat(1.0, 2400, 200)),
        ],
        # frame 1: move the sprite, drop the blend layer
        [
            swf_binary.Placement(depth=8, move=True,
                                 matrix=_mat(1.0, 2000, 400)),
            swf_binary.RemoveObject(depth=5),
        ],
        # frame 2: steady state
        [],
    ]
    return swf_binary.emit_movie_timeline(
        frames, shapes=[red, grad, texr, mask_sq], bitmaps=[bmp],
        fonts=[font], texts=[field], buttons=[button], sprites=[sprite],
        scaling_grids=[(9, ast.Rect(100, 700, 100, 500))],
        sounds=(snd,), sound_events=events,
        frame_labels={0: "start", 2: "end"},
        exports={"red_square": 2},
        stage_rect=ast.Rect(0, 3200, 0, 2400), frame_rate=12.0)


def test_wire_round_trip_carries_every_subsystem(movie_bytes):
    movie = swf_binary.parse_movie(movie_bytes)
    assert set(movie.shapes) == {2, 3, 4, 7}
    assert set(movie.bitmaps) == {1}
    assert set(movie.fonts) == {5}
    assert set(movie.edit_texts) == {6}
    assert set(movie.buttons) == {9}
    assert set(movie.sprites) == {11}
    assert movie.scaling_grids[9] is not None
    assert set(movie.sounds) == {12}
    assert movie.frame_labels == {0: "start", 2: "end"}
    assert movie.exported == {"red_square": 2}
    assert len(movie.frames) == 3


def test_timeline_renders_and_composes(movie_bytes):
    stages, bitmaps = load_movie_timeline(movie_bytes)
    assert len(stages) == 3 and len(bitmaps) == 1
    frames = render_movie_timeline(movie_bytes)
    assert frames.shape == (3, 120, 160, 4)
    assert frames[..., 3].min() == 255  # opaque stage
    # Stage background (SetBackgroundColor default white) shows where
    # nothing draws.
    np.testing.assert_array_equal(frames[0, 110, 150, :3],
                                  [255, 255, 255])
    # The clip mask (x < 600 twips = 30 px) limits the textured layer:
    # right of it the red base square shows unmodified.
    np.testing.assert_array_equal(frames[0, 10, 35, :3], [200, 30, 30])
    # The masked textured shape actually drew inside the mask.
    inside = frames[0, 10, :30].astype(int)
    assert np.abs(inside[:, :3] - [200, 30, 30]).max() > 30
    # Frame 1 dropped the multiply-blend gradient (rows 5-20, cols
    # 5-25 at scale 0.5): the region reverts.
    assert (frames[0, 18, 5:25] != frames[1, 18, 5:25]).any()
    # The sprite advanced with the timeline (frames 0 vs 1 differ in
    # the sprite region) and loops on frame 2 (phase 0 again).
    assert (frames[0] != frames[1]).any()


def test_audio_mixes(movie_bytes):
    movie = swf_binary.parse_movie(movie_bytes)
    mixed = mix_movie_audio(movie, rate=11025)
    assert mixed.shape[1] == 2
    assert np.abs(mixed).max() > 0.1
