"""Randomized wire-format round-trips for the round-4 tag families:
fonts, texts, edit texts, sprites, placements (PO1/PO2/PO3 forms),
and whole movies mixing them.  Emit -> parse must be the identity on
the structured form; the movie-level test also replays the resolved
timeline against an independently tracked state oracle.
"""

import numpy as np
import pytest

from swf_renderer_tpu.models import ast, swf_binary
from swf_renderer_tpu.utils.fixed import Sfixed16P16


def _rng(seed):
    return np.random.default_rng(seed)


def _rand_matrix(rng):
    return ast.Matrix(
        scale_x=Sfixed16P16.from_value(float(rng.uniform(-3, 3))),
        scale_y=Sfixed16P16.from_value(float(rng.uniform(-3, 3))),
        rotate_skew0=Sfixed16P16.from_value(float(rng.uniform(-1, 1))),
        rotate_skew1=Sfixed16P16.from_value(float(rng.uniform(-1, 1))),
        translate_x=int(rng.integers(-30000, 30000)),
        translate_y=int(rng.integers(-30000, 30000)))


def _rand_glyph(rng):
    records = [ast.StyleChangeRecord(
        move_to=ast.Vector2D(int(rng.integers(-500, 500)),
                             int(rng.integers(-900, 100))),
        left_fill=1)]
    for _ in range(int(rng.integers(2, 7))):
        ctrl = None
        if rng.uniform() < 0.4:
            ctrl = ast.Vector2D(int(rng.integers(-300, 300)),
                                int(rng.integers(-300, 300)))
        records.append(ast.EdgeRecord(
            delta=ast.Vector2D(int(rng.integers(-600, 600)),
                               int(rng.integers(-600, 600))),
            control_delta=ctrl))
    return tuple(records)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_font_roundtrip(seed):
    rng = _rng(4000 + seed)
    n = int(rng.integers(1, 7))
    glyphs = tuple(_rand_glyph(rng) for _ in range(n))
    divisor = 20 if rng.uniform() < 0.3 else 1
    has_layout = rng.uniform() < 0.5
    font = swf_binary.Font(
        id=int(rng.integers(1, 1000)), glyphs=glyphs, divisor=divisor,
        name="".join(chr(int(c)) for c in rng.integers(65, 91, 4)),
        code_table=tuple(int(c) for c in rng.integers(32, 60000, n)),
        ascent=int(rng.integers(0, 1200)) if has_layout else 0,
        descent=int(rng.integers(0, 600)) if has_layout else 0,
        leading=int(rng.integers(-100, 300)) if has_layout else 0,
        advances=(tuple(int(a) for a in rng.integers(-200, 2500, n))
                  if has_layout else ()))
    blob = swf_binary.emit_define_font2(font)
    head = int.from_bytes(blob[:2], "little")
    off = 2 + (4 if (head & 0x3F) == 0x3F else 0)
    parsed = swf_binary.parse_define_font2_tag(blob[off:],
                                               font3=divisor == 20)
    assert parsed == font


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_text_roundtrip(seed):
    rng = _rng(5000 + seed)
    runs = []
    for ri in range(int(rng.integers(1, 5))):
        has_font = ri == 0 or rng.uniform() < 0.4
        runs.append(swf_binary.TextRun(
            glyphs=tuple(
                (int(rng.integers(0, 60)),
                 int(rng.integers(-2000, 4000)))
                for _ in range(int(rng.integers(0, 6)))),
            font_id=int(rng.integers(1, 20)) if has_font else None,
            height=int(rng.integers(20, 4000)) if has_font else None,
            color=(ast.StraightSRgba8(*rng.integers(0, 256, 3), 255)
                   if rng.uniform() < 0.7 else None),
            x_offset=(int(rng.integers(-20000, 20000))
                      if rng.uniform() < 0.5 else None),
            y_offset=(int(rng.integers(-20000, 20000))
                      if rng.uniform() < 0.5 else None)))
    text = swf_binary.Text(
        id=int(rng.integers(1, 1000)),
        bounds=ast.Rect(-100, int(rng.integers(100, 9000)), -50,
                        int(rng.integers(100, 9000))),
        matrix=_rand_matrix(rng), runs=tuple(runs))
    blob = swf_binary.emit_define_text(text)
    head = int.from_bytes(blob[:2], "little")
    off = 2 + (4 if (head & 0x3F) == 0x3F else 0)
    assert swf_binary.parse_define_text_tag(blob[off:]) == text


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_edit_text_roundtrip(seed):
    rng = _rng(6000 + seed)
    field = swf_binary.EditText(
        id=int(rng.integers(1, 1000)),
        bounds=ast.Rect(0, int(rng.integers(200, 8000)), 0,
                        int(rng.integers(200, 8000))),
        font_id=int(rng.integers(1, 50)),
        height=int(rng.integers(100, 3000)),
        color=ast.StraightSRgba8(*rng.integers(0, 256, 4)),
        text="".join(chr(int(c)) for c in rng.integers(32, 127, 12))
             if rng.uniform() < 0.8 else "",
        word_wrap=bool(rng.integers(0, 2)),
        multiline=bool(rng.integers(0, 2)),
        use_outlines=bool(rng.integers(0, 2)),
        align=int(rng.integers(0, 4)),
        left_margin=int(rng.integers(0, 400)),
        right_margin=int(rng.integers(0, 400)),
        indent=int(rng.integers(0, 400)),
        leading=int(rng.integers(-200, 400)),
        var_name="v%d" % seed)
    blob = swf_binary.emit_define_edit_text(field)
    head = int.from_bytes(blob[:2], "little")
    off = 2 + (4 if (head & 0x3F) == 0x3F else 0)
    assert swf_binary.parse_define_edit_text_tag(blob[off:]) == field


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_placement_roundtrip(seed):
    """PO2/PO3 forms: every optional field combination survives the
    movie state machine byte-exactly."""
    rng = _rng(7000 + seed)
    P = swf_binary.Placement

    def rand_place(depth, char):
        kw = dict(depth=depth, character_id=char)
        if rng.uniform() < 0.7:
            kw["matrix"] = _rand_matrix(rng)
        if rng.uniform() < 0.4:
            kw["color_transform"] = (
                tuple(np.round(rng.uniform(-2, 2, 4) * 256) / 256),
                tuple(np.round(rng.uniform(-1, 1, 4) * 255) / 255))
        if rng.uniform() < 0.3:
            kw["ratio"] = float(rng.integers(0, 65536)) / 65536.0
        if rng.uniform() < 0.3:
            kw["name"] = "n%d" % int(rng.integers(0, 100))
        if rng.uniform() < 0.2:
            kw["clip_depth"] = depth + int(rng.integers(1, 5))
        if rng.uniform() < 0.3:
            kw["blend"] = str(rng.choice(
                ["multiply", "screen", "add", "overlay"]))
        if rng.uniform() < 0.2:
            kw["visible"] = bool(rng.integers(0, 2))
        return P(**kw)

    placements = [rand_place(d, 1) for d in range(1, 6)]
    records = (
        ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), left_fill=1),
        ast.EdgeRecord(delta=ast.Vector2D(100, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, 100)),
        ast.EdgeRecord(delta=ast.Vector2D(-100, -100)),
    )
    shape = ast.DefineShape(
        id=1, bounds=ast.Rect(0, 100, 0, 100),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=(ast.SolidFill(
                    color=ast.StraightSRgba8(1, 2, 3, 255)),), line=()),
            records=records))
    movie = swf_binary.emit_movie_timeline(
        [placements], shapes=[shape], stage_rect=ast.Rect(0, 100, 0, 100))
    (frame,) = swf_binary.parse_movie(movie).frames
    assert len(frame) == len(placements)
    for got, want in zip(frame, placements):
        assert got.depth == want.depth
        assert got.matrix == want.matrix
        assert got.name == want.name
        assert got.clip_depth == want.clip_depth
        assert got.blend == want.blend
        assert got.visible == want.visible
        if want.ratio is None:
            assert got.ratio is None
        else:
            assert abs(got.ratio - want.ratio) < 1e-9
        if want.color_transform is None:
            assert got.color_transform is None
        else:
            gm, ga = got.color_transform
            wm, wa = want.color_transform
            assert all(abs(a - b) <= 0.5 / 256 for a, b in zip(gm, wm))
            assert all(abs(a - b) <= 0.5 / 255 for a, b in zip(ga, wa))


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_sprite_timeline_oracle(seed):
    """Random sprite timelines replayed against an independent Python
    state oracle (place/move/remove with retention semantics)."""
    rng = _rng(8000 + seed)
    P, R = swf_binary.Placement, swf_binary.RemoveObject
    ops_frames = []
    oracle_state = {}
    oracle_frames = []
    for fi in range(int(rng.integers(2, 7))):
        ops = []
        for _ in range(int(rng.integers(0, 4))):
            d = int(rng.integers(1, 5))
            roll = rng.uniform()
            if roll < 0.25 and d in oracle_state:
                ops.append(R(depth=d))
                del oracle_state[d]
            elif roll < 0.55 and d in oracle_state:
                m = _rand_matrix(rng)
                ops.append(P(depth=d, move=True, matrix=m))
                prev = oracle_state[d]
                oracle_state[d] = (prev[0], m, prev[2])
            elif d not in oracle_state:
                m = _rand_matrix(rng)
                ops.append(P(depth=d, character_id=1, matrix=m))
                oracle_state[d] = (1, m, fi)
        ops_frames.append(ops)
        oracle_frames.append(dict(oracle_state))
    blob = swf_binary.emit_define_sprite(77, ops_frames)
    head = int.from_bytes(blob[:2], "little")
    off = 2 + (4 if (head & 0x3F) == 0x3F else 0)
    sprite = swf_binary.parse_define_sprite(blob[off:])
    assert sprite.id == 77 and len(sprite.frames) == len(ops_frames)
    for frame, want in zip(sprite.frames, oracle_frames):
        assert {p.depth for p in frame} == set(want)
        for p in frame:
            cid, m, placed = want[p.depth]
            assert (p.character_id, p.matrix, p.placed_frame) == (
                cid, m, placed)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_new_subsystem_tags_roundtrip(seed):
    """End-of-round-4 families: sounds, video streams, scaling grids,
    exports, metadata — emit -> parse is the identity on the
    structured form; screen-video packets decode at random sizes."""
    from swf_renderer_tpu.models import sound as sound_model
    from swf_renderer_tpu.models.screenvideo import (
        decode_screen_video_packet,
        encode_screen_video_packet,
    )

    rng = _rng(seed + 900)
    fmt = int(rng.choice([sound_model.FORMAT_UNCOMPRESSED_LE,
                          sound_model.FORMAT_ADPCM]))
    rate = int(rng.choice(sound_model.RATES))
    channels = int(rng.integers(1, 3))
    n = int(rng.integers(50, 900))
    pcm = rng.uniform(-0.8, 0.8, (n, channels)).astype(np.float32)
    data = (sound_model.encode_adpcm(pcm)
            if fmt == sound_model.FORMAT_ADPCM
            else sound_model.encode_uncompressed(pcm, 16))
    snd = sound_model.Sound(id=1, format=fmt, rate=rate, bits=16,
                            channels=channels, sample_count=n, data=data)

    vw = int(rng.integers(3, 70))
    vh = int(rng.integers(3, 70))
    img = rng.integers(0, 256, (vh, vw, 3), dtype=np.uint8)
    img2 = img.copy()
    img2[: vh // 2] = rng.integers(0, 256, (vh // 2, vw, 3),
                                   dtype=np.uint8)
    stream = swf_binary.VideoStream(id=2, width=vw, height=vh)
    stream.frames[0] = encode_screen_video_packet(img, block=16)
    stream.frames[1] = encode_screen_video_packet(img2, prev=img,
                                                  block=16)

    grid = ast.Rect(*(int(v) for v in (200, 700, 300, 800)))
    exports = {f"sym{i}": int(rng.integers(1, 100)) for i in range(3)}
    events = {0: [(1, sound_model.SoundInfo(
        loops=int(rng.integers(1, 4))))]}

    movie_bytes = swf_binary.emit_movie_timeline(
        frames=[[], []], sounds=(snd,), sound_events=events,
        videos=(stream,), scaling_grids=((3, grid),), exports=exports,
        metadata="<x/>", stage_rect=ast.Rect(0, 4000, 0, 4000))
    movie = swf_binary.parse_movie(movie_bytes)

    got = movie.sounds[1]
    assert (got.format, got.rate, got.bits, got.channels,
            got.sample_count) == (fmt, rate, 16, channels, n)
    assert got.data == data
    decoded = sound_model.decode_sound(fmt, got.data, 16, channels, n)
    assert decoded.shape == (n, channels)
    assert movie.sound_events[0][0][0] == 1
    assert movie.videos[2].frames.keys() == {0, 1}
    d0 = decode_screen_video_packet(movie.videos[2].frames[0])
    d1 = decode_screen_video_packet(movie.videos[2].frames[1], d0)
    assert np.array_equal(d0, img) and np.array_equal(d1, img2)
    g = movie.scaling_grids[3]
    assert (g.x_min, g.x_max, g.y_min, g.y_max) == (200, 700, 300, 800)
    assert movie.exported == exports
    assert movie.metadata == "<x/>"
