"""SWF binary builder round-trip tests.

The emitter and parser validate each other: emit every corpus
``ast.json`` DefineShape to DefineShape3 bytes, parse it back, decode
the parsed AST, and require the decoded golden JSON to be byte-equal
to the corpus ``shape.ts.json`` (same gate as test_decode_golden).
"""

import json
from pathlib import Path

import pytest

from swf_renderer_tpu.models import ast, swf_binary
from swf_renderer_tpu.models.ast_io import parse_define_shape
from swf_renderer_tpu.models.decode_shape import decode_shape
from swf_renderer_tpu.utils import jsjson


def _shape_dirs(reference_tests: Path):
    dirs = []
    for group in ("flat-shapes", "textured-shapes"):
        for d in sorted((reference_tests / group).iterdir()):
            if (d / "ast.json").exists() and (d / "shape.ts.json").exists():
                dirs.append(d)
    return dirs


def _load(case_dir: Path):
    data = json.loads((case_dir / "ast.json").read_text())
    return parse_define_shape(data)


def test_roundtrip_all_corpus_shapes(reference_tests):
    cases = _shape_dirs(reference_tests)
    assert cases, "no corpus shapes found"
    for case in cases:
        tag = _load(case)
        blob = swf_binary.emit_define_shape(tag)
        # Strip the RECORDHEADER before parsing the body back.
        head = int.from_bytes(blob[:2], "little")
        code, length = head >> 6, head & 0x3F
        assert code == swf_binary.TAG_DEFINE_SHAPE3
        body_off = 2 + (4 if length == 0x3F else 0)
        parsed = swf_binary.parse_define_shape_tag(blob[body_off:])

        assert parsed.id == tag.id
        assert parsed.bounds == tag.bounds

        want = (case / "shape.ts.json").read_text()
        got = jsjson.stringify(decode_shape(parsed).to_golden()) + "\n"
        assert got == want, f"round-trip golden mismatch for {case.name}"


def test_movie_assembly_and_extraction(reference_tests):
    cases = _shape_dirs(reference_tests)[:3]
    tags = [_load(c) for c in cases]
    movie = swf_binary.emit_movie(tags)
    assert movie[:3] == b"FWS"
    total = int.from_bytes(movie[4:8], "little")
    assert total == len(movie)
    shapes = swf_binary.parse_movie_shapes(movie)
    assert [s.id for s in shapes] == [t.id for t in tags]
    assert [s.bounds for s in shapes] == [t.bounds for t in tags]


def test_movie_compressed_cws_roundtrip(reference_tests):
    """CWS (zlib) movies inflate transparently — the form nearly every
    real-world .swf ships in."""
    import zlib

    cases = _shape_dirs(reference_tests)[:2]
    movie = swf_binary.emit_movie([_load(c) for c in cases])
    cws = b"CWS" + movie[3:8] + zlib.compress(movie[8:])
    assert swf_binary.parse_movie_shapes(cws) == \
        swf_binary.parse_movie_shapes(movie)
    assert swf_binary.parse_movie(cws) == swf_binary.parse_movie(movie)


def test_movie_compressed_zws_roundtrip(reference_tests):
    """ZWS (LZMA, SWF >= 13) movies inflate transparently; the emitter
    twin rebuilds the player's header (compressed length + 5 property
    bytes) so compress -> decompress is the identity on the FWS body."""
    cases = _shape_dirs(reference_tests)[:2]
    movie = swf_binary.emit_movie([_load(c) for c in cases])
    zws = swf_binary.compress_movie(movie, "ZWS")
    assert zws[:3] == b"ZWS" and zws[3] >= 13
    assert zws[4:8] == movie[4:8]  # uncompressed length preserved
    inflated = swf_binary.decompress_movie(zws)
    assert inflated[8:] == movie[8:]
    assert swf_binary.parse_movie(zws) == swf_binary.parse_movie(movie)
    # compress_movie's CWS twin matches the hand-rolled form above.
    cws = swf_binary.compress_movie(movie, "CWS")
    assert swf_binary.parse_movie(cws) == swf_binary.parse_movie(movie)


def test_movie_rejects_unknown_signature():
    with pytest.raises(ValueError):
        swf_binary.parse_movie_shapes(b"XWS" + b"\x00" * 16)
    with pytest.raises(ValueError):
        swf_binary.compress_movie(b"XWS" + b"\x00" * 16)


def test_bit_roundtrip_edge_widths():
    # A shape whose edges span tiny and huge deltas exercises nbits
    # selection (incl. the >=2-bit floor on edge records).
    styles = ast.ShapeStyles(
        fill=(ast.SolidFill(color=ast.StraightSRgba8(1, 2, 3, 4)),),
        line=(),
    )
    records = (
        ast.StyleChangeRecord(move_to=ast.Vector2D(-1, 1), right_fill=1),
        ast.EdgeRecord(delta=ast.Vector2D(1, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, -1)),
        ast.EdgeRecord(delta=ast.Vector2D(32767, -32768)),
        ast.EdgeRecord(delta=ast.Vector2D(-5, 7),
                       control_delta=ast.Vector2D(-2, 3)),
    )
    tag = ast.DefineShape(
        id=7,
        bounds=ast.Rect(x_min=-40000, x_max=40000, y_min=-1, y_max=1),
        shape=ast.ShapeBody(initial_styles=styles, records=records),
    )
    blob = swf_binary.emit_define_shape(tag)
    head = int.from_bytes(blob[:2], "little")
    body_off = 2 + (4 if (head & 0x3F) == 0x3F else 0)
    parsed = swf_binary.parse_define_shape_tag(blob[body_off:])
    assert parsed == tag


def test_define_shape4_linestyle2_roundtrip():
    """DefineShape4 LINESTYLE2 preserves caps/joins/miter, which the
    DefineShape3 encoding cannot express."""
    from swf_renderer_tpu.models import ast

    lines = (
        ast.LineStyle(width=60, start_cap="square", end_cap="none",
                      join={"type": "miter", "limit": 2.5},
                      no_h_scale=True, no_v_scale=False, no_close=True,
                      pixel_hinting=True,
                      fill=ast.SolidFill(
                          color=ast.StraightSRgba8(1, 2, 3, 200))),
        ast.LineStyle(width=20, start_cap="round", end_cap="round",
                      join={"type": "bevel"}, no_h_scale=False,
                      no_v_scale=True, no_close=False, pixel_hinting=False,
                      fill=ast.SolidFill(
                          color=ast.StraightSRgba8(9, 8, 7, 255))),
    )
    records = (
        ast.StyleChangeRecord(move_to=ast.Vector2D(10, 10), left_fill=1,
                              line_style=1),
        ast.EdgeRecord(delta=ast.Vector2D(500, 0)),
        ast.StyleChangeRecord(line_style=2),
        ast.EdgeRecord(delta=ast.Vector2D(0, 500)),
    )
    tag = ast.DefineShape(
        id=5, bounds=ast.Rect(0, 600, 0, 600),
        has_fill_winding=True,
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=(ast.SolidFill(
                    color=ast.StraightSRgba8(255, 255, 255, 255)),),
                line=lines),
            records=records))
    blob = swf_binary.emit_define_shape4(tag)
    head = int.from_bytes(blob[:2], "little")
    assert head >> 6 == swf_binary.TAG_DEFINE_SHAPE4
    body_off = 2 + (4 if (head & 0x3F) == 0x3F else 0)
    parsed = swf_binary.parse_define_shape4_tag(blob[body_off:])
    assert parsed.has_fill_winding is True
    assert parsed.bounds == tag.bounds
    got = parsed.shape.initial_styles.line
    assert got[0].start_cap == "square" and got[0].end_cap == "none"
    assert got[0].join == {"type": "miter", "limit": 2.5}
    assert got[0].no_h_scale and got[0].no_close and got[0].pixel_hinting
    assert got[1].join == {"type": "bevel"} and got[1].no_v_scale
    assert got[0].fill.color == ast.StraightSRgba8(1, 2, 3, 200)
    assert parsed.shape.records == tag.shape.records


def test_movie_with_shape4_tags(reference_tests):
    """Movies can carry DefineShape4 tags; extraction round-trips."""
    cases = _shape_dirs(reference_tests)
    tags = [_load(c) for c in cases[:2]]
    movie = swf_binary.emit_movie(tags, shape4=True)
    back = swf_binary.parse_movie_shapes(movie)
    assert len(back) == len(tags)
    for a, b in zip(tags, back):
        assert swf_binary.emit_define_shape4(a) == \
            swf_binary.emit_define_shape4(b)


# ---------------------------------------------------------------------------
# Morph shapes (DefineMorphShape / DefineMorphShape2)
# ---------------------------------------------------------------------------


def _strip_head(blob: bytes, expect_code: int) -> bytes:
    head = int.from_bytes(blob[:2], "little")
    assert head >> 6 == expect_code
    return blob[2 + (4 if (head & 0x3F) == 0x3F else 0):]


def test_morph_roundtrip_golden_corpus(reference_tests):
    """hb29 emits to DefineMorphShape bytes, parses back to an EQUAL
    AST, and the re-decoded golden JSON stays byte-identical to
    shape.ts.json (the same gate as test_decode_morph_shape_golden)."""
    from swf_renderer_tpu.models.ast_io import parse_define_morph_shape
    from swf_renderer_tpu.models.decode_morph_shape import decode_morph_shape

    case = reference_tests / "flat-morph-shapes" / "homestuck-beta-29"
    tag = parse_define_morph_shape((case / "ast.json").read_text())
    for shape2 in (False, True):
        blob = swf_binary.emit_define_morph_shape(tag, shape2=shape2)
        body = _strip_head(
            blob, swf_binary.TAG_DEFINE_MORPH_SHAPE2 if shape2
            else swf_binary.TAG_DEFINE_MORPH_SHAPE)
        parsed = (swf_binary.parse_define_morph_shape2_tag(body) if shape2
                  else swf_binary.parse_define_morph_shape_tag(body))
        assert parsed == tag, f"morph AST round-trip (shape2={shape2})"
        want = (case / "shape.ts.json").read_text()
        got = jsjson.stringify(decode_morph_shape(parsed).to_golden()) + "\n"
        assert got == want


def test_morph_shape2_preserves_flags_and_joins():
    """Tag 84 keeps MORPHLINESTYLE2 caps/joins/miter and the
    stroke-scaling flags; tag 46 drops them to the round defaults
    (like DefineShape3's LINESTYLE)."""
    styles = ast.MorphShapeStyles(
        fill=(ast.MorphSolidFill(
            color=ast.StraightSRgba8(10, 20, 30, 255),
            morph_color=ast.StraightSRgba8(40, 50, 60, 128)),),
        line=(ast.MorphLineStyle(
            width=40, morph_width=120, start_cap="square", end_cap="none",
            join={"type": "miter", "limit": 2.5}, no_h_scale=True,
            no_v_scale=False, no_close=True, pixel_hinting=True,
            fill=ast.MorphSolidFill(
                color=ast.StraightSRgba8(1, 2, 3, 200),
                morph_color=ast.StraightSRgba8(4, 5, 6, 100))),),
    )
    records = (
        ast.MorphStyleChangeRecord(
            move_to=ast.Vector2D(0, 0), morph_move_to=ast.Vector2D(5, -5),
            left_fill=1, line_style=1),
        ast.MorphEdgeRecord(delta=ast.Vector2D(200, 0),
                            morph_delta=ast.Vector2D(100, 40)),
        ast.MorphEdgeRecord(
            delta=ast.Vector2D(0, 200), morph_delta=ast.Vector2D(-60, 160),
            control_delta=ast.Vector2D(30, 90),
            morph_control_delta=None),  # curved start, straight end
        ast.MorphEdgeRecord(
            delta=ast.Vector2D(-200, -200),
            morph_delta=ast.Vector2D(-40, -200),
            control_delta=None,
            morph_control_delta=ast.Vector2D(-150, -20)),
    )
    tag = ast.DefineMorphShape(
        id=9, bounds=ast.Rect(0, 220, 0, 220),
        morph_bounds=ast.Rect(-10, 210, -10, 210),
        has_non_scaling_strokes=True, has_scaling_strokes=False,
        shape=ast.MorphShapeBody(initial_styles=styles, records=records))

    blob2 = swf_binary.emit_define_morph_shape(tag, shape2=True)
    parsed2 = swf_binary.parse_define_morph_shape2_tag(
        _strip_head(blob2, swf_binary.TAG_DEFINE_MORPH_SHAPE2))
    assert parsed2 == tag

    blob1 = swf_binary.emit_define_morph_shape(tag, shape2=False)
    parsed1 = swf_binary.parse_define_morph_shape_tag(
        _strip_head(blob1, swf_binary.TAG_DEFINE_MORPH_SHAPE))
    line = parsed1.shape.initial_styles.line[0]
    assert (line.start_cap, line.end_cap) == ("round", "round")
    assert line.join == {"type": "round"}
    assert line.width == 40 and line.morph_width == 120
    assert parsed1.has_non_scaling_strokes is False  # tag 46 can't carry it
    assert parsed1.shape.records == tag.shape.records


def _random_morph(rng) -> ast.DefineMorphShape:
    n_fills = int(rng.integers(1, 4))
    n_lines = int(rng.integers(0, 3))

    def color():
        return ast.StraightSRgba8(*(int(v) for v in rng.integers(0, 256, 4)))

    styles = ast.MorphShapeStyles(
        fill=tuple(ast.MorphSolidFill(color=color(), morph_color=color())
                   for _ in range(n_fills)),
        line=tuple(_random_morph_line(rng, color) for _ in range(n_lines)),
    )
    records = []
    for _ in range(int(rng.integers(1, 4))):  # subpaths
        records.append(ast.MorphStyleChangeRecord(
            move_to=ast.Vector2D(*(int(v)
                                   for v in rng.integers(-3000, 3000, 2))),
            morph_move_to=ast.Vector2D(
                *(int(v) for v in rng.integers(-3000, 3000, 2))),
            left_fill=int(rng.integers(0, n_fills + 1)),
            right_fill=int(rng.integers(0, n_fills + 1)),
            line_style=(int(rng.integers(1, n_lines + 1))
                        if n_lines and rng.random() < 0.5 else None)))
        for _ in range(int(rng.integers(1, 6))):  # edges
            def ctrl():
                if rng.random() < 0.5:
                    return None
                return ast.Vector2D(*(int(v)
                                      for v in rng.integers(-900, 900, 2)))
            records.append(ast.MorphEdgeRecord(
                delta=ast.Vector2D(*(int(v)
                                     for v in rng.integers(-900, 900, 2))),
                morph_delta=ast.Vector2D(
                    *(int(v) for v in rng.integers(-900, 900, 2))),
                control_delta=ctrl(), morph_control_delta=ctrl()))
    return ast.DefineMorphShape(
        id=int(rng.integers(1, 1000)),
        bounds=ast.Rect(-4000, 4000, -4000, 4000),
        morph_bounds=ast.Rect(-4000, 4000, -4000, 4000),
        shape=ast.MorphShapeBody(initial_styles=styles,
                                 records=tuple(records)))


def _random_morph_line(rng, color):
    caps = ("round", "none", "square")
    joins = ({"type": "round"}, {"type": "bevel"},
             {"type": "miter", "limit": float(int(rng.integers(1, 16)))
              / 4.0 + 1.0})
    return ast.MorphLineStyle(
        width=int(rng.integers(0, 400)),
        morph_width=int(rng.integers(0, 400)),
        start_cap=caps[int(rng.integers(0, 3))],
        end_cap=caps[int(rng.integers(0, 3))],
        join=joins[int(rng.integers(0, 3))],
        no_h_scale=bool(rng.integers(0, 2)),
        no_v_scale=bool(rng.integers(0, 2)),
        no_close=bool(rng.integers(0, 2)),
        pixel_hinting=bool(rng.integers(0, 2)),
        fill=ast.MorphSolidFill(color=color(), morph_color=color()))


def test_morph_fuzz_roundtrip():
    """Random morph shapes survive emit -> parse bit-exactly (tag 84;
    tag 46 modulo the caps/joins it cannot carry) and the parsed AST
    decodes without error."""
    import numpy as np

    from swf_renderer_tpu.models.decode_morph_shape import decode_morph_shape

    rng = np.random.default_rng(4629)
    for _ in range(40):
        tag = _random_morph(rng)
        blob = swf_binary.emit_define_morph_shape(tag, shape2=True)
        parsed = swf_binary.parse_define_morph_shape2_tag(
            _strip_head(blob, swf_binary.TAG_DEFINE_MORPH_SHAPE2))
        assert parsed == tag
        decode_morph_shape(parsed)

        blob1 = swf_binary.emit_define_morph_shape(tag, shape2=False)
        parsed1 = swf_binary.parse_define_morph_shape_tag(
            _strip_head(blob1, swf_binary.TAG_DEFINE_MORPH_SHAPE))
        assert parsed1.shape.records == tag.shape.records
        assert [
            (l.width, l.morph_width, l.fill)
            for l in parsed1.shape.initial_styles.line
        ] == [(l.width, l.morph_width, l.fill)
              for l in tag.shape.initial_styles.line]


def test_movie_with_morph_ratios(reference_tests):
    """Movies place morphs with PlaceObject2 ratios (the capture-server
    convention for the {0,32768,65536}.png goldens)."""
    from swf_renderer_tpu.models.ast_io import parse_define_morph_shape

    case = reference_tests / "flat-morph-shapes" / "homestuck-beta-29"
    tag = parse_define_morph_shape((case / "ast.json").read_text())
    movie = swf_binary.emit_movie([], morphs=[(tag, 0.5)], morph2=True)
    back = swf_binary.parse_movie_morph_shapes(movie)
    assert len(back) == 1
    parsed, ratio = back[0]
    assert parsed == tag
    assert abs(ratio - 0.5) < 1e-4
    # ratio 1.0 clamps to the u16 max (the 65536-filename convention).
    movie1 = swf_binary.emit_movie([], morphs=[(tag, 1.0)])
    (_, r1), = swf_binary.parse_movie_morph_shapes(movie1)
    assert abs(r1 - 1.0) < 2e-5


# ---------------------------------------------------------------------------
# Bitmaps (DefineBitsLossless)
# ---------------------------------------------------------------------------


def test_bitmap_tag_roundtrip_golden(reference_tests):
    """The hb3 bitmap emits to DefineBitsLossless (its x-swf-bmp payload
    IS the tag body minus the id), parses back to an equal AST, and the
    re-decoded pixels stay byte-equal to the PAM golden."""
    from swf_renderer_tpu.models.ast_io import parse_define_bitmap
    from swf_renderer_tpu.runtime.bitmap_service import decode_x_swf_bmp
    from swf_renderer_tpu.utils.pam import rgba_to_pam

    sample_dir = reference_tests / "bitmap"
    tag = parse_define_bitmap(
        (sample_dir / "homestuck-beta-3.ast.json").read_text())
    blob = swf_binary.emit_define_bits_lossless(tag)
    parsed = swf_binary.parse_define_bits_lossless_tag(
        _strip_head(blob, swf_binary.TAG_DEFINE_BITS_LOSSLESS))
    assert parsed == tag
    want = (sample_dir / "homestuck-beta-3.pam").read_bytes()
    assert rgba_to_pam(decode_x_swf_bmp(parsed.data)) == want


def test_bitmap_tag_rejects_foreign_payloads():
    bad = ast.DefineBitmap(id=1, width=2, height=2, media_type="image/png",
                           data=b"\x89PNG")
    with pytest.raises(ValueError):
        swf_binary.emit_define_bits_lossless(bad)
    mismatched = ast.DefineBitmap(
        id=1, width=9, height=9, media_type="image/x-swf-bmp",
        data=b"\x03" + (2).to_bytes(2, "little")
        + (2).to_bytes(2, "little") + b"\x00")
    with pytest.raises(ValueError):
        swf_binary.emit_define_bits_lossless(mismatched)


def test_textured_movie_assembly(reference_tests):
    """The full textured sample assembles into ONE movie: bitmap +
    shape, both extractable — the builder can now reproduce every
    corpus sample's movie (reference build.js parity)."""
    from swf_renderer_tpu.models.ast_io import parse_define_bitmap

    bitmap = parse_define_bitmap(
        (reference_tests / "bitmap" / "homestuck-beta-3.ast.json")
        .read_text())
    shape = _load(reference_tests / "textured-shapes" / "homestuck-beta-4")
    movie = swf_binary.emit_movie([shape], bitmaps=[bitmap])
    assert swf_binary.parse_movie_bitmaps(movie) == [bitmap]
    (back,) = swf_binary.parse_movie_shapes(movie)
    assert swf_binary.emit_define_shape(back) == \
        swf_binary.emit_define_shape(shape)


def test_timeline_fuzz_against_state_oracle(reference_tests):
    """Random timeline op sequences emit -> parse to the same snapshots
    an independent dict state machine predicts (place / move-modify /
    move-replace / remove, attribute retention)."""
    import numpy as np

    tags = [_load(d) for d in _shape_dirs(reference_tests)[:2]]
    import dataclasses as dc
    tags[1] = dc.replace(tags[1], id=tags[0].id + 1)
    ids = [t.id for t in tags]
    rng = np.random.default_rng(284)
    for _ in range(20):
        frames = []
        state = {}  # depth -> dict of attrs (the oracle)
        oracle_frames = []
        for _f in range(int(rng.integers(1, 6))):
            ops = []
            for _o in range(int(rng.integers(0, 4))):
                depth = int(rng.integers(1, 4))
                kind = rng.random()
                matrix = (None if rng.random() < 0.5 else _tl(
                    int(rng.integers(-2000, 2000)),
                    int(rng.integers(-2000, 2000))))
                ratio = (None if rng.random() < 0.7
                         else int(rng.integers(0, 65536)) / 65536.0)
                if kind < 0.35 and depth not in state:
                    cid = ids[int(rng.integers(0, len(ids)))]
                    ops.append(swf_binary.Placement(
                        depth=depth, character_id=cid, matrix=matrix,
                        ratio=ratio))
                    state[depth] = dict(cid=cid, matrix=matrix,
                                        ratio=ratio)
                elif kind < 0.7 and depth in state:
                    cid = (None if rng.random() < 0.6
                           else ids[int(rng.integers(0, len(ids)))])
                    ops.append(swf_binary.Placement(
                        depth=depth, character_id=cid, matrix=matrix,
                        ratio=ratio, move=True))
                    prev = state[depth]
                    state[depth] = dict(
                        cid=cid if cid is not None else prev["cid"],
                        matrix=matrix if matrix is not None
                        else prev["matrix"],
                        ratio=ratio if ratio is not None
                        else prev["ratio"])
                elif kind >= 0.7 and depth in state:
                    ops.append(swf_binary.RemoveObject(depth=depth))
                    del state[depth]
            frames.append(ops)
            oracle_frames.append({d: dict(v) for d, v in state.items()})
        movie = swf_binary.emit_movie_timeline(
            frames, shapes=tags, stage_rect=ast.Rect(0, 4000, 0, 4000))
        parsed = swf_binary.parse_movie(movie)
        assert len(parsed.frames) == len(oracle_frames)
        for got, want in zip(parsed.frames, oracle_frames):
            assert [p.depth for p in got] == sorted(want)
            for p in got:
                w = want[p.depth]
                assert p.character_id == w["cid"]
                assert p.matrix == w["matrix"]
                if w["ratio"] is None:
                    assert p.ratio is None
                else:
                    assert abs(p.ratio - w["ratio"]) < 1e-9


def _tl(tx: int, ty: int) -> ast.Matrix:
    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    return ast.Matrix(
        scale_x=Sfixed16P16.from_value(1),
        scale_y=Sfixed16P16.from_value(1),
        rotate_skew0=Sfixed16P16.from_value(0),
        rotate_skew1=Sfixed16P16.from_value(0),
        translate_x=tx, translate_y=ty)


def test_legacy_defineshape_rgb_parse():
    """DefineShape (tag 2) / DefineShape2 (tag 22) — the pre-alpha RGB
    encodings old movies ship — parse to opaque-color ASTs (the emitter
    stays DefineShape3+; this is read-side compat)."""
    import struct

    from swf_renderer_tpu.models.decode_shape import decode_shape
    from swf_renderer_tpu.utils.bits import BitWriter, ubits_for

    records = (
        ast.StyleChangeRecord(move_to=ast.Vector2D(20, 20), left_fill=1,
                              line_style=1),
        ast.EdgeRecord(delta=ast.Vector2D(400, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, 400)),
        ast.EdgeRecord(delta=ast.Vector2D(-400, -400),
                       control_delta=ast.Vector2D(-300, -50)),
    )
    body = bytearray(struct.pack("<H", 7))
    w = BitWriter()
    swf_binary._write_rect(w, ast.Rect(0, 440, 0, 440))
    body.extend(w.bytes())
    # RGB style arrays: one solid fill, one line style.
    body.append(1)
    body.append(0x00)                   # solid fill type
    body.extend((10, 200, 30))          # fill RGB
    body.append(1)
    body.extend(struct.pack("<H", 40))  # line width
    body.extend((1, 2, 3))              # line RGB
    body.extend(swf_binary._emit_record_stream(
        records, ubits_for(1), ubits_for(1)))

    parsed = swf_binary.parse_define_shape12_tag(bytes(body))
    assert parsed.id == 7
    fill = parsed.shape.initial_styles.fill[0]
    assert fill.color == ast.StraightSRgba8(10, 200, 30, 255)
    line = parsed.shape.initial_styles.line[0]
    assert line.width == 40
    assert line.fill.color == ast.StraightSRgba8(1, 2, 3, 255)
    assert parsed.shape.records == records
    decode_shape(parsed)  # decodes like any DefineShape

    # And inside a movie, under both legacy tag codes.
    for code in (swf_binary.TAG_DEFINE_SHAPE, swf_binary.TAG_DEFINE_SHAPE2):
        base = swf_binary.emit_movie([], stage_rect=ast.Rect(0, 440, 0, 440))
        tag_bytes = swf_binary._tag(code, bytes(body))
        end = base.rindex(b"\x40\x00")  # before ShowFrame
        movie = base[:end] + tag_bytes + base[end:]
        movie = movie[:4] + len(movie).to_bytes(4, "little") + movie[8:]
        (back,) = swf_binary.parse_movie_shapes(movie)
        assert back == parsed
        assert swf_binary.parse_movie(movie).shapes[7] == parsed


def test_build_movie_renumber_keeps_ids_unique(reference_tests, tmp_path):
    """Review-found regression: with no bitmaps/morphs present,
    colliding corpus shapes (all id 1) must renumber onto UNUSED ids,
    not re-collide (duplicate characters: last define wins and a shape
    silently vanishes)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from tools import build_movie

    out = tmp_path / "two.swf"
    build_movie.main([
        str(out),
        "--corpus", "flat-shapes/triangle",
        "--corpus", "flat-shapes/squares",
        "--reference-tests", str(reference_tests),
    ])
    shapes = swf_binary.parse_movie_shapes(out.read_bytes())
    ids = [s.id for s in shapes]
    assert len(set(ids)) == len(ids) == 2, ids
    movie = swf_binary.parse_movie(out.read_bytes())
    placed = [p.character_id for p in movie.placements]
    assert sorted(placed) == sorted(ids)


def test_morph_ratio_from_move_only_track():
    """parse_movie_morph_shapes attributes PlaceFlagMove ratio updates
    (no character id on the wire) via the resolved timeline — the raw
    tag walk lost them under a None key."""
    fills = (ast.MorphSolidFill(
        color=ast.StraightSRgba8(1, 2, 3, 255),
        morph_color=ast.StraightSRgba8(4, 5, 6, 255)),)
    records = (
        ast.MorphStyleChangeRecord(move_to=ast.Vector2D(0, 0),
                                   morph_move_to=ast.Vector2D(0, 0),
                                   left_fill=1),
        ast.MorphEdgeRecord(delta=ast.Vector2D(100, 0),
                            morph_delta=ast.Vector2D(80, 20)),
        ast.MorphEdgeRecord(delta=ast.Vector2D(-100, 100),
                            morph_delta=ast.Vector2D(-80, 80)),
        ast.MorphEdgeRecord(delta=ast.Vector2D(0, -100),
                            morph_delta=ast.Vector2D(0, -100)),
    )
    tag = ast.DefineMorphShape(
        id=9, bounds=ast.Rect(0, 120, 0, 120),
        morph_bounds=ast.Rect(0, 120, 0, 120),
        shape=ast.MorphShapeBody(
            initial_styles=ast.MorphShapeStyles(fill=fills, line=()),
            records=records))
    # First placement carries NO ratio; a later move sets 0.75.
    movie = swf_binary.emit_movie_timeline(
        [[swf_binary.Placement(depth=1, character_id=9)],
         [swf_binary.Placement(depth=1, move=True, ratio=0.75)]],
        morphs=[tag], stage_rect=ast.Rect(0, 120, 0, 120))
    (got, ratio), = swf_binary.parse_movie_morph_shapes(movie)
    assert got == tag
    assert abs(ratio - 0.75) < 1e-4


# ---------------------------------------------------------------------------
# Legacy display-list tags (PlaceObject 4 / RemoveObject 5) + names
# ---------------------------------------------------------------------------


def _one_frame_movie(ops_frames, shapes):
    return swf_binary.emit_movie_timeline(
        ops_frames, shapes=shapes, stage_rect=ast.Rect(0, 440, 0, 440))


def _unit_shape(shape_id: int) -> ast.DefineShape:
    records = (
        ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), left_fill=1),
        ast.EdgeRecord(delta=ast.Vector2D(400, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, 400)),
        ast.EdgeRecord(delta=ast.Vector2D(-400, -400)),
    )
    fill = ast.SolidFill(color=ast.StraightSRgba8(10, 20, 200, 255))
    return ast.DefineShape(
        id=shape_id, bounds=ast.Rect(0, 440, 0, 440),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(fill=(fill,), line=()),
            records=records))


def test_legacy_place_object_roundtrip():
    """PlaceObject (tag 4): mandatory matrix + optional RGB CXFORM
    round-trip through the movie; the alpha CT terms come back as
    identity."""
    shape = _unit_shape(3)
    ct = ((0.5, 1.0, 0.25, 1.0), (0.1, 0.0, 0.0, 0.0))
    p = swf_binary.Placement(depth=2, character_id=3, matrix=_tl(40, 60),
                             color_transform=ct, legacy=True)
    movie = swf_binary.parse_movie(_one_frame_movie([[p]], [shape]))
    (got,) = movie.frames[0]
    assert got.legacy and got.character_id == 3 and got.depth == 2
    assert got.matrix == _tl(40, 60)
    gm, ga = got.color_transform
    assert gm[3] == 1.0 and ga[3] == 0.0
    assert all(abs(a - b) < 1e-6 for a, b in zip(gm[:3], ct[0][:3]))
    # Add terms quantize to u8 on the wire (0.5/255 half-quantum).
    assert all(abs(a - b) <= 0.5 / 255 for a, b in zip(ga[:3], ct[1][:3]))


def test_legacy_place_object_defaults_identity_matrix():
    p = swf_binary.Placement(depth=1, character_id=3, legacy=True)
    movie = swf_binary.parse_movie(_one_frame_movie([[p]], [_unit_shape(3)]))
    (got,) = movie.frames[0]
    assert got.matrix == swf_binary._identity_matrix()
    assert got.color_transform is None


def test_legacy_place_object_replaces_depth():
    shapes = [_unit_shape(3), _unit_shape(4)]
    frames = [
        [swf_binary.Placement(depth=1, character_id=3, legacy=True)],
        [swf_binary.Placement(depth=1, character_id=4, legacy=True)],
    ]
    movie = swf_binary.parse_movie(_one_frame_movie(frames, shapes))
    assert movie.frames[0][0].character_id == 3
    assert movie.frames[1][0].character_id == 4


def test_legacy_remove_object():
    """RemoveObject (tag 5) clears the depth when the character matches
    and rejects a mismatched id."""
    shape = _unit_shape(3)
    frames = [
        [swf_binary.Placement(depth=1, character_id=3, legacy=True)],
        [swf_binary.RemoveObject(depth=1, character_id=3)],
    ]
    movie = swf_binary.parse_movie(_one_frame_movie(frames, [shape]))
    assert movie.frames[0] and not movie.frames[1]

    bad = [
        [swf_binary.Placement(depth=1, character_id=3, legacy=True)],
        [swf_binary.RemoveObject(depth=1, character_id=9)],
    ]
    with pytest.raises(ValueError):
        swf_binary.parse_movie(_one_frame_movie(bad, [shape]))


def test_place_object2_name_roundtrip_and_move_retention():
    shape = _unit_shape(3)
    frames = [
        [swf_binary.Placement(depth=1, character_id=3, name="hero")],
        [swf_binary.Placement(depth=1, move=True, matrix=_tl(100, 0))],
        [swf_binary.Placement(depth=1, move=True, name="villain")],
    ]
    movie = swf_binary.parse_movie(_one_frame_movie(frames, [shape]))
    assert movie.frames[0][0].name == "hero"
    assert movie.frames[1][0].name == "hero"  # retained across move
    assert movie.frames[1][0].matrix == _tl(100, 0)
    assert movie.frames[2][0].name == "villain"


def test_legacy_and_modern_placement_render_identically():
    from swf_renderer_tpu.runtime.movie import render_movie
    import numpy as np

    shape = _unit_shape(3)
    legacy = _one_frame_movie(
        [[swf_binary.Placement(depth=1, character_id=3,
                               matrix=_tl(20, 20), legacy=True)]], [shape])
    modern = _one_frame_movie(
        [[swf_binary.Placement(depth=1, character_id=3,
                               matrix=_tl(20, 20))]], [shape])
    np.testing.assert_array_equal(render_movie(legacy),
                                  render_movie(modern))


def test_unknown_control_tags_are_skipped():
    """Real-world movies carry AS bytecode and metadata tags the
    renderer has no use for — DoAction (12), ExportAssets (56),
    FileAttributes (69), Metadata (77), Protect (24), ScriptLimits
    (65), DefineSceneAndFrameLabelData (86) — all skip cleanly."""
    base = _one_frame_movie(
        [[swf_binary.Placement(depth=1, character_id=3)]],
        [_unit_shape(3)])
    noise = b"".join(
        swf_binary._tag(code, b"\x00" * 6)
        for code in (12, 56, 69, 77, 24, 65, 86))
    end = base.rindex(b"\x40\x00")  # before ShowFrame
    movie = base[:end] + noise + base[end:]
    movie = movie[:4] + len(movie).to_bytes(4, "little") + movie[8:]
    parsed = swf_binary.parse_movie(movie)
    assert len(parsed.frames) == 1 and len(parsed.frames[0]) == 1
    ref = swf_binary.parse_movie(base)
    assert parsed.frames == ref.frames and parsed.shapes == ref.shapes
