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


def test_movie_rejects_compressed():
    with pytest.raises(ValueError):
        swf_binary.parse_movie_shapes(b"CWS" + b"\x00" * 16)


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
