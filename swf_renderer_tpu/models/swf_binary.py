"""SWF binary emitter + parser for shape movies.

The analog of the reference's movie builder (reference tests/build.js:12-21,
which shells out to the external ``swf-emitter`` npm package): emits an
uncompressed ``.swf`` (FWS) containing DefineShape3 tags, places them, and
shows a frame — a movie the real Flash player can run for ground-truth
capture (tools/capture_server.py).  The matching parser reads shape tags
back into the AST; emitter and parser validate each other by round-tripping
the golden corpus (tests/test_swf_binary.py).

Format essentials (SWF file format spec v19):
* header ``FWS`` + version + file length + frame RECT + rate + count,
* tags as RECORDHEADER (code << 6 | length, 0x3F escape to u32),
* DefineShape3 (tag 32): character id, RECT bounds, SHAPEWITHSTYLE —
  fill/line style arrays then bit-packed style-change/edge records.

Scope: solid, gradient (linear/radial) and bitmap fills; solid line styles
(DefineShape3 LINESTYLE), and DefineShape4 (tag 83) with LINESTYLE2 —
caps, joins and miter limits round-trip, which DefineShape3 cannot
express.  Enough to emit every static shape in the corpus.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

from ..utils.bits import BitReader, BitWriter, sbits_for, ubits_for
from ..utils.fixed import Sfixed16P16
from . import ast

TAG_END = 0
TAG_SHOW_FRAME = 1
TAG_DEFINE_SHAPE3 = 32
TAG_DEFINE_SHAPE4 = 83
TAG_SET_BACKGROUND = 9
TAG_PLACE_OBJECT2 = 26

_SPREAD_TO_BITS = {
    ast.GradientSpread.PAD: 0,
    ast.GradientSpread.REFLECT: 1,
    ast.GradientSpread.REPEAT: 2,
}
_BITS_TO_SPREAD = {v: k for k, v in _SPREAD_TO_BITS.items()}


# ---------------------------------------------------------------------------
# Primitive writers
# ---------------------------------------------------------------------------


def _write_rect(w: BitWriter, rect: ast.Rect) -> None:
    nbits = sbits_for(rect.x_min, rect.x_max, rect.y_min, rect.y_max)
    w.write_ub(nbits, 5)
    for v in (rect.x_min, rect.x_max, rect.y_min, rect.y_max):
        w.write_sb(v, nbits)
    w.align()


def _read_rect(r: BitReader) -> ast.Rect:
    nbits = r.read_ub(5)
    vals = [r.read_sb(nbits) for _ in range(4)]
    r.align()
    return ast.Rect(x_min=vals[0], x_max=vals[1], y_min=vals[2], y_max=vals[3])


def _write_matrix(w: BitWriter, m: ast.Matrix) -> None:
    w.align()
    has_scale = not (m.scale_x.epsilons == 65536 and m.scale_y.epsilons == 65536)
    w.write_ub(1 if has_scale else 0, 1)
    if has_scale:
        nbits = sbits_for(m.scale_x.epsilons, m.scale_y.epsilons)
        w.write_ub(nbits, 5)
        w.write_sb(m.scale_x.epsilons, nbits)
        w.write_sb(m.scale_y.epsilons, nbits)
    has_rot = not (m.rotate_skew0.epsilons == 0 and m.rotate_skew1.epsilons == 0)
    w.write_ub(1 if has_rot else 0, 1)
    if has_rot:
        nbits = sbits_for(m.rotate_skew0.epsilons, m.rotate_skew1.epsilons)
        w.write_ub(nbits, 5)
        w.write_sb(m.rotate_skew0.epsilons, nbits)
        w.write_sb(m.rotate_skew1.epsilons, nbits)
    nbits = sbits_for(m.translate_x, m.translate_y)
    w.write_ub(nbits, 5)
    w.write_sb(m.translate_x, nbits)
    w.write_sb(m.translate_y, nbits)
    w.align()


def _read_matrix(r: BitReader) -> ast.Matrix:
    r.align()
    one = Sfixed16P16.from_value(1.0)
    zero = Sfixed16P16.from_value(0.0)
    sx, sy = one, one
    if r.read_ub(1):
        nbits = r.read_ub(5)
        sx = Sfixed16P16.from_epsilons(r.read_sb(nbits))
        sy = Sfixed16P16.from_epsilons(r.read_sb(nbits))
    r0, r1 = zero, zero
    if r.read_ub(1):
        nbits = r.read_ub(5)
        r0 = Sfixed16P16.from_epsilons(r.read_sb(nbits))
        r1 = Sfixed16P16.from_epsilons(r.read_sb(nbits))
    nbits = r.read_ub(5)
    tx = r.read_sb(nbits)
    ty = r.read_sb(nbits)
    r.align()
    return ast.Matrix(scale_x=sx, scale_y=sy, rotate_skew0=r0,
                      rotate_skew1=r1, translate_x=tx, translate_y=ty)


def _write_rgba(out: bytearray, c: ast.StraightSRgba8) -> None:
    out.extend((c.r, c.g, c.b, c.a))


def _read_rgba(data: bytes, pos: int) -> Tuple[ast.StraightSRgba8, int]:
    r, g, b, a = data[pos : pos + 4]
    return ast.StraightSRgba8(r, g, b, a), pos + 4


# ---------------------------------------------------------------------------
# Styles
# ---------------------------------------------------------------------------


def _emit_fill_style(fill: ast.FillStyle) -> bytes:
    out = bytearray()
    if isinstance(fill, ast.SolidFill):
        out.append(0x00)
        _write_rgba(out, fill.color)
    elif isinstance(fill, (ast.LinearGradientFill, ast.RadialGradientFill,
                           ast.FocalGradientFill)):
        if isinstance(fill, ast.LinearGradientFill):
            out.append(0x10)
        elif isinstance(fill, ast.RadialGradientFill):
            out.append(0x12)
        else:
            out.append(0x13)
        w = BitWriter()
        _write_matrix(w, fill.matrix)
        out.extend(w.bytes())
        g = fill.gradient
        if len(g.colors) > 15:
            # The count shares a byte with spread/colorSpace (4 bits);
            # 16+ stops would silently corrupt those fields.
            raise ValueError(
                f"SWF gradients cap at 15 stops (got {len(g.colors)})")
        out.append(
            (_SPREAD_TO_BITS[g.spread] << 6)
            | ((0 if g.color_space == ast.ColorSpace.S_RGB else 1) << 4)
            | len(g.colors)
        )
        for stop in g.colors:
            out.append(stop.ratio)
            _write_rgba(out, stop.color)
        if isinstance(fill, ast.FocalGradientFill):
            out.extend(struct.pack("<h", fill.focal_point_epsilons))
    elif isinstance(fill, ast.BitmapFill):
        # 0x40 repeating smoothed / 41 clipped / 42 non-smoothed repeat /
        # 43 non-smoothed clipped
        code = 0x40 + (0 if fill.repeating else 1) + (0 if fill.smoothed else 2)
        out.append(code)
        out.extend(struct.pack("<H", fill.bitmap_id))
        w = BitWriter()
        _write_matrix(w, fill.matrix)
        out.extend(w.bytes())
    else:
        raise ValueError(f"cannot emit fill style {fill!r}")
    return bytes(out)


def _parse_fill_style(data: bytes, pos: int) -> Tuple[ast.FillStyle, int]:
    kind = data[pos]
    pos += 1
    if kind == 0x00:
        color, pos = _read_rgba(data, pos)
        return ast.SolidFill(color=color), pos
    if kind in (0x10, 0x12, 0x13):
        r = BitReader(data, pos)
        matrix = _read_matrix(r)
        pos = r.byte_pos
        packed = data[pos]
        pos += 1
        spread = _BITS_TO_SPREAD[(packed >> 6) & 3]
        cs = (ast.ColorSpace.S_RGB if ((packed >> 4) & 3) == 0
              else ast.ColorSpace.LINEAR_RGB)
        count = packed & 0x0F
        stops = []
        for _ in range(count):
            ratio = data[pos]
            pos += 1
            color, pos = _read_rgba(data, pos)
            stops.append(ast.GradientStop(ratio=ratio, color=color))
        grad = ast.Gradient(spread=spread, color_space=cs, colors=tuple(stops))
        if kind == 0x10:
            return ast.LinearGradientFill(matrix=matrix, gradient=grad), pos
        if kind == 0x12:
            return ast.RadialGradientFill(matrix=matrix, gradient=grad), pos
        (focal,) = struct.unpack_from("<h", data, pos)
        pos += 2
        return ast.FocalGradientFill(matrix=matrix, gradient=grad,
                                     focal_point_epsilons=focal), pos
    if 0x40 <= kind <= 0x43:
        (bitmap_id,) = struct.unpack_from("<H", data, pos)
        pos += 2
        r = BitReader(data, pos)
        matrix = _read_matrix(r)
        pos = r.byte_pos
        return ast.BitmapFill(
            bitmap_id=bitmap_id, matrix=matrix,
            repeating=(kind in (0x40, 0x42)),
            smoothed=(kind in (0x40, 0x41)),
        ), pos
    raise ValueError(f"unknown fill style kind 0x{kind:02x}")


def _emit_styles(styles: ast.ShapeStyles, line2: bool = False) -> bytes:
    out = bytearray()
    fills = list(styles.fill)
    if len(fills) >= 0xFF:
        out.append(0xFF)
        out.extend(struct.pack("<H", len(fills)))
    else:
        out.append(len(fills))
    for f in fills:
        out.extend(_emit_fill_style(f))
    lines = list(styles.line)
    if len(lines) >= 0xFF:
        out.append(0xFF)
        out.extend(struct.pack("<H", len(lines)))
    else:
        out.append(len(lines))
    for l in lines:
        if line2:
            out.extend(_emit_line_style2(l))
            continue
        out.extend(struct.pack("<H", l.width))
        if not isinstance(l.fill, ast.SolidFill):
            raise ValueError("DefineShape3 line styles are solid-only")
        _write_rgba(out, l.fill.color)
    return bytes(out)


def _default_line(width: int, color: ast.StraightSRgba8) -> ast.LineStyle:
    return ast.LineStyle(
        width=width, start_cap="round", end_cap="round",
        join={"type": "round"}, no_h_scale=False, no_v_scale=False,
        no_close=False, pixel_hinting=False,
        fill=ast.SolidFill(color=color),
    )


def _parse_styles(data: bytes, pos: int,
                  line2: bool = False) -> Tuple[ast.ShapeStyles, int]:
    count = data[pos]
    pos += 1
    if count == 0xFF:
        (count,) = struct.unpack_from("<H", data, pos)
        pos += 2
    fills = []
    for _ in range(count):
        fill, pos = _parse_fill_style(data, pos)
        fills.append(fill)
    count = data[pos]
    pos += 1
    if count == 0xFF:
        (count,) = struct.unpack_from("<H", data, pos)
        pos += 2
    lines = []
    for _ in range(count):
        if line2:
            line, pos = _parse_line_style2(data, pos)
            lines.append(line)
            continue
        (width,) = struct.unpack_from("<H", data, pos)
        pos += 2
        color, pos = _read_rgba(data, pos)
        lines.append(_default_line(width, color))
    return ast.ShapeStyles(fill=tuple(fills), line=tuple(lines)), pos


# ---------------------------------------------------------------------------
# Shape records
# ---------------------------------------------------------------------------


def _emit_shape_records(body: ast.ShapeBody, line2: bool = False) -> bytes:
    out = bytearray(_emit_styles(body.initial_styles, line2))
    styles = body.initial_styles

    def style_bits(s: ast.ShapeStyles):
        return ubits_for(len(s.fill)), ubits_for(len(s.line))

    fill_bits, line_bits = style_bits(styles)
    w = BitWriter()
    w.write_ub(fill_bits, 4)
    w.write_ub(line_bits, 4)

    for record in body.records:
        if isinstance(record, ast.StyleChangeRecord):
            w.write_ub(0, 1)  # non-edge
            has_new = record.new_styles is not None
            has_line = record.line_style is not None
            has_f1 = record.right_fill is not None
            has_f0 = record.left_fill is not None
            has_move = record.move_to is not None
            w.write_ub(1 if has_new else 0, 1)
            w.write_ub(1 if has_line else 0, 1)
            w.write_ub(1 if has_f1 else 0, 1)
            w.write_ub(1 if has_f0 else 0, 1)
            w.write_ub(1 if has_move else 0, 1)
            if has_move:
                nbits = sbits_for(record.move_to.x, record.move_to.y)
                w.write_ub(nbits, 5)
                w.write_sb(record.move_to.x, nbits)
                w.write_sb(record.move_to.y, nbits)
            if has_f0:
                w.write_ub(record.left_fill, fill_bits)
            if has_f1:
                w.write_ub(record.right_fill, fill_bits)
            if has_line:
                w.write_ub(record.line_style, line_bits)
            if has_new:
                w.align()
                out.extend(w.bytes())
                out.extend(_emit_styles(record.new_styles, line2))
                styles = record.new_styles
                fill_bits, line_bits = style_bits(styles)
                w = BitWriter()
                w.write_ub(fill_bits, 4)
                w.write_ub(line_bits, 4)
        elif isinstance(record, ast.EdgeRecord):
            w.write_ub(1, 1)  # edge
            if record.control_delta is None:
                w.write_ub(1, 1)  # straight
                dx, dy = record.delta.x, record.delta.y
                nbits = max(2, sbits_for(dx, dy))
                w.write_ub(nbits - 2, 4)
                if dx != 0 and dy != 0:
                    w.write_ub(1, 1)  # general line
                    w.write_sb(dx, nbits)
                    w.write_sb(dy, nbits)
                else:
                    w.write_ub(0, 1)
                    vertical = dx == 0
                    w.write_ub(1 if vertical else 0, 1)
                    w.write_sb(dy if vertical else dx, nbits)
            else:
                w.write_ub(0, 1)  # curved
                cx, cy = record.control_delta.x, record.control_delta.y
                ax = record.delta.x - cx
                ay = record.delta.y - cy
                nbits = max(2, sbits_for(cx, cy, ax, ay))
                w.write_ub(nbits - 2, 4)
                w.write_sb(cx, nbits)
                w.write_sb(cy, nbits)
                w.write_sb(ax, nbits)
                w.write_sb(ay, nbits)
        else:
            raise ValueError(f"unknown record {record!r}")

    w.write_ub(0, 6)  # end record
    w.align()
    out.extend(w.bytes())
    return bytes(out)


def _parse_shape_records(data: bytes, pos: int,
                         line2: bool = False) -> Tuple[ast.ShapeBody, int]:
    initial_styles, pos = _parse_styles(data, pos, line2)
    records: List[ast.ShapeRecord] = []
    r = BitReader(data, pos)
    fill_bits = r.read_ub(4)
    line_bits = r.read_ub(4)

    while True:
        is_edge = r.read_ub(1)
        if not is_edge:
            flags = r.read_ub(5)
            if flags == 0:
                break  # end record
            has_new = bool(flags & 0b10000)
            has_line = bool(flags & 0b01000)
            has_f1 = bool(flags & 0b00100)
            has_f0 = bool(flags & 0b00010)
            has_move = bool(flags & 0b00001)
            move_to = left = right = line = new_styles = None
            if has_move:
                nbits = r.read_ub(5)
                move_to = ast.Vector2D(r.read_sb(nbits), r.read_sb(nbits))
            if has_f0:
                left = r.read_ub(fill_bits)
            if has_f1:
                right = r.read_ub(fill_bits)
            if has_line:
                line = r.read_ub(line_bits)
            if has_new:
                r.align()
                new_styles, pos = _parse_styles(data, r.byte_pos, line2)
                r = BitReader(data, pos)
                fill_bits = r.read_ub(4)
                line_bits = r.read_ub(4)
            records.append(ast.StyleChangeRecord(
                move_to=move_to, left_fill=left, right_fill=right,
                line_style=line, new_styles=new_styles,
            ))
        else:
            straight = r.read_ub(1)
            nbits = r.read_ub(4) + 2
            if straight:
                if r.read_ub(1):  # general
                    dx = r.read_sb(nbits)
                    dy = r.read_sb(nbits)
                elif r.read_ub(1):  # vertical
                    dx, dy = 0, r.read_sb(nbits)
                else:
                    dx, dy = r.read_sb(nbits), 0
                records.append(ast.EdgeRecord(delta=ast.Vector2D(dx, dy)))
            else:
                cx = r.read_sb(nbits)
                cy = r.read_sb(nbits)
                ax = r.read_sb(nbits)
                ay = r.read_sb(nbits)
                records.append(ast.EdgeRecord(
                    delta=ast.Vector2D(cx + ax, cy + ay),
                    control_delta=ast.Vector2D(cx, cy),
                ))
    r.align()
    return ast.ShapeBody(initial_styles=initial_styles,
                         records=tuple(records)), r.byte_pos


# ---------------------------------------------------------------------------
# Tags and movies
# ---------------------------------------------------------------------------


def _tag(code: int, body: bytes) -> bytes:
    if len(body) >= 0x3F:
        return struct.pack("<HI", (code << 6) | 0x3F, len(body)) + body
    return struct.pack("<H", (code << 6) | len(body)) + body


def emit_define_shape(tag: ast.DefineShape) -> bytes:
    """DefineShape3 tag bytes for a DefineShape AST."""
    body = bytearray(struct.pack("<H", tag.id))
    w = BitWriter()
    _write_rect(w, tag.bounds)
    body.extend(w.bytes())
    body.extend(_emit_shape_records(tag.shape))
    return _tag(TAG_DEFINE_SHAPE3, bytes(body))


def parse_define_shape_tag(body: bytes) -> ast.DefineShape:
    (shape_id,) = struct.unpack_from("<H", body, 0)
    r = BitReader(body, 2)
    bounds = _read_rect(r)
    shape, _ = _parse_shape_records(body, r.byte_pos)
    return ast.DefineShape(id=shape_id, bounds=bounds, shape=shape)


_CAP_TO_BITS = {"round": 0, "none": 1, "square": 2}
_BITS_TO_CAP = {v: k for k, v in _CAP_TO_BITS.items()}
_JOIN_TO_BITS = {"round": 0, "bevel": 1, "miter": 2}
_BITS_TO_JOIN = {v: k for k, v in _JOIN_TO_BITS.items()}


def _emit_line_style2(l: ast.LineStyle) -> bytes:
    """DefineShape4 LINESTYLE2: caps/joins/miter encoded (spec v19 p.153)."""
    if not isinstance(l.fill, ast.SolidFill):
        raise ValueError("LINESTYLE2 fill styles not supported (solid only)")
    out = bytearray(struct.pack("<H", l.width))
    join = l.join.get("type", "round") if isinstance(l.join, dict) \
        else str(l.join)
    b = 0
    b |= _CAP_TO_BITS[l.start_cap] << 6
    b |= _JOIN_TO_BITS[join] << 4
    # HasFillFlag = 0 (solid color), NoHScale, NoVScale, PixelHinting
    b |= (1 if l.no_h_scale else 0) << 2
    b |= (1 if l.no_v_scale else 0) << 1
    b |= 1 if l.pixel_hinting else 0
    out.append(b)
    b2 = 0  # 5 reserved bits
    b2 |= (1 if l.no_close else 0) << 2
    b2 |= _CAP_TO_BITS[l.end_cap]
    out.append(b2)
    if join == "miter":
        limit = float(l.join.get("limit", 3.0)) \
            if isinstance(l.join, dict) else 3.0
        out.extend(struct.pack("<H", int(round(limit * 256)) & 0xFFFF))
    _write_rgba(out, l.fill.color)
    return bytes(out)


def _parse_line_style2(data: bytes, pos: int) -> Tuple[ast.LineStyle, int]:
    (width,) = struct.unpack_from("<H", data, pos)
    pos += 2
    b = data[pos]
    pos += 1
    start_cap = _BITS_TO_CAP[(b >> 6) & 3]
    join_bits = (b >> 4) & 3
    has_fill = bool((b >> 3) & 1)
    no_h = bool((b >> 2) & 1)
    no_v = bool((b >> 1) & 1)
    hinting = bool(b & 1)
    b2 = data[pos]
    pos += 1
    no_close = bool((b2 >> 2) & 1)
    end_cap = _BITS_TO_CAP[b2 & 3]
    join: dict = {"type": _BITS_TO_JOIN[join_bits]}
    if join_bits == 2:
        (ml,) = struct.unpack_from("<H", data, pos)
        pos += 2
        join["limit"] = ml / 256.0
    if has_fill:
        raise ValueError("LINESTYLE2 fill styles not supported")
    color, pos = _read_rgba(data, pos)
    return ast.LineStyle(
        width=width, start_cap=start_cap, end_cap=end_cap, join=join,
        no_h_scale=no_h, no_v_scale=no_v, no_close=no_close,
        pixel_hinting=hinting, fill=ast.SolidFill(color=color),
    ), pos


def emit_define_shape4(tag: ast.DefineShape) -> bytes:
    """DefineShape4 tag bytes: LINESTYLE2 line styles (caps/joins/miter
    survive the round trip, unlike DefineShape3)."""
    body = bytearray(struct.pack("<H", tag.id))
    w = BitWriter()
    _write_rect(w, tag.bounds)
    _write_rect(w, tag.bounds)  # edge bounds: reuse shape bounds
    body.extend(w.bytes())
    # Flags: reserved(5) | UsesFillWindingRule | UsesNonScalingStrokes |
    # UsesScalingStrokes — default strokes scale, so bit 0.
    body.append((1 if tag.has_fill_winding else 0) << 2 | 0b01)
    body.extend(_emit_shape_records(tag.shape, line2=True))
    return _tag(TAG_DEFINE_SHAPE4, bytes(body))


def parse_define_shape4_tag(body: bytes) -> ast.DefineShape:
    (shape_id,) = struct.unpack_from("<H", body, 0)
    r = BitReader(body, 2)
    bounds = _read_rect(r)
    _read_rect(r)  # edge bounds (unused: emit mirrors shape bounds)
    flags = body[r.byte_pos]
    shape, _ = _parse_shape_records(body, r.byte_pos + 1, line2=True)
    return ast.DefineShape(id=shape_id, bounds=bounds, shape=shape,
                           has_fill_winding=bool((flags >> 2) & 1))


def emit_movie(shapes: List[ast.DefineShape],
               background: ast.StraightSRgba8 = ast.StraightSRgba8(
                   255, 255, 255, 255),
               frame_rate: float = 24.0,
               shape4: bool = False) -> bytes:
    """Assemble an uncompressed .swf placing each shape on one frame
    (the reference build.js analog).  ``shape4`` emits DefineShape4 tags
    (LINESTYLE2: caps/joins/miter preserved)."""
    x_max = max((s.bounds.x_max for s in shapes), default=11000)
    y_max = max((s.bounds.y_max for s in shapes), default=8000)
    w = BitWriter()
    _write_rect(w, ast.Rect(0, x_max, 0, y_max))

    tags = bytearray()
    tags.extend(_tag(TAG_SET_BACKGROUND,
                     bytes((background.r, background.g, background.b))))
    for depth, shape in enumerate(shapes, start=1):
        tags.extend(emit_define_shape4(shape) if shape4
                    else emit_define_shape(shape))
        # PlaceObject2: flags (has character), depth, character id.
        tags.extend(_tag(TAG_PLACE_OBJECT2,
                         struct.pack("<BHH", 0x02, depth, shape.id)))
    tags.extend(_tag(TAG_SHOW_FRAME, b""))
    tags.extend(_tag(TAG_END, b""))

    header_body = (
        w.bytes()
        + struct.pack("<HH", int(frame_rate * 256), 1)
        + bytes(tags)
    )
    # DefineShape4 (tag 83) requires SWF file format version >= 8.
    header = b"FWS" + bytes([8 if shape4 else 6])
    total = len(header) + 4 + len(header_body)
    return header + struct.pack("<I", total) + header_body


def parse_movie_shapes(data: bytes) -> List[ast.DefineShape]:
    """Extract every DefineShape3/DefineShape4 from an uncompressed
    movie."""
    if data[:3] != b"FWS":
        raise ValueError("only uncompressed (FWS) movies supported")
    r = BitReader(data, 8)
    _read_rect(r)
    pos = r.byte_pos + 4  # frame rate + count
    shapes = []
    while pos < len(data):
        (head,) = struct.unpack_from("<H", data, pos)
        pos += 2
        code = head >> 6
        length = head & 0x3F
        if length == 0x3F:
            (length,) = struct.unpack_from("<I", data, pos)
            pos += 4
        body = data[pos : pos + length]
        pos += length
        if code == TAG_DEFINE_SHAPE3:
            shapes.append(parse_define_shape_tag(body))
        if code == TAG_DEFINE_SHAPE4:
            shapes.append(parse_define_shape4_tag(body))
        if code == TAG_END:
            break
    return shapes
