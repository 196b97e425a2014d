"""JPEG-family bitmap tags (framework extension; reference supports
x-swf-bmp only, node-canvas-bitmap-service.ts:33): DefineBitsJPEG2
(tag 21, also PNG/GIF payloads per SWF >= 8), DefineBitsJPEG3 (tag 35,
zlib alpha plane), and the SWF1 DefineBits (tag 6) + JPEGTables (tag 8)
split stream.
"""

import io
import struct
import zlib

import numpy as np
import pytest

from swf_renderer_tpu.models import ast, swf_binary
from swf_renderer_tpu.runtime.bitmap_service import (
    BitmapService,
    decode_swf_jpeg,
    decode_x_swf_jpeg3,
    encode_x_swf_bmp2_argb,
)

PIL = pytest.importorskip("PIL.Image")


def _png_bytes(rgba: np.ndarray) -> bytes:
    buf = io.BytesIO()
    PIL.fromarray(rgba, "RGBA").save(buf, "PNG")
    return buf.getvalue()


def _jpeg_bytes(rgb: np.ndarray, quality=95) -> bytes:
    buf = io.BytesIO()
    PIL.fromarray(rgb, "RGB").save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def _rgba(seed, h=9, w=13):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 4)).astype(np.uint8)


def test_image_dimensions_all_containers():
    rgba = _rgba(1)
    assert swf_binary.image_dimensions(_png_bytes(rgba)) == (13, 9)
    assert swf_binary.image_dimensions(
        _jpeg_bytes(rgba[..., :3])) == (13, 9)
    gif = io.BytesIO()
    PIL.fromarray(rgba[..., :3], "RGB").save(gif, "GIF")
    assert swf_binary.image_dimensions(gif.getvalue()) == (13, 9)
    # The pre-SWF8 erroneous EOI+SOI prefix is stripped.
    assert swf_binary.image_dimensions(
        b"\xff\xd9\xff\xd8" + _jpeg_bytes(rgba[..., :3])) == (13, 9)
    with pytest.raises(ValueError):
        swf_binary.image_dimensions(b"\x00\x01\x02\x03")


def test_png_payload_decodes_byte_exact():
    rgba = _rgba(2)
    got = decode_swf_jpeg(_png_bytes(rgba))
    np.testing.assert_array_equal(got, rgba)


def test_jpeg_payload_decodes_close():
    rgb = np.full((16, 16, 3), 128, np.uint8)
    rgb[4:12, 4:12] = (200, 40, 90)
    got = decode_swf_jpeg(_jpeg_bytes(rgb, quality=100))
    assert got.shape == (16, 16, 4) and (got[..., 3] == 255).all()
    assert np.abs(got[..., :3].astype(int) - rgb.astype(int)).mean() < 4


def test_jpeg3_alpha_plane_applied():
    rgb = _rgba(3)[..., :3]
    alpha = np.random.default_rng(4).integers(0, 256, (9, 13)).astype(
        np.uint8)
    jpeg = _jpeg_bytes(rgb)
    payload = (struct.pack("<I", len(jpeg)) + jpeg
               + zlib.compress(alpha.tobytes()))
    got = decode_x_swf_jpeg3(payload)
    np.testing.assert_array_equal(got[..., 3], alpha)


def test_jpeg_tag_roundtrips():
    rgba = _rgba(5)
    png = _png_bytes(rgba)
    tag2 = ast.DefineBitmap(id=4, width=13, height=9,
                            media_type="image/jpeg", data=png)
    blob = swf_binary.emit_define_bits_jpeg2(tag2)
    head = int.from_bytes(blob[:2], "little")
    assert head >> 6 == swf_binary.TAG_DEFINE_BITS_JPEG2
    off = 2 + (4 if (head & 0x3F) == 0x3F else 0)
    assert swf_binary.parse_define_bits_jpeg2_tag(blob[off:]) == tag2

    jpeg = _jpeg_bytes(rgba[..., :3])
    payload = (struct.pack("<I", len(jpeg)) + jpeg
               + zlib.compress(rgba[..., 3].tobytes()))
    tag3 = ast.DefineBitmap(id=5, width=13, height=9,
                            media_type="image/x-swf-jpeg3", data=payload)
    blob = swf_binary.emit_define_bits_jpeg3(tag3)
    head = int.from_bytes(blob[:2], "little")
    assert head >> 6 == swf_binary.TAG_DEFINE_BITS_JPEG3
    off = 2 + (4 if (head & 0x3F) == 0x3F else 0)
    assert swf_binary.parse_define_bits_jpeg3_tag(blob[off:]) == tag3


def _split_jpeg_streams(jpeg: bytes):
    """Split a monolithic JPEG into the SWF1 JPEGTables stream
    (SOI + DQT/DHT + EOI) and DefineBits stream (SOI + the rest)."""
    segs = []
    pos = 2
    while pos < len(jpeg):
        assert jpeg[pos] == 0xFF
        marker = jpeg[pos + 1]
        if marker == 0xD9:
            break
        if marker == 0xDA:  # SOS: entropy data runs to EOI
            segs.append((marker, jpeg[pos:-2]))
            break
        (seg_len,) = struct.unpack_from(">H", jpeg, pos + 2)
        segs.append((marker, jpeg[pos : pos + 2 + seg_len]))
        pos += 2 + seg_len
    tables = b"".join(s for m, s in segs if m in (0xDB, 0xC4))
    rest = b"".join(s for m, s in segs if m not in (0xDB, 0xC4))
    return (b"\xff\xd8" + tables + b"\xff\xd9",
            b"\xff\xd8" + rest + b"\xff\xd9")


def test_define_bits_v1_split_stream():
    rgb = _rgba(6)[..., :3]
    jpeg = _jpeg_bytes(rgb)
    tables, scan = _split_jpeg_streams(jpeg)
    tag = swf_binary._define_bits_v1_jpeg(
        tables, struct.pack("<H", 9) + scan)
    assert (tag.id, tag.width, tag.height) == (9, 13, 9)
    got = decode_swf_jpeg(tag.data)
    want = decode_swf_jpeg(jpeg)
    np.testing.assert_array_equal(got, want)  # same tables, same scan


def test_movie_jpeg2_png_payload_renders_exact_opaque():
    """A PNG-payload DefineBitsJPEG2 movie renders pixel-identical to
    the same movie carrying the (opaque) texture as lossless2 ARGB."""
    from swf_renderer_tpu.runtime.movie import render_movie
    from tests.test_bitmap_formats import _bitmap_fill_shape

    rgba = _rgba(8, 8, 8)
    rgba[..., 3] = 255
    shape = _bitmap_fill_shape(bitmap_id=7, scale_twips=200.0)
    frames = [[swf_binary.Placement(depth=1, character_id=1)]]
    kw = dict(shapes=[shape], stage_rect=ast.Rect(0, 1600, 0, 1200))
    png_tag = ast.DefineBitmap(id=7, width=8, height=8,
                               media_type="image/jpeg",
                               data=_png_bytes(rgba))
    l2_tag = ast.DefineBitmap(id=7, width=8, height=8,
                              media_type="image/x-swf-bmp2",
                              data=encode_x_swf_bmp2_argb(rgba))
    got = render_movie(swf_binary.emit_movie_timeline(
        frames, bitmaps=[png_tag], **kw))
    want = render_movie(swf_binary.emit_movie_timeline(
        frames, bitmaps=[l2_tag], **kw))
    np.testing.assert_array_equal(got, want)


def test_bitmap_service_jpeg_media_types():
    svc = BitmapService()
    rgba = _rgba(9, 4, 4)
    svc.add_bitmap(ast.DefineBitmap(
        id=1, width=4, height=4, media_type="image/jpeg",
        data=_png_bytes(rgba)))
    np.testing.assert_array_equal(svc.get_by_id(1).rgba, rgba)


def test_jpeg4_normalizes_to_jpeg3():
    rgba = _rgba(10, 6, 6)
    jpeg = _jpeg_bytes(rgba[..., :3])
    j3_payload = (struct.pack("<I", len(jpeg)) + jpeg
                  + zlib.compress(rgba[..., 3].tobytes()))
    body = (struct.pack("<H", 4) + struct.pack("<I", len(jpeg))
            + struct.pack("<H", 0x0100)  # deblock hint, dropped
            + jpeg + zlib.compress(rgba[..., 3].tobytes()))
    tag = swf_binary.parse_define_bits_jpeg4_tag(body)
    assert tag.media_type == "image/x-swf-jpeg3"
    assert tag.data == j3_payload
    got = decode_x_swf_jpeg3(tag.data)
    np.testing.assert_array_equal(got[..., 3], rgba[..., 3])
