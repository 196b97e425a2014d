"""Extended lossless bitmap formats (framework extension).

The reference codec handles only DefineBitsLossless format 3
(decode-x-swf-bmp.ts:9-41) and throws ``NotImplemented: Support for
<type> images`` for everything else (node-canvas-bitmap-service.ts:33).
These tests cover the framework's extension formats: DefineBitsLossless
direct-color PIX15/PIX24 (``image/x-swf-bmp-full``) and
DefineBitsLossless2 formats 3/5 (``image/x-swf-bmp2``, alpha), end to
end through the movie wire format and the real render kernels.
"""

import numpy as np
import pytest

from swf_renderer_tpu.models import ast, swf_binary
from swf_renderer_tpu.runtime.bitmap_service import (
    BitmapService,
    decode_x_swf_bmp2,
    decode_x_swf_bmp_full,
    encode_x_swf_bmp2_argb,
    encode_x_swf_bmp2_colormapped,
    encode_x_swf_bmp_pix15,
    encode_x_swf_bmp_pix24,
)
from swf_renderer_tpu.utils.fixed import Sfixed16P16


def _rng(seed):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# Codec round trips
# ---------------------------------------------------------------------------


def test_pix24_roundtrip():
    rgb = _rng(1).integers(0, 256, (7, 5, 3)).astype(np.uint8)
    got = decode_x_swf_bmp_full(encode_x_swf_bmp_pix24(rgb))
    np.testing.assert_array_equal(got[..., :3], rgb)
    assert (got[..., 3] == 255).all()


def test_pix15_expansion():
    """5-bit channels expand with (c5 << 3) | (c5 >> 2): endpoint-exact
    (0 -> 0, 31 -> 255) and monotone."""
    rgb = _rng(2).integers(0, 256, (3, 9, 3)).astype(np.uint8)
    got = decode_x_swf_bmp_full(encode_x_swf_bmp_pix15(rgb))
    c5 = rgb.astype(np.uint16) >> 3
    want = ((c5 << 3) | (c5 >> 2)).astype(np.uint8)
    np.testing.assert_array_equal(got[..., :3], want)
    assert (got[..., 3] == 255).all()
    # Endpoints are exact.
    black = decode_x_swf_bmp_full(
        encode_x_swf_bmp_pix15(np.zeros((1, 1, 3), np.uint8)))
    white = decode_x_swf_bmp_full(
        encode_x_swf_bmp_pix15(np.full((1, 1, 3), 255, np.uint8)))
    np.testing.assert_array_equal(black[0, 0], [0, 0, 0, 255])
    np.testing.assert_array_equal(white[0, 0], [255, 255, 255, 255])


def test_pix15_row_padding():
    """Odd widths force the 4-byte scanline pad (2*w not divisible by 4)."""
    rgb = _rng(3).integers(0, 256, (4, 3, 3)).astype(np.uint8)
    got = decode_x_swf_bmp_full(encode_x_swf_bmp_pix15(rgb))
    assert got.shape == (4, 3, 4)
    c5 = rgb.astype(np.uint16) >> 3
    np.testing.assert_array_equal(
        got[..., :3], ((c5 << 3) | (c5 >> 2)).astype(np.uint8))


def test_lossless2_argb_opaque_and_transparent_exact():
    """Alpha-255 pixels survive the premultiply round trip exactly;
    alpha-0 pixels decode to transparent black."""
    rgba = _rng(4).integers(0, 256, (6, 6, 4)).astype(np.uint8)
    rgba[:3, :, 3] = 255
    rgba[3:, :, 3] = 0
    got = decode_x_swf_bmp2(encode_x_swf_bmp2_argb(rgba))
    np.testing.assert_array_equal(got[:3], rgba[:3])
    np.testing.assert_array_equal(got[3:], np.zeros_like(got[3:]))


def test_lossless2_argb_premul_canonical():
    """General alphas: premultiplication is lossy, but the premul bytes
    are canonical — re-encoding the decode reproduces them bit-exactly,
    and the decode never exceeds one un-premultiply quantum."""
    rgba = _rng(5).integers(0, 256, (16, 16, 4)).astype(np.uint8)
    payload = encode_x_swf_bmp2_argb(rgba)
    decoded = decode_x_swf_bmp2(payload)
    assert encode_x_swf_bmp2_argb(decoded) == payload
    np.testing.assert_array_equal(decoded[..., 3], rgba[..., 3])


def test_lossless2_argb_hand_oracle():
    # Straight (200, 100, 40, 128) premultiplies (round-half-up) to
    # (100, 50, 20); un-premultiplying gives round((c*255 + 64)/128).
    rgba = np.array([[[200, 100, 40, 128]]], np.uint8)
    got = decode_x_swf_bmp2(encode_x_swf_bmp2_argb(rgba))
    np.testing.assert_array_equal(got[0, 0], [199, 100, 40, 128])


def test_lossless2_colormapped_alpha_palette_and_oor():
    """RGBA palette entries carry alpha; out-of-range indices resolve to
    TRANSPARENT black (the alpha twin of the opaque-black rule the
    reference applies at decode-x-swf-bmp.ts:35-36)."""
    palette = np.array(
        [[255, 0, 0, 255], [0, 255, 0, 128], [0, 0, 255, 0]], np.uint8)
    indices = np.array([[0, 1, 2], [1, 7, 0]], np.uint8)  # 7 is OOR
    got = decode_x_swf_bmp2(encode_x_swf_bmp2_colormapped(palette, indices))
    np.testing.assert_array_equal(got[0, 0], palette[0])
    np.testing.assert_array_equal(got[0, 1], palette[1])
    np.testing.assert_array_equal(got[0, 2], palette[2])
    np.testing.assert_array_equal(got[1, 1], [0, 0, 0, 0])


def test_lossless2_colormapped_row_padding():
    palette = np.array([[9, 8, 7, 255], [1, 2, 3, 4]], np.uint8)
    indices = _rng(6).integers(0, 2, (5, 6)).astype(np.uint8)
    got = decode_x_swf_bmp2(encode_x_swf_bmp2_colormapped(palette, indices))
    np.testing.assert_array_equal(got, palette[indices])


# ---------------------------------------------------------------------------
# Tag and movie wire format
# ---------------------------------------------------------------------------


def _strip_head(blob: bytes, expect_code: int) -> bytes:
    head = int.from_bytes(blob[:2], "little")
    code, length = head >> 6, head & 0x3F
    assert code == expect_code
    return blob[2 + (4 if length == 0x3F else 0):]


def test_lossless2_tag_roundtrip():
    rgba = _rng(7).integers(0, 256, (4, 5, 4)).astype(np.uint8)
    tag = ast.DefineBitmap(id=3, width=5, height=4,
                           media_type="image/x-swf-bmp2",
                           data=encode_x_swf_bmp2_argb(rgba))
    blob = swf_binary.emit_define_bits_lossless2(tag)
    parsed = swf_binary.parse_define_bits_lossless2_tag(
        _strip_head(blob, swf_binary.TAG_DEFINE_BITS_LOSSLESS2))
    assert parsed == tag


def test_lossless_full_tag_roundtrip():
    rgb = _rng(8).integers(0, 256, (3, 4, 3)).astype(np.uint8)
    for payload in (encode_x_swf_bmp_pix24(rgb), encode_x_swf_bmp_pix15(rgb)):
        tag = ast.DefineBitmap(id=2, width=4, height=3,
                               media_type="image/x-swf-bmp-full",
                               data=payload)
        blob = swf_binary.emit_define_bits_lossless(tag)
        parsed = swf_binary.parse_define_bits_lossless_tag(
            _strip_head(blob, swf_binary.TAG_DEFINE_BITS_LOSSLESS))
        assert parsed == tag


def test_lossless2_tag_rejects_wrong_media_and_format():
    with pytest.raises(ValueError):
        swf_binary.emit_define_bits_lossless2(ast.DefineBitmap(
            id=1, width=1, height=1, media_type="image/x-swf-bmp",
            data=b"\x03\x01\x00\x01\x00\x00"))
    with pytest.raises(ValueError):
        swf_binary.emit_define_bits_lossless2(ast.DefineBitmap(
            id=1, width=1, height=1, media_type="image/x-swf-bmp2",
            data=b"\x04\x01\x00\x01\x00"))
    with pytest.raises(ValueError):
        swf_binary.parse_define_bits_lossless2_tag(
            b"\x01\x00" + b"\x04\x01\x00\x01\x00")


def test_bitmap_service_routes_all_media_types():
    svc = BitmapService()
    rgba = _rng(9).integers(0, 256, (2, 2, 4)).astype(np.uint8)
    rgb = rgba[..., :3]
    svc.add_bitmap(ast.DefineBitmap(
        id=1, width=2, height=2, media_type="image/x-swf-bmp-full",
        data=encode_x_swf_bmp_pix24(rgb)))
    svc.add_bitmap(ast.DefineBitmap(
        id=2, width=2, height=2, media_type="image/x-swf-bmp2",
        data=encode_x_swf_bmp2_argb(rgba)))
    np.testing.assert_array_equal(svc.get_by_id(1).rgba[..., :3], rgb)
    assert svc.get_by_id(2).rgba.shape == (2, 2, 4)
    with pytest.raises(NotImplementedError):
        svc.add_bitmap(ast.DefineBitmap(
            id=3, width=1, height=1, media_type="image/png", data=b""))


def _bitmap_fill_shape(bitmap_id: int, scale_twips: float) -> ast.DefineShape:
    m = ast.Matrix(
        scale_x=Sfixed16P16.from_value(scale_twips),
        scale_y=Sfixed16P16.from_value(scale_twips),
        rotate_skew0=Sfixed16P16.from_value(0),
        rotate_skew1=Sfixed16P16.from_value(0),
        translate_x=0, translate_y=0)
    fill = ast.BitmapFill(bitmap_id=bitmap_id, matrix=m,
                          repeating=True, smoothed=False)
    records = (
        ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), left_fill=1),
        ast.EdgeRecord(delta=ast.Vector2D(1600, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, 1200)),
        ast.EdgeRecord(delta=ast.Vector2D(-1600, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, -1200)),
    )
    return ast.DefineShape(
        id=1, bounds=ast.Rect(0, 1600, 0, 1200),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(fill=(fill,), line=()),
            records=records))


def test_movie_with_lossless2_matches_lossless_equivalent():
    """A lossless2 movie whose palette is opaque renders pixel-identical
    to the same movie carrying the classic format-3 RGB palette."""
    from swf_renderer_tpu.runtime.movie import render_movie
    import struct
    import zlib

    rng = _rng(10)
    palette_rgb = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    indices = rng.integers(0, 4, (8, 8)).astype(np.uint8)

    palette_rgba = np.concatenate(
        [palette_rgb, np.full((4, 1), 255, np.uint8)], axis=1)
    bmp2 = ast.DefineBitmap(
        id=7, width=8, height=8, media_type="image/x-swf-bmp2",
        data=encode_x_swf_bmp2_colormapped(palette_rgba, indices))

    stride = (8 + 3) & ~3
    rows = np.zeros((8, stride), np.uint8)
    rows[:, :8] = indices
    legacy_payload = (bytes([3]) + struct.pack("<HH", 8, 8) + bytes([3])
                      + zlib.compress(palette_rgb.tobytes() + rows.tobytes()))
    bmp1 = ast.DefineBitmap(id=7, width=8, height=8,
                            media_type="image/x-swf-bmp",
                            data=legacy_payload)

    shape = _bitmap_fill_shape(bitmap_id=7, scale_twips=200.0)
    frames = [[swf_binary.Placement(depth=1, character_id=1)]]
    kw = dict(shapes=[shape], stage_rect=ast.Rect(0, 1600, 0, 1200))
    movie2 = swf_binary.emit_movie_timeline(frames, bitmaps=[bmp2], **kw)
    movie1 = swf_binary.emit_movie_timeline(frames, bitmaps=[bmp1], **kw)

    got2 = render_movie(movie2)
    got1 = render_movie(movie1)
    np.testing.assert_array_equal(got2, got1)
    assert got2[..., 3].max() == 255  # something opaque was drawn


def test_constant_alpha_texture_matches_solid_fill():
    """A constant semi-transparent lossless2 texture composites exactly
    like a SolidFill of the same straight RGBA — alpha flows through the
    bitmap paint path unchanged."""
    from swf_renderer_tpu.runtime.movie import render_movie

    color = (40, 200, 120, 128)
    rgba = np.tile(np.array(color, np.uint8), (4, 4, 1))
    bmp = ast.DefineBitmap(id=9, width=4, height=4,
                           media_type="image/x-swf-bmp2",
                           data=encode_x_swf_bmp2_argb(rgba))
    tex_shape = _bitmap_fill_shape(bitmap_id=9, scale_twips=80.0)

    solid = ast.SolidFill(color=ast.StraightSRgba8(*color))
    solid_shape = ast.DefineShape(
        id=1, bounds=tex_shape.bounds,
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(fill=(solid,), line=()),
            records=tex_shape.shape.records))

    frames = [[swf_binary.Placement(depth=1, character_id=1)]]
    rect = ast.Rect(0, 1600, 0, 1200)
    movie_tex = swf_binary.emit_movie_timeline(
        frames, shapes=[tex_shape], bitmaps=[bmp], stage_rect=rect)
    movie_solid = swf_binary.emit_movie_timeline(
        frames, shapes=[solid_shape], stage_rect=rect)
    np.testing.assert_array_equal(
        render_movie(movie_tex), render_movie(movie_solid))
