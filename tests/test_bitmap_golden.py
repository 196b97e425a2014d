"""Bitmap codec golden test: byte-equal PAM output.

Mirrors reference ts/src/test/decode-bitmap.spec.ts:18-39.
"""

import pathlib

from swf_renderer_tpu.models.ast_io import parse_define_bitmap
from swf_renderer_tpu.runtime.bitmap_service import BitmapService, decode_x_swf_bmp
from swf_renderer_tpu.utils.pam import pam_to_rgba, rgba_to_pam


def test_decode_bitmap_golden(reference_tests: pathlib.Path, artifacts_dir):
    sample_dir = reference_tests / "bitmap"
    tag = parse_define_bitmap((sample_dir / "homestuck-beta-3.ast.json").read_text())
    rgba = decode_x_swf_bmp(tag.data)
    actual = rgba_to_pam(rgba)
    (artifacts_dir / "homestuck-beta-3.ts-out.pam").write_bytes(actual)
    expected = (sample_dir / "homestuck-beta-3.pam").read_bytes()
    assert actual == expected


def test_pam_roundtrip(reference_tests: pathlib.Path):
    expected = (reference_tests / "bitmap" / "homestuck-beta-3.pam").read_bytes()
    rgba = pam_to_rgba(expected)
    assert rgba.shape == (208, 139, 4)
    assert rgba_to_pam(rgba) == expected


def test_bitmap_service(reference_tests: pathlib.Path):
    tag = parse_define_bitmap(
        (reference_tests / "bitmap" / "homestuck-beta-3.ast.json").read_text()
    )
    service = BitmapService()
    service.add_bitmap(tag)
    bmp = service.get_by_id(3)
    assert (bmp.width, bmp.height) == (139, 208)
    assert 3 in service and 4 not in service
