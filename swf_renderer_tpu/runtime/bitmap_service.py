"""Bitmap asset service: decode and register SWF bitmaps by character id.

The codec handles the ``image/x-swf-bmp`` container (reference
ts/src/lib/decode-x-swf-bmp.ts:9-41): header ``formatId(=3 only) u8,
width u16LE, height u16LE, colorCount-1 u8`` followed by a zlib stream
holding an RGB palette (opaque) and palettized pixels with rows padded to
4 bytes.  Out-of-range palette indices resolve to opaque black
(decode-x-swf-bmp.ts:35-36).
"""

from __future__ import annotations

import dataclasses
import struct
import zlib
from typing import Dict, Optional

import numpy as np

from ..models import ast


def decode_x_swf_bmp(data: bytes) -> np.ndarray:
    """Decode ``image/x-swf-bmp`` bytes into an (H, W, 4) uint8 RGBA array."""
    format_id = data[0]
    if format_id != 3:
        raise ValueError(f"UnsupportedXSwfBmpFormatId: {format_id}")
    width, height = struct.unpack_from("<HH", data, 1)
    color_count = data[5] + 1
    padded_width = width + ((4 - (width % 4)) % 4)
    src = zlib.decompress(data[6:])

    table_size = 3 * color_count
    palette = np.frombuffer(src[:table_size], dtype=np.uint8).reshape(-1, 3)
    # Out-of-range indices -> opaque black: pad the lookup table to 256.
    lut = np.zeros((256, 4), dtype=np.uint8)
    lut[:, 3] = 255
    lut[: len(palette), :3] = palette

    pixels = np.frombuffer(
        src[table_size : table_size + height * padded_width], dtype=np.uint8
    ).reshape(height, padded_width)[:, :width]
    return lut[pixels]


@dataclasses.dataclass
class Bitmap:
    width: int
    height: int
    rgba: Optional[np.ndarray]  # (H, W, 4) uint8, or None if decode unavailable


class BitmapService:
    """id -> decoded bitmap registry (reference bitmap-service.ts:3-16,
    node-canvas-bitmap-service.ts:7-46)."""

    def __init__(self) -> None:
        self._bitmaps: Dict[int, Bitmap] = {}

    def add_bitmap(self, tag: ast.DefineBitmap) -> None:
        if tag.media_type != "image/x-swf-bmp":
            raise NotImplementedError(
                f"NotImplemented: Support for {tag.media_type} images"
            )
        rgba = decode_x_swf_bmp(tag.data)
        self._bitmaps[tag.id] = Bitmap(
            width=rgba.shape[1], height=rgba.shape[0], rgba=rgba
        )

    def get_by_id(self, bitmap_id: int) -> Bitmap:
        bitmap = self._bitmaps.get(bitmap_id)
        if bitmap is None:
            raise KeyError(f"BitmapNotFound: {bitmap_id}")
        return bitmap

    def try_get(self, bitmap_id: int) -> Optional[Bitmap]:
        return self._bitmaps.get(bitmap_id)

    def __contains__(self, bitmap_id: int) -> bool:
        return bitmap_id in self._bitmaps
