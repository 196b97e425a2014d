"""Embedded video: Screen Video packets + DefineVideoStream/VideoFrame.

``models.screenvideo`` is a byte-exact encode/decode twin for the SWF
codec-3 bit stream (tile grid of zlib-deflated bottom-up BGR blocks;
interframes skip unchanged tiles).  The loader materializes decoded
frames as synthetic bitmap characters, so a placed video renders
through the ordinary bitmap-fill path and advances with the timeline
(or seeks by the placement RATIO).  Framework extension — the
reference has no video path at all.
"""

import numpy as np

from swf_renderer_tpu.models import ast, display, swf_binary
from swf_renderer_tpu.models.screenvideo import (
    decode_screen_video_packet,
    encode_screen_video_packet,
)
from swf_renderer_tpu.runtime.movie import (
    load_movie_stage,
    render_movie,
    render_movie_timeline,
)
from swf_renderer_tpu.utils.fixed import Sfixed16P16


def _frames(seed=7, w=37, h=23):
    rng = np.random.default_rng(seed)
    f0 = rng.integers(0, 256, (h, w, 3), np.uint8)
    f1 = f0.copy()
    f1[4:12, 6:20] = rng.integers(0, 256, (8, 14, 3), np.uint8)
    return f0, f1


def test_packet_round_trip_keyframe():
    f0, _ = _frames()
    data = encode_screen_video_packet(f0, block=16)
    assert np.array_equal(decode_screen_video_packet(data), f0)


def test_packet_round_trip_interframe():
    f0, f1 = _frames()
    key = encode_screen_video_packet(f0, block=16)
    inter = encode_screen_video_packet(f1, prev=f0, block=16)
    # Unchanged tiles are dataSize-0 on the wire, so the interframe is
    # strictly smaller than a keyframe of the same image.
    assert len(inter) < len(encode_screen_video_packet(f1, block=16))
    prev = decode_screen_video_packet(key)
    assert np.array_equal(decode_screen_video_packet(inter, prev), f1)


def test_packet_interframe_requires_prev():
    f0, f1 = _frames()
    inter = encode_screen_video_packet(f1, prev=f0, block=16)
    try:
        decode_screen_video_packet(inter)
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("interframe decoded without a predecessor")


def _video_movie(ratio=None, two_timeline_frames=True):
    f0, f1 = _frames()
    stream = swf_binary.VideoStream(id=5, width=37, height=23,
                                    smoothing=False)
    stream.frames[0] = encode_screen_video_packet(f0, block=16)
    stream.frames[1] = encode_screen_video_packet(f1, prev=f0, block=16)
    place = swf_binary.Placement(depth=1, character_id=5, ratio=ratio)
    frames = [[place]] + ([[]] if two_timeline_frames else [])
    data = swf_binary.emit_movie_timeline(
        frames=frames, videos=(stream,),
        stage_rect=ast.Rect(0, 37 * 20, 0, 23 * 20))
    return data, f0, f1


def _interior(img):
    return img[1:-1, 1:-1, :3]


def test_video_advances_with_timeline():
    data, f0, f1 = _video_movie()
    movie = swf_binary.parse_movie(data)
    assert movie.videos[5].frames.keys() == {0, 1}
    out = render_movie_timeline(data)
    assert out.shape[0] == 2
    assert np.array_equal(_interior(out[0]), _interior(
        np.dstack([f0, np.full(f0.shape[:2], 255, np.uint8)])[..., :4]))
    assert np.array_equal(_interior(out[1]), f1[1:-1, 1:-1])


def test_video_placed_mid_timeline_starts_at_frame_zero():
    # The stream's clock starts when the placement appears: placed on
    # timeline frame 1, video frame 0 shows there (not frame 1).
    f0, f1 = _frames()
    stream = swf_binary.VideoStream(id=5, width=37, height=23,
                                    smoothing=False)
    stream.frames[0] = encode_screen_video_packet(f0, block=16)
    stream.frames[1] = encode_screen_video_packet(f1, prev=f0, block=16)
    data = swf_binary.emit_movie_timeline(
        frames=[[], [swf_binary.Placement(depth=1, character_id=5)], []],
        videos=(stream,), stage_rect=ast.Rect(0, 37 * 20, 0, 23 * 20))
    out = render_movie_timeline(data)
    assert np.array_equal(_interior(out[1]), f0[1:-1, 1:-1])
    assert np.array_equal(_interior(out[2]), f1[1:-1, 1:-1])


def test_video_seeks_by_ratio():
    # A placement RATIO of 1 (u16 on the wire) pins video frame 1 on
    # timeline frame 0 (embedded-video seek semantics).
    data, _f0, f1 = _video_movie(ratio=1.0 / 65536,
                                 two_timeline_frames=False)
    img = render_movie(data)
    assert np.array_equal(_interior(img), f1[1:-1, 1:-1])


def test_video_bitmaps_registered_once():
    data, _f0, _f1 = _video_movie()
    stage, bitmaps = load_movie_stage(data)
    ids = [b.id for b in bitmaps]
    assert len(ids) == len(set(ids)) == 2
    assert all(isinstance(c, display.ShapeInstance)
               for c in stage.children)
