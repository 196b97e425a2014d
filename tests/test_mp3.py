"""MP3 (Layer III) decoder tests.

Three rungs, mirroring the corpus strategy (SURVEY.md §4): structural
invariants on the ISO tables, an oracle comparison of a real MPEG-2.5
stream against the system mpg123 reference decoder (via pygame), and the
SWF integration path — DefineSound/SoundStream format 2 through the wire
codec and the timeline mixer.
"""

import pathlib

import numpy as np
import pytest

from swf_renderer_tpu.models import ast, sound, swf_binary
from swf_renderer_tpu.models.mp3 import (
    _HUFF, _QUAD_A, _TAB, decode_mp3, parse_frame_header,
)
from swf_renderer_tpu.runtime.audio import mix_movie_audio

FIXTURE = pathlib.Path(
    "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/"
    "house_lo.mp3")


def _oracle_pcm():
    pygame = pytest.importorskip("pygame")
    import os

    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    pygame.mixer.init(frequency=11025, size=-16, channels=1)
    try:
        raw = pygame.mixer.Sound(str(FIXTURE)).get_raw()
    finally:
        pygame.mixer.quit()
    return np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0


def test_tables_structurally_valid():
    # Band partitions tile the 576-line spectrum at every sample rate.
    for row in _TAB["bandinfo"]:
        assert row["longIdx"][0] == 0 and row["longIdx"][-1] == 576
        assert sum(row["longDiff"]) == 576
        assert 3 * sum(row["shortDiff"]) == 576
    # Every Huffman LUT decodes every possible prefix (complete codes):
    # zero-length entries would mean an unreachable bit pattern.
    for t, lut in _HUFF.items():
        if lut is None:
            continue
        assert (lut.ln > 0).all(), f"table {t} has holes"
    assert (_QUAD_A.ln > 0).all()


def test_header_parse():
    # MPEG-2.5 Layer III, 128 kbit/s, 11025 Hz, mono (the fixture's).
    hdr = bytes([0xFF, 0xE2, 0xC0, 0xC0])
    h = parse_frame_header(hdr + b"\x00" * 200, 0)
    assert h is not None
    assert (h.version, h.lsf, h.bitrate, h.samplerate, h.channels) == (
        0, True, 128, 11025, 1)
    assert h.frame_bytes == 72 * 128 * 1000 // 11025
    assert parse_frame_header(b"\x00\x00\x00\x00", 0) is None
    # reserved version / Layer I rejected
    assert parse_frame_header(bytes([0xFF, 0xEA, 0x90, 0xC0]), 0) is None


@pytest.mark.skipif(not FIXTURE.exists(), reason="fixture not present")
def test_decode_matches_mpg123_reference():
    ref = _oracle_pcm()
    pcm, rate = decode_mp3(FIXTURE.read_bytes())
    assert rate == 11025 and pcm.shape[1] == 1
    mine = pcm[:, 0].astype(np.float64)
    n = min(len(mine), len(ref))
    assert n >= len(ref) - 1152
    # Skip the first granule: reference decoders differ in synthesis
    # filter priming; everything after is numerically identical.
    a, b = mine[576:n], ref[576:n]
    rel = float(np.mean((a - b) ** 2) / np.mean(b ** 2))
    assert rel < 1e-6, rel


@pytest.mark.skipif(not FIXTURE.exists(), reason="fixture not present")
def test_define_sound_mp3_mixes():
    mp3 = FIXTURE.read_bytes()
    pcm_full, rate = decode_mp3(mp3)
    seek = 0
    payload = seek.to_bytes(2, "little") + mp3
    snd = sound.Sound(id=1, format=sound.FORMAT_MP3, rate=rate, bits=16,
                      channels=1, sample_count=pcm_full.shape[0],
                      data=payload)
    events = {0: [(1, sound.SoundInfo())]}
    data = swf_binary.emit_movie_timeline(
        frames=[[], []], sounds=(snd,), sound_events=events,
        stage_rect=ast.Rect(0, 2000, 0, 2000), frame_rate=10.0)
    movie = swf_binary.parse_movie(data)
    got = movie.sounds[1]
    assert got.format == sound.FORMAT_MP3 and got.data == payload
    mixed = mix_movie_audio(movie, rate=rate)
    n = pcm_full.shape[0]
    assert mixed.shape[0] >= n
    want = np.clip(np.repeat(pcm_full, 2, axis=1), -1, 1)
    assert np.abs(mixed[:n] - want).max() < 1e-6


@pytest.mark.skipif(not FIXTURE.exists(), reason="fixture not present")
def test_mp3_stream_blocks_share_reservoir():
    """SoundStreamBlock MP3 frames must decode as ONE stream: the bit
    reservoir crosses block boundaries, so per-block decode would lose
    every frame whose main data lives in the previous block."""
    mp3 = FIXTURE.read_bytes()
    # Split the raw frame sequence into two blocks mid-stream.
    from swf_renderer_tpu.models.mp3 import _skip_id3

    i = _skip_id3(mp3)
    frames = []
    while i + 4 <= len(mp3):
        h = parse_frame_header(mp3, i)
        if h is None:
            i += 1
            continue
        if i + h.frame_bytes > len(mp3):
            break
        frames.append(mp3[i: i + h.frame_bytes])
        i += h.frame_bytes
    assert len(frames) > 10
    half = len(frames) // 2
    spf = 576 * (len(frames) // 2)

    def block(frs, nsamples):
        return (nsamples.to_bytes(2, "little") + (0).to_bytes(2, "little")
                + b"".join(frs))

    stream = sound.SoundStream(format=sound.FORMAT_MP3, rate=11025,
                               bits=16, channels=1,
                               samples_per_frame=spf)
    stream.blocks[0] = block(frames[:half], 576 * half)
    stream.blocks[1] = block(frames[half:], 576 * (len(frames) - half))
    data = swf_binary.emit_movie_timeline(
        frames=[[], []], sound_stream=stream,
        stage_rect=ast.Rect(0, 2000, 0, 2000), frame_rate=10.0)
    movie = swf_binary.parse_movie(data)
    mixed = mix_movie_audio(movie, rate=11025)
    whole = decode_mp3(b"".join(frames))[0]
    n = whole.shape[0]
    assert mixed.shape[0] >= n
    want = np.clip(np.repeat(whole, 2, axis=1), -1, 1)
    assert np.abs(mixed[:n] - want).max() < 1e-6


def test_non_mp3_data_raises():
    with pytest.raises(ValueError):
        decode_mp3(b"\x00" * 1000)
    with pytest.raises(NotImplementedError):
        sound.decode_sound(6, b"\x00" * 16, 16, 1)  # Nellymoser refusal


def test_fuzzed_streams_never_crash():
    """Malformed input (random bytes, truncation, corruption) must
    decode to whatever prefix parses or raise ValueError — never an
    unhandled exception (framework robustness: real movies carry
    damaged audio)."""
    rng = np.random.default_rng(0)
    real = FIXTURE.read_bytes() if FIXTURE.exists() else b"\xff\xe2" * 600
    for trial in range(24):
        kind = trial % 3
        if kind == 0:
            buf = bytes(rng.integers(0, 256, 4000, dtype=np.uint8))
        elif kind == 1:
            buf = real[: int(rng.integers(100, len(real)))]
        else:
            b = bytearray(real[:20000])
            for _ in range(30):
                b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
            buf = bytes(b)
        try:
            pcm, rate = decode_mp3(buf)
            assert rate > 0 and pcm.ndim == 2
        except ValueError:
            pass


def test_stereo_ms_and_intensity_band_rules():
    """Joint-stereo band rules on synthetic spectra: MS below the
    intensity bound, intensity above it, and bands whose is_pos is the
    'intensity off' marker (7 for MPEG-1) fall back to MS — reference
    decoder behavior (libmad/minimp3)."""
    from swf_renderer_tpu.models.mp3 import (
        _TAB, FrameHeader, _Granule, _stereo,
    )

    h = FrameHeader(version=3, bitrate=128, samplerate=44100, padding=0,
                    channels=2, mode=1, mode_ext=3, crc=False,
                    frame_bytes=418, band_index=0, lsf=False)
    g = _Granule()
    li = _TAB["bandinfo"][0]["longIdx"]
    # Right channel nonzero through band 10; zero after.
    bound = li[10]
    xl = np.ones(576)
    xr = np.zeros(576)
    xr[:bound] = 0.5
    sf_r = np.zeros(22, np.int32)
    sf_r[12] = 3   # intensity position tan-ratio band
    sf_r[14] = 7   # 'intensity off' -> MS fallback
    l, r = _stereo(xl.copy(), xr.copy(), g, g, h, sf_r, None, 0)
    s = np.sqrt(0.5)
    # Below the bound: MS everywhere.
    np.testing.assert_allclose(l[:bound], (1.0 + 0.5) * s)
    np.testing.assert_allclose(r[:bound], (1.0 - 0.5) * s)
    # Band 12: intensity ratio tan(3*pi/12) splits the left signal.
    ratio = np.tan(3 * np.pi / 12.0)
    a, b = li[12], li[13]
    np.testing.assert_allclose(l[a:b], ratio / (1 + ratio))
    np.testing.assert_allclose(r[a:b], 1.0 / (1 + ratio))
    # Band 14 (is_pos 7): MS fallback — NOT left-unscaled/right-silent.
    a, b = li[14], li[15]
    np.testing.assert_allclose(l[a:b], 1.0 * s)
    np.testing.assert_allclose(r[a:b], 1.0 * s)
    # is_pos 0 means intensity hard-left: right copies nothing.
    sf_r2 = np.zeros(22, np.int32)
    l2, r2 = _stereo(xl.copy(), xr.copy(), g, g, h, sf_r2, None, 0)
    a, b = li[12], li[13]
    np.testing.assert_allclose(l2[a:b], 0.0)   # tan(0)/(1+tan(0)) = 0
    np.testing.assert_allclose(r2[a:b], 1.0)


MPEG2_FIXTURE = pathlib.Path(
    "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/"
    "test.mp3")


@pytest.mark.skipif(not MPEG2_FIXTURE.exists(), reason="fixture absent")
def test_mpeg2_lsf_stream_decodes():
    """MPEG-2 (22.05 kHz LSF) coverage: an ID3-prefixed silent stream
    decodes to the reference sample count and to silence (the mpg123
    reference decodes the same file to 25920 zero samples)."""
    pcm, rate = decode_mp3(MPEG2_FIXTURE.read_bytes())
    assert rate == 22050 and pcm.shape[1] == 1
    assert abs(pcm.shape[0] - 25920) <= 1152  # end-of-stream granule
    assert float(np.abs(pcm).max()) < 1e-4
