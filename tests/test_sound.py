"""Sound subsystem tests: codecs, wire tags, the timeline mixer, WAV.

models.sound decodes format 0/3 (uncompressed) exactly and round-trips
its own SWF-ADPCM encoder within the quantizer envelope; swf_binary
carries DefineSound/StartSound/SoundStreamHead/Block both ways; and
runtime.audio mixes events + stream into the float track utils.wav
serializes.  Framework extension (the reference has no audio path).
"""

import numpy as np

from swf_renderer_tpu.models import ast, sound, swf_binary
from swf_renderer_tpu.runtime.audio import mix_movie_audio
from swf_renderer_tpu.utils.wav import read_wav, wav_bytes


def _sine(n, freq=440.0, rate=11025, amp=0.5):
    t = np.arange(n) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)[:, None]


def test_adpcm_round_trip_quality():
    pcm = np.concatenate([_sine(9000), _sine(9000, 997, amp=0.3)], axis=1)
    back = sound.decode_adpcm(sound.encode_adpcm(pcm), 2)
    assert back.shape == pcm.shape
    rms = float(np.sqrt(np.mean((back - pcm) ** 2)))
    assert rms < 0.03, rms
    # 4-bit codes: ~1 byte per stereo sample pair plus block headers.
    assert len(sound.encode_adpcm(pcm)) < pcm.size * 0.6


def test_uncompressed_round_trip():
    pcm = _sine(1000)
    b16 = sound.decode_uncompressed(sound.encode_uncompressed(pcm, 16),
                                    16, 1)
    assert np.abs(b16 - pcm).max() < 1 / 32000
    b8 = sound.decode_uncompressed(sound.encode_uncompressed(pcm, 8),
                                   8, 1)
    assert np.abs(b8 - pcm).max() < 1 / 120


def test_define_sound_wire_round_trip():
    pcm = _sine(800)
    snd = sound.Sound(id=3, format=sound.FORMAT_ADPCM, rate=11025,
                      bits=16, channels=1, sample_count=800,
                      data=sound.encode_adpcm(pcm))
    events = {0: [(3, sound.SoundInfo())],
              2: [(3, sound.SoundInfo(loops=3, in_point=100,
                                      out_point=700))],
              3: [(3, sound.SoundInfo(stop=True))]}
    data = swf_binary.emit_movie_timeline(
        frames=[[], [], [], []], sounds=(snd,), sound_events=events,
        stage_rect=ast.Rect(0, 2000, 0, 2000), frame_rate=10.0)
    movie = swf_binary.parse_movie(data)
    got = movie.sounds[3]
    assert (got.format, got.rate, got.bits, got.channels,
            got.sample_count) == (1, 11025, 16, 1, 800)
    assert got.data == snd.data
    assert movie.sound_events[2][0][1] == sound.SoundInfo(
        loops=3, in_point=100, out_point=700)
    assert movie.sound_events[3][0][1].stop


def test_stream_wire_round_trip():
    stream = sound.SoundStream(format=sound.FORMAT_UNCOMPRESSED_LE,
                               rate=11025, bits=16, channels=1,
                               samples_per_frame=1102)
    stream.blocks[0] = sound.encode_uncompressed(_sine(1102), 16)
    stream.blocks[1] = sound.encode_uncompressed(_sine(1102, 880), 16)
    data = swf_binary.emit_movie_timeline(
        frames=[[], []], sound_stream=stream,
        stage_rect=ast.Rect(0, 2000, 0, 2000), frame_rate=10.0)
    movie = swf_binary.parse_movie(data)
    got = movie.sound_stream
    assert (got.format, got.rate, got.bits, got.channels,
            got.samples_per_frame) == (3, 11025, 16, 1, 1102)
    assert got.blocks.keys() == {0, 1}
    assert got.blocks[0] == stream.blocks[0]


def test_mixer_places_events_and_stream():
    rate = 11025
    pcm = _sine(500)
    snd = sound.Sound(id=1, format=sound.FORMAT_UNCOMPRESSED_LE,
                      rate=rate, bits=16, channels=1, sample_count=500,
                      data=sound.encode_uncompressed(pcm, 16))
    stream = sound.SoundStream(format=sound.FORMAT_UNCOMPRESSED_LE,
                               rate=rate, bits=16, channels=1,
                               samples_per_frame=1102)
    sblock = _sine(1102, 660, amp=0.2)
    stream.blocks[1] = sound.encode_uncompressed(sblock, 16)
    events = {0: [(1, sound.SoundInfo())], 2: [(1, sound.SoundInfo())]}
    data = swf_binary.emit_movie_timeline(
        frames=[[], [], [], []], sounds=(snd,), sound_events=events,
        sound_stream=stream, stage_rect=ast.Rect(0, 2000, 0, 2000),
        frame_rate=10.0)
    movie = swf_binary.parse_movie(data)
    mixed = mix_movie_audio(movie, rate=rate)
    spf = rate / 10.0
    want = np.zeros_like(mixed)
    mono = sound.decode_uncompressed(snd.data, 16, 1)
    for f in (0, 2):
        s0 = int(round(f * spf))
        want[s0:s0 + 500] += np.repeat(mono, 2, axis=1)
    s1 = int(round(1 * spf))
    want[s1:s1 + 1102] += np.repeat(
        sound.decode_uncompressed(stream.blocks[1], 16, 1), 2, axis=1)
    assert mixed.shape[0] >= int(np.ceil(4 * spf))
    assert np.abs(mixed - np.clip(want, -1, 1)).max() < 1e-6


def test_mixer_stop_truncates():
    rate = 11025
    snd = sound.Sound(id=1, format=sound.FORMAT_UNCOMPRESSED_LE,
                      rate=rate, bits=16, channels=1, sample_count=9000,
                      data=sound.encode_uncompressed(_sine(9000), 16))
    events = {0: [(1, sound.SoundInfo())],
              1: [(1, sound.SoundInfo(stop=True))]}
    data = swf_binary.emit_movie_timeline(
        frames=[[], [], []], sounds=(snd,), sound_events=events,
        stage_rect=ast.Rect(0, 2000, 0, 2000), frame_rate=10.0)
    mixed = mix_movie_audio(swf_binary.parse_movie(data), rate=rate)
    cut = int(round(rate / 10.0))
    assert np.abs(mixed[:cut]).max() > 0.1
    assert np.abs(mixed[cut:]).max() == 0.0


def test_decode_sound_trims_to_sample_count():
    # ADPCM byte-alignment padding would otherwise decode as spurious
    # trailing samples (mono 4-bit: one per block tail).
    pcm = _sine(800)
    data = sound.encode_adpcm(pcm)
    assert sound.decode_adpcm(data, 1).shape[0] > 800
    assert sound.decode_sound(sound.FORMAT_ADPCM, data, 16, 1,
                              sample_count=800).shape[0] == 800


def test_stream_head_tag_selection():
    # Tag 18 only admits ADPCM/MP3; uncompressed streams auto-emit
    # SoundStreamHead2 (tag 45).
    def tag_code(raw):
        import struct as _s

        return _s.unpack_from("<H", raw, 0)[0] >> 6

    un = sound.SoundStream(format=sound.FORMAT_UNCOMPRESSED_LE,
                           rate=11025, bits=16, channels=1,
                           samples_per_frame=1102)
    ad = sound.SoundStream(format=sound.FORMAT_ADPCM, rate=11025,
                           bits=16, channels=1, samples_per_frame=1102)
    assert tag_code(swf_binary.emit_sound_stream_head(un)) == 45
    assert tag_code(swf_binary.emit_sound_stream_head(ad)) == 18


def test_frame_server_audio_endpoint():
    """POST /movie?audio=1 serves the mixed track as a WAV."""
    import threading
    import urllib.request

    from tools.frame_server import FrameServer, Handler

    snd = sound.Sound(id=1, format=sound.FORMAT_UNCOMPRESSED_LE,
                      rate=11025, bits=16, channels=1, sample_count=500,
                      data=sound.encode_uncompressed(_sine(500), 16))
    data = swf_binary.emit_movie_timeline(
        frames=[[]], sounds=(snd,),
        sound_events={0: [(1, sound.SoundInfo())]},
        stage_rect=ast.Rect(0, 2000, 0, 2000), frame_rate=10.0)
    server = FrameServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/movie?audio=1", data=data,
            method="POST")
        with urllib.request.urlopen(req) as resp:
            body = resp.read()
            assert resp.headers["Content-Type"] == "audio/wav"
        pcm, rate = read_wav(body)
        assert rate == 44100
        assert pcm.shape[1] == 2 and np.abs(pcm).max() > 0.1
    finally:
        server.shutdown()


def test_wav_round_trip():
    pcm = np.concatenate([_sine(300), _sine(300, 880)], axis=1)
    back, rate = read_wav(wav_bytes(pcm, 22050))
    assert rate == 22050
    assert back.shape == pcm.shape
    assert np.abs(back - pcm).max() < 1 / 32000


def test_define_button_sound_round_trip_and_playback():
    """DefineButtonSound (tag 17): per state-transition sound triggers
    round-trip the wire and resolve to decoded PCM via
    button_transition_pcm (SOUNDINFO applied)."""
    from swf_renderer_tpu.models.swf_binary import (
        BUTTON_SOUND_TRANSITIONS, Button, ButtonRecord,
    )
    from swf_renderer_tpu.runtime.audio import button_transition_pcm
    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    one = Sfixed16P16.from_value(1)
    zero = Sfixed16P16.from_value(0)
    ident = ast.Matrix(scale_x=one, scale_y=one, rotate_skew0=zero,
                       rotate_skew1=zero, translate_x=0, translate_y=0)
    pcm = _sine(600)
    snd = sound.Sound(id=4, format=sound.FORMAT_UNCOMPRESSED_LE,
                      rate=11025, bits=16, channels=1, sample_count=600,
                      data=sound.encode_uncompressed(pcm, 16))
    button = Button(id=9, records=(
        ButtonRecord(character_id=4, depth=1, matrix=ident,
                     states=0x01),))
    slots = (None,
             (4, sound.SoundInfo(loops=2)),
             (4, sound.SoundInfo(in_point=100, out_point=400)),
             (4, sound.SoundInfo(stop=True)))
    data = swf_binary.emit_movie_timeline(
        frames=[[]], sounds=(snd,), buttons=(button,),
        button_sounds={9: slots},
        stage_rect=ast.Rect(0, 2000, 0, 2000), frame_rate=10.0)
    movie = swf_binary.parse_movie(data)
    got = movie.button_sounds[9]
    assert got[0] is None
    assert got[1] == (4, sound.SoundInfo(loops=2))
    assert got[2] == (4, sound.SoundInfo(in_point=100, out_point=400))
    assert got[3][1].stop

    assert button_transition_pcm(movie, 9, "over_up_to_idle") is None
    mono = sound.decode_uncompressed(snd.data, 16, 1)
    enter = button_transition_pcm(movie, 9, "idle_to_over_up",
                                  rate=11025)
    np.testing.assert_allclose(
        enter, np.tile(np.repeat(mono, 2, axis=1), (2, 1)), atol=1e-6)
    down = button_transition_pcm(movie, 9, "over_up_to_over_down",
                                 rate=11025)
    np.testing.assert_allclose(
        down, np.repeat(mono[100:400], 2, axis=1), atol=1e-6)
    up = button_transition_pcm(movie, 9, "over_down_to_over_up")
    assert up.shape == (0, 2)
    assert button_transition_pcm(movie, 1, "idle_to_over_up") is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown button transition"):
        button_transition_pcm(movie, 9, "hover")


def test_sprite_local_sound_stream_round_trip_and_mix():
    """A DefineSprite carrying its own SoundStreamHead + blocks (round
    5): the wire round-trips, and the mixer schedules the sprite's
    stream from the frame its instance is PLACED."""
    rate = 11025
    stream = sound.SoundStream(format=sound.FORMAT_UNCOMPRESSED_LE,
                               rate=rate, bits=16, channels=1,
                               samples_per_frame=1102)
    tone = _sine(1102, 660, amp=0.3)
    stream.blocks[0] = sound.encode_uncompressed(tone, 16)
    sprite = (7, [[], []], stream)
    # The sprite instance appears on MAIN frame 2.
    frames = [[], [],
              [swf_binary.Placement(depth=1, character_id=7)], []]
    data = swf_binary.emit_movie_timeline(
        frames, sprites=[sprite],
        stage_rect=ast.Rect(0, 2000, 0, 2000), frame_rate=10.0)
    movie = swf_binary.parse_movie(data)
    got = movie.sprites[7].sound_stream
    assert got is not None and got.blocks.keys() == {0}
    assert got.blocks[0] == stream.blocks[0]

    mixed = mix_movie_audio(movie, rate=rate)
    spf = rate / 10.0
    s0 = int(round(2 * spf))
    want = np.zeros_like(mixed)
    decoded = sound.decode_uncompressed(stream.blocks[0], 16, 1)
    want[s0:s0 + 1102] += np.repeat(decoded, 2, axis=1)
    assert np.abs(mixed - np.clip(want, -1, 1)).max() < 1e-6
    # Nothing plays before the instance appears.
    assert np.abs(mixed[:s0]).max() == 0.0
