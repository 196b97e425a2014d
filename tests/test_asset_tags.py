"""Asset/metadata long-tail tags: ExportAssets, ImportAssets/2,
Metadata, DefineSceneAndFrameLabelData, DefineFontName."""

import struct

from swf_renderer_tpu.models import ast, swf_binary


def test_export_and_metadata_round_trip():
    data = swf_binary.emit_movie_timeline(
        frames=[[]], exports={"hero": 7, "logo": 9},
        metadata="<rdf:RDF>test</rdf:RDF>",
        stage_rect=ast.Rect(0, 2000, 0, 2000))
    movie = swf_binary.parse_movie(data)
    assert movie.exported == {"hero": 7, "logo": 9}
    assert movie.metadata == "<rdf:RDF>test</rdf:RDF>"


def test_import_assets_parse():
    body = (b"http://example.com/lib.swf\x00"
            + struct.pack("<H", 2)
            + struct.pack("<H", 3) + b"a\x00"
            + struct.pack("<H", 4) + b"b\x00")
    got = swf_binary.parse_import_assets_tag(body)
    assert got == {"a": ("http://example.com/lib.swf", 3),
                   "b": ("http://example.com/lib.swf", 4)}
    body2 = (b"u\x00" + b"\x01\x00" + struct.pack("<H", 1)
             + struct.pack("<H", 5) + b"c\x00")
    assert swf_binary.parse_import_assets_tag(body2, assets2=True) == {
        "c": ("u", 5)}


def test_scene_frame_label_parse():
    # EncodedU32 varints: 2 scenes, 1 label (label 300 needs 2 bytes).
    body = (b"\x02"
            + b"\x00" + b"intro\x00"
            + b"\x0a" + b"main\x00"
            + b"\x01"
            + b"\xac\x02" + b"finale\x00")
    scenes, labels = swf_binary.parse_scene_frame_label_tag(body)
    assert scenes == ((0, "intro"), (10, "main"))
    assert labels == {300: "finale"}


def test_define_font_name_in_movie():
    raw = swf_binary._tag(swf_binary.TAG_DEFINE_FONT_NAME,
                          struct.pack("<H", 12) + b"Display\x00(c)\x00")
    base = swf_binary.emit_movie_timeline(
        frames=[[]], stage_rect=ast.Rect(0, 2000, 0, 2000))
    # Splice the tag just before the End tag (last two bytes).
    data = base[:-2] + raw + base[-2:]
    movie = swf_binary.parse_movie(data)
    assert movie.font_names[12] == ("Display", "(c)")
