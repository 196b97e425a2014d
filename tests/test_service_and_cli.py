"""Renderer service (handle table + asset store), CLI, and capture server."""

import subprocess
import sys
import threading

import numpy as np
import pytest

from swf_renderer_tpu.models import ast, display
from swf_renderer_tpu.models.ast_io import parse_define_shape
from swf_renderer_tpu.runtime.service import RendererService, StoredShapeRef
from swf_renderer_tpu.utils.fixed import Sfixed16P16


def _triangle_tag(reference_tests):
    return parse_define_shape(
        (reference_tests / "flat-shapes" / "triangle" / "ast.json").read_text()
    )


def test_renderer_service_lifecycle(reference_tests):
    tag = _triangle_tag(reference_tests)
    service = RendererService()
    shape_id = service.assets.register_shape(tag)
    assert shape_id == 1
    handle = service.create_renderer(64, 48, use_pallas=False)
    assert len(service) == 1

    matrix = ast.Matrix(
        scale_x=Sfixed16P16.from_value(0.1),
        scale_y=Sfixed16P16.from_value(0.1),
        rotate_skew0=Sfixed16P16.from_value(0),
        rotate_skew1=Sfixed16P16.from_value(0),
        translate_x=-int(tag.bounds.x_min * 0.1),
        translate_y=-int(tag.bounds.y_min * 0.1),
    )
    frame = service.render_refs(
        handle, [StoredShapeRef(shape_id=shape_id, matrix=matrix)]
    )
    assert frame.shape == (48, 64, 4)
    assert frame[..., 3].sum() > 0  # something was drawn

    service.destroy_renderer(handle)
    assert len(service) == 0
    with pytest.raises(KeyError):
        service.render(handle, display.Stage(width=8, height=8))


def test_asset_store_decoded_cache(reference_tests):
    tag = _triangle_tag(reference_tests)
    service = RendererService()
    sid = service.assets.register_shape(tag)
    first = service.assets.decoded_shape(sid)
    assert service.assets.decoded_shape(sid) is first  # cached
    with pytest.raises(KeyError):
        service.assets.get_shape(999)


def test_cli_renders_png(reference_tests, tmp_path):
    out = tmp_path / "triangle.png"
    result = subprocess.run(
        [sys.executable, "-m", "swf_renderer_tpu",
         str(reference_tests / "flat-shapes" / "triangle" / "ast.json"),
         "-o", str(out), "--stats"],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": "/root/repo", "HOME": "/root"},
    )
    assert result.returncode == 0, result.stderr[-2000:]
    from swf_renderer_tpu.utils.png import read_png

    frame = read_png(out)
    assert frame.shape == (317, 502, 4)
    assert '"mpx_per_s"' in result.stderr


def test_capture_server_roundtrip(tmp_path):
    sys.path.insert(0, "/root/repo/tools")
    import capture_server
    from http.server import HTTPServer
    import urllib.request

    server = HTTPServer(("127.0.0.1", 0), capture_server.make_handler(tmp_path))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        # crossdomain.xml served
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/crossdomain.xml"
        ) as resp:
            assert b"cross-domain-policy" in resp.read()
        # post a 2x2 ARGB frame
        argb = bytes([255, 10, 20, 30] * 4)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/sample?width=2&height=2",
            data=argb, method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
        pam = (tmp_path / "sample.pam").read_bytes()
        assert pam.startswith(b"P7\nWIDTH 2\nHEIGHT 2\n")
        assert pam.endswith(bytes([10, 20, 30, 255] * 4))  # ARGB -> RGBA
        # bad request: wrong byte count
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/bad?width=4&height=4",
            data=argb, method="POST",
        )
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(req)
    finally:
        server.shutdown()


def test_frame_server_over_http(reference_tests):
    """The HTTP frame server (cross-language embedding + streaming frame
    loop): create/render/animate/destroy over a real socket."""
    import json
    import threading
    import urllib.request

    import numpy as np

    from tools.frame_server import FrameServer, Handler
    from swf_renderer_tpu.models import display
    from swf_renderer_tpu.models.ast_io import parse_define_shape
    from swf_renderer_tpu.utils.pam import pam_to_rgba
    from swf_renderer_tpu.utils.png import read_png

    server = FrameServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{port}"

    def post(path, body, raw=False):
        req = urllib.request.Request(base + path, data=body, method="POST")
        with urllib.request.urlopen(req) as resp:
            data = resp.read()
        return data if raw else json.loads(data)

    try:
        tri = (reference_tests / "flat-shapes" / "triangle"
               / "ast.json").read_text()
        stage = display.stage_for_shape(parse_define_shape(tri))
        handle = post("/renderer", json.dumps(
            {"width": stage.width, "height": stage.height}).encode())["handle"]

        png = post(f"/renderer/{handle}/render", tri.encode(), raw=True)
        frame = read_png(png)
        assert frame.shape == (stage.height, stage.width, 4)
        assert frame[..., 3].max() == 255

        morph = (reference_tests / "flat-morph-shapes" / "homestuck-beta-29"
                 / "ast.json").read_text()
        blob = post(f"/renderer/{handle}/animate?frames=4", morph.encode(),
                    raw=True)
        # Four concatenated PAM frames; parse the first and count headers.
        first = pam_to_rgba(blob)
        assert first.shape[2] == 4 and first[..., 3].max() > 0
        assert blob.count(b"P7\n") == 4

        # Static shapes animate as an on-device rotation transform sweep.
        blob2 = post(f"/renderer/{handle}/animate?frames=3", tri.encode(),
                     raw=True)
        spin = pam_to_rgba(blob2)
        assert spin.shape[2] == 4 and spin[..., 3].max() > 0
        assert blob2.count(b"P7\n") == 3

        # Bitmap-filled shapes animate too: the rotation sweep resolves
        # fills against the handle's registered bitmaps and bakes
        # per-frame field planes (hb4's shape references bitmap id 3 —
        # the bitmap corpus DefineBitmap).
        bmp = (reference_tests / "bitmap"
               / "homestuck-beta-3.ast.json").read_text()
        assert post(f"/renderer/{handle}/bitmap", bmp.encode())["ok"]
        tex = (reference_tests / "textured-shapes" / "homestuck-beta-4"
               / "ast.json").read_text()
        blob3 = post(f"/renderer/{handle}/animate?frames=2", tex.encode(),
                     raw=True)
        texspin = pam_to_rgba(blob3)
        assert texspin.shape[2] == 4 and texspin[..., 3].max() > 0
        assert blob3.count(b"P7\n") == 2

        req = urllib.request.Request(f"{base}/renderer/{handle}",
                                     method="DELETE")
        assert json.loads(urllib.request.urlopen(req).read())["ok"]
    finally:
        server.shutdown()


def test_service_animate_refs_transform_sweep(reference_tests):
    """The handle-table service animates retained refs; moving-matrix
    frames auto-route to the on-device transform sweep."""
    from swf_renderer_tpu.models import ast as ast_mod
    from swf_renderer_tpu.models.ast_io import parse_define_shape
    from swf_renderer_tpu.runtime.service import (
        RendererService, StoredShapeRef,
    )
    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    tri = parse_define_shape(
        (reference_tests / "flat-shapes" / "triangle" /
         "ast.json").read_text())
    svc = RendererService()
    sid = svc.assets.register_shape(tri)
    h = svc.create_renderer(48, 48)

    one = Sfixed16P16.from_value(1.0)
    zero = Sfixed16P16.from_value(0.0)
    frames = [
        [StoredShapeRef(shape_id=sid, matrix=ast_mod.Matrix(
            scale_x=one, scale_y=one, rotate_skew0=zero,
            rotate_skew1=zero, translate_x=40 * i, translate_y=0))]
        for i in range(3)
    ]
    out = svc.animate_refs(h, frames)
    assert out.shape == (3, 48, 48, 4)
    assert svc._get(h).last_stats.path == "transform-sweep"
    # Frames shift right by 2 px each.
    a0 = out[0, :, :, 3]
    a1 = out[1, :, :, 3]
    np.testing.assert_array_equal(a1[:, 2:], a0[:, :-2])
    svc.destroy_renderer(h)


def test_frame_server_stroked_morph_animate_keeps_strokes(reference_tests):
    """Stroked morphs must NOT stream the fills-only device sweep: the
    animate endpoint's frames must match full renders (fills + strokes)."""
    import json
    import threading
    import urllib.request

    from tools.frame_server import FrameServer, Handler
    from swf_renderer_tpu.models import display
    from swf_renderer_tpu.models.ast_io import parse_define_morph_shape
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from swf_renderer_tpu.utils.pam import pam_to_rgba

    morph_text = (reference_tests / "flat-morph-shapes" /
                  "homestuck-beta-29" / "ast.json").read_text()
    tag = parse_define_morph_shape(morph_text)
    stage = display.stage_for_morph_shape(tag, 0.0)

    server = FrameServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        req = urllib.request.Request(
            f"{base}/renderer",
            data=json.dumps({"width": stage.width,
                             "height": stage.height}).encode(),
            method="POST")
        handle = json.loads(urllib.request.urlopen(req).read())["handle"]
        req = urllib.request.Request(
            f"{base}/renderer/{handle}/animate?frames=2",
            data=morph_text.encode(), method="POST")
        blob = urllib.request.urlopen(req).read()
        first = pam_to_rgba(blob)
        want = TpuRenderer(stage.width, stage.height).render(stage)
        diff = np.abs(first.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1, diff.max()  # strokes present
    finally:
        server.shutdown()


def test_frame_server_timeline_endpoint(reference_tests):
    """Keyframed timeline over HTTP: per-frame matrices render through
    the auto-routed sweep; frames shift as specified."""
    import json
    import threading
    import urllib.request

    from tools.frame_server import FrameServer, Handler
    from swf_renderer_tpu.utils.pam import pam_to_rgba

    tri = json.loads((reference_tests / "flat-shapes" / "triangle" /
                      "ast.json").read_text())
    server = FrameServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        req = urllib.request.Request(
            f"{base}/renderer",
            data=json.dumps({"width": 48, "height": 48}).encode(),
            method="POST")
        handle = json.loads(urllib.request.urlopen(req).read())["handle"]
        # Scale the ~10000-twip triangle into the 48 px (960-twip) stage
        # and slide it right per frame.
        body = json.dumps({
            "tag": tri,
            "frames": [
                {"matrix": [0.08, 0, 0, 0.08,
                            -tri["bounds"]["x_min"] * 0.08 + 100 * i,
                            -tri["bounds"]["y_min"] * 0.08]}
                for i in range(3)
            ],
        }).encode()
        req = urllib.request.Request(
            f"{base}/renderer/{handle}/timeline", data=body,
            method="POST")
        blob = urllib.request.urlopen(req).read()
        assert blob.count(b"P7\n") == 3
        first = pam_to_rgba(blob)
        assert first.shape == (48, 48, 4) and first[..., 3].max() > 0
    finally:
        server.shutdown()


def test_frame_server_movie_endpoint(reference_tests):
    """POST /movie renders a whole .swf over HTTP — first frame as PNG,
    full timeline as consecutive PAM frames (?timeline=1)."""
    import json
    import threading
    import urllib.request

    from tools.frame_server import FrameServer, Handler
    from swf_renderer_tpu.models import ast as ast_model
    from swf_renderer_tpu.models import swf_binary
    from swf_renderer_tpu.models.ast_io import parse_define_shape
    from swf_renderer_tpu.utils.fixed import Sfixed16P16
    from swf_renderer_tpu.utils.pam import pam_to_rgba
    from swf_renderer_tpu.utils.png import read_png

    tag = parse_define_shape(json.loads(
        (reference_tests / "flat-shapes" / "triangle"
         / "ast.json").read_text()))

    def tr(tx, ty):
        return ast_model.Matrix(
            Sfixed16P16.from_value(1), Sfixed16P16.from_value(1),
            Sfixed16P16.from_value(0), Sfixed16P16.from_value(0), tx, ty)

    base_m = tr(-tag.bounds.x_min, -tag.bounds.y_min)
    span = ast_model.Rect(0, tag.bounds.x_max - tag.bounds.x_min,
                          0, tag.bounds.y_max - tag.bounds.y_min)
    movie = swf_binary.emit_movie([tag], shape_matrices=[base_m],
                                  stage_rect=span)
    anim = swf_binary.emit_movie_timeline(
        [[swf_binary.Placement(depth=1, character_id=tag.id,
                               matrix=base_m)],
         [swf_binary.Placement(depth=1, move=True,
                               matrix=tr(base_m.translate_x + 200,
                                         base_m.translate_y))]],
        shapes=[tag], stage_rect=span)

    server = FrameServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(path, body):
        req = urllib.request.Request(base + path, data=body, method="POST")
        with urllib.request.urlopen(req) as resp:
            return resp.read()

    try:
        frame = read_png(post("/movie", movie))
        h = -(-(span.y_max) // 20)
        w = -(-(span.x_max) // 20)
        assert frame.shape == (h, w, 4)
        assert frame[..., 3].max() == 255

        blob = post("/movie?timeline=1", anim)
        assert blob.count(b"P7\n") == 2
        first = pam_to_rgba(blob)
        assert first.shape == (h, w, 4)
    finally:
        server.shutdown()


def test_cli_renders_movie_timeline(reference_tests, tmp_path):
    """The CLI plays a .swf timeline to numbered PNGs (--frames DIR)."""
    import json as json_mod

    from swf_renderer_tpu.models import ast as ast_model
    from swf_renderer_tpu.models import swf_binary
    from swf_renderer_tpu.models.ast_io import parse_define_shape
    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    tag = parse_define_shape(json_mod.loads(
        (reference_tests / "flat-shapes" / "triangle"
         / "ast.json").read_text()))

    def tr(tx, ty):
        return ast_model.Matrix(
            Sfixed16P16.from_value(1), Sfixed16P16.from_value(1),
            Sfixed16P16.from_value(0), Sfixed16P16.from_value(0), tx, ty)

    base_m = tr(-tag.bounds.x_min, -tag.bounds.y_min)
    movie = swf_binary.emit_movie_timeline(
        [[swf_binary.Placement(depth=1, character_id=tag.id,
                               matrix=base_m)],
         [swf_binary.Placement(depth=1, move=True,
                               matrix=tr(base_m.translate_x + 100,
                                         base_m.translate_y))],
         [swf_binary.RemoveObject(depth=1)]],
        shapes=[tag],
        stage_rect=ast_model.Rect(0, tag.bounds.x_max - tag.bounds.x_min,
                                  0, tag.bounds.y_max - tag.bounds.y_min))
    swf = tmp_path / "anim.swf"
    swf.write_bytes(movie)
    out_dir = tmp_path / "frames"
    result = subprocess.run(
        [sys.executable, "-m", "swf_renderer_tpu", str(swf),
         "--frames", str(out_dir), "--stats"],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": "/root/repo", "HOME": "/root"},
    )
    assert result.returncode == 0, result.stderr[-2000:]
    from swf_renderer_tpu.utils.png import read_png

    names = sorted(p.name for p in out_dir.iterdir())
    assert names == ["0000.png", "0001.png", "0002.png"]
    f0 = read_png(out_dir / "0000.png")
    f1 = read_png(out_dir / "0001.png")
    assert f0.shape == (317, 502, 4)
    assert (f0 != f1).any()
    assert '"frames": 3' in result.stderr


def test_cli_rejects_scale_for_movies(tmp_path):
    from swf_renderer_tpu import __main__ as cli
    from swf_renderer_tpu.models import ast as ast_model
    from swf_renderer_tpu.models import swf_binary

    swf = tmp_path / "empty.swf"
    swf.write_bytes(swf_binary.emit_movie(
        [], stage_rect=ast_model.Rect(0, 200, 0, 200)))
    with pytest.raises(SystemExit):
        cli.main([str(swf), "--scale", "2"])
    with pytest.raises(SystemExit):
        cli.main(["whatever.json", "--frames", str(tmp_path)])


def test_frame_server_movie_bitmaps_do_not_leak(reference_tests):
    """A movie that references a bitmap id it never defines must error,
    even right after another movie DID define that id — per-request
    renderers keep bitmap state isolated."""
    import json
    import threading
    import urllib.request

    from tools.frame_server import FrameServer, Handler
    from swf_renderer_tpu.models import ast as ast_model
    from swf_renderer_tpu.models import swf_binary
    from swf_renderer_tpu.models.ast_io import (
        parse_define_bitmap, parse_define_shape,
    )
    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    bitmap = parse_define_bitmap(
        (reference_tests / "bitmap" / "homestuck-beta-3.ast.json")
        .read_text())
    tag = parse_define_shape(json.loads(
        (reference_tests / "textured-shapes" / "homestuck-beta-4"
         / "ast.json").read_text()))
    m = ast_model.Matrix(
        Sfixed16P16.from_value(1), Sfixed16P16.from_value(1),
        Sfixed16P16.from_value(0), Sfixed16P16.from_value(0),
        -tag.bounds.x_min, -tag.bounds.y_min)
    rect = ast_model.Rect(0, tag.bounds.x_max - tag.bounds.x_min,
                          0, tag.bounds.y_max - tag.bounds.y_min)
    with_bmp = swf_binary.emit_movie(
        [tag], bitmaps=[bitmap], shape_matrices=[m], stage_rect=rect)
    without_bmp = swf_binary.emit_movie(
        [tag], shape_matrices=[m], stage_rect=rect)

    server = FrameServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(path, body):
        req = urllib.request.Request(base + path, data=body, method="POST")
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as exc:
            return exc.code, exc.read()

    try:
        status, _ = post("/movie", with_bmp)
        assert status == 200
        status, body = post("/movie", without_bmp)
        assert status == 400, (status, body[:200])
    finally:
        server.shutdown()
