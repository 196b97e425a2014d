"""HTTP frame server: cross-language embedding + continuous frame serving.

The reference sketched two embedding surfaces it never finished: the wasm
handle API (createRenderer/render/destroyRenderer,
/root/reference/rs/src/wasm.rs:61-98 — renders a hardcoded magenta stage)
and a windowed swapchain loop that draws nothing
(/root/reference/rs/src/gfx_renderer.rs:226-336).  This server is the
working analog of both: any language drives renderers over HTTP by handle,
and the animate endpoint is the continuous frame-producing loop — a morph
sweep rendered fully on device (ops.morph.render_morph_sweep) and streamed
as consecutive PAM frames.

Protocol (JSON in, PNG/PAM out):
  POST   /renderer                {"width": W, "height": H, ...kwargs}
                                  -> {"handle": id}
  POST   /renderer/<h>/bitmap     body = DefineBitmap ast.json
  POST   /renderer/<h>/render     body = DefineShape/DefineMorphShape
                                  ast.json (?ratio= for morphs,
                                  ?format=png|pam) -> image bytes
  POST   /renderer/<h>/animate    body = DefineMorphShape ast.json (morph
                                  ratio sweep) or DefineShape ast.json
                                  (full-rotation transform sweep);
                                  (?frames=N) -> N concatenated PAM frames
                                  (streamed; Content-Type
                                  application/x-portable-arbitrarymap)
  POST   /renderer/<h>/timeline   body = {"tag": <DefineShape or
                                  DefineMorphShape ast.json object>,
                                  "frames": [{"matrix": [a,b,c,d,tx,ty]
                                  (twips affine, optional), "ratio": r
                                  (morphs, optional)}, ...]}
                                  -> len(frames) concatenated PAM frames;
                                  moving-matrix / shared-ratio timelines
                                  render fully on device
                                  (TpuRenderer.render_batch auto-routing)
  DELETE /renderer/<h>            -> {"ok": true}

Run: python tools/frame_server.py [port]
"""

from __future__ import annotations

import io
import json
import pathlib
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from swf_renderer_tpu.models import ast, display
from swf_renderer_tpu.models.ast_io import parse_tag
from swf_renderer_tpu.runtime.service import RendererService
from swf_renderer_tpu.utils.pam import rgba_to_pam
from swf_renderer_tpu.utils.png import encode_png


class FrameServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self, addr, handler):
        super().__init__(addr, handler)
        self.service = RendererService()
        self._fallback_renderers = {}
        self._fallback_lock = threading.Lock()

    def fallback_renderer(self, width: int, height: int):
        """Per-(w, h) renderer for animate requests whose stage size
        differs from the handle's — cached so repeated animates keep warm
        draw-list/packed-scene caches."""
        from swf_renderer_tpu.runtime.renderer import TpuRenderer

        with self._fallback_lock:
            key = (width, height)
            r = self._fallback_renderers.pop(key, None)
            if r is None:
                r = TpuRenderer(width, height)
            # Re-insert on every hit: dicts are insertion-ordered, so
            # popping the FIRST key below evicts the least recently USED
            # renderer, not merely the oldest-created one.
            self._fallback_renderers[key] = r
            while len(self._fallback_renderers) > 8:
                self._fallback_renderers.pop(
                    next(iter(self._fallback_renderers)))
            return r


class Handler(BaseHTTPRequestHandler):
    def _json(self, code: int, payload) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _bytes(self, body: bytes, content_type: str) -> None:
        self.send_response(200)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> bytes:
        length = int(self.headers.get("Content-Length", "0"))
        return self.rfile.read(length)

    def _route(self):
        path, _, query = self.path.partition("?")
        params = {}
        for part in query.split("&"):
            if "=" in part:
                k, _, v = part.partition("=")
                params[k] = v
        return path.strip("/").split("/"), params

    def do_POST(self):  # noqa: N802 (http.server API)
        try:
            parts, params = self._route()
            service = self.server.service
            if parts == ["renderer"]:
                spec = json.loads(self._body() or b"{}")
                handle = service.create_renderer(
                    int(spec.pop("width")), int(spec.pop("height")), **spec)
                return self._json(200, {"handle": handle})
            if parts == ["movie"]:
                return self._movie(params)
            if len(parts) == 3 and parts[0] == "renderer":
                handle = int(parts[1])
                if parts[2] == "bitmap":
                    tag = parse_tag(self._body().decode())
                    service.add_bitmap(handle, tag)
                    return self._json(200, {"ok": True})
                if parts[2] == "render":
                    return self._render(service, handle, params)
                if parts[2] == "animate":
                    return self._animate(service, handle, params)
                if parts[2] == "timeline":
                    return self._timeline(service, handle)
            self._json(404, {"error": f"unknown route {self.path}"})
        except Exception as exc:  # noqa: BLE001 — serve errors as JSON
            self._json(400, {"error": f"{type(exc).__name__}: {exc}"})

    def _movie(self, params):
        """POST a whole .swf (FWS or zlib CWS): the first frame comes
        back as PNG/PAM, the full timeline as consecutive PAM frames
        under ?timeline=1 (played through render_batch, so moving-matrix
        movies auto-route to the on-device sweep), or the mixed audio
        track as a WAV under ?audio=1.  The renderer is server-cached
        per raster size, so repeat posts keep warm compiled-scene
        caches."""
        from swf_renderer_tpu.runtime.movie import (
            load_movie_stage, load_movie_timeline,
        )

        from swf_renderer_tpu.runtime.renderer import TpuRenderer

        def renderer_for(width, height, bitmaps):
            # Movies that carry bitmaps get a FRESH renderer: pouring
            # their character ids into the shared per-size cache would
            # cross-contaminate concurrent posts (corpus-style movies
            # all number bitmaps from 1) and mask dangling references
            # with a previous request's stale texture.
            if bitmaps:
                renderer = TpuRenderer(width, height)
            else:
                renderer = self.server.fallback_renderer(width, height)
            for bmp in bitmaps:
                renderer.add_bitmap(bmp)
            return renderer

        data = self._body()
        if params.get("audio") in ("1", "true"):
            # The movie's mixed audio track (StartSound events + the
            # sound stream) as a 16-bit WAV.
            from swf_renderer_tpu.models.swf_binary import parse_movie
            from swf_renderer_tpu.runtime.audio import mix_movie_audio
            from swf_renderer_tpu.utils.wav import wav_bytes

            pcm = mix_movie_audio(parse_movie(data))
            return self._bytes(wav_bytes(pcm), "audio/wav")
        # ?button_state=up|over|down|hit selects which records button
        # characters draw (the loader threads it through sprites and
        # masks too) — switching states reuses the same compiled-scene
        # caches, the interactive path's zero-recompile property.
        button_state = params.get("button_state", "up")
        if params.get("timeline") in ("1", "true"):
            stages, bitmaps = load_movie_timeline(
                data, button_state=button_state)
            if not stages:
                raise ValueError("movie has no frames")
            renderer = renderer_for(stages[0].width, stages[0].height,
                                    bitmaps)
            frames = renderer.render_batch(stages)
            buf = io.BytesIO()
            for frame in frames:
                buf.write(rgba_to_pam(frame))
            return self._bytes(buf.getvalue(),
                               "application/x-portable-arbitrarymap")
        stage, bitmaps = load_movie_stage(data, button_state=button_state)
        renderer = renderer_for(stage.width, stage.height, bitmaps)
        frame = renderer.render(stage)
        if params.get("format", "png") == "pam":
            return self._bytes(rgba_to_pam(frame),
                               "application/x-portable-arbitrarymap")
        return self._bytes(encode_png(frame), "image/png")

    def _render(self, service, handle, params):
        tag = parse_tag(self._body().decode())
        if isinstance(tag, ast.DefineShape):
            stage = display.stage_for_shape(tag)
        elif isinstance(tag, ast.DefineMorphShape):
            stage = display.stage_for_morph_shape(
                tag, float(params.get("ratio", "0")))
        else:
            raise ValueError(f"cannot render tag {type(tag).__name__}")
        frame = service.render(handle, stage)
        if params.get("format", "png") == "pam":
            return self._bytes(rgba_to_pam(frame),
                               "application/x-portable-arbitrarymap")
        return self._bytes(encode_png(frame), "image/png")

    def _animate(self, service, handle, params):
        """The continuous frame loop: an on-device sweep streamed as
        consecutive PAM frames — a morph ratio sweep for DefineMorphShape
        bodies, a full-rotation transform sweep for DefineShape bodies
        (both O(1) host work in the frame count)."""
        import jax.numpy as jnp

        from swf_renderer_tpu.models.decode_morph_shape import (
            decode_morph_shape,
        )
        from swf_renderer_tpu.models.geometry import Affine, TWIPS_PER_PX
        from swf_renderer_tpu.models.morph_geometry import (
            morph_fill_edge_pairs,
        )
        from swf_renderer_tpu.ops.morph import (
            morph_frames_to_u8, morph_pieces, render_morph_sweep,
        )

        tag = parse_tag(self._body().decode())
        if isinstance(tag, ast.DefineShape):
            return self._animate_rotation(tag, params, service, handle)
        if not isinstance(tag, ast.DefineMorphShape):
            raise ValueError("animate requires a DefineMorphShape or"
                             " DefineShape")
        n = int(params.get("frames", "16"))
        stage = display.stage_for_morph_shape(tag, 0.0)
        ratios = np.linspace(0.0, 1.0, n, dtype=np.float32)
        decoded = decode_morph_shape(tag)
        if any(p.line is not None for p in decoded.paths):
            # Stroked morphs: stroke OUTLINES are not linear in the ratio,
            # so the O(1) device sweep (fills only) would silently drop
            # them.  Render the ratio sequence through the fused batched
            # pipeline instead (per-ratio host lowering, device-fused
            # rasterization — still one kernel launch for the batch).
            import dataclasses

            stages = [
                dataclasses.replace(stage, children=(
                    dataclasses.replace(stage.children[0],
                                        ratio=float(r)),))
                for r in ratios
            ]
            if service.renderer_size(handle) == (stage.width,
                                                 stage.height):
                frames = service.render_batch(handle, stages)
            else:
                # Handle sized differently from the morph stage: use a
                # per-(w, h) fallback renderer CACHED on the server so
                # repeated animates keep warm draw/packed caches.
                frames = self.server.fallback_renderer(
                    stage.width, stage.height).render_batch(stages)
        else:
            ctm = Affine.scaling(1 / TWIPS_PER_PX, 1 / TWIPS_PER_PX).then(
                Affine.from_swf_matrix(stage.children[0].matrix))
            parts = morph_pieces(morph_fill_edge_pairs(decoded, ctm))
            out = render_morph_sweep(
                jnp.asarray(ratios), *(jnp.asarray(x) for x in parts),
                stage.height, stage.width)
            frames = morph_frames_to_u8(out, stage.height, stage.width)
        buf = io.BytesIO()
        for frame in frames:
            buf.write(rgba_to_pam(frame))
        return self._bytes(buf.getvalue(),
                           "application/x-portable-arbitrarymap")

    def _animate_rotation(self, tag, params, service=None, handle=None):
        """Transform-animation loop: one full rotation of the shape about
        the stage center, rasterized fully on device
        (runtime.renderer.render_shape_animation).  Bitmap fills resolve
        against the handle's registered bitmaps (POST /renderer/<h>/bitmap)
        and animate via per-frame field planes."""
        from swf_renderer_tpu.models.geometry import Affine, TWIPS_PER_PX
        from swf_renderer_tpu.runtime.renderer import render_shape_animation

        n = int(params.get("frames", "16"))
        stage = display.stage_for_shape(tag)
        base = stage.children[0].matrix
        b_aff = (Affine.from_swf_matrix(base) if base is not None
                 else Affine.identity())
        cx = stage.width / 2.0 * TWIPS_PER_PX
        cy = stage.height / 2.0 * TWIPS_PER_PX
        s = Affine.scaling(1.0 / TWIPS_PER_PX, 1.0 / TWIPS_PER_PX)
        s_inv = Affine.scaling(TWIPS_PER_PX, TWIPS_PER_PX)
        mats = []
        for i in range(n):
            th = 2 * np.pi * i / n
            ca, sa = np.cos(th), np.sin(th)
            # Rotation about (cx, cy) in twips, composed over the stage's
            # base transform, then conjugated to device pixels.
            rot = Affine(ca, sa, -sa, ca,
                         cx - ca * cx + sa * cy, cy - sa * cx - ca * cy)
            dev = s.then(rot.then(b_aff)).then(s_inv)
            mats.append(dev.as_tuple())
        frames = render_shape_animation(
            tag, np.asarray(mats, np.float32), stage.width, stage.height,
            bitmap_service=(service.bitmap_service(handle)
                            if service is not None else None))
        buf = io.BytesIO()
        for frame in frames:
            buf.write(rgba_to_pam(frame))
        return self._bytes(buf.getvalue(),
                           "application/x-portable-arbitrarymap")

    def _timeline(self, service, handle):
        """Keyframed animation: per-frame (matrix, ratio) tracks for ONE
        definition, rendered through render_batch — moving-matrix and
        shared-ratio timelines auto-route to the on-device sweeps."""
        from swf_renderer_tpu.utils.fixed import Sfixed16P16

        spec = json.loads(self._body().decode())
        tag = parse_tag(spec["tag"])
        frames_spec = spec["frames"]
        if not frames_spec:
            raise ValueError("timeline requires at least one frame")
        w, h = service.renderer_size(handle)

        def matrix_of(fs):
            m = fs.get("matrix")
            if m is None:
                return None
            a, b, c, d, tx, ty = m
            return ast.Matrix(
                scale_x=Sfixed16P16.from_value(float(a)),
                scale_y=Sfixed16P16.from_value(float(d)),
                rotate_skew0=Sfixed16P16.from_value(float(b)),
                rotate_skew1=Sfixed16P16.from_value(float(c)),
                translate_x=int(round(float(tx))),
                translate_y=int(round(float(ty))),
            )

        stages = []
        for fs in frames_spec:
            if isinstance(tag, ast.DefineMorphShape):
                child = display.MorphShapeInstance(
                    definition=tag, ratio=float(fs.get("ratio", 0.0)),
                    matrix=matrix_of(fs))
            else:
                child = display.ShapeInstance(definition=tag,
                                              matrix=matrix_of(fs))
            stages.append(display.Stage(width=w, height=h,
                                        children=[child]))
        frames = service.render_batch(handle, stages)
        buf = io.BytesIO()
        for frame in frames:
            buf.write(rgba_to_pam(frame))
        return self._bytes(buf.getvalue(),
                           "application/x-portable-arbitrarymap")

    def do_DELETE(self):  # noqa: N802
        try:
            parts, _ = self._route()
            if len(parts) == 2 and parts[0] == "renderer":
                self.server.service.destroy_renderer(int(parts[1]))
                return self._json(200, {"ok": True})
            self._json(404, {"error": f"unknown route {self.path}"})
        except Exception as exc:  # noqa: BLE001
            self._json(400, {"error": f"{type(exc).__name__}: {exc}"})

    def log_message(self, fmt, *args):  # quiet by default
        pass


def main() -> None:
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 3001
    server = FrameServer(("127.0.0.1", port), Handler)
    print(f"frame server on http://127.0.0.1:{port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
