"""swf_renderer_tpu — a TPU-native SWF (Flash) vector-shape rasterizer.

A ground-up rebuild of the capabilities of ``open-flash/swf-renderer``
(reference at /root/reference) designed for TPU hardware:

* **models/** — SWF AST ingestion, the shape/morph-shape geometry compilers
  (byte-exact parity with the reference decoder goldens), the display list,
  and lowering from styled paths to flat, dense edge tables.
* **ops/** — the device layer: a Pallas tiled analytic-coverage rasterization
  kernel, fill-style evaluation (solid / gradient / bitmap) and premultiplied
  alpha-over compositing, all batched so XLA keeps the chip busy.
* **runtime/** — the renderer front-end (``render(stage)`` / ``add_bitmap``),
  bitmap service, and decoded-shape caches.
* **parallel/** — device-mesh sharding of the (frame, tile) grid.
* **utils/** — PNG/PAM codecs, JS-compatible JSON, fixed point, color.
"""

from .models.ast_io import (
    load_tag,
    parse_define_bitmap,
    parse_define_morph_shape,
    parse_define_shape,
)
from .models.decode_morph_shape import decode_morph_shape
from .models.decode_shape import decode_shape

__version__ = "0.1.0"

__all__ = [
    "decode_shape",
    "decode_morph_shape",
    "load_tag",
    "parse_define_shape",
    "parse_define_morph_shape",
    "parse_define_bitmap",
    "TpuRenderer",
    "render_shape",
    "render_morph_shape",
    "Stage",
    "ShapeInstance",
    "MorphShapeInstance",
    "Container",
    "RendererService",
    "render_movie",
    "render_movie_timeline",
    "load_movie_stage",
    "mix_movie_audio",
]


def __getattr__(name):
    # Renderer-side exports import jax; keep them lazy so pure host-side
    # use (decoding, golden emission) stays dependency-light and fast.
    if name in ("TpuRenderer", "render_shape", "render_morph_shape"):
        from .runtime import renderer

        return getattr(renderer, {"TpuRenderer": "TpuRenderer",
                                  "render_shape": "render_shape",
                                  "render_morph_shape": "render_morph_shape"}[name])
    if name in ("Stage", "ShapeInstance", "MorphShapeInstance", "Container"):
        from .models import display

        return getattr(display, name)
    if name == "RendererService":
        from .runtime.service import RendererService

        return RendererService
    if name in ("render_movie", "render_movie_timeline",
                "load_movie_stage"):
        from .runtime import movie

        return getattr(movie, name)
    if name == "mix_movie_audio":
        from .runtime.audio import mix_movie_audio

        return mix_movie_audio
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
