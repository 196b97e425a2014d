"""Randomized robustness sweep: generated shapes survive the WHOLE stack.

The reference has no fuzzing; its robustness rests on typed errors.  This
sweep generates random well-formed DefineShape tags and pushes each
through emit -> parse (binary codec round trip), decode (twice:
determinism), and a full render — asserting no crashes, byte-identical
round trips, and sane raster output.  Runs on CPU (interpret-mode
kernels), small rasters.
"""

import numpy as np
import pytest

from swf_renderer_tpu.models import ast
from swf_renderer_tpu.models.decode_shape import decode_shape
from swf_renderer_tpu.models.swf_binary import (
    emit_define_shape, emit_define_shape4, parse_define_shape_tag,
    parse_define_shape4_tag,
)
from swf_renderer_tpu.runtime.renderer import render_shape
from swf_renderer_tpu.utils.jsjson import stringify


def _random_shape(rng: np.random.Generator, shape_id: int) -> ast.DefineShape:
    n_fills = int(rng.integers(1, 4))
    fills = [
        ast.SolidFill(color=ast.StraightSRgba8(*map(int, rng.integers(
            0, 256, size=4))))
        for _ in range(n_fills)
    ]
    n_lines = int(rng.integers(0, 3))
    caps = ("round", "none", "square")
    lines = [
        ast.LineStyle(
            width=int(rng.integers(0, 80)),
            start_cap=caps[int(rng.integers(0, 3))],
            end_cap=caps[int(rng.integers(0, 3))],
            # SWF encodes a miter limit ONLY for miter joins.
            join=(lambda t: {"type": t, "limit": 3.0} if t == "miter"
                  else {"type": t})(
                ("round", "bevel", "miter")[int(rng.integers(0, 3))]),
            no_h_scale=False, no_v_scale=False, no_close=False,
            pixel_hinting=False,
            fill=ast.SolidFill(color=ast.StraightSRgba8(
                *map(int, rng.integers(0, 256, size=4)))))
        for _ in range(n_lines)
    ]
    records = []
    pos = np.zeros(2, np.int64)
    for _ in range(int(rng.integers(2, 30))):
        kind = rng.random()
        if kind < 0.3:
            move = (ast.Vector2D(*map(int, rng.integers(0, 2000, size=2)))
                    if rng.random() < 0.7 else None)
            left = (int(rng.integers(0, n_fills + 1))
                    if rng.random() < 0.8 else None)
            if move is None and left is None:
                # A StyleChangeRecord with NO fields encodes as the SWF
                # end-of-shape marker; keep the record representable.
                left = 1
            rec = ast.StyleChangeRecord(
                move_to=move,
                left_fill=left,
                right_fill=int(rng.integers(0, n_fills + 1))
                if rng.random() < 0.5 else None,
                line_style=int(rng.integers(0, n_lines + 1))
                if (n_lines and rng.random() < 0.4) else None,
            )
            if move is not None:
                pos = np.array([move.x, move.y], np.int64)
            records.append(rec)
        elif kind < 0.75:
            d = rng.integers(-600, 600, size=2)
            records.append(ast.EdgeRecord(
                delta=ast.Vector2D(int(d[0]), int(d[1]))))
            pos += d
        else:
            c = rng.integers(-400, 400, size=2)
            d = rng.integers(-600, 600, size=2)
            records.append(ast.EdgeRecord(
                control_delta=ast.Vector2D(int(c[0]), int(c[1])),
                delta=ast.Vector2D(int(d[0]), int(d[1]))))
            pos += c + d
    return ast.DefineShape(
        id=shape_id,
        bounds=ast.Rect(0, 2000, 0, 2000),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(fill=tuple(fills),
                                           line=tuple(lines)),
            records=tuple(records),
        ),
    )


@pytest.mark.parametrize("seed", range(12))
def test_random_shape_full_stack(seed):
    rng = np.random.default_rng(1000 + seed)
    tag = _random_shape(rng, shape_id=seed + 1)

    # Binary codec round trips are exact (golden-JSON equality).  Strip
    # the RECORDHEADER (2 bytes, +4 when the long-length form is used).
    for emit, parse in ((emit_define_shape, parse_define_shape_tag),
                        (emit_define_shape4, parse_define_shape4_tag)):
        blob = emit(tag)
        head = int.from_bytes(blob[:2], "little")
        body_off = 2 + (4 if (head & 0x3F) == 0x3F else 0)
        parsed = parse(blob[body_off:])
        assert stringify(decode_shape(parsed).to_golden()) == \
            stringify(decode_shape(tag).to_golden())
    # DefineShape4 additionally preserves caps/joins verbatim.
    assert parsed.shape.initial_styles.line == \
        tag.shape.initial_styles.line

    # Decode is deterministic.
    assert stringify(decode_shape(tag).to_golden()) == \
        stringify(decode_shape(tag).to_golden())

    # Full render: no crash, valid raster, finite stats.
    for quality in ("flash", "canvas"):
        frame = render_shape(tag, quality=quality, validate=True)
        assert frame.shape == (100, 100, 4)
        assert frame.dtype == np.uint8


def test_random_shape_degenerate_records():
    # All-moves, zero-length edges, and style churn must not crash.
    records = [
        ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), left_fill=1),
        ast.EdgeRecord(delta=ast.Vector2D(0, 0)),
        ast.StyleChangeRecord(move_to=ast.Vector2D(50, 50)),
        ast.StyleChangeRecord(move_to=ast.Vector2D(50, 50), left_fill=1),
        ast.EdgeRecord(control_delta=ast.Vector2D(0, 0),
                       delta=ast.Vector2D(0, 0)),
        ast.StyleChangeRecord(left_fill=0, right_fill=1),
        ast.EdgeRecord(delta=ast.Vector2D(100, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(-100, 0)),  # degenerate back-track
    ]
    tag = ast.DefineShape(
        id=9,
        bounds=ast.Rect(0, 2000, 0, 2000),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=(ast.SolidFill(
                    color=ast.StraightSRgba8(10, 20, 30, 255)),),
                line=()),
            records=tuple(records),
        ),
    )
    frame = render_shape(tag, quality="flash", validate=True)
    assert frame.shape == (100, 100, 4)


def _random_morph_shape(rng: np.random.Generator,
                        shape_id: int) -> ast.DefineMorphShape:
    n_fills = int(rng.integers(1, 3))
    fills = [
        ast.MorphSolidFill(
            color=ast.StraightSRgba8(*map(int, rng.integers(0, 256, 4))),
            morph_color=ast.StraightSRgba8(
                *map(int, rng.integers(0, 256, 4))))
        for _ in range(n_fills)
    ]
    records = []
    for _ in range(int(rng.integers(2, 20))):
        kind = rng.random()
        if kind < 0.3:
            move = (ast.Vector2D(*map(int, rng.integers(0, 2000, 2)))
                    if rng.random() < 0.8 else None)
            records.append(ast.MorphStyleChangeRecord(
                move_to=move,
                morph_move_to=(ast.Vector2D(
                    *map(int, rng.integers(0, 2000, 2)))
                    if move is not None else None),
                left_fill=int(rng.integers(0, n_fills + 1)),
                right_fill=int(rng.integers(0, n_fills + 1))
                if rng.random() < 0.5 else None,
            ))
        elif kind < 0.75:
            records.append(ast.MorphEdgeRecord(
                delta=ast.Vector2D(*map(int, rng.integers(-600, 600, 2))),
                morph_delta=ast.Vector2D(
                    *map(int, rng.integers(-600, 600, 2)))))
        else:
            records.append(ast.MorphEdgeRecord(
                delta=ast.Vector2D(*map(int, rng.integers(-600, 600, 2))),
                morph_delta=ast.Vector2D(
                    *map(int, rng.integers(-600, 600, 2))),
                control_delta=ast.Vector2D(
                    *map(int, rng.integers(-400, 400, 2))),
                # None exercises the midpoint-default quirk
                # (decode-swf-morph-shape.ts:341-346).
                morph_control_delta=(ast.Vector2D(
                    *map(int, rng.integers(-400, 400, 2)))
                    if rng.random() < 0.5 else None)))
    return ast.DefineMorphShape(
        id=shape_id,
        bounds=ast.Rect(0, 2000, 0, 2000),
        morph_bounds=ast.Rect(0, 2000, 0, 2000),
        shape=ast.MorphShapeBody(
            initial_styles=ast.MorphShapeStyles(fill=tuple(fills),
                                                line=()),
            records=tuple(records),
        ),
    )


@pytest.mark.parametrize("seed", range(8))
def test_random_morph_shape_full_stack(seed):
    from swf_renderer_tpu.models.decode_morph_shape import (
        decode_morph_shape,
    )
    from swf_renderer_tpu.runtime.renderer import render_morph_shape

    rng = np.random.default_rng(2000 + seed)
    tag = _random_morph_shape(rng, shape_id=seed + 1)
    # Decode is deterministic.
    assert stringify(decode_morph_shape(tag).to_golden()) == \
        stringify(decode_morph_shape(tag).to_golden())
    # Renders at the golden ratios without crashing; endpoints differ
    # from each other for non-trivial shapes (sanity, not asserted
    # strictly — degenerate seeds may collapse).
    for ratio in (0.0, 0.5, 1.0):
        frame = render_morph_shape(tag, ratio, quality="flash",
                                   validate=True)
        assert frame.shape == (100, 100, 4)
        assert frame.dtype == np.uint8


@pytest.mark.parametrize("seed", range(6))
def test_random_bitmap_fill_render(seed):
    """Random palettized x-swf-bmp bitmaps + random fill matrices through
    the full styled render path (both repeat modes, both qualities)."""
    import struct
    import zlib

    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    rng = np.random.default_rng(3000 + seed)
    bw, bh = int(rng.integers(2, 24)), int(rng.integers(2, 24))
    n_colors = int(rng.integers(1, 17))
    palette = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
    stride = (bw + 3) & ~3  # rows padded to 4 bytes
    pixels = rng.integers(0, n_colors, (bh, stride)).astype(np.uint8)
    payload = palette.tobytes() + pixels.tobytes()
    data = (bytes([3]) + struct.pack("<HH", bw, bh)
            + bytes([n_colors - 1]) + zlib.compress(payload))
    bmp = ast.DefineBitmap(id=7, width=bw, height=bh,
                           media_type="image/x-swf-bmp", data=data)

    sc = 20.0 * float(rng.uniform(0.2, 8.0))  # twips per texel
    matrix = ast.Matrix(
        scale_x=Sfixed16P16.from_value(sc),
        scale_y=Sfixed16P16.from_value(sc * float(rng.uniform(0.5, 2.0))),
        rotate_skew0=Sfixed16P16.from_value(0),
        rotate_skew1=Sfixed16P16.from_value(0),
        translate_x=int(rng.integers(-200, 200)),
        translate_y=int(rng.integers(-200, 200)),
    )
    fill = ast.BitmapFill(bitmap_id=7, matrix=matrix,
                          repeating=bool(rng.integers(0, 2)),
                          smoothed=bool(rng.integers(0, 2)))
    records = [
        ast.StyleChangeRecord(move_to=ast.Vector2D(100, 100), left_fill=1),
        ast.EdgeRecord(delta=ast.Vector2D(1700, 200)),
        ast.EdgeRecord(delta=ast.Vector2D(-300, 1600)),
        ast.EdgeRecord(delta=ast.Vector2D(-1400, -1800)),
    ]
    tag = ast.DefineShape(
        id=1, bounds=ast.Rect(0, 2000, 0, 2000),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(fill=(fill,), line=()),
            records=tuple(records)))
    for quality in ("flash", "canvas"):
        frame = render_shape(tag, bitmaps=[bmp], quality=quality,
                             validate=True)
        assert frame.shape == (100, 100, 4)
        assert frame[..., 3].max() > 0  # something was drawn


@pytest.mark.parametrize("seed", [3, 11])
def test_random_deep_multipass_scene(seed):
    """Randomized DEEP scenes (17-40 layers, mixed paints) through the
    multipass flat-block path vs the layered coverage oracle."""
    from swf_renderer_tpu.native.bindings import native_available
    from swf_renderer_tpu.ops import style as style_ops
    from swf_renderer_tpu.ops.composite import (
        composite_draws, premul_to_straight_u8,
    )
    from swf_renderer_tpu.ops.coverage import coverage_numpy
    from swf_renderer_tpu.ops.pipeline import (
        render_batch_styled, split_layer_groups,
    )
    import jax.numpy as jnp

    if not native_available():
        pytest.skip("native packer required")
    rng = np.random.default_rng(seed)
    height, width = rng.integers(24, 64), rng.integers(100, 300)
    n_layers = int(rng.integers(17, 41))
    paints = []
    for i in range(n_layers):
        roll = rng.uniform()
        if roll < 0.15:
            paints.append(style_ops.Paint(
                kind=style_ops.PAINT_LINEAR,
                inv_matrix=(float(rng.uniform(50, 300)), 0.0, 0.0,
                            float(rng.uniform(50, 300)),
                            -16384.0, float(rng.uniform(-9000, 0))),
                stop_ratios=np.array([0.0, 1.0], np.float32),
                stop_colors=rng.uniform(0, 1, (2, 4)).astype(np.float32)))
        elif roll < 0.25:
            img = rng.integers(0, 256, (5, 7, 4)).astype(np.uint8)
            paints.append(style_ops.Paint(
                kind=style_ops.PAINT_BITMAP,
                inv_matrix=(0.4, 0.0, 0.0, 0.4, 0.0, 0.0),
                image=img, repeating=True, smoothed=True, supersample=1))
        else:
            paints.append(style_ops.solid_paint(
                tuple(rng.uniform(0.1, 1.0, 4))))
    assert len(split_layer_groups(paints)) >= 2

    tables = []
    for _ in range(n_layers):
        pts = rng.uniform(0, (width, height), (5, 2)).astype(np.float32)
        closed = np.concatenate([pts, pts[:1]])
        tables.append(np.concatenate([closed[:-1], closed[1:]], axis=1))
    got = render_batch_styled([tables], paints, int(height), int(width))

    fields = [style_ops.paint_field(p, int(height), int(width))
              for p in paints]
    covs = np.stack([coverage_numpy(t, int(height), int(width))
                     for t in tables])
    want = np.asarray(premul_to_straight_u8(
        composite_draws(jnp.asarray(covs), jnp.stack(fields))))
    diff = np.abs(got[0].astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, diff.max()


@pytest.mark.parametrize("seed", range(4))
def test_random_interactive_single_frame_loop(seed):
    """Fuzz the interactive F=1 sweep upgrade: random shapes under a
    random matrix walk (rotation + anisotropic zoom + shear) through ONE
    renderer must match fresh per-frame renders — exercising the piece
    cache's split revalidation, margin escalation, and the
    flatten-tolerance rebuild."""
    from swf_renderer_tpu.models import display
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from swf_renderer_tpu.utils.fixed import Sfixed16P16 as S

    rng = np.random.default_rng(7000 + seed)
    tag = _random_shape(rng, shape_id=1)
    w = h = 72
    r = TpuRenderer(w, h)
    saw_upgrade = False
    for i in range(5):
        th = float(rng.uniform(0, 2 * np.pi))
        sc = float(rng.uniform(0.5, 2.5))
        shear = float(rng.uniform(-0.3, 0.3))
        a, b = sc * np.cos(th), sc * np.sin(th)
        cx = cy = 1000.0
        m = ast.Matrix(
            scale_x=S.from_value(a),
            scale_y=S.from_value(a * (1.0 + shear)),
            rotate_skew0=S.from_value(b),
            rotate_skew1=S.from_value(-b + shear),
            translate_x=int(round(cx - a * cx + b * cy)),
            translate_y=int(round(cy - b * cx - a * cy)))
        stage = display.Stage(width=w, height=h, children=[
            display.ShapeInstance(definition=tag, matrix=m)])
        got = r.render(stage)
        saw_upgrade |= r.last_stats.path == "transform-sweep-1f"
        want = TpuRenderer(w, h).render(stage)
        gf = got.astype(np.float64)
        wf = want.astype(np.float64)
        gpm = np.concatenate([gf[..., :3] * gf[..., 3:4] / 255.0,
                              gf[..., 3:4]], -1)
        wpm = np.concatenate([wf[..., :3] * wf[..., 3:4] / 255.0,
                              wf[..., 3:4]], -1)
        d = np.abs(gpm - wpm)
        # Zoom-past rebuilds escalate the cached flatten tolerance 1.5x
        # (headroom against rebuild churn), so curve AA on those frames
        # flattens FINER than the per-frame oracle — a handful of
        # curve-edge pixels may differ by a few quanta (measured max 6
        # at 0.014% of pixels); rotation/translation frames match the
        # oracle exactly.
        assert d.max() <= 32, (seed, i, d.max())
        assert (d > 2).mean() < 5e-3, (seed, i)
    assert saw_upgrade, seed  # fills-only shapes must take the F=1 path


def _morph_static_twin(tag: ast.DefineMorphShape, end: bool
                       ) -> ast.DefineShape:
    """The static DefineShape a fill-only morph degenerates to at
    ratio 0 (start) or 1 (end) — every coordinate/color is the chosen
    side of the pair."""
    fills = tuple(
        ast.SolidFill(color=(f.morph_color if end else f.color))
        for f in tag.shape.initial_styles.fill)
    records = []
    for rec in tag.shape.records:
        if isinstance(rec, ast.MorphStyleChangeRecord):
            records.append(ast.StyleChangeRecord(
                move_to=(rec.morph_move_to if end else rec.move_to),
                left_fill=rec.left_fill, right_fill=rec.right_fill,
                line_style=rec.line_style))
        else:
            records.append(ast.EdgeRecord(
                delta=(rec.morph_delta if end else rec.delta),
                control_delta=(rec.morph_control_delta if end
                               else rec.control_delta)))
    return ast.DefineShape(
        id=tag.id,
        bounds=(tag.morph_bounds if end else tag.bounds),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(fill=fills, line=()),
            records=tuple(records)))


@pytest.mark.parametrize("seed", range(8))
def test_random_morph_endpoints_match_static_twin(seed):
    """A fill-only morph rendered at ratio 0 / 1 equals the static
    render of its start / end slice: the two DECODERS (morph pairing +
    start-keyed stitching vs static stitching) and the two RENDER paths
    (command lerp vs direct) must agree at the endpoints, where the
    f64 lerp is exact.  Controls are matched (both sides curved or
    both straight) so the slice is expressible as integer-twip static
    records."""
    from swf_renderer_tpu.runtime.renderer import render_morph_shape

    rng = np.random.default_rng(46_000 + seed)
    tag = _random_morph_shape(rng, shape_id=seed + 1)
    # Match curvature: give every one-sided curved edge its other
    # control explicitly (the midpoint-default quirk yields half-twip
    # controls no integer static AST can express).
    records = []
    for rec in tag.shape.records:
        if isinstance(rec, ast.MorphEdgeRecord) \
                and (rec.control_delta is None) \
                != (rec.morph_control_delta is None):
            records.append(ast.MorphEdgeRecord(
                delta=rec.delta, morph_delta=rec.morph_delta,
                control_delta=rec.control_delta or ast.Vector2D(
                    *map(int, rng.integers(-400, 400, 2))),
                morph_control_delta=rec.morph_control_delta
                or ast.Vector2D(*map(int, rng.integers(-400, 400, 2)))))
        else:
            records.append(rec)
    tag = ast.DefineMorphShape(
        id=tag.id, bounds=tag.bounds, morph_bounds=tag.bounds,
        shape=ast.MorphShapeBody(
            initial_styles=tag.shape.initial_styles,
            records=tuple(records)))

    for ratio, end in ((0.0, False), (1.0, True)):
        twin = _morph_static_twin(tag, end)
        got = render_morph_shape(tag, ratio, quality="flash",
                                 validate=True)
        want = render_shape(twin, quality="flash", validate=True)
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() == 0, (
            f"seed {seed} ratio {ratio}: max diff {diff.max()}")


@pytest.mark.parametrize("seed", range(4))
def test_random_batch_routing_combo(seed):
    """Randomized render_batch combos — multi-layer stages mixing solid
    and gradient fills, rotation+translate matrix tracks, and per-frame
    color transforms on random layers — agree with fresh per-stage
    renders within the sweep envelope, whichever path the batch routes
    to.  The ct-folding machinery (solids -> per-frame kernel colors,
    gradients -> per-frame stop colors) is what this hunts."""
    from swf_renderer_tpu.models import display
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from swf_renderer_tpu.utils.fixed import Sfixed16P16

    rng = np.random.default_rng(8100 + seed)
    size = 800

    def solid_tag(tag_id):
        color = ast.StraightSRgba8(*map(int, rng.integers(0, 256, 4)))
        return _shape_with_fill(tag_id, ast.SolidFill(color=color))

    def gradient_tag(tag_id):
        gm = ast.Matrix(
            scale_x=Sfixed16P16.from_value(size / 32768.0),
            scale_y=Sfixed16P16.from_value(size / 32768.0),
            rotate_skew0=Sfixed16P16.from_value(0.0),
            rotate_skew1=Sfixed16P16.from_value(0.0),
            translate_x=size // 2, translate_y=size // 2)
        stops = [ast.GradientStop(
            ratio=int(r), color=ast.StraightSRgba8(
                *map(int, rng.integers(0, 256, 4))))
            for r in sorted(rng.integers(0, 256, 2))]
        grad = ast.Gradient(spread=ast.GradientSpread.PAD,
                            color_space=ast.ColorSpace.S_RGB,
                            colors=stops)
        return _shape_with_fill(
            tag_id, ast.LinearGradientFill(matrix=gm, gradient=grad))

    def _shape_with_fill(tag_id, fill):
        pts = rng.integers(50, size - 50, (3, 2))
        # Random triangle, absolute corners -> delta edge chain.
        records = [ast.StyleChangeRecord(
            right_fill=1, move_to=ast.Vector2D(*map(int, pts[0])))]
        cur = pts[0]
        for p in (pts[1], pts[2], pts[0]):
            records.append(ast.EdgeRecord(delta=ast.Vector2D(
                int(p[0] - cur[0]), int(p[1] - cur[1]))))
            cur = p
        return ast.DefineShape(
            id=tag_id, bounds=ast.Rect(0, size, 0, size),
            shape=ast.ShapeBody(
                initial_styles=ast.ShapeStyles(fill=[fill], line=[]),
                records=records))

    n_layers = int(rng.integers(1, 4))
    tags = [(gradient_tag if rng.random() < 0.5 else solid_tag)(i + 1)
            for i in range(n_layers)]
    ct_layers = [bool(rng.random() < 0.5) for _ in range(n_layers)]
    w = h = 44
    frames = int(rng.integers(2, 5))
    stages = []
    for i in range(frames):
        th = 2 * np.pi * i / 16 * float(rng.random())
        a, b = np.cos(th), np.sin(th)
        cx = cy = size / 2.0
        children = []
        for li, tag in enumerate(tags):
            m = ast.Matrix(
                scale_x=Sfixed16P16.from_value(a),
                scale_y=Sfixed16P16.from_value(a),
                rotate_skew0=Sfixed16P16.from_value(b),
                rotate_skew1=Sfixed16P16.from_value(-b),
                translate_x=int(round(cx - a * cx + b * cy))
                + 20 * i * li,
                translate_y=int(round(cy - b * cx - a * cy)))
            ct = None
            if ct_layers[li]:
                ct = display.ColorTransform(
                    mult=(1.0, max(0.0, 1.0 - 0.15 * i), 1.0,
                          max(0.1, 1.0 - 0.2 * i)),
                    add=(0.04 * i, 0.0, 0.02 * i, 0.0))
            children.append(display.ShapeInstance(
                definition=tag, matrix=m, color_transform=ct))
        stages.append(display.Stage(width=w, height=h,
                                    children=tuple(children)))

    r = TpuRenderer(w, h)
    got = r.render_batch(stages)
    assert got.shape == (frames, h, w, 4)
    # ROUTING assertion, not just output equality (PERF.md round-4
    # lesson): every combo here is sweepable (solid/sRGB-gradient
    # paints, moving invertible matrices, uniform structure), so a
    # fallback to the batch/per-stage paths would be a silent
    # de-routing regression that renders identical pixels slower.
    assert r.last_stats.path == "transform-sweep", (
        seed, r.last_stats.path)
    for i, stage in enumerate(stages):
        want = TpuRenderer(w, h).render(stage)
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 2, (
            seed, i, r.last_stats.path, diff.max())
