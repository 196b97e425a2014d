"""Display-list semantics: container matrix nesting, painter's order,
background, alpha compositing."""

import dataclasses

import numpy as np

from swf_renderer_tpu.models import ast, display
from swf_renderer_tpu.runtime.renderer import TpuRenderer
from swf_renderer_tpu.utils.fixed import Sfixed16P16


def _matrix(scale=1.0, tx=0, ty=0, skew0=0.0, skew1=0.0):
    return ast.Matrix(
        scale_x=Sfixed16P16.from_value(scale),
        scale_y=Sfixed16P16.from_value(scale),
        rotate_skew0=Sfixed16P16.from_value(skew0),
        rotate_skew1=Sfixed16P16.from_value(skew1),
        translate_x=tx,
        translate_y=ty,
    )


def _square_tag(size_twips=400, color=(255, 0, 0, 255), shape_id=1):
    records = [
        ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), left_fill=1),
        ast.EdgeRecord(delta=ast.Vector2D(size_twips, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, size_twips)),
        ast.EdgeRecord(delta=ast.Vector2D(-size_twips, 0)),
        ast.EdgeRecord(delta=ast.Vector2D(0, -size_twips)),
    ]
    return ast.DefineShape(
        id=shape_id,
        bounds=ast.Rect(0, size_twips, 0, size_twips),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=(ast.SolidFill(color=ast.StraightSRgba8(*color)),),
                line=(),
            ),
            records=tuple(records),
        ),
    )


def test_nested_containers_equal_flat_matrix():
    tag = _square_tag()
    # Nested: container scale 2 -> container translate (200, 100) twips ->
    # shape translate (100, 100).
    nested = display.Stage(
        width=80, height=80,
        children=(
            display.Container(
                matrix=_matrix(scale=2.0),
                children=(
                    display.Container(
                        matrix=_matrix(tx=200, ty=100),
                        children=(
                            display.ShapeInstance(
                                definition=tag, matrix=_matrix(tx=100, ty=100)
                            ),
                        ),
                    ),
                ),
            ),
        ),
    )
    # Flat equivalent: scale 2 applied around origin => translate doubles.
    flat = display.Stage(
        width=80, height=80,
        children=(
            display.ShapeInstance(
                definition=tag, matrix=_matrix(scale=2.0, tx=600, ty=400)
            ),
        ),
    )
    a = TpuRenderer(80, 80, use_pallas=False).render(nested)
    b = TpuRenderer(80, 80, use_pallas=False).render(flat)
    np.testing.assert_array_equal(a, b)
    assert a[..., 3].sum() > 0


def test_painters_order_and_alpha_over():
    red = _square_tag(color=(255, 0, 0, 255), shape_id=1)
    half_blue = _square_tag(color=(0, 0, 255, 128), shape_id=2)
    stage = display.Stage(
        width=40, height=40,
        children=(
            display.ShapeInstance(definition=red, matrix=_matrix()),
            display.ShapeInstance(definition=half_blue, matrix=_matrix(tx=200)),
        ),
    )
    frame = TpuRenderer(40, 40, use_pallas=False).render(stage)
    # Overlap region: half-transparent blue over red.
    px = frame[10, 15]
    a_blue = 128 / 255
    want_r = round(255 * (1 - a_blue) * 1.0)
    want_b = round(255 * a_blue)
    assert abs(int(px[0]) - want_r) <= 1
    assert abs(int(px[2]) - want_b) <= 1
    assert px[3] == 255
    # Red-only region unchanged.
    assert tuple(frame[10, 5]) == (255, 0, 0, 255)


def test_morph_in_container():
    # A morph shape nested under a transformed container renders at the
    # composed transform.
    tag = _square_tag()
    morph_like = display.Stage(
        width=40, height=40,
        children=(
            display.Container(
                matrix=_matrix(tx=200),
                children=(
                    display.ShapeInstance(definition=tag, matrix=None),
                ),
            ),
        ),
    )
    frame = TpuRenderer(40, 40, use_pallas=False).render(morph_like)
    assert frame[5, 5, 3] == 0  # left of translated square
    assert frame[5, 15, 3] == 255


def test_validate_mode_passes_on_clean_render():
    tag = _square_tag()
    stage = display.Stage(width=40, height=40,
                          children=(display.ShapeInstance(definition=tag),))
    renderer = TpuRenderer(40, 40, use_pallas=False)
    renderer.validate = True
    frame = renderer.render(stage)
    assert frame[..., 3].sum() > 0


def test_canvas_line_width_state_machine():
    """Canvas2D ignores non-positive lineWidth assignments: a zero-width
    stroke inherits the previously set width (initially 1.0), because the
    reference assigns ctx.lineWidth directly (canvas-renderer.ts:342)."""
    line_wide = ast.LineStyle(
        width=100, start_cap="round", end_cap="round", join={"type": "round"},
        no_h_scale=False, no_v_scale=False, no_close=False,
        pixel_hinting=False,
        fill=ast.SolidFill(color=ast.StraightSRgba8(0, 0, 0, 255)),
    )
    line_zero = dataclasses.replace(line_wide, width=0)

    def shape_with(lines, line_ids):
        # Two horizontal strokes at y=200 and y=600 twips.
        records = [
            ast.StyleChangeRecord(move_to=ast.Vector2D(100, 200),
                                  line_style=line_ids[0]),
            ast.EdgeRecord(delta=ast.Vector2D(600, 0)),
            ast.StyleChangeRecord(move_to=ast.Vector2D(100, 600),
                                  line_style=line_ids[1]),
            ast.EdgeRecord(delta=ast.Vector2D(600, 0)),
        ]
        return ast.DefineShape(
            id=1, bounds=ast.Rect(0, 800, 0, 800),
            shape=ast.ShapeBody(
                initial_styles=ast.ShapeStyles(fill=(), line=tuple(lines)),
                records=tuple(records),
            ),
        )

    stage_tag = shape_with([line_wide, line_zero], (1, 2))
    stage = display.Stage(
        width=40, height=40,
        children=(display.ShapeInstance(definition=stage_tag),),
    )
    frame = TpuRenderer(40, 40, use_pallas=False).render(stage)
    # First stroke: 100 twips = 5 px wide -> rows ~8..12 dark at x=20.
    col = frame[:, 20, 3]
    first_rows = np.nonzero(col[:20] > 128)[0]
    second_rows = np.nonzero(col[20:] > 128)[0] + 20
    assert len(first_rows) >= 4  # ~5 px wide
    # Second stroke (width 0 -> inherits 100): must ALSO be ~5 px, not 1.
    assert len(second_rows) >= 4, (
        f"zero-width stroke did not inherit previous width: {second_rows}"
    )


def test_honor_fill_winding_even_odd():
    """SWF fill semantics (opt-in): even-odd unless the DefineShape4
    fill-winding flag is set; the reference always fills nonzero
    (canvas-renderer.ts:335), so the default stays nonzero."""
    import dataclasses

    import numpy as np

    from swf_renderer_tpu.models import ast

    # A five-point star traced as a self-intersecting polygon: nonzero
    # fills the center pentagon, even-odd leaves it empty.
    import math
    pts = []
    for k in range(5):
        a = -math.pi / 2 + k * 4 * math.pi / 5
        pts.append((int(1000 + 900 * math.cos(a)),
                    int(1000 + 900 * math.sin(a))))
    records = [ast.StyleChangeRecord(
        move_to=ast.Vector2D(*pts[0]), left_fill=1)]
    cur = pts[0]
    for p in pts[1:] + [pts[0]]:
        records.append(ast.EdgeRecord(
            delta=ast.Vector2D(p[0] - cur[0], p[1] - cur[1])))
        cur = p
    tag = ast.DefineShape(
        id=1, bounds=ast.Rect(0, 2000, 0, 2000),
        has_fill_winding=False,
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=(ast.SolidFill(
                    color=ast.StraightSRgba8(255, 0, 0, 255)),),
                line=()),
            records=tuple(records)))
    stage = display.stage_for_shape(tag)

    center = (50, 50)
    default = TpuRenderer(stage.width, stage.height).render(stage)
    assert default[center][3] == 255  # nonzero: center filled

    eo = TpuRenderer(stage.width, stage.height,
                     honor_fill_winding=True).render(stage)
    assert eo[center][3] == 0  # even-odd: center empty
    assert eo[15, 50][3] == 255  # top star arm still filled

    winding = dataclasses.replace(tag, has_fill_winding=True)
    stage2 = display.stage_for_shape(winding)
    nz = TpuRenderer(stage2.width, stage2.height,
                     honor_fill_winding=True).render(stage2)
    assert np.array_equal(nz, default)  # flag set -> nonzero again


def test_stage_background_color_composites():
    """Stage.background_color is honored: a transparent stage stays
    transparent (the TS reference's clearRect semantics), a colored one
    composites source-over (the native renderer clears to it,
    rs/src/gfx_renderer.rs:299-311)."""
    from swf_renderer_tpu.models import ast as ast_mod
    from swf_renderer_tpu.runtime.renderer import TpuRenderer

    tag = ast_mod.DefineShape(
        id=1,
        bounds=ast_mod.Rect(x_min=0, x_max=200, y_min=0, y_max=200),
        shape=ast_mod.ShapeBody(
            initial_styles=ast_mod.ShapeStyles(
                fill=[ast_mod.SolidFill(
                    color=ast_mod.StraightSRgba8(255, 0, 0, 255))],
                line=[]),
            records=[
                ast_mod.StyleChangeRecord(
                    right_fill=1, move_to=ast_mod.Vector2D(x=0, y=0)),
                ast_mod.EdgeRecord(delta=ast_mod.Vector2D(x=200, y=0)),
                ast_mod.EdgeRecord(delta=ast_mod.Vector2D(x=0, y=200)),
                ast_mod.EdgeRecord(delta=ast_mod.Vector2D(x=-200, y=-200)),
            ]),
    )
    child = display.ShapeInstance(definition=tag)
    r = TpuRenderer(16, 16)
    clear = r.render(display.Stage(width=16, height=16, children=[child]))
    assert clear[15, 15, 3] == 0  # empty corner stays transparent
    assert tuple(clear[1, 5]) == (255, 0, 0, 255)

    bg = r.render(display.Stage(
        width=16, height=16, children=[child],
        background_color=ast_mod.StraightSRgba8(0, 255, 0, 255)))
    assert tuple(bg[15, 15]) == (0, 255, 0, 255)  # bg shows through
    assert tuple(bg[1, 5]) == (255, 0, 0, 255)    # shape unchanged

    # Batched path too.
    stages = [display.Stage(
        width=16, height=16, children=[child],
        background_color=ast_mod.StraightSRgba8(0, 0, 255, 255))] * 2
    batch = r.render_batch(stages)
    assert tuple(batch[0, 15, 15]) == (0, 0, 255, 255)


def _random_poly_tag(rng, shape_id):
    k = int(rng.integers(3, 7))
    pts = rng.integers(100, 1900, size=(k, 2))
    records = [ast.StyleChangeRecord(
        move_to=ast.Vector2D(int(pts[0, 0]), int(pts[0, 1])), left_fill=1)]
    for i in list(range(1, k)) + [0]:
        d = pts[i] - pts[i - 1]
        records.append(ast.EdgeRecord(delta=ast.Vector2D(int(d[0]),
                                                         int(d[1]))))
    color = tuple(int(c) for c in rng.integers(40, 256, size=4))
    return ast.DefineShape(
        id=shape_id,
        bounds=ast.Rect(0, 2000, 0, 2000),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(
                fill=(ast.SolidFill(color=ast.StraightSRgba8(*color)),),
                line=(),
            ),
            records=tuple(records),
        ),
    )


def _random_tree(rng, depth=0):
    """Random display subtree: containers with random fixed-point
    matrices and color transforms over solid-fill polygon leaves."""
    def rand_matrix():
        return ast.Matrix(
            scale_x=Sfixed16P16.from_value(float(rng.uniform(0.4, 1.5))),
            scale_y=Sfixed16P16.from_value(float(rng.uniform(0.4, 1.5))),
            rotate_skew0=Sfixed16P16.from_value(float(rng.uniform(-0.4, 0.4))),
            rotate_skew1=Sfixed16P16.from_value(float(rng.uniform(-0.4, 0.4))),
            translate_x=int(rng.integers(-200, 800)),
            translate_y=int(rng.integers(-200, 800)),
        )

    def rand_ct():
        if rng.uniform() < 0.5:
            return None
        return display.ColorTransform(
            mult=tuple(float(m) for m in rng.uniform(0.3, 1.0, 4)),
            add=tuple(float(a) for a in rng.uniform(-0.1, 0.1, 4)),
        )

    if depth >= 2 or rng.uniform() < 0.45:
        return display.ShapeInstance(
            definition=_random_poly_tag(rng, int(rng.integers(1, 1 << 16))),
            matrix=rand_matrix(), color_transform=rand_ct())
    kids = tuple(_random_tree(rng, depth + 1)
                 for _ in range(int(rng.integers(1, 4))))
    return display.Container(children=kids, matrix=rand_matrix(),
                             color_transform=rand_ct())


def test_random_display_tree_cross_backend_and_compositing():
    """Random nested trees (matrices, color transforms, painter's
    order): the scanline and direct backends are independent coverage
    algorithms and must agree to the u8 quantum; the full render must
    match numpy premultiplied alpha-over compositing of each leaf
    rendered ALONE through its preserved container chain (sibling
    independence + painter's order)."""
    for seed in range(4):
        rng = np.random.default_rng(300 + seed)
        roots = tuple(_random_tree(rng) for _ in range(int(rng.integers(2, 4))))
        stage = display.Stage(width=100, height=100, children=roots)

        full = TpuRenderer(100, 100, backend="scanline").render(stage)
        direct = TpuRenderer(100, 100, backend="direct").render(stage)
        assert np.abs(full.astype(np.int32)
                      - direct.astype(np.int32)).max() <= 1

        # Single-leaf stages preserving each leaf's container chain, in
        # painter's order.
        def leaf_chains(obj, chain):
            if isinstance(obj, display.Container):
                for c in obj.children:
                    yield from leaf_chains(c, chain + [obj])
            else:
                yield chain, obj

        leaves = [lc for root in roots for lc in leaf_chains(root, [])]
        acc = np.zeros((100, 100, 4), np.float64)  # premul
        for chain, leaf in leaves:
            wrapped = leaf
            for cont in reversed(chain):
                wrapped = dataclasses.replace(cont, children=(wrapped,))
            frame = TpuRenderer(100, 100, backend="scanline").render(
                display.Stage(width=100, height=100, children=(wrapped,)))
            f = frame.astype(np.float64) / 255.0
            pm = np.concatenate([f[..., :3] * f[..., 3:4], f[..., 3:4]], -1)
            acc = pm + acc * (1.0 - pm[..., 3:4])
        # premul -> straight u8 (round premul bytes first, like the
        # production quantizer)
        pm_u8 = np.rint(acc * 255.0)
        alpha = pm_u8[..., 3:4]
        with np.errstate(divide="ignore", invalid="ignore"):
            rgb = np.where(alpha > 0, pm_u8[..., :3] / alpha * 255.0, 0.0)
        want = np.concatenate([np.rint(rgb), alpha], -1)
        got = full.astype(np.float64)
        # per-leaf u8 quantization stacks across layers
        n = len(leaves)
        diff = np.abs(got - want)
        assert diff[..., 3].max() <= 1 + n, (seed, diff[..., 3].max())
        # straight-alpha rgb amplifies premul quanta at low alpha; gate
        # rgb only where the result is reasonably opaque
        opaque = got[..., 3] > 64
        assert (diff[..., :3] * opaque[..., None]).max() <= 3 + 2 * n, (
            seed, (diff[..., :3] * opaque[..., None]).max())
