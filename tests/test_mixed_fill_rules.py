"""Per-layer fill rules on the fused flat-block path.

SWF mixes even-odd shapes with DefineShape4 nonzero-winding shapes in one
display list (the reference switches Canvas2D's fill() winding argument
per path, canvas-renderer.ts:283-290).  Mixed-rule scenes must ride the
flagship fused kernel — one static rule per LAYER — instead of falling
off to the slow layered paths, and every fallback coverage path must
honor the same per-draw rules.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from swf_renderer_tpu.ops import coverage as cov
from swf_renderer_tpu.ops import style as style_ops
from swf_renderer_tpu.ops.composite import (
    composite_draws,
    premul_to_straight_u8,
)
from swf_renderer_tpu.ops.coverage import coverage_numpy
from swf_renderer_tpu.ops.pipeline import render_batch_styled
from swf_renderer_tpu.runtime.renderer import TpuRenderer
from swf_renderer_tpu.runtime.scene import Draw


def _closed(points):
    pts = np.asarray(points, dtype=np.float32)
    closed = np.concatenate([pts, pts[:1]], axis=0)
    return np.concatenate([closed[:-1], closed[1:]], axis=1)


def _star(cx, cy, r):
    """Self-intersecting 5-point star: its center pentagon has winding 2,
    so nonzero and even-odd genuinely disagree."""
    base = np.array(
        [(8, 1), (11, 13), (2, 5.5), (14, 5.5), (5, 13)], np.float32)
    return _closed((base - 8.0) * (r / 8.0) + (cx, cy))


def _oracle(edge_tables, paints, rules, height, width):
    fields = [style_ops.paint_field(p, height, width) for p in paints]
    covs = np.stack([coverage_numpy(t, height, width, rule)
                     for t, rule in zip(edge_tables, rules)])
    return np.asarray(premul_to_straight_u8(
        composite_draws(jnp.asarray(covs), jnp.stack(fields))))


def _mixed_scene(height, width, n_layers=3, rng=None):
    rng = rng or np.random.default_rng(7)
    tables, paints, rules = [], [], []
    for i in range(n_layers):
        cx = rng.uniform(20, width - 20)
        cy = rng.uniform(12, height - 12)
        tables.append(_star(cx, cy, rng.uniform(10, 16)))
        paints.append(style_ops.solid_paint(tuple(rng.uniform(0.3, 1.0, 4))))
        rules.append(cov.FILL_RULE_EVENODD if i % 2
                     else cov.FILL_RULE_NONZERO)
    return tables, paints, tuple(rules)


def test_mixed_rules_fused_matches_oracle():
    height, width = 48, 200
    tables, paints, rules = _mixed_scene(height, width)
    # Guard: the scene actually distinguishes the rules.
    assert (coverage_numpy(tables[1], height, width, rules[1])
            != coverage_numpy(tables[1], height, width,
                              cov.FILL_RULE_NONZERO)).any()

    got = render_batch_styled([tables], paints, height, width,
                              fill_rule=rules)
    want = _oracle(tables, paints, rules, height, width)
    diff = np.abs(got[0].astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, diff.max()

    # Wrong-rule cross-check: the same scene under all-nonzero must
    # differ (the star centers fill), proving the per-layer rules took.
    got_nz = render_batch_styled([tables], paints, height, width,
                                 fill_rule=cov.FILL_RULE_NONZERO)
    assert (got != got_nz).any()


def test_uniform_tuple_collapses_to_int_path():
    height, width = 40, 160
    tables, paints, _ = _mixed_scene(height, width)
    rules = (cov.FILL_RULE_EVENODD,) * len(paints)
    a = render_batch_styled([tables], paints, height, width,
                            fill_rule=rules)
    b = render_batch_styled([tables], paints, height, width,
                            fill_rule=cov.FILL_RULE_EVENODD)
    np.testing.assert_array_equal(a, b)


def test_mixed_rules_multipass():
    """>16 mixed-rule layers chain through multi-pass composition with the
    rules tuple sliced per pass."""
    from swf_renderer_tpu.ops.pipeline import split_layer_groups

    rng = np.random.default_rng(31)
    height, width = 40, 150
    tables, paints, rules = _mixed_scene(height, width, n_layers=20,
                                         rng=rng)
    assert len(split_layer_groups(paints)) == 2
    got = render_batch_styled([tables], paints, height, width,
                              fill_rule=rules)
    want = _oracle(tables, paints, rules, height, width)
    diff = np.abs(got[0].astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, diff.max()


def test_mixed_rules_affine_sweep():
    """The on-device transform sweep honors per-layer rules, so a
    mixed-rule timeline stays an O(1)-host-work animation."""
    from swf_renderer_tpu.ops.morph import morph_frames_to_u8
    from swf_renderer_tpu.ops.transform import (
        affine_pieces, render_affine_sweep,
    )

    height, width = 64, 96
    tables = [_star(40.0, 32.0, 20.0), _star(56.0, 30.0, 16.0)]
    rules = (cov.FILL_RULE_NONZERO, cov.FILL_RULE_EVENODD)
    colors = [(0.9, 0.2, 0.1, 0.9), (0.1, 0.4, 0.95, 0.8)]
    frames = 5
    mats = []
    for i in range(frames):
        th = 2 * np.pi * i / frames
        a, b = float(np.cos(th)), float(np.sin(th))
        e = 48.0 - a * 48.0 + b * 32.0
        f = 32.0 - b * 48.0 - a * 32.0
        mats.append((a, b, -b, a, e, f))
    mats = np.asarray(mats, np.float32)

    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    out = render_affine_sweep(
        jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
        jnp.asarray(colarr), height, width, fill_rule=rules)
    got = morph_frames_to_u8(np.asarray(out), height, width)

    fields = np.broadcast_to(
        np.asarray(colors, np.float32)[:, None, None, :],
        (len(tables), height, width, 4))
    for i, (a, b, c, d, e, f) in enumerate(mats):
        covs = []
        for t, rule in zip(tables, rules):
            x0, y0, x1, y1 = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
            xt = np.stack([a * x0 + c * y0 + e, b * x0 + d * y0 + f,
                           a * x1 + c * y1 + e, b * x1 + d * y1 + f],
                          1).astype(np.float32)
            covs.append(coverage_numpy(xt, height, width, rule))
        want = np.asarray(premul_to_straight_u8(composite_draws(
            jnp.asarray(np.stack(covs), jnp.float32),
            jnp.asarray(fields))))
        diff = np.abs(got[i].astype(np.int32) - want.astype(np.int32))
        # test_affine_sweep_matches_host_oracle's budget +1: these stars
        # SELF-INTERSECT (winding 2 at the crossings), so the piece-split
        # float order diverges from whole-edge coverage by up to one more
        # un-premultiplied quantum at crossing pixels.
        assert diff.max() <= 3, (i, diff.max())
        assert (diff > 1).mean() < 1e-3

    # Plumbing proof: the same sweep under all-nonzero must differ (the
    # even-odd star's center empties only when its per-layer rule took).
    out_nz = render_affine_sweep(
        jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
        jnp.asarray(colarr), height, width,
        fill_rule=cov.FILL_RULE_NONZERO)
    assert (np.asarray(out_nz) != np.asarray(out)).any()


def _draws(tables, paints, rules):
    return [Draw(edges=t, paint=p, fill_rule=r)
            for t, p, r in zip(tables, paints, rules)]


@pytest.mark.parametrize("backend,quality,path", [
    ("auto", "flash", "flatblock"),
    ("scanline", "flash", "scanline"),
    ("auto", "flash-pointaa", "pointaa"),
    ("direct", "flash", "direct"),
])
def test_renderer_mixed_rules_all_paths(backend, quality, path):
    """Every execute() path accepts per-draw rules; flatblock stays the
    chosen path for mixed-rule scenes, and all paths agree within one u8
    step of the layered oracle (pointaa approximates with 4x4 point
    sampling, so it only checks rule-dependent interiors)."""
    height, width = 48, 200
    tables, paints, rules = _mixed_scene(height, width)
    draws = _draws(tables, paints, rules)
    r = TpuRenderer(width, height, backend=backend, quality=quality)
    out = r.execute(draws)
    assert r._exec_path == path

    if path == "pointaa":
        # Point sampling disagrees with analytic area near the star
        # self-crossings, so the oracle is per-draw SINGLE-rule point
        # coverage composited — isolating the per-plane rule plumbing.
        covs = jnp.concatenate([r._coverage_points([d], d.fill_rule)
                                for d in draws])
        fields = [style_ops.paint_field(p, height, width) for p in paints]
        want = np.asarray(premul_to_straight_u8(
            composite_draws(covs, jnp.stack(fields))))
    else:
        want = _oracle(tables, paints, rules, height, width)
    diff = np.abs(out.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, (path, diff.max())


def test_render_batch_mixed_rules_stays_fused():
    """A batch whose frames share a mixed-rule layer structure rides the
    batched-styled path (previously refused with 'mixed fill rules'), and
    honors each shape's DefineShape4 winding flag."""
    from swf_renderer_tpu.models import ast, display

    def shape(shape_id, color, winding):
        return ast.DefineShape(
            id=shape_id,
            bounds=ast.Rect(x_min=0, x_max=400, y_min=0, y_max=400),
            shape=ast.ShapeBody(
                initial_styles=ast.ShapeStyles(
                    fill=[ast.SolidFill(color=ast.StraightSRgba8(*color))],
                    line=[],
                ),
                records=[
                    ast.StyleChangeRecord(
                        left_fill=None, right_fill=1, line_style=None,
                        move_to=ast.Vector2D(x=0, y=0), new_styles=None),
                    ast.EdgeRecord(delta=ast.Vector2D(x=400, y=0),
                                   control_delta=None),
                    ast.EdgeRecord(delta=ast.Vector2D(x=0, y=400),
                                   control_delta=None),
                    ast.EdgeRecord(delta=ast.Vector2D(x=-400, y=-400),
                                   control_delta=None),
                ],
            ),
            has_fill_winding=winding,
        )

    tag_eo = shape(1, (255, 0, 0, 255), False)   # even-odd
    tag_nz = shape(2, (0, 0, 255, 255), True)    # nonzero (DefineShape4)
    stage = display.Stage(
        width=32, height=32,
        children=[display.ShapeInstance(definition=tag_eo),
                  display.ShapeInstance(definition=tag_nz)],
    )
    r = TpuRenderer(32, 32, honor_fill_winding=True)
    out = r.render_batch([stage, stage])
    assert out.shape == (2, 32, 32, 4)
    assert r.last_stats.path == "batched-styled"
    # Single-stage render agrees and also stays fused.
    single = r.render(stage)
    assert r.last_stats.path == "flatblock"
    np.testing.assert_array_equal(out[0], single)
