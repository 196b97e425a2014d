"""On-chip production-branch pinning (run manually; needs the TPU).

CI runs every Pallas kernel in interpret mode (the CPU-pinned
conftest), which CANNOT see Mosaic-only divergences: the round-3
lessons were the focal-gradient root sign, the scalar-loop coverage
``xb`` parameter, and texfield's DEFAULT-precision bf16 MXU rounding
(0.007 field error, invisible in interpret mode — PERF.md).  This tool
is the committed version of those ad-hoc checks: it compares each
PRODUCTION kernel branch against its oracle ON THE CHIP and prints one
JSON line per check.

Usage (takes a few minutes warm, longer on cold compiles):
    python tools/tpu_pin.py [--out PIN_rNN.json]

``--out`` also writes the per-check records as one JSON document (the
per-round committed artifact, VERDICT r3 #6 — so Mosaic-precision
regressions can't land silently between manual runs).
"""

import json
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

FAILED = []
RECORDS = []


def report(name, max_diff, budget):
    ok = max_diff <= budget
    rec = {"check": name, "max_diff": float(max_diff),
           "budget": budget, "ok": bool(ok)}
    RECORDS.append(rec)
    print(json.dumps(rec), flush=True)
    if not ok:
        FAILED.append(name)


def pin_texfield():
    """texfield MXU kernel (interpret=False) vs the jitted gather
    oracle, all fetch modes.  Budgets: split3 (PRODUCTION default,
    3-pass bf16 dot, round 4) 2e-4; dot_mode='highest' 5e-6 (identical
    weights, 6-pass dots — DEFAULT precision measured 0.007); the row
    window must match the full-row kernel to reduction rounding."""
    import jax
    import jax.numpy as jnp

    from swf_renderer_tpu.ops import style as style_ops
    from swf_renderer_tpu.ops.texfield import (
        auto_ywin, bitmap_field_planes,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (11, 13, 4)).astype(np.uint8)
    invs = []
    for t in np.linspace(0.0, 1.1, 3):
        a, b = 0.2 * np.cos(t), 0.2 * np.sin(t)
        invs.append((a, b, -b, a, -1.0 + t, 2.0 - t))
    invs = np.asarray(invs, np.float32)
    for repeating, smoothed, em, n in (
            (True, True, "flash", 2), (False, True, "flash", 2),
            (False, True, "canvas", 4), (True, False, "flash", 1),
            (False, False, "canvas", 2)):
        p = style_ops.Paint(
            kind=style_ops.PAINT_BITMAP, image=img,
            inv_matrix=tuple(invs[0]), repeating=repeating,
            smoothed=smoothed, edge_mode=em, supersample=n)
        want = np.stack([
            np.asarray(jax.jit(
                lambda iv, _p=p: style_ops.paint_field_traced(
                    _p, iv, 30, 44))(jnp.asarray(iv)))
            for iv in invs])
        got = np.asarray(bitmap_field_planes(
            img, invs, 30, 44, supersample=n, repeating=repeating,
            smoothed=smoothed, edge_mode=em, interpret=False))
        report(f"texfield:{repeating}:{smoothed}:{em}:ss{n}",
               np.abs(want - got).max(), 2e-4)
    # Exact path (ablation/debug mode) stays float-exact.
    p = style_ops.Paint(
        kind=style_ops.PAINT_BITMAP, image=img,
        inv_matrix=tuple(invs[0]), repeating=True, smoothed=True,
        edge_mode="flash", supersample=2)
    want = np.stack([
        np.asarray(jax.jit(
            lambda iv, _p=p: style_ops.paint_field_traced(
                _p, iv, 30, 44))(jnp.asarray(iv)))
        for iv in invs])
    got = np.asarray(bitmap_field_planes(
        img, invs, 30, 44, supersample=2, repeating=True,
        smoothed=True, edge_mode="flash", interpret=False,
        dot_mode="highest"))
    report("texfield:highest", np.abs(want - got).max(), 5e-6)
    # Row-windowed vs full-row production kernel on a tall texture.
    img_t = rng.integers(0, 256, (120, 16, 4)).astype(np.uint8)
    invs_t = np.asarray([
        (0.11, 0.05, -0.05, 0.11, -3.0, 250.7),
        (0.09, -0.04, 0.04, 0.09, 40.0, -80.3)], np.float32)
    yw = auto_ywin(invs_t, 120)
    for repeating in (False, True):
        full = np.asarray(bitmap_field_planes(
            img_t, invs_t, 40, 24, supersample=2, repeating=repeating,
            smoothed=True, edge_mode="flash", interpret=False,
            ywin=None))
        win = np.asarray(bitmap_field_planes(
            img_t, invs_t, 40, 24, supersample=2, repeating=repeating,
            smoothed=True, edge_mode="flash", interpret=False,
            ywin=yw))
        report(f"texfield:ywin:{repeating}",
               np.abs(full - win).max(), 5e-5)


def pin_sweep_skip_paths():
    """Production sweep (skip + prefix plane + auto bps) vs the
    always-heavy kernel on chip, premultiplied u8 budget 1."""
    import jax.numpy as jnp

    from swf_renderer_tpu.ops.morph import morph_frames_to_u8
    from swf_renderer_tpu.ops.transform import (
        affine_pieces, render_affine_sweep,
    )

    rng = np.random.default_rng(11)
    h, w = 96, 640
    pts = rng.uniform((10, 8), (620, 88), (9, 2)).astype(np.float32)
    closed = np.concatenate([pts, pts[:1]])
    tables = [np.concatenate([closed[:-1], closed[1:]], axis=1)]
    mats = []
    for i in range(5):
        th = 2 * np.pi * i / 16
        a, b = np.cos(th), np.sin(th)
        mats.append((a, b, -b, a, 320 - a * 320 + b * 48,
                     48 - b * 320 - a * 48))
    mats = np.asarray(mats, np.float32)
    parts = affine_pieces(tables, [(0.9, 0.4, 0.1, 1.0)], mats)
    args = (jnp.asarray(mats), *(jnp.asarray(x) for x in parts))
    fast = morph_frames_to_u8(np.asarray(render_affine_sweep(
        *args, h, w, interpret=False)), h, w)
    slow = morph_frames_to_u8(np.asarray(render_affine_sweep(
        *args, h, w, skip_empty=False, interpret=False)), h, w)
    ff, sf = fast.astype(np.float64), slow.astype(np.float64)
    fpm = ff[..., :3] * ff[..., 3:4] / 255.0
    spm = sf[..., :3] * sf[..., 3:4] / 255.0
    d = max(np.abs(fpm - spm).max(),
            np.abs(ff[..., 3] - sf[..., 3]).max())
    report("sweep:skip-vs-heavy", d, 1.0)


def pin_flatblock_vs_direct():
    """Flagship fused flat-block vs the direct XLA composite path on
    chip (independent coverage formulations; both run as real TPU
    programs), premul budget 2."""
    import jax.numpy as jnp

    from bench import build_scene_edges
    from swf_renderer_tpu.models.geometry import split_edges_y
    from swf_renderer_tpu.ops.pipeline import (
        render_batch_flatblock, render_solid_batch,
    )

    tables, colors = build_scene_edges(2, 2, 96, 160, shapes_per_layer=4)
    a = np.asarray(render_batch_flatblock(tables, colors, 96, 160))
    e_max = max(max(t.shape[0] for t in ft) for ft in tables)
    split = [[split_edges_y(t) for t in ft] for ft in tables]
    e_max = max(max(t.shape[0] for t in ft) for ft in split)
    et = np.zeros((2, 2, 4, e_max), np.float32)
    for i, ft in enumerate(split):
        for j, t in enumerate(ft):
            et[i, j, :, :t.shape[0]] = t.T
    b = np.asarray(render_solid_batch(
        jnp.asarray(et), jnp.asarray(colors), 96, 160,
        use_pallas=False))
    af, bf = a.astype(np.float64), b.astype(np.float64)
    apm = af[..., :3] * af[..., 3:4] / 255.0
    bpm = bf[..., :3] * bf[..., 3:4] / 255.0
    d = max(np.abs(apm - bpm).max(), np.abs(af[..., 3] - bf[..., 3]).max())
    report("flatblock-vs-direct", d, 2.0)


def pin_sweep_x_shift():
    """Round 4: tile-sharded sweeps pass the shard origin as the
    kernel's x_shift scalar and rasterize on the GLOBAL pixel grid —
    sharded columns must be BIT-identical to the single-device kernel's
    (budget 0).  Run the shard emulation ON CHIP: the SMEM scalar rides
    grid/index arithmetic Mosaic compiles differently from interpret."""
    import jax.numpy as jnp

    from bench import anim_scene
    from swf_renderer_tpu.ops.morph import morph_pieces, render_morph_sweep
    from swf_renderer_tpu.ops.transform import (
        affine_pieces, render_affine_sweep,
    )
    from swf_renderer_tpu.parallel.mesh import _tile_shard_layout

    h = w = 512
    tables, colors, mats = anim_scene(h, w, 6)
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    args = (jnp.asarray(mats), jnp.asarray(tab), jnp.asarray(subxy),
            jnp.asarray(colarr))
    want = np.asarray(render_affine_sweep(*args, h, w))[:, :w]
    ws = w // 8
    layout = _tile_shard_layout(h, w, ws)
    assert layout, "512/8 shards must align to the full-width block"
    diffs = []
    for s in (2, 5):
        got = np.asarray(render_affine_sweep(
            *args, h, ws, x_shift=jnp.asarray([float(s * ws)]),
            **layout))[:, :ws]
        diffs.append(int((got != want[:, s * ws:(s + 1) * ws]).sum()))
    report("sweep:x-shift-affine", max(diffs), 0.0)

    rng = np.random.default_rng(73)
    es = rng.uniform((5, 5), (500, 400), (5, 2)).astype(np.float32)
    closed = np.concatenate([es, es[:1]])
    tbl_s = np.concatenate([closed[:-1], closed[1:]], axis=1)
    tbl_e = tbl_s + rng.uniform(-9, 9, tbl_s.shape).astype(np.float32)
    parts = morph_pieces([(tbl_s, tbl_e, (1, 0, 0, 1), (0, 0.4, 1, 1))])
    ratios = jnp.asarray(np.linspace(0, 1, 5, dtype=np.float32))
    margs = tuple(jnp.asarray(x) for x in parts)
    wantm = np.asarray(render_morph_sweep(ratios, *margs, h, w))[:, :w]
    gotm = np.asarray(render_morph_sweep(
        ratios, *margs, h, ws, x_shift=jnp.asarray([float(3 * ws)])))
    report("sweep:x-shift-morph",
           int((gotm[:, :ws] != wantm[:, 3 * ws:4 * ws]).sum()), 0.0)


def pin_flatblock_stride_shrink():
    """Round 4: LANE-multiple widths shrink the plane by one chunk and
    the packers drop col==width updates (ops/flatblock.plane_geometry).
    Pin the shrunken-geometry fused kernel (256x256: 2 chunks, spp 8)
    against the direct XLA composite ON THE CHIP with full-bleed
    geometry that actually emits the dropped updates."""
    import jax.numpy as jnp

    from bench import build_scene_edges
    from swf_renderer_tpu.models.geometry import split_edges_y
    from swf_renderer_tpu.ops.flatblock import plane_geometry
    from swf_renderer_tpu.ops.pipeline import (
        render_batch_flatblock, render_solid_batch,
    )

    h = w = 256
    assert plane_geometry(h, w)[1] == 2  # the shrink is live
    tables, colors = build_scene_edges(2, 2, h, w, shapes_per_layer=4)
    bleed = np.array([[0, 0, w, 0], [w, 0, w, h],
                      [w, h, 0, h], [0, h, 0, 0]], np.float32)
    tables = [[np.concatenate([t, bleed]) for t in ft] for ft in tables]
    a = np.asarray(render_batch_flatblock(tables, colors, h, w))
    split = [[split_edges_y(t) for t in ft] for ft in tables]
    e_max = max(max(t.shape[0] for t in ft) for ft in split)
    et = np.zeros((2, 2, 4, e_max), np.float32)
    for i, ft in enumerate(split):
        for j, t in enumerate(ft):
            et[i, j, :, :t.shape[0]] = t.T
    b = np.asarray(render_solid_batch(
        jnp.asarray(et), jnp.asarray(colors), h, w, use_pallas=False))
    af, bf = a.astype(np.float64), b.astype(np.float64)
    apm = af[..., :3] * af[..., 3:4] / 255.0
    bpm = bf[..., :3] * bf[..., 3:4] / 255.0
    d = max(np.abs(apm - bpm).max(), np.abs(af[..., 3] - bf[..., 3]).max())
    report("flatblock-stride-shrink", d, 2.0)


def pin_group_composite():
    """Round 4: clip groups + blend modes run as premul-plane algebra
    around the fused kernel (incl. a chained zero-alpha quantize pass).
    Pin the fused program against the layered scanline compositor ON
    CHIP (independent coverage formulations — same premul budget 2 as
    flatblock-vs-direct; the plane algebra itself is XLA elementwise and
    must not add error)."""
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.runtime.renderer import TpuRenderer

    def rect(sid, w, h, color):
        records = (
            ast.StyleChangeRecord(move_to=ast.Vector2D(0, 0), left_fill=1),
            ast.EdgeRecord(delta=ast.Vector2D(w, 0)),
            ast.EdgeRecord(delta=ast.Vector2D(0, h)),
            ast.EdgeRecord(delta=ast.Vector2D(-w, 0)),
            ast.EdgeRecord(delta=ast.Vector2D(0, -h)),
        )
        return ast.DefineShape(
            id=sid, bounds=ast.Rect(0, w, 0, h),
            shape=ast.ShapeBody(
                initial_styles=ast.ShapeStyles(
                    fill=(ast.SolidFill(color=ast.StraightSRgba8(*color)),),
                    line=()),
                records=records))

    back = rect(1, 1600, 1200, (200, 100, 50, 255))
    half = rect(2, 800, 1200, (0, 200, 0, 255))
    blue = rect(3, 1400, 1000, (0, 0, 255, 128))
    red = rect(4, 1400, 1000, (255, 0, 0, 128))
    stage = display.Stage(
        width=80, height=60,
        background_color=ast.StraightSRgba8(0, 0, 0, 0),
        children=(
            display.ShapeInstance(definition=back),
            display.MaskedGroup(
                mask=display.ShapeInstance(definition=half),
                children=(
                    display.ShapeInstance(definition=blue),
                    display.ShapeInstance(definition=red,
                                          blend_mode="multiply"),
                )),
            display.ShapeInstance(definition=rect(5, 1600, 1200,
                                                  (60, 220, 120, 255)),
                                  blend_mode="screen"),
        ))
    a = TpuRenderer(80, 60, backend="auto").render(stage)
    b = TpuRenderer(80, 60, backend="scanline").render(stage)
    af, bf = a.astype(np.float64), b.astype(np.float64)
    apm = af[..., :3] * af[..., 3:4] / 255.0
    bpm = bf[..., :3] * bf[..., 3:4] / 255.0
    d = max(np.abs(apm - bpm).max(), np.abs(af[..., 3] - bf[..., 3]).max())
    report("group-composite-masks-blends", d, 2.0)

    # Round 5: plain-draw mask content routes through the FUSED
    # mask-group pass (render_fused_styled mask_from — content + mask
    # union + over-bg + quantize in ONE kernel chain).  Pin that branch
    # on chip too (the blend scene above falls back to plane algebra).
    stage_f = display.Stage(
        width=80, height=60,
        background_color=ast.StraightSRgba8(0, 0, 0, 0),
        children=(
            display.ShapeInstance(definition=back),
            display.MaskedGroup(
                mask=display.ShapeInstance(definition=half),
                children=(
                    display.ShapeInstance(definition=blue),
                    display.ShapeInstance(definition=red),
                )),
        ))
    a = TpuRenderer(80, 60, backend="auto").render(stage_f)
    b = TpuRenderer(80, 60, backend="scanline").render(stage_f)
    af, bf = a.astype(np.float64), b.astype(np.float64)
    apm = af[..., :3] * af[..., 3:4] / 255.0
    bpm = bf[..., :3] * bf[..., 3:4] / 255.0
    d = max(np.abs(apm - bpm).max(), np.abs(af[..., 3] - bf[..., 3]).max())
    report("group-composite-fused-mask-pass", d, 2.0)


def main():
    from bench import _enable_compile_cache

    _enable_compile_cache()
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    pin_texfield()
    pin_sweep_skip_paths()
    pin_sweep_x_shift()
    pin_flatblock_vs_direct()
    pin_flatblock_stride_shrink()
    pin_group_composite()
    import jax

    doc = {"platform": jax.devices()[0].platform,
           "checks": RECORDS, "failed": FAILED,
           "all_ok": not FAILED}
    if out:
        with open(out, "w") as f:
            json.dump(doc, f, indent=1)
            f.write("\n")
    if FAILED:
        print(json.dumps({"FAILED": FAILED}), flush=True)
        sys.exit(1)
    print(json.dumps({"all_ok": True}), flush=True)


if __name__ == "__main__":
    main()
