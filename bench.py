"""Benchmark harness.

Headline workload (BASELINE.md): multi-layer 1080p, 60-frame batch — the
scanline rasterization pipeline (host cell lowering via the native C++
splitter, device scatter + prefix-sum coverage, premultiplied compositing).
Prints ONE JSON line: ``{"metric", "value", "unit", "vs_baseline"}``.

``vs_baseline`` is the ratio against the 5 Gpx/s north-star target from
/root/repo/BASELINE.json (the reference publishes no numbers of its own).

Timing methodology: every timed call ends in a device-side checksum forced
to a Python float — on the remote-attached TPU runtime plain
``block_until_ready`` can return before device work completes, so only
value-forcing round trips are trusted.  Inputs vary per repetition.

Usage:
    python bench.py              # full 60x1080p benchmark
    python bench.py --smoke      # small, fast smoke run (used by /verify)
    python bench.py --direct     # time the direct Pallas-kernel backend
"""

import json
import os
import signal
import sys
import time

import numpy as np

TARGET_GPX_S = 5.0

# --- Deadline watchdog -----------------------------------------------------
# The driver runs ``python bench.py`` under a timeout; a cold TPU compile over
# the tunnel can exceed it (round 4's BENCH capture died rc=124 with NO
# headline line).  The watchdog guarantees a headline JSON line: once any
# measurement exists it is stashed here, and on SIGALRM the best-so-far is
# printed before exit.  The committed .jax_cache makes the cold-compile case
# rare; this makes it non-fatal.
_BEST: dict = {}
_DEADLINE_S = int(os.environ.get("BENCH_DEADLINE_S", "480"))


def _stash(result: dict) -> None:
    _BEST.clear()
    _BEST.update(result)


def _deadline(signum, frame):
    if _BEST:
        _BEST.setdefault("note", "deadline fallback (partial measurement)")
        print(json.dumps(_BEST), flush=True)
    else:
        cfg = (sys.argv[sys.argv.index("--config") + 1]
               if "--config" in sys.argv else "headline")
        metric = ("fill_rate_1080p60_multilayer_sustained"
                  if cfg == "headline" else f"{cfg}_deadline_fallback")
        print(json.dumps({
            "metric": metric,
            "value": 0.0, "unit": "Gpx/s", "vs_baseline": 0.0,
            "note": f"deadline {_DEADLINE_S}s hit before any measurement "
                    f"completed (cold compile?)"}), flush=True)
    os._exit(0)


def _disarm_watchdog() -> None:
    """Cancel the deadline after the real metric prints: a late alarm
    must not append a stale partial line after a successful run."""
    _BEST.clear()
    try:
        signal.alarm(0)
    except (ValueError, AttributeError):
        pass


def _arm_watchdog() -> None:
    try:
        signal.signal(signal.SIGALRM, _deadline)
        signal.alarm(_DEADLINE_S)
    except (ValueError, AttributeError):
        pass  # non-main thread / platform without SIGALRM


def two_point_fit(run_k, k0=1, k1=9, n_fits=2, reps=5):
    """Sustained per-repetition seconds from a chained-repetition
    two-point fit: ``run_k(k)`` executes ONE call of the jitted
    dynamic-k chain (forcing a checksum) — endpoint noise divides by
    (k1-k0), two full fits guard against minute-scale load epochs on
    the shared chip, and min-of-reps rejects transient contention.
    The headline methodology (bench_flatblock), shared by every config
    so no metric rides a single-fit band (VERDICT r4 #9)."""
    def timed(k):
        run_k(k)  # warm this trip count
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run_k(k)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    fits = []
    t_k0 = None
    for _ in range(n_fits):
        a, b = timed(k0), timed(k1)
        t_k0 = a if t_k0 is None else min(t_k0, a)
        fits.append((b - a) / (k1 - k0))
    return min(fits), t_k0


def build_scene_edges(frames, layers, height, width, shapes_per_layer=16,
                      seed=7):
    """Random multi-shape layered scenes: per (frame, layer) an edge table."""
    rng = np.random.default_rng(seed)
    tables = []
    colors = np.zeros((frames, layers, 4), np.float32)
    radius = max(8.0, min(height, width) / 10.0)
    for i in range(frames):
        per_frame = []
        for j in range(layers):
            segs = []
            for _ in range(shapes_per_layer):
                cx = rng.uniform(0, width)
                cy = rng.uniform(0, height)
                ang = np.sort(rng.uniform(0, 2 * np.pi, 8))
                r = rng.uniform(0.4, 1.0, 8) * radius
                pts = np.stack(
                    [cx + r * np.cos(ang), cy + r * np.sin(ang)], 1
                ).astype(np.float32)
                closed = np.concatenate([pts, pts[:1]])
                segs.append(np.concatenate([closed[:-1], closed[1:]], axis=1))
            per_frame.append(np.concatenate(segs))
            colors[i, j] = rng.uniform(0.1, 1.0, size=4)
        tables.append(per_frame)
    return tables, colors


def bench_morph16() -> None:
    """BASELINE config: morph lerp rasterized at 16 ratio steps, batched
    on device from one pair of edge tables (the hb29 fixture)."""
    import jax
    import jax.numpy as jnp

    from swf_renderer_tpu.models import display
    from swf_renderer_tpu.models.ast_io import load_tag
    from swf_renderer_tpu.models.decode_morph_shape import decode_morph_shape
    from swf_renderer_tpu.models.geometry import Affine, TWIPS_PER_PX
    from swf_renderer_tpu.models.morph_geometry import morph_fill_edge_pairs
    from swf_renderer_tpu.ops.pipeline import render_morph_batch

    tag = load_tag(
        "/root/reference/tests/flat-morph-shapes/homestuck-beta-29/ast.json"
    )
    stage = display.stage_for_morph_shape(tag, 0.0)
    ctm = Affine.scaling(1 / TWIPS_PER_PX, 1 / TWIPS_PER_PX).then(
        Affine.from_swf_matrix(stage.children[0].matrix)
    )
    pairs = morph_fill_edge_pairs(decode_morph_shape(tag), ctm)
    e_max = max(es.shape[0] for es, _, _, _ in pairs)
    e_pad = max(128, ((e_max + 127) // 128) * 128)
    p = len(pairs)
    es = np.zeros((p, 4, e_pad), np.float32)
    ee = np.zeros((p, 4, e_pad), np.float32)
    cs = np.zeros((p, 4), np.float32)
    ce = np.zeros((p, 4), np.float32)
    for i, (a, b, c_s, c_e) in enumerate(pairs):
        es[i, :, : a.shape[0]] = a.T
        ee[i, :, : b.shape[0]] = b.T
        cs[i], ce[i] = c_s, c_e
    # 256 ratio steps: enough device work to amortize the round-trip floor
    # (the BASELINE config's 16 steps complete in far less than the 26 ms
    # tunnel latency).  Two paths are timed:
    #  * device-lerp: edge tables interpolate ON DEVICE (render_morph_batch)
    #  * flagship: ratios lowered host-side (C++ split) into the fused
    #    flat-block pipeline — same path as the headline bench.
    ratios = np.linspace(0, 1, 256, dtype=np.float32)
    args = tuple(jnp.asarray(x) for x in (es, ee, cs, ce, ratios))

    @jax.jit
    def run(*a):
        frames = render_morph_batch(*a, stage.height, stage.width)
        return jnp.sum(frames.astype(jnp.uint32)), frames

    s, _ = run(*args)
    int(s)
    times = []
    for i in range(5):
        varied = (args[0] + i * 1e-6,) + args[1:]
        t0 = time.perf_counter()
        s, _ = run(*varied)
        int(s)
        times.append(time.perf_counter() - t0)
    dt_direct = min(times)

    from swf_renderer_tpu.ops.morph import morph_pieces, render_morph_sweep

    # Flagship morph path: the WHOLE per-ratio pipeline runs on device —
    # host work is one O(edges) piece split, O(1) in the ratio count
    # (round 1 lowered every ratio host-side: seconds for a 256-step
    # sweep the device renders in ~2 ms).
    t0 = time.perf_counter()
    parts = morph_pieces(pairs)
    lower_s = time.perf_counter() - t0
    print(json.dumps({"note": "morph host piece split (ratio-independent)",
                      "seconds": round(lower_s, 4),
                      "pieces": int(parts[0].shape[-1])}), file=sys.stderr)
    fargs = tuple(jnp.asarray(x) for x in parts)
    ratios_j = jnp.asarray(ratios)

    def one_rep(rr, prev):
        out = render_morph_sweep(
            rr + prev * 1e-30, *fargs, stage.height, stage.width)
        return jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12

    @jax.jit
    def run(rr, k):
        return jax.lax.fori_loop(
            0, k, lambda i, acc: one_rep(rr, acc), 0.0)

    float(run(ratios_j, jnp.int32(1)))  # one compile, all trip counts
    # Sustained two-point fit (headline methodology — two fits, min of
    # 5 reps per endpoint): the whole 256-ratio sweep renders in ~1 ms
    # of device time, far under the ~26 ms dispatch floor a single call
    # pays, and the r4 single-fit band swung 15-35 Gpx/s across epochs.
    # Very wide k1: one 256-ratio sweep rep is well under 1 ms of
    # device work, so narrow fits (k1-k0 <= 24) leave the signal inside
    # the ~5 ms tunnel jitter — round-4/5 epochs swung the recorded
    # number 13-122 Gpx/s and once NEGATIVE.  ~200 reps of signal
    # (~100 ms, the headline fit's scale) collapse the band.
    dt_fused, _ = two_point_fit(
        lambda k: float(run(ratios_j, jnp.int32(k))), k0=25, k1=225)
    print(json.dumps({"note": "morph paths",
                      "direct_single_call_ms": round(dt_direct * 1e3, 1),
                      "fused_sustained_ms": round(dt_fused * 1e3, 2)}),
          file=sys.stderr)
    pixels = 256 * stage.height * stage.width
    print(json.dumps({
        "metric": "morph16_batch_sustained",
        "value": round(pixels / dt_fused / 1e6, 2),
        "unit": "Mpx/s",
        "vs_baseline": None,
    }))


def anim_scene(h: int, w: int, frames: int):
    """The anim-config scene: 3 layers x 12 random blobs (local-space
    edge tables) + a full-turn rotation track about the frame center.
    Shared with tools/exp_* ablations so they measure the bench scene."""
    rng = np.random.default_rng(9)
    tables, colors = [], []
    for lyr in range(3):
        segs = []
        for _ in range(12):
            cx = rng.uniform(100, w - 100)
            cy = rng.uniform(60, h - 60)
            ang = np.sort(rng.uniform(0, 2 * np.pi, 10))
            r = rng.uniform(15, 60, 10)
            pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)],
                           1).astype(np.float32)
            closed = np.concatenate([pts, pts[:1]])
            segs.append(np.concatenate([closed[:-1], closed[1:]], axis=1))
        tables.append(np.concatenate(segs))
        colors.append(rng.uniform(0.2, 1.0, 4))

    mats = []
    for i in range(frames):
        th = 2 * np.pi * i / frames
        a, b = np.cos(th), np.sin(th)
        cx, cy = w / 2.0, h / 2.0
        mats.append((a, b, -b, a, cx - a * cx + b * cy,
                     cy - b * cx - a * cy))
    return tables, colors, np.asarray(mats, np.float32)


def tiled_frame_fit(timed, tracks, frames: int,
                    px_per_frame: int) -> float:
    """Sustained per-frame seconds via a tiled two-point fit over the
    FRAME axis.  ``tracks``: tuple of np arrays with frames on axis 0
    (None entries pass through untiled); ``timed(tracks)`` -> seconds
    for one full call (it should run warm repetitions and force a
    checksum).  The track is tiled with tiny perturbations so the
    k1-k0 signal is tens of ms — a sub-frame-count delta sits below the
    ~5 ms tunnel jitter (which once produced NEGATIVE fits) — capped by
    ~1 GB of packed-u32 output.  A wrapping fori_loop is NOT an option:
    XLA stack-allocates the sweep's whole output in scoped VMEM.
    Shared with tools/exp_sweepcost.py so ablations measure with the
    bench methodology."""
    budget = max(2, int(1.0e9 // (px_per_frame * 4)))
    mult = max(2, min(8, budget // frames))

    def tile(arr):
        if arr is None:
            return None
        # The per-tile perturbation must change the f32 BITS for EVERY
        # magnitude: round 5's bake_sweep_fields dedups byte-identical
        # frame matrices, and a below-resolution additive nudge (1e-9,
        # then 1e-6 for entries > ~16) let the k1 arm skip its extra
        # bakes and over-report (animtex read 807 Mpx/s).  A RELATIVE
        # 2x-ulp scale is distinct at any magnitude and visually nil.
        return np.concatenate([arr * (1.0 + np.float32(k) * 2.5e-7)
                               for k in range(mult)])

    t_k0 = timed(tracks)
    t_k1 = timed(tuple(tile(a) for a in tracks))
    return (t_k1 - t_k0) / (frames * (mult - 1))


def bench_anim(h: int = 512, w: int = 512, frames: int = 60,
               label: str = "anim_rotation_512x512x60_sustained",
               gradient: bool = False) -> None:
    """VERDICT r3 config: transform ANIMATION — one shape set, 60 frames
    of per-frame rotation, rasterized fully on device (ops/transform.py).
    Host cost is O(edges), independent of the frame count: the piece
    tables upload once and every frame's affine applies in-kernel (the
    reference's matrix-at-draw-time replay, canvas-renderer.ts:179-184,
    batched).  ``gradient``: layer 1 gets an in-kernel linear-gradient
    paint whose stop colors FADE per frame (styled sweep; per-frame
    composed matrices AND per-frame stop colors from SMEM — the dynamic
    color-transform path, not the static-stop one)."""
    import jax
    import jax.numpy as jnp

    from swf_renderer_tpu.ops.transform import (
        affine_pieces, render_affine_sweep, sweep_paints,
    )
    tables, colors, mats = anim_scene(h, w, frames)

    kpaints = grad_mats = stop_colors = None
    if gradient:
        from swf_renderer_tpu.ops import style as style_ops

        base_stops = np.array([[1, 0.2, 0, 1], [0, 1, 0.5, 0.8],
                               [0.2, 0, 1, 1]], np.float32)
        paints = [style_ops.solid_paint(tuple(c)) for c in colors]
        paints[1] = style_ops.Paint(
            kind=style_ops.PAINT_LINEAR,
            inv_matrix=(2.0 * 16384.0 / w, 0.0, 0.0, 2.0 * 16384.0 / w,
                        -16384.0, -16384.0 * h / w),
            stop_ratios=np.array([0.0, 0.5, 1.0], np.float32),
            stop_colors=base_stops)
        kpaints, grad_mats = sweep_paints(paints, mats)
        # Per-frame stop-color FADES (the dynamic ct path): alpha ramps
        # 1.0 -> 0.4 over the animation, exercising the SMEM stop
        # window every frame.
        stop_colors = np.zeros((frames, len(paints), 3, 4), np.float32)
        fade = np.linspace(1.0, 0.4, frames, dtype=np.float32)
        stop_colors[:, 1] = base_stops[None] * fade[:, None, None]

    t0 = time.perf_counter()
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    lower_s = time.perf_counter() - t0
    print(json.dumps({
        "note": "anim host piece split (frame-count-independent)",
        "seconds": round(lower_s, 4),
        "pieces": int(tab.shape[-1]), "frames": frames}), file=sys.stderr)

    fargs = tuple(jnp.asarray(x) for x in (tab, subxy, colarr))

    # Sustained two-point fit over the FRAME COUNT (tiled_frame_fit).
    def timed(tracks):
        mm_np, gm_np, sc_np = tracks
        mm = jnp.asarray(mm_np)
        gm = None if gm_np is None else jnp.asarray(gm_np)
        sc = None if sc_np is None else jnp.asarray(sc_np)
        ts = []
        for i in range(4):
            varied = mm + np.float32(i) * 1e-12
            t0 = time.perf_counter()
            out = render_affine_sweep(varied, *fargs, h, w,
                                      paints=kpaints, grad_mats=gm,
                                      stop_colors=sc)
            int(jnp.sum(out[:, ::64, ::64].astype(jnp.uint32)))
            ts.append(time.perf_counter() - t0)
        return min(ts[1:])  # [0] may include compile

    dt_frame = tiled_frame_fit(timed, (mats, grad_mats, stop_colors),
                               frames, w * h)
    print(json.dumps({"note": "anim per-frame device time",
                      "ms": round(dt_frame * 1e3, 3)}), file=sys.stderr)
    print(json.dumps({
        "metric": label,
        "value": round(h * w / dt_frame / 1e6, 2),
        "unit": "Mpx/s",
        "vs_baseline": None,
    }))


def bench_animtex(h: int = 512, w: int = 512, frames: int = 60) -> None:
    """Transform animation with a BITMAP-filled layer: the sweep kernel
    reads per-(frame, column block) field planes baked on device
    (ops.transform.bake_sweep_fields — the pattern analog of the
    reference's matrix-at-draw-time replay, canvas-renderer.ts:295-315).
    The timed path includes the per-frame bake (it IS per-frame device
    work), so the metric is the true sustained cost of an animating
    textured scene; host work stays O(edges) + O(frames) 2x2 matrix
    inversions."""
    import jax.numpy as jnp

    from swf_renderer_tpu.ops import style as style_ops
    from swf_renderer_tpu.ops.transform import (
        affine_pieces, bake_sweep_fields, render_affine_sweep,
        sweep_paints,
    )

    tables, colors, mats = anim_scene(h, w, frames)
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (64, 64, 4)).astype(np.uint8)
    paints = [style_ops.solid_paint(tuple(c)) for c in colors]
    paints[1] = style_ops.Paint(
        kind=style_ops.PAINT_BITMAP,
        inv_matrix=(96.0 / w, 0.0, 0.0, 96.0 / w, 0.0, 0.0),
        image=img, repeating=True, smoothed=True, supersample=2)

    t0 = time.perf_counter()
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    lower_s = time.perf_counter() - t0
    print(json.dumps({
        "note": "animtex host piece split (frame-count-independent)",
        "seconds": round(lower_s, 4),
        "pieces": int(tab.shape[-1]), "frames": frames}), file=sys.stderr)
    fargs = tuple(jnp.asarray(x) for x in (tab, subxy, colarr))

    def timed(tracks):
        (mm_np,) = tracks
        ts = []
        for i in range(4):
            varied_np = mm_np + np.float32(i) * 1e-12
            t0 = time.perf_counter()
            kp, gm, specs = sweep_paints(paints, varied_np,
                                         allow_fields=True)
            fields = bake_sweep_fields(specs, h, w)
            out = render_affine_sweep(
                jnp.asarray(varied_np), *fargs, h, w, paints=kp,
                grad_mats=None if gm is None else jnp.asarray(gm),
                fields=fields)
            int(jnp.sum(out[:, ::64, ::64].astype(jnp.uint32)))
            ts.append(time.perf_counter() - t0)
        return min(ts[1:])  # [0] may include compile

    dt_frame = tiled_frame_fit(timed, (mats,), frames, w * h)
    print(json.dumps({"note": "animtex per-frame device time",
                      "ms": round(dt_frame * 1e3, 3)}), file=sys.stderr)
    print(json.dumps({
        "metric": f"anim_bitmap_{h}x{w}x{frames}_sustained",
        "value": round(h * w / dt_frame / 1e6, 2),
        "unit": "Mpx/s",
        "vs_baseline": None,
    }))


def bench_interactive(h: int = 1088, w: int = 1920,
                      frames: int = 24) -> None:
    """Interactive single-frame loop: repeated ``render(stage)`` calls
    with per-frame rotation matrices over ONE definition.  Frames 1+
    upgrade to the F=1 on-device transform sweep with cached local
    pieces (renderer._render_frame_sweep) — per-frame host work is an
    O(edges) split-validity check instead of the flatten/split/pack
    chain.  Reported per-frame wall time INCLUDES the ~26 ms tunnel
    dispatch floor (see CLAUDE.md); the cold number re-renders each
    frame with a fresh renderer for the full-lowering comparison."""
    from swf_renderer_tpu.models import ast, display
    from swf_renderer_tpu.runtime.renderer import TpuRenderer
    from swf_renderer_tpu.utils.fixed import Sfixed16P16 as S

    rng = np.random.default_rng(9)
    tables, colors, _ = anim_scene(h, w, 2)
    fills = [ast.SolidFill(color=ast.StraightSRgba8(
        *(np.clip(np.asarray(c) * 255, 0, 255).astype(int))))
        for c in colors]
    records = []
    for li, tbl in enumerate(tables):
        # Each layer's blobs: consecutive edge rows chain; a row whose
        # start differs from the previous end starts a new subpath.
        prev = None
        for row in tbl:
            x0, y0, x1, y1 = (int(round(v * 20)) for v in row)
            if prev != (x0, y0):
                records.append(ast.StyleChangeRecord(
                    left_fill=li + 1, move_to=ast.Vector2D(x=x0, y=y0)))
                cur = (x0, y0)
            records.append(ast.EdgeRecord(
                delta=ast.Vector2D(x=x1 - cur[0], y=y1 - cur[1])))
            cur = (x1, y1)
            prev = cur
    tag = ast.DefineShape(
        id=1, bounds=ast.Rect(0, w * 20, 0, h * 20),
        shape=ast.ShapeBody(
            initial_styles=ast.ShapeStyles(fill=tuple(fills), line=()),
            records=tuple(records)))

    def stage_for(i):
        th = 2 * np.pi * i / (2 * frames)
        a, b = np.cos(th), np.sin(th)
        cx, cy = w * 10.0, h * 10.0  # twips center
        m = ast.Matrix(
            scale_x=S.from_value(a), scale_y=S.from_value(a),
            rotate_skew0=S.from_value(b), rotate_skew1=S.from_value(-b),
            translate_x=int(round(cx - a * cx + b * cy)),
            translate_y=int(round(cy - b * cx - a * cy)))
        return display.Stage(width=w, height=h, children=[
            display.ShapeInstance(definition=tag, matrix=m)])

    stages = [stage_for(i) for i in range(frames)]
    r = TpuRenderer(w, h)
    warm = []
    paths = []
    for s in stages:
        t0 = time.perf_counter()
        out = r.render(s)
        int(out[::256, ::256].sum())
        warm.append(time.perf_counter() - t0)
        paths.append(r.last_stats.path)
    warm_up = [t for t, p in zip(warm, paths)
               if p == "transform-sweep-1f"]
    if not warm_up:
        raise RuntimeError(
            f"no frame upgraded to the interactive sweep (paths: "
            f"{sorted(set(paths))}) — the fast-path gates regressed")
    warm_ms = float(np.median(warm_up)) * 1e3
    print(json.dumps({
        "note": "interactive loop paths",
        "upgraded": len(warm_up), "frames": frames,
        "first_frame_ms": round(warm[0] * 1e3, 1),
        "warm_wall_ms": round(warm_ms, 1)}), file=sys.stderr)

    # Transport + device floor: repeated renders of ONE unchanged stage
    # (packed-cache steady state) pay the same tunnel frame download and
    # kernel dispatch with ~zero host geometry — the wall component the
    # render() API cannot avoid on this remote setup (~32 MB/s tunnel;
    # local PCIe makes it <1 ms).
    rfloor = TpuRenderer(w, h)
    floor = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = rfloor.render(stages[0])
        int(out[::256, ::256].sum())
        floor.append(time.perf_counter() - t0)
    floor_ms = float(np.median(floor[2:])) * 1e3
    print(json.dumps({
        "note": "interactive identical-repeat floor ms "
                "(transport + device, zero host geometry)",
        "median": round(floor_ms, 1)}), file=sys.stderr)

    cold = []
    for s in stages[1:1 + max(4, frames // 4)]:
        rc = TpuRenderer(w, h)
        t0 = time.perf_counter()
        out = rc.render(s)
        int(out[::256, ::256].sum())
        cold.append(time.perf_counter() - t0)
    cold_ms = float(np.median(cold)) * 1e3
    print(json.dumps({
        "note": "interactive cold per-frame ms (fresh renderer, full "
                "lowering)",
        "median": round(cold_ms, 1),
        "cold_host_over_floor_ms": round(cold_ms - floor_ms, 1)}),
        file=sys.stderr)
    print(json.dumps({
        "metric": f"interactive_novel_matrix_host_ms_{h}p",
        "value": round(max(0.0, warm_ms - floor_ms), 2),
        "unit": "ms",
        "vs_baseline": None,
    }))


def bench_masked(h: int = 1088, w: int = 1920, layers: int = 4,
                 frames: int = 60, fused: bool = True,
                 emit_metric: bool = True) -> float:
    """Clip-group throughput: a 1080p multi-layer scene whose top half
    of layers sits inside a MaskedGroup, as the fused masked program
    (round-4 feature): pre-layers -> premul planes, white mask pass,
    content pass, plane algebra, chained zero-alpha quantize pass.
    Headline methodology — packs upload ONCE, the whole program chains
    k times inside one jit (fori), two-point fit cancels dispatch."""
    import jax
    import jax.numpy as jnp

    from swf_renderer_tpu.ops.flatblock import (
        plane_geometry, render_fused_styled, strips_per_plane,
    )
    from swf_renderer_tpu.ops.pipeline import (
        _pack_styled, kernel_paints_for,
    )
    from swf_renderer_tpu.ops.style import solid_paint

    GROUP = 6
    _, nc_geo, ns_geo = plane_geometry(h, w)
    spp = strips_per_plane(nc_geo, ns_geo)
    tables, colors = build_scene_edges(frames, layers, h, w)
    mask_rect = np.array(
        [[0, 0, w * 2 / 3, 0], [w * 2 / 3, 0, w * 2 / 3, h],
         [w * 2 / 3, h, 0, h], [0, h, 0, 0]], np.float32)
    half = layers // 2

    def segment(sub_tables, sub_paints, sub_colors):
        kpaints, fields, _ = kernel_paints_for(sub_paints, h, w, spp=spp)
        packed = _pack_styled(sub_tables, h, w, GROUP, spp, None,
                              len(sub_paints))
        args = tuple(jnp.asarray(x) for x in packed[:6])
        return (args, jnp.asarray(sub_colors), fields, kpaints,
                packed[6], packed[7], len(sub_paints))

    pre = segment([per[:half] for per in tables],
                  [solid_paint(tuple(colors[0, j])) for j in range(half)],
                  colors[:, :half])
    # Round-5 fused mask-group pass (VERDICT r4 #5): content layers +
    # the mask layer render in ONE kernel chain (mask_from) that also
    # quantizes over the pre planes — 2 full-frame chains instead of 4
    # (pre/mask/content/quantize), float-op identical (pinned by
    # tests/test_masks.py and tpu_pin).
    contmask = segment(
        [per[half:] + [mask_rect] for per in tables],
        [solid_paint(tuple(colors[0, j])) for j in range(half, layers)]
        + [solid_paint((1.0, 1.0, 1.0, 1.0))],
        np.concatenate([colors[:, half:],
                        np.ones((frames, 1, 4), np.float32)], axis=1))
    n_content = layers - half
    # The round-4 plane-algebra arms (perf_pin A/B: fused=False).
    mask = segment([[mask_rect]] * frames,
                   [solid_paint((1.0, 1.0, 1.0, 1.0))],
                   np.ones((frames, 1, 4), np.float32))
    content = segment([per[half:] for per in tables],
                      [solid_paint(tuple(colors[0, j]))
                       for j in range(half, layers)],
                      colors[:, half:])
    final = segment([[np.zeros((0, 4), np.float32)]] * frames,
                    [solid_paint((1.0, 1.0, 1.0, 1.0))],
                    np.zeros((frames, 1, 4), np.float32))

    def seg_run(seg, perturb, bg=None, emit="premul", mask_from=None,
                chain=None):
        args, colors_j, fields, kpaints, s_ns, s_nc, nl = seg
        if chain is None:
            chain = bg is not None and mask_from is None
        return render_fused_styled(
            args[0], args[1], args[2], args[3], args[4],
            args[5] + perturb, colors_j, fields, frames, nl, s_ns, s_nc,
            kpaints, group=GROUP, spp=spp, chain=chain, bg=bg,
            emit=emit, mask_from=mask_from)

    def one_rep(prev):
        eps = prev * 1e-30
        pre_p = seg_run(pre, eps)
        if fused:
            out = seg_run(contmask, eps, bg=pre_p, emit="u32",
                          mask_from=n_content)
        else:
            mask_p = seg_run(mask, eps)
            content_p = seg_run(content, eps)
            scaled = content_p * mask_p[:, :, 3:4]
            comb = scaled + pre_p * (1.0 - scaled[:, :, 3:4])
            out = seg_run(final, eps, bg=comb, emit="u32", chain=True)
        return jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12

    @jax.jit
    def run(k):
        return jax.lax.fori_loop(0, k, lambda i, acc: one_rep(acc), 0.0)

    float(run(jnp.int32(1)))
    dt, _ = two_point_fit(lambda k: float(run(jnp.int32(k))), k0=1, k1=5)
    gpx = frames * h * w / dt / 1e9
    label = ("fused content*mask-over-pre quantize pass" if fused
             else "round-4 plane-algebra program (4 passes)")
    print(json.dumps({"note": f"masked program: pre pass + {label}",
                      "ms_per_frame": round(dt / frames * 1e3, 3)},
                     ), file=sys.stderr)
    if emit_metric:
        print(json.dumps({
            "metric": "fill_rate_1080p_masked_sustained",
            "value": round(gpx, 3), "unit": "Gpx/s",
            "vs_baseline": round(gpx / 5.0, 3),
        }))
    return gpx


def bench_style(kind: str) -> None:
    """BASELINE configs rendered END-TO-END: real multi-shape geometry is
    lowered, packed, and rasterized through the styled fused flat-block
    kernel — gradients evaluated in-kernel, bitmap fills streamed as field
    planes — exactly the public render path (render_batch_styled).

    'textured' = bitmap fill over 1024x1024 x32 frames;
    'gradients' = linear + focal-radial fills at 512x512 x64 frames."""
    import jax
    import jax.numpy as jnp

    from swf_renderer_tpu.native.bindings import pack_grouped_native
    from swf_renderer_tpu.ops import style as style_ops
    from swf_renderer_tpu.ops.flatblock import render_fused_styled
    from swf_renderer_tpu.ops.pipeline import (
        kernel_paints_for, lower_update_lists,
    )

    rng = np.random.default_rng(3)
    if kind == "textured":
        h = w = 1024
        batch = 32
        img = rng.integers(0, 256, (139, 208, 4)).astype(np.uint8)
        scale = 7.75
        paints = [
            style_ops.Paint(
                kind=style_ops.PAINT_BITMAP,
                inv_matrix=(1 / scale, 0.0, 0.0, 1 / scale, 0.0, 0.0),
                image=img, repeating=True, smoothed=True, supersample=4,
            ),
        ]
    else:
        h = w = 512
        batch = 64
        stops_r = np.array([0.0, 1.0], np.float32)
        stops_c = np.array([[1, 0, 0, 1], [0, 0, 1, 1]], np.float32)
        paints = [
            style_ops.Paint(
                kind=style_ops.PAINT_LINEAR,
                inv_matrix=(64.0, 0.0, 0.0, 64.0, -16384.0, -16384.0),
                stop_ratios=stops_r, stop_colors=stops_c,
            ),
            style_ops.Paint(
                kind=style_ops.PAINT_FOCAL,
                inv_matrix=(64.0, 0.0, 0.0, 64.0, -16384.0, -16384.0),
                stop_ratios=stops_r, stop_colors=stops_c, focal_point=0.4,
            ),
        ]
    layers = len(paints)

    GROUP = 6
    from swf_renderer_tpu.ops.flatblock import (
        plane_geometry, strips_per_plane,
    )

    _, nc_geo, ns_geo = plane_geometry(h, w)
    spp = strips_per_plane(nc_geo, ns_geo)
    tables, _ = build_scene_edges(batch, layers, h, w, seed=11)
    t0 = time.perf_counter()
    update_lists = lower_update_lists(tables, h, w)
    gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
        update_lists, h, w, group=GROUP, spp=spp)
    lower_s = time.perf_counter() - t0
    kpaints, fields, base_colors = kernel_paints_for(paints, h, w, spp=spp)
    colors = np.broadcast_to(base_colors, (batch, layers, 4))
    print(json.dumps({"note": f"{kind} host lowering",
                      "seconds": round(lower_s, 3),
                      "strips_per_plane": spp,
                      "groups": int(len(gsi))}), file=sys.stderr)

    args = tuple(jnp.asarray(x) for x in (gsi, gfl, gla, grc, gcm, gvv))
    colors_j = jnp.asarray(colors)

    def one_rep(uv, prev):
        out = render_fused_styled(
            args[0], args[1], args[2], args[3], args[4],
            uv + prev * 1e-30, colors_j, fields, batch, layers, ns, nc,
            kpaints, group=GROUP, spp=spp)
        return jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12

    @jax.jit
    def run(uv, k):
        return jax.lax.fori_loop(
            0, k, lambda i, acc: one_rep(uv, acc), 0.0)

    float(run(args[5], jnp.int32(1)))
    # Sustained two-point fit (headline methodology).
    dt, _ = two_point_fit(lambda k: float(run(args[5], jnp.int32(k))),
                          k0=1, k1=5)
    print(json.dumps({
        "metric": f"{kind}_{h}x{w}_sustained",
        "value": round(batch * h * w / dt / 1e6, 2),
        "unit": "Mpx/s",
        "vs_baseline": None,
    }))


def _enable_compile_cache() -> None:
    """Persist compiled executables: remote TPU compiles take minutes, and
    the cache makes repeat bench runs (e.g. the driver's) near-instant."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def bench_flatblock(tables, colors, frames, layers, height, width,
                    metric="fill_rate_1080p60_multilayer_sustained",
                    vs_target=True) -> None:
    """Headline: flat-block pipeline (scatter-free MXU placement + fused
    resolve to packed u32), timed as SUSTAINED throughput.

    BASELINE.md's target is a *sustained* fill rate, so K repetitions are
    chained inside one jit (each repetition's values data-depend on the
    previous checksum so XLA cannot collapse them — the perturbation is
    denormal-scale and leaves results bit-identical) and the per-repetition
    time comes from a two-point fit, which cancels the fixed dispatch +
    tunnel round-trip latency (~26 ms on the remote-attached chip).  The
    single-call latency is reported separately on stderr."""
    import jax
    import jax.numpy as jnp

    from swf_renderer_tpu.native.bindings import pack_grouped_native
    from swf_renderer_tpu.ops.flatblock import (
        plane_geometry, render_fused_blocksn, strips_per_plane,
    )
    from swf_renderer_tpu.ops.pipeline import lower_update_lists

    GROUP = 6
    _, nc_geo, ns_geo = plane_geometry(height, width)
    spp = strips_per_plane(nc_geo, ns_geo)
    # Steady-state host path: the packed-scene cache persists across bench
    # runs (the serving deployment's warm state — re-rendering known
    # geometry costs one content hash).  Cold runs do the full native
    # split + thread-pooled pack and populate it.
    from swf_renderer_tpu.runtime.cache import PackedSceneCache

    import pathlib

    cache = PackedSceneCache(
        capacity=4,
        directory=str(pathlib.Path(__file__).resolve().parent
                      / ".bench_cache"))
    t0 = time.perf_counter()
    key = cache.key_for(tables, height, width, GROUP, spp=spp)
    packed = cache.get(key)
    if packed is not None:
        gsi, gfl, gla, grc, gcm, gvv, ns, nc = packed
        lower_s = time.perf_counter() - t0
        print(json.dumps({"note": "host delta lowering + block packing",
                          "seconds": round(lower_s, 3),
                          "cache": "hit",
                          "groups": int(len(gsi))}), file=sys.stderr)
    else:
        update_lists = lower_update_lists(tables, height, width)
        split_s = time.perf_counter() - t0
        gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
            update_lists, height, width, group=GROUP, spp=spp)
        cache.put(key, (gsi, gfl, gla, grc, gcm, gvv, ns, nc))
        lower_s = time.perf_counter() - t0
        print(json.dumps({"note": "host split seconds",
                          "seconds": round(split_s, 3),
                          "strips_per_plane": spp}), file=sys.stderr)
        print(
            json.dumps({"note": "host delta lowering + block packing",
                        "seconds": round(lower_s, 3),
                        "cache": "cold",
                        "groups": int(len(gsi))}),
            file=sys.stderr,
        )

    args = tuple(jnp.asarray(x) for x in (gsi, gfl, gla, grc, gcm, gvv))
    colors_j = jnp.asarray(colors)

    def one_rep(uv, prev):
        out = render_fused_blocksn(
            args[0], args[1], args[2], args[3], args[4],
            uv + prev * 1e-30, colors_j, frames, layers, ns, nc,
            group=GROUP, spp=spp)
        return jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12

    # ONE compiled program for every repetition count: k is a traced scalar
    # driving a dynamic-bound fori_loop, so the two-point fit costs a single
    # TPU compile instead of one per k (halves cold-cache wall time — the
    # round-4 driver capture died inside the second compile).
    @jax.jit
    def run(uv, k):
        return jax.lax.fori_loop(
            0, k, lambda i, acc: one_rep(uv, acc), 0.0)

    t0 = time.perf_counter()
    # jnp.int32, not a Python int: a weak-typed warm call creates a
    # SECOND jit cache entry and the timed calls retrace (review r5).
    float(run(args[5], jnp.int32(1)))  # compile + warm
    print(json.dumps({"note": "compile + first call seconds",
                      "seconds": round(time.perf_counter() - t0, 1)}),
          file=sys.stderr, flush=True)

    pixels = frames * height * width

    def timed(k):
        kj = jnp.int32(k)
        float(run(args[5], kj))  # warm this trip count
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(args[5], kj))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # Wide two-point fit: noise in each endpoint is divided by (k1-k0)=8,
    # which keeps shared-chip jitter out of the recorded number; two full
    # fits guard against minute-scale load epochs on the shared chip.
    k0, k1 = 1, 9
    fits = []
    t_k0 = None

    def emit(dt, partial=False):
        gpx_s = pixels / dt / 1e9
        result = {
            "metric": metric,
            "value": round(gpx_s, 4),
            "unit": "Gpx/s",
            "vs_baseline": (round(gpx_s / TARGET_GPX_S, 4)
                            if vs_target else None),
        }
        if partial:
            _stash(result)
        else:
            print(json.dumps(result), flush=True)
            _disarm_watchdog()
        return result

    for _ in range(2):
        a, b = timed(k0), timed(k1)
        t_k0 = a if t_k0 is None else min(t_k0, a)
        fits.append((b - a) / (k1 - k0))
        emit(min(fits), partial=True)  # watchdog fallback after fit 1
    dt = min(fits)
    print(
        json.dumps({"note": "latency (single call, incl. dispatch)",
                    "ms": round(t_k0 * 1e3, 1)}),
        file=sys.stderr,
    )
    emit(dt)


def main() -> None:
    _enable_compile_cache()
    _arm_watchdog()
    smoke = "--smoke" in sys.argv
    direct = "--direct" in sys.argv
    if "--config" in sys.argv:
        cfg = sys.argv[sys.argv.index("--config") + 1]
        if cfg == "morph16":
            return bench_morph16()
        if cfg == "anim":
            return bench_anim()
        if cfg == "anim1080":
            return bench_anim(
                h=1088, w=1920, frames=60,
                label="anim_rotation_1080px60_sustained")
        if cfg == "animgrad":
            return bench_anim(
                label="anim_gradient_512x512x60_sustained",
                gradient=True)
        if cfg == "animtex":
            return bench_animtex()
        if cfg == "interactive":
            return bench_interactive()
        if cfg == "masked":
            return bench_masked()
        if cfg in ("textured", "gradients"):
            return bench_style(cfg)
        if cfg == "flat256":
            # BASELINE workload: flat solid shapes at 256x256, batched
            # deep enough to amortize the dispatch floor.
            f, l, h, w = 256, 2, 256, 256
            tables, colors = build_scene_edges(f, l, h, w,
                                               shapes_per_layer=8)
            return bench_flatblock(
                tables, colors, f, l, h, w,
                metric="flat_shapes_256x256_sustained", vs_target=False)
        if cfg == "latency":
            # Serving latency: ONE 1080p frame through the flagship kernel,
            # pre-lowered scene (the PackedSceneCache steady state).  The
            # two-point fit isolates device latency from the ~26 ms tunnel
            # dispatch floor, which is also reported.
            import jax
            import jax.numpy as jnp

            from swf_renderer_tpu.native.bindings import (
                cells_split_delta_native, pack_grouped_native,
            )
            from swf_renderer_tpu.ops.flatblock import render_fused_blocksn

            f, l, h, w = 1, 4, 1088, 1920
            tables, colors = build_scene_edges(f, l, h, w)
            ul = [[cells_split_delta_native(t, h, w) for t in ft]
                  for ft in tables]
            gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
                ul, h, w, group=6)
            a = tuple(jnp.asarray(x)
                      for x in (gsi, gfl, gla, grc, gcm, gvv))
            colors_j = jnp.asarray(colors)

            def one(uv, prev):
                out = render_fused_blocksn(
                    a[0], a[1], a[2], a[3], a[4], uv + prev * 1e-30,
                    colors_j, f, l, ns, nc, group=6)
                return jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12

            @jax.jit
            def run(uv, k):
                return jax.lax.fori_loop(
                    0, k, lambda i, acc: one(uv, acc), 0.0)

            float(run(a[5], jnp.int32(1)))
            t1 = None
            for _ in range(5):
                t0 = time.perf_counter()
                float(run(a[5], jnp.int32(1)))
                dt1 = time.perf_counter() - t0
                t1 = dt1 if t1 is None else min(t1, dt1)
            # Wide fit: one 1080p frame is ~0.5 ms of device work, so a
            # k1-k0 of 8 sits under the ~5 ms tunnel jitter (a loaded
            # epoch measured NEGATIVE); ~200 reps of signal stabilize.
            dt, _ = two_point_fit(
                lambda k: float(run(a[5], jnp.int32(k))), k0=25, k1=225)
            dev_ms = dt * 1e3
            print(json.dumps({"note": "single-call wall incl. dispatch",
                              "ms": round(t1 * 1e3, 2)}), file=sys.stderr)
            print(json.dumps({
                "metric": "frame_latency_1080p_device",
                "value": round(dev_ms, 3), "unit": "ms",
                "vs_baseline": None,
            }))
            return
        if cfg == "wide4k":
            # 4K frames ride the flagship kernel on the grown 256-sublane
            # plane (VERDICT round 1: was a ~1.2 Gpx/s scatter fallback).
            f, l, h, w = 15, 4, 2160, 3840
            tables, colors = build_scene_edges(f, l, h, w)
            return bench_flatblock(
                tables, colors, f, l, h, w,
                metric="fill_rate_4k15_multilayer_sustained")
        raise SystemExit(f"unknown config {cfg}")

    import jax
    import jax.numpy as jnp

    if smoke:
        frames, layers, height, width, reps = 2, 2, 64, 256, 3
    else:
        frames, layers, height, width, reps = 60, 4, 1088, 1920, 5

    tables, colors = build_scene_edges(frames, layers, height, width)

    if direct:
        from swf_renderer_tpu.models.geometry import split_edges_y
        from swf_renderer_tpu.ops.pipeline import render_solid_batch

        split = [[split_edges_y(t) for t in ft] for ft in tables]
        max_e = max(t.shape[0] for ft in split for t in ft)
        e_pad = max(128, ((max_e + 127) // 128) * 128)
        edges_t = np.zeros((frames, layers, 4, e_pad), np.float32)
        for i in range(frames):
            for j in range(layers):
                t = split[i][j]
                edges_t[i, j, :, : t.shape[0]] = t.T

        @jax.jit
        def run(e, c):
            frames_out = render_solid_batch(e, c, height, width)
            return jnp.sum(frames_out.astype(jnp.uint32)), frames_out

        base_args = (jnp.asarray(edges_t), jnp.asarray(colors))
        variant = lambda i: (base_args[0] + i * 1e-6, base_args[1])
    else:
        return bench_flatblock(tables, colors, frames, layers,
                               height, width)

    # Warm up / compile.
    checksum, _ = run(*base_args)
    checksum = int(checksum)

    times = []
    for i in range(reps):
        args_i = variant(i)
        t0 = time.perf_counter()
        s, _ = run(*args_i)
        s = int(s)  # force full device completion + round trip
        times.append(time.perf_counter() - t0)
    dt = min(times)

    pixels = frames * height * width
    gpx_s = pixels / dt / 1e9
    result = {
        "metric": "fill_rate_1080p60_multilayer",
        "value": round(gpx_s, 4),
        "unit": "Gpx/s",
        "vs_baseline": round(gpx_s / TARGET_GPX_S, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
