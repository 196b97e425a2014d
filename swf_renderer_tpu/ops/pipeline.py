"""Fused, fully-jittable batched render pipeline.

The reference rasterizes one shape at a time through stateful Canvas2D calls
(reference canvas-renderer.ts:114-129); its Rust backend draws a single
display item per frame (rs/src/headless_renderer.rs:402-404).  Here the whole
workload is batched into dense arrays — (frames, draws, edges) — so one jit
compilation covers a 60-frame multi-layer scene and XLA/Pallas keep the chip
busy.  This is the "training step" analog used by the benchmark and the
multi-chip entry point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .composite import premul_to_straight_u8
from .coverage import (
    FILL_RULE_NONZERO,
    SMEM_EDGE_CAP,
    coverage_banded,
    coverage_pallas,
    coverage_xla,
    normalize_fill_rule,
    _on_tpu,
)


@functools.partial(jax.jit, static_argnames=("height", "width", "fill_rule",
                                             "use_pallas"))
def render_solid_batch(
    edges_t: jax.Array,
    colors: jax.Array,
    height: int,
    width: int,
    fill_rule: int = FILL_RULE_NONZERO,
    use_pallas: bool = True,
) -> jax.Array:
    """Render a batch of frames made of solid-fill draws.

    edges_t: (B, P, 4, E) f32 — B frames, P draws per frame (padded; all-zero
        draws are no-ops), edge tables in device pixels.  For best TPU
        performance pre-split edges to bounded y-extent
        (geometry.split_edges_y) so the banded kernel's windows are tight.
    colors: (B, P, 4) f32 straight RGBA per draw.
    Returns (B, H, W, 4) uint8 frames (straight alpha).
    """
    b, p, four, e = edges_t.shape
    flat = edges_t.reshape(b * p, four, e)
    if use_pallas and _on_tpu():
        if e <= SMEM_EDGE_CAP:
            cov = coverage_banded(flat, height, width, fill_rule)
        else:
            cov = coverage_pallas(flat, height, width, fill_rule)
    else:
        cov = coverage_xla(flat, height, width, fill_rule)
    cov = cov.reshape(b, p, height, width)

    from .composite import composite_solid_layers

    frames_pm = jax.vmap(composite_solid_layers)(cov, colors)
    return premul_to_straight_u8(frames_pm)


@functools.partial(jax.jit, static_argnames=("height", "width", "fill_rule",
                                             "use_pallas"))
def render_morph_batch(
    edges_start: jax.Array,
    edges_end: jax.Array,
    colors_start: jax.Array,
    colors_end: jax.Array,
    ratios: jax.Array,
    height: int,
    width: int,
    fill_rule: int = FILL_RULE_NONZERO,
    use_pallas: bool = True,
) -> jax.Array:
    """Rasterize a morph shape at a whole batch of ratio steps on device.

    edges_start/edges_end: (P, 4, E) paired draw tables (same topology; see
        models.morph_geometry).  colors_*: (P, 4).  ratios: (R,).
    Returns (R, H, W, 4) uint8 frames.

    The lerp happens on device — one upload of two edge tables serves every
    ratio step, replacing the reference's per-ratio CPU command interpolation
    (reference canvas-renderer.ts:207-266).
    """
    r = ratios.shape[0]
    rr = ratios[:, None, None, None].astype(jnp.float32)
    edges = edges_start[None] * (1.0 - rr) + edges_end[None] * rr  # (R,P,4,E)
    rc = ratios[:, None, None].astype(jnp.float32)
    colors = colors_start[None] * (1.0 - rc) + colors_end[None] * rc  # (R,P,4)
    return render_solid_batch(
        edges, colors, height, width, fill_rule=fill_rule,
        use_pallas=use_pallas,
    )


def lower_edge_table(table, height: int, width: int,
                     drop_zeros: bool = False):
    """One draw's edge table -> sorted coalesced winding delta updates
    (rows, cols, values) — native splitter when available, else the numpy
    chain.  ``drop_zeros`` removes coalesced-to-zero updates (the styled
    pipeline's packer budget is tighter; the native splitter already
    drops them)."""
    from ..native.bindings import cells_split_delta_native, native_available

    from .scanline import edges_to_cells

    if native_available():
        return cells_split_delta_native(table, height, width)
    r, c, a, v = edges_to_cells(np.asarray(table, np.float32),
                                height, width)
    rows = np.concatenate([r, r])
    cols = np.concatenate([c, c + 1])
    vals = np.concatenate([a, v - a]).astype(np.float32)
    key = rows.astype(np.int64) * (width + 2) + cols
    order = np.argsort(key, kind="stable")
    uniq, inv = np.unique(key[order], return_inverse=True)
    acc = np.zeros(len(uniq), np.float32)
    np.add.at(acc, inv, vals[order])
    keep = acc != 0.0 if drop_zeros else slice(None)
    return ((uniq[keep] // (width + 2)).astype(np.int32),
            (uniq[keep] % (width + 2)).astype(np.int32), acc[keep])


def lower_update_lists(edge_tables, height: int, width: int,
                       drop_zeros: bool = False, max_workers: int = None):
    """Lower every (frame, layer) edge table to delta updates, in PARALLEL
    when the native splitter is available (its C ABI releases the GIL for
    the whole call, so a thread pool scales across host cores — the
    reference has no host-lowering stage at all; this is the analog of its
    per-definition decode cache warm-up, canvas-renderer.ts:96-112)."""
    from ..native.bindings import native_available

    flat = [t for per_frame in edge_tables for t in per_frame]
    if max_workers is None:
        from ..native.bindings import _pool_workers

        max_workers = _pool_workers()
    if max_workers > 1 and len(flat) > 1 and native_available():
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            lowered = list(pool.map(
                lambda t: lower_edge_table(t, height, width,
                                           drop_zeros=drop_zeros),
                flat))
    else:
        lowered = [lower_edge_table(t, height, width, drop_zeros=drop_zeros)
                   for t in flat]
    layers = len(edge_tables[0])
    return [lowered[i * layers:(i + 1) * layers]
            for i in range(len(edge_tables))]


def render_batch_flatblock(edge_tables, colors, height: int, width: int,
                           fill_rule: int = FILL_RULE_NONZERO,
                           interpret: bool = None, cache=None):
    """Flagship batched solid-layer renderer: native lowering + flat-block
    pipeline (scatter-free MXU placement with fused in-chunk prefix, then
    winding resolve straight to packed-u32 frames).

    ``edge_tables``: [frames][layers] of (E, 4) float32 edge tables in pixel
    space.  Returns (F, H, W, 4) uint8 frames (host numpy).  Falls back to
    the chunked-scatter pipeline for framebuffers wider than the chunk-major
    layout supports (width >= 2048 px after padding).

    ``cache``: optional runtime.cache.PackedSceneCache — memoizes the host
    lowering (edge split + block packing) by geometry content hash, so
    re-rendering a known scene goes straight to the device kernel.
    """
    from ..native.bindings import (
        cells_split_delta_native, native_available, pack_grouped_native,
    )
    from .flatblock import (
        MAX_CHUNKS, LANE, frames_u32_to_u8, group_blocks_fused,
        pack_flat_blocks, plane_geometry, render_fused_blocksn,
        sort_blocks_fused,
    )
    frames = len(edge_tables)
    layers = len(edge_tables[0])
    stride, _, _ = plane_geometry(height, width)
    if stride > MAX_CHUNKS * LANE:
        from .resolve import pack_updates, render_scanline_updates

        update_lists = lower_update_lists(edge_tables, height, width)
        flat = [u for per_frame in update_lists for u in per_frame]
        rows, cols, vals = pack_updates(flat)
        out = render_scanline_updates(
            jnp.asarray(rows.reshape(frames, layers, -1)),
            jnp.asarray(cols.reshape(frames, layers, -1)),
            jnp.asarray(vals.reshape(frames, layers, -1)),
            jnp.asarray(colors), height, width,
            fill_rule=fill_rule, interpret=interpret)
        return np.asarray(out)

    group = 6
    from .flatblock import strips_per_plane

    _, nc_geo, ns_geo = plane_geometry(height, width)
    # Narrow frames pack several strips per plane (fewer grid steps);
    # the non-native packer chain supports spp == 1 only.
    spp = strips_per_plane(nc_geo, ns_geo) if native_available() else 1
    key = (cache.key_for(edge_tables, height, width, group, spp=spp)
           if cache is not None else None)
    packed = cache.get(key) if cache is not None else None
    if packed is not None:
        gsi, gfl, gla, grc, gcm, gvv, ns, nc = packed
    else:
        update_lists = lower_update_lists(edge_tables, height, width)
        if native_available():
            # One-pass C++ packer: updates -> grouped kernel blocks directly
            # (bit-identical to the Python chain below, the tested oracle).
            gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
                update_lists, height, width, group=group, spp=spp)
        else:
            sidx, keep, urc, ucm, uval, ns, nc = pack_flat_blocks(
                update_lists, height, width, block_pad_multiple=1)
            # No padding between sort and group: group_blocks_fused re-pads,
            # and sentinel blocks would be wasted all-zero MXU steps.
            blocks = sort_blocks_fused(sidx, keep, urc, ucm, uval, layers,
                                       ns, block_pad_multiple=1)
            gsi, gfl, gla, grc, gcm, gvv = group_blocks_fused(
                *blocks, layers, ns, group=group)
        if cache is not None:
            cache.put(key, (gsi, gfl, gla, grc, gcm, gvv, ns, nc))
    out = np.asarray(render_fused_blocksn(
        jnp.asarray(gsi), jnp.asarray(gfl), jnp.asarray(gla),
        jnp.asarray(grc), jnp.asarray(gcm), jnp.asarray(gvv),
        jnp.asarray(colors), frames, layers, ns, nc, group=group,
        fill_rule=fill_rule, interpret=interpret, spp=spp))
    out32 = out[:, :ns].reshape(frames, ns * spp * 8, nc * LANE)
    return frames_u32_to_u8(out32, height, width)


def kernel_paints_for(paints, height: int, width: int, spp: int = 1):
    """Map per-layer style Paints -> (KernelPaint tuple, field planes,
    (L, 4) colors) for render_fused_styled.

    Solid paints read per-(frame, layer) colors; bitmap paints evaluate
    their field once (XLA, on device — any fill matrix) and stream
    chunk-major planes (packed ``spp`` strips per plane).  Gradients
    ALSO render as prebaked field planes when the pass's field budget
    allows — measured +14% over in-kernel evaluation on the gradients
    config (tools/exp_gradfield.py: streaming a frame-invariant plane
    beats re-evaluating the ramp per resolve step); when the layer list
    already needs more than MAX_KERNEL_FIELDS streamed planes, gradients
    fall back to in-kernel baked-stop evaluation (zero HBM) to avoid
    forcing extra composition passes."""
    from ..ops import style as style_ops
    from .flatblock import (
        KPAINT_FOCAL, KPAINT_LINEAR, KernelPaint, field_to_chunkmajor,
        plane_geometry,
    )

    _, n_chunks, n_strips = plane_geometry(height, width)
    if spp > 1:
        n_strips = -(-n_strips // spp)  # strip-block count
    gradient_kinds = (style_ops.PAINT_LINEAR, style_ops.PAINT_FOCAL)
    must_field = sum(1 for p in paints if _needs_field(p))
    n_gradients = sum(1 for p in paints
                      if p.kind in gradient_kinds
                      and p.color_space != "linear-rgb")
    gradients_as_fields = (must_field + n_gradients
                           <= MAX_KERNEL_FIELDS)

    kpaints = []
    fields = []
    colors = np.zeros((len(paints), 4), np.float32)

    def add_field(p):
        field = style_ops.paint_field(p, height, width)
        fields.append(field_to_chunkmajor(field, n_strips, n_chunks,
                                          spp=spp))
        kpaints.append(KernelPaint.field(len(fields) - 1))

    for i, p in enumerate(paints):
        if p.kind == style_ops.PAINT_SOLID:
            kpaints.append(KernelPaint.color())
            colors[i] = p.color
        elif p.kind in gradient_kinds:
            # linear-RGB always streams (the sRGB transfer curve isn't in
            # the in-kernel evaluator); sRGB gradients stream when the
            # field budget allows (faster), else bake into the kernel.
            if p.color_space == "linear-rgb" or gradients_as_fields:
                add_field(p)
                continue
            kind = (KPAINT_LINEAR if p.kind == style_ops.PAINT_LINEAR
                    else KPAINT_FOCAL)
            kpaints.append(KernelPaint.gradient(
                kind, p.inv_matrix, p.stop_ratios, p.stop_colors,
                focal=p.focal_point, spread=p.spread))
        elif p.kind == style_ops.PAINT_BITMAP:
            add_field(p)
        else:
            raise ValueError(f"unsupported paint kind {p.kind}")
    return tuple(kpaints), tuple(fields), colors


def render_styled_layered(edge_tables, paints, height: int, width: int,
                          colors=None, fill_rule: int = FILL_RULE_NONZERO):
    """Layered styled fallback: per-frame scanline coverage + XLA style
    fields + premultiplied composite.  Handles any frame width (the
    flat-block chunk-major layout caps at ``MAX_CHUNKS * LANE`` px);
    5-10x slower than the fused kernel but fully general.

    Same contract as :func:`render_batch_styled`."""
    from ..ops import style as style_ops
    from .composite import composite_to_u8
    from .scanline import coverage_scanline, edges_to_cells, pack_cells
    from ..native.bindings import native_available

    if native_available():
        from ..native.bindings import cells_split_native as splitter
    else:
        splitter = edges_to_cells

    fields = [style_ops.paint_field(p, height, width) for p in paints]
    out = []
    for f, per_frame in enumerate(edge_tables):
        cells = [splitter(np.asarray(t, np.float32), height, width)
                 for t in per_frame]
        rows, cols, area, cover = pack_cells(cells)
        cov = coverage_scanline(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(area),
            jnp.asarray(cover), height, width, fill_rule)
        layer_fields = []
        for l, p in enumerate(paints):
            if p.kind == style_ops.PAINT_SOLID and colors is not None:
                layer_fields.append(jnp.broadcast_to(
                    jnp.asarray(colors[f, l], jnp.float32),
                    (height, width, 4)))
            else:
                layer_fields.append(fields[l])
        out.append(composite_to_u8(cov, jnp.stack(layer_fields)))
    return np.stack(out)


MAX_KERNEL_LAYERS = 16   # VMEM accumulator budget: layers x 64-128 KB
MAX_KERNEL_FIELDS = 4    # prefetched field planes per resolve step


def _needs_field(p) -> bool:
    from ..ops import style as style_ops

    return (p.kind == style_ops.PAINT_BITMAP
            or (p.kind in (style_ops.PAINT_LINEAR, style_ops.PAINT_FOCAL)
                and p.color_space == "linear-rgb"))


def split_layer_groups(paints, max_layers: int = MAX_KERNEL_LAYERS,
                       max_fields: int = MAX_KERNEL_FIELDS):
    """Cut a deep layer list into consecutive groups each within one
    kernel pass's VMEM budget (<= max_layers layers, <= max_fields
    streamed field planes).  Returns [(start, end), ...]."""
    groups = []
    start, n_fields = 0, 0
    for i, p in enumerate(paints):
        f = 1 if _needs_field(p) else 0
        if i > start and (i - start >= max_layers
                          or n_fields + f > max_fields):
            groups.append((start, i))
            start, n_fields = i, 0
        n_fields += f
    groups.append((start, len(paints)))
    return groups


def _render_styled_multipass(edge_tables, paints, height, width, colors,
                             fill_rule, interpret, cache, group, spp,
                             layer_groups):
    """Deep draw lists through the fused kernel in PASSES: each pass
    renders <= 16 consecutive layers, seeding the chain composite from the
    previous pass's premul planes.  The chain-form over operator is a left
    fold, so G passes compose bit-exactly like one big chain (the
    reference's core loop fills any number of paths sequentially,
    canvas-renderer.ts:114-129 — this is its batched analog)."""
    from .flatblock import (
        LANE, frames_u32_to_u8, render_fused_styled,
    )

    frames = len(edge_tables)
    bg = None
    out = None
    for gi, (lo, hi) in enumerate(layer_groups):
        sub_tables = [per[lo:hi] for per in edge_tables]
        sub_paints = list(paints[lo:hi])
        sub_colors = colors[:, lo:hi]
        sub_rule = (fill_rule[lo:hi] if isinstance(fill_rule, tuple)
                    else fill_rule)
        if isinstance(sub_rule, tuple) and len(set(sub_rule)) == 1:
            sub_rule = sub_rule[0]
        last = gi == len(layer_groups) - 1
        kpaints, fields, _ = kernel_paints_for(sub_paints, height, width,
                                               spp=spp)
        gsi, gfl, gla, grc, gcm, gvv, ns, nc = _pack_styled(
            sub_tables, height, width, group, spp, cache,
            len(sub_paints))
        out = render_fused_styled(
            jnp.asarray(gsi), jnp.asarray(gfl), jnp.asarray(gla),
            jnp.asarray(grc), jnp.asarray(gcm), jnp.asarray(gvv),
            jnp.asarray(sub_colors), fields, frames, len(sub_paints),
            ns, nc, kpaints, group=group, fill_rule=sub_rule,
            interpret=interpret, spp=spp, chain=True, bg=bg,
            emit="u32" if last else "premul")
        bg = out
    out = np.asarray(out)
    out32 = out[:, :ns].reshape(frames, ns * spp * 8, nc * LANE)
    return frames_u32_to_u8(out32, height, width)


def plan_masked_program(tree, paints, fill_rule):
    """Flatten a mask/blend tree into (segments, program).

    ``segments``: ordered pass descriptors ``(idxs, paints, rule,
    force_white)`` — each one fused-kernel pass (draw runs split at the
    per-pass VMEM layer budget).  ``program``: nested steps —
    ``("passes", [seg_id, ...])`` chains passes over the accumulator,
    ``("mask", seg_id, subprogram)`` and ``("blend", mode, subprogram)``
    composite a group.  The FINAL quantize segment (one empty zero-alpha
    layer) is appended last; executors share this plan, so the
    single-device path and the dp-sharded path run the identical
    program."""
    from ..ops import style as style_ops

    white = style_ops.solid_paint((1.0, 1.0, 1.0, 1.0))
    segments = []

    def add_segment(idxs, force_white):
        sub_paints = [white if force_white else paints[i] for i in idxs]
        rule = (fill_rule[idxs[0]]
                if len({fill_rule[i] for i in idxs}) == 1
                else tuple(fill_rule[i] for i in idxs))
        ids = []
        for lo, hi in split_layer_groups(sub_paints):
            part_rule = (rule if not isinstance(rule, tuple)
                         else (rule[lo:hi] if len(set(rule[lo:hi])) > 1
                               else rule[lo]))
            segments.append((tuple(idxs[lo:hi]), sub_paints[lo:hi],
                             part_rule, force_white))
            ids.append(len(segments) - 1)
        return ids

    def plan_items(items):
        prog = []
        run: List[int] = []

        def flush():
            if run:
                prog.append(("passes", add_segment(tuple(run), False)))
                run.clear()

        for item in items:
            if item[0] == "draw":
                run.append(item[1])
                continue
            flush()
            if item[0] == "mask":
                _, mask_idxs, content_items = item
                # A deep mask splits into chained white passes —
                # source-over of unit-alpha coverages IS the union, so
                # chaining the segments composes exactly.
                msegs = add_segment(tuple(mask_idxs), True)
                prog.append(("mask", msegs, plan_items(content_items)))
            elif item[0] == "blend":
                _, mode, content_items = item
                prog.append(("blend", mode, plan_items(content_items)))
            else:
                _, filters, content_items = item
                prog.append(("filter", filters,
                             plan_items(content_items)))
        flush()
        return prog

    program = plan_items(tree)
    final = len(segments)
    segments.append(((), [white], fill_rule[0], False))  # quantize pass
    return segments, program, final


def _fusible_mask_step(step):
    """A ("mask", msegs, content_prog) step whose content is ONE plain
    pass — the shape the fused mask-group kernel pass covers."""
    return (step[0] == "mask" and len(step[2]) == 1
            and step[2][0][0] == "passes" and len(step[2][0][1]) == 1)


def _rule_tuple(rule, n):
    return rule if isinstance(rule, tuple) else (rule,) * n


def build_fused_mask_pair(segments, cid, msids):
    """Merge a fusible (content segment, mask segments) pair into ONE
    kernel pass's (idxs, paints, rule, mask_from) — or None when the
    combined layers exceed the pass budget.

    Shared by the single-device executor and parallel.mesh's
    render_masked_dp: both programs MUST build the fused pass
    identically or the dp-sharded output drifts from the single-device
    one (their bit-equality is pinned in tests/test_parallel.py)."""
    ci, cp, crule, _ = segments[cid]
    mi, mp_, mrule = [], [], ()
    for msid in msids:
        s_i, s_p, s_rule, _ = segments[msid]
        mi.extend(s_i)
        mp_.extend(s_p)
        mrule = mrule + _rule_tuple(s_rule, len(s_i))
    if not ci or not 0 < len(ci) + len(mi) <= MAX_KERNEL_LAYERS:
        return None
    rule = _rule_tuple(crule, len(ci)) + mrule
    if len(set(rule)) == 1:
        rule = rule[0]
    return tuple(ci) + tuple(mi), list(cp) + list(mp_), rule, len(ci)


def exec_masked_program(program, final_seg, seg_call, plane_image=None,
                        seg_call_masked=None):
    """Run a plan_masked_program: ``seg_call(seg_id, bg, emit)`` renders
    one segment over ``bg`` (None = transparent) and returns premul
    planes (or the packed u32 strip for emit="u32").  ``plane_image``:
    (to_frames, to_planes) converters between the kernel's chunk-major
    planes and (F, H, W, 4) premul images — required for filter nodes
    (ops.filters runs in image space).

    ``seg_call_masked(content_sid, mask_sids, bg, emit)``: optional
    FUSED mask-group pass — renders content + mask layers in ONE kernel
    chain (render_fused_styled mask_from) and returns the combined
    planes, or None when the pair exceeds the pass budget (falls back
    to the plane-algebra path).  When the mask group is the program's
    last top-level step, the fused pass quantizes directly (emit
    "u32"), absorbing the final zero-alpha pass too — both fusions are
    float-op identical to the unfused program (see
    composite_quantize_pack mask_from)."""
    from .composite import blend_premul

    def exec_prog(prog, bg, top=False):
        for i, step in enumerate(prog):
            if step[0] == "passes":
                for sid in step[1]:
                    bg = seg_call(sid, bg, "premul")
            elif step[0] == "mask":
                _, msegs, content_prog = step
                fused = None
                if seg_call_masked is not None and _fusible_mask_step(step):
                    last_top = top and i == len(prog) - 1
                    emit = "u32" if last_top else "premul"
                    fused = seg_call_masked(step[2][0][1][0],
                                            tuple(msegs), bg, emit)
                    if fused is not None and last_top:
                        return ("u32", fused)
                if fused is not None:
                    bg = fused
                    continue
                mask = None
                for mseg in msegs:
                    mask = seg_call(mseg, mask, "premul")
                content = exec_prog(content_prog, None)
                if content is None:
                    continue
                scaled = content * mask[:, :, 3:4]
                bg = (scaled if bg is None
                      else scaled + bg * (1.0 - scaled[:, :, 3:4]))
            elif step[0] == "blend":
                _, mode, content_prog = step
                content = exec_prog(content_prog, None)
                if content is None:
                    continue
                if bg is None:
                    bg = jnp.zeros_like(content)
                bg = blend_premul(bg, content, mode, channel_axis=2)
            else:
                from .filters import apply_filters

                _, filters, content_prog = step
                content = exec_prog(content_prog, None)
                if content is None:
                    continue
                if plane_image is None:
                    raise NotImplementedError(
                        "filter nodes need plane<->image converters")
                to_frames, to_planes = plane_image
                img = apply_filters(to_frames(content), filters)
                content = to_planes(img, content)
                bg = (content if bg is None
                      else content + bg * (1.0 - content[:, :, 3:4]))
        return bg

    planes = exec_prog(program, None, top=True)
    if isinstance(planes, tuple) and planes and planes[0] == "u32":
        return planes[1]
    return seg_call(final_seg, planes, "u32")


def _segment_tables(edge_tables, idxs):
    if not idxs:  # the final quantize segment: one empty layer
        return [[np.zeros((0, 4), np.float32)] for _ in edge_tables]
    return [[per[i] for i in idxs] for per in edge_tables]


def _render_styled_masked(edge_tables, paints, height, width, colors,
                          fill_rule, interpret, cache, group, spp, tree):
    """Clip groups + blend modes on the fused kernel: the draw list's
    group tree (runtime.scene.build_mask_tree) executes as premul-plane
    algebra — draw runs chain through fused passes, a group's content
    renders on a transparent background, scales by the mask's union
    alpha (white unit-alpha fills source-over to 1 - prod(1 - c)) or
    blends, and combines with the accumulated planes.  A final
    zero-alpha chained pass quantizes through the kernel's own resolve,
    so masked scenes share every output path's premul-u8 math."""
    from .flatblock import LANE, frames_u32_to_u8, render_fused_styled

    frames = len(edge_tables)
    segments, program, final_seg = plan_masked_program(tree, paints,
                                                       fill_rule)
    packed = []
    for idxs, sub_paints, rule, force_white in segments:
        kpaints, fields, _ = kernel_paints_for(sub_paints, height, width,
                                               spp=spp)
        arrs = _pack_styled(_segment_tables(edge_tables, idxs), height,
                            width, group, spp, cache, len(sub_paints))
        sub_colors = (np.ones((frames, len(idxs), 4), np.float32)
                      if force_white else
                      (np.zeros((frames, 1, 4), np.float32) if not idxs
                       else colors[:, list(idxs)]))
        packed.append((tuple(jnp.asarray(x) for x in arrs[:6]),
                       jnp.asarray(sub_colors), fields, kpaints,
                       arrs[6], arrs[7], len(sub_paints), rule))

    def seg_call(sid, bg, emit):
        args, cols, fields, kpaints, ns, nc, nl, rule = packed[sid]
        # chain=True even with bg=None: the chain-form composite is the
        # form whose bit-pattern the masked-vs-layered exactness pins.
        return render_fused_styled(
            *args, cols, fields, frames, nl, ns, nc, kpaints,
            group=group, fill_rule=rule, interpret=interpret, spp=spp,
            chain=True, bg=bg, emit=emit)

    # Fused mask-group passes: content segment + mask segment(s) render
    # as ONE kernel chain (mask_from) when their layers fit one pass —
    # halves the masked program's full-frame kernel chains (VERDICT r4
    # #5).  Packed lazily per (content, masks) pair on first use.
    fused_packed: dict = {}

    def seg_call_masked(cid, msids, bg, emit):
        key = (cid, msids)
        entry = fused_packed.get(key, False)
        if entry is False:
            pair = build_fused_mask_pair(segments, cid, msids)
            entry = None
            if pair is not None:
                idxs, all_paints, rule, mfrom = pair
                kpaints, fields, _ = kernel_paints_for(
                    all_paints, height, width, spp=spp)
                arrs = _pack_styled(
                    _segment_tables(edge_tables, idxs),
                    height, width, group, spp, cache, len(all_paints))
                cols = np.concatenate(
                    [colors[:, list(idxs[:mfrom])],
                     np.ones((frames, len(idxs) - mfrom, 4),
                             np.float32)], axis=1)
                entry = (tuple(jnp.asarray(x) for x in arrs[:6]),
                         jnp.asarray(cols), fields, kpaints,
                         arrs[6], arrs[7], len(all_paints), rule,
                         mfrom)
            fused_packed[key] = entry
        if entry is None:
            return None
        args, cols, fields, kpaints, ns, nc, nl, rule, mfrom = entry
        return render_fused_styled(
            *args, cols, fields, frames, nl, ns, nc, kpaints,
            group=group, fill_rule=rule, interpret=interpret, spp=spp,
            chain=True, bg=bg, emit=emit, mask_from=mfrom)

    from .flatblock import (
        frames_to_premul_planes, premul_planes_to_frames,
    )

    nc_final = packed[final_seg][5]
    plane_image = (
        lambda planes: premul_planes_to_frames(planes, height, width,
                                               nc_final, spp),
        lambda img, like: frames_to_premul_planes(
            img, nc_final, spp, like.shape[1] - 1, like.shape[3]),
    )
    out = np.asarray(exec_masked_program(
        program, final_seg, seg_call, plane_image=plane_image,
        seg_call_masked=seg_call_masked))
    ns = packed[final_seg][4]
    nc = packed[final_seg][5]
    out32 = out[:, :ns].reshape(frames, ns * spp * 8, nc * LANE)
    return frames_u32_to_u8(out32, height, width)


def _pack_styled(edge_tables, height, width, group, spp, cache, layers):
    """Shared lower+pack step of the styled pipeline (cache-aware)."""
    from ..native.bindings import native_available, pack_grouped_native
    from .flatblock import (
        group_blocks_fused, pack_flat_blocks, sort_blocks_fused,
    )

    key = (cache.key_for(edge_tables, height, width, group, spp=spp,
                         variant="styled")
           if cache is not None else None)
    packed = cache.get(key) if cache is not None else None
    if packed is not None:
        return packed
    update_lists = lower_update_lists(edge_tables, height, width,
                                      drop_zeros=True)
    if native_available():
        result = pack_grouped_native(update_lists, height, width,
                                     group=group, spp=spp)
    else:
        sidx, keep_, urc, ucm, uval, ns, nc = pack_flat_blocks(
            update_lists, height, width, block_pad_multiple=1)
        blocks = sort_blocks_fused(sidx, keep_, urc, ucm, uval, layers,
                                   ns, block_pad_multiple=1)
        gsi, gfl, gla, grc, gcm, gvv = group_blocks_fused(
            *blocks, layers, ns, group=group)
        result = (gsi, gfl, gla, grc, gcm, gvv, ns, nc)
    if cache is not None:
        cache.put(key, result)
    return result


def render_batch_styled(edge_tables, paints, height: int, width: int,
                        colors=None, fill_rule: int = FILL_RULE_NONZERO,
                        interpret: bool = None, cache=None,
                        group: int = 6, mask_tree=None):
    """Styled flagship renderer: every paint kind rides the fused
    flat-block kernel (the reference keeps gradients/patterns in the same
    hot fill path as solids, canvas-renderer.ts:292-335).

    ``edge_tables``: [frames][layers] of (E, 4) f32 device-space edges.
    ``paints``: one style Paint per LAYER (static across frames).
    ``colors``: optional (F, L, 4) per-frame colors for SOLID layers
    (defaults to each solid paint's color).  Returns (F, H, W, 4) u8.

    Frames wider than the chunk-major plane layout supports
    (``MAX_CHUNKS * LANE`` = 8192 px) fall back to the layered coverage
    path, mirroring the solid pipeline's graceful fallback.  Draw lists
    deeper than one kernel pass's VMEM budget (16 layers or 4 field
    planes) render in chained passes — no layer-count cap."""
    from ..native.bindings import native_available
    from .flatblock import (
        LANE, MAX_CHUNKS, frames_u32_to_u8, plane_geometry,
        render_fused_styled,
    )

    frames = len(edge_tables)
    layers = len(edge_tables[0])
    assert layers == len(paints)
    # fill_rule: one rule for every layer (int) or one PER LAYER (tuple —
    # SWF mixes even-odd and DefineShape4 nonzero shapes in one scene).
    fill_rule = normalize_fill_rule(fill_rule, layers)
    stride, nc_geo, ns_geo = plane_geometry(height, width)
    if stride > MAX_CHUNKS * LANE:
        if mask_tree is not None:
            # The layered fallback here has no group compositor; the
            # renderer routes over-wide masked scenes through its own
            # scanline/direct backends instead (renderer.execute).
            raise ValueError(
                f"masked scenes wider than {MAX_CHUNKS * LANE} px don't "
                "fit the fused program; use the layered renderer backends")
        return render_styled_layered(edge_tables, paints, height, width,
                                     colors=colors, fill_rule=fill_rule)

    # Narrow frames pack several strips per plane (fewer grid steps; +48%
    # measured on flat256 for the solid path).  The non-native packer
    # chain supports spp == 1 only.
    from .flatblock import strips_per_plane

    spp = strips_per_plane(nc_geo, ns_geo) if native_available() else 1
    if colors is None:
        from ..ops import style as style_ops

        base_colors = np.zeros((layers, 4), np.float32)
        for i, p in enumerate(paints):
            if p.kind == style_ops.PAINT_SOLID:
                base_colors[i] = p.color
        colors = np.broadcast_to(base_colors, (frames, layers, 4))
    colors = np.asarray(colors, np.float32)

    if mask_tree is not None:
        rules = (fill_rule if isinstance(fill_rule, tuple)
                 else (fill_rule,) * layers)
        return _render_styled_masked(
            edge_tables, paints, height, width, colors, rules,
            interpret, cache, group, spp, mask_tree)

    # Draw lists deeper than one kernel pass's VMEM budget (16 layers /
    # 4 field planes) compose across passes via chained premul planes.
    layer_groups = split_layer_groups(paints)
    if len(layer_groups) > 1:
        return _render_styled_multipass(
            edge_tables, paints, height, width, colors, fill_rule,
            interpret, cache, group, spp, layer_groups)

    kpaints, fields, _ = kernel_paints_for(paints, height, width, spp=spp)
    gsi, gfl, gla, grc, gcm, gvv, ns, nc = _pack_styled(
        edge_tables, height, width, group, spp, cache, layers)

    out = np.asarray(render_fused_styled(
        jnp.asarray(gsi), jnp.asarray(gfl), jnp.asarray(gla),
        jnp.asarray(grc), jnp.asarray(gcm), jnp.asarray(gvv),
        jnp.asarray(colors), fields, frames, layers, ns, nc, kpaints,
        group=group, fill_rule=fill_rule, interpret=interpret, spp=spp))
    out32 = out[:, :ns].reshape(frames, ns * spp * 8, nc * LANE)
    return frames_u32_to_u8(out32, height, width)
