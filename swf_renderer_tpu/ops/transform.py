"""On-device TRANSFORM-animation rasterizer: O(1) host work per sweep.

In the reference, re-rendering a cached shape under a new matrix costs one
Canvas replay — decode is cached per definition and the matrix applies at
draw time (reference ts/src/lib/renderers/canvas-renderer.ts:96-112,
179-184).  Round 2's flagship pipeline instead lowered edges in DEVICE
space, so every matrix change re-ran the whole host chain (flatten, split,
pack: ~0.8 s for work the device does in ~24 ms).  This module is the
device-side answer for moving-matrix animation, mirroring ops.morph:

* **Host, once per animation** (`affine_pieces`): split each local-space
  edge at uniform t so the piece's |dy| AFTER transform is <= 1 for EVERY
  frame matrix (|dy'| = |b*dx + d*dy| is known per matrix; the split count
  takes the max over frames — an O(frames x edges) vectorized bound, then
  an O(total pieces) split).  Uniform-t subdivision commutes with affine
  maps, so piece p of the transformed edge equals the transform of piece p.
* **Device, per frame** (one Pallas grid step): apply the frame's affine to
  the piece tables (6 scalars from SMEM), evaluate each piece's EXACT
  analytic coverage ramp over all columns (the coverage_numpy trapezoid
  math restricted to the <= 2 rows a piece can touch), place rows as
  cov^T = ramp^T @ onehot on the MXU (bit-exact 3-pass bf16 split), then
  the shared fill-rule/composite/premul-u8 tail.

A 60-frame rotation costs ONE upload of the piece tables + one (F, 6)
matrix array — per-frame host work is zero, like the morph ratio sweep.
Frames come out transposed (W, H) packed u32; view with
ops.morph.morph_frames_to_u8.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import threading

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .coverage import (
    FILL_RULE_NONZERO, _h01, _on_tpu, layer_rules, normalize_fill_rule,
)
from .flatblock import (
    KPAINT_COLOR, KPAINT_FIELD, KPAINT_FOCAL, KPAINT_LINEAR, KernelPaint,
    composite_quantize_pack, fill_rule_cov, _grad_eval,
)

LANE = 128


def _per_layer_mats(matrices, n_layers: int):
    """(F, 6) or per-layer (F, L, 6) matrix tracks -> [L] of (F, 6) f64."""
    mats = np.asarray(matrices, np.float64)
    if mats.ndim == 2 and mats.shape[1] == 6:
        return [mats] * n_layers
    if mats.ndim == 3 and mats.shape[2] == 6:
        if mats.shape[1] != n_layers:
            raise ValueError(
                f"per-layer matrices {mats.shape} vs {n_layers} layers")
        return [mats[:, i] for i in range(mats.shape[1])]
    raise ValueError(f"matrices must be (F, 6) or (F, L, 6),"
                     f" got {mats.shape}")


def affine_pieces(edge_tables, colors, matrices, e_multiple: int = 128,
                  split_margin: float = 1.0, min_splits=None,
                  return_splits: bool = False):
    """Split LOCAL-space edge tables into pieces row-bounded under every
    frame matrix.

    ``edge_tables``: [layers] of (E, 4) f32 local-space edges (one per
    draw/layer, shared by all frames).  ``colors``: [layers] straight RGBA.
    ``matrices``: (F, 6) device affines (a, b, c, d, e, f):
    x' = a x + c y + e,  y' = b x + d y + f — or (F, L, 6) PER-LAYER
    affines (each layer animates under its own matrix track).

    ``split_margin`` scales the per-edge |dy'| bound before the ceil
    (headroom so future matrices up to margin-times as magnifying still
    validate against the cached table — the single-frame interactive
    path); ``min_splits``: optional [layers] of (E,) int floors (monotone
    cache growth); ``return_splits``: also return the per-edge split
    counts.

    Returns (tab, subxy, colors_arr[, splits]):
      tab    (P, 4, 1, EP) f32 — x0, y0, x1, y1 local coords, lane layout
      subxy  (P, 4, EP, 1) f32 — same channels in sublane layout (the row
                                  one-hot needs transformed y per sublane)
      colors_arr (P, 4) f32
    Padding pieces are all-zero; they transform to degenerate points
    (dy' = 0) and contribute nothing for any matrix."""
    per_layer = _per_layer_mats(matrices, len(edge_tables))

    split = []
    splits_out = []
    for li, (edges, color, lm) in enumerate(
            zip(edge_tables, colors, per_layer)):
        b = lm[:, 1][:, None]
        d = lm[:, 3][:, None]
        e = np.asarray(edges, np.float64)
        dx = (e[:, 2] - e[:, 0])[None, :]
        dy = (e[:, 3] - e[:, 1])[None, :]
        dyp = np.abs(b * dx + d * dy).max(axis=0)  # worst |dy'| per edge
        n = np.maximum(1, np.ceil(dyp * split_margin)).astype(int)
        if min_splits is not None and min_splits[li] is not None:
            n = np.maximum(n, np.asarray(min_splits[li], int))
        splits_out.append(n)
        ps = []
        for row, k in zip(e, n):
            t = np.linspace(0.0, 1.0, k + 1)
            xs = row[0] + t * (row[2] - row[0])
            ys = row[1] + t * (row[3] - row[1])
            ps.append(np.stack([xs[:-1], ys[:-1], xs[1:], ys[1:]], 1))
        split.append((np.concatenate(ps) if ps else np.zeros((0, 4)),
                      color))

    p = len(split)
    e_max = max(1, max(s.shape[0] for s, _ in split))
    ep = max(e_multiple, -(-e_max // e_multiple) * e_multiple)
    tab = np.zeros((p, 4, 1, ep), np.float32)
    subxy = np.zeros((p, 4, ep, 1), np.float32)
    colors_arr = np.zeros((p, 4), np.float32)
    for i, (ps, color) in enumerate(split):
        k = ps.shape[0]
        tab[i, :, 0, :k] = ps.T.astype(np.float32)
        subxy[i, :, :k, 0] = ps.T.astype(np.float32)
        colors_arr[i] = color
    if return_splits:
        return tab, subxy, colors_arr, splits_out
    return tab, subxy, colors_arr


def morph_affine_pieces(pairs, matrices, e_multiple: int = 128):
    """Split matched LOCAL-space morph edge-pair tables into pieces
    row-bounded under EVERY (frame matrix, ratio) combination.

    ``pairs``: list of (edges_start (E, 4), edges_end (E, 4), color_start,
    color_end) per draw (models.morph_geometry.morph_fill_edge_pairs with
    a local-space ctm).  |dy'(r, M)| = |b_M((1-r)dx_s + r dx_e)
    + d_M((1-r)dy_s + r dy_e)| is linear in r, so the bound is the max
    over the ratio ENDPOINTS and all frame matrices; uniform-t
    subdivision commutes with both the ratio lerp and the affine, so
    piece p of the lerped-transformed edge equals the lerp-transform of
    piece p.

    Returns (tab_s, subxy_s, tab_e, subxy_e, colors_s, colors_e), each
    table shaped like affine_pieces output.  ``matrices`` may be (F, 6)
    or (F, L, 6) per-layer tracks (like affine_pieces)."""
    per_layer = _per_layer_mats(matrices, len(pairs))

    split = []
    for (es, ee, cs, ce), lm in zip(pairs, per_layer):
        b = lm[:, 1][:, None]
        d = lm[:, 3][:, None]
        es = np.asarray(es, np.float64)
        ee = np.asarray(ee, np.float64)
        dyp = np.zeros(es.shape[0])
        for tbl in (es, ee):  # ratio endpoints bound the linear lerp
            dx = (tbl[:, 2] - tbl[:, 0])[None, :]
            dy = (tbl[:, 3] - tbl[:, 1])[None, :]
            dyp = np.maximum(dyp, np.abs(b * dx + d * dy).max(axis=0))
        n = np.maximum(1, np.ceil(dyp)).astype(int)
        ps, pe = [], []
        for (s_row, e_row, k) in zip(es, ee, n):
            t = np.linspace(0.0, 1.0, k + 1)
            for tbl, out in ((s_row, ps), (e_row, pe)):
                xs = tbl[0] + t * (tbl[2] - tbl[0])
                ys = tbl[1] + t * (tbl[3] - tbl[1])
                out.append(np.stack([xs[:-1], ys[:-1], xs[1:], ys[1:]], 1))
        split.append((np.concatenate(ps) if ps else np.zeros((0, 4)),
                      np.concatenate(pe) if pe else np.zeros((0, 4)),
                      cs, ce))

    p = len(split)
    e_max = max(1, max(s.shape[0] for s, _, _, _ in split))
    ep = max(e_multiple, -(-e_max // e_multiple) * e_multiple)
    tab_s = np.zeros((p, 4, 1, ep), np.float32)
    tab_e = np.zeros((p, 4, 1, ep), np.float32)
    subxy_s = np.zeros((p, 4, ep, 1), np.float32)
    subxy_e = np.zeros((p, 4, ep, 1), np.float32)
    colors_s = np.zeros((p, 4), np.float32)
    colors_e = np.zeros((p, 4), np.float32)
    for i, (ps, pe, cs, ce) in enumerate(split):
        k = ps.shape[0]
        tab_s[i, :, 0, :k] = ps.T.astype(np.float32)
        tab_e[i, :, 0, :k] = pe.T.astype(np.float32)
        subxy_s[i, :, :k, 0] = ps.T.astype(np.float32)
        subxy_e[i, :, :k, 0] = pe.T.astype(np.float32)
        colors_s[i], colors_e[i] = cs, ce
    return tab_s, subxy_s, tab_e, subxy_e, colors_s, colors_e


def layer_piece_counts(tab, multiple: int = 256) -> tuple:
    """Per-layer REAL piece counts from a padded (P, 4, 1, EP) table
    (host numpy): index of the last piece with any nonzero coordinate,
    +1, rounded UP to ``multiple``.  Trailing degenerate pieces count as
    padding — they transform to points (dy' = 0) and contribute nothing,
    like the padding itself.  Pass as ``layer_counts`` to the sweep
    entries so layers far below the padded EP skip their all-padding
    chunks (EP is the MAX over layers: one big draw otherwise makes
    every small draw pay its chunk count).

    The rounding keeps the static jit key coarse: the kernel only
    depends on counts rounded to e_chunk anyway, and raw counts would
    force a fresh 1-10 min remote compile for every scene whose exact
    piece total differs."""
    t = np.asarray(tab)
    nz = np.any(t != 0.0, axis=(1, 2))  # (P, EP)
    counts = []
    for lyr in range(t.shape[0]):
        idx = np.nonzero(nz[lyr])[0]
        n = int(idx[-1]) + 1 if idx.size else 0
        counts.append(-(-n // multiple) * multiple)
    return tuple(counts)


def plan_compact_sweep(matrices, tab, height, width, e_chunk: int = 256,
                       wblock: int = None, blocks_per_step: int = None):
    """Host-side plan for the COMPACTED sweep: conservative per-layer
    capacities for crossing pieces per (frame, column block).

    The classic sweep kernel pays a fixed cost per (column block, piece
    chunk, layer) — chunk transform, crossing reduction, branch sync —
    for EVERY chunk, even ones the block never touches (PERF.md round-3
    decomposition: ~0.7 of 1.07 ms/frame at 1080p).  The compact path
    gathers, per (frame, block), only the pieces whose x-transition
    crosses that block (the device pre-pass in ``_compact_pre``), so a
    block visits ~piece_count/n_blocks pieces instead of all of them.

    This function computes the STATIC jit metadata: per-layer maxima
    (over frames and blocks) of the crossing count, in f64 with an
    epsilon wide enough that the device's exact-f32 mask can never
    exceed the capacity, rounded up to ``e_chunk`` (coarse jit keys).
    Returns ``None`` when compaction cannot pay (single column block).
    Pass the dict's entries straight to :func:`render_affine_sweep`."""
    t = np.asarray(tab, np.float64)  # (L, 4, 1, EP)
    layers = t.shape[0]
    per_layer = _per_layer_mats(matrices, layers)
    hp = -(-height // LANE) * LANE
    wp8 = -(-width // 8) * 8
    wblock = wblock or _wblock_for(width, hp, lists=False)
    bps = blocks_per_step or _auto_bps(
        layers, hp, e_chunk, -(-wp8 // wblock))
    wp = -(-wp8 // (wblock * bps)) * (wblock * bps)
    nb = wp // wblock
    if nb < 2:
        return None
    lo = (np.arange(nb, dtype=np.float64) * wblock)[:, None, None]
    s_pads = []
    for lyr in range(layers):
        lm = per_layer[lyr]  # (F, 6) f64
        x0l, y0l, x1l, y1l = t[lyr, :, 0]  # (EP,)
        a, b, c, d, e, f = (lm[:, k:k + 1] for k in range(6))
        x0 = a * x0l + c * y0l + e  # (F, EP)
        y0 = b * x0l + d * y0l + f
        x1 = a * x1l + c * y1l + e
        y1 = b * x1l + d * y1l + f
        pxmn = np.minimum(x0, x1)
        pxmx = np.maximum(x0, x1)
        # f32-vs-f64 transform divergence is ~|x| * 2^-22 worst case
        # across the 4-op chain; 1e-2 + 1e-5|x| is orders wider.
        eps = 1e-2 + 1e-5 * np.maximum(np.abs(pxmn), np.abs(pxmx))
        live = y0 != y1  # f64-equal => f32-equal, so never undercounts
        crossing = (live[None] & (pxmx[None] + eps[None] > lo)
                    & (pxmn[None] - 1.0 - eps[None] < lo + wblock))
        n = int(crossing.sum(axis=-1).max()) if crossing.size else 0
        s_pads.append(-(-n // e_chunk) * e_chunk if n else 0)
    if not any(s_pads):
        return None
    return {"compact_counts": tuple(s_pads), "wblock": wblock,
            "blocks_per_step": bps}


def _split3_stack(v):
    """Exact f32 = hi + mid + lo bf16 split (XLA-side twin of the
    kernel's split3; 3x8 mantissa bits)."""
    hi = v.astype(jnp.bfloat16)
    hi32 = hi.astype(jnp.float32)
    mid = (v - hi32).astype(jnp.bfloat16)
    mid32 = mid.astype(jnp.float32)
    lo = (v - hi32 - mid32).astype(jnp.bfloat16)
    return hi, mid, lo


def _compact_pre(matrices, tab, *, s_max: int, wblock: int, nb: int,
                 nbp: int, hp: int):
    """Device pre-pass for the compacted sweep (regular XLA, scanned
    over frames): per (frame, column block, layer), gather the pieces
    whose x-transition crosses the block into a dense table, and build
    the per-frame prefix plane (completed-ramp row totals of pieces
    fully LEFT of each block — the in-kernel wb==0 prefix pass, hoisted
    out of the kernel entirely).

    The gather is an exact one-hot MXU matmul: coordinates split into
    3 bf16 parts (each exactly representable), the one-hot has at most
    one nonzero per output slot, so the f32-accumulated products
    reconstruct the f32 coordinates bit-exactly.  Unfilled slots stay
    all-zero: a (0, 0, 0, 0) piece has dy = 0 and pxmx = 0 <= every
    block_lo, so it is never 'crossing' in the kernel's skip test and
    contributes nothing to coverage.

    Returns (ctab (F, NB, L, 4, 1, S), csub (F, NB, L, 4, S, 1),
    prefix (F, L, NBP, HP))."""
    layers, _, _, ep = tab.shape
    fcount = matrices.shape[0]
    m3 = (matrices if matrices.ndim == 3
          else jnp.broadcast_to(matrices[:, None, :], (fcount, layers, 6)))
    x0l = tab[:, 0, 0]  # (L, EP)
    y0l = tab[:, 1, 0]
    x1l = tab[:, 2, 0]
    y1l = tab[:, 3, 0]
    lo = jnp.arange(nb, dtype=jnp.float32) * float(wblock)  # (B,)
    srange = jnp.arange(s_max, dtype=jnp.int32)
    hrow = jnp.arange(hp, dtype=jnp.float32)

    def frame(_, mf):  # mf: (L, 6) this frame's matrices
        a, b, c, d, e, f = (mf[:, k:k + 1] for k in range(6))  # (L, 1)
        x0 = a * x0l + c * y0l + e  # (L, EP) f32 device px
        y0 = b * x0l + d * y0l + f
        x1 = a * x1l + c * y1l + e
        y1 = b * x1l + d * y1l + f
        pxmn = jnp.minimum(x0, x1)
        pxmx = jnp.maximum(x0, x1)
        live = y0 != y1
        left = pxmx[:, None, :] <= lo[None, :, None]  # (L, B, EP)
        crossing = (live[:, None, :] & jnp.logical_not(left)
                    & (pxmn[:, None, :] - 1.0
                       < lo[None, :, None] + wblock))
        pos = jnp.cumsum(crossing.astype(jnp.int32), axis=-1) - 1
        pos = jnp.where(crossing, pos, -1)  # (L, B, EP)
        vals = jnp.stack([x0, y0, x1, y1], axis=-1)  # (L, EP, 4)
        parts = jnp.concatenate(_split3_stack(vals), axis=-1)  # (L,EP,12)
        comp = jnp.zeros((layers, nb, s_max, 12), jnp.float32)
        for e0 in range(0, ep, 512):  # slab the one-hot's VMEM/HBM
            oh = (pos[..., e0:e0 + 512, None] == srange).astype(
                jnp.bfloat16)  # (L, B, EC, S)
            comp = comp + jnp.einsum(
                "lbes,lep->lbsp", oh, parts[:, e0:e0 + 512],
                preferred_element_type=jnp.float32)
        c4 = comp[..., 0:4] + comp[..., 4:8] + comp[..., 8:12]

        rowbase = jnp.floor(jnp.minimum(y0, y1))  # (L, EP)
        pref = jnp.zeros((layers, nbp, hp), jnp.float32)
        for k in (0, 1):
            py = rowbase + k
            cy0 = jnp.clip(y0 - py, 0.0, 1.0)
            cy1 = jnp.clip(y1 - py, 0.0, 1.0)
            dy = cy1 - cy0  # (L, EP)
            w = dy[:, None, :] * left.astype(jnp.float32)  # (L, B, EP)
            ohr = (py[:, :, None] == hrow).astype(jnp.bfloat16)
            for part in _split3_stack(w):
                pref = pref.at[:, :nb].add(jnp.einsum(
                    "lbe,ley->lby", part, ohr,
                    preferred_element_type=jnp.float32))
        return None, (c4, pref)

    _, (c4, pref) = jax.lax.scan(frame, None, m3)
    # c4: (F, L, B, S, 4) -> block-major kernel layouts.
    cm = c4.transpose(0, 2, 1, 4, 3)  # (F, B, L, 4, S)
    return cm[:, :, :, :, None, :], cm[..., None], pref


def sweep_paints(paints, matrices, allow_fields: bool = False):
    """Per-layer style Paints + per-frame device affines ->
    (KernelPaint tuple, (F, L, 6) grad_mats or None) for
    render_affine_sweep.

    Solid layers read per-layer/per-frame colors as before; sRGB
    LINEAR/FOCAL gradient layers evaluate in-kernel with a per-frame
    composed matrix: gradient coord of device point p in frame f is
    ``paint.inv_matrix(M_f^{-1}(p))`` (the paint was compiled at the
    base transform; the frame affine moves the geometry, and SWF
    gradients move WITH the shape).

    ``allow_fields=False`` (the classic contract): raises ValueError for
    paints the kernel can't evaluate in-line (bitmaps, linear-RGB
    gradients) and for singular frame matrices.

    ``allow_fields=True``: those layers instead become
    ``KernelPaint.field(slot)`` entries and the return gains a third
    element — a list of ``SweepFieldSpec(layer, paint, invs)`` with the
    per-frame composed device->paint inverses (F, 6) — to feed
    ``bake_sweep_fields`` (the sweep analog of the flat-block kernel's
    prefetched field planes: the reference replays pattern fills under a
    new matrix at draw time, canvas-renderer.ts:179-184, 295-315)."""
    from ..models.geometry import Affine
    from . import style as style_ops

    per_layer = _per_layer_mats(matrices, len(paints))
    f_count = per_layer[0].shape[0]
    kps = []
    gm = np.zeros((f_count, len(paints), 6), np.float32)
    any_grad = False
    field_specs = []

    def composed_invs(p, li):
        inv = Affine(*p.inv_matrix)
        out = np.zeros((f_count, 6), np.float32)
        for f in range(f_count):
            frame_inv = Affine(*per_layer[li][f]).inverse()
            out[f] = inv.then(frame_inv).as_tuple()
        return out

    for li, p in enumerate(paints):
        if p.kind == style_ops.PAINT_SOLID:
            kps.append(KernelPaint.color())
            continue
        if (p.kind not in (style_ops.PAINT_LINEAR, style_ops.PAINT_FOCAL)
                or p.color_space == "linear-rgb"):
            if not allow_fields:
                raise ValueError(
                    "sweep paints must be solid or sRGB linear/focal "
                    f"gradients, got kind {p.kind}/{p.color_space}")
            kps.append(KernelPaint.field(len(field_specs)))
            field_specs.append(
                SweepFieldSpec(li, p, composed_invs(p, li)))
            continue
        any_grad = True
        kind = (KPAINT_LINEAR if p.kind == style_ops.PAINT_LINEAR
                else KPAINT_FOCAL)
        kps.append(KernelPaint.gradient(
            kind, (), p.stop_ratios, p.stop_colors,
            focal=p.focal_point, spread=p.spread))
        gm[:, li] = composed_invs(p, li)
    if allow_fields:
        return tuple(kps), (gm if any_grad else None), field_specs
    return tuple(kps), (gm if any_grad else None)


@dataclasses.dataclass(frozen=True)
class SweepFieldSpec:
    """One sweep layer whose paint bakes to per-frame field planes."""

    layer: int
    paint: object        # ops.style.Paint (bitmap or linear-RGB gradient)
    invs: np.ndarray     # (F, 6) composed device->paint inverses


def bake_sweep_fields(field_specs, height: int, width: int,
                      stop_tracks=None,
                      frame_chunk: int = 8) -> jnp.ndarray:
    """SweepFieldSpecs -> (NF, F, H, W, 4) f32 straight-RGBA field planes.

    One jit per spec, mapped over the frame axis of the composed
    inverse matrices: the SAME sampling math as the per-frame styled
    path (style.paint_field_traced), so a sweep with baked fields
    matches frame-by-frame renders wherever paint_field itself takes the
    traced (gather) path — i.e. every non-axis-aligned frame.  Host work
    stays O(1) in frame count; the bake is regular fused XLA on device.

    ``frame_chunk``: the frame axis maps in chunks of this size
    (lax.map batch_size) rather than one flat vmap — XLA pads a
    bitmap-gather's flattened (N, 4) intermediate to 128 lanes, so an
    unchunked 480-frame 512^2 bake tried to allocate 60 GB of HBM
    (measured; 8-frame chunks bound it at ~1 GB).

    ``stop_tracks``: optional [NF] list of (F, K, 4) per-frame stop-color
    overrides (linear-RGB gradient fades); None entries keep static
    stops.

    Bitmap paints with small textures bake through the gather-free MXU
    kernel (ops.texfield.bitmap_field_planes — 49.8 -> ~1 ms/frame at
    512^2, PERF.md); large textures and gradients take the
    paint_field_traced map."""
    from . import style as style_ops
    from .texfield import MAX_KERNEL_TEXELS, bitmap_field_planes

    outs = []
    for si, spec in enumerate(field_specs):
        track = None if stop_tracks is None else stop_tracks[si]
        p = spec.paint
        invs_np = np.asarray(spec.invs, np.float32)
        # Identical-inverse dedup (round 5): a layer whose composed
        # device->paint inverse repeats across frames (static bitmap
        # layer in an otherwise-animated scene, a rotation track with
        # repeated angles, a paused timeline) bakes each UNIQUE matrix
        # once and broadcasts — exact by construction (byte-equal rows
        # produce byte-equal planes), F/U x less bake compute.
        if track is None and invs_np.shape[0] > 1:
            uniq, inv_idx = np.unique(invs_np, axis=0,
                                      return_inverse=True)
            if uniq.shape[0] < invs_np.shape[0]:
                sub = bake_sweep_fields(
                    [SweepFieldSpec(spec.layer, p, uniq)], height,
                    width, frame_chunk=frame_chunk)[0]
                outs.append(jnp.take(sub,
                                     jnp.asarray(inv_idx.reshape(-1)),
                                     axis=0))
                continue
        invs = jnp.asarray(invs_np)
        if p.kind == style_ops.PAINT_BITMAP:
            # Axis-aligned frames MUST bake through the same separable
            # weights the per-frame path uses (paint_field routes
            # axis-aligned smoothed fills through the exact box filter
            # on downscaled axes — pixman GOOD / player semantics); the
            # supersampled-bilinear kernel/gather bake silently diverges
            # there.  Non-axis-aligned frames keep the kernel/gather
            # path, which IS what paint_field does for rotated matrices.
            sep = style_ops.separable_frames_mask(p, invs_np)
            if sep.all():
                outs.append(style_ops.separable_field_stack(
                    p, invs_np, height, width))
                continue
            small = (p.image.shape[0] * p.image.shape[1]
                     <= MAX_KERNEL_TEXELS)
            if not sep.any():
                if small:
                    from .texfield import auto_ywin
                    outs.append(bitmap_field_planes(
                        p.image, invs, height, width,
                        supersample=max(1, int(p.supersample)),
                        repeating=p.repeating, smoothed=p.smoothed,
                        edge_mode=p.edge_mode,
                        ywin=auto_ywin(invs_np, p.image.shape[0],
                                       repeating=p.repeating)))
                    continue
            else:
                # Mixed track (e.g. a rotation sweeping through 0):
                # bake each subset with its matching path and
                # re-interleave along the frame axis.
                idx = np.where(sep)[0]
                rest = np.where(~sep)[0]
                sub_sep = style_ops.separable_field_stack(
                    p, invs_np[idx], height, width)
                sub_rest = bake_sweep_fields(
                    [SweepFieldSpec(spec.layer, p, invs_np[rest])],
                    height, width,
                    stop_tracks=None if track is None
                    else [np.asarray(track)[rest]],
                    frame_chunk=frame_chunk)[0]
                out = jnp.zeros(
                    (invs_np.shape[0], height, width, 4), jnp.float32)
                out = out.at[jnp.asarray(idx)].set(sub_sep)
                outs.append(out.at[jnp.asarray(rest)].set(sub_rest))
                continue
        fn = _bake_fn(p, height, width, track is not None, frame_chunk)
        if track is None:
            outs.append(fn(invs))
        else:
            outs.append(fn((invs, jnp.asarray(track, jnp.float32))))
    return jnp.stack(outs, axis=0)


# jax.jit caches on FUNCTION IDENTITY: constructing a fresh closure per
# bake call would retrace (and remote-compile) every frame of an
# interactive loop with gradient/large-bitmap layers.  Memoize the
# jitted map per (paint identity, geometry, tracked, chunk); entries
# retain the paint so an id() can't alias a collected object.  LRU
# eviction (not clear-all: dropping a HOT entry costs a 30-60 s remote
# recompile mid-session) bounds how many Paint objects — including full
# bitmap images — a long-lived frame server pins; guarded by a lock
# since renders on different service handles run concurrently.
_BAKE_JIT_CACHE: "collections.OrderedDict" = collections.OrderedDict()
_BAKE_JIT_CACHE_MAX = 64
_BAKE_JIT_LOCK = threading.Lock()


def _bake_fn(paint, height: int, width: int, tracked: bool,
             frame_chunk: int):
    from . import style as style_ops

    key = (id(paint), height, width, tracked, frame_chunk)
    with _BAKE_JIT_LOCK:
        hit = _BAKE_JIT_CACHE.get(key)
        if hit is not None and hit[0] is paint:
            _BAKE_JIT_CACHE.move_to_end(key)
            return hit[1]

    def bake_one(args, _p=paint, _tracked=tracked):
        inv6, sc = args if _tracked else (args, None)
        return style_ops.paint_field_traced(
            _p, inv6, height, width, stop_colors=sc)

    fn = jax.jit(functools.partial(jax.lax.map, bake_one,
                                   batch_size=frame_chunk))
    with _BAKE_JIT_LOCK:
        _BAKE_JIT_CACHE[key] = (paint, fn)
        _BAKE_JIT_CACHE.move_to_end(key)
        while len(_BAKE_JIT_CACHE) > _BAKE_JIT_CACHE_MAX:
            _BAKE_JIT_CACHE.popitem(last=False)
    return fn


def _xform_kernel(mats_ref, colors_ref, *rest,
                  layers: int, wblock: int, hp: int, fill_rule: int,
                  e_chunk: int, per_layer: bool, skip_empty: bool = True,
                  per_frame_colors: bool = False, morph: bool = False,
                  paints=None, dyn_stops: bool = False,
                  layer_counts=None, prefix_cheap: bool = False,
                  bps: int = 1, compact: bool = False,
                  prefilter: bool = False, chunk_list: bool = False,
                  x_shift: bool = False):
    gm_ref = sc_ref = prefix_ref = cheap_ref = None
    field_refs = ()  # per-(frame, block) baked paint planes, last inputs
    bounds_ref = None
    counts_ref = idx_ref = None
    xs_ref = None
    if x_shift:
        # Tile-sharding x-origin (SMEM scalar): the kernel rasterizes in
        # GLOBAL device coordinates — matrices stay unfolded and the
        # shard origin shifts the PIXEL GRID (px, block bounds) instead
        # of the geometry.  Integer grid + integer origin add exactly in
        # f32, so every subtraction, compare, and partial-sum grouping
        # is BIT-identical to the single-device kernel whenever the
        # shard layout mirrors the full-width one (_tile_shard_layout);
        # only the output slot is local.  (The old translate-fold
        # perturbed the FMA rounding by a full u8 quantum; shifting the
        # GEOMETRY post-transform still left ulp-level regrouping from
        # rounded far-coordinate subtractions — shifting the GRID leaves
        # nothing.)
        xs_ref, *rest = rest
    if chunk_list:
        # Per-(frame, layer, block) SMEM lists of the chunks whose
        # transformed x-transition can cross that block (precomputed in
        # XLA from the same ±0.5-slack bounds as the prefilter).  The
        # heavy path fori_loops over the ~2-3 listed chunks instead of
        # branch-testing every chunk — the per-(block, chunk, layer)
        # pl.when sequencing WAS the sweep's dominant fixed cost
        # (PERF.md round-3 decomposition + round-4 fix).
        counts_ref, idx_ref, *rest = rest
    if prefilter:
        # Per-(frame, layer, chunk) transformed x-extent bounds (SMEM,
        # precomputed in XLA): two scalar compares decide whether a
        # (block, chunk) pair can contain ANY crossing piece — the
        # in-kernel chunk transform + per-piece crossing reduction that
        # used to run for EVERY pair was the sweep's dominant fixed cost
        # (~0.7 of 1.07 ms/frame at 1080p, PERF.md decomposition).
        bounds_ref, *rest = rest
    if compact:
        # Compacted mode (_compact_pre): tab/subxy hold THIS (frame,
        # grid step)'s crossing pieces already in device px; the prefix
        # plane is precomputed per frame — no in-kernel transform, no
        # wb==0 prefix pass, no cheap-plane scratch.
        if paints is not None:
            if dyn_stops:
                (gm_ref, sc_ref, tab_ref, subxy_ref, prefix_ref,
                 *field_refs, out_ref, acc_ref) = rest
            else:
                (gm_ref, tab_ref, subxy_ref, prefix_ref, *field_refs,
                 out_ref, acc_ref) = rest
        else:
            (tab_ref, subxy_ref, prefix_ref, *field_refs, out_ref,
             acc_ref) = rest
    elif morph:
        (ratios_ref, colors_e_ref, tab_ref, subxy_ref, tab2_ref,
         subxy2_ref, out_ref, acc_ref, cheap_ref) = rest
    elif paints is not None:
        if dyn_stops:
            (gm_ref, sc_ref, tab_ref, subxy_ref, *field_refs, out_ref,
             acc_ref, cheap_ref) = rest
        else:
            (gm_ref, tab_ref, subxy_ref, *field_refs, out_ref, acc_ref,
             cheap_ref) = rest
    else:
        tab_ref, subxy_ref, out_ref, acc_ref, cheap_ref = rest
    i = pl.program_id(0)
    wb = pl.program_id(1)
    t_r = None if not morph else ratios_ref[i]
    xs = xs_ref[0] if x_shift else None

    def mat(lyr):
        if per_layer:
            return tuple(mats_ref[i, lyr, k] for k in range(6))
        return tuple(mats_ref[i, k] for k in range(6))
    # Column-block tiling bounds scoped VMEM structurally: all (wblock, *)
    # temporaries, regardless of how the unrolled piece loop's liveness
    # is analyzed (a full-width 512^2 frame with 3.5K pieces blew the
    # 16 MB scoped-vmem limit).
    wp = wblock
    px_iota = jax.lax.broadcasted_iota(
        jnp.int32, (wp, 1), 0).astype(jnp.float32)
    hlane = jax.lax.broadcasted_iota(
        jnp.int32, (1, hp), 1).astype(jnp.float32)
    ep = tab_ref.shape[-1]

    def split3(v):
        """Exact f32 = hi + mid + lo bf16 split (3x8 mantissa bits)."""
        hi = v.astype(jnp.bfloat16)
        hi32 = hi.astype(jnp.float32)
        mid = (v - hi32).astype(jnp.bfloat16)
        mid32 = mid.astype(jnp.float32)
        lo = (v - hi32 - mid32).astype(jnp.bfloat16)
        return hi, mid, lo

    def chunk_vals(lyr, sl, abcdef):
        """Transformed piece coordinates for one (layer, piece chunk):
        lane-layout endpoints, sublane-layout row bases."""
        a, b, c, d, e, f = abcdef

        def tabv(ch):
            v = tab_ref[lyr, ch, :, sl]  # (1, EC) local coords
            if morph:  # ratio lerp BEFORE the frame transform
                v = (1.0 - t_r) * v + t_r * tab2_ref[lyr, ch, :, sl]
            return v

        def subv(ch):
            v = subxy_ref[lyr, ch, sl, :]  # (EC, 1)
            if morph:
                v = (1.0 - t_r) * v + t_r * subxy2_ref[lyr, ch, sl, :]
            return v

        x0l, y0l, x1l, y1l = tabv(0), tabv(1), tabv(2), tabv(3)
        x0 = a * x0l + c * y0l + e
        y0 = b * x0l + d * y0l + f
        x1 = a * x1l + c * y1l + e
        y1 = b * x1l + d * y1l + f
        # Sublane copies of the transformed ys (for the row one-hot).
        y0s = b * subv(0) + d * subv(1) + f  # (EC, 1)
        y1s = b * subv(2) + d * subv(3) + f
        rowbase = jnp.floor(jnp.minimum(y0, y1))        # (1, EC)
        rowbase_sub = jnp.floor(jnp.minimum(y0s, y1s))  # (EC, 1)
        return x0, y0, x1, y1, rowbase, rowbase_sub

    def make_row_terms(vals):
        x0, y0, x1, y1, rowbase, rowbase_sub = vals

        def row_terms(k):
            py = rowbase + k
            sy0, sy1 = y0 - py, y1 - py
            cy0 = jnp.clip(sy0, 0.0, 1.0)
            cy1 = jnp.clip(sy1, 0.0, 1.0)
            dy = cy1 - cy0
            onehot = (rowbase_sub + k == hlane).astype(jnp.bfloat16)
            return dy, onehot, sy0, sy1, cy0, cy1
        return row_terms

    def chunk_vals_compact(b_i, lyr, sl):
        """Compacted-mode twin of chunk_vals: pieces are already in
        device px (gathered per (frame, block) by _compact_pre)."""
        x0 = tab_ref[0, 0, b_i, lyr, 0, :, sl]  # (1, EC)
        y0 = tab_ref[0, 0, b_i, lyr, 1, :, sl]
        x1 = tab_ref[0, 0, b_i, lyr, 2, :, sl]
        y1 = tab_ref[0, 0, b_i, lyr, 3, :, sl]
        y0s = subxy_ref[0, 0, b_i, lyr, 1, sl, :]  # (EC, 1)
        y1s = subxy_ref[0, 0, b_i, lyr, 3, sl, :]
        rowbase = jnp.floor(jnp.minimum(y0, y1))
        rowbase_sub = jnp.floor(jnp.minimum(y0s, y1s))
        return x0, y0, x1, y1, rowbase, rowbase_sub

    def chunk_slices(lyr):
        ep_l = ep if layer_counts is None else min(
            ep, -(-layer_counts[lyr] // e_chunk) * e_chunk)
        return [slice(e0, min(e0 + e_chunk, ep))
                for e0 in range(0, ep_l, e_chunk)]

    nbp = prefix_ref.shape[2] if compact else cheap_ref.shape[1]

    if prefix_cheap:
        # Once per FRAME (first column block of the sequential grid):
        # every block's completed-ramp total, for all chunks, in ONE
        # (NBP, EC) @ (EC, HP) product per (chunk, row) — W[b, j] = 1
        # iff piece j sits fully left of block b, weighted by dy.  The
        # per-block cheap path (and its per-block one-hot builds, 15x
        # per frame at 1080p) disappears; the heavy path masks left
        # pieces out so nothing double-counts.
        @pl.when(wb == 0)
        def _prefix():
            block_los = (jax.lax.broadcasted_iota(
                jnp.int32, (nbp, 1), 0) * wblock).astype(jnp.float32)
            if xs is not None:
                block_los = block_los + xs  # global pixel grid
            for lyr in range(layers):
                abcdef = mat(lyr)
                cheap_ref[lyr] = jnp.zeros((nbp, hp), jnp.float32)
                for sl in chunk_slices(lyr):
                    vals = chunk_vals(lyr, sl, abcdef)
                    x0, _, x1 = vals[0], vals[1], vals[2]
                    pxmx = jnp.maximum(x0, x1)   # (1, EC)
                    w_blk = (pxmx <= block_los).astype(jnp.float32)
                    row_terms = make_row_terms(vals)
                    for k in (0, 1):
                        dy, onehot, *_ = row_terms(k)
                        parts = jnp.concatenate(
                            split3(dy * w_blk), axis=0)  # (3*NBP, EC)
                        prod = jnp.dot(parts, onehot,
                                       preferred_element_type=jnp.float32)
                        cheap_ref[lyr] = cheap_ref[lyr] + (
                            prod[0:nbp] + prod[nbp:2 * nbp]
                            + prod[2 * nbp:3 * nbp])

    def do_block(wbe, b_i, osl):
        """One column block's full pass: accumulate, resolve, pack into
        out_ref[0, osl].  ``wbe`` is the GLOBAL block index (grid step *
        blocks-per-step + local offset) — multiple blocks per grid step
        amortize the per-step fixed overhead (PERF.md sweep study);
        ``b_i`` is the local offset (indexes the compacted tables)."""
        px = wbe * wblock + px_iota
        if xs is not None:
            px = px + xs  # global pixel grid (exact integer f32 add)
        for lyr in range(layers):
            abcdef = None if compact else mat(lyr)
            acc_ref[lyr] = jnp.zeros((wp, hp), jnp.float32)
            if not (prefix_cheap or compact):
                cheap_ref[lyr] = jnp.zeros((nbp, hp), jnp.float32)
            block_lo = (wbe * wblock).astype(jnp.float32)
            if xs is not None:
                block_lo = block_lo + xs
            block_hi = block_lo + wblock

            def ramp_accum(lyr, vals, lmask):
                """Exact per-piece coverage ramps into acc_ref[lyr]: a
                fully-left piece yields dy (_h01 saturates to mean 0),
                a fully-right piece yields 0 (mean 1); ``lmask`` masks
                left pieces out in prefix mode (the per-frame prefix
                plane already holds them).  Compacted tables contain no
                left pieces at all (lmask None)."""
                x0, y0, x1, y1, rowbase, rowbase_sub = vals
                row_terms = make_row_terms(vals)
                for k in (0, 1):
                    dy, onehot, sy0, sy1, cy0, cy1 = row_terms(k)
                    dyd = sy1 - sy0
                    safe = jnp.where(jnp.abs(dyd) < 1e-9, 1.0, dyd)
                    t0 = (cy0 - sy0) / safe
                    t1 = (cy1 - sy0) / safe
                    xa = x0 + t0 * (x1 - x0)
                    xb = x0 + t1 * (x1 - x0)
                    xmn = jnp.minimum(xa, xb)
                    xmx = jnp.maximum(xa, xb)
                    span = xmx - xmn
                    safe_span = jnp.where(span < 1e-9, 1.0, span)
                    rel_mn = xmn - px  # (WP, EC)
                    rel_mx = xmx - px
                    mean = jnp.where(
                        span < 1e-9,
                        jnp.clip(0.5 * (rel_mn + rel_mx), 0.0, 1.0),
                        (_h01(rel_mx) - _h01(rel_mn)) / safe_span)
                    ramp = dy * (1.0 - mean)  # (WP, EC) exact f32
                    if lmask is not None:
                        ramp = ramp * (1.0 - lmask)
                    for part in split3(ramp):
                        acc_ref[lyr] = acc_ref[lyr] + jnp.dot(
                            part, onehot,
                            preferred_element_type=jnp.float32)

            if chunk_list:
                # Dynamic walk of ONLY the chunks listed as possibly
                # crossing this block (ascending chunk order — the same
                # accumulation order as the static loop; skipped chunks
                # contributed exact zeros there).  One fori_loop replaces
                # n_chunks pl.when sites per (block, layer).
                def body(j, carry, lyr=lyr, abcdef=abcdef,
                         block_lo=block_lo):
                    c = idx_ref[0, lyr, wbe, j]
                    sl = pl.dslice(c * e_chunk, e_chunk)
                    vals = chunk_vals(lyr, sl, abcdef)
                    pxmx = jnp.maximum(vals[0], vals[2])
                    lmask = (pxmx <= block_lo).astype(jnp.float32)
                    ramp_accum(lyr, vals,
                               lmask if prefix_cheap else None)
                    return carry

                jax.lax.fori_loop(0, counts_ref[0, lyr, wbe], body, 0)
                continue

            # Pieces stream through in e_chunk slices: the (WP, EC) ramp
            # temporaries, not the piece count, bound scoped VMEM (a 512^2
            # frame with 3.5K pieces at full width blew the 16 MB limit).
            for ci, sl in enumerate(chunk_slices(lyr)):
                if bounds_ref is not None and skip_empty and prefix_cheap:
                    # SMEM prefilter: two scalar compares on the chunk's
                    # precomputed transformed x-extent replace the full
                    # in-kernel chunk transform + per-piece crossing
                    # reduction for non-crossing pairs (left pieces live
                    # in the prefix plane, right pieces contribute 0).
                    possible = jnp.logical_and(
                        bounds_ref[0, lyr, ci, 1] > block_lo,
                        bounds_ref[0, lyr, ci, 0] - 1.0 < block_hi)

                    @pl.when(possible)
                    def _full(lyr=lyr, sl=sl, abcdef=abcdef):
                        vals = chunk_vals(lyr, sl, abcdef)
                        pxmx = jnp.maximum(vals[0], vals[2])
                        lmask = (pxmx <= block_lo).astype(jnp.float32)
                        ramp_accum(lyr, vals, lmask)
                    continue

                vals = (chunk_vals_compact(b_i, lyr, sl) if compact
                        else chunk_vals(lyr, sl, abcdef))
                x0, x1 = vals[0], vals[2]

                # Block/chunk classification on PIECE x-extents: a piece
                # whose whole extent sits left of this column block
                # contributes EXACTLY dy to every column (its coverage ramp
                # has completed), one fully right contributes exactly 0, and
                # only pieces whose transition [xmn-1, xmx] crosses the block
                # need the per-column ramp.  Pieces are path-ordered (hence
                # spatially coherent), so many (block, chunk) pairs have no
                # crossing piece and skip the heavy (WP, EC) work entirely.
                pxmn = jnp.minimum(x0, x1)
                pxmx = jnp.maximum(x0, x1)
                left = pxmx <= block_lo
                crossing = jnp.logical_and(jnp.logical_not(left),
                                           pxmn - 1.0 < block_hi)
                any_cross = jnp.any(crossing)
                lmask = left.astype(jnp.float32)
                pmask = (lmask if (prefix_cheap and not compact)
                         else None)

                if not skip_empty:
                    ramp_accum(lyr, vals, pmask)
                    continue

                if prefix_cheap or compact:
                    # Compact mode: trailing all-padding chunks (zero
                    # pieces are never 'crossing') skip the ramp work.
                    @pl.when(any_cross)
                    def _full(lyr=lyr, vals=vals, pmask=pmask):
                        ramp_accum(lyr, vals, pmask)
                    continue

                @pl.when(any_cross)
                def _full(lyr=lyr, vals=vals):
                    ramp_accum(lyr, vals, None)

                @pl.when(jnp.logical_not(any_cross))
                def _bcast(lyr=lyr, vals=vals, lmask=lmask):
                    # No transition crosses this block: left pieces add dy
                    # (a px-independent ROW value), right pieces add 0.  The
                    # three bf16 parts stack into ONE (3, EC) @ (EC, HP)
                    # product per row, accumulated into the TINY (8, hp)
                    # side plane — no (wblock, hp) RMW and one one-hot read
                    # per row instead of three (the cheap path's full-size
                    # accumulator traffic was the dominant sweep cost:
                    # PERF.md round-3 sweep study).
                    row_terms = make_row_terms(vals)
                    for ki, k in enumerate((0, 1)):
                        dy, onehot, *_ = row_terms(k)
                        parts = jnp.concatenate(split3(dy * lmask), axis=0)
                        sl3 = slice(3 * ki, 3 * ki + 3)
                        cheap_ref[lyr, sl3] = cheap_ref[lyr, sl3] + jnp.dot(
                            parts, onehot,
                            preferred_element_type=jnp.float32)

        rules = layer_rules(fill_rule, layers)
        # Winding = block accumulator + the cheap plane's row totals (a
        # (1, hp) broadcast folded as an expression, no extra RMW).  In
        # prefix/compact mode the plane holds one row PER BLOCK; select
        # this block's row by masked sum (no dynamic sublane slicing).
        if compact:
            row_sel = (jax.lax.broadcasted_iota(
                jnp.int32, (nbp, 1), 0) == wbe).astype(jnp.float32)

            def cheap_rows(lyr):
                return jnp.sum(prefix_ref[0, lyr] * row_sel, axis=0,
                               keepdims=True)
        elif prefix_cheap:
            row_sel = (jax.lax.broadcasted_iota(
                jnp.int32, (nbp, 1), 0) == wbe).astype(jnp.float32)

            def cheap_rows(lyr):
                return jnp.sum(cheap_ref[lyr] * row_sel, axis=0,
                               keepdims=True)
        else:
            def cheap_rows(lyr):
                return jnp.sum(cheap_ref[lyr], axis=0, keepdims=True)
        covs = [fill_rule_cov(acc_ref[lyr] + cheap_rows(lyr), rules[lyr])
                for lyr in range(layers)]

        grad_cache = {}

        def grad_plane(lyr):
            """In-kernel gradient field for this (frame, column block): the
            per-frame composed matrix (paint inverse ∘ frame inverse) comes
            from SMEM; stops/focal/spread are baked via KernelPaint — the
            ramp math is _grad_eval, shared with the flat-block kernel."""
            if lyr not in grad_cache:
                # gm_ref is a (1, L, 6) SMEM window of this frame's matrices
                # (windowed so a long timeline's track never outgrows SMEM).
                ga, gb, gc, gd, ge, gf = (gm_ref[0, lyr, k] for k in range(6))
                # px is already the GLOBAL pixel grid under tile-sharding
                # (x_shift), matching the global gradient matrices.
                pxc = px + 0.5     # (WP, 1) pixel-center x for this block
                pyc = hlane + 0.5  # (1, HP) pixel-center y
                sx = ga * pxc + gc * pyc + ge
                sy = gb * pxc + gd * pyc + gf
                sc = None
                if sc_ref is not None:
                    # This frame's (1, L, K, 4) SMEM stop-color window:
                    # per-frame color-transform FADES fold into per-frame
                    # stops (exactly compile-with-ct semantics per frame).
                    sc = [[sc_ref[0, lyr, k, ch] for ch in range(4)]
                          for k in range(len(paints[lyr].stop_ratios))]
                grad_cache[lyr] = _grad_eval(paints[lyr], sx, sy,
                                             stop_colors=sc)
            return grad_cache[lyr]

        def read_color(lyr, ch):
            if morph:
                return ((1.0 - t_r) * colors_ref[lyr, ch]
                        + t_r * colors_e_ref[lyr, ch])
            if paints is not None and paints[lyr].kind == KPAINT_FIELD:
                # Baked per-(frame, block) plane (bitmap / linear-RGB
                # gradient layers): streamed straight-RGBA, (wblock, hp).
                return field_refs[paints[lyr].slot][0, 0, b_i, ch]
            if paints is not None and paints[lyr].kind != KPAINT_COLOR:
                return grad_plane(lyr)[ch]
            if per_frame_colors:
                return colors_ref[i, lyr, ch]
            return colors_ref[lyr, ch]


        out_ref[0, osl] = composite_quantize_pack(
            covs, read_color, layers=layers)

    for b_i in range(bps):
        do_block(wb * bps + b_i, b_i,
                 slice(b_i * wblock, (b_i + 1) * wblock))


def _xform_kernel_rows(mats_ref, colors_ref, *rest,
                       layers: int, wchunk: int, wp: int, fill_rule: int,
                       e_chunk: int, per_layer: bool,
                       skip_empty: bool = True, x_split: bool = True,
                       per_frame_colors: bool = False, morph: bool = False,
                       paints=None, dyn_stops: bool = False,
                       layer_counts=None):
    """ROW-GRID sweep kernel: grid = (frame, 128-lane row block).

    The column-grid kernel (_xform_kernel) pays a fixed VMEM-traffic
    toll per (column block, piece chunk, layer): six read-modify-writes
    of the full (wblock, hp) accumulator plus an (EC, hp) row one-hot
    build/read — on BOTH the heavy and the cheap path.  Measured at
    1080p that traffic (~2 GB/frame) IS the 1.2 ms/frame, and finer
    granularity only adds more fixed-cost pairs (tools/exp_sweepcost.py:
    wblock 64 is 1.5x WORSE).  Tiling ROWS instead makes everything
    row-local and small:

    * the accumulator holds one 128-lane row block across the FULL
      width — matmul outputs and RMWs shrink from (wblock, hp) to
      (wchunk, 128);
    * the row one-hot is (EC, 128), built ONCE per (chunk, row) and
      reused by every width chunk;
    * coverage contributions are row-local, so a piece chunk whose rows
      miss this block is skipped ENTIRELY (no cheap path needed for
      row misses — unlike column blocks, where left-of-block pieces
      still owe their completed dy ramp);
    * inside a live chunk, the x-transition crossing test from the
      column kernel still applies per width chunk, and the no-crossing
      (1, EC) @ (EC, 128) broadcast results accumulate into a TINY
      (n_wchunks, 128) side plane folded into the accumulator once at
      resolve — the cheap path does no full-size RMW at all.

    Same math, same inputs/outputs as _xform_kernel (frames come out
    transposed (WP, HP) packed u32)."""
    gm_ref = sc_ref = None
    if morph:
        (ratios_ref, colors_e_ref, tab_ref, subxy_ref, tab2_ref,
         subxy2_ref, out_ref, acc_ref, cheap_ref) = rest
    elif paints is not None:
        if dyn_stops:
            (gm_ref, sc_ref, tab_ref, subxy_ref, out_ref, acc_ref,
             cheap_ref) = rest
        else:
            (gm_ref, tab_ref, subxy_ref, out_ref, acc_ref,
             cheap_ref) = rest
    else:
        tab_ref, subxy_ref, out_ref, acc_ref, cheap_ref = rest
    i = pl.program_id(0)
    hb = pl.program_id(1)
    t_r = None if not morph else ratios_ref[i]

    def mat(lyr):
        if per_layer:
            return tuple(mats_ref[i, lyr, k] for k in range(6))
        return tuple(mats_ref[i, k] for k in range(6))

    hb0 = (hb * LANE).astype(jnp.float32)
    hlane = hb0 + jax.lax.broadcasted_iota(
        jnp.int32, (1, LANE), 1).astype(jnp.float32)
    n_wc = wp // wchunk
    ep = tab_ref.shape[-1]

    def split3(v):
        """Exact f32 = hi + mid + lo bf16 split (3x8 mantissa bits)."""
        hi = v.astype(jnp.bfloat16)
        hi32 = hi.astype(jnp.float32)
        mid = (v - hi32).astype(jnp.bfloat16)
        mid32 = mid.astype(jnp.float32)
        lo = (v - hi32 - mid32).astype(jnp.bfloat16)
        return hi, mid, lo

    for lyr in range(layers):
        a, b, c, d, e, f = mat(lyr)
        acc_ref[lyr] = jnp.zeros((wp, LANE), jnp.float32)
        cheap_ref[lyr] = jnp.zeros((n_wc, LANE), jnp.float32)
        ep_l = ep if layer_counts is None else min(
            ep, -(-layer_counts[lyr] // e_chunk) * e_chunk)
        for e0 in range(0, ep_l, e_chunk):
            sl = slice(e0, min(e0 + e_chunk, ep))

            def tabv(ch):
                v = tab_ref[lyr, ch, :, sl]  # (1, EC) local coords
                if morph:  # ratio lerp BEFORE the frame transform
                    v = (1.0 - t_r) * v + t_r * tab2_ref[lyr, ch, :, sl]
                return v

            def subv(ch):
                v = subxy_ref[lyr, ch, sl, :]  # (EC, 1)
                if morph:
                    v = (1.0 - t_r) * v + t_r * subxy2_ref[lyr, ch, sl, :]
                return v

            x0l, y0l, x1l, y1l = tabv(0), tabv(1), tabv(2), tabv(3)
            x0 = a * x0l + c * y0l + e
            y0 = b * x0l + d * y0l + f
            x1 = a * x1l + c * y1l + e
            y1 = b * x1l + d * y1l + f
            y0s = b * subv(0) + d * subv(1) + f  # (EC, 1)
            y1s = b * subv(2) + d * subv(3) + f
            rowbase = jnp.floor(jnp.minimum(y0, y1))        # (1, EC)
            rowbase_sub = jnp.floor(jnp.minimum(y0s, y1s))  # (EC, 1)

            # Contributions are row-local (the one-hot places rows
            # k in {0, 1} above rowbase): a chunk none of whose piece
            # rows intersect this 128-lane block does NOTHING here.
            rows_in = jnp.logical_and(
                jnp.logical_and(rowbase + 1.0 >= hb0,
                                rowbase <= hb0 + (LANE - 1.0)),
                y0 != y1)

            def chunk_body():
                pxmn = jnp.minimum(x0, x1)
                pxmx = jnp.maximum(x0, x1)
                # Per-row (1, EC) terms + the (EC, 128) one-hot, hoisted
                # out of the width loop (block-invariant).
                row_data = []
                for k in (0, 1):
                    py = rowbase + k
                    sy0, sy1 = y0 - py, y1 - py
                    cy0 = jnp.clip(sy0, 0.0, 1.0)
                    cy1 = jnp.clip(sy1, 0.0, 1.0)
                    dy = cy1 - cy0
                    onehot = (rowbase_sub + k == hlane).astype(jnp.bfloat16)
                    row_data.append((dy, onehot, sy0, sy1, cy0, cy1))

                for wc in range(n_wc):
                    wc0 = float(wc * wchunk)
                    px = (wc * wchunk + jax.lax.broadcasted_iota(
                        jnp.int32, (wchunk, 1), 0)).astype(jnp.float32)
                    left = pxmx <= wc0
                    crossing = jnp.logical_and(
                        jnp.logical_not(left), pxmn - 1.0 < wc0 + wchunk)
                    any_cross = jnp.any(crossing)
                    wsl = slice(wc * wchunk, (wc + 1) * wchunk)

                    def heavy():
                        for dy, onehot, sy0, sy1, cy0, cy1 in row_data:
                            dyd = sy1 - sy0
                            safe = jnp.where(jnp.abs(dyd) < 1e-9, 1.0, dyd)
                            t0 = (cy0 - sy0) / safe
                            t1 = (cy1 - sy0) / safe
                            xa = x0 + t0 * (x1 - x0)
                            xb = x0 + t1 * (x1 - x0)
                            xmn = jnp.minimum(xa, xb)
                            xmx = jnp.maximum(xa, xb)
                            span = xmx - xmn
                            safe_span = jnp.where(span < 1e-9, 1.0, span)
                            rel_mn = xmn - px  # (wchunk, EC)
                            rel_mx = xmx - px
                            mean = jnp.where(
                                span < 1e-9,
                                jnp.clip(0.5 * (rel_mn + rel_mx), 0.0, 1.0),
                                (_h01(rel_mx) - _h01(rel_mn)) / safe_span)
                            ramp = dy * (1.0 - mean)  # (wchunk, EC)
                            for part in split3(ramp):
                                acc_ref[lyr, wsl] = acc_ref[lyr, wsl] + \
                                    jnp.dot(part, onehot,
                                            preferred_element_type=jnp.float32)

                    def cheap():
                        # Left pieces' ramps are complete (= dy, a
                        # px-independent row value): tiny (1, EC) @
                        # (EC, 128) products into the side plane; no
                        # full-size accumulator RMW.
                        lmask = left.astype(jnp.float32)
                        for dy, onehot, *_ in row_data:
                            for part in split3(dy * lmask):
                                cheap_ref[lyr, wc:wc + 1] = \
                                    cheap_ref[lyr, wc:wc + 1] + jnp.dot(
                                        part, onehot,
                                        preferred_element_type=jnp.float32)

                    if not skip_empty or not x_split:
                        heavy()
                    else:
                        pl.when(any_cross)(heavy)
                        pl.when(jnp.logical_not(any_cross))(cheap)

            if skip_empty:
                pl.when(jnp.any(rows_in))(chunk_body)
            else:
                chunk_body()

        # Fold the cheap side plane into the accumulator: one RMW per
        # width chunk instead of six per (chunk, width chunk).
        if skip_empty:
            for wc in range(n_wc):
                wsl = slice(wc * wchunk, (wc + 1) * wchunk)
                acc_ref[lyr, wsl] = (acc_ref[lyr, wsl]
                                     + cheap_ref[lyr, wc:wc + 1])

    rules = layer_rules(fill_rule, layers)
    covs = [fill_rule_cov(acc_ref[lyr], rules[lyr])
            for lyr in range(layers)]

    grad_cache = {}
    px_full = jax.lax.broadcasted_iota(
        jnp.int32, (wp, 1), 0).astype(jnp.float32)

    def grad_plane(lyr):
        """In-kernel gradient field for this (frame, row block) — same
        SMEM matrix/stop windows as the column kernel."""
        if lyr not in grad_cache:
            ga, gb, gc, gd, ge, gf = (gm_ref[0, lyr, k] for k in range(6))
            pxc = px_full + 0.5   # (WP, 1) pixel-center x
            pyc = hlane + 0.5     # (1, 128) pixel-center y in this block
            sx = ga * pxc + gc * pyc + ge
            sy = gb * pxc + gd * pyc + gf
            sc = None
            if sc_ref is not None:
                sc = [[sc_ref[0, lyr, k, ch] for ch in range(4)]
                      for k in range(len(paints[lyr].stop_ratios))]
            grad_cache[lyr] = _grad_eval(paints[lyr], sx, sy,
                                         stop_colors=sc)
        return grad_cache[lyr]

    def read_color(lyr, ch):
        if morph:
            return ((1.0 - t_r) * colors_ref[lyr, ch]
                    + t_r * colors_e_ref[lyr, ch])
        if paints is not None and paints[lyr].kind != KPAINT_COLOR:
            return grad_plane(lyr)[ch]
        if per_frame_colors:
            return colors_ref[i, lyr, ch]
        return colors_ref[lyr, ch]

    out_ref[0] = composite_quantize_pack(covs, read_color, layers=layers)


def _row_grid_fits(layers: int, wp: int, wchunk: int) -> bool:
    """Row-grid scratch = (layers, wp, 128) f32 acc + the tiny cheap
    plane; keep it comfortably under the 16 MB scoped-VMEM budget
    (temporaries + piece tables + output block share it).  Only reached
    if _ROW_GRID_DEFAULT flips True — it guards the future default, not
    today's explicit row_grid=True ablation calls."""
    del wchunk  # sized by acc, not chunking
    acc = layers * wp * LANE * 4
    return acc <= 10 * 2**20


# The row-grid kernel measured SLOWER than the column grid at 1080p
# (2.25-2.52 vs 1.38 ms/frame across every (e_chunk, wchunk) tried —
# tools/exp_sweepcost.py, PERF.md round 3); granularity-insensitive, so
# a fixed per-(H-block, chunk) cost dominates.  Kept as an ablation
# variant (row_grid=True) until a variant beats the column grid.
_ROW_GRID_DEFAULT = False


def _auto_bps(layers: int, hp: int, e_chunk: int,
              n_blocks: int) -> int:
    """Column blocks per grid step: 3 amortizes the per-step fixed
    overhead (1080p anim: 1.23 -> 1.07 ms/frame, PERF.md) but grows the
    unrolled kernel and the out-block VMEM footprint — bps 4 at 1080p x
    3 layers blew the 16 MB scoped-VMEM limit by 1 MB.  Only raise bps
    inside the measured-safe envelope, and only when it divides the
    block count — wp pads to wblock*bps multiples, so a non-dividing
    bps rasterizes whole garbage blocks (5 blocks at bps 3 -> 6 blocks,
    +20% device time)."""
    if layers <= 4 and hp <= 1280 and e_chunk <= 256 and n_blocks >= 4:
        # bps 4 only for short frames: at 1080p x 3 layers it blew the
        # 16 MB scoped-VMEM limit; at 512^2 (wblock 64, 8 blocks) the
        # round-4 interleaved A/B measured 64/bps4 ~10% ahead of
        # 128/bps2 and ~35% ahead of the old single 256-block step.
        cands = (4, 3, 2) if hp <= 640 else (3, 2)
        for b in cands:
            if n_blocks % b == 0:
                return b
    return 1


def _wblock_for(width: int, hp: int, lists: bool = True) -> int:
    """Column-block sublane count: 256 fits comfortably for short lane
    extents; tall frames (hp > 640) drop to 128 so the layer accumulators
    + ramp temporaries stay inside the 16 MB scoped-VMEM budget (1080p
    with 3 layers measured 16.75 MB at wblock=256).  Finer blocks also
    sharpen the transition-free skip — mid-width frames halve the block
    down to 64 until there are >= 8 column blocks (512^2 was ONE
    256-wide block pair with the skip dead; the round-4 interleaved A/B
    measured wblock 64 + bps 4 at ~0.65x the old per-frame cost, and
    the skip/prefix accounting stays within the kernel's documented
    <=1 u8 rounding envelope vs the heavy path)."""
    wp = -(-width // 8) * 8
    wb = min(wp, 256 if hp <= 640 else 128)
    while wb > 64 and wp // wb < 8 and (wb // 2) % 8 == 0:
        wb //= 2
    # Tall frames also prefer 64 outright once the chunk-list walk owns
    # the skip cost: the round-4 1080p interleaved A/B measured
    # 64/bps3 at 0.943 ms/frame vs 128/bps3's 0.995 (+5.5%), consistent
    # across five rounds (tools/exp_sweep1080.py); bps 4 regresses at
    # wblock 64 (132 ms/120f) and still OOMs at 128.
    # The drop is gated on ``lists`` — without the walk, round-3
    # measured wblock 64 at 1.8-2.1 ms/frame vs 128's 1.33 (static
    # loop), so compact/static callers keep 128.
    if lists and hp > 640 and wp // 64 >= 8:
        wb = min(wb, 64)
    return wb


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "fill_rule", "interpret", "e_chunk",
    "skip_empty", "paints", "wblock", "row_grid", "wchunk", "x_split",
    "layer_counts", "prefix_cheap", "blocks_per_step",
    "compact_counts", "prefilter", "chunk_list"))
def render_affine_sweep(
    matrices: jax.Array,  # (F, 6) or (F, L, 6) f32 device affines
    tab: jax.Array,       # (P, 4, 1, EP) f32 local pieces
    subxy: jax.Array,     # (P, 4, EP, 1) f32
    colors: jax.Array,    # (P, 4) or (F, P, 4) f32 straight RGBA
    height: int,
    width: int,
    fill_rule: int = FILL_RULE_NONZERO,
    interpret: bool = None,
    e_chunk: int = None,      # None = 128 with the chunk-list walk, 256 else
    skip_empty: bool = True,
    wblock: int = None,       # column-block override (ablation knob)
    row_grid: bool = None,    # None = auto: row kernel when scratch fits
    wchunk: int = 256,        # row-kernel width-chunk (ablation knob)
    x_split: bool = True,     # row-kernel x-crossing skip (ablation knob)
    layer_counts: tuple = None,  # per-layer REAL piece counts (static)
    prefix_cheap: bool = None,   # None = on whenever the skip is active
    blocks_per_step: int = None,  # None = auto (measured-safe bps)
    compact_counts: tuple = None,  # plan_compact_sweep capacities
    prefilter: bool = None,   # None = OFF (measured negative; ablation)
    chunk_list: bool = None,  # None = ON with the prefix-plane skip
    paints=None,         # tuple of KernelPaint (COLOR/LINEAR/FOCAL/FIELD)
    grad_mats: jax.Array = None,  # (F, L, 6) f32 composed gradient affines
    stop_colors: jax.Array = None,  # (F, L, K, 4) f32 per-frame stops
    fields: jax.Array = None,  # (NF, F, H, W, 4) f32 baked paint planes
    x_shift: jax.Array = None,  # (1,) f32 tile-shard x-origin (see kernel)
) -> jax.Array:
    """Rasterize one shape set under every frame's affine fully on device.

    -> (F, WP, HP) uint32 packed RGBA, TRANSPOSED frames; view with
    ops.morph.morph_frames_to_u8.  One grid step per frame, column-block
    tiled: transform the pieces, analytic coverage ramps, MXU row
    placement, composite, quantize.  ``skip_empty``: piece chunks whose
    x-transitions don't cross the column block take a cheap broadcast
    path (see _xform_kernel); set False for the always-heavy ablation
    kernel.

    ``paints``: optional per-layer KernelPaint tuple — LINEAR/FOCAL
    gradient layers evaluate IN-KERNEL, so gradient-filled shapes
    animate with the same O(1) host work as solids (the reference
    replays gradient fills under a new matrix for free,
    canvas-renderer.ts:179-184, 292-335).  ``grad_mats`` (F, L, 6) then
    carries each frame's composed device->gradient affine (paint
    inverse ∘ frame inverse; rows for non-gradient layers are
    ignored).  ``stop_colors`` (F, L, K, 4) optionally overrides every
    gradient layer's stop COLORS per frame (color-transform fades);
    ratios stay static, rows beyond a layer's stop count and rows for
    non-gradient layers are ignored.

    ``fields`` (NF, F, H, W, 4) carries baked straight-RGBA planes for
    ``KernelPaint.field(slot)`` layers (bitmap fills and linear-RGB
    gradients under per-frame matrices — bake_sweep_fields); each grid
    step streams only its own (frame, column block) window."""
    if interpret is None:
        interpret = not _on_tpu()
    fcount = matrices.shape[0]
    layers = tab.shape[0]
    fill_rule = normalize_fill_rule(fill_rule, layers)
    if paints is not None and all(p.kind == KPAINT_COLOR for p in paints):
        paints = None  # pure-solid tuples share the classic compilation
    n_fields = 0
    if paints is not None:
        if len(paints) != layers:
            raise ValueError(f"{len(paints)} paints for {layers} layers")
        n_fields = 1 + max((p.slot for p in paints
                            if p.kind == KPAINT_FIELD), default=-1)
        if n_fields:
            if fields is None or fields.shape != (
                    n_fields, fcount, height, width, 4):
                raise ValueError(
                    f"field paints need ({n_fields}, {fcount}, {height},"
                    f" {width}, 4) fields, got "
                    f"{None if fields is None else fields.shape}")
        any_grad = any(p.kind in (KPAINT_LINEAR, KPAINT_FOCAL)
                       for p in paints)
        if any_grad and (grad_mats is None
                         or grad_mats.shape != (fcount, layers, 6)):
            raise ValueError("gradient paints need (F, L, 6) grad_mats")
        if grad_mats is None:
            # Field-only styled tuples still take the gm_ref input slot.
            grad_mats = jnp.zeros((fcount, layers, 6), jnp.float32)
    if layer_counts is not None and len(layer_counts) != layers:
        raise ValueError(
            f"{len(layer_counts)} layer_counts for {layers} layers")
    if fields is not None and n_fields == 0:
        # Checked OUTSIDE the paints block: an all-solid tuple collapses
        # paints to None above, which must not silently drop a stale
        # fields array the caller thought was consumed.
        raise ValueError("fields passed without any FIELD paint")
    if stop_colors is not None:
        if paints is None:
            raise ValueError("stop_colors requires gradient paints")
        if (stop_colors.ndim != 4
                or stop_colors.shape[:2] != (fcount, layers)
                or stop_colors.shape[3] != 4):
            raise ValueError(
                f"stop_colors must be (F, L, K, 4), got "
                f"{stop_colors.shape}")
        k_need = max((len(p.stop_ratios) for p in paints
                      if p.kind != KPAINT_COLOR), default=0)
        if stop_colors.shape[2] < k_need:
            raise ValueError(
                f"stop_colors K={stop_colors.shape[2]} < the largest "
                f"gradient stop count {k_need} (kernel would read past "
                f"the SMEM window)")
    hp = -(-height // LANE) * LANE
    wp8 = -(-width // 8) * 8
    if x_shift is not None:
        # Tile-sharding x-origin: only the column-grid non-compact
        # kernel carries the post-transform subtract (see _xform_kernel).
        if compact_counts is not None or row_grid:
            raise ValueError(
                "x_shift needs the column-grid non-compact sweep kernel")
        row_grid = False
        x_shift = jnp.asarray(x_shift, jnp.float32).reshape(1)

    def field_blocks(bps, wblock, wp):
        """(NF, F, H, W, 4) fields -> per-slot (F, NBG, bps, 4, wblock,
        hp) block-major arrays + BlockSpecs streaming one (frame, grid
        step) window each (the sweep twin of the flat-block kernel's
        chunk-major field planes)."""
        nbg = wp // (wblock * bps)
        fp = jnp.pad(fields.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, hp - height),
                      (0, wp - width), (0, 0)))
        fb = fp.transpose(0, 1, 4, 3, 2)  # (NF, F, 4, wp, hp)
        fb = fb.reshape(n_fields, fcount, 4, nbg, bps, wblock, hp)
        fb = fb.transpose(0, 1, 3, 4, 2, 5, 6)
        spec = pl.BlockSpec((1, 1, bps, 4, wblock, hp),
                            lambda i, wb: (i, wb, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        return [fb[s] for s in range(n_fields)], [spec] * n_fields

    if compact_counts is not None:
        if len(compact_counts) != layers:
            raise ValueError(
                f"{len(compact_counts)} compact_counts for {layers} "
                "layers")
        # COMPACTED path (plan_compact_sweep + _compact_pre): the
        # pre-pass gathers each (frame, block)'s crossing pieces and the
        # per-frame prefix plane in regular XLA; the kernel then visits
        # ~pieces/n_blocks per block instead of every chunk — the
        # per-(block, chunk, layer) fixed cost was the dominant sweep
        # term (PERF.md round-3 decomposition).
        e_chunk = e_chunk or 256  # compacted path: pre-list economics
        wblock = wblock or _wblock_for(width, hp, lists=False)
        # Field planes add bps*(4, wblock, hp) f32 of VMEM per slot and
        # step; hold bps at 1 unless explicitly overridden.
        bps = blocks_per_step or (1 if n_fields else _auto_bps(
            layers, hp, e_chunk, -(-wp8 // wblock)))
        wp = -(-wp8 // (wblock * bps)) * (wblock * bps)
        nb = wp // wblock
        nbp = max(8, -(-nb // 8) * 8)
        s_max = max(e_chunk, max(compact_counts))
        ctab, csub, prefix = _compact_pre(
            matrices, tab, s_max=s_max, wblock=wblock, nb=nb, nbp=nbp,
            hp=hp)
        ctab = ctab.reshape(fcount, nb // bps, bps, layers, 4, 1, s_max)
        csub = csub.reshape(fcount, nb // bps, bps, layers, 4, s_max, 1)
        kernel = functools.partial(
            _xform_kernel, layers=layers, wblock=wblock, hp=hp,
            fill_rule=fill_rule, e_chunk=e_chunk,
            per_layer=matrices.ndim == 3, skip_empty=skip_empty,
            layer_counts=compact_counts, compact=True, bps=bps,
            per_frame_colors=colors.ndim == 3, paints=paints,
            dyn_stops=stop_colors is not None)
        args = [matrices, colors]
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        if paints is not None:
            args.append(grad_mats)
            in_specs.append(pl.BlockSpec((1, layers, 6),
                                         lambda i, wb: (i, 0, 0),
                                         memory_space=pltpu.SMEM))
            if stop_colors is not None:
                nk = stop_colors.shape[2]
                args.append(stop_colors)
                in_specs.append(pl.BlockSpec((1, layers, nk, 4),
                                             lambda i, wb: (i, 0, 0, 0),
                                             memory_space=pltpu.SMEM))
        args += [ctab, csub, prefix]
        in_specs += [
            pl.BlockSpec((1, 1, bps, layers, 4, 1, s_max),
                         lambda i, wb: (i, wb, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bps, layers, 4, s_max, 1),
                         lambda i, wb: (i, wb, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, layers, nbp, hp),
                         lambda i, wb: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if n_fields:
            fargs, fspecs = field_blocks(bps, wblock, wp)
            args += fargs
            in_specs += fspecs
        return pl.pallas_call(
            kernel,
            grid=(fcount, nb // bps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, wblock * bps, hp),
                                   lambda i, wb: (i, wb, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((fcount, wp, hp), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((layers, wblock, hp),
                                       jnp.float32)],
            interpret=interpret,
        )(*args)
    if row_grid is None:
        row_grid = _ROW_GRID_DEFAULT and _row_grid_fits(
            layers, -(-wp8 // wchunk) * wchunk, wchunk)
    if n_fields and row_grid:
        raise ValueError("field paints need the column-grid sweep "
                         "kernel (row_grid=False)")
    if row_grid:
        prefilter = False
    if row_grid:
        e_chunk = e_chunk or 256  # row kernel: static chunk loop
        wp = -(-wp8 // wchunk) * wchunk
        kernel = functools.partial(
            _xform_kernel_rows, layers=layers, wchunk=wchunk, wp=wp,
            fill_rule=fill_rule, e_chunk=e_chunk,
            per_layer=matrices.ndim == 3, skip_empty=skip_empty,
            x_split=x_split, layer_counts=layer_counts,
            per_frame_colors=colors.ndim == 3, paints=paints,
            dyn_stops=stop_colors is not None)
        grid = (fcount, hp // LANE)
        out_specs = pl.BlockSpec((1, wp, LANE), lambda i, hb: (i, 0, hb),
                                 memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((layers, wp, LANE), jnp.float32),
                   pltpu.VMEM((layers, wp // wchunk, LANE), jnp.float32)]
    else:
        # lists hint: will the chunk-list walk be on?  (skip/prefix
        # resolve later, but the hp>640 drop only applies to frames
        # whose block count passes every gate either way.)
        lists_hint = (skip_empty and prefix_cheap is not False
                      and chunk_list is not False)
        wblock = wblock or _wblock_for(width, hp, lists=lists_hint)
        bps = blocks_per_step or (1 if n_fields else _auto_bps(
            layers, hp, e_chunk or 256, -(-wp8 // wblock)))
        wp = -(-wp8 // (wblock * bps)) * (wblock * bps)
        # The skip pays off only when there are enough column blocks for
        # transition-free (block, chunk) pairs to exist; at <= 2 blocks
        # the pl.when overhead measured as a net loss (512^2: 0.186 ->
        # 0.202 ms).  Under x_shift (tile shards) the caller's flag is
        # honored as-is: the shard must mirror the FULL-width layout's
        # prefix/heavy partition for bit-exact span concatenation, even
        # when its own block count is below the perf gate.
        if x_shift is None:
            skip_empty = skip_empty and wp // wblock >= 4
        if prefix_cheap is None:
            prefix_cheap = skip_empty
        prefix_cheap = prefix_cheap and skip_empty
        if prefilter is None:
            # Measured NEGATIVE at 1080p (1.10 -> 1.14 ms/frame,
            # within-epoch A/B): the per-(block, chunk) fixed cost is
            # the branch/loop scalar overhead itself, which the SMEM
            # bounds test does not remove — moving the chunk transform
            # inside the branch saves nothing.  Kept as an ablation
            # variant (PERF.md round-3 prefilter study).
            prefilter = False
        prefilter = prefilter and skip_empty and prefix_cheap
        if chunk_list is None:
            chunk_list = True
        # The dynamic chunk walk needs the prefix plane (skipped chunks'
        # left pieces live there) and supersedes the prefilter.
        chunk_list = chunk_list and skip_empty and prefix_cheap
        if e_chunk is None:
            # The walk inverted the chunk-size economics: finer chunks
            # give tighter crossing sets at no branch cost (round-4
            # re-sweep: ec128 +29% at 1080p, +12% at 512^2; ec64 fails
            # TPU compilation; pre-list ec128 measured WORSE, so the
            # static loop keeps 256).  Tile shards resolve identically
            # (mirrored skip flags + x_shift), preserving bit-exactness.
            e_chunk = 128 if chunk_list else 256
        if chunk_list:
            prefilter = False
            ep0 = tab.shape[-1]
            pad = (-ep0) % e_chunk
            if pad:
                # Static chunk slices tolerate a short last chunk; the
                # dynamic pl.dslice walk needs full-width chunks.  Zero
                # pieces transform to degenerate points (dy = 0): exact
                # zero contributions.
                tab = jnp.pad(tab, ((0, 0), (0, 0), (0, 0), (0, pad)))
                subxy = jnp.pad(subxy,
                                ((0, 0), (0, 0), (0, pad), (0, 0)))
        nbp = (max(8, -(-(wp // wblock) // 8) * 8) if prefix_cheap
               else 8)
        kernel = functools.partial(
            _xform_kernel, layers=layers, wblock=wblock, hp=hp,
            fill_rule=fill_rule, e_chunk=e_chunk,
            per_layer=matrices.ndim == 3, skip_empty=skip_empty,
            layer_counts=layer_counts, prefix_cheap=prefix_cheap,
            bps=bps, prefilter=prefilter, chunk_list=chunk_list,
            per_frame_colors=colors.ndim == 3, paints=paints,
            dyn_stops=stop_colors is not None,
            x_shift=x_shift is not None)
        grid = (fcount, wp // (wblock * bps))
        out_specs = pl.BlockSpec((1, wblock * bps, hp),
                                 lambda i, wb: (i, wb, 0),
                                 memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((layers, wblock, hp), jnp.float32),
                   pltpu.VMEM((layers, nbp, hp), jnp.float32)]
    args = [matrices, colors]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    if x_shift is not None:
        args.append(x_shift)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    if not row_grid and (prefilter or chunk_list):
        # Per-(frame, layer, chunk) transformed x-extent bounds, SMEM.
        # The ±0.5 px slack absorbs XLA-vs-Mosaic float scheduling
        # differences (FMA contraction) so a bounds miss can never drop
        # a piece the kernel's own transform would classify as crossing.
        ml = (matrices if matrices.ndim == 3
              else jnp.broadcast_to(matrices[:, None, :],
                                    (fcount, layers, 6)))
        av = ml[..., 0:1]
        cv = ml[..., 2:3]
        ev = ml[..., 4:5]
        # (chunk_list's zero padding transforms to the point (e, f) —
        # it may add one spurious "crossing" chunk on the block holding
        # x = e, whose dy = 0 pieces contribute exact zeros.)
        x0l, y0l = tab[:, 0, 0, :], tab[:, 1, 0, :]   # (L, EP)
        x1l, y1l = tab[:, 2, 0, :], tab[:, 3, 0, :]
        x0p = av * x0l + cv * y0l + ev                # (F, L, EP)
        x1p = av * x1l + cv * y1l + ev
        pmn = jnp.minimum(x0p, x1p)
        pmx = jnp.maximum(x0p, x1p)
        ep = tab.shape[-1]
        nc = -(-ep // e_chunk)
        pad = nc * e_chunk - ep
        pmn = jnp.pad(pmn, ((0, 0), (0, 0), (0, pad)),
                      constant_values=np.inf)
        pmx = jnp.pad(pmx, ((0, 0), (0, 0), (0, pad)),
                      constant_values=-np.inf)
        bounds = jnp.stack(
            [pmn.reshape(fcount, layers, nc, e_chunk).min(-1) - 0.5,
             pmx.reshape(fcount, layers, nc, e_chunk).max(-1) + 0.5],
            axis=-1)
        if chunk_list:
            nb = wp // wblock
            block_los = jnp.arange(nb, dtype=jnp.float32) * wblock
            if x_shift is not None:
                block_los = block_los + x_shift[0]  # global pixel grid
            lo = bounds[..., 0:1]              # (F, L, NC, 1)
            hi = bounds[..., 1:2]
            cross = jnp.logical_and(
                hi > block_los, lo - 1.0 < block_los + wblock)
            cross = cross.transpose(0, 1, 3, 2)  # (F, L, NB, NC)
            counts = cross.sum(-1).astype(jnp.int32)
            c_iota = jnp.arange(nc, dtype=jnp.int32)
            sort_key = jnp.where(cross, c_iota, nc + c_iota)
            idx = jnp.argsort(sort_key, axis=-1).astype(jnp.int32)
            args += [counts, idx]
            in_specs += [
                pl.BlockSpec((1, layers, nb), lambda i, wb: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, layers, nb, nc),
                             lambda i, wb: (i, 0, 0, 0),
                             memory_space=pltpu.SMEM),
            ]
        else:
            args.append(bounds)
            in_specs.append(pl.BlockSpec((1, layers, nc, 2),
                                         lambda i, wb: (i, 0, 0, 0),
                                         memory_space=pltpu.SMEM))
    if paints is not None:
        args.append(grad_mats)
        in_specs.append(pl.BlockSpec((1, layers, 6),
                                     lambda i, wb: (i, 0, 0),
                                     memory_space=pltpu.SMEM))
        if stop_colors is not None:
            nk = stop_colors.shape[2]
            args.append(stop_colors)
            in_specs.append(pl.BlockSpec((1, layers, nk, 4),
                                         lambda i, wb: (i, 0, 0, 0),
                                         memory_space=pltpu.SMEM))
    args += [tab, subxy]
    in_specs += [
        pl.BlockSpec(tab.shape, lambda i, wb: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(subxy.shape, lambda i, wb: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if n_fields:
        fargs, fspecs = field_blocks(bps, wblock, wp)
        args += fargs
        in_specs += fspecs
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((fcount, wp, hp), jnp.uint32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "fill_rule", "interpret", "e_chunk",
    "skip_empty", "row_grid", "wchunk", "layer_counts",
    "prefix_cheap", "blocks_per_step", "chunk_list", "wblock"))
def render_morph_affine_sweep(
    matrices: jax.Array,  # (F, 6) f32 device affines
    ratios: jax.Array,    # (F,) f32 in [0, 1]
    tab_s: jax.Array,     # (P, 4, 1, EP) f32 local start pieces
    subxy_s: jax.Array,   # (P, 4, EP, 1) f32
    tab_e: jax.Array,     # (P, 4, 1, EP) f32 local end pieces
    subxy_e: jax.Array,
    colors_s: jax.Array,  # (P, 4) f32
    colors_e: jax.Array,
    height: int,
    width: int,
    fill_rule: int = FILL_RULE_NONZERO,
    interpret: bool = None,
    e_chunk: int = None,      # None = 128 with the chunk-list walk, 256 else
    skip_empty: bool = True,
    row_grid: bool = None,
    wchunk: int = 256,
    layer_counts: tuple = None,
    prefix_cheap: bool = None,
    blocks_per_step: int = None,
    chunk_list: bool = None,  # None = ON with the prefix-plane skip
    x_shift: jax.Array = None,  # (1,) f32 tile-shard x-origin
    wblock: int = None,       # column-block override (tile shards)
) -> jax.Array:
    """Combined MORPH + TRANSFORM sweep: per frame, lerp the local piece
    tables by the frame's ratio, apply the frame's affine, rasterize —
    a morphing, moving, scaling timeline fully on device with O(edges)
    host work (morph_affine_pieces).  Fills only (stroke outlines aren't
    linear in the ratio).  -> (F, WP, HP) transposed packed u32."""
    if interpret is None:
        interpret = not _on_tpu()
    fcount = matrices.shape[0]
    layers = tab_s.shape[0]
    fill_rule = normalize_fill_rule(fill_rule, layers)
    hp = -(-height // LANE) * LANE
    wp8 = -(-width // 8) * 8
    if x_shift is not None:
        if row_grid:
            raise ValueError(
                "x_shift needs the column-grid sweep kernel")
        row_grid = False
        x_shift = jnp.asarray(x_shift, jnp.float32).reshape(1)
    if row_grid is None:
        row_grid = _ROW_GRID_DEFAULT and _row_grid_fits(
            layers, -(-wp8 // wchunk) * wchunk, wchunk)
    if row_grid:
        e_chunk = e_chunk or 256  # row kernel: static chunk loop
        wp = -(-wp8 // wchunk) * wchunk
        kernel = functools.partial(
            _xform_kernel_rows, layers=layers, wchunk=wchunk, wp=wp,
            fill_rule=fill_rule, e_chunk=e_chunk,
            per_layer=matrices.ndim == 3, layer_counts=layer_counts,
            skip_empty=skip_empty, morph=True)
        grid = (fcount, hp // LANE)
        out_specs = pl.BlockSpec((1, wp, LANE), lambda i, hb: (i, 0, hb),
                                 memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((layers, wp, LANE), jnp.float32),
                   pltpu.VMEM((layers, wp // wchunk, LANE), jnp.float32)]
    else:
        lists_hint = (skip_empty and prefix_cheap is not False
                      and chunk_list is not False)
        wblock = wblock or _wblock_for(width, hp, lists=lists_hint)
        bps = blocks_per_step or _auto_bps(
            layers, hp, e_chunk or 256, -(-wp8 // wblock))
        wp = -(-wp8 // (wblock * bps)) * (wblock * bps)
        if x_shift is None:  # see render_affine_sweep: shards mirror
            skip_empty = skip_empty and wp // wblock >= 4
        if prefix_cheap is None:
            prefix_cheap = skip_empty
        prefix_cheap = prefix_cheap and skip_empty
        nbp = (max(8, -(-(wp // wblock) // 8) * 8) if prefix_cheap
               else 8)
        if chunk_list is None:
            chunk_list = True
        chunk_list = chunk_list and skip_empty and prefix_cheap
        if e_chunk is None:
            # Same round-4 re-sweep as render_affine_sweep: finer
            # chunks pay only under the list walk.
            e_chunk = 128 if chunk_list else 256
        if chunk_list:
            pad = (-tab_s.shape[-1]) % e_chunk
            if pad:
                tab_s = jnp.pad(tab_s, ((0, 0), (0, 0), (0, 0), (0, pad)))
                tab_e = jnp.pad(tab_e, ((0, 0), (0, 0), (0, 0), (0, pad)))
                subxy_s = jnp.pad(subxy_s,
                                  ((0, 0), (0, 0), (0, pad), (0, 0)))
                subxy_e = jnp.pad(subxy_e,
                                  ((0, 0), (0, 0), (0, pad), (0, 0)))
        kernel = functools.partial(
            _xform_kernel, layers=layers, wblock=wblock, hp=hp,
            fill_rule=fill_rule, e_chunk=e_chunk,
            per_layer=matrices.ndim == 3, layer_counts=layer_counts,
            skip_empty=skip_empty, morph=True,
            prefix_cheap=prefix_cheap, bps=bps, chunk_list=chunk_list,
            x_shift=x_shift is not None)
        grid = (fcount, wp // (wblock * bps))
        out_specs = pl.BlockSpec((1, wblock * bps, hp),
                                 lambda i, wb: (i, wb, 0),
                                 memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((layers, wblock, hp), jnp.float32),
                   pltpu.VMEM((layers, nbp, hp), jnp.float32)]
    full = lambda i, wb: (0, 0, 0, 0)  # noqa: E731
    cl_args, cl_specs = [], []
    if not row_grid and chunk_list:
        # Conservative per-(frame, layer, chunk) x-extent bounds over
        # BOTH morph endpoint tables: the lerped piece's transformed x
        # is the lerp of the transformed endpoints, so min/max over the
        # endpoints bound every ratio in [0, 1].
        ml = (matrices if matrices.ndim == 3
              else jnp.broadcast_to(matrices[:, None, :],
                                    (fcount, layers, 6)))
        av, cv, ev = ml[..., 0:1], ml[..., 2:3], ml[..., 4:5]

        def tab_minmax(tb):
            x0 = av * tb[:, 0, 0, :] + cv * tb[:, 1, 0, :] + ev
            x1 = av * tb[:, 2, 0, :] + cv * tb[:, 3, 0, :] + ev
            return jnp.minimum(x0, x1), jnp.maximum(x0, x1)

        mn_s, mx_s = tab_minmax(tab_s)
        mn_e, mx_e = tab_minmax(tab_e)
        pmn = jnp.minimum(mn_s, mn_e)
        pmx = jnp.maximum(mx_s, mx_e)
        ep = tab_s.shape[-1]
        nc = ep // e_chunk
        lo = (pmn.reshape(fcount, layers, nc, e_chunk).min(-1)
              - 0.5)[..., None]
        hi = (pmx.reshape(fcount, layers, nc, e_chunk).max(-1)
              + 0.5)[..., None]
        nb = wp // wblock
        block_los = jnp.arange(nb, dtype=jnp.float32) * wblock
        if x_shift is not None:
            block_los = block_los + x_shift[0]  # global pixel grid
        cross = jnp.logical_and(
            hi > block_los, lo - 1.0 < block_los + wblock)
        cross = cross.transpose(0, 1, 3, 2)
        counts = cross.sum(-1).astype(jnp.int32)
        c_iota = jnp.arange(nc, dtype=jnp.int32)
        sort_key = jnp.where(cross, c_iota, nc + c_iota)
        idx = jnp.argsort(sort_key, axis=-1).astype(jnp.int32)
        cl_args = [counts, idx]
        cl_specs = [
            pl.BlockSpec((1, layers, nb), lambda i, wb: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, layers, nb, nc),
                         lambda i, wb: (i, 0, 0, 0),
                         memory_space=pltpu.SMEM),
        ]
    xs_args = [] if x_shift is None else [x_shift]
    xs_specs = ([] if x_shift is None
                else [pl.BlockSpec(memory_space=pltpu.SMEM)])
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # matrices
            pl.BlockSpec(memory_space=pltpu.SMEM),  # colors_s
        ] + xs_specs + cl_specs + [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ratios
            pl.BlockSpec(memory_space=pltpu.SMEM),  # colors_e
            pl.BlockSpec(tab_s.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(subxy_s.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(tab_e.shape, full, memory_space=pltpu.VMEM),
            pl.BlockSpec(subxy_e.shape, full, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((fcount, wp, hp), jnp.uint32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(matrices, colors_s, *xs_args, *cl_args, ratios, colors_e, tab_s,
      subxy_s, tab_e, subxy_e)
