"""Flat-block scanline pipeline: scatter-free placement + parallel resolve.

The scatter (`segment_sum`) costs ~125 ns/update on TPU and dominated the
fused pipeline; the old dense-binned MXU variant paid the *global* max bin
occupancy for every bin (8-40x slot waste on real scenes).  This pipeline
replaces both stages:

**K1 — placement** (grid over 128-update blocks, scalar-prefetched targets):
the host packs each draw's sorted coalesced delta updates (native splitter
output) into blocks of 128 per (frame, layer, strip).  A block materializes
its strip-plane contribution as ONE full (128,128) MXU product

    delta[rc, c] = sum_k U[rc, k] * W[k, c]
    U[rc, k] = val_k * [rcid_k == rc]     (value-weighted row one-hot)
    W[k, c]  = [cmod_k == c]              (column one-hot)

where ``rcid = (col//128)*8 + row%8`` and ``cmod = col%128`` address the
strip plane in a chunk-major (128,128) layout — every MXU dimension is full
(the old binned kernel ran (8,Kc) shapes at 6% MXU row utilization).  The
update values are split val = hi+mid+lo into three bf16 parts (3x8 mantissa
bits cover f32's 24), and the one-hot factors are exactly representable in
bf16, so three DEFAULT-precision passes reproduce the f32 placement
BIT-EXACTLY (the old kernel needed 6-pass Precision.HIGHEST).  Blocks of
one (frame, layer, strip) group accumulate into a VMEM scratch with a
branchless prefetched reset multiplier; the group's plane flushes to HBM
through an output block revisited across the group's consecutive steps.

**K2 — resolve** (dense grid over (frame, strip)): reads the chunk-major
planes and computes winding -> fill rule -> premultiplied over-composite ->
straight-alpha u8 -> RGBA-packed uint32 pixels in one VMEM residency.
The prefix sum runs as a 7-step lane ladder (all 16 chunks in parallel)
plus a 4-step stride-8 sublane ladder for the cross-chunk carry — the old
resolve kernel serialized chunks through an (8,1) carry chain.  Packing the
frame as uint32 makes the output write 4x cheaper and removes the
moveaxis/convert XLA passes entirely: the host views the buffer as
(H, W, 4) u8 for free (little-endian byte order r,g,b,a).

**Fused kernels (the flagship)**: `render_fused_blocks` merges placement
and resolve into ONE kernel — blocks sorted by (frame, strip, layer)
accumulate into a per-layer VMEM scratch, the first block of each
(frame, strip) supergroup zeroes all layer planes, and the last block
resolves and emits the packed-u32 strip; winding planes never touch HBM.
`render_fused_blocksn` additionally processes ``group`` blocks per grid
step (supergroups padded to multiples of ``group``), amortizing the
per-step pipeline overhead: measured 3.62 / 4.19 / 4.73 / 5.21 Gpx/s at
group = 1 / 2 / 4 / 8 on the 60-frame 1080p headline workload (one v5e),
bit-identical output at every size.  The MXU placement and the VPU
resolve overlap because they run on different units.

Wider-than-2047 framebuffers grow the chunk-major plane's sublane count
(plane_rows_for): 4K frames run a (256, 128) plane per strip — same
kernels, one extra carry-ladder step, double the MXU rows per block.  The
hard cap is 64 chunks (width 8191); beyond that the chunked-scatter
pipeline (resolve.render_scanline_updates) takes over.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .coverage import FILL_RULE_NONZERO, _on_tpu, layer_rules

STRIP_H = 8
LANE = 128
BLK = 128           # updates per placement block
# Fold value parts into the (BLK, LANE) step matrix instead of the
# (plane_rows, BLK) one-hot (see _place_delta).  FALSIFIED — never
# enable on chip: measured -21% on the headline AND the on-chip branch
# MISCOMPILES (byte_dmax 221 vs the interpret-mode bit-identity; the
# excess-precision-folding family — PERF.md round 4).  Kept as the
# committed record with tools/exp_vfold.py.
_VFOLD_DEFAULT = False
# Chunk-major plane sublane budget: n_chunks*8 sublanes, power-of-2 padded.
# 16 chunks (width <= 2047) fit the base 128-sublane plane; wider frames
# (up to 64 chunks / width 8191, e.g. 4K) grow the plane to 256/512
# sublanes — the MXU one-hot product and the carry ladder scale with it.
MAX_CHUNKS = 64


def plane_geometry(height: int, width: int):
    """Chunk-major plane geometry for a frame.

    Cell deltas land at cols 0..width, so the natural stride rounds
    width+1 up to the lane count.  But a col-``width`` update only
    changes the winding prefix at lanes >= width — all cropped from the
    output — so when width is an exact LANE multiple the packers can
    DROP those cols and save a whole 128-lane chunk.  Round-4 A/B
    (tools/exp_stride.py): the shrink pays ONLY when it packs more
    strips per plane (flat256 3 -> 2 chunks, spp 5 -> 8: +29%;
    gradients 5 -> 4, spp 6 -> 8: +74%) and HURTS when spp is unchanged
    (1080p 16 -> 15 chunks, spp 2 either way: -14%) — so the stride
    shrinks exactly when strips_per_plane strictly improves.
    """
    n_strips = -(-height // STRIP_H)
    nc_full = max(1, (width + 1 + LANE - 1) // LANE)
    nc_min = max(1, (width + LANE - 1) // LANE)
    n_chunks = nc_full
    if nc_min < nc_full and (strips_per_plane(nc_min, n_strips)
                             > strips_per_plane(nc_full, n_strips)):
        n_chunks = nc_min
    return n_chunks * LANE, n_chunks, n_strips


def _drop_overflow_cols(rows, cols, vals, stride: int):
    """Filter updates at cols >= stride (pure right-of-frame winding
    cancellations — see plane_geometry).  Cell splitters emit cols up to
    ``width``, so this only triggers when width is a multiple of LANE."""
    if len(cols) == 0:
        return rows, cols, vals
    m = cols < stride
    return (rows, cols, vals) if m.all() else (rows[m], cols[m], vals[m])


def plane_rows_for(n_chunks: int, spp: int = 1) -> int:
    """Sublane count of the chunk-major strip plane (power of two >= 128,
    sized for ``spp`` packed strips)."""
    rows = 128
    while rows < spp * n_chunks * STRIP_H:
        rows *= 2
    return rows


def strips_per_plane(n_chunks: int, n_strips: int) -> int:
    """How many 8-row strips pack into one chunk-major plane.

    Narrow frames waste most of the plane's 128 sublanes (a 256-px-wide
    frame uses 24); packing several strips per plane divides the fused
    kernel's grid-step count accordingly.  Round 4: frames with
    nc8 >= 32 (>= ~384 px wide) pack up to DOUBLE that into a 256-row
    plane — measured +15% on the gradients config (3 -> 6 strips) and
    +1% at 1080p (1 -> 2); narrower frames measured neutral (flat256
    5 -> 10) and keep the 128-row packing.  The 4K config already runs
    240-row single-strip planes."""
    nc8 = n_chunks * STRIP_H
    per = max(1, LANE // nc8)
    if nc8 >= 32 and 2 * nc8 <= 256:
        per = min(256 // nc8, 2 * per)
    return max(1, min(per, n_strips))


def pack_flat_blocks(update_lists, height: int, width: int,
                     block_pad_multiple: int = 1024):
    """Pack per-draw sorted coalesced updates into placement blocks.

    ``update_lists``: [frames][layers] of (rows, cols, vals) arrays.
    Returns (sidx, keep, urc, ucm, uval, n_strips, n_chunks):
      sidx (NB,) i32 — packed target ((frame*L + layer)*(NS+1) + strip)
      keep (NB,) i32 — 0 on the first block of a group, else 1
      urc  (NB, 1, BLK) f32 — chunk-major sublane id (col//128)*8 + row%8
      ucm  (NB, BLK, 1) f32 — column-within-chunk (sublane layout for W)
      uval (NB, 1, BLK) f32 — update values (0 on padding slots)
    Every (frame, layer, strip) group emits at least one block (so empty
    groups still zero their plane); global padding blocks target the
    sentinel strip ``n_strips`` (a garbage bucket the resolve never reads).
    """
    f = len(update_lists)
    l = len(update_lists[0])
    stride, n_chunks, n_strips = plane_geometry(height, width)
    if n_chunks > MAX_CHUNKS:
        raise ValueError(
            f"flat-block pipeline supports width < {MAX_CHUNKS * LANE}"
            f" (got padded stride {stride})")

    sidx, keep, urc, ucm, uval = [], [], [], [], []
    for i in range(f):
        for j in range(l):
            rows, cols, vals = update_lists[i][j]
            if stride <= width:
                rows, cols, vals = _drop_overflow_cols(
                    rows, cols, vals, stride)
            strip = rows // STRIP_H if len(rows) else rows
            # Updates arrive row-major sorted => strip-grouped already.
            bounds = np.searchsorted(strip, np.arange(n_strips + 1))
            for s in range(n_strips):
                lo, hi = int(bounds[s]), int(bounds[s + 1])
                r = rows[lo:hi]
                c = cols[lo:hi]
                v = vals[lo:hi]
                n = max(1, hi - lo)  # empty group -> one zero block
                nb = -(-n // BLK)
                rc = np.zeros(nb * BLK, np.float32)
                cm = np.zeros(nb * BLK, np.float32)
                vv = np.zeros(nb * BLK, np.float32)
                rc[: hi - lo] = (c // LANE) * STRIP_H + r % STRIP_H
                cm[: hi - lo] = c % LANE
                vv[: hi - lo] = v
                for b in range(nb):
                    sidx.append((i * l + j) * (n_strips + 1) + s)
                    keep.append(0 if b == 0 else 1)
                    sl = slice(b * BLK, (b + 1) * BLK)
                    urc.append(rc[sl])
                    ucm.append(cm[sl])
                    uval.append(vv[sl])
    nb = len(sidx)
    nb_pad = ((nb + block_pad_multiple - 1)
              // block_pad_multiple) * block_pad_multiple
    for _ in range(nb_pad - nb):
        sidx.append(n_strips)  # sentinel garbage strip of (0, 0)
        keep.append(0)
        urc.append(np.zeros(BLK, np.float32))
        ucm.append(np.zeros(BLK, np.float32))
        uval.append(np.zeros(BLK, np.float32))
    return (
        np.asarray(sidx, np.int32),
        np.asarray(keep, np.int32),
        np.stack(urc)[:, None, :],   # (NB, 1, BLK) lane layout
        np.stack(ucm)[:, :, None],   # (NB, BLK, 1) sublane layout
        np.stack(uval)[:, None, :],  # (NB, 1, BLK)
        n_strips,
        n_chunks,
    )


def _place_delta(rc, cm, v, lane, sub, *, step: bool = True,
                 passes: int = 3, vfold: bool = False):
    """One placement block's exact f32 (128, 128) plane delta.

    rc/v are (1, BLK) lane vectors, cm is (BLK, 1) sublane.  step=False:
    W[k, c] = [cmod_k == c] places raw deltas; step=True:
    W[k, c] = [cmod_k <= c] fuses the in-chunk prefix sum into the SAME
    matmul, so the planes come out winding-valued within each chunk and the
    resolve skips its lane prefix ladder.  Both are exact in bf16; padding
    slots (val 0) contribute 0 either way.

    val = hi + mid + lo exactly (3x8 mantissa bits >= f32's 24), each part
    bf16-exact, so three DEFAULT MXU passes give the exact f32 placement;
    passes=2 carries ~16 bits (winding error <= ~1e-4 — flips alpha-epsilon
    pixels; not the default).

    ``vfold``: v arrives SUBLANE-oriented (BLK, 1) like cm, and each value
    part scales the (BLK, LANE) step matrix instead of the
    (plane_rows, BLK) one-hot.  Every (r, k, c) product is the identical
    bf16 pair ([sub_r==rc_k] in {0,1} times part_k*[cm_k<=c]), summed by
    the MXU in the same k order, so the delta is BIT-IDENTICAL — but on
    plane_rows > BLK planes (spp >= 2) the per-pass elementwise mul+cast
    shrinks from (plane_rows, BLK) to (BLK, LANE)."""
    if vfold:
        onehot = (sub == rc).astype(jnp.bfloat16)  # (plane_rows, BLK)
        wf = (cm <= lane) if step else (cm == lane)
        wf = wf.astype(jnp.float32)                # (BLK, LANE)
        hi = v.astype(jnp.bfloat16)                # (BLK, 1)
        hi32 = hi.astype(jnp.float32)
        mid = (v - hi32).astype(jnp.bfloat16)
        parts = [hi, mid]
        if passes >= 3:
            mid32 = mid.astype(jnp.float32)
            parts.append((v - hi32 - mid32).astype(jnp.bfloat16))
        delta = jnp.zeros((sub.shape[0], LANE), jnp.float32)
        for part in parts:
            w = (wf * part.astype(jnp.float32)).astype(jnp.bfloat16)
            delta = delta + jnp.dot(onehot, w,
                                    preferred_element_type=jnp.float32)
        return delta
    if step:
        w = (cm <= lane).astype(jnp.bfloat16)
    else:
        w = (cm == lane).astype(jnp.bfloat16)
    onehot = (sub == rc).astype(jnp.float32)  # (128 rc, BLK)
    hi = v.astype(jnp.bfloat16)
    hi32 = hi.astype(jnp.float32)
    mid = (v - hi32).astype(jnp.bfloat16)
    parts = [hi, mid]
    if passes >= 3:
        mid32 = mid.astype(jnp.float32)
        parts.append((v - hi32 - mid32).astype(jnp.bfloat16))
    delta = jnp.zeros((sub.shape[0], LANE), jnp.float32)
    for part in parts:
        u = (onehot * part.astype(jnp.float32)).astype(jnp.bfloat16)
        delta = delta + jnp.dot(u, w, preferred_element_type=jnp.float32)
    return delta


def _iotas(plane_rows: int = LANE):
    sub = jax.lax.broadcasted_iota(jnp.int32, (plane_rows, 1), 0).astype(
        jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1).astype(
        jnp.float32)
    return lane, sub


def _resolve_strip_packed(read_plane, read_color, *, layers: int,
                          fill_rule: int, prefixed: bool = True,
                          chain: bool = False, plane_rows: int = LANE,
                          window: int = None, bg=None, emit: str = "u32",
                          mask_from: int = None):
    """THE shared winding->pixels resolve (every kernel in this module ends
    here): cross-chunk carry ladder, fill rule, alpha-over composite,
    straight-u8 quantization, little-endian RGBA packing.

    ``read_plane(l)`` -> (plane_rows, 128) chunk-major winding plane for
    layer l (already prefix-summed within each chunk when ``prefixed``);
    ``read_color(l, c)`` -> scalar straight-RGBA channel.  ``chain=True``
    composites with the sequential over chain (bit-compatible with
    resolve.resolve_frames + composite.premul_to_straight_u8);
    ``chain=False`` uses the suffix-product form (fewer VPU ops; used by
    the fused kernels).  ``window`` bounds the carry ladder: when several
    strips pack into one plane (narrow frames), each strip occupies
    ``window = n_chunks*8`` consecutive sublanes and the cross-chunk carry
    must not propagate across strip boundaries.  Returns the
    (plane_rows, 128) uint32 packed strip(s).

    ``bg``/``emit`` support MULTI-PASS composition for draw lists deeper
    than one kernel's VMEM layer budget: ``bg`` (4 chunk-major premul f32
    planes) seeds the chain composite (requires ``chain=True``) and
    ``emit="premul"`` returns the premul (r, g, b, a) planes instead of
    quantizing — the chain form is a LEFT FOLD, so composing layer groups
    pass-by-pass is bit-exactly the single big chain."""
    limit = (window if window is not None and window < plane_rows
             else plane_rows)
    # Layer-vectorized: all L planes stacked into ONE (L*plane_rows, LANE)
    # array so the ladders and the fill rule issue ~L x fewer (bigger) VPU
    # ops.  Bit-exact vs the per-layer form: every pixel sees the identical
    # op sequence; the carry mask (sublane id modulo `limit`) already keeps
    # carries from crossing window boundaries, and layer boundaries fall on
    # multiples of plane_rows (a multiple of `limit`), so the same mask
    # isolates layers too.
    total_rows = layers * plane_rows
    x = jnp.concatenate([read_plane(lyr) for lyr in range(layers)], axis=0)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (total_rows, 1), 0)
    # Window-local sublane id: first the row within this layer's plane,
    # then within its strip window (spp > 1 windows are nc8 rows and do
    # not divide plane_rows, so the mod must nest, not compose).
    local_ids = sub_ids % plane_rows if layers > 1 else sub_ids
    carry_ids = local_ids % limit if limit < plane_rows else local_ids
    # In-chunk prefix: skipped when the placement already fused it
    # (step matrix); else a 7-step lane ladder over ALL chunks in
    # parallel (each sublane is an independent pixel row segment).
    if not prefixed:
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        for shift in (1, 2, 4, 8, 16, 32, 64):
            x = x + jnp.where(lane_ids >= shift,
                              pltpu.roll(x, shift, axis=1), 0.0)
    # Cross-chunk carry: chunk totals live at lane 127; an inclusive
    # stride-8 sublane ladder sums all earlier chunks of the same row
    # (sublane rc = chunk*8 + row, so stride-8 shifts stay row-phased).
    totals = x[:, LANE - 1:]  # (total_rows, 1)
    incl = totals
    shift = STRIP_H
    while shift < limit:
        incl = incl + jnp.where(carry_ids >= shift,
                                pltpu.roll(incl, shift, axis=0), 0.0)
        shift *= 2
    winding = x + (incl - totals)
    rules = layer_rules(fill_rule, layers)
    if len(set(rules)) == 1:
        covs_all = fill_rule_cov(winding, rules[0])
        covs = [covs_all[lyr * plane_rows:(lyr + 1) * plane_rows]
                for lyr in range(layers)]
    else:
        # PER-LAYER fill rules (SWF mixes even-odd and DefineShape4
        # nonzero-winding shapes in one scene): the rule is static per
        # layer, so slicing the stacked winding per layer costs nothing
        # extra beyond the second rule's elementwise ops.
        covs = [fill_rule_cov(
            winding[lyr * plane_rows:(lyr + 1) * plane_rows], rules[lyr])
            for lyr in range(layers)]
    return composite_quantize_pack(covs, read_color, layers=layers,
                                   chain=chain, bg=bg, emit=emit,
                                   mask_from=mask_from)


def fill_rule_cov(winding, fill_rule: int):
    """Winding number -> coverage under the nonzero / even-odd fill rule."""
    if fill_rule == FILL_RULE_NONZERO:
        return jnp.minimum(jnp.abs(winding), 1.0)
    m = jnp.mod(winding, 2.0)
    return 1.0 - jnp.abs(m - 1.0)


def composite_quantize_pack(covs, read_color, *, layers: int,
                            chain: bool = False, bg=None,
                            emit: str = "u32", mask_from: int = None):
    """Coverage planes -> alpha-over composite -> premul-u8 quantization ->
    packed little-endian RGBA uint32 (the shared tail of every resolve).

    ``covs``: list of per-layer coverage arrays (any 2-D shape);
    ``read_color(lyr, ch)`` -> scalar or same-shape array.

    ``bg``: optional (r, g, b, a) premul f32 planes seeding the CHAIN
    composite (multi-pass composition of deep draw lists: the chain is a
    left fold, so pass-by-pass grouping is exact).  ``emit="premul"``
    skips quantization and returns the premul (r, g, b, a) planes.

    ``mask_from``: layers [mask_from:] are a clip-group MASK, not
    content — the content layers [:mask_from] composite as a group from
    a transparent base (same composite form as the standalone content
    pass), the mask layers' union alpha left-folds exactly like the
    standalone white mask pass, the group scales by that union, and the
    scaled group alpha-overs ``bg`` — the in-kernel form of the group
    plane algebra ``scaled = content * mask_a; out = scaled + bg *
    (1 - scaled_a)`` (runtime/pipeline exec_masked_program), float-op
    identical so the layered-compositor pin still holds."""
    if mask_from is not None:
        cr, cg, cb, ca_g = composite_quantize_pack(
            covs[:mask_from], read_color, layers=mask_from,
            chain=chain, emit="premul")
        m = None  # union alpha of the mask sub-layers (left fold)
        for j in range(mask_from, layers):
            ca = read_color(j, 3) * covs[j]
            m = ca if m is None else ca + m * (1.0 - ca)
        r, g, b, a = cr * m, cg * m, cb * m, ca_g * m
        if bg is not None:
            kp = 1.0 - a
            r = r + bg[0] * kp
            g = g + bg[1] * kp
            b = b + bg[2] * kp
            a = a + bg[3] * kp
        pm = (r, g, b)
        return _quantize_pack_tail(pm, a, emit)
    if bg is not None and not chain:
        raise ValueError("bg seeding requires the chain composite form")
    if chain:
        shape = covs[0].shape
        if bg is None:
            r = jnp.zeros(shape, jnp.float32)
            g = jnp.zeros(shape, jnp.float32)
            b = jnp.zeros(shape, jnp.float32)
            a = jnp.zeros(shape, jnp.float32)
        else:
            r, g, b, a = bg
        for lyr in range(layers):
            ca = read_color(lyr, 3) * covs[lyr]
            kp = 1.0 - ca
            r = read_color(lyr, 0) * ca + r * kp
            g = read_color(lyr, 1) * ca + g * kp
            b = read_color(lyr, 2) * ca + b * kp
            a = ca + a * kp
        pm = (r, g, b)
    else:
        # Per-layer effective source alpha ca_l, then the premultiplied
        # over-composite in suffix-product form: out = sum_l C_l ca_l S_l
        # with S_l = prod_{j>l} (1 - ca_j) — fewer VPU ops than chaining
        # the over operator channel by channel.
        cas = [read_color(lyr, 3) * covs[lyr] for lyr in range(layers)]
        weight = [None] * layers  # w_l = ca_l * S_l
        suffix = None
        for lyr in range(layers - 1, -1, -1):
            weight[lyr] = cas[lyr] if suffix is None else cas[lyr] * suffix
            kp = 1.0 - cas[lyr]
            suffix = kp if suffix is None else suffix * kp

        a = weight[0]
        for lyr in range(1, layers):
            a = a + weight[lyr]

        def channel(c_idx):
            out = read_color(0, c_idx) * weight[0]
            for lyr in range(1, layers):
                out = out + read_color(lyr, c_idx) * weight[lyr]
            return out

        pm = (channel(0), channel(1), channel(2))

    return _quantize_pack_tail(pm, a, emit)


def _quantize_pack_tail(pm, a, emit: str):
    if emit == "premul":
        return pm + (a,)

    # Premultiplied-u8 quantization (ARGB32 parity — identical arithmetic
    # to composite.premul_to_straight_u8, which the bit-exactness tests
    # compare against): round premul and alpha to bytes FIRST, then
    # un-premultiply the bytes.  Premul channels are nonnegative and
    # min(pm8, a8f) bounds them, so no clip is needed; a8f == 0 forces
    # pm8 == 0 and therefore s == 0, so no visibility select is needed
    # either.  Mosaic has no f32->u32 cast; round through i32 (0..255).
    a8f = jnp.round(jnp.clip(a, 0.0, 1.0) * 255.0)
    inv = 255.0 / jnp.maximum(a8f, 1.0)

    def chan(c_pm):
        pm8 = jnp.minimum(jnp.round(c_pm * 255.0), a8f)
        return jnp.round(pm8 * inv).astype(jnp.int32)

    r8, g8, b8 = chan(pm[0]), chan(pm[1]), chan(pm[2])
    rgb = (r8 + g8 * (1 << 8) + b8 * (1 << 16)).astype(jnp.uint32)
    return rgb + a8f.astype(jnp.int32).astype(jnp.uint32) * jnp.uint32(1 << 24)


def _place_kernel(sidx_ref, keep_ref, urc_ref, ucm_ref, uval_ref,
                  out_ref, acc_ref, *, step: bool):
    i = pl.program_id(0)
    keep = keep_ref[i]
    lane, sub = _iotas()
    delta = _place_delta(urc_ref[0, :, :], ucm_ref[0, :, :],
                         uval_ref[0, :, :], lane, sub, step=step)
    # where (not multiply): on a group's first block the scratch holds
    # uninitialized memory, and NaN * 0.0 would poison the plane.
    acc = jnp.where(keep == 0, 0.0, acc_ref[...]) + delta
    acc_ref[...] = acc
    out_ref[0, 0, 0, :, :] = acc


@functools.partial(jax.jit, static_argnames=(
    "frames", "layers", "n_strips", "interpret", "step"))
def place_blocks(
    sidx: jax.Array,   # (NB, 3) i32
    keep: jax.Array,   # (NB,) f32
    urc: jax.Array,    # (NB, BLK) f32
    ucm: jax.Array,    # (NB, BLK, 1) f32
    uval: jax.Array,   # (NB, BLK) f32
    frames: int,
    layers: int,
    n_strips: int,
    interpret: bool = None,
    step: bool = True,
) -> jax.Array:
    """-> (F, L, NS+1, 128, 128) chunk-major planes (exact f32).

    Plane [f, l, s, (col//128)*8 + row%8, col%128]; strip NS is the
    padding-block garbage bucket.  ``step=True`` (default) emits planes
    already prefix-summed WITHIN each 128-column chunk (winding up to the
    cross-chunk carry); ``step=False`` emits raw delta placements."""
    if interpret is None:
        interpret = not _on_tpu()
    nb = urc.shape[0]
    ns1 = n_strips + 1

    def out_index(i, si, ke):
        packed = si[i]
        return (packed // (layers * ns1),
                (packed // ns1) % layers,
                packed % ns1, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, BLK), lambda i, si, ke: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK, 1), lambda i, si, ke: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLK), lambda i, si, ke: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, LANE, LANE), out_index, memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((LANE, LANE), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_place_kernel, step=step),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (frames, layers, n_strips + 1, LANE, LANE), jnp.float32),
        interpret=interpret,
    )(sidx, keep, urc, ucm, uval)


def _resolve_u32_kernel(colors_ref, planes_ref, out_ref, *,
                        fill_rule: int, n_layers: int, n_chunks: int,
                        strips_per_step: int, prefixed: bool):
    # planes block (1, L, G, 128, 128) chunk-major; out block
    # (1, G, 8, stride) uint32 (packed RGBA little-endian).  G strips per
    # grid step amortize the per-step pipeline overhead.
    for strip in range(strips_per_step):
        packed = _resolve_strip_packed(
            lambda lyr: planes_ref[0, lyr, strip, :, :],
            lambda lyr, c: colors_ref[0, lyr, c],
            layers=n_layers, fill_rule=fill_rule, prefixed=prefixed,
            chain=True)
        for j in range(n_chunks):
            out_ref[0, strip, :, j * LANE:(j + 1) * LANE] = (
                packed[j * STRIP_H:(j + 1) * STRIP_H, :]
            )


@functools.partial(jax.jit, static_argnames=(
    "n_chunks", "fill_rule", "interpret", "strips_per_step", "prefixed"))
def resolve_planes_u32(
    planes: jax.Array,  # (F, L, NS+1, 128, 128) f32 chunk-major
    colors: jax.Array,  # (F, L, 4) f32 straight RGBA
    n_chunks: int,
    fill_rule: int = FILL_RULE_NONZERO,
    interpret: bool = None,
    strips_per_step: int = 1,
    prefixed: bool = True,
) -> jax.Array:
    """-> (F, NS*8, stride) uint32 RGBA-packed frames.

    ``prefixed=True`` expects planes whose chunks are already internally
    prefix-summed (place_blocks(step=True) output)."""
    if interpret is None:
        interpret = not _on_tpu()
    f, l, ns1, _, _ = planes.shape
    ns = ns1 - 1
    stride = n_chunks * LANE
    g = strips_per_step
    while ns % g:
        g -= 1
    kernel = functools.partial(
        _resolve_u32_kernel, fill_rule=fill_rule, n_layers=l,
        n_chunks=n_chunks, strips_per_step=g, prefixed=prefixed)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((f, ns, STRIP_H, stride),
                                       jnp.uint32),
        grid=(f, ns // g),
        in_specs=[
            pl.BlockSpec((1, l, 4), lambda fi, s: (fi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, l, g, LANE, LANE),
                         lambda fi, s: (fi, 0, s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, g, STRIP_H, stride),
                               lambda fi, s: (fi, s, 0, 0)),
        interpret=interpret,
    )(colors, planes)
    return out.reshape(f, ns * STRIP_H, stride)


def _fused_kernel(sidx_ref, keep_ref, last_ref, colors_ref,
                  urc_ref, ucm_ref, uval_ref, out_ref, acc_ref, *,
                  layers: int, ns1: int, n_chunks: int, fill_rule: int,
                  passes: int):
    """Placement + resolve in ONE kernel: the MXU block matmuls and the
    VPU resolve interleave (they run on different units), and the winding
    planes never leave VMEM — no HBM planes traffic at all.

    Blocks are sorted by (frame, strip, layer); `keep` resets the per-layer
    accumulator at each (f, s, l) group start and `last` marks the final
    block of each (f, s) supergroup, after which all L layer planes are
    resolved and the strip is emitted as packed-u32 RGBA."""
    i = pl.program_id(0)
    packed = sidx_ref[i]
    keep = keep_ref[i]
    lane, sub = _iotas()
    delta = _place_delta(urc_ref[0, :, :], ucm_ref[0, :, :],
                         uval_ref[0, :, :], lane, sub, passes=passes)

    # keep == 0 marks the first block of an (f, s) supergroup: zero ALL
    # layer planes (so layers with no updates resolve to zero coverage
    # without needing explicit empty blocks).
    @pl.when(keep == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    layer = (packed // ns1) % layers
    acc_ref[layer] = acc_ref[layer] + delta

    @pl.when(last_ref[i] == 1)
    def _resolve():
        _resolve_acc_to_u32(acc_ref, colors_ref, out_ref, packed,
                            layers, ns1, n_chunks, fill_rule)


@functools.partial(jax.jit, static_argnames=(
    "frames", "layers", "n_strips", "n_chunks", "fill_rule", "interpret",
    "passes"))
def render_fused_blocks(
    sidx: jax.Array,    # (NB,) i32 packed (f*L + l)*(NS+1) + s
    keep: jax.Array,    # (NB,) i32
    last: jax.Array,    # (NB,) i32 — 1 on the last block of each (f, s)
    urc: jax.Array,     # (NB, 1, BLK) f32
    ucm: jax.Array,     # (NB, BLK, 1) f32
    uval: jax.Array,    # (NB, 1, BLK) f32
    colors: jax.Array,  # (F, L, 4) f32
    frames: int,
    layers: int,
    n_strips: int,
    n_chunks: int,
    fill_rule: int = FILL_RULE_NONZERO,
    interpret: bool = None,
    passes: int = 3,
) -> jax.Array:
    """Single-kernel flat-block render -> (F, NS+1, 8, stride) uint32
    (strip NS is the sentinel row; callers slice [:, :NS]).

    Requires blocks sorted by (frame, strip, layer) — see
    sort_blocks_fused."""
    if n_chunks * STRIP_H > LANE:
        raise ValueError("render_fused_blocks supports width < 2048; use "
                         "render_fused_blocksn for wider frames")
    if interpret is None:
        interpret = not _on_tpu()
    nb = urc.shape[0]
    ns1 = n_strips + 1
    stride = n_chunks * LANE

    def out_index(i, si, ke, la, co):
        packed = si[i]
        return (packed // (layers * ns1), packed % ns1, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, BLK), lambda i, si, ke, la, co: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK, 1), lambda i, si, ke, la, co: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BLK), lambda i, si, ke, la, co: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, STRIP_H, stride), out_index, memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((layers, LANE, LANE), jnp.float32)],
    )
    kernel = functools.partial(
        _fused_kernel, layers=layers, ns1=ns1, n_chunks=n_chunks,
        fill_rule=fill_rule, passes=passes)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (frames, ns1, STRIP_H, stride), jnp.uint32),
        interpret=interpret,
    )(sidx, keep, last, colors, urc, ucm, uval)


def sort_blocks_fused(sidx, keep, urc, ucm, uval, layers: int,
                      n_strips: int, block_pad_multiple: int = 1024):
    """Reorder packer output from (f, l, s) order to the fused kernel's
    (f, s, l) order, drop value-less blocks (the fused kernel zeroes ALL
    layer planes at each (f, s) supergroup start, so empty-layer filler
    blocks are unnecessary — each supergroup just needs >= 1 block to emit
    its strip), and compute the per-(f, s) first/`last` flags.

    Returns (sidx, keep, last, urc, ucm, uval) with keep == 0 marking
    supergroup starts."""
    ns1 = n_strips + 1
    f = sidx // (layers * ns1)
    l = (sidx // ns1) % layers
    s = sidx % ns1

    real = s != n_strips  # drop the packer's global sentinel padding
    order = np.lexsort((l[real], s[real], f[real]))

    def take(x):
        return x[real][order]

    sidx2, urc2, ucm2, uval2 = map(take, (sidx, urc, ucm, uval))
    f2, s2 = take(f), take(s)
    group = f2.astype(np.int64) * ns1 + s2

    zero_blk = ~np.any(uval2.reshape(len(uval2), -1) != 0.0, axis=1)
    retain = ~zero_blk
    if len(group):
        starts = np.r_[True, group[1:] != group[:-1]]
        # A supergroup whose blocks are all value-less keeps its first
        # block (something must zero + emit the strip).
        gid = np.cumsum(starts) - 1
        has_value = np.zeros(gid[-1] + 1, bool)
        np.logical_or.at(has_value, gid, retain)
        retain |= starts & ~has_value[gid]

    sidx2, urc2, ucm2, uval2 = (x[retain] for x in
                                (sidx2, urc2, ucm2, uval2))
    group = group[retain]
    nb = len(sidx2)
    first = np.r_[True, group[1:] != group[:-1]] if nb else np.zeros(0, bool)
    last = np.zeros(nb, np.int32)
    if nb:
        last[np.nonzero(first)[0][1:] - 1] = 1
        last[-1] = 1
    keep2 = (~first).astype(np.int32)

    nb_pad = ((nb + block_pad_multiple - 1)
              // block_pad_multiple) * block_pad_multiple
    pad = nb_pad - nb
    if pad:
        # Sentinel tail: keep=1 (no reset), last=0, zero values targeting
        # the garbage strip of frame 0.
        sidx2 = np.concatenate(
            [sidx2, np.full(pad, n_strips, np.int32)])
        keep2 = np.concatenate([keep2, np.ones(pad, np.int32)])
        last = np.concatenate([last, np.zeros(pad, np.int32)])
        urc2 = np.concatenate(
            [urc2, np.zeros((pad,) + urc2.shape[1:], np.float32)])
        ucm2 = np.concatenate(
            [ucm2, np.zeros((pad,) + ucm2.shape[1:], np.float32)])
        uval2 = np.concatenate(
            [uval2, np.zeros((pad,) + uval2.shape[1:], np.float32)])
    return sidx2, keep2, last, urc2, ucm2, uval2


def _fusedn_kernel(sidx_ref, flags_ref, *rest, layers: int, ns1: int,
                   n_chunks: int, fill_rule: int, group: int,
                   plane_rows: int = LANE, blk: int = BLK, spp: int = 1,
                   vfold: bool = False):
    """Generalized fused kernel: ``group`` placement blocks per grid step
    (all one (f, s) supergroup).  rest = (lay_0..lay_{group-1}, colors,
    urc, ucm, uval, out, acc); the block arrays hold the group's blocks
    side by side: urc/uval (1, 1, group*BLK), ucm (1, group*BLK, 1)
    (``vfold``: uval rides sublane-oriented (1, group*BLK, 1))."""
    lay_refs = rest[:group]
    colors_ref = rest[group]
    urc_ref, ucm_ref, uval_ref, out_ref, acc_ref = rest[group + 1:]
    i = pl.program_id(0)
    packed = sidx_ref[i]
    flags = flags_ref[i]
    lane, sub = _iotas(plane_rows)

    @pl.when(jnp.bitwise_and(flags, 1) == 1)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # flags >> 2 carries the step's USED slot count (native packer); 0 means
    # "process all" (legacy Python packer / empty supergroups — their padded
    # slots are zero-valued, so both forms are bit-identical; predication
    # just skips the dead matmuls).
    nblk = jax.lax.shift_right_logical(flags, 2)
    run_all = nblk == 0
    for g in range(group):
        @pl.when(jnp.logical_or(run_all, g < nblk))
        def _place(g=g):
            if vfold:
                v = uval_ref[0, g * blk:(g + 1) * blk, :]
            else:
                v = uval_ref[0, :, g * blk:(g + 1) * blk]
            delta = _place_delta(urc_ref[0, :, g * blk:(g + 1) * blk],
                                 ucm_ref[0, g * blk:(g + 1) * blk, :],
                                 v, lane, sub, vfold=vfold)
            layer = lay_refs[g][i]
            acc_ref[layer] = acc_ref[layer] + delta

    @pl.when(jnp.bitwise_and(flags, 2) == 2)
    def _resolve():
        _resolve_acc_to_u32(acc_ref, colors_ref, out_ref, packed,
                            layers, ns1, n_chunks, fill_rule,
                            plane_rows=plane_rows, spp=spp)


def _resolve_acc_to_u32(acc_ref, colors_ref, out_ref, packed,
                        layers, ns1, n_chunks, fill_rule,
                        plane_rows: int = LANE, spp: int = 1):
    f = packed // (layers * ns1)
    nc8 = n_chunks * STRIP_H
    pk = _resolve_strip_packed(
        lambda lyr: acc_ref[lyr],
        lambda lyr, c: colors_ref[f, lyr, c],
        layers=layers, fill_rule=fill_rule, prefixed=True, chain=False,
        plane_rows=plane_rows, window=nc8 if spp > 1 else None)
    for k in range(spp):
        for j in range(n_chunks):
            out_ref[0, 0, k * STRIP_H:(k + 1) * STRIP_H,
                    j * LANE:(j + 1) * LANE] = (
                pk[k * nc8 + j * STRIP_H:k * nc8 + (j + 1) * STRIP_H, :]
            )


@functools.partial(jax.jit, static_argnames=(
    "frames", "layers", "n_strips", "n_chunks", "group", "fill_rule",
    "interpret", "blk", "spp", "vfold"))
def render_fused_blocksn(
    sidx: jax.Array,    # (NG,) i32 packed target
    flags: jax.Array,   # (NG,) i32 bit0 zero, bit1 resolve
    lays: jax.Array,    # (group, NG) i32 per-sub-block layer
    urc: jax.Array,     # (NG, 1, group*BLK) f32
    ucm: jax.Array,     # (NG, group*BLK, 1) f32
    uval: jax.Array,    # (NG, 1, group*BLK) f32
    colors: jax.Array,  # (F, L, 4) f32
    frames: int,
    layers: int,
    n_strips: int,
    n_chunks: int,
    group: int = 6,
    fill_rule: int = FILL_RULE_NONZERO,
    interpret: bool = None,
    blk: int = BLK,
    spp: int = 1,
    vfold: bool = None,  # None = _VFOLD_DEFAULT
) -> jax.Array:
    """Group-per-step fused render -> (F, NSB+1, spp*8, stride) uint32.

    ``blk``: updates per placement sub-block (the MXU contraction size of
    one placement product; the packer must agree).  ``spp``: strips packed
    per plane — ``n_strips`` is then the STRIP-BLOCK count
    (ceil(strips/spp)) and each output row-block carries spp strips."""
    if interpret is None:
        interpret = not _on_tpu()
    if vfold is None:
        vfold = _VFOLD_DEFAULT
    ng = urc.shape[0]
    ns1 = n_strips + 1
    stride = n_chunks * LANE
    plane_rows = plane_rows_for(n_chunks, spp)
    if vfold:
        # Same bytes, sublane orientation (see render_fused_styled).
        uval = uval.reshape(ng, uval.shape[2], 1)
    nsp = 2 + group + 1  # sidx, flags, lay_g..., colors

    def out_index(i, *refs):
        packed = refs[0][i]
        return (packed // (layers * ns1), packed % ns1, 0, 0)

    def in_index(i, *refs):
        return (i, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, 1, group * blk), in_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * blk, 1), in_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * blk, 1) if vfold
                         else (1, 1, group * blk), in_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, spp * STRIP_H, stride), out_index,
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((layers, plane_rows, LANE),
                                   jnp.float32)],
    )
    kernel = functools.partial(
        _fusedn_kernel, layers=layers, ns1=ns1, n_chunks=n_chunks,
        fill_rule=fill_rule, group=group, plane_rows=plane_rows, blk=blk,
        spp=spp, vfold=vfold)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (frames, ns1, spp * STRIP_H, stride), jnp.uint32),
        interpret=interpret,
    )(sidx, flags, *(lays[g] for g in range(group)), colors,
      urc, ucm, uval)


# ---------------------------------------------------------------------------
# Styled fused pipeline: gradients evaluated IN-KERNEL, bitmaps via
# precomputed chunk-major field planes — styled fills ride the same
# single-kernel flat-block path as solids (the reference keeps gradient and
# pattern fills in the same hot fill path, canvas-renderer.ts:292-335).
# ---------------------------------------------------------------------------

KPAINT_COLOR = 0   # per-(frame, layer) constant RGBA from colors_ref
KPAINT_LINEAR = 1  # linear gradient, params baked into the kernel
KPAINT_FOCAL = 2   # focal/radial gradient, params baked
KPAINT_FIELD = 3   # per-pixel RGBA field input (bitmap paints)

_GRAD_RADIUS = 16384.0  # SWF gradient square radius in twips (style.py)


class KernelPaint(tuple):
    """Hashable static paint descriptor for the styled fused kernel.

    (kind, inv_matrix(6), stop_ratios(K), stop_colors(4K flat), focal,
    spread, field_slot).  Gradient params are baked into the compiled
    kernel as constants (paints are per-scene state, like the grid shape);
    bitmap paints reference a field input slot instead."""

    __slots__ = ()

    @staticmethod
    def color():
        return KernelPaint((KPAINT_COLOR, (), (), (), 0.0, 0, -1))

    @staticmethod
    def gradient(kind, inv_matrix, stop_ratios, stop_colors,
                 focal: float = 0.0, spread: int = 0):
        return KernelPaint((
            kind, tuple(float(x) for x in inv_matrix),
            tuple(float(x) for x in stop_ratios),
            tuple(float(x) for x in np.asarray(stop_colors).reshape(-1)),
            float(focal), int(spread), -1))

    @staticmethod
    def field(slot: int):
        return KernelPaint((KPAINT_FIELD, (), (), (), 0.0, 0, int(slot)))

    kind = property(lambda self: self[0])
    inv_matrix = property(lambda self: self[1])
    stop_ratios = property(lambda self: self[2])
    stop_colors = property(lambda self: self[3])
    focal = property(lambda self: self[4])
    spread = property(lambda self: self[5])
    slot = property(lambda self: self[6])


def _grad_rgba(paint: "KernelPaint", strip, plane_rows: int = LANE,
               dtype=jnp.float32, spp: int = 1, n_chunks: int = None):
    """Evaluate a gradient paint over one strip's chunk-major
    (plane_rows, 128) pixel block.  Semantics match ops.style exactly: SWF
    gradient square x in [-16384, 16384] (linear), Canvas
    createRadialGradient focal math (focal), spread pad/repeat/reflect,
    piecewise-linear stop interp.

    ``spp > 1``: ``strip`` is a STRIP-BLOCK id and the plane packs spp
    8-row strips in ``n_chunks*8``-sublane windows (narrow frames); pixel
    coordinates decode through the window."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (plane_rows, LANE), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (plane_rows, LANE), 1)
    if spp > 1:
        nc8 = n_chunks * STRIP_H
        local = sub % nc8
        py = (((strip * spp + sub // nc8) * STRIP_H
               + local % STRIP_H).astype(dtype) + 0.5)
        px = ((local // STRIP_H) * LANE + lane).astype(dtype) + 0.5
    else:
        py = (strip * STRIP_H + sub % STRIP_H).astype(dtype) + 0.5
        px = ((sub // STRIP_H) * LANE + lane).astype(dtype) + 0.5
    a, b, c, d, e, f = paint.inv_matrix
    sx = a * px + c * py + e
    sy = b * px + d * py + f
    return _grad_eval(paint, sx, sy)


def _grad_eval(paint: "KernelPaint", sx, sy, stop_colors=None):
    """Gradient-SPACE coordinates -> 4 straight-RGBA channel arrays.

    The tail of _grad_rgba, split out so callers with DYNAMIC gradient
    matrices (the transform sweep composes the paint's inverse matrix
    with each frame's inverse affine and reads the 6 scalars from SMEM)
    share the exact same ramp/spread/stop math as the baked-matrix
    flat-block path.  ``stop_colors``: optional per-stop [K][4] scalar
    overrides (traced SMEM reads — per-frame color-transform fades);
    stop RATIOS stay static."""
    if paint.kind == KPAINT_LINEAR:
        t = (sx + _GRAD_RADIUS) / (2.0 * _GRAD_RADIUS)
    else:
        # Pure-jnp elementwise helper — shared with the XLA style path so
        # the focal solve exists exactly once.
        from .style import _focal_gradient_t
        t = _focal_gradient_t(sx, sy, paint.focal)

    if paint.spread == 0:      # pad
        t = jnp.clip(t, 0.0, 1.0)
    elif paint.spread == 2:    # repeat
        t = jnp.mod(t, 1.0)
    else:                      # reflect
        m = jnp.mod(t, 2.0)
        t = 1.0 - jnp.abs(m - 1.0)

    # Piecewise-linear ramp as clamped-segment accumulation (identical to
    # jnp.interp on sorted stops, style._interp_stops).
    ratios = paint.stop_ratios
    if stop_colors is None:
        colors = np.asarray(paint.stop_colors, np.float32).reshape(-1, 4)

        def stop(k, ch):
            return colors[k, ch]
    else:
        def stop(k, ch):
            return stop_colors[k][ch]
    out = []
    for ch in range(4):
        acc = jnp.zeros_like(t) + stop(0, ch)
        for k in range(len(ratios) - 1):
            dr_k = max(ratios[k + 1] - ratios[k], 1e-6)
            w = jnp.clip((t - ratios[k]) / dr_k, 0.0, 1.0)
            acc = acc + (stop(k + 1, ch) - stop(k, ch)) * w
        out.append(acc)
    return out


def _styled_read_color(paints, colors_ref, field_refs, f, strip,
                       plane_rows: int = LANE, spp: int = 1,
                       n_chunks: int = None):
    """read_color(lyr, ch) for _resolve_strip_packed over styled layers:
    constant layers read colors_ref, gradients evaluate in-kernel, bitmap
    layers read their prefetched field block (straight RGBA planes)."""
    cache = {}

    def arrays(lyr):
        if lyr not in cache:
            p = paints[lyr]
            if p.kind == KPAINT_FIELD:
                cache[lyr] = [field_refs[p.slot][0, ch] for ch in range(4)]
            else:
                cache[lyr] = _grad_rgba(p, strip, plane_rows, spp=spp,
                                        n_chunks=n_chunks)
        return cache[lyr]

    def read_color(lyr, ch):
        if paints[lyr].kind == KPAINT_COLOR:
            return colors_ref[f, lyr, ch]
        return arrays(lyr)[ch]

    return read_color


def _fused_styled_kernel(sidx_ref, flags_ref, *rest, layers: int, ns1: int,
                         n_chunks: int, fill_rule: int, group: int,
                         paints, n_fields: int, plane_rows: int = LANE,
                         spp: int = 1, chain: bool = False,
                         has_bg: bool = False, emit: str = "u32",
                         vfold: bool = False, mask_from: int = None):
    """_fusedn_kernel generalized to styled per-layer paints.

    ``has_bg``: a premul background plane input follows the fields
    (multi-pass composition); ``emit="premul"``: write chunk-major premul
    f32 planes instead of packed-u32 pixels (intermediate passes skip the
    pixel remap entirely)."""
    lay_refs = rest[:group]
    colors_ref = rest[group]
    urc_ref, ucm_ref, uval_ref = rest[group + 1:group + 4]
    field_refs = rest[group + 4:group + 4 + n_fields]
    rest = rest[group + 4 + n_fields:]
    bg_ref = rest[0] if has_bg else None
    out_ref, acc_ref = rest[1 if has_bg else 0:]
    i = pl.program_id(0)
    packed = sidx_ref[i]
    flags = flags_ref[i]
    lane, sub = _iotas(plane_rows)

    @pl.when(jnp.bitwise_and(flags, 1) == 1)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    nblk = jax.lax.shift_right_logical(flags, 2)
    run_all = nblk == 0
    for g in range(group):
        @pl.when(jnp.logical_or(run_all, g < nblk))
        def _place(g=g):
            if vfold:
                v = uval_ref[0, g * BLK:(g + 1) * BLK, :]
            else:
                v = uval_ref[0, :, g * BLK:(g + 1) * BLK]
            delta = _place_delta(urc_ref[0, :, g * BLK:(g + 1) * BLK],
                                 ucm_ref[0, g * BLK:(g + 1) * BLK, :],
                                 v, lane, sub, vfold=vfold)
            layer = lay_refs[g][i]
            acc_ref[layer] = acc_ref[layer] + delta

    @pl.when(jnp.bitwise_and(flags, 2) == 2)
    def _resolve():
        f = packed // (layers * ns1)
        strip = packed % ns1
        nc8 = n_chunks * STRIP_H
        read_color = _styled_read_color(paints, colors_ref, field_refs,
                                        f, strip, plane_rows, spp=spp,
                                        n_chunks=n_chunks)
        bg = (tuple(bg_ref[0, 0, ch] for ch in range(4))
              if has_bg else None)
        res = _resolve_strip_packed(
            lambda lyr: acc_ref[lyr], read_color,
            layers=layers, fill_rule=fill_rule, prefixed=True, chain=chain,
            plane_rows=plane_rows, window=nc8 if spp > 1 else None,
            bg=bg, emit=emit, mask_from=mask_from)
        if emit == "premul":
            for ch in range(4):
                out_ref[0, 0, ch] = res[ch]
            return
        for k in range(spp):
            for j in range(n_chunks):
                out_ref[0, 0, k * STRIP_H:(k + 1) * STRIP_H,
                        j * LANE:(j + 1) * LANE] = (
                    res[k * nc8 + j * STRIP_H:k * nc8 + (j + 1) * STRIP_H,
                        :]
                )


@functools.partial(jax.jit, static_argnames=(
    "frames", "layers", "n_strips", "n_chunks", "group", "paints",
    "fill_rule", "interpret", "spp", "chain", "emit", "vfold",
    "mask_from"))
def render_fused_styled(
    sidx: jax.Array,    # (NG,) i32 packed target
    flags: jax.Array,   # (NG,) i32 bit0 zero, bit1 resolve
    lays: jax.Array,    # (group, NG) i32 per-sub-block layer
    urc: jax.Array,     # (NG, 1, group*BLK) f32
    ucm: jax.Array,     # (NG, group*BLK, 1) f32
    uval: jax.Array,    # (NG, 1, group*BLK) f32
    colors: jax.Array,  # (F, L, 4) f32 (constant-paint layers)
    fields,             # tuple of (NS+1, 4, 128, 128) f32 field planes
    frames: int,
    layers: int,
    n_strips: int,
    n_chunks: int,
    paints,             # tuple of KernelPaint, one per layer (static)
    group: int = 6,
    fill_rule: int = FILL_RULE_NONZERO,
    interpret: bool = None,
    spp: int = 1,
    chain: bool = False,
    bg: jax.Array = None,  # (F, NS+1, 4, plane_rows, 128) premul planes
    emit: str = "u32",
    vfold: bool = None,  # None = _VFOLD_DEFAULT
    mask_from: int = None,
) -> jax.Array:
    """Styled group-per-step fused render -> (F, NS+1, spp*8, stride)
    uint32.

    Field planes are frame-invariant (device-space paints); convert with
    field_to_chunkmajor (same ``spp``).  Gradient layers cost only VPU ops
    in the resolve (no extra HBM traffic); bitmap layers stream one field
    strip block per resolve step.  ``spp``: strips packed per plane —
    ``n_strips`` is then the STRIP-BLOCK count (matches
    render_fused_blocksn).

    Multi-pass composition (``chain=True``): ``bg`` seeds the chain
    composite from a previous pass's premul planes and
    ``emit="premul"`` emits (F, NS+1, 4, plane_rows, 128) premul f32
    planes instead of packed u32 — chaining G passes of <= 16 layers is
    bit-exactly one big chain composite (left fold)."""
    if interpret is None:
        interpret = not _on_tpu()
    if vfold is None:
        vfold = _VFOLD_DEFAULT
    if bg is not None and not chain and mask_from is None:
        raise ValueError("bg requires chain=True (or mask_from)")
    ng = urc.shape[0]
    ns1 = n_strips + 1
    stride = n_chunks * LANE
    plane_rows = plane_rows_for(n_chunks, spp)
    if vfold:
        # Same bytes, sublane orientation: (NG, 1, G*BLK) and
        # (NG, G*BLK, 1) are identical row-major layouts.
        uval = uval.reshape(ng, uval.shape[2], 1)
    n_fields = len(fields)
    nsp = 2 + group + 1  # sidx, flags, lay_g..., colors

    def out_index(i, *refs):
        packed = refs[0][i]
        return (packed // (layers * ns1), packed % ns1, 0, 0)

    def out_index_premul(i, *refs):
        packed = refs[0][i]
        return (packed // (layers * ns1), packed % ns1, 0, 0, 0)

    def in_index(i, *refs):
        return (i, 0, 0)

    def field_index(i, *refs):
        return (refs[0][i] % ns1, 0, 0, 0)

    def bg_index(i, *refs):
        packed = refs[0][i]
        return (packed // (layers * ns1), packed % ns1, 0, 0, 0)

    if emit == "premul":
        out_spec = pl.BlockSpec((1, 1, 4, plane_rows, LANE),
                                out_index_premul, memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (frames, ns1, 4, plane_rows, LANE), jnp.float32)
    else:
        out_spec = pl.BlockSpec((1, 1, spp * STRIP_H, stride), out_index,
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (frames, ns1, spp * STRIP_H, stride), jnp.uint32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, 1, group * BLK), in_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * BLK, 1), in_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * BLK, 1) if vfold
                         else (1, 1, group * BLK), in_index,
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, 4, plane_rows, LANE), field_index,
                         memory_space=pltpu.VMEM)
            for _ in range(n_fields)
        ] + ([
            pl.BlockSpec((1, 1, 4, plane_rows, LANE), bg_index,
                         memory_space=pltpu.VMEM)
        ] if bg is not None else []),
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((layers, plane_rows, LANE),
                                   jnp.float32)],
    )
    kernel = functools.partial(
        _fused_styled_kernel, layers=layers, ns1=ns1, n_chunks=n_chunks,
        fill_rule=fill_rule, group=group, paints=paints, n_fields=n_fields,
        plane_rows=plane_rows, spp=spp, chain=chain,
        has_bg=bg is not None, emit=emit, vfold=vfold,
        mask_from=mask_from)
    args = [sidx, flags, *(lays[g] for g in range(group)), colors,
            urc, ucm, uval, *fields]
    if bg is not None:
        args.append(bg)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


def field_to_chunkmajor(field, n_strips: int, n_chunks: int, spp: int = 1):
    """(H, W, 4) straight-RGBA field -> (NS+1, 4, plane_rows, 128)
    chunk-major planes for render_fused_styled
    (sublane rc = ((row//8) % spp) * n_chunks*8 + (col//128)*8 + row%8).

    ``spp > 1``: ``n_strips`` is the STRIP-BLOCK count and each plane
    packs spp consecutive 8-row strips in n_chunks*8-sublane windows."""
    h, w = field.shape[:2]
    stride = n_chunks * LANE
    hp = n_strips * spp * STRIP_H
    fp = jnp.zeros((hp, stride, 4), jnp.float32)
    fp = fp.at[:h, :w].set(jnp.asarray(field, jnp.float32))
    x = fp.reshape(n_strips, spp, STRIP_H, n_chunks, LANE, 4)
    x = jnp.transpose(x, (0, 5, 1, 3, 2, 4))  # (NS, 4, spp, chunks, 8, 128)
    x = x.reshape(n_strips, 4, spp * n_chunks * STRIP_H, LANE)
    pad_rows = plane_rows_for(n_chunks, spp) - spp * n_chunks * STRIP_H
    if pad_rows:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_rows), (0, 0)))
    # Sentinel strip NS (garbage bucket) reads as zeros.
    return jnp.pad(x, ((0, 1), (0, 0), (0, 0), (0, 0)))


def group_blocks_fused(sidx, keep, last, urc, ucm, uval, layers: int,
                       n_strips: int, group: int = 4,
                       group_pad_multiple: int = 256):
    """Group sort_blocks_fused output into ``group`` blocks per step
    (supergroups padded to multiples of ``group`` with zero filler)."""
    ns1 = n_strips + 1
    nb = len(sidx)
    f = sidx // (layers * ns1)
    s = sidx % ns1
    l = (sidx // ns1) % layers
    gkey = f.astype(np.int64) * ns1 + s

    out_sidx, out_flags, out_lays = [], [], []
    out_rc, out_cm, out_vv = [], [], []
    zero = np.zeros(BLK, np.float32)
    i = 0
    while i < nb:
        j = i
        while j < nb and gkey[j] == gkey[i]:
            j += 1
        blocks = list(range(i, j))
        while len(blocks) % group:
            blocks.append(-1)
        for k in range(0, len(blocks), group):
            sub = blocks[k:k + group]
            # Bits 2+: used slot count, so the kernel can predicate away
            # padded slots' matmuls (matches the native packer).
            flags = (1 if k == 0 else 0) | (sum(b >= 0 for b in sub) << 2)
            if k + group >= len(blocks):
                lb = next(b for b in reversed(sub) if b >= 0)
                if last[lb]:
                    flags |= 2
            out_sidx.append(int(sidx[sub[0] if sub[0] >= 0 else i]))
            out_flags.append(flags)
            out_lays.append([int(l[b]) if b >= 0 else 0 for b in sub])
            out_rc.append(np.concatenate(
                [urc[b, 0] if b >= 0 else zero for b in sub])[None, :])
            out_cm.append(np.concatenate(
                [ucm[b, :, 0] if b >= 0 else zero for b in sub])[:, None])
            out_vv.append(np.concatenate(
                [uval[b, 0] if b >= 0 else zero for b in sub])[None, :])
        i = j
    ng = len(out_sidx)
    ng_pad = ((ng + group_pad_multiple - 1)
              // group_pad_multiple) * group_pad_multiple
    for _ in range(ng_pad - ng):
        out_sidx.append(n_strips)
        out_flags.append(0)
        out_lays.append([0] * group)
        out_rc.append(np.zeros((1, group * BLK), np.float32))
        out_cm.append(np.zeros((group * BLK, 1), np.float32))
        out_vv.append(np.zeros((1, group * BLK), np.float32))
    return (np.asarray(out_sidx, np.int32),
            np.asarray(out_flags, np.int32),
            np.asarray(out_lays, np.int32).T.copy(),
            np.stack(out_rc), np.stack(out_cm), np.stack(out_vv))


def _resolve_dma_kernel(colors_ref, planes_ref, out_ref, in_buf, out_buf,
                        sem_in, sem_out, *, fill_rule: int, n_layers: int,
                        n_chunks: int, n_strips: int, n_buf: int):
    """Manual double-buffered resolve: grid is (F,) and strips stream
    through VMEM with explicit async DMA (the auto-pipelined grid tops out
    around ~250 GB/s aggregate; N_BUF outstanding copies per direction
    overlap the strip compute and each other)."""
    f = pl.program_id(0)

    def in_dma(slot, s):
        return pltpu.make_async_copy(
            planes_ref.at[f, :, s], in_buf.at[slot], sem_in.at[slot])

    def out_dma(slot, s):
        return pltpu.make_async_copy(
            out_buf.at[slot], out_ref.at[f, s], sem_out.at[slot])

    for k in range(n_buf):
        if k < n_strips:
            in_dma(k, k).start()

    def body(s, _):
        slot = jax.lax.rem(s, n_buf)
        in_dma(slot, s).wait()

        # Free the out slot from its previous occupant before writing.
        @pl.when(s >= n_buf)
        def _():
            out_dma(slot, s - n_buf).wait()

        packed = _resolve_strip_packed(
            lambda lyr: in_buf[slot, lyr],
            lambda lyr, c: colors_ref[0, lyr, c],
            layers=n_layers, fill_rule=fill_rule, prefixed=True,
            chain=True)
        for j in range(n_chunks):
            out_buf[slot, :, j * LANE:(j + 1) * LANE] = (
                packed[j * STRIP_H:(j + 1) * STRIP_H, :]
            )
        out_dma(slot, s).start()

        @pl.when(s + n_buf < n_strips)
        def _():
            in_dma(slot, s + n_buf).start()
        return 0

    jax.lax.fori_loop(0, n_strips, body, 0)
    for k in range(n_buf):
        s_last = n_strips - n_buf + k
        if s_last >= 0:
            out_dma(s_last % n_buf, s_last).wait()


@functools.partial(jax.jit, static_argnames=(
    "n_chunks", "fill_rule", "interpret", "n_buf"))
def resolve_planes_u32_dma(
    planes: jax.Array,  # (F, L, NS+1, 128, 128) f32 chunk-major, PREFIXED
    colors: jax.Array,  # (F, L, 4) f32 straight RGBA
    n_chunks: int,
    fill_rule: int = FILL_RULE_NONZERO,
    interpret: bool = None,
    n_buf: int = 3,
) -> jax.Array:
    """Manual-DMA resolve -> (F, NS*8, stride) uint32 packed frames.
    Expects place_blocks(step=True) planes."""
    if interpret is None:
        interpret = not _on_tpu()
    f, l, ns1, _, _ = planes.shape
    ns = ns1 - 1
    stride = n_chunks * LANE
    kernel = functools.partial(
        _resolve_dma_kernel, fill_rule=fill_rule, n_layers=l,
        n_chunks=n_chunks, n_strips=ns, n_buf=n_buf)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((f, ns, STRIP_H, stride),
                                       jnp.uint32),
        grid=(f,),
        in_specs=[
            pl.BlockSpec((1, l, 4), lambda fi: (fi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((n_buf, l, LANE, LANE), jnp.float32),
            pltpu.VMEM((n_buf, STRIP_H, stride), jnp.uint32),
            pltpu.SemaphoreType.DMA((n_buf,)),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
        interpret=interpret,
    )(colors, planes)
    return out.reshape(f, ns * STRIP_H, stride)


def render_flat_blocks(
    sidx, keep, urc, ucm, uval, colors,
    height: int, width: int,
    frames: int, layers: int, n_strips: int, n_chunks: int,
    fill_rule: int = FILL_RULE_NONZERO,
    interpret: bool = None,
    strips_per_step: int = 1,
):
    """Full flat-block pipeline -> (F, NS*8, stride) uint32 packed frames.

    Crop/convert on the host: ``np.asarray(out)[:, :height, :width]``
    viewed as u8 via ``frames_u32_to_u8``."""
    if n_chunks * STRIP_H > LANE:
        raise ValueError("two-kernel path supports width < 2048; use "
                         "render_fused_blocksn for wider frames")
    planes = place_blocks(sidx, keep, urc, ucm, uval,
                          frames, layers, n_strips, interpret=interpret,
                          step=True)
    return resolve_planes_u32(planes, colors, n_chunks,
                              fill_rule=fill_rule, interpret=interpret,
                              strips_per_step=strips_per_step,
                              prefixed=True)


def premul_planes_to_frames(planes, height: int, width: int,
                            n_chunks: int, spp: int):
    """Chunk-major premul planes (F, NSp+1, 4, plane_rows, LANE) ->
    (F, height, width, 4) premul f32, any strips-per-plane packing.

    Layout (validated against the u32 emit path): plane row =
    sp * n_chunks*8 + chunk*8 + y%8, strip = plane*spp + sp, pixel row
    = strip*8 + y%8.  Pure reshapes/transposes — runs under jit."""
    f, nsp1, _, pr, lane = planes.shape
    ns_p = nsp1 - 1
    sp_cap = pr // (n_chunks * 8)
    # plane_rows may carry tail padding beyond the last full sp slot
    # (e.g. 256 rows at 5 chunks = 6 slots * 40 + 16 pad) — drop it
    # before the slot reshape (frames_to_premul_planes zero-fills it).
    x = planes[:, :ns_p, :, :sp_cap * n_chunks * 8]
    x = x.reshape(f, ns_p, 4, sp_cap, n_chunks, 8, lane)
    x = x.transpose(0, 1, 3, 5, 4, 6, 2)
    x = x.reshape(f, ns_p * sp_cap * 8, n_chunks * lane, 4)
    # Real strips occupy sp < spp within each plane; rows interleave as
    # (plane, sp) so slicing needs the real-strip view first.
    x = x.reshape(f, ns_p, sp_cap, 8, n_chunks * lane, 4)[:, :, :spp]
    x = x.reshape(f, ns_p * spp * 8, n_chunks * lane, 4)
    return x[:, :height, :width]


def frames_to_premul_planes(frames, n_chunks: int, spp: int,
                            ns_planes: int, plane_rows: int):
    """Inverse of premul_planes_to_frames: (F, H, W, 4) premul f32 ->
    (F, NSp+1, 4, plane_rows, LANE) with zero padding rows and a zero
    sentinel plane (padding is never read by the resolve)."""
    import jax.numpy as jnp

    f, h, w, _ = frames.shape
    hp = ns_planes * spp * 8
    wp = n_chunks * LANE
    x = jnp.zeros((f, hp, wp, 4), frames.dtype)
    x = x.at[:, :h, :w].set(frames)
    x = x.reshape(f, ns_planes, spp, 8, n_chunks, LANE, 4)
    x = x.transpose(0, 1, 6, 2, 4, 3, 5)  # f, plane, c, sp, chunk, y8, lane
    x = x.reshape(f, ns_planes, 4, spp * n_chunks * 8, LANE)
    pad_rows = plane_rows - spp * n_chunks * 8
    if pad_rows:
        x = jnp.concatenate(
            [x, jnp.zeros((f, ns_planes, 4, pad_rows, LANE), x.dtype)],
            axis=3)
    sentinel = jnp.zeros((f, 1, 4, plane_rows, LANE), x.dtype)
    return jnp.concatenate([x, sentinel], axis=1)


def frames_u32_to_u8(frames_u32: np.ndarray, height: int,
                     width: int) -> np.ndarray:
    """(F, HP, S) packed uint32 -> (F, height, width, 4) u8 (host view)."""
    arr = np.ascontiguousarray(frames_u32[:, :height, :width])
    if arr.dtype.byteorder == ">":  # big-endian host (not our targets)
        arr = arr.astype("<u4")
    return arr.view(np.uint8).reshape(arr.shape + (4,))
