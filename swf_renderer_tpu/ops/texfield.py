"""MXU bitmap-field baking: per-frame pattern planes without gathers.

The transform sweep's bitmap layers need a device-space RGBA plane per
frame (the reference replays the pattern under the frame matrix at draw
time, reference ts/src/lib/renderers/canvas-renderer.ts:179-184,
295-315).  The straightforward bake — ``style.paint_field_traced``
vmapped over frames — is supersampled bilinear via XLA gathers:
16 texel fetches per pixel at supersample 2, measured 49.8 ms/frame at
512^2 on one v5e (PERF.md), ~250x the sweep kernel itself.  TPUs hate
gathers; they love matmuls.

This kernel re-expresses the same sampling as dense contractions
against the (small) texture, the same trick the placement kernel uses
for row one-hots:

    out[p, c] = sum_k sum_ty sum_tx  wy_k[p, ty] * wx_k[p, tx] * img[ty, tx, c]

with ``wx_k``/``wy_k`` the bilinear (or nearest) tap weights of
subsample k — built as VPU comparisons against a texel iota, never
gathered.  Contracting tx on the MXU ((4*Wt, Tw) @ (Tw, xblk*128)
lane-merged pixels) and ty with exact f32 VPU sublane reductions per
channel quarter keeps every intermediate in VMEM.  Weight construction
handles the exact fetch semantics of ``style._fetch``: repeat (wrap),
flash (clamp — for bilinear, clamping the COORDINATE is identical to
clamping both taps), and canvas (transparent outside).  Filtering runs
on premultiplied values like ``paint_field`` (un-premultiplied by the
wrapper).

Two round-4 throughput levers (the dense dot was 2.1 of animtex's
2.57 ms/frame bake, PERF.md):

* **split3 dot** (default): the f32 contraction runs as THREE bf16
  passes — img_hi@w_hi + img_hi@w_mid + img_lo@w_hi — instead of
  Mosaic's 6-pass ``Precision.HIGHEST`` (HIGH is unsupported in
  Mosaic; DEFAULT's single pass measured 0.007 error, PERF.md).  The
  dropped terms are bounded by ~6e-5 on [0, 1] fields — 30x under the
  u8 half-quantum, 100x tighter than the DEFAULT-precision bug the pin
  tool exists to catch.  ``dot_mode="highest"`` keeps the exact path.
* **y-window**: per (frame, block) the sample rows span only
  |gb|*xblk + |gd|*128 texels; the kernel dynamic-slices a 16-aligned
  row window of static width from the resident texture instead of
  contracting all rows (16: Mosaic's divisibility prover rejects bf16
  dynamic sublane slices it cannot prove tile-aligned — on-chip-only
  constraint).  ``auto_ywin`` picks the width from the concrete frame
  matrices; wrap mode reads a wrap-extended copy.

Weights are mathematically identical to the gather path's; summation
order and the split3 truncation differ, so results agree to ~1e-4
(split3) / ~1e-6 (highest) — tests and tools/tpu_pin.py pin both
against ``paint_field_traced``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .coverage import _on_tpu

LANE = 128

# Beyond this many texels the dense contraction's O(pixels * texels)
# work loses to the gather path (the corpus textures are ~100x128).
MAX_KERNEL_TEXELS = 256 * 256

# Scoped-VMEM budget for the kernel's live intermediates.  The hard
# limit is 16 MB; leave headroom for Mosaic's own buffers and the
# double-buffered output block.
_VMEM_BUDGET = 10 * 2**20


def _kernel_vmem_bytes(th_pad: int, tw_pad: int, xblk: int,
                       ywin: int | None = None,
                       split3: bool = True) -> int:
    """Estimated live f32 bytes inside one _texfield_kernel step: the
    resident texture + per-subsample wx, wy4, b4, r (= wy4*b4) + the
    output block.  ``ywin`` rows (or all th_pad) feed the tall
    temporaries; split3 keeps the texture as two bf16 copies."""
    xl = xblk * LANE
    wt = ywin if ywin else th_pad
    img4 = 4 * th_pad * tw_pad * (2 * 2 if split3 else 4)
    wx = tw_pad * xl * (4 + (2 * 2 if split3 else 0))
    if split3 and 2 * tw_pad <= 128:
        # K-stacked 2-dot extras: [img_hi | img_lo] + the [wxm; wxh]
        # per-subsample concat.
        img4 += 4 * wt * 2 * tw_pad * 2
        wx += 2 * tw_pad * xl * 2
    tall = (4 * wt + 2 * wt + 2 * wt) * xl * 4  # b4 + wy1 + temps
    acc = 2 * 8 * xl * 4
    return img4 + wx + tall + acc


def _auto_xblk(th_pad: int, tw_pad: int, ywin: int | None = None,
               split3: bool = True) -> int:
    """Largest xblk in {8,4,2,1} whose intermediates fit the VMEM
    budget: at the 256x256 texel cap, xblk=8 would hold ~14 MB live
    (wy4/b4/r are (1024, 1024) each) and fail to compile on the chip —
    the footprint, not a fixed constant, must pick the block width."""
    # Wider blocks amortize per-grid-step overhead (the dominant cost
    # once the split3 dot shrank the MXU work — PERF.md round 4); the
    # row window keeps the tall temporaries small enough for 16, which
    # measured best on chip (0.648 ms/frame vs 1.068 @ 8, 0.868 @ 32 on
    # the animtex shape).
    for xblk in (16, 8, 4, 2, 1):
        if _kernel_vmem_bytes(th_pad, tw_pad, xblk, ywin,
                              split3) <= _VMEM_BUDGET:
            return xblk
    return 1


def auto_ywin(invs, th: int, xblk: int = 16,
              repeating: bool = True) -> int | None:
    """Static row-window width for the given CONCRETE device->texel
    inverses, or None when windowing can't help.

    The sample rows of one (xblk, LANE) pixel block span at most
    |gb|*(xblk+1) + |gd|*(LANE+1) texels (+1 covers the subsample
    offsets); bilinear adds 2 taps, the in-kernel 16-alignment of the
    window start adds up to 15.  ``xblk`` must be an upper bound on the
    kernel's actual block width (default 16 = the widest block
    ``_auto_xblk`` ever picks — a window sized for a wider block only
    over-covers).  Repeat mode must not alias (two window rows mapping
    to one texel double-counts), so it requires width < th."""
    invs = np.asarray(invs, np.float32).reshape(-1, 6)
    span = float(np.max(np.abs(invs[:, 1]) * (xblk + 1)
                        + np.abs(invs[:, 3]) * (LANE + 1)))
    # Margins: 2 bilinear taps + 2 floor/margin + 15 (window-start
    # alignment).  Repeat mode mods the start into [0, th) BEFORE the
    # alignment floor, so it pays the 15 only once (round 4: the old
    # align-then-mod order charged 15 more, which disabled the window
    # for 64-row textures entirely).  Starts and widths align to 16:
    # the bf16 split3 texture tiles 16 sublanes per tile, and Mosaic
    # rejects dynamic sublane slices it cannot prove 16-aligned (caught
    # ON CHIP by tools/tpu_pin.py — interpret mode has no such
    # constraint).
    wt = int(-(-(span + 21.0) // 16) * 16)
    th_pad = max(8, -(-th // 8) * 8)
    if wt >= th_pad or wt >= th:
        return None
    return wt


def _axis_weights(coord, t_iota, n_tex: int, repeating: bool,
                  edge_mode: str, smoothed: bool,
                  mask_pad: bool = True):
    """(T, LANE) tap weights for one axis of one subsample.

    ``coord``: (1, LANE) sample coordinate in texel units (the raw
    ``sx`` of style.paint_field_traced — texel centers at integer + 0.5);
    ``t_iota``: (T, 1) texel indices (sublane layout; absolute indices
    when row-windowed).  ``mask_pad``: mask texel indices >= n_tex in
    repeat mode (padded rows alias under mod) — window mode passes
    False, its rows are all real wrap-extended texels.
    """
    n = np.float32(n_tex)
    if smoothed:
        xc = coord - 0.5  # texel-center space: taps floor(xc), +1
        if repeating:
            d = jnp.mod(xc - t_iota, n)  # [0, n)
            w = (jnp.maximum(0.0, 1.0 - d)
                 + jnp.maximum(0.0, 1.0 - (n - d)))
        elif edge_mode == "canvas":
            w = jnp.maximum(0.0, 1.0 - jnp.abs(xc - t_iota))
        else:  # flash: clamp-to-edge == clamping the coordinate
            xcc = jnp.clip(xc, 0.0, n - 1.0)
            w = jnp.maximum(0.0, 1.0 - jnp.abs(xcc - t_iota))
    else:
        fx = jnp.floor(coord)
        if repeating:
            w = (jnp.mod(fx - t_iota, n) < 0.5).astype(jnp.float32)
        elif edge_mode == "canvas":
            w = (fx == t_iota).astype(jnp.float32)
        else:
            w = (jnp.clip(fx, 0.0, n - 1.0) == t_iota).astype(jnp.float32)
    if repeating and mask_pad:
        # Padded texel rows alias under mod: mask them explicitly.
        w = w * (t_iota < n).astype(jnp.float32)
    return w


def _texfield_kernel(invs_ref, *img_refs_and_out, xblk: int, th: int,
                     tw: int, th_pad: int, tw_pad: int, supersample: int,
                     repeating: bool, smoothed: bool, edge_mode: str,
                     split3: bool, ywin: int | None, th_ext: int,
                     kstack: bool, fpb: int):
    out_ref = img_refs_and_out[-1]
    img_refs = img_refs_and_out[:-1]
    fg = pl.program_id(0)
    xb = pl.program_id(1)
    yb = pl.program_id(2)
    n = supersample
    inv_n2 = np.float32(1.0 / (n * n))
    for fi in range(fpb):
        _texfield_frame(
            invs_ref, img_refs, out_ref, fg * fpb + fi, fi, xb, yb,
            xblk=xblk, th=th, tw=tw, th_pad=th_pad, tw_pad=tw_pad, n=n,
            inv_n2=inv_n2, repeating=repeating, smoothed=smoothed,
            edge_mode=edge_mode, split3=split3, ywin=ywin, th_ext=th_ext,
            kstack=kstack)


def _texfield_frame(invs_ref, img_refs, out_ref, f, fi, xb, yb, *,
                    xblk, th, tw, th_pad, tw_pad, n, inv_n2, repeating,
                    smoothed, edge_mode, split3, ywin, th_ext, kstack):
    ga, gb, gc, gd, ge, gf = (invs_ref[f, k] for k in range(6))

    # All xblk x-values share one lane axis: lane l is pixel
    # (x = xb*xblk + l // LANE, y = yb*LANE + l % LANE) — one
    # (4*Wt, TWp) @ (TWp, xblk*LANE) contraction per subsample instead
    # of xblk small ones (8x fewer MXU dispatches; PERF.md).
    xl = xblk * LANE
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, xl), 1)
    ylf = (yb * LANE + jnp.mod(lane, LANE)).astype(jnp.float32)
    xlf = (xb * xblk + jnp.floor_divide(lane, LANE)).astype(jnp.float32)
    tx_iota = jax.lax.broadcasted_iota(
        jnp.int32, (tw_pad, 1), 0).astype(jnp.float32)

    if ywin is None:
        wt = th_pad
        win_rows = None
        t_start = jnp.int32(0)
        mask_pad = True
    else:
        wt = ywin
        mask_pad = False
        # Row window: the block's sy range from the matrix scalars
        # (interval arithmetic over the block corners + subsample
        # offsets in [0, 1]), floored to the first bilinear tap, 16-
        # aligned down, clamped per fetch mode.
        x0f = (xb * xblk).astype(jnp.float32)
        y0f = (yb * LANE).astype(jnp.float32)
        sy_lo = (gf + jnp.minimum(gb * x0f, gb * (x0f + xblk + 1))
                 + jnp.minimum(gd * y0f, gd * (y0f + LANE + 1)))
        o = jnp.floor(sy_lo - 0.5).astype(jnp.int32) - 1
        # 16-aligned starts, with the `* 16` as the OUTERMOST op:
        # Mosaic's divisibility prover rejects dynamic sublane slices
        # it cannot statically prove aligned, and it does not see
        # through clip/mod wrappers (caught ON CHIP by tools/tpu_pin.py
        # — interpret mode has no such constraint).  bf16 textures tile
        # 16 sublanes per tile; auto_ywin budgets the slack.
        if repeating:
            # Wrap-extended texture rows [0, th + wt): mod the start
            # into [0, th) FIRST, then align down (mod-then-align pays
            # the <=15-row alignment slack once; weights are
            # mod-periodic in the absolute tap index, so the shifted
            # window covers the same taps).
            t16 = jnp.mod(o, th) // 16
        else:
            # Clamp/canvas taps live in [0, th): a window clamped into
            # [0, th_ext - wt] always contains them (wt covers the
            # span + margins; out-of-range taps weigh 0; th_ext and wt
            # are both 16-multiples so the bound stays aligned).
            t16 = jnp.clip(o // 16, 0, (th_ext - wt) // 16)
        t_start = t16 * 16
        win_rows = wt

    def load_rows(ref):
        if win_rows is None:
            v = ref[...]
            if v.ndim == 3:  # (4, THe, TWp) channel-major, full rows
                v = v.reshape(4 * wt, tw_pad)
            return v
        parts = [ref[c, pl.dslice(t_start, wt), :] for c in range(4)]
        return jnp.concatenate(parts, axis=0)

    if split3:
        img_hi = load_rows(img_refs[0])
        img_lo = load_rows(img_refs[1])
        # K-stack: when the texture is at most half an MXU K tile wide
        # (tw_pad <= 64), the two split3 correction dots ride in ONE
        # K=2*tw_pad dot — [img_hi | img_lo] @ [wxm; wxh] — whose
        # second half occupies the K-tile padding the narrow texture
        # wastes anyway: 3 MXU dispatches become 2 at identical padded
        # MAC count (PERF.md round 4).  Same products, so the precision
        # story is unchanged (the two corrections accumulate inside the
        # MXU's f32 accumulator instead of a VPU add).
        if kstack:
            img_cat = jnp.concatenate([img_hi, img_lo], axis=1)
    else:
        img4 = load_rows(img_refs[0])

    rel_iota = jax.lax.broadcasted_iota(
        jnp.int32, (wt, 1), 0).astype(jnp.float32)
    ty1 = t_start.astype(jnp.float32) + rel_iota
    # Window + repeat + bilinear: the margin guarantee (auto_ywin) puts
    # every sample's mod-offset m = mod(xc - t_start, th) in [1, wt-1]
    # with both taps in-window, so the two-term mod-space weights
    # collapse to ONE absolute-space term against the RELATIVE row iota
    # — one (1, XL) mod instead of a (Wt, XL) mod + second wrap max
    # (the wrap term is how the upper tap gets its weight in mod space;
    # here row floor(m)+1 is in-window by construction).  Identical
    # weight VALUES, pinned at 0.0 vs the full-row kernel on chip.
    wy_rel = ywin is not None and repeating and smoothed

    def sub(k, acc):
        kf = k.astype(jnp.float32)
        ox = (jnp.mod(kf, n) + 0.5) / n
        oy = (jnp.floor_divide(kf, n) + 0.5) / n
        sx = ga * (xlf + ox) + gc * (ylf + oy) + ge  # (1, XL)
        sy = gb * (xlf + ox) + gd * (ylf + oy) + gf
        wx = _axis_weights(sx, tx_iota, tw, repeating, edge_mode,
                           smoothed)          # (TWp, XL)
        # One (Wt, XL) row-weight build shared by all four channel
        # quarters (the weights are channel-independent; building the
        # channel-stacked (4*Wt, XL) copy cost 4x the VPU comparisons —
        # the dominant kernel cost once the dot shrank, PERF.md r4).
        if wy_rel:
            m = jnp.mod(sy - 0.5 - t_start.astype(jnp.float32),
                        np.float32(th))                   # (1, XL)
            wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(m - rel_iota))
        else:
            wy1 = _axis_weights(sy, ty1, th, repeating, edge_mode,
                                smoothed, mask_pad=mask_pad)  # (Wt, XL)
        if split3:
            # Three bf16 passes: img_hi@w_hi + img_hi@w_mid + img_lo@w_hi.
            # Dropped terms (img_hi@w_lo, img_lo@w_mid, ...) bound the
            # error at ~1e-4 on [0,1] premul fields — below the u8
            # half-quantum; tools/tpu_pin.py tracks the actual max.
            # The hi part is split by MANTISSA MASKING, not an
            # f32->bf16->f32 convert round-trip: on chip the compiler
            # (excess-precision folding) elides the round-trip, turning
            # the wxm correction into exact zero — a one-bf16-quantum
            # 0.0049 field error invisible in interpret mode (caught by
            # tools/tpu_pin.py, PERF.md round 4).  The masked hi has the
            # top 7 mantissa bits only, so its bf16 cast is exact.
            wxh_f = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(wx, jnp.uint32)
                & np.uint32(0xFFFF0000), jnp.float32)
            wxh = wxh_f.astype(jnp.bfloat16)
            wxm = (wx - wxh_f).astype(jnp.bfloat16)
            if kstack:
                b4 = (jnp.dot(img_hi, wxh,
                              preferred_element_type=jnp.float32)
                      + jnp.dot(img_cat,
                                jnp.concatenate([wxm, wxh], axis=0),
                                preferred_element_type=jnp.float32))
            else:
                b4 = (jnp.dot(img_hi, wxh,
                              preferred_element_type=jnp.float32)
                      + jnp.dot(img_hi, wxm,
                                preferred_element_type=jnp.float32)
                      + jnp.dot(img_lo, wxh,
                                preferred_element_type=jnp.float32))
        else:
            # Exact path: HIGHEST precision (Mosaic's DEFAULT feeds
            # bf16-rounded operands to the MXU — measured 0.007
            # (±1.8/255) error vs the gather oracle; HIGH is unsupported
            # in Mosaic; PERF.md has the cost table).
            b4 = jnp.dot(img4, wx,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        # Contract ty per channel as exact f32 VPU sublane reductions
        # over each Wt quarter — a (8, 4*Wt) @ (4*Wt, XL) selection
        # matmul was 2x dot1's padded MAC count AND needed HIGHEST
        # itself (measured in PERF.md).
        rows = [jnp.sum(wy1 * b4[c * wt:(c + 1) * wt], axis=0,
                        keepdims=True) for c in range(4)]
        return acc + jnp.concatenate(rows, axis=0)

    # Unrolled subsample loop (n*n <= 16 in practice): no fori_loop
    # sequencing between iterations, so Mosaic can overlap one
    # subsample's VPU weight build with another's MXU contraction.
    if n * n <= 16:
        acc = jnp.zeros((4, xl), jnp.float32)
        for k in range(n * n):
            acc = sub(jnp.int32(k), acc)
    else:
        acc = jax.lax.fori_loop(
            0, n * n, sub, jnp.zeros((4, xl), jnp.float32))
    pm = acc * inv_n2
    # Un-premultiply in-kernel (paint_field's straight-RGBA contract) and
    # write the block in its final (4, x, y) layout — the old 8-sublane
    # half-zero block cost an XLA slice + divide + two reshapes over the
    # full (F, H, W, 4) planes per frame (PERF.md round 4).
    alpha = pm[3:4]
    safe = jnp.maximum(alpha, np.float32(1e-6))
    rgb = jnp.where(alpha > 1e-6, pm[:3] / safe, 0.0)
    out_ref[fi, 0, 0] = jnp.concatenate(
        [rgb, alpha], axis=0).reshape(4, xblk, LANE)


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "supersample", "repeating", "smoothed",
    "edge_mode", "interpret", "xblk", "dot_mode", "ywin", "kstack",
    "frames_per_step"))
def bitmap_field_planes(img, invs, height: int, width: int,
                        supersample: int = 4, repeating: bool = False,
                        smoothed: bool = True, edge_mode: str = "flash",
                        interpret: bool = None,
                        xblk: int | None = None,
                        dot_mode: str = "split3",
                        ywin: int | None = None,
                        kstack: bool | None = None,
                        frames_per_step: int | None = None) -> jnp.ndarray:
    """(Th, Tw, 4) u8 texture + (F, 6) device->texel inverses ->
    (F, H, W, 4) f32 straight-RGBA field planes, gather-free.

    Drop-in twin of vmapping ``style.paint_field_traced`` over frames
    for PAINT_BITMAP (same sampling semantics, see module docstring) at
    MXU rather than gather throughput.  ``dot_mode="split3"`` (default)
    runs the contraction as three bf16 passes (~6e-5 field error, 2x
    the exact "highest" path's throughput); ``ywin`` (static, from
    :func:`auto_ywin`) contracts only a dynamic row window."""
    if interpret is None:
        interpret = not _on_tpu()
    split3 = dot_mode == "split3"
    if dot_mode not in ("split3", "highest"):
        raise ValueError(f"unknown dot_mode {dot_mode!r}")
    th, tw = int(img.shape[0]), int(img.shape[1])
    th_pad = max(8, -(-th // 8) * 8)
    tw_pad = max(8, -(-tw // 8) * 8)
    if kstack is None:
        kstack = split3 and 2 * tw_pad <= 128
    kstack = bool(kstack and split3 and 2 * tw_pad <= 128)
    if ywin is not None and (ywin % 16 or ywin >= th_pad
                             or (repeating and ywin >= th)):
        ywin = None
    if xblk is None:
        xblk = _auto_xblk(th_pad, tw_pad, ywin, split3)
    fcount = invs.shape[0]
    wp = -(-width // xblk) * xblk
    hp = -(-height // LANE) * LANE

    imgf = jnp.asarray(img).astype(jnp.float32) / 255.0
    imgf = imgf.at[..., :3].multiply(imgf[..., 3:4])  # premul filtering
    if ywin is not None and repeating:
        # Wrap-extend rows so any [o, o + ywin) window of absolute taps
        # reads real texels: row j = img[j % th] for j < th + ywin.
        reps = -(-(th + ywin) // th)
        imgf = jnp.tile(imgf, (reps, 1, 1))[:th + ywin]
        th_ext = -(-(th + ywin) // 16) * 16
    elif ywin is not None:
        # Clamp/canvas window: rows padded to a 16-multiple >= ywin so
        # the aligned window clamp (th_ext - ywin) stays in range.
        th_ext = max(ywin, -(-th // 16) * 16)
    else:
        th_ext = th_pad
    imgf = jnp.pad(imgf, ((0, th_ext - imgf.shape[0]),
                          (0, tw_pad - tw), (0, 0)))
    # (THe, TWp, 4) -> channel-major (4, THe, TWp): the kernel row-
    # windows each channel with one leading-dim dynamic slice.
    img4 = imgf.transpose(2, 0, 1)
    if split3:
        # Mantissa-masked split (NOT a bf16 convert round-trip, which
        # the TPU compiler's excess-precision folding elides to
        # identity, zeroing img_lo — same bug as the in-kernel wx
        # split; tools/tpu_pin.py pins it).
        img_hi_f = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(img4, jnp.uint32)
            & np.uint32(0xFFFF0000), jnp.float32)
        img_hi = img_hi_f.astype(jnp.bfloat16)
        img_lo = (img4 - img_hi_f).astype(jnp.bfloat16)
        img_in = (img_hi, img_lo)
    else:
        img_in = (img4.reshape(4 * th_ext, tw_pad)
                  if ywin is None else img4,)
    if not split3 and ywin is None:
        # Legacy exact layout: channel-stacked 2-D resident texture.
        img_specs = [pl.BlockSpec((4 * th_ext, tw_pad),
                                  lambda f, xb, yb: (0, 0),
                                  memory_space=pltpu.VMEM)]
    else:
        img_specs = [pl.BlockSpec((4, th_ext, tw_pad),
                                  lambda f, xb, yb: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
                     for _ in img_in]

    # Several frames per grid step amortize the per-step fixed cost
    # (sequencing + output DMA setup) that dominates once the dot and
    # the weight builds shrank; the tall temporaries are reused across
    # the in-step frame loop, only the output block grows.
    # ABBA-measured on the animtex shape: fpb6 0.66 / fpb4 0.73 /
    # fpb2 0.75 / fpb1 0.84 ms per frame; 12 regresses (output-block
    # VMEM + scheduling).  Largest divisor of the frame count <= 6.
    if frames_per_step is None:
        frames_per_step = next(
            (fb for fb in (6, 4, 3, 2) if fcount % fb == 0), 1)
    fpb = max(1, int(frames_per_step))
    while fcount % fpb:
        fpb -= 1

    kernel = functools.partial(
        _texfield_kernel, xblk=xblk, th=th, tw=tw, th_pad=th_pad,
        tw_pad=tw_pad, supersample=int(supersample),
        repeating=bool(repeating), smoothed=bool(smoothed),
        edge_mode=str(edge_mode), split3=split3, ywin=ywin,
        th_ext=th_ext, kstack=kstack, fpb=fpb)
    xb_n, yb_n = wp // xblk, hp // LANE
    out = pl.pallas_call(
        kernel,
        grid=(fcount // fpb, xb_n, yb_n),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + img_specs,
        out_specs=pl.BlockSpec((fpb, 1, 1, 4, xblk, LANE),
                               lambda f, xb, yb: (f, xb, yb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (fcount, xb_n, yb_n, 4, xblk, LANE), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(invs, jnp.float32), *img_in)

    # (F, XB, YB, 4, xblk, LANE): block (xb, yb) covers pixels
    # (x = xb*xblk + i, y = yb*LANE + j), channels leading, already
    # straight RGBA -> (F, 4, WP, HP) -> (F, H, W, 4).
    out = out.transpose(0, 3, 1, 4, 2, 5).reshape(fcount, 4, wp, hp)
    return out[:, :, :width, :height].transpose(0, 3, 2, 1)
