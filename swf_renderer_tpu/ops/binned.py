"""Fully-fused binned scanline rendering: no scatter at all.

SUPERSEDED by ops/flatblock.py (the flat-block pipeline), which fixes this
kernel's two structural costs — every bin paying the GLOBAL max occupancy
(8-40x slot waste on real scenes) and (8, Kc) matmuls at 6% MXU row
utilization — and reaches 5.2 Gpx/s where this design measured 0.75.
Kept as the first scatter-free formulation and for its tests.

The scatter (`segment_sum` into dense winding planes) dominates the fused
pipeline (~60% of frame time at 1080p).  This pipeline removes it:

1. **Host binning** — the coalesced delta updates (native splitter output)
   are binned by (8-row strip, 128-column chunk) and padded to a static
   per-chunk capacity.  Three layouts are emitted so the kernel never needs
   a lane<->sublane transpose: values and local rows as lane vectors, local
   columns as sublane vectors.
2. **Kernel** — for each (frame, strip) and each 128-column chunk, the
   chunk's winding delta materializes as an MXU product

       delta(8, 128) = A(8, Kc) @ B(Kc, 128)
       A[r, k] = val_k * [row_k == r]      (built from lane vectors)
       B[k, c] = [col_k == c]              (built from a sublane vector)

   which feeds straight into the running-carry prefix sum (another MXU
   matmul with an upper-triangular ones matrix), then the fill rule and
   premultiplied alpha-over compositing — one VMEM residency for the whole
   resolve with zero HBM round trips for intermediate planes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .coverage import FILL_RULE_NONZERO, _on_tpu

STRIP_H = 8
LANE = 128


def bin_updates(update_lists, height: int, width: int,
                cap_multiple: int = 8):
    """Bin per-draw (rows, cols, vals) updates by (strip, chunk).

    ``update_lists``: [frames][layers] of (rows, cols, vals) arrays (the
    native splitter's delta updates; cols in [0, width+1]).

    Returns (urow, uval, ucol, kc, n_strips, n_chunks), each table of
    shape (F, L, NS, NCHUNK, Kc) (lane-major last dim), with local row in
    [0, 8) and local col in [0, 128).  Padding entries carry val 0.
    """
    f = len(update_lists)
    l = len(update_lists[0])
    stride = ((width + 1 + LANE - 1) // LANE) * LANE
    n_strips = -(-height // STRIP_H)
    n_chunks = stride // LANE

    binned = {}
    kc = 1
    for i in range(f):
        for j in range(l):
            rows, cols, vals = update_lists[i][j]
            strip = rows // STRIP_H
            chunk = cols // LANE
            # Drop updates beyond the padded stride (can't happen by
            # construction, but keep the invariant explicit).
            key = strip.astype(np.int64) * n_chunks + chunk
            order = np.argsort(key, kind="stable")
            key = key[order]
            counts = np.bincount(key, minlength=n_strips * n_chunks)
            kc = max(kc, int(counts.max()) if counts.size else 1)
            binned[(i, j)] = (
                rows[order], cols[order], vals[order], key, counts
            )
    kc = ((kc + cap_multiple - 1) // cap_multiple) * cap_multiple

    urow = np.zeros((f, l, n_strips, n_chunks, kc), np.float32)
    uval = np.zeros((f, l, n_strips, n_chunks, kc), np.float32)
    ucol = np.zeros((f, l, n_strips, n_chunks, kc), np.float32)
    for (i, j), (rows, cols, vals, key, counts) in binned.items():
        offsets = np.zeros(n_strips * n_chunks + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        # Slot index of each update within its bin.
        slot = np.arange(len(key)) - offsets[key]
        bs = key // n_chunks
        bc = key % n_chunks
        urow[i, j, bs, bc, slot] = rows % STRIP_H
        ucol[i, j, bs, bc, slot] = cols % LANE
        uval[i, j, bs, bc, slot] = vals
    return urow, uval, ucol, kc, n_strips, n_chunks


def _binned_kernel(colors_ref, urow_ref, uval_ref, ucol_ref, out_ref, *,
                   fill_rule: int, n_layers: int, n_chunks: int, kc: int):
    # Blocks: colors (1, L, 4) SMEM; urow/uval (1, L, NCHUNK, Kc) VMEM;
    # ucol (1, L, NCHUNK*Kc, 1) VMEM; out (1, 4, 8, S) VMEM.
    row_ids8 = jax.lax.broadcasted_iota(jnp.int32, (STRIP_H, 1), 0).astype(
        jnp.float32
    )
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0).astype(
        jnp.float32
    )
    tri_rows = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    tri_cols = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    tri = (tri_rows <= tri_cols).astype(jnp.float32)

    # Chunks outer, layers inner: each 128-column chunk is fully resolved
    # (winding -> fill rule -> composite) and written out before the next,
    # so the only cross-chunk state is one (8, 1) carry per layer — this
    # keeps the kernel comfortably inside the VMEM budget.
    carries = [jnp.zeros((STRIP_H, 1), jnp.float32) for _ in range(n_layers)]
    for ch in range(n_chunks):
        r = jnp.zeros((STRIP_H, LANE), jnp.float32)
        g = jnp.zeros((STRIP_H, LANE), jnp.float32)
        b = jnp.zeros((STRIP_H, LANE), jnp.float32)
        a = jnp.zeros((STRIP_H, LANE), jnp.float32)
        for layer in range(n_layers):
            vrow = urow_ref[0, layer, 0, ch, :][None, :]  # (1, Kc) lanes
            vval = uval_ref[0, layer, 0, ch, :][None, :]
            vcol = ucol_ref[0, layer, 0, ch, :][None, :]
            # A[r, k] = val_k if row_k == r  — (8, Kc)
            amat = jnp.where(vrow == row_ids8, vval, 0.0)
            # P[c, k] = 1 if col_k == c — (128, Kc), built purely from lane
            # vectors against a sublane iota (no data transposes), then
            # contracted as delta = A @ P^T on the MXU.
            pmat = (vcol == sub_ids).astype(jnp.float32)
            # precision=HIGHEST: the MXU's default bf16 passes round the
            # f32 update values; winding must be exact (empty pixels would
            # otherwise pick up ~0.008 of noise -> visible alpha).
            delta = jax.lax.dot_general(
                amat, pmat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            winding = (
                jnp.dot(delta, tri, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                + carries[layer]
            )
            carries[layer] = winding[:, LANE - 1:]

            if fill_rule == FILL_RULE_NONZERO:
                cov = jnp.minimum(jnp.abs(winding), 1.0)
            else:
                m = jnp.mod(winding, 2.0)
                cov = 1.0 - jnp.abs(m - 1.0)

            ca = colors_ref[0, layer, 3] * cov
            keep = 1.0 - ca
            r = colors_ref[0, layer, 0] * ca + r * keep
            g = colors_ref[0, layer, 1] * ca + g * keep
            b = colors_ref[0, layer, 2] * ca + b * keep
            a = ca + a * keep

        sl = slice(ch * LANE, (ch + 1) * LANE)
        out_ref[0, 0, 0, :, sl] = r
        out_ref[0, 0, 1, :, sl] = g
        out_ref[0, 0, 2, :, sl] = b
        out_ref[0, 0, 3, :, sl] = a


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "fill_rule", "interpret"),
)
def render_scanline_binned(
    urow: jax.Array,  # (F, L, NS, NCHUNK, Kc) f32
    uval: jax.Array,  # (F, L, NS, NCHUNK, Kc) f32
    ucol: jax.Array,  # (F, L, NS, NCHUNK, Kc) f32
    colors: jax.Array,    # (F, L, 4) f32
    height: int,
    width: int,
    fill_rule: int = FILL_RULE_NONZERO,
    interpret: bool = None,
) -> jax.Array:
    """Scatter-free fused pipeline from binned updates.
    Returns (F, H, W, 4) uint8 frames."""
    from .composite import premul_to_straight_u8

    if interpret is None:
        interpret = not _on_tpu()
    f, l, n_strips, n_chunks, kc = urow.shape
    stride = n_chunks * LANE

    kernel = functools.partial(
        _binned_kernel,
        fill_rule=fill_rule,
        n_layers=l,
        n_chunks=n_chunks,
        kc=kc,
    )
    frames_pm = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (f, n_strips, 4, STRIP_H, stride), jnp.float32
        ),
        grid=(f, n_strips),
        in_specs=[
            pl.BlockSpec((1, l, 4), lambda fi, s: (fi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, l, 1, n_chunks, kc),
                         lambda fi, s: (fi, 0, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, 1, n_chunks, kc),
                         lambda fi, s: (fi, 0, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, 1, n_chunks, kc),
                         lambda fi, s: (fi, 0, s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 4, STRIP_H, stride), lambda fi, s: (fi, s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(colors, urow, uval, ucol)
    # (F, NS, 4, 8, S) -> (F, H, S, 4) -> crop
    frames_pm = jnp.moveaxis(frames_pm, 2, -1).reshape(
        f, n_strips * STRIP_H, stride, 4
    )[:, :height, :width, :]
    return premul_to_straight_u8(frames_pm)