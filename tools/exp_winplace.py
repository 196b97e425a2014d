"""Experiment: window-targeted placement (one-hot sized to the strip).

Production _place_delta builds a (plane_rows, BLK) one-hot and RMWs the
full-height layer plane per slot.  But every placement block belongs to
ONE strip (pack_flat_blocks emits per-(frame, layer, strip) blocks), and
at spp > 1 each strip occupies an nc8-row window at rc offset
win * nc8 — so the one-hot only ever has nonzero rows inside that
window.  This variant passes the per-slot window index like the layer
index (scalar prefetch), builds a (W, BLK) one-hot with LOCAL rc, and
RMWs acc[layer, win*W : win*W + W] — per-slot elementwise work, MXU
MACs, and RMW traffic all shrink by plane_rows / W (2x on the spp2
headline, 8x on flat256's spp8 plane).

Every MXU product is the identical bf16 pair (rows outside the window
were all-zero in the full one-hot), so the output must be BIT-identical.
The round-2/4 decomposition says per-slot cost is the one-hot
select/cast VPU work + the accumulator RMW — both proportional to the
one-hot height — and the spp2 study measured taller planes eating their
own step-count win, so this targets the dominant term directly.

RESULT (round 4): NEGATIVE / noise-level across all three configs —
headline 22.09 -> 21.95 ms (+0.6%), flat256 2.18 -> 2.34 (-7%),
gradients 5.79 -> 5.60 (+3.4%).  The per-STRIP repack the window needs
fragments slots (+15% steps at spp2, +33% at spp8): the pooled
packing's slot fill is worth more than the smaller one-hot.  Bonus
measured fact: the repack is bit-identical in interpret mode but
diverges by 1-4 u8 on chip — the MXU's k-reduction is NOT strictly
sequential, so splitting one row's update run at different block
boundaries re-rounds the winding by f32 ulps.  Any future packer
change that repartitions same-row runs is only tolerance-comparable
on the chip.

Usage: python tools/exp_winplace.py [--config headline|flat256|gradients|textured]
       [--cpu] (tiny interpret-mode bit-identity check)
"""

import argparse
import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import build_scene_edges, _enable_compile_cache
from swf_renderer_tpu.native.bindings import pack_grouped_native
from swf_renderer_tpu.ops.flatblock import (
    BLK, LANE, STRIP_H, _iotas, _on_tpu, _place_delta,
    _resolve_acc_to_u32, plane_geometry, plane_rows_for,
    render_fused_blocksn, strips_per_plane,
)
from swf_renderer_tpu.ops.pipeline import lower_update_lists

CONFIGS = {
    "headline": (60, 4, 1088, 1920),
    "flat256": (60, 4, 256, 256),
    "gradients": (60, 4, 512, 512),
    "textured": (16, 4, 1024, 1024),
    "tiny": (2, 2, 64, 96),
}


def _win_kernel(sidx_ref, flags_ref, *rest, layers: int, ns1: int,
                n_chunks: int, fill_rule: int, group: int,
                plane_rows: int, spp: int, win_rows: int):
    """_fusedn_kernel with window-targeted placement: rest =
    (lay_0..lay_{g-1}, win_0..win_{g-1}, colors, urc, ucm, uval, out,
    acc); urc carries LOCAL rc (window-relative)."""
    lay_refs = rest[:group]
    win_refs = rest[group:2 * group]
    colors_ref = rest[2 * group]
    urc_ref, ucm_ref, uval_ref, out_ref, acc_ref = rest[2 * group + 1:]
    i = pl.program_id(0)
    packed = sidx_ref[i]
    flags = flags_ref[i]
    lane, sub_full = _iotas(plane_rows)
    _, sub_win = _iotas(win_rows)

    @pl.when(jnp.bitwise_and(flags, 1) == 1)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    nblk = jax.lax.shift_right_logical(flags, 2)
    run_all = nblk == 0
    for g in range(group):
        @pl.when(jnp.logical_or(run_all, g < nblk))
        def _place(g=g):
            delta = _place_delta(
                urc_ref[0, :, g * BLK:(g + 1) * BLK],
                ucm_ref[0, g * BLK:(g + 1) * BLK, :],
                uval_ref[0, :, g * BLK:(g + 1) * BLK],
                lane, sub_win)
            layer = lay_refs[g][i]
            win = win_refs[g][i]
            # win * (W//8) * 8 keeps the divisibility prover certain the
            # sublane start is 8-aligned (texfield round-4 lesson).
            start = (win * (win_rows // STRIP_H)) * STRIP_H
            sl = pl.dslice(start, win_rows)
            acc_ref[layer, sl] = acc_ref[layer, sl] + delta

    @pl.when(jnp.bitwise_and(flags, 2) == 2)
    def _resolve():
        _resolve_acc_to_u32(acc_ref, colors_ref, out_ref, packed,
                            layers, ns1, n_chunks, fill_rule,
                            plane_rows=plane_rows, spp=spp)


@functools.partial(jax.jit, static_argnames=(
    "frames", "layers", "n_strips", "n_chunks", "group", "fill_rule",
    "spp", "win_rows"))
def render_win(sidx, flags, lays, wins, urc, ucm, uval, colors, frames,
               layers, n_strips, n_chunks, group=6, fill_rule=0, spp=1,
               win_rows=LANE):
    ng = urc.shape[0]
    ns1 = n_strips + 1
    stride = n_chunks * LANE
    plane_rows = plane_rows_for(n_chunks, spp)
    nsp = 2 + 2 * group + 1  # sidx, flags, lay_g..., win_g..., colors

    def out_index(i, *refs):
        packed = refs[0][i]
        return (packed // (layers * ns1), packed % ns1, 0, 0)

    def in_index(i, *refs):
        return (i, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, 1, group * BLK), in_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group * BLK, 1), in_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, group * BLK), in_index,
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
        _win_kernel, layers=layers, ns1=ns1, n_chunks=n_chunks,
        fill_rule=fill_rule, group=group, plane_rows=plane_rows,
        spp=spp, win_rows=win_rows)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (frames, ns1, spp * STRIP_H, stride), jnp.uint32),
        interpret=not _on_tpu(),
    )(sidx, flags, *(lays[g] for g in range(group)),
      *(wins[g] for g in range(group)), colors, urc, ucm, uval)


def pack_windowed(update_lists, height: int, width: int, group: int,
                  spp: int):
    """Per-STRIP placement blocks with LOCAL rc + a per-slot window id.

    The production packer pools a supergroup's spp strips into shared
    blocks (better slot fill); the windowed kernel needs one window per
    slot, so strips pack separately here — the A/B therefore weighs the
    smaller per-slot work against the extra partial blocks.  Per-row
    update order matches the pooled packing (row-major within each
    strip), so the accumulated winding is bit-identical."""
    f_n = len(update_lists)
    l_n = len(update_lists[0])
    stride, nc, ns = plane_geometry(height, width)
    nsb = -(-ns // spp)
    ns1 = nsb + 1
    nc8 = nc * STRIP_H

    out_sidx, out_flags, out_lays, out_wins = [], [], [], []
    out_rc, out_cm, out_vv = [], [], []
    zero = np.zeros(BLK, np.float32)

    # Pre-split each (f, l) update list by strip.
    split = {}
    for i in range(f_n):
        for j in range(l_n):
            rows, cols, vals = update_lists[i][j]
            keep = cols < stride  # drop col==width overflow like the packer
            rows, cols, vals = rows[keep], cols[keep], vals[keep]
            strip = rows // STRIP_H if len(rows) else rows
            bounds = np.searchsorted(strip, np.arange(ns + 1))
            split[i, j] = (rows, cols, vals, bounds)

    for i in range(f_n):
        for sb in range(nsb):
            blocks = []  # (lay, win, rc, cm, vv)
            for j in range(l_n):
                rows, cols, vals, bounds = split[i, j]
                for s in range(sb * spp, min(ns, (sb + 1) * spp)):
                    lo, hi = int(bounds[s]), int(bounds[s + 1])
                    if hi == lo:
                        continue
                    r = rows[lo:hi]
                    c = cols[lo:hi]
                    v = vals[lo:hi]
                    nb = -(-(hi - lo) // BLK)
                    rc = np.zeros(nb * BLK, np.float32)
                    cm = np.zeros(nb * BLK, np.float32)
                    vv = np.zeros(nb * BLK, np.float32)
                    rc[: hi - lo] = (c // LANE) * STRIP_H + r % STRIP_H
                    cm[: hi - lo] = c % LANE
                    vv[: hi - lo] = v
                    for b in range(nb):
                        sl = slice(b * BLK, (b + 1) * BLK)
                        blocks.append((j, s - sb * spp, rc[sl], cm[sl],
                                       vv[sl]))
            if not blocks:
                blocks.append((0, 0, zero, zero, zero))
            padded = list(blocks)
            while len(padded) % group:
                padded.append(None)
            n_steps = len(padded) // group
            for k in range(n_steps):
                sub = padded[k * group:(k + 1) * group]
                flags = (1 if k == 0 else 0) \
                    | (2 if k == n_steps - 1 else 0) \
                    | (sum(b is not None for b in sub) << 2)
                out_sidx.append((i * l_n) * ns1 + sb)
                out_flags.append(flags)
                out_lays.append([b[0] if b is not None else 0
                                 for b in sub])
                out_wins.append([b[1] if b is not None else 0
                                 for b in sub])
                out_rc.append(np.concatenate(
                    [b[2] if b is not None else zero for b in sub]))
                out_cm.append(np.concatenate(
                    [b[3] if b is not None else zero for b in sub]))
                out_vv.append(np.concatenate(
                    [b[4] if b is not None else zero for b in sub]))
    ng = len(out_sidx)
    ng_pad = ((ng + 255) // 256) * 256
    for _ in range(ng_pad - ng):
        out_sidx.append(nsb)  # frame-0 garbage strip
        out_flags.append(0)
        out_lays.append([0] * group)
        out_wins.append([0] * group)
        out_rc.append(np.zeros(group * BLK, np.float32))
        out_cm.append(np.zeros(group * BLK, np.float32))
        out_vv.append(np.zeros(group * BLK, np.float32))
    return (np.asarray(out_sidx, np.int32),
            np.asarray(out_flags, np.int32),
            np.asarray(out_lays, np.int32).T.copy(),
            np.asarray(out_wins, np.int32).T.copy(),
            np.stack(out_rc)[:, None, :],
            np.stack(out_cm)[:, :, None],
            np.stack(out_vv)[:, None, :],
            nsb, nc, ng)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="headline", choices=CONFIGS)
    ap.add_argument("--group", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args_cli = ap.parse_args()
    _enable_compile_cache()

    frames, layers, height, width = CONFIGS[args_cli.config]
    group = args_cli.group
    _, nc_geo, ns_geo = plane_geometry(height, width)
    spp = strips_per_plane(nc_geo, ns_geo)
    tables, colors = build_scene_edges(frames, layers, height, width)
    ul = lower_update_lists(tables, height, width)
    gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
        ul, height, width, group=group, spp=spp)
    nc8 = nc * STRIP_H
    plane_rows = plane_rows_for(nc, spp)
    wsi, wfl, wla, wwin, wrc, wcm, wvv, wns, wnc, wng = pack_windowed(
        ul, height, width, group, spp)
    assert (wns, wnc) == (ns, nc), (wns, wnc, ns, nc)
    base_args = tuple(jnp.asarray(x)
                      for x in (gsi, gfl, gla, grc, gcm, gvv))
    win_args = (jnp.asarray(wsi), jnp.asarray(wfl), jnp.asarray(wla),
                jnp.asarray(wwin), jnp.asarray(wrc), jnp.asarray(wcm),
                jnp.asarray(wvv))
    colors_j = jnp.asarray(colors)
    px = frames * height * width
    print(json.dumps({"config": args_cli.config, "spp": spp,
                      "plane_rows": plane_rows, "win_rows": nc8,
                      "groups_base": int(len(gsi)),
                      "groups_windowed": int(wng)}), file=sys.stderr)

    out_base = np.asarray(render_fused_blocksn(
        *base_args, colors_j, frames, layers, ns, nc, group=group,
        spp=spp))
    out_win = np.asarray(render_win(
        *win_args, colors_j, frames, layers, ns, nc, group=group,
        spp=spp, win_rows=nc8))
    same = bool(np.array_equal(out_base, out_win))
    bdm = 0
    if not same:
        # Chunked byte-diff: the headline output is ~1 GB, so a whole-
        # array int32 blowup thrashes the 1-core host.
        a8 = out_base.reshape(frames, -1).view(np.uint8)
        b8 = out_win.reshape(frames, -1).view(np.uint8)
        for fi in range(frames):
            d = np.abs(a8[fi].astype(np.int16) - b8[fi].astype(np.int16))
            bdm = max(bdm, int(d.max()))
    del out_base, out_win
    print(json.dumps({"matches": same, "byte_dmax": bdm}), flush=True)
    if args_cli.cpu:
        return

    def timed(run, k):
        @jax.jit
        def loop(uv):
            return jax.lax.fori_loop(0, k, lambda i, a: run(uv, a), 0.0)
        float(loop(jnp.asarray(0.0)))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(loop(jnp.asarray(0.0)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def rep_base(_uv, prev):
        o = render_fused_blocksn(
            base_args[0], base_args[1], base_args[2], base_args[3],
            base_args[4], base_args[5] + prev * 1e-30, colors_j,
            frames, layers, ns, nc, group=group, spp=spp)
        return jnp.sum(o[0, 0].astype(jnp.float32)) * 1e-12

    def rep_win(_uv, prev):
        o = render_win(
            win_args[0], win_args[1], win_args[2], win_args[3],
            win_args[4], win_args[5], win_args[6] + prev * 1e-30,
            colors_j, frames, layers, ns, nc, group=group, spp=spp,
            win_rows=nc8)
        return jnp.sum(o[0, 0].astype(jnp.float32)) * 1e-12

    for name, rep in (("base", rep_base), ("windowed", rep_win)):
        dt = (timed(rep, 9) - timed(rep, 1)) / 8
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 2),
                          "gpx_s": round(px / dt / 1e9, 3),
                          "matches": same, "byte_dmax": bdm}))


if __name__ == "__main__":
    main()
