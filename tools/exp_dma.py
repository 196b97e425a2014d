"""Experiment: fused kernel with EXPLICIT output DMA + grid coarsening.

The windowed output block forces one supergroup per grid step (one out
index per step).  Writing resolved strips to an ANY-memory output via
explicit async copies removes that constraint: a single grid step can
process ``coarse`` packed groups sequentially (zero/place/resolve each),
cutting grid steps by ``coarse`` and batching the input DMA.

Usage: python tools/exp_dma.py  (runs on the attached TPU)
"""

import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import build_scene_edges, _enable_compile_cache
from swf_renderer_tpu.native.bindings import (
    cells_split_delta_native, pack_grouped_native,
)
from swf_renderer_tpu.ops.flatblock import (
    BLK, LANE, STRIP_H, FILL_RULE_NONZERO, _iotas, _place_delta,
    _resolve_strip_packed, plane_rows_for, render_fused_blocksn,
)

N_BUF = 2


def _kernel(sidx_ref, flags_ref, *rest, layers, ns1, n_chunks, group,
            plane_rows, coarse):
    lay_refs = rest[:group * coarse]
    colors_ref = rest[group * coarse]
    urc_ref, ucm_ref, uval_ref, out_ref, acc_ref, buf_ref, rcnt_ref, \
        sem = rest[group * coarse + 1:]
    step = pl.program_id(0)
    lane, sub = _iotas(plane_rows)

    @pl.when(step == 0)
    def _init():
        rcnt_ref[0] = 0

    for cc in range(coarse):
        i = step * coarse + cc
        packed = sidx_ref[i]
        flags = flags_ref[i]

        @pl.when(jnp.bitwise_and(flags, 1) == 1)
        def _zero():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        nblk = jax.lax.shift_right_logical(flags, 2)
        run_all = nblk == 0
        for g in range(group):
            @pl.when(jnp.logical_or(run_all, g < nblk))
            def _place(g=g, cc=cc):
                k = cc * group + g
                delta = _place_delta(
                    urc_ref[0, :, k * BLK:(k + 1) * BLK],
                    ucm_ref[0, k * BLK:(k + 1) * BLK, :],
                    uval_ref[0, :, k * BLK:(k + 1) * BLK],
                    lane, sub)
                layer = lay_refs[k][step]
                acc_ref[layer] = acc_ref[layer] + delta

        @pl.when(jnp.bitwise_and(flags, 2) == 2)
        def _resolve(cc=cc, packed=packed):
            f = packed // (layers * ns1)
            s = packed % ns1
            pk = _resolve_strip_packed(
                lambda lyr: acc_ref[lyr],
                lambda lyr, c: colors_ref[f, lyr, c],
                layers=layers, fill_rule=FILL_RULE_NONZERO,
                prefixed=True, chain=False, plane_rows=plane_rows)
            rc = rcnt_ref[0]
            slot = jax.lax.rem(rc, N_BUF)
            # Wait out the copy that previously used this slot.
            @pl.when(rc >= N_BUF)
            def _wait():
                pltpu.make_async_copy(
                    buf_ref.at[slot], out_ref.at[0, 0],
                    sem.at[slot]).wait()
            for j in range(n_chunks):
                buf_ref[slot, :, j * LANE:(j + 1) * LANE] = (
                    pk[j * STRIP_H:(j + 1) * STRIP_H, :])
            pltpu.make_async_copy(
                buf_ref.at[slot], out_ref.at[f, s], sem.at[slot]).start()
            rcnt_ref[0] = rc + 1

    # Drain on the last step.
    @pl.when(step == pl.num_programs(0) - 1)
    def _drain():
        rc = rcnt_ref[0]
        for slot in range(N_BUF):
            @pl.when(slot < rc)
            def _w(slot=slot):
                pltpu.make_async_copy(
                    buf_ref.at[slot], out_ref.at[0, 0],
                    sem.at[slot]).wait()


@functools.partial(jax.jit, static_argnames=(
    "frames", "layers", "n_strips", "n_chunks", "group", "coarse"))
def run_variant(sidx, flags, lays, urc, ucm, uval, colors,
                frames, layers, n_strips, n_chunks, group, coarse):
    ng = urc.shape[0]
    assert ng % coarse == 0
    ns1 = n_strips + 1
    stride = n_chunks * LANE
    plane_rows = plane_rows_for(n_chunks)
    nsp = 2 + group * coarse + 1

    def in_index(i, *refs):
        return (i, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(ng // coarse,),
        in_specs=[
            pl.BlockSpec((1, 1, coarse * group * BLK), in_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, coarse * group * BLK, 1), in_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, coarse * group * BLK), in_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((layers, plane_rows, LANE), jnp.float32),
            pltpu.VMEM((N_BUF, STRIP_H, stride), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
    )
    kernel = functools.partial(
        _kernel, layers=layers, ns1=ns1, n_chunks=n_chunks, group=group,
        plane_rows=plane_rows, coarse=coarse)
    lays_c = lays.reshape(group, ng // coarse, coarse)
    lays_list = [lays_c[g, :, c] for c in range(coarse)
                 for g in range(group)]
    # reorder: k = cc*group + g indexes lays_list
    urc_c = urc.reshape(ng // coarse, 1, coarse * group * BLK)
    ucm_c = ucm.reshape(ng // coarse, coarse * group * BLK, 1)
    uval_c = uval.reshape(ng // coarse, 1, coarse * group * BLK)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (frames, ns1, STRIP_H, stride), jnp.uint32),
    )(sidx, flags, *lays_list, colors, urc_c, ucm_c, uval_c)


def main():
    _enable_compile_cache()
    frames, layers, height, width = 60, 4, 1088, 1920
    tables, colors = build_scene_edges(frames, layers, height, width)
    ul = [[cells_split_delta_native(t, height, width) for t in ft]
          for ft in tables]
    colors_j = jnp.asarray(colors)
    px = frames * height * width
    group = 6
    gsi, gfl, gla, grc, gcm, gvv, ns, nc = pack_grouped_native(
        ul, height, width, group=group)
    args = tuple(jnp.asarray(x) for x in (gsi, gfl, gla, grc, gcm, gvv))

    ref = np.asarray(render_fused_blocksn(
        *args, colors_j, frames, layers, ns, nc, group=group))[:, :ns]

    for coarse in (1, 2, 4):
        def one(uv, prev):
            out = run_variant(
                args[0], args[1], args[2], args[3], args[4],
                uv + prev * 1e-30, colors_j, frames, layers, ns, nc,
                group, coarse)
            return jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12

        def timed(k):
            @jax.jit
            def run(uv):
                return jax.lax.fori_loop(0, k,
                                         lambda i, a: one(uv, a), 0.0)
            float(run(args[5]))
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                float(run(args[5]))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        out = np.asarray(run_variant(
            *args, colors_j, frames, layers, ns, nc, group,
            coarse))[:, :ns]
        same = bool(np.array_equal(out, ref))
        dt = (timed(9) - timed(1)) / 8
        print(json.dumps({"coarse": coarse, "steps": len(gsi) // coarse,
                          "ms": round(dt * 1e3, 2),
                          "gpx_s": round(px / dt / 1e9, 3),
                          "matches": same}))


if __name__ == "__main__":
    main()
