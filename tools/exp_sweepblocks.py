"""Round-4 study: mid-width sweep column-block layout (wblock / bps).

512^2 sweeps ran as ONE pair of 256-wide column blocks — below the
nb >= 4 gate the transition-free skip was dead, so every (chunk, layer)
pair rasterized heavy on both blocks.  This harness measures layout
candidates with INTERLEAVED ROUNDS (variants alternate within each
round so the shared chip's epoch drift cancels — the fori_loop chained
fit is unusable here: XLA stack-allocates the sweep's whole (F, WP, HP)
output in scoped VMEM and OOMs), on a 480-frame tiled track so each
call carries ~100 ms of signal over the ~26 ms tunnel floor.

Committed result (PERF.md round 4): 480-frame totals ~156 ms at
wblock 256/bps 1 (old production), ~117 at 128/2, ~100 at 64/4 —
production now halves wblock (floor 64) until nb >= 8 and allows bps 4
for hp <= 640.  Cross-layout outputs differ by <= 4 premul-u8 at ~6 of
15.7M px (skip prefix-plane f32 accumulation order; the sweep contracts
are tolerance-gated).

Run: python tools/exp_sweepblocks.py   (needs the TPU)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    from bench import _enable_compile_cache, anim_scene

    _enable_compile_cache()
    import jax.numpy as jnp

    from swf_renderer_tpu.ops.transform import (
        affine_pieces, render_affine_sweep,
    )

    h = w = 512
    frames = 60
    tables, colors, mats = anim_scene(h, w, frames)
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    fargs = tuple(jnp.asarray(x) for x in (tab, subxy, colarr))

    mult = 8
    big = np.concatenate([mats + np.float32(k) * 1e-9
                          for k in range(mult)])

    def decode(p):
        p = p[:, :w, :h]
        return np.stack([(p >> s) & 0xFF for s in (0, 8, 16, 24)],
                        -1).astype(np.int32)

    base = decode(np.asarray(render_affine_sweep(
        jnp.asarray(mats), *fargs, h, w, wblock=256, blocks_per_step=1)))

    variants = {"256/1": (256, 1), "128/2": (128, 2), "64/4": (64, 4)}
    fns = {}
    for name, (wb, bps) in variants.items():
        v = decode(np.asarray(render_affine_sweep(
            jnp.asarray(mats), *fargs, h, w, wblock=wb,
            blocks_per_step=bps)))
        d = np.abs(v - base)
        print(json.dumps({
            "variant": name, "max_diff_premul_u8": int(d.max()),
            "n_diff_px": int((d.max(-1) > 0).sum())}), flush=True)

        def mk(wb=wb, bps=bps):
            def once(i):
                vm = jnp.asarray(big + np.float32(i) * 1e-12)
                t0 = time.perf_counter()
                out = render_affine_sweep(vm, *fargs, h, w, wblock=wb,
                                          blocks_per_step=bps)
                int(jnp.sum(out[:, ::64, ::64].astype(jnp.uint32)))
                return time.perf_counter() - t0
            return once

        fns[name] = mk()
        fns[name](0)  # compile

    for rnd in range(5):
        row = {"round": rnd}
        for name in variants:
            row[name] = round(min(fns[name](i)
                                  for i in range(1, 4)) * 1e3, 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
