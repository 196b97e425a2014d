"""Round-4 follow-up: 1080p sweep layout NOW THAT chunk lists exist.

The round-3 granularity ablation (wblock 64 is 1.8-2.1 ms/frame vs 128's
1.33) predates the chunk-index-list walk, which removed the per-(block,
chunk, layer) branch cost that made fine blocks lose.  With the walk in
production, finer blocks buy better skip precision nearly for free, and
the round-3 bps-4 scoped-VMEM OOM (resolve temporaries scale with
wblock) may not apply at wblock 64.  Interleaved-rounds A/B (epoch
drift cancels), 120-frame track at 1088x1920.

Run: python tools/exp_sweep1080.py   (needs the TPU)
RESULT: see PERF.md (round 4).
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

    h, w = 1088, 1920
    if "--512" in sys.argv:
        h = w = 512
    frames = 60
    tables, colors, mats = anim_scene(h, w, frames)
    tab, subxy, colarr = affine_pieces(tables, colors, mats)
    fargs = tuple(jnp.asarray(x) for x in (tab, subxy, colarr))

    # Amortize the ~26 ms tunnel floor: these are single-dispatch
    # timings (the fori-chained fit stack-allocates the sweep output in
    # scoped VMEM and OOMs — PERF.md round 3), so the track must be
    # long enough that the floor is a small fraction (~7% at 1080p
    # mult 4).  Ratios still UNDERSTATE device-side deltas slightly.
    mult = 4 if h > 600 else 8
    big = np.concatenate([mats + np.float32(k) * 1e-9
                          for k in range(mult)])

    def decode(p):
        p = p[:, :w, :h]
        return np.stack([(p >> s) & 0xFF for s in (0, 8, 16, 24)],
                        -1).astype(np.int16)

    base = decode(np.asarray(render_affine_sweep(
        jnp.asarray(mats), *fargs, h, w)))  # production auto layout

    variants = {"auto": {}, "64/3": dict(wblock=64, blocks_per_step=3),
                "64/4": dict(wblock=64, blocks_per_step=4),
                "128/4": dict(wblock=128, blocks_per_step=4)}
    if "--pin" in sys.argv:
        # perf_pin mode: production auto vs the pre-retune round-4
        # layout (wblock 128 / bps 3 / e_chunk 256).
        variants = {"prior(128/3/ec256)": dict(
                        wblock=128, blocks_per_step=3, e_chunk=256),
                    "production": {}}
    elif "--fine" in sys.argv:
        # Third pass: finer blocks under ec128 + chunk lists.
        variants = {"auto": {},
                    "wb64/bps3": dict(wblock=64, blocks_per_step=3),
                    "wb32/bps4": dict(wblock=32, blocks_per_step=4),
                    "wb32/bps8": dict(wblock=32, blocks_per_step=8)}
    elif "--echunk" in sys.argv:
        # Second pass: e_chunk under the retuned block layout (the
        # chunk-list walk changed chunk-size economics too).
        # Explicit on BOTH arms: auto now resolves to ec128 under the
        # list walk, so an {} arm would compare ec128 against itself.
        variants = {"ec256": dict(e_chunk=256),
                    "ec128": dict(e_chunk=128),
                    "ec64": dict(e_chunk=64),
                    "ec512": dict(e_chunk=512)}
    fns = {}
    for name, kw in variants.items():
        try:
            v = decode(np.asarray(render_affine_sweep(
                jnp.asarray(mats), *fargs, h, w, **kw)))
        except Exception as exc:  # noqa: BLE001 — report VMEM OOMs
            print(json.dumps({"variant": name,
                              "error": str(exc)[:160]}), flush=True)
            continue
        d = np.abs(v - base)
        print(json.dumps({
            "variant": name, "max_diff_premul_u8": int(d.max()),
            "n_diff_px": int((d.max(-1) > 0).sum())}), flush=True)
        del v, d

        def mk(kw=kw):
            def once(i):
                vm = jnp.asarray(big + np.float32(i) * 1e-12)
                t0 = time.perf_counter()
                out = render_affine_sweep(vm, *fargs, h, w, **kw)
                int(jnp.sum(out[:, ::64, ::64].astype(jnp.uint32)))
                return time.perf_counter() - t0
            return once

        fns[name] = mk()
        fns[name](0)  # compile

    rounds = 3 if "--pin" in sys.argv else 5
    for rnd in range(rounds):
        row = {"round": rnd}
        for name in fns:
            row[name] = round(min(fns[name](i)
                                  for i in range(1, 4)) * 1e3, 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
