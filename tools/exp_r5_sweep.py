"""Round-5 layout-knob re-sweep on the anim configs.

PERF.md's round-4 lesson: granularity optima are regime-conditional —
re-sweep (e_chunk, wblock, blocks_per_step) after control-flow changes
and across rounds.  This drives tools/exp_sweepcost.measure over a
small grid on the real bench scenes and prints one JSON line per
config (ms/frame, lower is better).

Usage: python tools/exp_r5_sweep.py [--config anim1080|anim512]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from bench import _enable_compile_cache  # noqa: E402
from exp_sweepcost import measure  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="anim512",
                    choices=["anim1080", "anim512"])
    args = ap.parse_args()
    _enable_compile_cache()
    h, w = (1088, 1920) if args.config == "anim1080" else (512, 512)
    frames = 60
    if args.config == "anim512":
        grid = [
            ("prod (auto: wb64 ec128 bps4)", dict(e_chunk=None)),
            ("wb64 ec64 bps4", dict(e_chunk=64, wblock=64,
                                    blocks_per_step=4)),
            ("wb64 ec128 bps8", dict(e_chunk=128, wblock=64,
                                     blocks_per_step=8)),
            ("wb32 ec128 bps8", dict(e_chunk=128, wblock=32,
                                     blocks_per_step=8)),
            ("wb64 ec256 bps4", dict(e_chunk=256, wblock=64,
                                     blocks_per_step=4)),
            ("wb128 ec128 bps2", dict(e_chunk=128, wblock=128,
                                      blocks_per_step=2)),
        ]
    else:
        grid = [
            ("prod (auto: wb64 ec128 bps3)", dict(e_chunk=None)),
            ("wb64 ec64 bps3", dict(e_chunk=64, wblock=64,
                                    blocks_per_step=3)),
            ("wb64 ec128 bps5", dict(e_chunk=128, wblock=64,
                                     blocks_per_step=5)),
            ("wb64 ec128 bps2", dict(e_chunk=128, wblock=64,
                                     blocks_per_step=2)),
            ("wb32 ec128 bps3", dict(e_chunk=128, wblock=32,
                                     blocks_per_step=3)),
        ]
    for label, kw in grid:
        e_chunk = kw.pop("e_chunk", None)
        wblock = kw.pop("wblock", None)
        try:
            dt = measure(h, w, frames, e_chunk, wblock, **kw)
            print(json.dumps({"config": args.config, "label": label,
                              "ms_per_frame": round(dt * 1e3, 4)}),
                  flush=True)
        except Exception as exc:  # noqa: BLE001 — OOM layouts report
            print(json.dumps({"config": args.config, "label": label,
                              "error": f"{type(exc).__name__}: "
                                       f"{str(exc)[:160]}"}), flush=True)


if __name__ == "__main__":
    main()
