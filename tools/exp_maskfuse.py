"""Within-epoch A/B: fused mask-group pass vs the round-4 plane-algebra
masked program (perf_pin round-5 policy pin).

Runs bench.bench_masked twice in ONE process/epoch — current production
(2 kernel chains: pre + fused content*mask-over-pre quantize) against
the prior round's 4-pass program — and emits one JSON row per arm plus
the ratio.  Ratio < 1 would mean the fusion regressed on this epoch.

Usage: python tools/exp_maskfuse.py
"""

import json
import sys

sys.path.insert(0, ".")

from bench import _enable_compile_cache, bench_masked  # noqa: E402


def main():
    _enable_compile_cache()
    prior = bench_masked(fused=False, emit_metric=False)
    current = bench_masked(fused=True, emit_metric=False)
    print(json.dumps({"variant": "r4-plane-algebra",
                      "gpx_s": round(prior, 3)}))
    print(json.dumps({"variant": "r5-fused-mask-pass",
                      "gpx_s": round(current, 3)}))
    print(json.dumps({"pin": "mask-fuse",
                      "prior_gpx_s": round(prior, 3),
                      "current_gpx_s": round(current, 3),
                      "ratio_current_over_prior":
                          round(current / prior, 3)}))


if __name__ == "__main__":
    main()
