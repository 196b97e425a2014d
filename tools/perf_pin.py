"""Cross-round performance pin: within-epoch A/B of this round's policy
defaults against the previous round's behavior (VERDICT r3 weak #7).

Chip-shared epochs swing +-10-15%, so absolute bench numbers cannot
detect cross-round regressions smaller than the noise.  This tool runs
the committed policy-ablation harnesses — each measures the CURRENT
production policy and its PRIOR-round equivalent inside one epoch — and
records the ratios as a per-round artifact (PERFPIN_r{N}.json).  A
ratio << 1 means this round's policy change regressed that config on
today's epoch regardless of what the absolute bench number says.

Pinned policies (each the headline lever of its config this round):

  flat256 / gradients / headline  plane-stride shrink (exp_stride)
  anim 512^2                      wblock 64 / bps 4 vs 256/1 (exp_sweepblocks)
  anim1080                        chunk-index lists vs static loop;
                                  wblock 64 + e_chunk 128 retune
                                  (exp_sweep1080 --pin)
                                  (exp_sweepcost --pin)

Run (real TPU, strictly serial — never overlap TPU jobs):
  python tools/perf_pin.py --out PERFPIN_r04.json [--fast]
`--fast` runs only the headline stride pin.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import time

PY = sys.executable


def _run(cmd):
    """Run a harness, stream its output, return parsed JSON lines."""
    print(f"[perf_pin] $ {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True)
    rows = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
        print(f"  {line}", flush=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-2000:])
        raise RuntimeError(f"{cmd} failed rc={proc.returncode}")
    print(f"[perf_pin] done in {time.time() - t0:.0f}s", flush=True)
    return rows


def pin_stride(configs):
    """exp_stride emits per-variant gpx_s rows + a speedup row."""
    rows = _run([PY, "tools/exp_stride.py", *configs])
    out = {}
    gpx = {}
    for r in rows:
        if "variant" in r:
            gpx.setdefault(r["config"], {})[r["variant"]] = r["gpx_s"]
        elif "speedup" in r:
            out[f"stride:{r['config']}"] = {
                "prior_gpx_s": gpx[r["config"]]["old"],
                "current_gpx_s": gpx[r["config"]]["new"],
                "ratio_current_over_prior": r["speedup"],
            }
    return out


def pin_sweepblocks():
    """exp_sweepblocks emits interleaved-round ms rows per layout."""
    rows = _run([PY, "tools/exp_sweepblocks.py"])
    per = {}
    for r in rows:
        if "round" in r:
            for k, v in r.items():
                if k != "round":
                    per.setdefault(k, []).append(v)
    if not per:
        return {}
    med = {k: statistics.median(v) for k, v in per.items()}
    prior, cur = med.get("256/1"), med.get("64/4")
    return {"sweep-blocks:anim512": {
        "prior_ms": prior, "current_ms": cur,
        "ratio_current_over_prior": round(prior / cur, 3)
        if prior and cur else None,
        "medians_ms": med,
    }}


def pin_chunk_list():
    rows = _run([PY, "tools/exp_sweepcost.py", "--config", "anim1080",
                 "--pin"])
    ms = {r["variant"]: r["ms_per_frame"] for r in rows if "variant" in r}
    prior, cur = ms.get("r3-static-loop"), ms.get("production")
    if prior is None or cur is None:
        return {}
    return {"chunk-list:anim1080": {
        "prior_ms_per_frame": prior, "current_ms_per_frame": cur,
        "ratio_current_over_prior": round(prior / cur, 3),
    }}


def pin_sweep_retune():
    """exp_sweep1080 --pin: production auto layout (wblock 64 / bps 3 /
    e_chunk 128 under chunk lists) vs the pre-retune round-4 layout."""
    rows = _run([PY, "tools/exp_sweep1080.py", "--pin"])
    per = {}
    for r in rows:
        if "round" in r:
            for k, v in r.items():
                if k != "round":
                    per.setdefault(k, []).append(v)
    if "production" not in per or "prior(128/3/ec256)" not in per:
        return {}  # an arm failed to compile/run: drop the pin, don't
                   # emit Infinity into the artifact
    prior = min(per["prior(128/3/ec256)"])
    cur = min(per["production"])
    return {"sweep-retune:anim1080": {
        "prior_ms_120f": prior, "current_ms_120f": cur,
        "ratio_current_over_prior": round(prior / cur, 3),
    }}


def pin_morph16_stability():
    """Round 5 (VERDICT r4 #9): the morph16 metric must not swing 2x
    across epochs.  Three consecutive full bench runs of the wide
    (k0=25, k1=225) chained fit; the band ratio (max/min) is the pin —
    the round-4 narrow fit swung 15-35 Gpx/s and once went negative."""
    vals = []
    for _ in range(3):
        rows = _run([PY, "bench.py", "--config", "morph16"])
        for r in rows:
            if r.get("metric") == "morph16_batch_sustained":
                vals.append(r["value"] / 1e3)  # Mpx/s -> Gpx/s
    if len(vals) < 3 or min(vals) <= 0:
        return {}
    return {"morph16-stability": {
        "gpx_s_runs": [round(v, 2) for v in vals],
        "band_max_over_min": round(max(vals) / min(vals), 3),
    }}


def pin_mask_fuse():
    """Round 5: fused mask-group kernel pass vs the round-4 4-pass
    plane-algebra program (tools/exp_maskfuse.py, one epoch)."""
    rows = _run([PY, "tools/exp_maskfuse.py"])
    for r in rows:
        if r.get("pin") == "mask-fuse":
            return {"mask-fuse:masked1080": {
                "prior_gpx_s": r["prior_gpx_s"],
                "current_gpx_s": r["current_gpx_s"],
                "ratio_current_over_prior":
                    r["ratio_current_over_prior"],
            }}
    return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="write the pin artifact JSON here")
    ap.add_argument("--fast", action="store_true",
                    help="headline stride pin only")
    args = ap.parse_args()

    results = {}
    if args.fast:
        results.update(pin_stride(["headline"]))
    else:
        results.update(pin_stride(["flat256", "gradients", "headline"]))
        results.update(pin_sweepblocks())
        results.update(pin_chunk_list())
        results.update(pin_sweep_retune())
        results.update(pin_mask_fuse())
        results.update(pin_morph16_stability())

    regressions = [k for k, v in results.items()
                   if (v.get("ratio_current_over_prior") or 1.0) < 0.95]
    artifact = {
        "tool": "tools/perf_pin.py",
        "note": "within-epoch A/B: current policy vs previous-round "
                "policy; ratio < 1 = this round's policy is slower on "
                "this epoch",
        "results": results,
        "regressions": regressions,
    }
    print(json.dumps(artifact, indent=2), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=2)
            f.write("\n")
        print(f"[perf_pin] wrote {args.out}", flush=True)
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
