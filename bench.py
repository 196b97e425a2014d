"""Benchmark harness.

Headline workload (BASELINE.md): multi-layer 1080p, 60-frame batch, solid
fills — sustained fill rate in Gpx/s on one chip.  Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

``vs_baseline`` is the ratio against the 5 Gpx/s north-star target from
/root/repo/BASELINE.json (the reference publishes no numbers of its own).

Usage:
    python bench.py            # full 60x1080p benchmark
    python bench.py --smoke    # small, fast smoke run (also used by /verify)
"""

import json
import sys
import time

import numpy as np

TARGET_GPX_S = 5.0


def build_workload(frames: int, layers: int, height: int, width: int,
                   edges_per_draw: int = 64, seed: int = 7):
    """Random multi-layer polygon scenes (edge tables padded to 128)."""
    rng = np.random.default_rng(seed)
    e_pad = max(128, ((edges_per_draw + 127) // 128) * 128)
    edges_t = np.zeros((frames, layers, 4, e_pad), np.float32)
    colors = np.zeros((frames, layers, 4), np.float32)
    n_pts = edges_per_draw - 1
    for i in range(frames):
        for j in range(layers):
            pts = rng.uniform(0, (width, height), size=(n_pts, 2))
            closed = np.concatenate([pts, pts[:1]]).astype(np.float32)
            seg = np.concatenate([closed[:-1], closed[1:]], axis=1)
            edges_t[i, j, :, : len(seg)] = seg.T
            colors[i, j] = rng.uniform(0.1, 1.0, size=4)
    return edges_t, colors


def main() -> None:
    smoke = "--smoke" in sys.argv

    import jax

    from swf_renderer_tpu.ops.pipeline import render_solid_batch

    if smoke:
        frames, layers, height, width, reps = 2, 2, 64, 256, 3
    else:
        frames, layers, height, width, reps = 60, 4, 1088, 1920, 5

    edges_t, colors = build_workload(frames, layers, height, width)
    edges_t = jax.device_put(edges_t)
    colors = jax.device_put(colors)

    # Warm up / compile.
    out = render_solid_batch(edges_t, colors, height, width)
    out.block_until_ready()

    # Block per rep: with async dispatch (and the axon remote runtime), a
    # single trailing block under-reports wall time dramatically.
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = render_solid_batch(edges_t, colors, height, width)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)

    pixels = frames * height * width
    gpx_s = pixels / dt / 1e9
    result = {
        "metric": "fill_rate_1080p60_multilayer",
        "value": round(gpx_s, 4),
        "unit": "Gpx/s",
        "vs_baseline": round(gpx_s / TARGET_GPX_S, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
