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
    """Each layer is a field of small convex-ish polygons spread over the
    frame — a realistic vector scene (spatially local edges), pre-split for
    the banded kernel."""
    from swf_renderer_tpu.models.geometry import split_edges_y

    rng = np.random.default_rng(seed)
    tables = []
    colors = np.zeros((frames, layers, 4), np.float32)
    n_shapes = max(1, edges_per_draw // 8)
    radius = max(8.0, min(height, width) / 12.0)
    for i in range(frames):
        frame_tables = []
        for j in range(layers):
            segs = []
            for _ in range(n_shapes):
                cx = rng.uniform(0, width)
                cy = rng.uniform(0, height)
                ang = np.sort(rng.uniform(0, 2 * np.pi, 8))
                r = rng.uniform(0.4, 1.0, 8) * radius
                pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], 1)
                closed = np.concatenate([pts, pts[:1]]).astype(np.float32)
                segs.append(np.concatenate([closed[:-1], closed[1:]], axis=1))
            frame_tables.append(split_edges_y(np.concatenate(segs)))
            colors[i, j] = rng.uniform(0.1, 1.0, size=4)
        tables.append(frame_tables)

    max_e = max(t.shape[0] for ft in tables for t in ft)
    e_pad = max(128, ((max_e + 127) // 128) * 128)
    edges_t = np.zeros((frames, layers, 4, e_pad), np.float32)
    for i in range(frames):
        for j in range(layers):
            t = tables[i][j]
            edges_t[i, j, :, : t.shape[0]] = t.T
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
