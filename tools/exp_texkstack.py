"""Round-4 texfield A/B: row-window margin fix + K-stacked 2-dot.

Measures the per-frame cost of ``bitmap_field_planes`` on the animtex
workload (64x64 repeat texture, rotating 512^2 frames) for the three
production candidates, within ONE epoch so the shared chip's
epoch-to-epoch swing (PERF.md methodology) cancels:

  a) ywin=None, kstack=False — production as of the round-4 margin
     regression (the 16-alignment margins disabled the window: span
     24.4 + 36 > 64 rows; PERF.md round 4 cont.),
  b) ywin=48 (mod-then-align margin 21), kstack=False,
  c) ywin=48, kstack=True — the committed production default: the two
     split3 correction dots ride one K=2*tw_pad dot in the K-tile
     padding a tw<=64 texture wastes anyway.

Run: python tools/exp_texkstack.py   (needs the TPU)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    from bench import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from swf_renderer_tpu.ops.texfield import auto_ywin, bitmap_field_planes

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (64, 64, 4)).astype(np.uint8)
    s = 96.0 / 512.0
    f = 60
    ths = np.linspace(0.0, 2 * np.pi, f, endpoint=False)
    invs = np.stack([
        [s * np.cos(t), s * np.sin(t), -s * np.sin(t), s * np.cos(t),
         3.7, -11.2] for t in ths]).astype(np.float32)
    yw = auto_ywin(invs, 64, repeating=True)
    print(json.dumps({"ywin": yw, "frames": f}), flush=True)

    def run(tag, ywin, kstack):
        kw = dict(supersample=2, repeating=True, smoothed=True,
                  edge_mode="flash", interpret=False, ywin=ywin,
                  kstack=kstack)
        iv = jnp.asarray(invs)

        def once():
            out = bitmap_field_planes(img, iv, 512, 512, **kw)
            return float(jnp.sum(out[:, ::64, ::64]))

        once()  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            once()
            ts.append(time.perf_counter() - t0)
        # two-point frame fit: 60 frames vs 12 frames
        iv12 = jnp.asarray(invs[:12])

        def once12():
            out = bitmap_field_planes(img, iv12, 512, 512, **kw)
            return float(jnp.sum(out[:, ::64, ::64]))

        once12()
        ts12 = []
        for _ in range(5):
            t0 = time.perf_counter()
            once12()
            ts12.append(time.perf_counter() - t0)
        per_frame = (min(ts) - min(ts12)) / (f - 12)
        print(json.dumps({
            "variant": tag, "ms_total_60f": round(min(ts) * 1e3, 3),
            "ms_per_frame": round(per_frame * 1e3, 4)}), flush=True)
        return per_frame

    a = run("full-rows (margin-regressed prod)", None, False)
    b = run("ywin48 3-dot", yw, False)
    c = run("ywin48 kstack 2-dot", yw, True)
    print(json.dumps({
        "speedup_window": round(a / b, 3),
        "speedup_kstack": round(b / c, 3),
        "speedup_total": round(a / c, 3)}), flush=True)


if __name__ == "__main__":
    main()
