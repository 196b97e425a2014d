"""Round-4 texfield A/B: frames-per-step batching + relative-window wy.

Two levers on the animtex bake (64x64 repeat texture, rotating 512^2
frames), measured within ONE epoch:

  * frames_per_step in {1, 2, 4}: several frames share one grid step
    (the per-step fixed cost — sequencing + output DMA setup — was
    ~0.2 of the 0.9 ms/frame bake, PERF.md round 4);
  * the relative-window wy build (committed with this study): in
    window+repeat+bilinear mode the two-term mod-space row weights
    collapse to one absolute-space term (one (1, XL) mod instead of a
    (Wt, XL) mod + wrap max) — weight values identical, pinned 0.0 on
    chip by tools/tpu_pin.py's texfield:ywin checks.

Run: python tools/exp_texframes.py   (needs the TPU)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    from bench import _enable_compile_cache

    _enable_compile_cache()
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

    def run(tag, fpb):
        kw = dict(supersample=2, repeating=True, smoothed=True,
                  edge_mode="flash", interpret=False, ywin=yw,
                  frames_per_step=fpb)
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

    for fpb in (1, 2, 4):
        run(f"wyrel+fpb{fpb}", fpb)


if __name__ == "__main__":
    main()
