"""Device-mesh parallelism for the rasterization grid.

The reference has no distributed backend at all (SURVEY.md §2.4); scaling is
a new design obligation.  The natural axes for a rasterizer:

* **frame data-parallelism** (``dp``): frames/ratio-steps are embarrassingly
  parallel — shard the batch dimension, no collectives on the hot path.
* **tile parallelism** (``tp``): for one huge frame, shard tile columns
  across chips; edge tables are small (KBs) and are replicated to every
  chip (the XLA partitioner materializes the broadcast over ICI), while the
  framebuffer — the big tensor — stays fully sharded.

Both are expressed as shardings over a ``jax.sharding.Mesh`` and compiled by
``jit``; XLA inserts any needed collectives.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pipeline import render_solid_batch


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp", "tp"),
              tp: int = 1) -> Mesh:
    """Build an (dp, tp) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available"
            )
        devices = devices[:n_devices]
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    grid = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(grid, axis_names=tuple(axis_names))


def render_batch_dp(
    mesh: Mesh,
    edges_t,  # (B, P, 4, E) — B must divide by mesh dp size
    colors,  # (B, P, 4)
    height: int,
    width: int,
    use_pallas: bool = True,
):
    """Frame-sharded batched render: batch dim split over ``dp``; per-frame
    work is local, so the only communication is the initial scatter."""
    edges_sharding = NamedSharding(mesh, P("dp", None, None, None))
    colors_sharding = NamedSharding(mesh, P("dp", None, None))
    edges_t = jax.device_put(jnp.asarray(edges_t), edges_sharding)
    colors = jax.device_put(jnp.asarray(colors), colors_sharding)
    out_sharding = NamedSharding(mesh, P("dp", None, None, None))
    fn = jax.jit(
        functools.partial(
            render_solid_batch,
            height=height,
            width=width,
            use_pallas=use_pallas,
        ),
        out_shardings=out_sharding,
    )
    return fn(edges_t, colors)


def render_batch_dp_tp(
    mesh: Mesh,
    edges_t,  # (B, P, 4, E); B divisible by dp size
    colors,  # (B, P, 4)
    height: int,
    width: int,  # divisible by tp size
    use_pallas: bool = False,
):
    """Full 2D-sharded render step: frames split over ``dp``, tile columns
    split over ``tp``.  Edge tables are replicated along ``tp`` (small);
    the framebuffer — the large tensor — is sharded on both batch and width.
    """
    dp = mesh.shape["dp"]
    tp = mesh.shape["tp"]
    assert width % tp == 0, (width, tp)
    shard_w = width // tp

    def local_render(edges_local, colors_local):
        tp_idx = jax.lax.axis_index("tp")
        x_off = (tp_idx * shard_w).astype(jnp.float32)
        shifted = edges_local.at[:, :, 0, :].add(-x_off)
        shifted = shifted.at[:, :, 2, :].add(-x_off)
        return render_solid_batch(
            shifted, colors_local, height, shard_w, use_pallas=use_pallas
        )

    fn = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=P("dp", None, "tp", None),
        check_vma=False,
    )
    return jax.jit(fn)(jnp.asarray(edges_t), jnp.asarray(colors))


def render_scanline_dp_tp(
    mesh: Mesh,
    rows,    # (B, L, TP, N) int32 — cells pre-partitioned by column shard,
    cols,    # (B, L, TP, N) int32    cols LOCAL to the shard
    delta,   # (B, L, TP, N) f32 — delta-encoded winding updates
    colors,  # (B, L, 4) f32
    height: int,
    width: int,
    fill_rule: int = 0,
):
    """The scanline pipeline sharded over the full mesh.

    Frames shard over ``dp``.  The framebuffer width shards over ``tp``:
    each shard scatters its own cells and prefix-sums its local slab; the
    only communication is the per-row winding carry entering each shard
    from the left — an all-gather of an (L, H)-sized total per shard over
    ``tp`` (a few hundred KB), after which every pixel is exact.
    """
    tp = mesh.shape["tp"]
    assert width % tp == 0
    w_local = width // tp
    stride = w_local + 1
    b, l, tp_in, n = rows.shape
    assert tp_in == tp, (tp_in, tp)

    def local_render(fr, fc, fd, fcol):
        # fr/fc/fd: (B_local, L, 1, N); fcol: (B_local, L, 4)
        fr = fr[:, :, 0]
        fc = fc[:, :, 0]
        fd = fd[:, :, 0]
        bl = fr.shape[0]
        plane_elems = height * stride
        frame_base = (
            jnp.arange(bl, dtype=jnp.int32)[:, None, None] * (l * plane_elems)
        )
        layer_base = (
            jnp.arange(l, dtype=jnp.int32)[None, :, None] * plane_elems
        )
        idx = frame_base + layer_base + fr * stride + fc
        plane = jax.ops.segment_sum(
            fd.reshape(-1), idx.reshape(-1),
            num_segments=bl * l * plane_elems,
        ).reshape(bl, l, height, stride)

        local_cum = jnp.cumsum(plane, axis=3)
        totals = local_cum[..., stride - 1]  # (B_local, L, H) slab totals
        # Winding entering this shard = sum of totals of shards to my left.
        gathered = jax.lax.all_gather(totals, "tp")  # (TP, B_local, L, H)
        my = jax.lax.axis_index("tp")
        shard_ids = jnp.arange(tp)
        carry = jnp.sum(
            jnp.where((shard_ids < my)[:, None, None, None], gathered, 0.0),
            axis=0,
        )
        winding = local_cum[..., :w_local] + carry[..., None]

        if fill_rule == 0:
            cov = jnp.minimum(jnp.abs(winding), 1.0)
        else:
            m = jnp.mod(winding, 2.0)
            cov = 1.0 - jnp.abs(m - 1.0)

        from ..ops.composite import (
            composite_solid_layers,
            premul_to_straight_u8,
        )

        frames_pm = jax.vmap(composite_solid_layers)(cov, fcol)
        return premul_to_straight_u8(frames_pm)

    fn = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(P("dp", None, "tp", None), P("dp", None, "tp", None),
                  P("dp", None, "tp", None), P("dp", None, None)),
        out_specs=P("dp", None, "tp", None),
        check_vma=False,
    )
    return jax.jit(fn)(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(delta),
        jnp.asarray(colors),
    )


def partition_cells_by_column(cell_lists, width: int, tp: int,
                              pad_multiple: int = 256):
    """Host helper: per-draw (rows, cols, area, cover) -> column-sharded,
    delta-encoded update arrays for :func:`render_scanline_dp_tp`.

    Returns (rows, cols_local, delta) of shape (B, L, TP, N)."""
    import numpy as np

    w_local = width // tp
    stride = w_local + 1
    b = len(cell_lists)
    l = len(cell_lists[0])
    per = [[[None] * tp for _ in range(l)] for _ in range(b)]
    max_n = 1
    for i in range(b):
        for j in range(l):
            r, c, a, v = cell_lists[i][j]
            # Delta encoding on the GLOBAL grid: updates at (r, c) and
            # (r, c+1).  An update at a shard's right edge (local col ==
            # w_local) lands in the local stride column, whose cumsum value
            # feeds the carry but not local pixels — exactly right, since
            # that cover belongs to shards further right.
            up = np.concatenate([c, c + 1])
            ur = np.concatenate([r, r])
            uv = np.concatenate([a, v - a]).astype(np.float32)
            shard = np.minimum(up // w_local, tp - 1)
            local = up - shard * w_local
            for s in range(tp):
                m = shard == s
                per[i][j][s] = (ur[m], local[m], uv[m])
                max_n = max(max_n, int(m.sum()))
    n = ((max_n + pad_multiple - 1) // pad_multiple) * pad_multiple
    rows = np.zeros((b, l, tp, n), np.int32)
    cols = np.zeros((b, l, tp, n), np.int32)
    delta = np.zeros((b, l, tp, n), np.float32)
    for i in range(b):
        for j in range(l):
            for s in range(tp):
                ur, uc, uv = per[i][j][s]
                k = len(ur)
                rows[i, j, s, :k] = ur
                cols[i, j, s, :k] = np.minimum(uc, stride - 1)
                delta[i, j, s, :k] = uv
    return rows, cols, delta


def render_frame_tile_sharded(
    mesh: Mesh,
    edges_t,  # (P, 4, E) one frame
    colors,  # (P, 4)
    height: int,
    width: int,
    use_pallas: bool = False,
):
    """One large frame sharded by tile columns across the whole mesh.

    Edge tables are replicated (small); the framebuffer is sharded on its
    width axis across every device.  Each device rasterizes only its column
    span — the coverage math is position-independent, so we pass shifted
    pixel coordinates via a per-shard x-offset.
    """
    n = mesh.devices.size
    flat_mesh = Mesh(mesh.devices.reshape(-1), ("x",))
    assert width % n == 0, f"width {width} must divide across {n} devices"
    shard_w = width // n

    def local_render(edges_local, colors_local):
        # Shift edges left by this shard's x offset, rasterize the local span.
        idx = jax.lax.axis_index("x")
        x_off = (idx * shard_w).astype(jnp.float32)
        shifted = edges_local.at[:, 0, :].add(-x_off)
        shifted = shifted.at[:, 2, :].add(-x_off)
        return render_solid_batch(
            shifted[None], colors_local[None], height, shard_w,
            use_pallas=use_pallas,
        )[0]

    fn = jax.shard_map(
        local_render,
        mesh=flat_mesh,
        in_specs=(P(), P()),
        out_specs=P(None, "x", None),
        # Per-shard pixel offsets make values axis-varying by construction;
        # no collectives run inside, so skip the varying-axes check.
        check_vma=False,
    )
    return jax.jit(fn)(jnp.asarray(edges_t), jnp.asarray(colors))


def render_fused_dp(mesh: Mesh, update_lists, colors, height: int,
                    width: int, interpret: bool = None):
    """Data-parallel flat-block render: frames shard over the mesh's ``dp``
    axis, each shard running the fused placement+resolve kernel on its own
    chip (zero cross-chip communication — frames are independent).

    ``update_lists``: [frames][layers] of (rows, cols, vals).  The host
    packs each dp shard's frames separately and pads every shard to the
    SAME block count so the sharded arrays are rectangular.  Returns
    (F, NS*8, stride) uint32 packed frames."""
    from ..ops.flatblock import (
        pack_flat_blocks, plane_geometry, render_fused_blocks,
        sort_blocks_fused, LANE,
    )

    dp = mesh.shape["dp"]
    frames = len(update_lists)
    layers = len(update_lists[0])
    if frames % dp:
        raise ValueError(f"frames ({frames}) must divide over dp ({dp})")
    per = frames // dp
    _, n_chunks, n_strips = plane_geometry(height, width)

    shards = []
    for d in range(dp):
        chunk = update_lists[d * per:(d + 1) * per]
        packed = pack_flat_blocks(chunk, height, width,
                                  block_pad_multiple=128)
        shards.append(sort_blocks_fused(*packed[:5], layers, n_strips,
                                        block_pad_multiple=128))
    nb = max(s[0].shape[0] for s in shards)

    def pad_to(x, n):
        if x.shape[0] == n:
            return x
        pad_shape = (n - x.shape[0],) + x.shape[1:]
        if x.dtype == np.int32 and x.ndim == 1:
            # sidx padding targets the sentinel strip (garbage bucket).
            return np.concatenate(
                [x, np.full(pad_shape, n_strips, np.int32)])
        return np.concatenate([x, np.zeros(pad_shape, x.dtype)])

    sidx = np.stack([pad_to(s[0], nb) for s in shards])
    keep = np.stack([np.concatenate(
        [s[1], np.ones(nb - s[1].shape[0], np.int32)]) for s in shards])
    last = np.stack([np.concatenate(
        [s[2], np.zeros(nb - s[2].shape[0], np.int32)]) for s in shards])
    urc = np.stack([pad_to(s[3], nb) for s in shards])
    ucm = np.stack([pad_to(s[4], nb) for s in shards])
    uval = np.stack([pad_to(s[5], nb) for s in shards])
    colors = np.asarray(colors, np.float32).reshape(dp, per, layers, 4)

    def shard_fn(si, ke, la, rc, cm, uv, col):
        out = render_fused_blocks(
            si[0], ke[0], la[0], rc[0], cm[0], uv[0], col[0],
            per, layers, n_strips, n_chunks, interpret=interpret)
        return out[None]

    spec = P("dp")
    # check_vma=False: pallas_call out_shapes carry no vma annotation.
    out = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec,) * 7,
        out_specs=spec,
        check_vma=False,
    )(*map(jnp.asarray, (sidx, keep, last, urc, ucm, uval, colors)))
    out = out.reshape(frames, n_strips + 1, 8, n_chunks * LANE)
    return out[:, :n_strips].reshape(frames, n_strips * 8, n_chunks * LANE)


def render_morph_sweep_dp(mesh: Mesh, ratios, parts, height: int,
                          width: int, interpret: bool = None):
    """Ratio-sharded on-device morph sweep: the ratio axis is the batch
    axis of ops.morph.render_morph_sweep and is embarrassingly parallel —
    each chip renders its slice of the sweep with the piece tables
    replicated (KBs) and zero collectives.

    ``parts``: morph_pieces output.  Returns (R, WP, HP) packed u32
    (transposed frames; ops.morph.morph_frames_to_u8)."""
    from ..ops.morph import render_morph_sweep

    # Shard over every axis the mesh actually has (a dp-only mesh is
    # valid; hard-coding ("dp", "tp") would fail inside shard_map).
    axes = tuple(mesh.shape.keys())
    n_shards = int(np.prod([mesh.shape[a] for a in axes]))
    ratios = np.asarray(ratios, np.float32)
    if len(ratios) % n_shards:
        raise ValueError(
            f"ratios ({len(ratios)}) must divide over {n_shards}")

    def shard_fn(rr, *ps):
        return render_morph_sweep(rr, *ps, height, width,
                                  interpret=interpret)

    out = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axes),) + (P(None),) * len(parts),
        out_specs=P(axes),
        check_vma=False,
    )(jnp.asarray(ratios), *map(jnp.asarray, parts))
    return out


def _tile_shard_layout(height: int, width: int, ws: int) -> dict:
    """Mirror the FULL-width sweep layout inside each column shard so
    the kernel's prefix/heavy partition — and hence its f32 accumulation
    grouping — matches the single-device kernel: with the x_shift
    post-transform origin subtract this makes span concatenation
    bit-exact (tests).  Empty when the shard span doesn't align to the
    full-width column block (output then matches within one quantum —
    ulp-level regrouping only)."""
    from ..ops.transform import LANE, _wblock_for

    hp = -(-height // LANE) * LANE
    wp8 = -(-width // 8) * 8
    wb = _wblock_for(width, hp)
    if ws % wb:
        return {}
    return {"wblock": wb, "skip_empty": -(-wp8 // wb) >= 4}


def render_morph_sweep_tile_sharded(mesh: Mesh, ratios, parts,
                                    height: int, width: int,
                                    interpret: bool = None):
    """One wide morph ratio sweep sharded by COLUMN SPANS: the piece
    tables stay GLOBAL device-space and each shard passes its span
    origin as the kernel's ``x_shift`` scalar (subtracted AFTER the
    ratio lerp), so every shard's columns are BIT-identical to the
    single-device kernel's — zero collectives (round 4; the old
    host-side piece shift perturbed the lerp rounding by one quantum).
    Returns (R, W, HP) packed u32."""
    from ..ops.morph import render_morph_sweep

    n = mesh.devices.size
    flat_mesh = Mesh(mesh.devices.reshape(-1), ("x",))
    if width % n:
        raise ValueError(
            f"width ({width}) must divide across {n} devices")
    ws = width // n

    def shard_fn(rr, tab_s, tab_e, suby_s, suby_e, cs, ce):
        x0 = (jax.lax.axis_index("x") * ws).astype(jnp.float32)
        out = render_morph_sweep(rr, tab_s, tab_e, suby_s, suby_e, cs,
                                 ce, height, ws, interpret=interpret,
                                 x_shift=x0.reshape(1))
        return out[:, :ws]

    return jax.shard_map(
        shard_fn, mesh=flat_mesh,
        in_specs=(P(),) + (P(),) * len(parts),
        out_specs=P(None, "x", None),
        check_vma=False,
    )(jnp.asarray(np.asarray(ratios, np.float32)),
      *map(jnp.asarray, parts))


def render_morph_affine_sweep_tile_sharded(mesh: Mesh, matrices, ratios,
                                           parts, height: int,
                                           width: int,
                                           interpret: bool = None):
    """Combined morph + transform sweep sharded by COLUMN SPANS: the
    frame matrices stay GLOBAL and the shard origin rides the kernel's
    ``x_shift`` scalar (subtracted AFTER the lerp + transform), so
    every shard's columns are BIT-identical to the single-device
    kernel's (round 4).  Returns (F, W, HP)."""
    from ..ops.transform import render_morph_affine_sweep

    n = mesh.devices.size
    flat_mesh = Mesh(mesh.devices.reshape(-1), ("x",))
    if width % n:
        raise ValueError(
            f"width ({width}) must divide across {n} devices")
    ws = width // n

    layout = _tile_shard_layout(height, width, ws)

    def shard_fn(mm, rr, *ps):
        x0 = (jax.lax.axis_index("x") * ws).astype(jnp.float32)
        out = render_morph_affine_sweep(mm, rr, *ps, height, ws,
                                        interpret=interpret,
                                        x_shift=x0.reshape(1), **layout)
        return out[:, :ws]

    return jax.shard_map(
        shard_fn, mesh=flat_mesh,
        in_specs=(P(), P()) + (P(),) * len(parts),
        out_specs=P(None, "x", None),
        check_vma=False,
    )(jnp.asarray(np.asarray(matrices, np.float32)),
      jnp.asarray(np.asarray(ratios, np.float32)),
      *map(jnp.asarray, parts))


def render_affine_sweep_tile_sharded(mesh: Mesh, matrices, parts,
                                     height: int, width: int,
                                     interpret: bool = None,
                                     paints=None, grad_mats=None,
                                     fields=None):
    """One LARGE animated frame set sharded by COLUMN SPANS across the
    whole mesh (the transform sweep's width-sharding twin of
    render_frame_tile_sharded): the piece tables are replicated (KBs),
    each device rasterizes its own column span for EVERY frame, and no
    collectives run.  The shard origin rides the kernel's ``x_shift``
    scalar — matrices and gradient affines stay GLOBAL and the kernel
    subtracts the origin AFTER its transform, so every shard's columns
    are BIT-identical to the single-device kernel's (round 4; the old
    translate-fold perturbed the FMA rounding by one u8 quantum).
    Field planes are device-space and simply shard their width axis.

    Returns (F, W, HP) packed u32 (width exactly trimmed; transposed
    frames — ops.morph.morph_frames_to_u8)."""
    from ..ops.transform import render_affine_sweep

    n = mesh.devices.size
    flat_mesh = Mesh(mesh.devices.reshape(-1), ("x",))
    if width % n:
        raise ValueError(
            f"width ({width}) must divide across {n} devices")
    ws = width // n
    matrices = np.asarray(matrices, np.float32)
    has_grads = grad_mats is not None
    has_fields = fields is not None

    layout = _tile_shard_layout(height, width, ws)

    def shard_fn(mm, *ps):
        ff = ps[-1] if has_fields else None
        ps = ps[:-1] if has_fields else ps
        gm = ps[-1] if has_grads else None
        ps = ps[:-1] if has_grads else ps
        x0 = (jax.lax.axis_index("x") * ws).astype(jnp.float32)
        out = render_affine_sweep(mm, *ps, height, ws,
                                  interpret=interpret, paints=paints,
                                  grad_mats=gm, fields=ff,
                                  x_shift=x0.reshape(1), **layout)
        return out[:, :ws]  # trim kernel padding so spans concat clean

    args = [jnp.asarray(matrices), *map(jnp.asarray, parts)]
    in_specs = [P()] + [P()] * len(parts)
    if has_grads:
        args.append(jnp.asarray(np.asarray(grad_mats, np.float32)))
        in_specs.append(P())
    if has_fields:
        args.append(jnp.asarray(fields))
        in_specs.append(P(None, None, None, "x", None))
    return jax.shard_map(
        shard_fn, mesh=flat_mesh,
        in_specs=tuple(in_specs),
        out_specs=P(None, "x", None),
        check_vma=False,
    )(*args)


def render_affine_sweep_dp(mesh: Mesh, matrices, parts, height: int,
                           width: int, interpret: bool = None,
                           paints=None, grad_mats=None, fields=None):
    """Frame-sharded on-device TRANSFORM sweep: the frame/matrix axis of
    ops.transform.render_affine_sweep is embarrassingly parallel — each
    chip renders its slice of the animation with the piece tables
    replicated (KBs) and zero collectives (the morph sweep's transform
    twin).

    ``parts``: affine_pieces output (tab, subxy, colors).
    ``paints``/``grad_mats``: optional styled-sweep inputs
    (ops.transform.sweep_paints); grad_mats' frame axis shards with the
    matrices.  ``fields`` (NF, F, H, W, 4) baked paint planes
    (ops.transform.bake_sweep_fields — bitmap / linear-RGB layers):
    per-frame data, so its frame axis (axis 1) shards with the matrices
    too — each chip holds only its own frames' planes.  Returns
    (F, WP, HP) packed u32 (transposed frames;
    ops.morph.morph_frames_to_u8)."""
    from ..ops.transform import render_affine_sweep

    axes = tuple(mesh.shape.keys())
    n_shards = int(np.prod([mesh.shape[a] for a in axes]))
    matrices = np.asarray(matrices, np.float32)
    if len(matrices) % n_shards:
        raise ValueError(
            f"frames ({len(matrices)}) must divide over {n_shards}")
    has_grads = grad_mats is not None
    has_fields = fields is not None

    def shard_fn(mm, *ps):
        ff = ps[-1] if has_fields else None
        ps = ps[:-1] if has_fields else ps
        gm = ps[-1] if has_grads else None
        ps = ps[:-1] if has_grads else ps
        return render_affine_sweep(mm, *ps, height, width,
                                   interpret=interpret, paints=paints,
                                   grad_mats=gm, fields=ff)

    args = [jnp.asarray(matrices), *map(jnp.asarray, parts)]
    in_specs = (P(axes),) + (P(None),) * len(parts)
    if has_grads:
        args.append(jnp.asarray(np.asarray(grad_mats, np.float32)))
        in_specs = in_specs + (P(axes),)
    if has_fields:
        args.append(jnp.asarray(fields))
        in_specs = in_specs + (P(None, axes),)
    out = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=in_specs,
        out_specs=P(axes),
        check_vma=False,
    )(*args)
    return out


def render_morph_affine_sweep_dp(mesh: Mesh, matrices, ratios, parts,
                                 height: int, width: int,
                                 interpret: bool = None):
    """Frame-sharded combined MORPH + TRANSFORM sweep: the frame axis
    (matrix + ratio tracks) shards over the whole mesh with the piece-
    pair tables replicated (KBs), zero collectives.

    ``parts``: morph_affine_pieces output.  Returns (F, WP, HP) packed
    u32 (transposed; ops.morph.morph_frames_to_u8)."""
    from ..ops.transform import render_morph_affine_sweep

    axes = tuple(mesh.shape.keys())
    n_shards = int(np.prod([mesh.shape[a] for a in axes]))
    matrices = np.asarray(matrices, np.float32)
    ratios = np.asarray(ratios, np.float32)
    if len(matrices) % n_shards:
        raise ValueError(
            f"frames ({len(matrices)}) must divide over {n_shards}")

    def shard_fn(mm, rr, *ps):
        return render_morph_affine_sweep(mm, rr, *ps, height, width,
                                         interpret=interpret)

    out = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axes), P(axes)) + (P(None),) * len(parts),
        out_specs=P(axes),
        check_vma=False,
    )(jnp.asarray(matrices), jnp.asarray(ratios),
      *map(jnp.asarray, parts))
    return out


def render_styled_dp(mesh: Mesh, gsi, gfl, gla, grc, gcm, gvv, colors,
                     fields, frames: int, layers: int, n_strips: int,
                     n_chunks: int, paints, group: int = 8,
                     interpret: bool = None, spp: int = 1):
    """Frame-sharded STYLED fused render: each dp shard runs the styled
    flat-block kernel over its frames; gradient params are baked, field
    planes replicate (frame-invariant — they are width-partitionable
    chunk-major planes, but replication is the design: per-strip blocks
    stream through VMEM on demand, so the HBM footprint is one field copy
    per chip and no collectives run on the hot path).  Block arrays must
    be packed per-shard-rectangular: pack each dp shard's frames
    separately with pack_grouped_native and stack (see dryrun/tests).

    gsi/gfl (D, NG), gla (D, group, NG), grc/gcm/gvv (D, NG, ...),
    colors (D, per, L, 4).  Returns (frames, NS+1, spp*8, stride) u32."""
    from ..ops.flatblock import LANE, render_fused_styled

    dp = mesh.shape["dp"]
    if frames % dp:
        raise ValueError(f"frames ({frames}) must divide over dp={dp}")
    per = frames // dp

    def shard_fn(si, fl, la, rc, cm, uv, col, *fs):
        out = render_fused_styled(
            si[0], fl[0], la[0], rc[0], cm[0], uv[0], col[0], fs,
            per, layers, n_strips, n_chunks, paints, group=group,
            interpret=interpret, spp=spp)
        return out[None]

    spec = P("dp")
    out = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec,) * 7 + (P(None),) * len(fields),
        out_specs=spec,
        check_vma=False,
    )(*map(jnp.asarray, (gsi, gfl, gla, grc, gcm, gvv, colors)),
      *map(jnp.asarray, fields))
    stride = n_chunks * LANE
    return out.reshape(frames, n_strips + 1, spp * 8, stride)


def _premul_planes_to_frames(planes, height: int, width: int,
                             n_chunks: int):
    """(F, NS+1, 4, plane_rows, 128) premul planes -> (F, H, W, 4)
    premul f32 (spp=1 chunk-major layout: plane row = chunk*8 + y%8)."""
    from ..ops.flatblock import LANE

    nc8 = n_chunks * 8
    x = planes[:, :-1, :, :nc8, :]
    f, ns = x.shape[0], x.shape[1]
    x = x.reshape(f, ns, 4, n_chunks, 8, LANE)
    x = x.transpose(0, 1, 4, 3, 5, 2)
    x = x.reshape(f, ns * 8, n_chunks * LANE, 4)
    return x[:, :height, :width]


def render_deep_passes_sharded(mesh: Mesh, edge_tables, colors,
                               height: int, width: int,
                               fill_rule: int = 0,
                               interpret: bool = None, group: int = 6,
                               axis: str = "dp"):
    """Deep draw lists with the PASS axis sharded over the mesh
    (SURVEY §2.4's last unexplored axis; VERDICT r3 #5).

    The single-device path renders > 16-layer scenes as sequential
    passes, each seeding the chain composite from the previous pass's
    premul planes (a left fold).  ``over`` on premul planes is
    ASSOCIATIVE, so each device here renders ONE consecutive layer
    group over TRANSPARENT, and the planes fold across the mesh axis —
    top pass g applied as ``P_g + acc * (1 - alpha_g)``.  The fold
    applies each pass's keep product ONCE instead of layer-by-layer, so
    the result matches the serial chain within float rounding (<= one
    premul-u8 quantum — same documented seam as the tile-sharded
    sweeps; tests pin it).

    ``edge_tables``: [frames][layers] device-space edge tables;
    ``colors``: (F, L, 4) straight RGBA (solid layers).  Layers pad up
    to a multiple of the mesh axis with empty transparent layers.
    Returns (F, H, W, 4) u8."""
    from ..native.bindings import pack_grouped_native
    from ..ops.composite import premul_to_straight_u8
    from ..ops.flatblock import KernelPaint, plane_geometry
    from ..ops.flatblock import render_fused_styled
    from ..ops.pipeline import lower_update_lists

    g_n = mesh.shape[axis]
    frames = len(edge_tables)
    layers = len(edge_tables[0])
    lp = -(-layers // g_n)
    colors = np.asarray(colors, np.float32)
    if colors.shape != (frames, layers, 4):
        raise ValueError(f"colors must be (F={frames}, L={layers}, 4)")
    pad_l = g_n * lp - layers
    if pad_l:
        empty = np.zeros((0, 4), np.float32)
        edge_tables = [per + [empty] * pad_l for per in edge_tables]
        colors = np.concatenate(
            [colors, np.zeros((frames, pad_l, 4), np.float32)], axis=1)
    _, nc, ns = plane_geometry(height, width)

    packs = []
    for g in range(g_n):
        sub = [per[g * lp:(g + 1) * lp] for per in edge_tables]
        ul = lower_update_lists(sub, height, width)
        packs.append(pack_grouped_native(ul, height, width, group=group,
                                         spp=1))
    ng = max(p[0].shape[0] for p in packs)

    def pad_pack(p):
        gsi, gfl, gla, grc, gcm, gvv, ns_p, nc_p = p
        assert (ns_p, nc_p) == (ns, nc)
        n0 = gsi.shape[0]
        if n0 == ng:
            return gsi, gfl, gla, grc, gcm, gvv
        # Padding groups zero+emit the sentinel strip (garbage bucket).
        k = ng - n0
        gsi = np.concatenate([gsi, np.full(k, ns, np.int32)])
        gfl = np.concatenate([gfl, np.full(k, 3, np.int32)])
        gla = np.concatenate([gla, np.zeros((k,) + gla.shape[1:],
                                            gla.dtype)])
        grc = np.concatenate([grc, np.zeros((k,) + grc.shape[1:],
                                            grc.dtype)])
        gcm = np.concatenate([gcm, np.zeros((k,) + gcm.shape[1:],
                                            gcm.dtype)])
        gvv = np.concatenate([gvv, np.zeros((k,) + gvv.shape[1:],
                                            gvv.dtype)])
        return gsi, gfl, gla, grc, gcm, gvv

    padded = [pad_pack(p) for p in packs]
    stacked = [np.stack([p[i] for p in padded]) for i in range(6)]
    col_g = np.stack([colors[:, g * lp:(g + 1) * lp] for g in range(g_n)])
    kpaints = tuple(KernelPaint.color() for _ in range(lp))

    def shard_fn(si, fl, la, rc, cm, uv, col):
        out = render_fused_styled(
            si[0], fl[0], la[0], rc[0], cm[0], uv[0], col[0], (),
            frames, lp, ns, nc, kpaints, group=group,
            fill_rule=fill_rule, interpret=interpret, spp=1,
            chain=True, bg=None, emit="premul")
        return out[None]

    spec = P(axis)
    planes = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(spec,) * 7, out_specs=spec,
        check_vma=False,
    )(*map(jnp.asarray, stacked), jnp.asarray(col_g))

    # Associative premul-over fold across the pass axis (bottom pass
    # first).  Fold on the HOST: eager jnp binary ops on the sharded
    # shard_map output intermittently SIGABRT deep in XLA:CPU under
    # full-suite pressure (multi-device relayout of a committed array);
    # numpy f32 elementwise math is IEEE-identical op-for-op, so the
    # fold result is bit-equal to the eager device fold.
    planes = np.asarray(planes)
    acc = planes[0]
    for g in range(1, g_n):
        top = planes[g]
        acc = top + acc * (np.float32(1.0) - top[:, :, 3:4])
    pm = _premul_planes_to_frames(acc, height, width, nc)
    return np.asarray(premul_to_straight_u8(pm))


def render_masked_dp(mesh: Mesh, edge_tables, paints, height: int,
                     width: int, colors, mask_tree,
                     fill_rule=None, interpret: bool = None):
    """Data-parallel MASKED/BLENDED render: frames shard over ``dp``,
    each device running the full group-composite program (pipeline
    plan_masked_program / exec_masked_program — fused passes + premul
    plane algebra + the chained quantize pass) on its own frames.
    Zero cross-chip communication; per-shard packs pad to a common step
    count with sentinel-strip no-op steps.  In-kernel paints only
    (solid / sRGB gradients) — per-frame field planes would need
    sharded bakes.  Returns (F, H, W, 4) uint8, bit-identical to the
    single-device program (per-frame packing is frame-local)."""
    from ..ops.coverage import FILL_RULE_NONZERO
    from ..ops.flatblock import (
        LANE, frames_u32_to_u8, plane_geometry, render_fused_styled,
        strips_per_plane,
    )
    from ..ops.pipeline import (
        _pack_styled, _segment_tables, exec_masked_program,
        kernel_paints_for, plan_masked_program,
    )

    group = 6
    dp = mesh.shape["dp"]
    frames = len(edge_tables)
    layers = len(edge_tables[0])
    if frames % dp:
        raise ValueError(f"frames ({frames}) must divide over dp ({dp})")
    per = frames // dp
    if fill_rule is None:
        fill_rule = FILL_RULE_NONZERO
    rules = (fill_rule if isinstance(fill_rule, tuple)
             else (fill_rule,) * layers)
    from ..native.bindings import native_available

    _, nc_geo, ns_geo = plane_geometry(height, width)
    spp = strips_per_plane(nc_geo, ns_geo) if native_available() else 1
    colors = np.asarray(colors, np.float32)

    segments, program, final_seg = plan_masked_program(mask_tree, paints,
                                                       rules)
    # Fused mask-group passes (round 5): the same (content + mask) ONE
    # kernel-chain fusion the single-device executor uses — fusible
    # steps get a combined "virtual segment" packed per shard.  The
    # pair merge is the SHARED pipeline.build_fused_mask_pair, so the
    # dp program stays bit-identical to the single-device one by
    # construction.
    from ..ops.pipeline import _fusible_mask_step, build_fused_mask_pair

    fused_pairs = {}

    def _scan(prog):
        for step in prog:
            if step[0] == "mask":
                if _fusible_mask_step(step):
                    cid, msids = step[2][0][1][0], tuple(step[1])
                    fused_pairs.setdefault((cid, msids), None)
                _scan(step[2])
            elif step[0] in ("blend", "filter"):
                _scan(step[2])

    _scan(program)
    virtual = []
    for (cid, msids) in fused_pairs:
        pair = build_fused_mask_pair(segments, cid, msids)
        if pair is not None:
            idxs, all_paints, rule, mfrom = pair
            virtual.append(((cid, msids), idxs, all_paints, rule, mfrom))

    seg_meta = []
    seg_arrays = []
    pack_list = ([(idxs, sub_paints, rule, force_white, None)
                  for idxs, sub_paints, rule, force_white in segments]
                 + [(idxs, sub_paints, rule, None, (key, mfrom))
                    for key, idxs, sub_paints, rule, mfrom in virtual])
    fused_slot = {}
    for seg_i, (idxs, sub_paints, rule, force_white,
                fused_info) in enumerate(pack_list):
        kpaints, fields, _ = kernel_paints_for(sub_paints, height, width,
                                               spp=spp)
        if fields:
            raise NotImplementedError(
                "render_masked_dp supports in-kernel paints only "
                "(field-plane paints need per-shard bakes)")
        packs = []
        for d in range(dp):
            tables = _segment_tables(edge_tables[d * per:(d + 1) * per],
                                     idxs)
            packs.append(_pack_styled(tables, height, width, group, spp,
                                      None, len(sub_paints)))
        ns, nc = packs[0][6], packs[0][7]
        nsteps = max(p[0].shape[0] for p in packs)
        arrs = []
        for ai in range(6):
            stacked = []
            for p in packs:
                x = p[ai]
                pad = nsteps - x.shape[0]
                if pad:
                    if ai == 0:    # sidx -> frame 0 / layer 0 / sentinel
                        fill = np.full((pad,) + x.shape[1:], ns, x.dtype)
                    elif ai == 1:  # flags: zero + emit, 0 used slots
                        fill = np.full((pad,) + x.shape[1:], 3, x.dtype)
                    else:
                        fill = np.zeros((pad,) + x.shape[1:], x.dtype)
                    x = np.concatenate([x, fill])
                stacked.append(x)
            arrs.append(np.stack(stacked))
        if fused_info is not None:
            key, mfrom = fused_info
            n_mask = len(idxs) - mfrom
            base = (colors[:, list(idxs[:mfrom])]
                    if mfrom else
                    np.zeros((frames, 0, 4), np.float32))
            sub_colors = np.concatenate(
                [base, np.ones((frames, n_mask, 4), np.float32)],
                axis=1).reshape(dp, per, len(idxs), 4)
            fused_slot[key] = (seg_i, mfrom)
        elif force_white:
            sub_colors = np.ones((dp, per, len(idxs), 4), np.float32)
        elif not idxs:
            sub_colors = np.zeros((dp, per, 1, 4), np.float32)
        else:
            sub_colors = colors[:, list(idxs)].reshape(
                dp, per, len(idxs), 4)
        seg_arrays.extend(arrs + [sub_colors])
        seg_meta.append((kpaints, ns, nc, len(sub_paints), rule))

    n_packs = len(pack_list)

    def shard_fn(*flat):
        local = [tuple(x[0] for x in flat[7 * i : 7 * i + 7])
                 for i in range(n_packs)]

        def seg_call(sid, bg, emit, mask_from=None):
            kpaints, ns, nc, nl, rule = seg_meta[sid]
            args = local[sid]
            return render_fused_styled(
                args[0], args[1], args[2], args[3], args[4], args[5],
                args[6], (), per, nl, ns, nc, kpaints, group=group,
                fill_rule=rule, interpret=interpret, spp=spp,
                chain=True, bg=bg, emit=emit, mask_from=mask_from)

        def seg_call_masked(cid, msids, bg, emit):
            slot = fused_slot.get((cid, msids))
            if slot is None:
                return None
            seg_i, mfrom = slot
            return seg_call(seg_i, bg, emit, mask_from=mfrom)

        from ..ops.flatblock import (
            frames_to_premul_planes, premul_planes_to_frames,
        )

        nc_final = seg_meta[final_seg][2]
        plane_image = (
            lambda planes: premul_planes_to_frames(
                planes, height, width, nc_final, spp),
            lambda img, like: frames_to_premul_planes(
                img, nc_final, spp, like.shape[1] - 1, like.shape[3]),
        )
        return exec_masked_program(program, final_seg, seg_call,
                                   plane_image=plane_image,
                                   seg_call_masked=seg_call_masked)[None]

    spec = P("dp")
    out = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec,) * (7 * n_packs),
        out_specs=spec, check_vma=False,
    )(*map(jnp.asarray, seg_arrays))
    out = np.asarray(out).reshape((frames,) + out.shape[2:])
    ns = seg_meta[final_seg][1]
    nc = seg_meta[final_seg][2]
    out32 = out[:, :ns].reshape(frames, ns * spp * 8, nc * LANE)
    return frames_u32_to_u8(out32, height, width)
