"""Full-resolution sharded change detection (halo-exchange warp).

The reference caps alignment at 1024 px — it *downscales* instead of
scaling out (process-images.py:530-536) — so its change maps lose all
sub-1024 detail. This module runs the whole change-detection pipeline
(WB -> align -> index -> diff -> stats, process-images.py:885-989
semantics) on a row-sharded full-resolution mosaic pair across a device
mesh:

1. **Global white balance** per image: per-channel 256-bin histograms,
   one ``psum`` — globally consistent stretch (exact).
2. **Coarse shift** by FFT phase correlation on a strided grayscale
   proxy: each shard contributes its strided rows, one ``all_gather``
   of the small proxy, the correlation itself is computed replicated
   (a ~512-row FFT is negligible); upsampled-DFT refinement recovers
   full-resolution (and subpixel) precision from the strided proxy.
3. **Sharded warp** of the late image: one neighbor halo exchange
   (rgnir_tpu.parallel.halo.exchange_halos, ``ppermute``) gives
   each shard the boundary rows the bilinear stencil needs; row
   gathers use *global* reflect indexing (scipy order=1/mode='reflect'
   parity at the true image bounds), remapped into the haloed local
   window. Column shifts are shard-local (full width per shard).
4. **Index maps + diff** per shard (embarrassingly parallel), and
   **exact gathered diff stats** (psum/pmin/pmax + distributed
   radix-select median).

The estimated row shift is clamped to ``+/-(halo - 1)`` — the halo
bound is the one capability limit, and it is never silent: by default
a saturating estimate triggers ONE re-run with a halo sized to it
(``grow_halo``), and when that is impossible (shard too small, or
``grow_halo=False``) the result carries ``shift_saturated=True`` plus
the pre-clamp estimate in ``shift_raw``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.struct
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rgnir_tpu.config import IndexConfig, IndexKind, WBConfig
from rgnir_tpu.ops.histogram import planar_histograms
from rgnir_tpu.ops.indices import band_indices, index_from_bands
from rgnir_tpu.ops.wb import apply_white_balance_planar, wb_bounds_from_histogram
from rgnir_tpu.parallel.halo import exchange_halos
from rgnir_tpu.parallel.mesh import local_mesh
from rgnir_tpu.register.local import interpolate_field
from rgnir_tpu.register.phase import luminance, phase_correlation_shift
from rgnir_tpu.register.warp import _reflect_index


@flax.struct.dataclass
class DiffStats:
    """Exact gathered statistics of a change (difference) map."""

    mean: jax.Array
    std: jax.Array
    min: jax.Array
    max: jax.Array
    median: jax.Array
    n: jax.Array


@flax.struct.dataclass
class ShardedChangeResult:
    early_index: jax.Array   # (H_pad, W) f32, row-sharded
    late_index: jax.Array    # (H_pad, W) f32, row-sharded (aligned)
    diff: jax.Array          # (H_pad, W) f32, row-sharded
    shift: jax.Array         # (2,) f32 (dy, dx) APPLIED, replicated
    stats: DiffStats         # replicated
    shift_raw: jax.Array = None      # (2,) f32 pre-clamp estimate
    shift_saturated: jax.Array = None  # () bool: applied != estimated
    # Non-rigid refinement (``local_tile=``): the APPLIED per-tile
    # total shift field (global + clamped residual), replicated; and
    # whether any tile's pre-clamp total exceeded the halo bound.
    field: jax.Array = None            # (TY, TX, 2) f32
    field_saturated: jax.Array = None  # () bool


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def bilinear_shift_2d_haloed(
    ext: jax.Array,
    dy: jax.Array,
    dx: jax.Array,
    row0: jax.Array,
    col0: jax.Array,
    h: int,
    w: int,
    halo_r: int,
    halo_c: int,
) -> jax.Array:
    """Warp a (row, column)-haloed local block by a global (dy, dx) shift.

    ``ext``: ``(bh + 2*halo_r, bw + 2*halo_c[, C])`` — the local shard
    extended by :func:`exchange_halos` along each sharded dimension.
    Output pixels are the shard's own global rows ``[row0, row0 + bh)``
    and columns ``[col0, col0 + bw)``; source coordinates ``g - shift``
    are reflected at the TRUE image bounds (scipy mode='reflect' parity)
    and remapped into the halo window. Exact whenever
    ``|dy| <= halo_r - 1`` and ``|dx| <= halo_c - 1`` (callers clamp;
    ``halo_c = 0`` means columns are fully local and ``dx`` is
    unbounded). Matches register.warp.bilinear_shift_2d on the
    unsharded array bit-for-bit.
    """
    bh = ext.shape[0] - 2 * halo_r
    bw = ext.shape[1] - 2 * halo_c
    x = ext.astype(jnp.float32)

    g = row0.astype(jnp.float32) + jnp.arange(bh, dtype=jnp.float32)
    src = g - dy
    y0 = jnp.floor(src)
    wy = (src - y0)[:, None]
    y0i = y0.astype(jnp.int32)
    y0r = _reflect_index(y0i, h)
    y1r = _reflect_index(y0i + 1, h)
    base = row0 - halo_r
    p0 = jnp.clip(y0r - base, 0, bh + 2 * halo_r - 1)
    p1 = jnp.clip(y1r - base, 0, bh + 2 * halo_r - 1)
    rows0 = jnp.take(x, p0, axis=0)
    rows1 = jnp.take(x, p1, axis=0)
    wy_b = wy if x.ndim == 2 else wy[..., None]
    rowmix = rows0 * (1.0 - wy_b) + rows1 * wy_b

    gc = col0.astype(jnp.float32) + jnp.arange(bw, dtype=jnp.float32)
    xx = gc - dx
    x0 = jnp.floor(xx)
    wx = (xx - x0)[None, :]
    x0i = x0.astype(jnp.int32)
    x0r = _reflect_index(x0i, w)
    x1r = _reflect_index(x0i + 1, w)
    cbase = col0 - halo_c
    q0 = jnp.clip(x0r - cbase, 0, bw + 2 * halo_c - 1)
    q1 = jnp.clip(x1r - cbase, 0, bw + 2 * halo_c - 1)
    cols0 = jnp.take(rowmix, q0, axis=1)
    cols1 = jnp.take(rowmix, q1, axis=1)
    wx_b = wx if x.ndim == 2 else wx[..., None]
    return cols0 * (1.0 - wx_b) + cols1 * wx_b


def bilinear_shift_rows_haloed(
    ext: jax.Array,
    dy: jax.Array,
    dx: jax.Array,
    row0: jax.Array,
    h: int,
    halo: int,
) -> jax.Array:
    """Row-sharded special case of :func:`bilinear_shift_2d_haloed`
    (columns fully local: ``halo_c = 0``, ``dx`` unbounded)."""
    return bilinear_shift_2d_haloed(
        ext, dy, dx, row0, jnp.int32(0), h, int(ext.shape[1]), halo, 0
    )


def field_warp_haloed(
    ext: jax.Array,
    field: jax.Array,
    row0: jax.Array,
    col0: jax.Array,
    h: int,
    w: int,
    halo_r: int,
    halo_c: int,
    tile: Tuple[int, int],
) -> jax.Array:
    """Per-pixel field warp of a haloed local block: the non-rigid
    counterpart of :func:`bilinear_shift_2d_haloed`.

    ``field`` is the replicated GLOBAL ``(TY, TX, 2)`` per-tile total
    shift (global + residual); each output pixel warps by the bilinear
    interpolation of the four surrounding tile centers, with bilinear
    sampling and reflection at the TRUE image bounds. Exact whenever
    every interpolated ``|dy| <= halo_r - 1`` (and ``|dx| <= halo_c -
    1`` when columns are sharded; ``halo_c = 0`` means columns are
    fully local and dx is unbounded) — callers clamp the field. A
    constant field reduces to :func:`bilinear_shift_2d_haloed` exactly
    (same stencil, per-pixel instead of per-row/column source
    coordinates); matches register.local.warp_with_field on the
    unsharded array bit-for-bit (tests/test_parallel.py).
    """
    bh = ext.shape[0] - 2 * halo_r
    bw = ext.shape[1] - 2 * halo_c
    x = ext.astype(jnp.float32)
    s = interpolate_field(field, bh, bw, tile, row0=row0, col0=col0)

    g_y = row0.astype(jnp.float32) + jnp.arange(bh, dtype=jnp.float32)
    g_x = col0.astype(jnp.float32) + jnp.arange(bw, dtype=jnp.float32)
    yy = g_y[:, None] - s[..., 0]
    xx = g_x[None, :] - s[..., 1]
    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    wy = yy - y0
    wx = xx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    base = row0 - halo_r
    cbase = col0 - halo_c
    p0 = jnp.clip(_reflect_index(y0i, h) - base, 0, bh + 2 * halo_r - 1)
    p1 = jnp.clip(
        _reflect_index(y0i + 1, h) - base, 0, bh + 2 * halo_r - 1
    )
    q0 = jnp.clip(_reflect_index(x0i, w) - cbase, 0, bw + 2 * halo_c - 1)
    q1 = jnp.clip(
        _reflect_index(x0i + 1, w) - cbase, 0, bw + 2 * halo_c - 1
    )
    if x.ndim == 3:
        wy = wy[..., None]
        wx = wx[..., None]
    v00 = x[p0, q0]
    v01 = x[p0, q1]
    v10 = x[p1, q0]
    v11 = x[p1, q1]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def _pick_tile_rows(bh: int, th: int) -> int:
    """Largest divisor of ``bh`` that is ``<= th`` (tiles must not
    straddle shard boundaries). Trace-time only."""
    for cand in range(min(th, bh), 0, -1):
        if bh % cand == 0:
            return cand
    return 1


def _pick_proxy_stride(h: int, block_h: int, target: int = 512) -> int:
    """Largest power of two <= h/target that divides block_h (>= 1)."""
    s = 1
    while (
        s * 2 <= block_h
        and block_h % (s * 2) == 0
        and h // (s * 2) >= target
    ):
        s *= 2
    return s


def change_detection_mosaic(
    early: jax.Array,
    late: jax.Array,
    kind: Union[IndexKind, str],
    mesh: Optional[Mesh] = None,
    halo: int = 64,
    proxy_stride: Optional[int] = None,
    upsample_factor: int = 1,
    with_wb: bool = True,
    wb_cfg: WBConfig = WBConfig(),
    idx_cfg: IndexConfig = IndexConfig(),
    pad_to: Optional[int] = None,
    grow_halo: bool = True,
    local_tile: Optional[Tuple[int, int]] = None,
    max_residual: Optional[float] = None,
) -> ShardedChangeResult:
    """Change detection on a full-resolution row-sharded mosaic pair.

    Args:
      early/late: ``(H, W, 3)`` uint8 mosaics (same shape). With
        ``with_wb`` each is white-balanced with *globally exact*
        percentile bounds first (reference flow,
        process-images.py:893-902).
      kind: index to difference (NDVI/GNDVI/NDWI).
      mesh: 1-D device mesh (rows sharded) or 2-D mesh (rows x columns,
        for wide survey strips); default: all visible devices, 1-D.
      halo: boundary rows exchanged per neighbor; the estimated row
        shift is clamped to ``+/-(halo - 1)``. Must satisfy
        ``halo <= H_pad / n_devices``. On a 2-D mesh the same halo is
        exchanged along columns and the column shift is clamped too.
      proxy_stride: subsampling stride of the phase-correlation proxy
        (default: auto, power of two dividing the shard height keeping
        the proxy >= ~512 rows).
      upsample_factor: extra full-resolution refinement of the shift
        (the proxy is always refined by ``stride`` so shifts resolve to
        one full-res pixel; > 1 goes subpixel).
      pad_to: force the padded row count — an int for 1-D meshes, a
        ``(rows, cols)`` pair for 2-D meshes (tests use it to compare
        runs on different mesh sizes bit-for-bit).
      grow_halo: when the estimated shift exceeds the halo bound,
        fetch the replicated estimate to the host and re-run once with
        a halo sized to it (costs one host sync + one recompute, only
        on saturation). When the needed halo exceeds the shard size —
        or with ``grow_halo=False`` — the clamp is applied and the
        result says so: ``shift_saturated`` is True and ``shift_raw``
        carries the pre-clamp estimate. Never a silent wrong diff.
      local_tile: enable NON-RIGID refinement (the sharded counterpart
        of register.local.align_images_local — beyond the reference,
        whose alignment is one rigid translation at <= 1024 px,
        process-images.py:515-565): per-tile phase correlations on the
        integer-pre-shifted grayscale estimate a smooth residual shift
        field on top of the global shift; one per-pixel field warp
        (``field_warp_haloed``) applies global + residual in a single
        resampling pass. Tile rows shrink to a divisor of the shard
        height (tiles never straddle shards); on 2-D meshes tile
        columns likewise divide the shard width. The per-tile residual
        work is fully shard-local; only the tiny (TY, TX, 2) field is
        all_gathered. Tiles with < 50% true-overlap under the global
        shift, or in the padded remainder, keep residual 0 (the gate
        of register.local.align_images_local).
      max_residual: clamp each residual component (default tile/4 —
        larger estimates from low-texture tiles are spurious). The
        TOTAL per-tile shift is additionally clamped to the halo bound
        like the global shift, loudly: ``field_saturated`` + grow_halo
        retry.

    Returns:
      :class:`ShardedChangeResult`; pixel outputs keep row padding
      (slice ``[:H]`` on the host), shift/stats replicated.
      ``shift`` is the shift actually applied to the warp;
      ``shift_raw`` the phase-correlation estimate; if they differ
      (halo clamp), ``shift_saturated`` is True.
    """
    if mesh is None:
        mesh = local_mesh()
    if len(mesh.axis_names) == 1:
        ar, ac = mesh.axis_names[0], None
        dr, dc = int(mesh.devices.size), 1
    elif len(mesh.axis_names) == 2:
        ar, ac = mesh.axis_names
        dr, dc = (int(s) for s in mesh.devices.shape)
    else:
        raise ValueError("change_detection_mosaic: 1-D or 2-D mesh only")
    # One generic implementation: the 1-D (rows) mesh is exactly the
    # dc == 1 case of the row x column layout — column halos vanish,
    # dx is unbounded, the column all_gather is the identity — so the
    # shard body below serves both (bit-identity across mesh layouts is
    # asserted in tests/test_parallel.py).
    kind = IndexKind.parse(kind)
    axes = (ar,) if ac is None else (ar, ac)
    if early.shape != late.shape:
        raise ValueError(f"shape mismatch: {early.shape} vs {late.shape}")
    h, w = int(early.shape[0]), int(early.shape[1])
    n_valid = h * w
    orig_early, orig_late = early, late  # pre-padding, for the halo retry

    if pad_to is None:
        hp, wp = _ceil_to(h, dr), _ceil_to(w, dc)
    elif ac is None:
        hp, wp = int(pad_to), w
    else:
        hp, wp = (int(p) for p in pad_to)
    if hp % dr or hp < h or wp % dc or wp < w:
        raise ValueError(
            f"pad_to={(hp, wp)} not a device multiple >= {(h, w)}"
        )
    if (hp, wp) != (h, w):
        pad = ((0, hp - h), (0, wp - w), (0, 0))
        early = jnp.pad(early, pad)
        late = jnp.pad(late, pad)
    bh, bw = hp // dr, wp // dc
    halo = min(halo, bh) if dc == 1 else min(halo, bh, bw)
    if proxy_stride is None:
        stride = _pick_proxy_stride(h, bh)
        while stride > 1 and (dc > 1 and bw % stride):
            stride //= 2
    else:
        stride = proxy_stride
    if bh % stride or (dc > 1 and bw % stride):
        raise ValueError(
            f"proxy_stride {stride} must divide shard rows {bh}"
            + (f" and shard cols {bw}" if dc > 1 else "")
        )
    up = stride * upsample_factor
    if local_tile is not None:
        # Tiles must not straddle shard boundaries: rows shrink to a
        # divisor of the shard height (and columns of the shard width
        # on 2-D meshes; 1-D shards hold full rows, so tile columns
        # edge-pad at the true right edge exactly like
        # register.local.local_shift_field).
        th_t = _pick_tile_rows(bh, int(local_tile[0]))
        tw_t = (
            _pick_tile_rows(bw, int(local_tile[1])) if dc > 1
            else int(local_tile[1])
        )
        txs = -(-bw // tw_t)
        r_bound = (
            min(th_t, tw_t) / 4.0 if max_residual is None
            else float(max_residual)
        )

    def wb_one(tile_pl: jax.Array, mask: jax.Array) -> jax.Array:
        hist = jax.lax.psum(planar_histograms(tile_pl, mask=mask), axes)
        lo, hi = wb_bounds_from_histogram(hist, n=n_valid, cfg=wb_cfg)
        return apply_white_balance_planar(tile_pl, lo, hi, cfg=wb_cfg)

    def shard_fn(te: jax.Array, tl: jax.Array):
        row0 = jax.lax.axis_index(ar) * bh
        col0 = (
            jnp.int32(0) if ac is None else jax.lax.axis_index(ac) * bw
        )
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
        mask = (rows < h) & (cols < w)

        pe = jnp.moveaxis(te, -1, -3)
        plt = jnp.moveaxis(tl, -1, -3)
        if with_wb:
            pe = wb_one(pe, mask)
            plt = wb_one(plt, mask)
        wb_e = jnp.moveaxis(pe, -3, -1)   # (bh, bw, 3) uint8
        wb_l = jnp.moveaxis(plt, -3, -1)

        # -- coarse shift on the strided grayscale proxy ----------------
        maskf = mask.astype(jnp.float32)
        gray_e = luminance(wb_e) * maskf  # zero the padding rows/cols
        gray_l = luminance(wb_l) * maskf
        def gather_proxy(gray):
            p = gray[::stride, ::stride]
            if ac is not None:
                p = jax.lax.all_gather(p, ac, axis=1, tiled=True)
            return jax.lax.all_gather(p, ar, axis=0, tiled=True)

        # (hp/stride, wp/stride) when dc>1; cols local otherwise
        prox_e = gather_proxy(gray_e)
        prox_l = gather_proxy(gray_l)
        shift_p = phase_correlation_shift(
            prox_e, prox_l, upsample_factor=up
        )
        dy_raw = shift_p[0] * stride
        dx_raw = shift_p[1] * stride
        dy = jnp.clip(dy_raw, -(halo - 1), halo - 1)
        dx = dx_raw
        if dc > 1:
            dx = jnp.clip(dx_raw, -(halo - 1), halo - 1)
        shift = jnp.stack([dy, dx])
        shift_raw = jnp.stack([dy_raw, dx_raw])
        saturated = jnp.abs(dy_raw) > halo - 1
        if dc > 1:
            saturated |= jnp.abs(dx_raw) > halo - 1

        # -- sharded warp of the late image (row then column halos) -----
        halo_c = halo if dc > 1 else 0
        ext = exchange_halos(wb_l, halo, ar, dim=0)
        if dc > 1:
            ext = exchange_halos(ext, halo, ac, dim=1)
        field = field_sat = None
        if local_tile is None:
            aligned = bilinear_shift_2d_haloed(
                ext, dy, dx, row0, col0, h, w, halo, halo_c
            )
        else:
            # -- non-rigid residual field (shard-local tile batch) ----
            # Residuals are measured on the INTEGER-pre-shifted gray
            # (reflect indexing through the halo window — exact row/col
            # gathers, no bilinear blur; register.local
            # align_images_local rationale), then one field warp
            # applies global + residual in a single resampling pass.
            gy = jnp.round(dy)
            gx = jnp.round(dx)
            ext_g = exchange_halos(gray_l, halo, ar, dim=0)
            if dc > 1:
                ext_g = exchange_halos(ext_g, halo, ac, dim=1)
            gl_shift = bilinear_shift_2d_haloed(
                ext_g, gy, gx, row0, col0, h, w, halo, halo_c
            )
            pad_c = txs * tw_t - bw

            def tile_batch(g):
                gp = jnp.pad(g, ((0, 0), (0, pad_c)), mode="edge")
                return (
                    gp.reshape(bh // th_t, th_t, txs, tw_t)
                    .transpose(0, 2, 1, 3).reshape(-1, th_t, tw_t)
                )

            est = jax.vmap(
                lambda f, m: phase_correlation_shift(
                    f, m, upsample_factor=max(1, upsample_factor)
                )
            )(tile_batch(gray_e), tile_batch(gl_shift))
            resid = jnp.clip(
                est.reshape(bh // th_t, txs, 2), -r_bound, r_bound
            )
            # Overlap gate (register.local.align_images_local): a tile
            # keeps its residual only when >= 50% of its area maps to
            # real overlap under the integer global shift; padded-
            # remainder tiles (beyond h/w) always gate to 0.
            gyi, gxi = gy.astype(jnp.int32), gx.astype(jnp.int32)
            lo_y, hi_y = jnp.maximum(0, gyi), jnp.minimum(h, h + gyi)
            lo_x, hi_x = jnp.maximum(0, gxi), jnp.minimum(w, w + gxi)
            ty0 = row0 + jnp.arange(bh // th_t, dtype=jnp.int32) * th_t
            tx0 = col0 + jnp.arange(txs, dtype=jnp.int32) * tw_t
            vy = jnp.clip(
                jnp.minimum(hi_y, ty0 + th_t) - jnp.maximum(lo_y, ty0),
                0, th_t,
            )
            vx = jnp.clip(
                jnp.minimum(hi_x, tx0 + tw_t) - jnp.maximum(lo_x, tx0),
                0, tw_t,
            )
            frac = (
                (vy[:, None] * vx[None, :]).astype(jnp.float32)
                / float(th_t * tw_t)
            )
            resid = jnp.where(frac[..., None] >= 0.5, resid, 0.0)
            # Compose with the INTEGER pre-shift the residuals were
            # measured against (register.local.align_images_local) —
            # adding the fractional (dy, dx) would double-count its
            # subpixel remainder, which the per-tile estimates already
            # carry (caught on device: true 2.5-row shift -> applied
            # -2.75 instead of -2.5).
            total = resid + jnp.stack([gy, gx]).astype(jnp.float32)
            # Halo bound, loud like the global clamp: rows always;
            # columns only when sharded (1-D shards hold full rows).
            over = jnp.abs(total[..., 0]) > halo - 1
            if dc > 1:
                over |= jnp.abs(total[..., 1]) > halo - 1
            field_sat = jax.lax.pmax(
                jnp.any(over).astype(jnp.int32), axes
            ).astype(bool)
            bound_y = jnp.float32(halo - 1)
            tot_y = jnp.clip(total[..., 0], -bound_y, bound_y)
            tot_x = (
                jnp.clip(total[..., 1], -bound_y, bound_y)
                if dc > 1 else total[..., 1]
            )
            total = jnp.stack([tot_y, tot_x], axis=-1)
            field = jax.lax.all_gather(total, ar, axis=0, tiled=True)
            if dc > 1:
                field = jax.lax.all_gather(field, ac, axis=1, tiled=True)
            aligned = field_warp_haloed(
                ext, field, row0, col0, h, w, halo, halo_c,
                (th_t, tw_t),
            )

        # -- index maps + diff -------------------------------------------
        ia, ib = band_indices(kind)
        early_idx = index_from_bands(
            pe[ia].astype(jnp.float32), pe[ib].astype(jnp.float32),
            cfg=idx_cfg,
        )
        late_idx = index_from_bands(
            aligned[..., ia], aligned[..., ib], cfg=idx_cfg
        )
        diff = late_idx - early_idx

        # -- exact gathered diff stats ------------------------------------
        mean = jax.lax.psum(jnp.sum(diff * maskf), axes) / n_valid
        var = jax.lax.psum(
            jnp.sum(jnp.square(diff - mean) * maskf), axes
        ) / n_valid
        mn = jax.lax.pmin(jnp.min(jnp.where(mask, diff, jnp.inf)), axes)
        mx = jax.lax.pmax(jnp.max(jnp.where(mask, diff, -jnp.inf)), axes)
        # Distributed Pallas radix-select (~3x cheaper than the jnp
        # masked radix, see mosaic.py): full-width shards mask a flat
        # row prefix; column-sharded blocks mask the rectangular
        # rows_live x cols_live region.
        from rgnir_tpu.kernels.select import masked_median_pallas_sharded

        if dc == 1:
            n_live = jnp.clip(h - row0, 0, bh) * w
            med = masked_median_pallas_sharded(diff, n_valid, n_live, axes)
        else:
            med = masked_median_pallas_sharded(
                diff, n_valid, None, axes,
                live_rc=(
                    jnp.clip(h - row0, 0, bh), jnp.clip(w - col0, 0, bw)
                ),
            )
        stats = DiffStats(
            mean=mean, std=jnp.sqrt(var), min=mn, max=mx, median=med,
            n=jnp.int32(n_valid),
        )
        out = (early_idx, late_idx, diff, shift, stats, shift_raw,
               saturated)
        if local_tile is not None:
            out += (field, field_sat)
        return out

    spec = P(ar) if ac is None else P(ar, ac)
    out_specs = (spec, spec, spec, P(), P(), P(), P())
    if local_tile is not None:
        out_specs += (P(), P())
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec, spec),
        out_specs=out_specs,
        check_vma=False,
    )
    outs = jax.jit(fn)(early, late)
    early_idx, late_idx, diff, shift, stats, shift_raw, saturated = (
        outs[:7]
    )
    field = outs[7] if local_tile is not None else None
    field_sat = outs[8] if local_tile is not None else None
    needs_retry = bool(saturated) or (
        local_tile is not None and bool(field_sat)
    )
    if grow_halo and needs_retry:
        raw = jax.device_get(shift_raw)
        need = abs(float(raw[0]))
        if dc > 1:
            need = max(need, abs(float(raw[1])))
        if local_tile is not None and bool(field_sat):
            # The field clamps total = global + residual; residual is
            # bounded by r_bound, so halo'ing for |global| + r_bound
            # covers every tile.
            need = need + r_bound
        import math

        needed_halo = math.ceil(need) + 1
        cap = bh if dc == 1 else min(bh, bw)
        if needed_halo > halo and min(needed_halo, cap) > halo:
            return change_detection_mosaic(
                orig_early, orig_late, kind, mesh=mesh,
                halo=min(needed_halo, cap), proxy_stride=stride,
                upsample_factor=upsample_factor, with_wb=with_wb,
                wb_cfg=wb_cfg, idx_cfg=idx_cfg, pad_to=pad_to,
                grow_halo=False, local_tile=local_tile,
                max_residual=max_residual,
            )
    return ShardedChangeResult(
        early_index=early_idx, late_index=late_idx, diff=diff,
        shift=shift, stats=stats, shift_raw=shift_raw,
        shift_saturated=saturated, field=field,
        field_saturated=field_sat,
    )
