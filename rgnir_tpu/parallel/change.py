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
from rgnir_tpu.ops.indices import BAND_INDICES, index_from_bands
from rgnir_tpu.ops.wb import apply_white_balance_planar, wb_bounds_from_histogram
from rgnir_tpu.parallel.halo import exchange_halos
from rgnir_tpu.parallel.mesh import local_mesh
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
        ext = exchange_halos(wb_l, halo, ar, dim=0)
        if dc > 1:
            ext = exchange_halos(ext, halo, ac, dim=1)
            aligned = bilinear_shift_2d_haloed(
                ext, dy, dx, row0, col0, h, w, halo, halo
            )
        else:
            aligned = bilinear_shift_2d_haloed(
                ext, dy, dx, row0, jnp.int32(0), h, w, halo, 0
            )

        # -- index maps + diff -------------------------------------------
        ia, ib = BAND_INDICES[kind]
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
        return early_idx, late_idx, diff, shift, stats, shift_raw, saturated

    spec = P(ar) if ac is None else P(ar, ac)
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec, spec, P(), P(), P(), P()),
        check_vma=False,
    )
    early_idx, late_idx, diff, shift, stats, shift_raw, saturated = (
        jax.jit(fn)(early, late)
    )
    if grow_halo and bool(saturated):
        raw = jax.device_get(shift_raw)
        need = abs(float(raw[0]))
        if dc > 1:
            need = max(need, abs(float(raw[1])))
        import math

        needed_halo = math.ceil(need) + 1
        cap = bh if dc == 1 else min(bh, bw)
        if needed_halo > halo and min(needed_halo, cap) > halo:
            return change_detection_mosaic(
                orig_early, orig_late, kind, mesh=mesh,
                halo=min(needed_halo, cap), proxy_stride=stride,
                upsample_factor=upsample_factor, with_wb=with_wb,
                wb_cfg=wb_cfg, idx_cfg=idx_cfg, pad_to=pad_to,
                grow_halo=False,
            )
    return ShardedChangeResult(
        early_index=early_idx, late_index=late_idx, diff=diff,
        shift=shift, stats=stats, shift_raw=shift_raw,
        shift_saturated=saturated,
    )
