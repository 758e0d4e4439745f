"""Kernel-backed analyze pipeline — drop-in for pipeline.fused.analyze_image.

Composition: histogram kernel (WB bounds) -> fused analyze kernel
(WB + indices + stats partials + renders, one image read) -> batched
radix-select median kernel over the index maps. Assembles the same
AnalyzeResult as the jnp path; parity-tested against it (bit-exact on
CPU interpret and real TPU).

Batching note: every kernel batches NATIVELY. The hist/fused kernels
stack frames along their flat row dimension (one grid, per-frame
accumulator blocks — kernels/{hist,fused}.py ``spf``); the select
kernel batches through its own leading grid dimension and consumes the
fused kernel's raw ``idx_rows`` output directly
(``masked_median_pallas_rows`` — no repack pass). vmap batching was
measured ~1.35x (fused) / ~2.6x (hist) slower per pixel on real Mosaic
(the batch grid dim breaks Mosaic's block streaming) and is no longer
used anywhere in this path.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rgnir_tpu.config import ALL_INDICES, IndexKind, WBConfig
from rgnir_tpu.kernels.fused import (
    S_ABOVE,
    S_HIST,
    S_MAX,
    S_MIN,
    S_SUM,
    S_SUMSQ,
    fused_analyze_pallas,
    unpack_rgb_hwc,
)
from rgnir_tpu.kernels.hist import (
    planar_histograms_pallas,
    planar_histograms_pallas_batched,
)
from rgnir_tpu.kernels.select import masked_median_pallas_rows
from rgnir_tpu.ops.indices import band_indices
from rgnir_tpu.ops.stats import IndexStats
from rgnir_tpu.ops.wb import wb_bounds_from_histogram
from rgnir_tpu.pipeline.fused import AnalyzeResult


def _median_plan(kinds: Tuple[IndexKind, ...]):
    """Antipodal-kind median plan.

    A kind whose band pair is the SWAP of an earlier kind's has an
    exactly negated index map: numerators negate exactly and the eps
    denominators are identical because f32 addition is commutative
    ((g - n)/(g + n + eps) == -((n - g)/(n + g + eps)) bitwise; NDWI vs
    GNDVI, ops/indices.py). Since f32 negation commutes exactly with
    every reduction add and with the even-n midpoint average, the
    derived kind's median is the exact negation of its partner's — its
    radix-select rounds, round-0 histogram, successor pass, and
    variance pass can all be skipped.

    Returns ``(nc, slots)`` — the first ``nc`` kinds are canonical and
    ``slots[k] = (canonical position, negate)`` — or ``None`` when
    nothing is derivable or the canonical kinds are not a prefix of the
    tuple (the kernel's take_prefix layout needs a prefix; any order of
    ALL_INDICES with NDWI after GNDVI qualifies).
    """
    pair_slot = {}
    slots = []
    canon_positions = []
    for k, kind in enumerate(kinds):
        ia, ib = band_indices(kind)
        if (ib, ia) in pair_slot:
            slots.append((pair_slot[(ib, ia)], True))
        elif (ia, ib) in pair_slot:
            slots.append((pair_slot[(ia, ib)], False))
        else:
            pair_slot[(ia, ib)] = len(canon_positions)
            slots.append((len(canon_positions), False))
            canon_positions.append(k)
    nc = len(canon_positions)
    if nc == len(kinds) or canon_positions != list(range(nc)):
        return None
    return nc, tuple(slots)


def _core(img_hwc: jax.Array, kinds: Tuple[IndexKind, ...],
          wb_cfg: WBConfig, with_renders: bool, with_hist: bool,
          round0_kinds=None, packed_out: bool = False, antipodal=None):
    h, w = img_hwc.shape[0], img_hwc.shape[1]
    pl_img = jnp.moveaxis(img_hwc, -1, -3)
    hist = planar_histograms_pallas(pl_img)
    lo, hi = wb_bounds_from_histogram(hist, n=h * w, cfg=wb_cfg)
    # with_round0: the fused kernel emits the median select's round-0
    # byte histogram while the index maps are in VMEM, saving the
    # select one full HBM pass (int32 accumulation — exact).
    # round0_digit="q24": the round-0 digit is the render byte, so the
    # fused kernel reuses the colormap one-hots for the select's round-0
    # histogram, and the select runs the 3-round quantized path (exact
    # for index maps — see masked_median_pallas ``quantized``).
    # with_idx_rows: the index maps also come back in the select's
    # (K, R, 1024) row layout — zero-copy hand-off to the radix select
    # (skips its repack/repad pass on non-row-aligned shapes).
    return fused_analyze_pallas(
        pl_img, lo, hi, kinds, with_renders=with_renders,
        with_round0=True, with_hist=with_hist,
        round0_kinds=round0_kinds, packed_out=packed_out,
        round0_digit="q24", antipodal=antipodal, with_idx_rows=True,
        bounds_nonneg=True,
    )


def _core_batched(img_bhwc: jax.Array, kinds: Tuple[IndexKind, ...],
                  wb_cfg: WBConfig, with_renders: bool, with_hist: bool,
                  round0_kinds=None, packed_out: bool = False,
                  antipodal=None):
    """Natively batched core: frames ride the kernels' flat row
    dimension (kernels/{hist,fused}.py ``spf``) instead of a vmap batch
    grid dim — bit-identical per-frame results, none of the batch-dim
    Mosaic tax (measured ~1.35x fused / ~2.6x hist per pixel)."""
    b, h, w = img_bhwc.shape[0], img_bhwc.shape[1], img_bhwc.shape[2]
    pl_img = jnp.moveaxis(img_bhwc, -1, 0)  # (3, B, H, W) — one transpose
    hist = planar_histograms_pallas_batched(pl_img)  # (B, C, 256)
    lo, hi = wb_bounds_from_histogram(hist, n=h * w, cfg=wb_cfg)  # (B, C)
    return fused_analyze_pallas(
        pl_img, lo, hi, kinds, with_renders=with_renders,
        with_round0=True, with_hist=with_hist,
        round0_kinds=round0_kinds, packed_out=packed_out,
        round0_digit="q24", antipodal=antipodal, with_idx_rows=True,
        bounds_nonneg=True,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "kinds", "with_renders", "with_hist", "packed_out",
        "select_onepass",
    ),
)
def analyze_image_kernel(
    img: jax.Array,
    kinds: Tuple[str, ...] = tuple(k.value for k in ALL_INDICES),
    with_renders: bool = True,
    with_hist: bool = True,
    packed_out: bool = False,
    select_onepass: Optional[bool] = None,
) -> AnalyzeResult:
    """Kernel-backed fused analysis of ``(H, W, 3)`` or ``(B, H, W, 3)``.

    Variance is two-pass (centered on the kernel's exact mean) — see
    the inline note below; all other stats come straight from the
    kernel partials, and medians from the batched radix-select kernel.

    ``with_hist=False`` skips the 50-bin index histogram and returns
    ``IndexStats.histogram=None`` (explicit, never silent zeros) — the
    reference's analyze_index (process-images.py:492-513) computes no
    histogram, so stats-parity workloads need not pay for one.
    """
    kinds = tuple(IndexKind.parse(k) for k in kinds)
    cfg = WBConfig()
    batched = img.ndim == 4
    h, w = img.shape[-3], img.shape[-2]
    n = h * w

    # Antipodal-kind plan: derived kinds (e.g. NDWI given GNDVI) skip
    # their round-0 histogram in the fused kernel, their radix-select
    # rounds (the select takes only the canonical prefix — skipped rows
    # never leave HBM), their successor pass, and their variance pass;
    # the median is the exact negation and the variance is bitwise
    # identical (see _median_plan).
    plan = _median_plan(kinds)
    nk = len(kinds)
    if plan is not None:
        nc, slots = plan
        round0_kinds = (True,) * nc + (False,) * (nk - nc)
        # Derived kinds compute their index map as one exact negate
        # inside the fused kernel and skip their sum/sumsq/min/max
        # reductions — those stats are negations of the partner's
        # (canonical kinds are a prefix, so the canonical slot IS the
        # partner's kind index).
        antipodal = tuple(
            slots[k][0] if slots[k][1] else None for k in range(nk)
        )
    else:
        nc, slots = nk, tuple((k, False) for k in range(nk))
        round0_kinds = None
        antipodal = None

    if batched:
        out = _core_batched(img, kinds, cfg, with_renders, with_hist,
                            round0_kinds, packed_out, antipodal)
        # kind-major layouts: wb_pl (3,B,H,W), idx (K,B,H,W), rgb
        # (K,3,B,H,W), stats (B,K,128), r0 (B,K,256), idx_rows
        # (K,B,R,1024) (packed_out: wb (B,H,W) i32, rgb (K,B,H,W) i32)
    else:
        out = _core(img, kinds, cfg, with_renders, with_hist, round0_kinds,
                    packed_out, antipodal)
    wb_pl, idx, rgb, stats, r0, idx_rows = out
    # packed_out: HWC u8 via bitcast+slice (no transpose pass); else the
    # planar->HWC moveaxis (a real transpose on device).
    if packed_out:
        wb = unpack_rgb_hwc(wb_pl)
    else:
        wb = jnp.moveaxis(wb_pl, 0, -1)  # channel dim leads in both modes

    # Two-pass variance rides the select's tail kernel (means=...): the
    # kernel's one-pass E[x^2]-E[x]^2 partials cancel catastrophically
    # for tightly clustered indices (std error up to ~3e-4 — visible at
    # the reference's 4-decimal reporting), so variance is centered on
    # the exact mean — but instead of its own full read of the index
    # maps, the centered sum of squares accumulates inside the tail
    # kernel's single recovery/successor pass (kernels/select.py
    # _q24_tail_kernel). Only canonical kinds pay: a derived kind's
    # centered squares are bitwise identical to its partner's.
    means_all = stats[..., S_SUM] / n                      # (B,K) or (K,)

    # One radix-select launch covers every canonical (batch, kind)
    # median: the select kernel batches through its leading grid
    # dimension, so fusing B*nc selections into one call saves K*4
    # kernel dispatches; the fused kernel's round-0 histogram saves one
    # of the four data passes, and the kernel's raw idx_rows feed the
    # select directly (no repack/repad pass — masked_median_pallas_rows).
    # Rows are KIND-major, so the canonical kinds are a plain prefix.
    take = nc if nc < nk else None
    if batched:
        b = img.shape[0]
        rows = idx_rows.reshape(nk * b, idx_rows.shape[-2], 1024)
        r0c = jnp.swapaxes(r0[:, :nc, :], 0, 1).reshape(nc * b, 256)
        means_c = jnp.swapaxes(means_all[:, :nc], 0, 1).reshape(-1)
        meds_f, sumsq_f = masked_median_pallas_rows(
            rows, n, take=(nc * b if take is not None else None),
            round0_hist=r0c, means=means_c, onepass=select_onepass,
        )  # each (nc*B,) kind-major
        meds_c = jnp.swapaxes(meds_f.reshape(nc, b), 0, 1)    # (B, nc)
        sumsq_c = jnp.swapaxes(sumsq_f.reshape(nc, b), 0, 1)
    else:
        meds_c, sumsq_c = masked_median_pallas_rows(
            idx_rows, n, take=take, round0_hist=r0[:nc],
            means=means_all[:nc], onepass=select_onepass,
        )  # each (nc,)
    vars_c = sumsq_c / n

    indices: Dict[str, jax.Array] = {}
    renders: Dict[str, jax.Array] = {}
    out_stats: Dict[str, IndexStats] = {}
    for k, kind in enumerate(kinds):
        idx_k = idx[k]  # kind dim leads in both modes
        indices[kind.value] = idx_k
        if with_renders:
            rgb_k = rgb[k]
            renders[kind.value] = (
                unpack_rgb_hwc(rgb_k) if packed_out
                else jnp.moveaxis(rgb_k, 0, -1)
            )
        s = stats[:, k] if batched else stats[k]
        slot, negate = slots[k]
        var = vars_c[..., slot]
        med = meds_c[..., slot]
        if negate:
            # The kernel skipped this kind's sum/sumsq/min/max (its map
            # is the exact negation of the partner's, and f32 negation
            # commutes with every reduction): derive them — bitwise
            # what the skipped reductions would have produced.
            sp = stats[..., slot, :]
            med = -med
            mean = -means_all[..., slot]
            s_min, s_max = -sp[..., S_MAX], -sp[..., S_MIN]
        else:
            mean = means_all[..., k]
            s_min, s_max = s[..., S_MIN], s[..., S_MAX]
        out_stats[kind.value] = IndexStats(
            mean=mean,
            median=med,
            std=jnp.sqrt(var),
            min=s_min,
            max=s_max,
            coverage_pct=s[..., S_ABOVE] / n * 100.0,
            histogram=(
                s[..., S_HIST:S_HIST + 50].astype(jnp.int32)
                if with_hist else None
            ),
            n=jnp.full(mean.shape, n, jnp.int32),
        )
    return AnalyzeResult(
        wb=wb, indices=indices, stats=out_stats, renders=renders
    )
