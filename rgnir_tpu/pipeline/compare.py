"""Multi-image comparison analysis (reference: process-images.py:1400-1602).

Flow parity: load selected images -> downscale to the 1024 analysis cap
(1444) -> original side-by-side (1451) -> white balance each (1456-1459)
-> WB side-by-side (1471) -> per selected index: index maps + per-image
stats + annotated comparison (1509-1535) -> optional ZIP export
(rgnir_tpu.pipeline.export).

TPU-native: same-shape images batch through one fused device pass
(per-image percentiles/stats, as the reference's per-image loop); ragged
shapes fall back to per-shape jit-cached calls.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from PIL import Image

from rgnir_tpu.config import ALL_INDICES, IndexKind, MAX_ANALYSIS_DIM
from rgnir_tpu.ops.resize import preprocess_large_image
from rgnir_tpu.ops.stats import to_analyze_index_dict
from rgnir_tpu.pipeline.dispatch import analyze_image_auto
from rgnir_tpu.viz.figures import render_comparison_figure


@dataclasses.dataclass
class CompareResult:
    original_figure: Optional[Image.Image]
    wb_figure: Optional[Image.Image]
    index_figures: Dict[str, Image.Image]
    index_stats: Dict[str, Dict[str, dict]]  # kind -> filename -> stats dict
    wb_arrays: List[np.ndarray]
    index_arrays: Dict[str, List[np.ndarray]]


def comparison_analysis(
    images: Sequence[Tuple[str, np.ndarray]],
    kinds: Sequence[Union[IndexKind, str]] = ALL_INDICES,
    max_dim: int = MAX_ANALYSIS_DIM,
    with_figures: bool = True,
) -> CompareResult:
    """Compare N images: originals, white-balanced, and per-index views.

    Args:
      images: (filename, HWC uint8 array) pairs.
      kinds: indices to analyze.
    """
    kinds = tuple(IndexKind.parse(k) for k in kinds)
    # Stats are keyed by filename (reference contract,
    # process-images.py:765); duplicate basenames (e.g. 2024/field.png
    # vs 2025/field.png via the CLI) would silently overwrite each
    # other's stats AND mislabel the figure panels, so repeats get a
    # disambiguating suffix.
    names: List[str] = []
    seen_names: Dict[str, int] = {}
    for name, _ in images:
        n = seen_names.get(name, 0) + 1
        seen_names[name] = n
        names.append(name if n == 1 else f"{name} ({n})")
    arrays = [
        np.asarray(preprocess_large_image(jnp.asarray(arr), max_dim))
        for _, arr in images
    ]

    # Group by shape for batched device passes.
    wb_arrays: List[Optional[np.ndarray]] = [None] * len(arrays)
    index_arrays: Dict[str, List[Optional[np.ndarray]]] = {
        k.value: [None] * len(arrays) for k in kinds
    }
    stats_by_kind: Dict[str, Dict[str, dict]] = {k.value: {} for k in kinds}
    groups: Dict[tuple, List[int]] = {}
    for i, arr in enumerate(arrays):
        groups.setdefault(arr.shape, []).append(i)
    for shape, idxs in groups.items():
        batch = jnp.asarray(np.stack([arrays[i] for i in idxs]))
        res = analyze_image_auto(
            batch, kinds=tuple(k.value for k in kinds), with_renders=False
        )
        wb_np = np.asarray(res.wb)
        for pos, i in enumerate(idxs):
            wb_arrays[i] = wb_np[pos]
            for kind in kinds:
                index_arrays[kind.value][i] = np.asarray(
                    res.indices[kind.value][pos]
                )
                st = res.stats[kind.value]
                picked = jax.tree_util.tree_map(lambda a: a[pos], st)
                stats_by_kind[kind.value][names[i]] = to_analyze_index_dict(
                    picked, kind
                )

    original_fig = wb_fig = None
    index_figs: Dict[str, Image.Image] = {}
    if with_figures:
        original_fig, _ = render_comparison_figure(
            [{"filename": n, "array": a} for n, a in zip(names, arrays)]
        )
        wb_fig, _ = render_comparison_figure(
            [{"filename": n, "array": a} for n, a in zip(names, wb_arrays)]
        )
        for kind in kinds:
            fig, _ = render_comparison_figure(
                [
                    {
                        "filename": n,
                        "array": index_arrays[kind.value][i],
                        "stats": stats_by_kind[kind.value][n],
                    }
                    for i, n in enumerate(names)
                ],
                index_type=kind,
            )
            index_figs[kind.value] = fig
    return CompareResult(
        original_figure=original_fig,
        wb_figure=wb_fig,
        index_figures=index_figs,
        index_stats=stats_by_kind,
        wb_arrays=[a for a in wb_arrays],
        index_arrays={k: list(v) for k, v in index_arrays.items()},
    )
