"""Time-series site monitoring (reference: process-images.py:619-667,
801-883, and the UI generate-flow at 1114-1196).

Parity flow: a site's images sorted oldest-first (process-images.py:396)
-> per-image downscale to the 1024 analysis cap + white balance
(1130-1134) -> per-date index stats table (Date/Mean/Median/Min/Max/
Coverage, 647-657) -> error-bar time-series figure (801-883) -> change
detection between first and last (1159).

TPU-native improvements over the reference:
- stats are computed ONCE per image; the reference runs the whole index
  computation twice (once for the plot at 814-834, once for the table at
  633-663 — SURVEY.md section 3.3 flags it as the inefficiency not to copy),
- same-shape images batch through a single fused device pass.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

import jax.numpy as jnp
from PIL import Image

from rgnir_tpu.config import IndexKind, MAX_ANALYSIS_DIM
from rgnir_tpu.ops.resize import preprocess_large_image
from rgnir_tpu.pipeline.change import change_detection
from rgnir_tpu.pipeline.dispatch import analyze_image_auto
from rgnir_tpu.viz.figures import render_time_series_figure


@dataclasses.dataclass
class TimeSeriesResult:
    table: "object"                      # pandas.DataFrame of per-date stats
    figure: Optional[Image.Image]        # error-bar plot (>=2 images)
    change: Optional[dict]               # first-vs-last change_detection()
    wb_arrays: List[np.ndarray]          # corrected arrays, date order
    # Optional consecutive-pair change series (one vmapped device pass;
    # see pipeline.change.change_series_maps): {"pairs": [(d0, d1), ..],
    # "diffs": (T-1, H, W), "shifts": (T-1, 2), "stats": {...}}.
    series_changes: Optional[dict] = None


def time_series_analysis(
    dated_images: Sequence[Tuple["object", np.ndarray]],
    kind: Union[IndexKind, str],
    max_dim: int = MAX_ANALYSIS_DIM,
    with_figures: bool = True,
    with_change: bool = True,
    with_series_changes: bool = False,
) -> TimeSeriesResult:
    """Analyze a date-ordered sequence of (date, HWC uint8 array).

    The per-date table columns mirror calculate_index_statistics_by_
    timeframe (process-images.py:651-657): Date, Mean, Median, Min, Max,
    '{Vegetation|Water} Coverage (%)'.
    """
    import pandas as pd

    kind = IndexKind.parse(kind)
    dates = [d for d, _ in dated_images]
    arrays = [
        np.asarray(preprocess_large_image(jnp.asarray(a), max_dim))
        for _, a in dated_images
    ]

    wb_arrays: List[Optional[np.ndarray]] = [None] * len(arrays)
    means = np.zeros(len(arrays))
    medians = np.zeros(len(arrays))
    mins = np.zeros(len(arrays))
    maxs = np.zeros(len(arrays))
    coverage = np.zeros(len(arrays))

    groups: Dict[tuple, List[int]] = {}
    for i, arr in enumerate(arrays):
        groups.setdefault(arr.shape, []).append(i)
    for shape, idxs in groups.items():
        batch = jnp.asarray(np.stack([arrays[i] for i in idxs]))
        res = analyze_image_auto(batch, kinds=(kind.value,), with_renders=False)
        st = res.stats[kind.value]
        wb_np = np.asarray(res.wb)
        for pos, i in enumerate(idxs):
            wb_arrays[i] = wb_np[pos]
            means[i] = float(st.mean[pos])
            medians[i] = float(st.median[pos])
            mins[i] = float(st.min[pos])
            maxs[i] = float(st.max[pos])
            coverage[i] = float(st.coverage_pct[pos])

    table = pd.DataFrame(
        [
            {
                "Date": dates[i],
                "Mean": means[i],
                "Median": medians[i],
                "Min": mins[i],
                "Max": maxs[i],
                f"{kind.feature_name} Coverage (%)": coverage[i],
            }
            for i in range(len(arrays))
        ]
    )

    figure = None
    if with_figures and len(arrays) >= 2:
        figure = render_time_series_figure(dates, means, mins, maxs, kind)

    change = None
    if (
        with_change
        and len(arrays) >= 2
        # Mismatched endpoint shapes (e.g. a portrait and a landscape
        # capture) cannot be aligned; skip the change step rather than
        # aborting the whole analysis (table + figure stay useful).
        and wb_arrays[0].shape == wb_arrays[-1].shape
    ):
        def _label(d) -> str:
            return d.strftime("%Y-%m-%d") if hasattr(d, "strftime") else str(d)

        change = change_detection(
            wb_arrays[0], wb_arrays[-1], kind,
            early_label=_label(dates[0]), late_label=_label(dates[-1]),
            with_figure=with_figures,
        )
    series_changes = None
    if (
        with_series_changes
        and len(arrays) >= 2
        and len({a.shape for a in wb_arrays}) == 1
    ):
        from rgnir_tpu.pipeline.change import change_series_maps

        diffs, shifts, sstats = change_series_maps(
            jnp.asarray(np.stack(wb_arrays)), kind
        )
        series_changes = {
            "pairs": list(zip(dates[:-1], dates[1:])),
            "diffs": np.asarray(diffs),
            "shifts": np.asarray(shifts),
            "stats": {k: np.asarray(v) for k, v in sstats.items()},
        }
    return TimeSeriesResult(
        table=table, figure=figure, change=change,
        wb_arrays=[a for a in wb_arrays],
        series_changes=series_changes,
    )
