"""Headless batch directory pipeline (reference: backend-process.py:49-97).

Reference semantics reproduced:
- input filter on {.tif,.tiff,.png,.jpg,.jpeg} (backend-process.py:88-89),
- output tree ``{out}/white_balanced/{stem}_wb.tif`` (when WB saving is
  on) and ``{out}/{INDEX}/{stem}_{index}.png`` (backend-process.py:55-72),
- per-file continue-on-error (backend-process.py:93-97),
- ``Processing {i}/{total}`` progress (backend-process.py:94) via logger.

TPU-native redesign: instead of a sequential decode -> compute -> figure
loop, images stream through the async BatchLoader into same-shape device
batches; one jit-compiled fused pass produces WB + all index renders for
the whole batch; an AsyncWriter overlaps PNG/TIFF encode with the next
batch's compute. Adds a resumable manifest (SURVEY.md section 5) the
reference lacks.

Output fidelity note: by default index PNGs are full-resolution
device-rendered colormap images (exact matplotlib LUT parity, see
rgnir_tpu.ops.colormap). ``figures=True`` instead writes the reference's
matplotlib figure (with colorbar, 10x8 in @100 dpi,
backend-process.py:40-47) at figure-render speed.
"""

from __future__ import annotations

import collections
from pathlib import Path
from typing import Callable, List, Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp

from rgnir_tpu.config import ALL_INDICES, IndexKind, LoaderConfig
from rgnir_tpu.io.decode import IMAGE_EXTENSIONS
from rgnir_tpu.io.loader import BatchLoader
from rgnir_tpu.io.writer import AsyncWriter
from rgnir_tpu.utils.logging import get_logger
from rgnir_tpu.utils.manifest import Manifest

logger = get_logger("rgnir_tpu.batch")


def list_input_images(input_dir: Union[str, Path]) -> List[Path]:
    """Non-recursive glob filtered by extension (backend-process.py:88-89)."""
    input_path = Path(input_dir)
    return sorted(
        p for p in input_path.glob("*") if p.suffix.lower() in IMAGE_EXTENSIONS
    )


def _batch_forward(images: jax.Array, kinds, figures: bool):
    from rgnir_tpu.pipeline.dispatch import analyze_image_auto

    # In figures mode the matplotlib composer consumes the float index
    # maps; in the default mode the device produces finished colormap
    # renders. Never compute both.
    res = analyze_image_auto(images, kinds=kinds, with_renders=not figures)
    return res.wb, res.indices if figures else res.renders


def batch_process(
    input_dir: Union[str, Path],
    output_dir: Union[str, Path],
    save_wb: bool = False,
    indices: Sequence[Union[IndexKind, str]] = ALL_INDICES,
    loader_cfg: LoaderConfig = LoaderConfig(),
    figures: bool = False,
    resume: bool = True,
    progress: Optional[Callable[[int, int, Path], None]] = None,
    fig_png_compress: int = 1,
) -> dict:
    """Process a directory; returns a summary dict.

    Summary: {"processed": int, "skipped": int, "failed": [(path, err)]}.

    ``fig_png_compress``: zlib level for figure-mode PNGs (pixels are
    identical at every level). Level 1 is the size/speed default; 0
    writes stored (uncompressed) PNGs ~30 ms/figure faster on this
    class of host at ~5x the file size — the e2e benchmark reports
    both (benchmarks/end_to_end.py).
    """
    output_path = Path(output_dir)
    output_path.mkdir(parents=True, exist_ok=True)
    kinds = tuple(IndexKind.parse(k) for k in indices)
    kind_names = tuple(k.value for k in kinds)

    files = list_input_images(input_dir)
    total = len(files)
    manifest = Manifest(output_path / ".manifest.jsonl")
    todo = [p for p in files if not (resume and manifest.is_done(p))]
    skipped = total - len(todo)
    if skipped:
        logger.info("resuming: %d/%d already done", skipped, total)

    failed: List[tuple] = []
    processed = 0
    out_to_input: dict = {}
    loader = BatchLoader(todo, cfg=loader_cfg)
    writer = AsyncWriter(loader_cfg.encode_workers)
    if figures:
        from rgnir_tpu.viz.figures import IndexFigureWriter

        fig_writer = IndexFigureWriter(compress_level=fig_png_compress)

    def dispatch(batch):
        """Enqueue device compute + async device->host copies, no blocking.

        jit dispatch is async, and ``copy_to_host_async`` starts the
        (tunnel-expensive) transfers in the runtime's own threads; the
        blocking ``np.asarray`` happens one batch later, after the host
        has spent its time composing figures / submitting encodes — so
        device time hides behind host time instead of adding to it.
        """
        wb, per_kind = _batch_forward(
            jnp.asarray(batch.images), kind_names, figures
        )
        # Fetch only what will be written (device->host transfers are
        # expensive, especially through a tunneled chip).
        if save_wb:
            wb.copy_to_host_async()
        for arr in per_kind.values():
            arr.copy_to_host_async()
        return batch, wb, per_kind

    try:
        done_counter = skipped
        pending = collections.deque()
        loader_iter = iter(loader)
        exhausted = False
        while True:
            if not exhausted and len(pending) < 2:
                try:
                    pending.append(dispatch(next(loader_iter)))
                    continue
                except StopIteration:
                    exhausted = True
            if not pending:
                break
            batch, wb, per_kind = pending.popleft()
            wb_np = np.asarray(wb) if save_wb else None
            per_kind_np = {k: np.asarray(v) for k, v in per_kind.items()}
            for j, path in enumerate(batch.paths):
                done_counter += 1
                logger.info(
                    "Processing %d/%d: %s", done_counter, total, path.name
                )
                outputs = []
                stem = path.stem
                if save_wb:
                    out = output_path / "white_balanced" / f"{stem}_wb.tif"
                    writer.submit_array(out, wb_np[j])
                    outputs.append(out)
                for kind in kinds:
                    out = (
                        output_path / kind.value
                        / f"{stem}_{kind.value.lower()}.png"
                    )
                    if figures:
                        # Serial on the main thread: matplotlib's locks
                        # make threads slower (measured 2x), and this
                        # host has ONE core, so process pools only add
                        # IPC overhead. The reused-figure writer cuts
                        # composition from ~0.27 s to ~0.15 s per
                        # 10x8in@100dpi figure (pixel-identical); that
                        # is the hard floor of figure mode on a single
                        # core — the reference recreates the figure
                        # per image and pays the full cost.
                        out.parent.mkdir(parents=True, exist_ok=True)
                        fig_writer.write(
                            per_kind_np[kind.value][j], kind, out
                        )
                    else:
                        writer.submit_array(out, per_kind_np[kind.value][j])
                    outputs.append(out)
                for out in outputs:
                    out_to_input[out] = path
                manifest.mark(path, "done", outputs=outputs)
                processed += 1
                if progress is not None:
                    progress(done_counter, total, path)
        for failure in loader.failures:
            logger.error(
                "Error processing %s: %s", failure.path.name, failure.error
            )
            manifest.mark(failure.path, "failed", error=str(failure.error))
            failed.append((failure.path, failure.error))
    finally:
        write_errors = writer.close()
        # Async write failures surface only at close(); re-mark their
        # source inputs as failed so a resumed run retries them instead
        # of trusting the optimistic "done" written at submit time.
        refail: dict = {}
        for out, err in write_errors:
            src = out_to_input.get(out)
            if src is not None and src not in refail:
                refail[src] = err
        for src, err in refail.items():
            manifest.mark(src, "failed", error=f"write failed: {err}")
        manifest.close()
    for path, err in write_errors:
        logger.error("Write failed %s: %s", path, err)
        failed.append((path, err))
    return {"processed": processed, "skipped": skipped, "failed": failed}
