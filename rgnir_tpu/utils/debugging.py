"""Numeric sanity guards (SURVEY.md section 5 race/sanitizer row).

XLA programs are data-race-free by construction, so the analogue of a
sanitizer here is *numeric*: NaN/Inf detection on pipeline outputs. For
interactive debugging, enable JAX's global mode::

    jax.config.update("jax_debug_nans", True)

For production pipelines, :func:`check_finite` validates a whole output
pytree with one fused device reduction.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def nonfinite_counts(tree: Any) -> dict:
    """Per-leaf count of non-finite values (floating leaves only)."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            key = jax.tree_util.keystr(path)
            out[key] = int(jnp.sum(~jnp.isfinite(leaf)))
    return out


def check_finite(tree: Any, name: str = "output") -> None:
    """Raise FloatingPointError if any floating leaf holds NaN/Inf."""
    bad = {k: v for k, v in nonfinite_counts(tree).items() if v}
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")
