"""Multi-host data plane: per-host row bands into one global mosaic.

SURVEY.md section 5 defines the TPU-native distributed backend as JAX
collectives over ICI/DCN *plus* a host-side data plane that feeds
per-process shards via ``jax.make_array_from_process_local_data``. The
reference has nothing distributed (its only networking is pymongo,
process-images.py:44-49) and copes with scale by downscaling; at
gigapixel scale no single host can even hold the decoded mosaic, so
each host decodes only the row band its local devices own and the
global device array is assembled shard-wise, never materialized on any
one host.

Flow on a real multi-host slice::

    multihost.initialize()                      # once per process
    mesh = make_mesh((jax.device_count(),), ("rows",))
    lo, hi = multihost.process_row_band(H_padded, mesh)
    band = decode_rows(paths, lo, hi)           # this host's rows only
    mosaic = multihost.mosaic_from_local_rows(band, (H_padded, W, 3), mesh)
    res = analyze_mosaic(mosaic, mesh=mesh)     # shard_map + psum as usual

Everything here is also exercised single-process (process_count 1, the
band is the whole image) on the virtual CPU mesh — the same code path
JAX runs per-process on a pod.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Idempotent ``jax.distributed.initialize``.

    On TPU pods all three arguments auto-detect from the environment.
    Semantics (each verified against jax 0.9.0's actual behavior):

    - already initialized: no-op (probed via the distributed service
      state, which — unlike ``jax.process_count()`` — does NOT
      initialize the XLA backend and therefore cannot poison a later
      real ``initialize`` call),
    - no arguments and no detectable cluster (plain single host):
      no-op — single-process runs need no coordination. This includes
      the XLA backend already being up: argument-less initialize is
      best-effort, since nothing can be coordinated after backend init
      anyway,
    - EXPLICIT arguments that cannot be honored (backend already
      initialized on a pod, bad address): the jax error propagates;
      that is a real caller bug.
    """
    explicit = coordinator_address is not None or num_processes is not None
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return  # already initialized
    except (ImportError, AttributeError):
        pass  # private layout changed: rely on the error filters below
    if not explicit:
        try:
            from jax._src import xla_bridge

            if xla_bridge.backends_are_initialized():
                return  # too late to coordinate; harmless single-host path
        except (ImportError, AttributeError):
            pass
    try:
        jax.distributed.initialize(
            coordinator_address, num_processes, process_id, **kwargs
        )
    except ValueError:
        # "coordinator_address should be defined": auto-detection found
        # no cluster. With explicit arguments that's a real error.
        if explicit:
            raise
    except RuntimeError as e:
        if "only be called once" not in str(e):
            raise  # e.g. backend-already-initialized on a pod


def padded_height(h: int, mesh: Mesh) -> int:
    """Global row count padded to a device multiple of the row axis.

    ``analyze_mosaic`` block-shards rows; across hosts the padding must
    be agreed on BEFORE decode so every process cuts the same bands.
    """
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names[:1]]))
    return ((h + n - 1) // n) * n


def row_sharding(mesh: Mesh) -> NamedSharding:
    """(H, W, 3) sharding with rows split over the mesh's first axis
    (and columns over the second on a 2-D mesh)."""
    if len(mesh.axis_names) == 1:
        spec = P(mesh.axis_names[0], None, None)
    else:  # 2-D mesh: rows x cols
        spec = P(mesh.axis_names[0], mesh.axis_names[1], None)
    return NamedSharding(mesh, spec)


def process_row_band(global_h: int, mesh: Mesh) -> Tuple[int, int]:
    """[lo, hi) global rows this process must supply.

    The union of the row blocks of this process's addressable devices.
    ``global_h`` must already be padded (see :func:`padded_height`).
    JAX lays process-local devices out contiguously along the mesh's
    major axis on TPU pods, so the union is one contiguous band; this
    is asserted rather than assumed. 1-D (row) meshes only — on a 2-D
    mesh a process owns a row x column block, not a band.
    """
    if len(mesh.axis_names) != 1:
        raise ValueError("process_row_band supports 1-D (row) meshes")
    sharding = row_sharding(mesh)
    rows = []
    for dev, idx in sharding.addressable_devices_indices_map(
        (global_h, 1, 1)
    ).items():
        sl = idx[0]
        lo = sl.start or 0
        hi = sl.stop if sl.stop is not None else global_h
        rows.append((lo, hi))
    lo = min(r[0] for r in rows)
    hi = max(r[1] for r in rows)
    covered = sorted(rows)
    run = covered[0][0]
    for a, b in covered:
        if a > run:
            raise ValueError(
                "this process's device row blocks are not contiguous; "
                "feed shards per-device with make_array_from_single_device_arrays"
            )
        run = max(run, b)
    return lo, hi


def mosaic_from_local_rows(
    local_rows: np.ndarray,
    global_shape: Tuple[int, int, int],
    mesh: Mesh,
) -> jax.Array:
    """Assemble the global row-sharded mosaic from this host's band.

    ``local_rows``: the ``[lo, hi)`` band from :func:`process_row_band`
    as an (hi-lo, W, 3) uint8 host array. Returns a global ``jax.Array``
    sharded row-wise over the mesh — ready for ``analyze_mosaic`` (the
    shard_map sees data already in place; no resharding collective).
    """
    return jax.make_array_from_process_local_data(
        row_sharding(mesh), np.ascontiguousarray(local_rows), global_shape
    )
