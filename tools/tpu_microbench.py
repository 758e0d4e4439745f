"""Back-compat shim: the harness now ships in the package so the
installed ``rgnir-tpu tune`` works without a source checkout. See
rgnir_tpu.utils.microbench for the implementation."""

from rgnir_tpu.utils.microbench import _touch, chain_time, chain_time_ab  # noqa: F401
