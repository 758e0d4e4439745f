"""Native (C++) runtime components.

The reference has no native code at all (SURVEY.md section 2.4); this
package adds TPU-framework runtime pieces that belong in C++:

- ``FrameRing`` — a lock-free SPSC shared-memory frame ring for
  streaming ingestion (camera/telemetry process -> analyzer process,
  no pickling, no sockets, no GIL hand-offs on the hot path).
- ``imgio`` — a libtiff/libjpeg/libpng batch decoder with a C++ thread
  pool filling one contiguous (N, H, W, 3) arena (the host-ingest hot
  path; PIL remains the fallback for exotic color modes).
- ``jointhist`` — a threaded 256x256 joint-histogram accumulator, the
  host-side reduction of the streamed gigapixel path (used when the
  host->device wire is far below DRAM bandwidth; bit-identical to the
  device MXU reduction).

Built on demand with g++ (no pybind11 in this environment — plain C ABI
consumed via ctypes).
"""

from rgnir_tpu.native.ring import FrameRing, native_available
from rgnir_tpu.native import imgio
from rgnir_tpu.native import jointhist

__all__ = ["FrameRing", "native_available", "imgio", "jointhist"]
