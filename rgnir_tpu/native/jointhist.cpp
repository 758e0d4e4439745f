// Host-side 256x256 joint-histogram accumulator for the streamed
// gigapixel path (rgnir_tpu/pipeline/gigapixel.py).
//
// The streamed band reduction is exact because WB+index statistics are
// a function of the joint histogram of the two referenced channels
// (see the module docstring of pipeline/gigapixel.py). The DEVICE
// reduction (one MXU contraction per band chunk) is the production
// path; this native accumulator is the alternative for environments
// where host->device bandwidth is pathologically below the host's own
// memory bandwidth (e.g. a tunneled device at ~10^2 MB/s vs DRAM at
// ~10^4 MB/s — BENCHMARKS.md config 7 arithmetic). Both paths feed the
// identical 65536-bin closure, so results are bit-identical.
//
// C ABI (ctypes, see jointhist.py):
//   jh_accumulate(px, n, stride, ca, cb, npairs, hist, n_threads)
//     px:     n rows of `stride` uint8 channels (C-contiguous)
//     ca/cb:  npairs channel-index pairs into [0, stride)
//     hist:   npairs * 65536 uint32 bins, ADDED TO in place
//     n_threads: <=1 single-threaded; else split rows, merge privates
// Caller guarantees n < 2^32 - existing bin counts (the Python layer
// flushes to int64 per band, far below that).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kBins = 256 * 256;

void accumulate_range(const uint8_t* px, int64_t begin, int64_t end,
                      int stride, const int* ca, const int* cb,
                      int npairs, uint32_t* hist) {
  if (npairs == 1) {
    // Run-length-coalesced increment: natural image bands carry long
    // runs of equal values, so consecutive pixels hit the SAME bin
    // and the plain ++hist[bin] loop serializes on its store-to-load
    // dependency (~5 cycles/px measured). Buffering the current run
    // and adding its length once turns a run of R into one update;
    // the bin-equality branch is period-predictable on both extremes
    // (always-equal in runs, always-different in noise), so this is
    // never slower than the plain loop and much faster on runs.
    // Same-host A/B, 32 MPix x3 channels: uniform noise 865 vs 844
    // MPix/s, 64-px runs 676 vs 439, 2-bin ripple 576 vs 575.
    // (A 4-way sub-histogram split was also measured: it wins only on
    // the ripple case and loses on noise from L2 pressure — rejected.)
    // Totals are identical: hist[bin] += run is the same adds in the
    // same u32 counters, just batched.
    const int a = ca[0], b = cb[0];
    if (begin >= end) return;
    const uint8_t* row = px + begin * stride;
    uint32_t prev = (static_cast<uint32_t>(row[a]) << 8) | row[b];
    uint32_t count = 1;
    for (int64_t i = begin + 1; i < end; ++i) {
      row = px + i * stride;
      const uint32_t bin = (static_cast<uint32_t>(row[a]) << 8) | row[b];
      if (bin == prev) {
        ++count;
      } else {
        hist[prev] += count;
        prev = bin;
        count = 1;
      }
    }
    hist[prev] += count;
    return;
  }
  for (int64_t i = begin; i < end; ++i) {
    const uint8_t* row = px + i * stride;
    for (int p = 0; p < npairs; ++p) {
      ++hist[p * kBins +
             ((static_cast<uint32_t>(row[ca[p]]) << 8) | row[cb[p]])];
    }
  }
}

}  // namespace

extern "C" {

int jh_accumulate(const uint8_t* px, int64_t n, int stride,
                  const int* ca, const int* cb, int npairs,
                  uint32_t* hist, int n_threads) {
  if (n < 0 || stride <= 0 || npairs <= 0) return 1;
  for (int p = 0; p < npairs; ++p) {
    if (ca[p] < 0 || ca[p] >= stride || cb[p] < 0 || cb[p] >= stride)
      return 1;
  }
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads < 1) n_threads = 1;
  }
  // Below ~4M pixels thread spawn + merge overhead beats the win.
  if (n_threads == 1 || n < (1 << 22)) {
    accumulate_range(px, 0, n, stride, ca, cb, npairs, hist);
    return 0;
  }
  const size_t bins = static_cast<size_t>(npairs) * kBins;
  std::vector<std::vector<uint32_t>> privates(
      n_threads, std::vector<uint32_t>(bins, 0));
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  const int64_t per = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t begin = t * per;
    const int64_t end = begin + per < n ? begin + per : n;
    if (begin >= end) break;
    threads.emplace_back(accumulate_range, px, begin, end, stride, ca,
                         cb, npairs, privates[t].data());
  }
  for (auto& th : threads) th.join();
  for (auto& priv : privates)
    for (size_t i = 0; i < bins; ++i) hist[i] += priv[i];
  return 0;
}

}  // extern "C"
