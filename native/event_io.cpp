// libv2ce_events — native host-side event-stream packing.
//
// The device produces fixed-capacity SoA event buffers (t int32 within the
// frame window, x/y int16, p int8, per-frame valid counts). The file format
// (and the reference's in-memory format, scripts/LDATI.py:308-309) is an
// AoS numpy structured array [('timestamp','<i8'),('x','<i2'),('y','<i2'),
// ('polarity','i1')] = 13-byte packed records. Packing millions of events
// per second through numpy field assignment costs several strided passes;
// this does it in one multithreaded pass, applying the per-frame int64
// time offsets (v2ce.py:363-366) on the fly.
//
// Built with: g++ -O3 -shared -fPIC -o libv2ce_events.so event_io.cpp -lpthread
// Loaded via ctypes (v2ce_toolbox_tpu/io/native.py) with a numpy fallback.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

#pragma pack(push, 1)
struct EventRecord {
  int64_t timestamp;
  int16_t x;
  int16_t y;
  int8_t polarity;
};
#pragma pack(pop)

static_assert(sizeof(EventRecord) == 13, "packed record must be 13 bytes");

void pack_range(const int32_t* t, const int16_t* x, const int16_t* y,
                const int8_t* p, const int32_t* counts,
                const int64_t* frame_offsets_us, const int64_t* out_starts,
                int64_t capacity, int64_t frame_lo, int64_t frame_hi,
                EventRecord* out) {
  for (int64_t f = frame_lo; f < frame_hi; ++f) {
    const int64_t base = f * capacity;
    const int64_t off = frame_offsets_us[f];
    EventRecord* dst = out + out_starts[f];
    const int32_t n = counts[f];
    for (int32_t i = 0; i < n; ++i) {
      dst[i].timestamp = static_cast<int64_t>(t[base + i]) + off;
      dst[i].x = x[base + i];
      dst[i].y = y[base + i];
      dst[i].polarity = p[base + i];
    }
  }
}

}  // namespace

extern "C" {

// Pack B frames of SoA buffers into one concatenated AoS record stream.
// out must have room for sum(counts) records. Returns total records.
int64_t v2ce_pack_event_stream(const int32_t* t, const int16_t* x,
                               const int16_t* y, const int8_t* p,
                               const int32_t* counts,
                               const int64_t* frame_offsets_us,
                               int64_t num_frames, int64_t capacity,
                               void* out_buf, int32_t num_threads) {
  std::vector<int64_t> starts(num_frames + 1, 0);
  for (int64_t f = 0; f < num_frames; ++f)
    starts[f + 1] = starts[f] + counts[f];
  EventRecord* out = static_cast<EventRecord*>(out_buf);

  if (num_threads <= 1 || num_frames <= 1) {
    pack_range(t, x, y, p, counts, frame_offsets_us, starts.data(), capacity,
               0, num_frames, out);
    return starts[num_frames];
  }
  const int64_t nt = std::min<int64_t>(num_threads, num_frames);
  std::vector<std::thread> threads;
  const int64_t per = (num_frames + nt - 1) / nt;
  for (int64_t k = 0; k < nt; ++k) {
    const int64_t lo = k * per;
    const int64_t hi = std::min(num_frames, lo + per);
    if (lo >= hi) break;
    threads.emplace_back(pack_range, t, x, y, p, counts, frame_offsets_us,
                         starts.data(), capacity, lo, hi, out);
  }
  for (auto& th : threads) th.join();
  return starts[num_frames];
}

// Verify a packed stream is sorted by timestamp (debug aid). Returns the
// index of the first inversion or -1 if sorted.
int64_t v2ce_first_inversion(const void* buf, int64_t n) {
  const EventRecord* rec = static_cast<const EventRecord*>(buf);
  for (int64_t i = 1; i < n; ++i)
    if (rec[i].timestamp < rec[i - 1].timestamp) return i;
  return -1;
}

}  // extern "C"
