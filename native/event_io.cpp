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

#include <cmath>
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

// Discretized event-volume splat (the host data pipeline's hot loop:
// numpy's np.add.at in data/voxelize.gen_discretized_event_volume_np runs
// one scattered pass per element per half; this is the same arithmetic in
// one compiled pass). Bit-identical to the numpy recipe: t scaled in
// double with the reference's +-1e-8 floor/ceil epsilons
// (train/scripts/utils/events_utils.py:118-126), the FLOOR half
// accumulated for all events before the CEIL half (numpy's two add.at
// passes), values cast to float32 before accumulation. vol must be a
// zeroed (2*nb, h, w) float32 buffer; p <= 0 lands in the OFF (second)
// half, matching the np converter's where(p == 0, -1, p) < 0 handling.
void v2ce_voxel_splat(const int64_t* t, const int16_t* x, const int16_t* y,
                      const int8_t* p, int64_t n, int32_t nb, int32_t h,
                      int32_t w, float* vol) {
  if (n <= 0) return;
  int64_t tmin = t[0], tmax = t[0];
  for (int64_t i = 1; i < n; ++i) {
    if (t[i] < tmin) tmin = t[i];
    if (t[i] > tmax) tmax = t[i];
  }
  double denom = static_cast<double>(tmax - tmin);
  if (denom < 1e-12) denom = 1e-12;
  const double factor = (nb - 1) / denom;
  const int64_t plane = static_cast<int64_t>(h) * w;
  for (int pass = 0; pass < 2; ++pass) {
    for (int64_t i = 0; i < n; ++i) {
      double ts = (t[i] - tmin) * factor;
      if (ts < 0) ts = 0;
      if (ts > nb - 1) ts = nb - 1;
      const double fl = std::floor(ts);
      int64_t bin;
      double dt;
      if (pass == 0) {                     // floor half
        bin = static_cast<int64_t>(std::floor(ts + 1e-8));
        dt = (fl + 1) - ts;                // dt_fl
      } else {                             // ceil half
        bin = static_cast<int64_t>(std::ceil(ts - 1e-8));
        dt = ts - std::floor(ts + 1e-8);   // dt_ce
      }
      const int64_t vm = (p[i] <= 0) ? nb : 0;
      vol[plane * (bin + vm) + static_cast<int64_t>(w) * y[i] + x[i]] +=
          static_cast<float>(dt);
    }
  }
}

}  // extern "C"
