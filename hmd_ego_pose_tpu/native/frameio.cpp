// Native frame-ingest kernels for the serving host path.
//
// TPU-host equivalent of the reference's C#/OpenCV per-frame conversion
// (unity-sandbox/WebRTCNetCoreSandbox/Program.cs:136-200): the incoming
// HMD video is I420/NV12; converting it to RGB and staging it into a
// pinned ring buffer is pure host work that must not eat into the frame
// budget, so it lives in C++ (vectorizable tight loops) rather than numpy.
//
// Exposed via a C ABI for ctypes:
//   i420_to_rgb(y, u, v, h, w, stride_y, stride_uv, out)
//   nv12_to_rgb(y, uv, h, w, stride_y, stride_uv, out)
//   ring_*: single-producer single-consumer frame ring buffer.
//
// Build: g++ -O3 -march=native -shared -fPIC frameio.cpp -o libframeio.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

inline uint8_t clamp_u8(int v) {
  return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}

// BT.601 limited-range YUV -> RGB (matches OpenCV's default cvtColor)
inline void yuv_to_rgb(int y, int u, int v, uint8_t* rgb) {
  const int c = y - 16;
  const int d = u - 128;
  const int e = v - 128;
  rgb[0] = clamp_u8((298 * c + 409 * e + 128) >> 8);
  rgb[1] = clamp_u8((298 * c - 100 * d - 208 * e + 128) >> 8);
  rgb[2] = clamp_u8((298 * c + 516 * d + 128) >> 8);
}

}  // namespace

extern "C" {

void i420_to_rgb(const uint8_t* y_plane, const uint8_t* u_plane,
                 const uint8_t* v_plane, int height, int width, int stride_y,
                 int stride_uv, uint8_t* out_rgb) {
  for (int row = 0; row < height; ++row) {
    const uint8_t* yrow = y_plane + row * stride_y;
    const uint8_t* urow = u_plane + (row / 2) * stride_uv;
    const uint8_t* vrow = v_plane + (row / 2) * stride_uv;
    uint8_t* orow = out_rgb + row * width * 3;
    for (int col = 0; col < width; ++col) {
      yuv_to_rgb(yrow[col], urow[col / 2], vrow[col / 2], orow + col * 3);
    }
  }
}

void nv12_to_rgb(const uint8_t* y_plane, const uint8_t* uv_plane, int height,
                 int width, int stride_y, int stride_uv, uint8_t* out_rgb) {
  for (int row = 0; row < height; ++row) {
    const uint8_t* yrow = y_plane + row * stride_y;
    const uint8_t* uvrow = uv_plane + (row / 2) * stride_uv;
    uint8_t* orow = out_rgb + row * width * 3;
    for (int col = 0; col < width; ++col) {
      const int c2 = (col / 2) * 2;
      yuv_to_rgb(yrow[col], uvrow[c2], uvrow[c2 + 1], orow + col * 3);
    }
  }
}

// ---------------------------------------------------------------------------
// Affine warp (cv2.warpAffine semantics: inverse mapping, zero border).
// The 6-DoF training augmentation warps every image+mask on the host
// (reference: cv2.warpAffine in generators/colibri_common.py:467-471); in
// numpy this costs ~0.5 s/frame at 480^2 and starves the TPU.  inv_m is the
// INVERSE 2x3 affine (dst -> src), row-major [a b c; d e f].
// ---------------------------------------------------------------------------

// border_mode: 0 = constant zero (cv2.warpAffine default), 1 = clamp to
// edge (the convention of the resize path).
void warp_affine_bilinear_u8(const uint8_t* src, int src_h, int src_w,
                             int channels, const double* inv_m,
                             uint8_t* dst, int dst_h, int dst_w,
                             int border_mode) {
  for (int y = 0; y < dst_h; ++y) {
    const double base_x = inv_m[1] * y + inv_m[2];
    const double base_y = inv_m[4] * y + inv_m[5];
    uint8_t* orow = dst + static_cast<int64_t>(y) * dst_w * channels;
    for (int x = 0; x < dst_w; ++x) {
      const double sx = inv_m[0] * x + base_x;
      const double sy = inv_m[3] * x + base_y;
      const int x0 = static_cast<int>(std::floor(sx));
      const int y0 = static_cast<int>(std::floor(sy));
      const double fx = sx - x0;
      const double fy = sy - y0;
      for (int c = 0; c < channels; ++c) {
        double acc = 0.0;
        for (int dy = 0; dy < 2; ++dy) {
          int yy = y0 + dy;
          const double wy = dy ? fy : 1.0 - fy;
          if (yy < 0 || yy >= src_h) {
            if (border_mode == 0) continue;
            yy = yy < 0 ? 0 : src_h - 1;
          }
          for (int dx = 0; dx < 2; ++dx) {
            int xx = x0 + dx;
            const double wx = dx ? fx : 1.0 - fx;
            if (xx < 0 || xx >= src_w) {
              if (border_mode == 0) continue;
              xx = xx < 0 ? 0 : src_w - 1;
            }
            acc += wy * wx *
                   src[(static_cast<int64_t>(yy) * src_w + xx) * channels + c];
          }
        }
        // half-to-even rounding to match numpy's np.round exactly
        orow[x * channels + c] =
            clamp_u8(static_cast<int>(std::nearbyint(acc)));
      }
    }
  }
}

void warp_affine_nearest_u8(const uint8_t* src, int src_h, int src_w,
                            int channels, const double* inv_m, uint8_t* dst,
                            int dst_h, int dst_w) {
  for (int y = 0; y < dst_h; ++y) {
    const double base_x = inv_m[1] * y + inv_m[2];
    const double base_y = inv_m[4] * y + inv_m[5];
    uint8_t* orow = dst + static_cast<int64_t>(y) * dst_w * channels;
    for (int x = 0; x < dst_w; ++x) {
      const int sx = static_cast<int>(std::lround(inv_m[0] * x + base_x));
      const int sy = static_cast<int>(std::lround(inv_m[3] * x + base_y));
      if (sx < 0 || sx >= src_w || sy < 0 || sy >= src_h) {
        for (int c = 0; c < channels; ++c) orow[x * channels + c] = 0;
      } else {
        const uint8_t* s =
            src + (static_cast<int64_t>(sy) * src_w + sx) * channels;
        for (int c = 0; c < channels; ++c) orow[x * channels + c] = s[c];
      }
    }
  }
}

// ---------------------------------------------------------------------------
// SPSC frame ring buffer: producer = network receive thread, consumer =
// batching dispatcher.  Lock-free; drops the oldest frame when full (live
// streaming wants freshness over completeness).
// ---------------------------------------------------------------------------

struct FrameRing {
  uint8_t* storage;
  int64_t frame_bytes;
  int64_t capacity;
  std::atomic<int64_t> head;  // next write slot
  std::atomic<int64_t> tail;  // next read slot
};

void* ring_create(int64_t frame_bytes, int64_t capacity) {
  auto* ring = new FrameRing();
  ring->storage =
      static_cast<uint8_t*>(std::malloc(frame_bytes * capacity));
  if (ring->storage == nullptr) {
    delete ring;
    return nullptr;
  }
  ring->frame_bytes = frame_bytes;
  ring->capacity = capacity;
  ring->head.store(0);
  ring->tail.store(0);
  return ring;
}

void ring_destroy(void* handle) {
  auto* ring = static_cast<FrameRing*>(handle);
  if (ring != nullptr) {
    std::free(ring->storage);
    delete ring;
  }
}

// Push a frame; returns 1 on success, 0 if it overwrote the oldest frame.
int ring_push(void* handle, const uint8_t* frame) {
  auto* ring = static_cast<FrameRing*>(handle);
  int64_t head = ring->head.load(std::memory_order_relaxed);
  int64_t tail = ring->tail.load(std::memory_order_acquire);
  int dropped = 0;
  if (head - tail >= ring->capacity) {
    // full: advance tail (drop oldest)
    ring->tail.store(tail + 1, std::memory_order_release);
    dropped = 1;
  }
  std::memcpy(ring->storage + (head % ring->capacity) * ring->frame_bytes,
              frame, ring->frame_bytes);
  ring->head.store(head + 1, std::memory_order_release);
  return dropped == 0 ? 1 : 0;
}

// Pop up to max_frames into out (contiguous); returns number popped.
int64_t ring_pop(void* handle, uint8_t* out, int64_t max_frames) {
  auto* ring = static_cast<FrameRing*>(handle);
  int64_t tail = ring->tail.load(std::memory_order_relaxed);
  int64_t head = ring->head.load(std::memory_order_acquire);
  int64_t avail = std::min(head - tail, max_frames);
  for (int64_t i = 0; i < avail; ++i) {
    std::memcpy(out + i * ring->frame_bytes,
                ring->storage + ((tail + i) % ring->capacity) * ring->frame_bytes,
                ring->frame_bytes);
  }
  ring->tail.store(tail + avail, std::memory_order_release);
  return avail;
}

int64_t ring_size(void* handle) {
  auto* ring = static_cast<FrameRing*>(handle);
  return ring->head.load(std::memory_order_acquire) -
         ring->tail.load(std::memory_order_acquire);
}

}  // extern "C"
