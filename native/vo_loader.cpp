// vo_loader — native RGB-D sequence loader for vo_tpu.
//
// First-party C++ replacement for the native IO layer the reference borrows from
// OpenCV (cv2.imread + np.load in its offline loop, vo_stereo_runner.py:49-50):
//   * minimal PNG decoder (zlib inflate + per-row unfilter, 8-bit gray/RGB/RGBA)
//   * NPY parser for float32/float64 depth maps and uint16 millimetre depth maps
//   * std::thread prefetch pool that decodes frames ahead of the consumer, so the
//     Python/JAX side overlaps host decode with device compute.
//
// C ABI (used from Python via ctypes — no pybind11 dependency):
//   void* vol_open(const char* dir, int prefetch_depth, int n_threads);
//   int   vol_meta(void* h, int* n_frames, int* height, int* width);
//   int   vol_next(void* h, unsigned char* rgb_out, float* depth_out);  // 0 ok, <0 err/end
//   int   vol_next2(void* h, int img_fmt, int depth_fmt, void* img_out, void* depth_out);
//         img_fmt: 0 = RGB uint8 (H,W,3), 1 = grayscale uint8 (H,W)
//         depth_fmt: 0 = float32 metres, 1 = uint16 millimetres (round, clamp 65.535 m)
//   void  vol_close(void* h);
//
// The format-selectable path exists because the consumer is often bandwidth-bound,
// not decode-bound: a grayscale frame is 3x fewer bytes than RGB and uint16-mm depth
// is half of f32, so emitting the minimal representation here (single pass, no Python
// round trips) feeds the host->device link at its smallest possible byte count.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 vo_loader.cpp -o libvoloader.so -lz -lpthread

#include <zlib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <filesystem>
#include <fstream>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace fs = std::filesystem;

namespace {

// ---------------------------------------------------------------- file reading

static bool read_file(const std::string& path, std::vector<uint8_t>& out) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) return false;
  std::streamsize n = f.tellg();
  f.seekg(0);
  out.resize(static_cast<size_t>(n));
  return static_cast<bool>(f.read(reinterpret_cast<char*>(out.data()), n));
}

// ---------------------------------------------------------------- PNG decoding

static uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) |
         uint32_t(p[3]);
}

static int paeth(int a, int b, int c) {
  int p = a + b - c, pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Per-row unfilter with the filter-type switch hoisted OUT of the byte loop: the
// generic per-byte switch was the decode hot spot (branch per byte); filters 0-2
// vectorize trivially and 3/4 keep only their true loop-carried dependence.
static bool unfilter_row(uint8_t ft, const uint8_t* src, uint8_t* dst,
                         const uint8_t* up, size_t stride, size_t ch) {
  switch (ft) {
    case 0:
      std::memcpy(dst, src, stride);
      return true;
    case 1:  // sub: dst[x] = src[x] + dst[x-ch]
      std::memcpy(dst, src, std::min(stride, ch));
      for (size_t x = ch; x < stride; ++x) dst[x] = uint8_t(src[x] + dst[x - ch]);
      return true;
    case 2:  // up
      if (!up) { std::memcpy(dst, src, stride); return true; }
      for (size_t x = 0; x < stride; ++x) dst[x] = uint8_t(src[x] + up[x]);
      return true;
    case 3:  // average
      if (up) {
        for (size_t x = 0; x < std::min(stride, ch); ++x)
          dst[x] = uint8_t(src[x] + up[x] / 2);
        for (size_t x = ch; x < stride; ++x)
          dst[x] = uint8_t(src[x] + (dst[x - ch] + up[x]) / 2);
      } else {
        std::memcpy(dst, src, std::min(stride, ch));
        for (size_t x = ch; x < stride; ++x) dst[x] = uint8_t(src[x] + dst[x - ch] / 2);
      }
      return true;
    case 4:  // paeth
      for (size_t x = 0; x < std::min(stride, ch); ++x)
        dst[x] = uint8_t(src[x] + (up ? up[x] : 0));
      for (size_t x = ch; x < stride; ++x) {
        int a = dst[x - ch], b = up ? up[x] : 0, c = up ? up[x - ch] : 0;
        dst[x] = uint8_t(src[x] + paeth(a, b, c));
      }
      return true;
    default:
      return false;
  }
}

// Decode an 8-bit PNG into its NATIVE channel count (1 gray, 2 gray+alpha, 3 rgb,
// 4 rgba), tightly packed. Channel conversion happens at emit time, not here.
static bool decode_png(const std::vector<uint8_t>& buf, std::vector<uint8_t>& img,
                       int& H, int& W, int& channels) {
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (buf.size() < 8 || std::memcmp(buf.data(), sig, 8) != 0) return false;

  size_t pos = 8;
  int width = 0, height = 0, bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= buf.size()) {
    uint32_t len = be32(&buf[pos]);
    if (pos + 12 + len > buf.size()) return false;
    const char* type = reinterpret_cast<const char*>(&buf[pos + 4]);
    const uint8_t* data = &buf[pos + 8];
    if (!std::memcmp(type, "IHDR", 4)) {
      width = be32(data);
      height = be32(data + 4);
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + len;
  }
  if (width <= 0 || height <= 0 || bit_depth != 8 || interlace != 0) return false;
  int ch;
  switch (color_type) {
    case 0: ch = 1; break;  // gray
    case 2: ch = 3; break;  // rgb
    case 4: ch = 2; break;  // gray+alpha
    case 6: ch = 4; break;  // rgba
    default: return false;  // palette unsupported
  }

  const size_t stride = size_t(width) * ch;
  std::vector<uint8_t> raw(size_t(height) * (stride + 1));
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK) return false;

  img.resize(size_t(height) * stride);
  for (int y = 0; y < height; ++y) {
    const uint8_t ft = raw[size_t(y) * (stride + 1)];
    const uint8_t* src = &raw[size_t(y) * (stride + 1) + 1];
    uint8_t* dst = &img[size_t(y) * stride];
    const uint8_t* up = y ? &img[size_t(y - 1) * stride] : nullptr;
    if (!unfilter_row(ft, src, dst, up, stride, size_t(ch))) return false;
  }
  H = height;
  W = width;
  channels = ch;
  return true;
}

// ---------------------------------------------------------------- NPY parsing

// Depth maps arrive in whichever of the reference's f32/f64 metre format or the
// compact uint16 millimetre format is on disk; we keep the decoded form and convert
// (if at all) at emit.
struct DepthMap {
  std::vector<float> f32;     // metres (when decoded from f4/f8)
  std::vector<uint16_t> u16;  // millimetres (when decoded from u2)
  bool is_u16 = false;
};

static bool decode_npy_depth(const std::vector<uint8_t>& buf, DepthMap& out, int& H,
                             int& W) {
  if (buf.size() < 10 || buf[0] != 0x93 || std::memcmp(&buf[1], "NUMPY", 5) != 0)
    return false;
  const int major = buf[6];
  size_t hlen, hoff;
  if (major == 1) {
    hlen = buf[8] | (size_t(buf[9]) << 8);
    hoff = 10;
  } else {
    hlen = buf[8] | (size_t(buf[9]) << 8) | (size_t(buf[10]) << 16) |
           (size_t(buf[11]) << 24);
    hoff = 12;
  }
  if (hoff + hlen > buf.size()) return false;
  std::string hdr(reinterpret_cast<const char*>(&buf[hoff]), hlen);

  const bool f8 = hdr.find("<f8") != std::string::npos;
  const bool f4 = hdr.find("<f4") != std::string::npos;
  const bool u2 = hdr.find("<u2") != std::string::npos;
  if (!f4 && !f8 && !u2) return false;
  if (hdr.find("'fortran_order': True") != std::string::npos) return false;

  size_t sh = hdr.find("'shape'");
  size_t open = hdr.find('(', sh), close = hdr.find(')', sh);
  if (open == std::string::npos || close == std::string::npos) return false;
  std::string dims = hdr.substr(open + 1, close - open - 1);
  int d0 = 0, d1 = 0;
  if (sscanf(dims.c_str(), "%d , %d", &d0, &d1) != 2 &&
      sscanf(dims.c_str(), "%d, %d", &d0, &d1) != 2)
    return false;

  const size_t n = size_t(d0) * d1;
  const uint8_t* data = &buf[hoff + hlen];
  const size_t avail = buf.size() - hoff - hlen;
  if (u2) {
    if (avail < n * 2) return false;
    out.u16.resize(n);
    std::memcpy(out.u16.data(), data, n * 2);
    out.is_u16 = true;
  } else if (f4) {
    if (avail < n * 4) return false;
    out.f32.resize(n);
    std::memcpy(out.f32.data(), data, n * 4);
    out.is_u16 = false;
  } else {
    if (avail < n * 8) return false;
    const double* d = reinterpret_cast<const double*>(data);
    out.f32.resize(n);
    for (size_t i = 0; i < n; ++i) out.f32[i] = float(d[i]);
    out.is_u16 = false;
  }
  H = d0;
  W = d1;
  return true;
}

// ---------------------------------------------------------------- prefetch pool

struct Frame {
  std::vector<uint8_t> img;  // native channels, tightly packed
  int channels = 0;
  DepthMap depth;
  int H = 0, W = 0;
  bool ok = false;
};

struct Loader {
  std::vector<std::string> pngs, npys;
  int n_frames = 0, H = 0, W = 0;
  int prefetch_depth = 8;

  std::map<int, Frame> ready;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::atomic<int> next_to_decode{0};
  int next_to_emit = 0;
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  void worker() {
    for (;;) {
      if (stop.load()) return;
      int idx = next_to_decode.fetch_add(1);
      if (idx >= n_frames) return;
      Frame fr;
      std::vector<uint8_t> buf;
      if (read_file(pngs[idx], buf)) {
        fr.ok = decode_png(buf, fr.img, fr.H, fr.W, fr.channels);
      }
      if (fr.ok && read_file(npys[idx], buf)) {
        int dh = 0, dw = 0;
        fr.ok = decode_npy_depth(buf, fr.depth, dh, dw) && dh == fr.H && dw == fr.W;
      } else {
        fr.ok = false;
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] {
        return stop.load() || int(ready.size()) < prefetch_depth ||
               idx < next_to_emit + prefetch_depth;
      });
      if (stop.load()) return;
      ready.emplace(idx, std::move(fr));
      cv_ready.notify_all();
    }
  }
};

// ---------------------------------------------------------------- emit conversion

// BT.601 luma, fixed-point — same weights as vo_tpu.ops.image.rgb_to_gray (and
// OpenCV's RGB2GRAY) so brightness thresholds behave identically across loaders.
static inline uint8_t luma(uint8_t r, uint8_t g, uint8_t b) {
  return uint8_t((299u * r + 587u * g + 114u * b + 500u) / 1000u);
}

static void emit_image(const Frame& fr, int img_fmt, uint8_t* out) {
  const size_t n = size_t(fr.H) * fr.W;
  const int ch = fr.channels;
  if (img_fmt == 1) {  // grayscale out
    if (ch == 1) {
      std::memcpy(out, fr.img.data(), n);
    } else if (ch == 2) {
      for (size_t i = 0; i < n; ++i) out[i] = fr.img[i * 2];
    } else {
      for (size_t i = 0; i < n; ++i) {
        const uint8_t* p = &fr.img[i * ch];
        out[i] = luma(p[0], p[1], p[2]);
      }
    }
  } else {  // RGB out
    if (ch == 3) {
      std::memcpy(out, fr.img.data(), n * 3);
    } else if (ch == 4) {
      for (size_t i = 0; i < n; ++i) {
        out[i * 3 + 0] = fr.img[i * 4 + 0];
        out[i * 3 + 1] = fr.img[i * 4 + 1];
        out[i * 3 + 2] = fr.img[i * 4 + 2];
      }
    } else {  // gray / gray+alpha -> replicate
      for (size_t i = 0; i < n; ++i) {
        const uint8_t v = fr.img[i * ch];
        out[i * 3 + 0] = v;
        out[i * 3 + 1] = v;
        out[i * 3 + 2] = v;
      }
    }
  }
}

static void emit_depth(const Frame& fr, int depth_fmt, void* out) {
  const size_t n = size_t(fr.H) * fr.W;
  if (depth_fmt == 1) {  // uint16 millimetres
    uint16_t* o = static_cast<uint16_t*>(out);
    if (fr.depth.is_u16) {
      std::memcpy(o, fr.depth.u16.data(), n * 2);
    } else {
      for (size_t i = 0; i < n; ++i) {
        float d = fr.depth.f32[i];
        if (!(d > 0.f)) d = 0.f;  // NaN / negative -> invalid
        if (d > 65.535f) d = 65.535f;
        o[i] = uint16_t(d * 1000.f + 0.5f);  // round, not truncate
      }
    }
  } else {  // float32 metres
    float* o = static_cast<float*>(out);
    if (fr.depth.is_u16) {
      for (size_t i = 0; i < n; ++i) o[i] = fr.depth.u16[i] * 1e-3f;
    } else {
      std::memcpy(o, fr.depth.f32.data(), n * 4);
    }
  }
}

}  // namespace

extern "C" {

void* vol_open(const char* dir, int prefetch_depth, int n_threads) {
  auto* L = new Loader();
  L->prefetch_depth = prefetch_depth > 0 ? prefetch_depth : 8;
  std::vector<std::string> pngs, npys;
  std::error_code ec;
  for (const auto& e : fs::directory_iterator(dir, ec)) {
    const std::string p = e.path().string();
    if (p.size() > 4 && p.substr(p.size() - 4) == ".png") pngs.push_back(p);
    if (p.size() > 10 && p.substr(p.size() - 10) == "_depth.npy") npys.push_back(p);
  }
  std::sort(pngs.begin(), pngs.end());
  std::sort(npys.begin(), npys.end());
  L->n_frames = int(std::min(pngs.size(), npys.size()));
  L->pngs = std::move(pngs);
  L->npys = std::move(npys);
  if (L->n_frames == 0) {
    delete L;
    return nullptr;
  }
  // Probe the first frame's dimensions synchronously.
  {
    std::vector<uint8_t> buf;
    Frame fr;
    if (read_file(L->pngs[0], buf) &&
        decode_png(buf, fr.img, fr.H, fr.W, fr.channels)) {
      L->H = fr.H;
      L->W = fr.W;
    } else {
      delete L;
      return nullptr;
    }
  }
  const int nt = n_threads > 0 ? n_threads : int(std::thread::hardware_concurrency());
  for (int i = 0; i < std::max(1, nt); ++i)
    L->workers.emplace_back(&Loader::worker, L);
  return L;
}

int vol_meta(void* h, int* n_frames, int* height, int* width) {
  if (!h) return -1;
  auto* L = static_cast<Loader*>(h);
  *n_frames = L->n_frames;
  *height = L->H;
  *width = L->W;
  return 0;
}

int vol_next2(void* h, int img_fmt, int depth_fmt, void* img_out, void* depth_out) {
  if (!h) return -1;
  auto* L = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->next_to_emit >= L->n_frames) return -2;  // end of sequence
  const int idx = L->next_to_emit;
  L->cv_ready.wait(lk, [&] { return L->ready.count(idx) > 0; });
  Frame fr = std::move(L->ready[idx]);
  L->ready.erase(idx);
  L->next_to_emit++;
  L->cv_space.notify_all();
  lk.unlock();
  if (!fr.ok || fr.H != L->H || fr.W != L->W) return -3;  // decode failure
  emit_image(fr, img_fmt, static_cast<uint8_t*>(img_out));
  emit_depth(fr, depth_fmt, depth_out);
  return 0;
}

int vol_next(void* h, unsigned char* rgb_out, float* depth_out) {
  return vol_next2(h, /*img_fmt=*/0, /*depth_fmt=*/0, rgb_out, depth_out);
}

void vol_close(void* h) {
  if (!h) return;
  auto* L = static_cast<Loader*>(h);
  L->stop.store(true);
  L->cv_space.notify_all();
  L->cv_ready.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
