// vo_loader — native RGB-D sequence loader for vo_tpu.
//
// First-party C++ replacement for the native IO layer the reference borrows from
// OpenCV (cv2.imread + np.load in its offline loop, vo_stereo_runner.py:49-50):
//   * minimal PNG decoder (zlib inflate + per-row unfilter, 8-bit gray/RGB/RGBA)
//   * NPY parser for float32/float64 depth maps
//   * std::thread prefetch pool that decodes frames ahead of the consumer, so the
//     Python/JAX side overlaps host decode with device compute.
//
// C ABI (used from Python via ctypes — no pybind11 dependency):
//   void* vol_open(const char* dir, int prefetch_depth, int n_threads);
//   int   vol_meta(void* h, int* n_frames, int* height, int* width);
//   int   vol_next(void* h, unsigned char* rgb_out, float* depth_out);  // 0 ok, <0 err/end
//   void  vol_close(void* h);
//
// Build: g++ -O3 -shared -fPIC -std=c++17 vo_loader.cpp -o libvoloader.so -lz -lpthread

#include <zlib.h>

#include <algorithm>
#include <atomic>
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

// Decode an 8-bit PNG into tightly packed RGB. Returns false on unsupported input.
static bool decode_png_rgb(const std::vector<uint8_t>& buf, std::vector<uint8_t>& rgb,
                           int& H, int& W) {
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

  // Per-row unfilter in place into `img`.
  std::vector<uint8_t> img(size_t(height) * stride);
  for (int y = 0; y < height; ++y) {
    const uint8_t ft = raw[size_t(y) * (stride + 1)];
    const uint8_t* src = &raw[size_t(y) * (stride + 1) + 1];
    uint8_t* dst = &img[size_t(y) * stride];
    const uint8_t* up = y ? &img[size_t(y - 1) * stride] : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(ch) ? dst[x - ch] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= size_t(ch)) ? up[x - ch] : 0;
      int v = src[x];
      switch (ft) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      dst[x] = uint8_t(v);
    }
  }

  // Expand to RGB.
  rgb.resize(size_t(height) * width * 3);
  for (size_t i = 0, n = size_t(height) * width; i < n; ++i) {
    const uint8_t* p = &img[i * ch];
    uint8_t r, g, b;
    if (ch == 1) r = g = b = p[0];
    else if (ch == 2) r = g = b = p[0];
    else { r = p[0]; g = p[1]; b = p[2]; }
    rgb[i * 3 + 0] = r;
    rgb[i * 3 + 1] = g;
    rgb[i * 3 + 2] = b;
  }
  H = height;
  W = width;
  return true;
}

// ---------------------------------------------------------------- NPY parsing

static bool decode_npy_f32(const std::vector<uint8_t>& buf, std::vector<float>& out,
                           int& H, int& W) {
  if (buf.size() < 10 || buf[0] != 0x93 || std::memcmp(&buf[1], "NUMPY", 5) != 0)
    return false;
  const int major = buf[6];
  size_t hlen, hoff;
  if (major == 1) {
    hlen = buf[8] | (size_t(buf[9]) << 8);
    hoff = 10;
  } else {
    hlen = be32(&buf[8]);  // actually little-endian, fix below
    hlen = buf[8] | (size_t(buf[9]) << 8) | (size_t(buf[10]) << 16) |
           (size_t(buf[11]) << 24);
    hoff = 12;
  }
  if (hoff + hlen > buf.size()) return false;
  std::string hdr(reinterpret_cast<const char*>(&buf[hoff]), hlen);

  const bool f8 = hdr.find("<f8") != std::string::npos;
  const bool f4 = hdr.find("<f4") != std::string::npos;
  if (!f4 && !f8) return false;
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
  out.resize(n);
  if (f4) {
    if (avail < n * 4) return false;
    std::memcpy(out.data(), data, n * 4);
  } else {
    if (avail < n * 8) return false;
    const double* d = reinterpret_cast<const double*>(data);
    for (size_t i = 0; i < n; ++i) out[i] = float(d[i]);
  }
  H = d0;
  W = d1;
  return true;
}

// ---------------------------------------------------------------- prefetch pool

struct Frame {
  std::vector<uint8_t> rgb;
  std::vector<float> depth;
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
        fr.ok = decode_png_rgb(buf, fr.rgb, fr.H, fr.W);
      }
      if (fr.ok && read_file(npys[idx], buf)) {
        int dh = 0, dw = 0;
        fr.ok = decode_npy_f32(buf, fr.depth, dh, dw) && dh == fr.H && dw == fr.W;
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
    if (read_file(L->pngs[0], buf) && decode_png_rgb(buf, fr.rgb, fr.H, fr.W)) {
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

int vol_next(void* h, unsigned char* rgb_out, float* depth_out) {
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
  std::memcpy(rgb_out, fr.rgb.data(), fr.rgb.size());
  std::memcpy(depth_out, fr.depth.data(), fr.depth.size() * sizeof(float));
  return 0;
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
