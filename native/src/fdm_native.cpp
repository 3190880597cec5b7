// fdm_native: host-side native runtime for the fdm_tpu data pipeline.
//
// The reference feeds training from torch DataLoader worker processes
// (num_workers=10, reference train/train_mead_vqvae.py:44) doing pickle/npy
// IO in Python. This library is the TPU-framework equivalent: a C++ .npy /
// .wav reader plus a multi-threaded prefetch ring that keeps decoded
// sequences ahead of the host->device feed, bound into Python via ctypes
// (fdm_tpu/data/native.py). No Python object churn, no fork, no GIL on the
// IO path.
//
// Build: `make -C native` -> native/libfdm_native.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kMaxDims = 8;

struct Array {
  float* data = nullptr;
  int64_t shape[kMaxDims] = {0};
  int ndim = 0;
  int64_t elems() const {
    int64_t n = 1;
    for (int i = 0; i < ndim; ++i) n *= shape[i];
    return n;
  }
};

// ---------------------------------------------------------------- npy parser

// Minimal NumPy .npy v1/v2 reader for C-order numeric arrays; converts
// float64/float16/int16/int32/int64 to float32 on load (the datasets store
// float16/float32/float64 vertices).
bool parse_npy_header(FILE* f, std::string* descr, bool* fortran,
                      int64_t* shape, int* ndim) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return false;
    header_len = b[0] | (b[1] << 8);
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return false;
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
  }
  // dict headers are <1 KiB in practice; a multi-MiB length is a corrupt
  // or hostile file, not a real header — refuse before allocating
  if (header_len == 0 || header_len > (1u << 20)) return false;
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return false;

  auto find_value = [&](const char* key) -> std::string {
    size_t pos = header.find(key);
    if (pos == std::string::npos) return "";
    pos = header.find(':', pos);
    if (pos == std::string::npos) return "";
    ++pos;
    while (pos < header.size() && (header[pos] == ' ')) ++pos;
    return header.substr(pos);
  };

  std::string d = find_value("'descr'");
  if (d.empty() || d.size() < 2) return false;
  size_t q1 = d.find('\'');
  size_t q2 = d.find('\'', q1 + 1);
  if (q1 == std::string::npos || q2 == std::string::npos) return false;
  *descr = d.substr(q1 + 1, q2 - q1 - 1);

  std::string fo = find_value("'fortran_order'");
  *fortran = fo.rfind("True", 0) == 0;

  std::string sh = find_value("'shape'");
  size_t lp = sh.find('(');
  size_t rp = sh.find(')');
  if (lp == std::string::npos || rp == std::string::npos) return false;
  std::string tuple = sh.substr(lp + 1, rp - lp - 1);
  *ndim = 0;
  const char* p = tuple.c_str();
  while (*p && *ndim < kMaxDims) {
    while (*p == ' ' || *p == ',') ++p;
    if (!*p) break;
    char* end = nullptr;
    long long v = strtoll(p, &end, 10);
    if (end == p) break;
    if (v < 0) return false;  // corrupt header; a real shape is >= 0
    shape[(*ndim)++] = (int64_t)v;
    p = end;
  }
  if (*ndim == 0) {  // 0-d array
    shape[0] = 1;
    *ndim = 1;
  }
  return true;
}

float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t mant = h & 0x3ff;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while ((mant & 0x400) == 0) {
        mant <<= 1;
        --exp;
      }
      mant &= 0x3ff;
      bits = sign | (exp << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7f800000u | (mant << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float out;
  memcpy(&out, &bits, 4);
  return out;
}

template <typename T>
void convert_to_f32(const std::vector<char>& raw, float* out, int64_t n) {
  const T* src = reinterpret_cast<const T*>(raw.data());
  for (int64_t i = 0; i < n; ++i) out[i] = (float)src[i];
}

bool load_npy_f32(const char* path, Array* arr) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  std::string descr;
  bool fortran = false;
  if (!parse_npy_header(f, &descr, &fortran, arr->shape, &arr->ndim) ||
      fortran) {
    fclose(f);
    return false;
  }
  int64_t n = arr->elems();
  size_t item = 0;
  if (descr == "<f4" || descr == "|f4") item = 4;
  else if (descr == "<f8") item = 8;
  else if (descr == "<f2" || descr == "|f2" || descr == "<e") item = 2;
  else if (descr == "<i2") item = 2;
  else if (descr == "<i4") item = 4;
  else if (descr == "<i8") item = 8;
  else {
    fclose(f);
    return false;
  }
  // the header's shape is file-supplied (untrusted): bound n by the bytes
  // actually present after the header so a hostile shape cannot overflow
  // (size_t)n * item or oversize the allocation
  long data_start = ftell(f);
  if (n < 0 || data_start < 0 || fseek(f, 0, SEEK_END) != 0) {
    fclose(f);
    return false;
  }
  long file_end = ftell(f);
  int64_t avail = (int64_t)file_end - data_start;
  if (avail < 0 || n > avail / (int64_t)item ||
      fseek(f, data_start, SEEK_SET) != 0) {
    fclose(f);
    return false;
  }
  std::vector<char> raw((size_t)n * item);
  size_t got = fread(raw.data(), item, (size_t)n, f);
  fclose(f);
  if (got != (size_t)n) return false;

  arr->data = (float*)malloc((size_t)n * sizeof(float));
  if (!arr->data) return false;
  if (descr == "<f4" || descr == "|f4") {
    memcpy(arr->data, raw.data(), (size_t)n * 4);
  } else if (descr == "<f8") {
    convert_to_f32<double>(raw, arr->data, n);
  } else if (descr == "<f2" || descr == "|f2" || descr == "<e") {
    const uint16_t* src = reinterpret_cast<const uint16_t*>(raw.data());
    for (int64_t i = 0; i < n; ++i) arr->data[i] = half_to_float(src[i]);
  } else if (descr == "<i2") {
    convert_to_f32<int16_t>(raw, arr->data, n);
  } else if (descr == "<i4") {
    convert_to_f32<int32_t>(raw, arr->data, n);
  } else {
    convert_to_f32<int64_t>(raw, arr->data, n);
  }
  return true;
}

// ---------------------------------------------------------------- wav reader

bool load_wav_pcm16(const char* path, int16_t** data, int64_t* n, int* sr,
                    int* channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || fread(&riff_size, 4, 1, f) != 1 ||
      fread(wave, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) ||
      memcmp(wave, "WAVE", 4)) {
    fclose(f);
    return false;
  }
  uint16_t fmt_code = 0, nch = 0, bits = 0;
  uint32_t rate = 0;
  *data = nullptr;
  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) break;
    if (!memcmp(id, "fmt ", 4)) {
      uint32_t byte_rate;
      uint16_t block_align;
      if (fread(&fmt_code, 2, 1, f) != 1 || fread(&nch, 2, 1, f) != 1 ||
          fread(&rate, 4, 1, f) != 1 || fread(&byte_rate, 4, 1, f) != 1 ||
          fread(&block_align, 2, 1, f) != 1 || fread(&bits, 2, 1, f) != 1)
        break;
      if (size > 16) fseek(f, size - 16, SEEK_CUR);
    } else if (!memcmp(id, "data", 4)) {
      if (fmt_code != 1 || bits != 16) break;  // PCM16 only
      *data = (int16_t*)malloc(size);
      if (!*data || fread(*data, 1, size, f) != size) {
        free(*data);
        *data = nullptr;
        break;
      }
      *n = size / 2;
      *sr = (int)rate;
      *channels = (int)nch;
      fclose(f);
      return true;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  return false;
}

// ------------------------------------------------------------- prefetch ring

struct Item {
  Array arr;
  int index = -1;
  bool ok = false;
};

struct Prefetcher {
  std::vector<std::string> paths;
  std::deque<Item> ready;
  std::mutex mu;
  std::condition_variable cv_ready;   // consumer waits
  std::condition_variable cv_space;   // producers wait
  size_t capacity = 4;
  std::atomic<int> next_job{0};
  int emitted = 0;                    // items handed to the consumer
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  void worker_loop() {
    while (!stop.load()) {
      int job = next_job.fetch_add(1);
      if (job >= (int)paths.size()) return;
      Item item;
      item.index = job;
      item.ok = load_npy_f32(paths[job].c_str(), &item.arr);
      std::unique_lock<std::mutex> lock(mu);
      cv_space.wait(lock, [&] {
        return ready.size() < capacity || stop.load();
      });
      if (stop.load()) {
        free(item.arr.data);
        return;
      }
      ready.push_back(item);
      cv_ready.notify_one();
    }
  }
};

}  // namespace

// Clamp a (double) pixel bound into [0, size] BEFORE the int cast: a
// float->int cast outside int range is UB (a near-plane-grazing vertex can
// project to |pixel| > 2^31), and NaN coordinates must yield an empty bbox,
// not an undefined one.
static inline int clamp_px(double v, int size) {
  if (!(v > 0.0)) return 0;  // negatives and NaN
  if (v >= (double)size) return size;
  return (int)v;
}

extern "C" {

// ---- single-file loads (caller frees with fdm_free) ----

int fdm_npy_load_f32(const char* path, float** data, int64_t* shape,
                     int* ndim) {
  Array arr;
  if (!load_npy_f32(path, &arr)) return -1;
  *data = arr.data;
  *ndim = arr.ndim;
  for (int i = 0; i < arr.ndim; ++i) shape[i] = arr.shape[i];
  return 0;
}

int fdm_wav_load_pcm16(const char* path, int16_t** data, int64_t* n,
                       int* sr, int* channels) {
  return load_wav_pcm16(path, data, n, sr, channels) ? 0 : -1;
}

void fdm_free(void* p) { free(p); }

// ---- Gouraud triangle rasterizer (host render path) ----
//
// The z-buffered barycentric fill for fdm_tpu/render/voca_rig.py: the
// per-triangle loop is the hot part of offline mesh rendering (FLAME ~10k
// faces x 800x800 x T frames) and runs ~100x faster here than as a Python
// loop. Inputs are the pre-projected, pre-culled triangle attributes;
// img/zbuf are caller-initialized (background / +inf).

void fdm_raster_gouraud(const float* tri_pix,   // (F, 3, 2) pixel xy
                        const float* tri_z,     // (F, 3) camera depth
                        const float* tri_shade, // (F, 3) vertex gray
                        const uint8_t* ok,      // (F,) 1 = rasterize
                        int64_t nfaces, int size,
                        float* img,             // (size*size)
                        float* zbuf) {          // (size*size)
  for (int64_t i = 0; i < nfaces; ++i) {
    if (!ok[i]) continue;
    const float* p = tri_pix + i * 6;
    const float ax = p[0], ay = p[1], bx = p[2], by = p[3];
    const float cx = p[4], cy = p[5];
    const double den =
        (double)(by - cy) * (ax - cx) + (double)(cx - bx) * (ay - cy);
    if (std::fabs(den) < 1e-12) continue;
    const int x0 = clamp_px(std::floor((double)std::min(ax, std::min(bx, cx))), size);
    const int x1 = clamp_px(std::ceil((double)std::max(ax, std::max(bx, cx))) + 1.0, size);
    const int y0 = clamp_px(std::floor((double)std::min(ay, std::min(by, cy))), size);
    const int y1 = clamp_px(std::ceil((double)std::max(ay, std::max(by, cy))) + 1.0, size);
    if (x0 >= x1 || y0 >= y1) continue;
    const float za = tri_z[i * 3], zb = tri_z[i * 3 + 1],
                zc = tri_z[i * 3 + 2];
    const float sa = tri_shade[i * 3], sb = tri_shade[i * 3 + 1],
                sc = tri_shade[i * 3 + 2];
    for (int y = y0; y < y1; ++y) {
      const double gy = y + 0.5;
      float* imrow = img + (int64_t)y * size;
      float* zrow = zbuf + (int64_t)y * size;
      for (int x = x0; x < x1; ++x) {
        const double gx = x + 0.5;
        const double w0 =
            ((by - cy) * (gx - cx) + (cx - bx) * (gy - cy)) / den;
        const double w1 =
            ((cy - ay) * (gx - cx) + (ax - cx) * (gy - cy)) / den;
        const double w2 = 1.0 - w0 - w1;
        if (w0 < 0.0 || w1 < 0.0 || w2 < 0.0) continue;
        const float z = (float)(w0 * za + w1 * zb + w2 * zc);
        if (z >= zrow[x]) continue;
        zrow[x] = z;
        imrow[x] = (float)(w0 * sa + w1 * sb + w2 * sc);
      }
    }
  }
}

// ---- per-fragment PBR rasterizer (host render path) ----
//
// Per-PIXEL evaluation of the same Khronos glTF-WebGL-PBR BRDF the Gouraud
// path evaluates per vertex — this is what pyrender's mesh.frag actually
// does (reference render/render.py renders through pyrender): interpolate
// the normal and world position across the triangle with PERSPECTIVE-
// CORRECT barycentrics (GL `smooth` varyings), normalize per fragment,
// then shade. Depth is interpolated as 1/z (GL window-space ordering).
// `params` = {cam_x, cam_y, cam_z, f0, reflectance90, alphaRoughness,
// c_diff, light_sum, ambient}; the light direction is +z (all five
// reference raymond lights shine along -z).

void fdm_raster_pbr(const float* tri_pix,   // (F, 3, 2) pixel xy
                    const float* tri_z,     // (F, 3) camera depth
                    const float* tri_nrm,   // (F, 3, 3) vertex normals
                    const float* tri_pos,   // (F, 3, 3) world positions
                    const uint8_t* ok,      // (F,) 1 = rasterize
                    int64_t nfaces, int size,
                    const float* params,    // [9] shading constants
                    float* img,             // (size*size)
                    float* zbuf) {          // (size*size)
  const double camx = params[0], camy = params[1], camz = params[2];
  const double f0 = params[3], refl90 = params[4];
  const double a_r = params[5];            // alphaRoughness = roughness^2
  const double c_diff = params[6], light_sum = params[7];
  const double ambient = params[8];
  const double r2 = a_r * a_r;
  for (int64_t i = 0; i < nfaces; ++i) {
    if (!ok[i]) continue;
    const float* p = tri_pix + i * 6;
    const float ax = p[0], ay = p[1], bx = p[2], by = p[3];
    const float cx = p[4], cy = p[5];
    const double den =
        (double)(by - cy) * (ax - cx) + (double)(cx - bx) * (ay - cy);
    if (std::fabs(den) < 1e-12) continue;
    const int x0 = clamp_px(std::floor((double)std::min(ax, std::min(bx, cx))), size);
    const int x1 = clamp_px(std::ceil((double)std::max(ax, std::max(bx, cx))) + 1.0, size);
    const int y0 = clamp_px(std::floor((double)std::min(ay, std::min(by, cy))), size);
    const int y1 = clamp_px(std::ceil((double)std::max(ay, std::max(by, cy))) + 1.0, size);
    if (x0 >= x1 || y0 >= y1) continue;
    const double iza = 1.0 / tri_z[i * 3], izb = 1.0 / tri_z[i * 3 + 1],
                 izc = 1.0 / tri_z[i * 3 + 2];
    const float* nv = tri_nrm + i * 9;
    const float* pv = tri_pos + i * 9;
    for (int y = y0; y < y1; ++y) {
      const double gy = y + 0.5;
      float* imrow = img + (int64_t)y * size;
      float* zrow = zbuf + (int64_t)y * size;
      for (int x = x0; x < x1; ++x) {
        const double gx = x + 0.5;
        const double w0 =
            ((by - cy) * (gx - cx) + (cx - bx) * (gy - cy)) / den;
        const double w1 =
            ((cy - ay) * (gx - cx) + (ax - cx) * (gy - cy)) / den;
        const double w2 = 1.0 - w0 - w1;
        if (w0 < 0.0 || w1 < 0.0 || w2 < 0.0) continue;
        // perspective-correct weights: wi/zi, renormalized
        const double pw0 = w0 * iza, pw1 = w1 * izb, pw2 = w2 * izc;
        const double inv = pw0 + pw1 + pw2;
        const float z = (float)(1.0 / inv);
        if (z >= zrow[x]) continue;
        const double b0 = pw0 / inv, b1 = pw1 / inv, b2 = pw2 / inv;
        double nx = b0 * nv[0] + b1 * nv[3] + b2 * nv[6];
        double ny = b0 * nv[1] + b1 * nv[4] + b2 * nv[7];
        double nz = b0 * nv[2] + b1 * nv[5] + b2 * nv[8];
        double nn = std::sqrt(nx * nx + ny * ny + nz * nz);
        nn = nn > 1e-12 ? nn : 1e-12;
        nx /= nn; ny /= nn; nz /= nn;
        double vx = camx - (b0 * pv[0] + b1 * pv[3] + b2 * pv[6]);
        double vy = camy - (b0 * pv[1] + b1 * pv[4] + b2 * pv[7]);
        double vz = camz - (b0 * pv[2] + b1 * pv[5] + b2 * pv[8]);
        double vn = std::sqrt(vx * vx + vy * vy + vz * vz);
        vn = vn > 1e-12 ? vn : 1e-12;
        vx /= vn; vy /= vn; vz /= vn;
        // halfway vector with l = +z
        double hx = vx, hy = vy, hz = vz + 1.0;
        double hn = std::sqrt(hx * hx + hy * hy + hz * hz);
        hn = hn > 1e-12 ? hn : 1e-12;
        hx /= hn; hy /= hn; hz /= hn;
        const double ndl = std::min(std::max(nz, 1e-3), 1.0);
        const double ndv = std::min(
            std::max(std::fabs(nx * vx + ny * vy + nz * vz), 1e-3), 1.0);
        const double ndh =
            std::min(std::max(nx * hx + ny * hy + nz * hz, 0.0), 1.0);
        const double vdh =
            std::min(std::max(vx * hx + vy * hy + vz * hz, 0.0), 1.0);
        const double om = 1.0 - vdh;
        const double om2 = om * om;
        const double fres = f0 + (refl90 - f0) * om2 * om2 * om;
        const double att_l =
            2.0 * ndl / (ndl + std::sqrt(r2 + (1.0 - r2) * ndl * ndl));
        const double att_v =
            2.0 * ndv / (ndv + std::sqrt(r2 + (1.0 - r2) * ndv * ndv));
        const double fd = (ndh * r2 - ndh) * ndh + 1.0;
        const double dist = r2 / (M_PI * fd * fd);
        const double diffuse = (1.0 - fres) * c_diff / M_PI;
        const double spec = fres * att_l * att_v * dist / (4.0 * ndl * ndv);
        double shade = ambient + ndl * light_sum * (diffuse + spec);
        shade = std::min(std::max(shade, 0.0), 1.0);
        zrow[x] = z;
        imrow[x] = (float)shade;
      }
    }
  }
}

// ---- prefetcher ----

void* fdm_prefetcher_create(const char** paths, int n, int capacity,
                            int workers) {
  auto* pf = new Prefetcher();
  pf->paths.assign(paths, paths + n);
  pf->capacity = capacity > 0 ? (size_t)capacity : 4;
  int nw = workers > 0 ? workers : 4;
  if (nw > n) nw = n > 0 ? n : 1;
  for (int i = 0; i < nw; ++i)
    pf->workers.emplace_back(&Prefetcher::worker_loop, pf);
  return pf;
}

// Returns 0 and fills outputs on success; 1 when exhausted; -1 on load error
// (index still filled). Items arrive in completion order.
int fdm_prefetcher_next(void* handle, float** data, int64_t* shape,
                        int* ndim, int* index) {
  auto* pf = (Prefetcher*)handle;
  std::unique_lock<std::mutex> lock(pf->mu);
  if (pf->emitted >= (int)pf->paths.size()) return 1;
  pf->cv_ready.wait(lock, [&] { return !pf->ready.empty(); });
  Item item = pf->ready.front();
  pf->ready.pop_front();
  ++pf->emitted;
  pf->cv_space.notify_one();
  lock.unlock();
  *index = item.index;
  if (!item.ok) return -1;
  *data = item.arr.data;
  *ndim = item.arr.ndim;
  for (int i = 0; i < item.arr.ndim; ++i) shape[i] = item.arr.shape[i];
  return 0;
}

void fdm_prefetcher_destroy(void* handle) {
  auto* pf = (Prefetcher*)handle;
  {
    // the store must happen under mu: a worker between its wait-predicate
    // check and blocking would otherwise miss the notify (lost wakeup)
    // and join() below would deadlock
    std::lock_guard<std::mutex> lock(pf->mu);
    pf->stop.store(true);
  }
  pf->cv_space.notify_all();
  pf->cv_ready.notify_all();
  for (auto& t : pf->workers) t.join();
  for (auto& item : pf->ready) free(item.arr.data);
  delete pf;
}

}  // extern "C"
