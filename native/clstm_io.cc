// clstm_io — native host-side I/O runtime for clstm_tpu.
//
// TPU-native counterpart of the reference's C++ I/O layer (extras.{h,cc}:
// read_png/write_png via libpng, INormalizer/CenterNormalizer line
// dewarping; utils.h levenshtein — citations approximate, reference mount
// empty this session, see SURVEY.md §0). The compute path is JAX/XLA; this
// library keeps the *host* side native and off the Python GIL: PNG decode,
// line normalization and model-input preparation run in a pthread pool so
// the input pipeline can feed a TPU chip training thousands of lines/sec
// (a single-threaded Python/scipy pipeline tops out around ~200 lines/s).
//
// Exposed via a plain C ABI consumed with ctypes (clstm_tpu/io/native.py).
// Numerics mirror clstm_tpu/io/normalize.py (scipy.ndimage semantics):
// gaussian_filter with truncate=4 and constant padding, uniform_filter,
// endpoint-aligned order-1 zoom; equivalence is asserted in
// tests/test_native.py.

#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Image container
// ---------------------------------------------------------------------------

struct Image {
  int h = 0, w = 0;
  std::vector<float> data;  // row-major [h, w]
  float &at(int y, int x) { return data[(size_t)y * w + x]; }
  float get(int y, int x) const { return data[(size_t)y * w + x]; }
  void init(int hh, int ww, float v = 0.f) {
    h = hh; w = ww; data.assign((size_t)hh * ww, v);
  }
};

// ---------------------------------------------------------------------------
// PNG I/O (libpng), float grayscale in [0,1]
// ---------------------------------------------------------------------------

bool read_png_file(const char *path, Image *out) {
  FILE *fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return false;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  // Normalize every input variant to 8-bit gray.
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (depth == 16) png_set_strip_16(png);
  // Strip alpha unconditionally: tRNS_to_alpha above ADDS an alpha channel
  // to palette/gray images whose original color type lacks the alpha mask,
  // so gating on the original color type leaves 2-byte pixels and garbles
  // the image. strip_alpha is a no-op when no alpha channel exists.
  png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);  // ITU-R 709-ish weights
  png_read_update_info(png, info);

  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  out->init(h, w);
  size_t rowbytes = png_get_rowbytes(png, info);
  size_t stride = w > 0 ? rowbytes / (size_t)w : 1;  // bytes per pixel
  std::vector<png_byte> row(rowbytes);
  for (int y = 0; y < h; y++) {
    png_read_row(png, row.data(), nullptr);
    for (int x = 0; x < w; x++) out->at(y, x) = row[x * stride] / 255.0f;
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

bool write_png_file(const char *path, const float *img, int h, int w) {
  FILE *fp = std::fopen(path, "wb");
  if (!fp) return false;
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                            nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_GRAY, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  std::vector<png_byte> row(w);
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      float v = img[(size_t)y * w + x];
      v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
      row[x] = (png_byte)(v * 255.0f + 0.5f);
    }
    png_write_row(png, row.data());
  }
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(fp);
  return true;
}

// ---------------------------------------------------------------------------
// scipy.ndimage-compatible filters (mode="constant", cval=0)
// ---------------------------------------------------------------------------

std::vector<double> gaussian_kernel(double sigma) {
  int radius = (int)(4.0 * sigma + 0.5);
  std::vector<double> k(2 * radius + 1);
  double s = 0.0;
  for (int i = -radius; i <= radius; i++) {
    double v = std::exp(-0.5 * (double)i * i / (sigma * sigma));
    k[i + radius] = v;
    s += v;
  }
  for (auto &v : k) v /= s;
  return k;
}

// Correlate one axis with a centered kernel, zero padding. Accumulates in
// double (as scipy.ndimage does) — the center-curve argmax downstream sits
// on near-flat profiles, so float accumulation flips ties.
void correlate_axis(const Image &in, Image *out, const std::vector<double> &k,
                    bool vertical) {
  int radius = ((int)k.size() - 1) / 2;
  out->init(in.h, in.w);
  if (vertical) {
    for (int x = 0; x < in.w; x++)
      for (int y = 0; y < in.h; y++) {
        double acc = 0.0;
        int lo = std::max(0, y - radius), hi = std::min(in.h - 1, y + radius);
        for (int yy = lo; yy <= hi; yy++)
          acc += (double)in.get(yy, x) * k[yy - y + radius];
        out->at(y, x) = (float)acc;
      }
  } else {
    for (int y = 0; y < in.h; y++)
      for (int x = 0; x < in.w; x++) {
        double acc = 0.0;
        int lo = std::max(0, x - radius), hi = std::min(in.w - 1, x + radius);
        for (int xx = lo; xx <= hi; xx++)
          acc += (double)in.get(y, xx) * k[xx - x + radius];
        out->at(y, x) = (float)acc;
      }
  }
}

void gaussian_filter2d(const Image &in, Image *out, double sy, double sx) {
  Image tmp;
  correlate_axis(in, &tmp, gaussian_kernel(sy), true);
  correlate_axis(tmp, out, gaussian_kernel(sx), false);
}

// Box filter along one axis, size s (scipy uniform_filter origin rules:
// left radius = s/2, right radius = s - s/2 - 1), zero padding.
void uniform_axis(const Image &in, Image *out, int s, bool vertical) {
  if (s < 1) s = 1;
  int lo_r = s / 2, hi_r = s - s / 2 - 1;
  float inv = 1.0f / (float)s;
  out->init(in.h, in.w);
  if (vertical) {
    for (int x = 0; x < in.w; x++) {
      double acc = 0.0;
      // sliding window with zero padding outside
      for (int y = -lo_r; y <= hi_r && y < in.h; y++)
        if (y >= 0) acc += in.get(y, x);
      for (int y = 0; y < in.h; y++) {
        out->at(y, x) = (float)(acc * inv);
        int add = y + 1 + hi_r, sub = y - lo_r;
        if (add < in.h) acc += in.get(add, x);
        if (sub >= 0) acc -= in.get(sub, x);
      }
    }
  } else {
    for (int y = 0; y < in.h; y++) {
      double acc = 0.0;
      for (int x = -lo_r; x <= hi_r && x < in.w; x++)
        if (x >= 0) acc += in.get(y, x);
      for (int x = 0; x < in.w; x++) {
        out->at(y, x) = (float)(acc * inv);
        int add = x + 1 + hi_r, sub = x - lo_r;
        if (add < in.w) acc += in.get(y, add);
        if (sub >= 0) acc -= in.get(y, sub);
      }
    }
  }
}

void uniform_filter2d(const Image &in, Image *out, int sy, int sx) {
  Image tmp;
  uniform_axis(in, &tmp, sy, true);
  uniform_axis(tmp, out, sx, false);
}

int reflect_index(int idx, int n) {
  while (idx < 0 || idx >= n) {
    if (idx < 0) idx = -idx - 1;
    if (idx >= n) idx = 2 * n - idx - 1;
  }
  return idx;
}

void gaussian_filter1d_vec(std::vector<double> *v, double sigma) {
  auto k = gaussian_kernel(sigma);
  int radius = ((int)k.size() - 1) / 2;
  int n = (int)v->size();
  std::vector<double> out(n, 0.0);
  // scipy gaussian_filter1d: mode "reflect" (c b a | a b c). The smoothed
  // center curve sits on EXACT integers wherever argmax is locally
  // constant, and downstream int-truncation amplifies 1e-15 differences to
  // a full pixel — so accumulation must mirror ndimage correlate1d's
  // symmetric-kernel order bit for bit: acc = k0*x[i] + sum_j k[j]*(left+right).
  for (int i = 0; i < n; i++) {
    double acc = (*v)[reflect_index(i, n)] * k[radius];
    for (int j = 1; j <= radius; j++) {
      double l = (*v)[reflect_index(i - j, n)];
      double r = (*v)[reflect_index(i + j, n)];
      acc += k[radius + j] * (l + r);
    }
    out[i] = acc;
  }
  *v = std::move(out);
}

// Endpoint-aligned order-1 zoom (scipy.ndimage.zoom grid_mode=False).
void zoom_bilinear(const Image &in, Image *out, double zy, double zx) {
  int oh = (int)std::lround(in.h * zy);
  int ow = (int)std::lround(in.w * zx);
  oh = std::max(oh, 1);
  ow = std::max(ow, 1);
  out->init(oh, ow);
  double fy = oh > 1 ? (double)(in.h - 1) / (oh - 1) : 0.0;
  double fx = ow > 1 ? (double)(in.w - 1) / (ow - 1) : 0.0;
  for (int y = 0; y < oh; y++) {
    double sy = y * fy;
    int y0 = (int)sy;
    int y1 = std::min(y0 + 1, in.h - 1);
    double wy = sy - y0;
    for (int x = 0; x < ow; x++) {
      double sx = x * fx;
      int x0 = (int)sx;
      int x1 = std::min(x0 + 1, in.w - 1);
      double wx = sx - x0;
      double v = (1 - wy) * ((1 - wx) * in.get(y0, x0) + wx * in.get(y0, x1)) +
                 wy * ((1 - wx) * in.get(y1, x0) + wx * in.get(y1, x1));
      out->at(y, x) = (float)v;
    }
  }
}

// ---------------------------------------------------------------------------
// Normalizers (mirrors clstm_tpu/io/normalize.py; reference extras.cc
// CenterNormalizer — ocropus line dewarping)
// ---------------------------------------------------------------------------

enum DewarpKind { DEWARP_NONE = 0, DEWARP_MEAN = 1, DEWARP_CENTER = 2 };

void fix_height(const Image &in, Image *out, int th) {
  if (in.h == th) { *out = in; return; }
  out->init(th, in.w);
  if (in.h > th) {
    int lo = (in.h - th) / 2;
    for (int y = 0; y < th; y++)
      std::memcpy(&out->at(y, 0), &in.data[(size_t)(y + lo) * in.w],
                  sizeof(float) * in.w);
  } else {
    int lo = (th - in.h) / 2;
    for (int y = 0; y < in.h; y++)
      std::memcpy(&out->at(y + lo, 0), &in.data[(size_t)y * in.w],
                  sizeof(float) * in.w);
  }
}

void normalize_none(const Image &in, Image *out, int th) {
  double scale = (double)th / in.h;
  Image z;
  zoom_bilinear(in, &z, scale, scale);
  fix_height(z, out, th);
}

void normalize_mean(const Image &in, Image *out, int th) {
  double s = 0, sy = 0;
  for (int y = 0; y < in.h; y++)
    for (int x = 0; x < in.w; x++) {
      s += in.get(y, x);
      sy += in.get(y, x) * y;
    }
  double center = sy / std::max(s, 1e-6);
  int shift = (int)std::lround(in.h / 2.0 - center);
  Image shifted;
  shifted.init(in.h, in.w);
  for (int y = 0; y < in.h; y++) {
    int src = y - shift;
    if (src >= 0 && src < in.h)
      std::memcpy(&shifted.at(y, 0), &in.data[(size_t)src * in.w],
                  sizeof(float) * in.w);
  }
  normalize_none(shifted, out, th);
}

void normalize_center(const Image &in, Image *out, int th,
                      double range = 4.0, double smoothness = 1.0,
                      double extra = 0.3) {
  int h = in.h, w = in.w;
  Image sm, un;
  gaussian_filter2d(in, &sm, h * 0.5, h * smoothness);
  uniform_filter2d(sm, &un, (int)(h * 0.5), w);
  for (size_t i = 0; i < sm.data.size(); i++)
    sm.data[i] += 0.001f * un.data[i];
  // per-column argmax (first max, like numpy)
  std::vector<double> center(w);
  for (int x = 0; x < w; x++) {
    int best = 0;
    float bv = sm.get(0, x);
    for (int y = 1; y < h; y++)
      if (sm.get(y, x) > bv) { bv = sm.get(y, x); best = y; }
    center[x] = (double)best;
  }
  gaussian_filter1d_vec(&center, h * extra);
  std::vector<int64_t> icenter(w);
  for (int x = 0; x < w; x++) icenter[x] = (int64_t)(center[x] + 1e-6);  // epsilon: see io/normalize.py measure()
  // mad over ink pixels
  double mad = 0;
  int64_t cnt = 0;
  for (int y = 0; y < h; y++)
    for (int x = 0; x < w; x++)
      if (in.get(y, x) != 0.0f) {
        mad += std::abs((double)y - (double)icenter[x]);
        cnt++;
      }
  mad = cnt ? mad / cnt : h / 4.0;
  int r = (int)(1 + range * mad);
  // dewarp: extract [center-r, center+r) per column from zero-padded image
  Image dew;
  dew.init(2 * r, w);
  for (int x = 0; x < w; x++) {
    int64_t c = icenter[x];
    for (int i = 0; i < 2 * r; i++) {
      int64_t y = c - r + i;
      dew.at(i, x) = (y >= 0 && y < h) ? in.get((int)y, x) : 0.0f;
    }
  }
  double scale = (double)th / dew.h;
  Image z;
  zoom_bilinear(dew, &z, scale, scale);
  fix_height(z, out, th);
}

// prepare_line (mirrors data/dataset.py): invert, normalize, [0,1] rescale,
// transpose to [T, H], pad blank frames.
void prepare_line(const Image &img, int target_height, int pad, int dewarp,
                  std::vector<float> *out, int *T, int *H) {
  Image inv;
  inv.init(img.h, img.w);
  float mx = 0.f;
  for (float v : img.data) mx = std::max(mx, v);
  for (size_t i = 0; i < img.data.size(); i++) inv.data[i] = mx - img.data[i];
  Image norm;
  switch (dewarp) {
    case DEWARP_CENTER: normalize_center(inv, &norm, target_height); break;
    case DEWARP_MEAN: normalize_mean(inv, &norm, target_height); break;
    default: normalize_none(inv, &norm, target_height); break;
  }
  float m = 0.f;
  for (float v : norm.data) m = std::max(m, v);
  float inv_m = m > 0.f ? 1.0f / m : 1.0f;
  int w = norm.w, h = norm.h;
  *T = w + 2 * pad;
  *H = h;
  out->assign((size_t)(*T) * h, 0.0f);
  for (int x = 0; x < w; x++)
    for (int y = 0; y < h; y++)
      (*out)[(size_t)(x + pad) * h + y] = norm.get(y, x) * inv_m;
}

// ---------------------------------------------------------------------------
// Threaded prefetch loader
// ---------------------------------------------------------------------------

struct Loader {
  std::vector<std::string> paths;
  int target_height, pad, dewarp;
  std::vector<std::vector<float>> results;
  std::vector<int> Ts, Hs;
  std::vector<uint8_t> status;  // 0 pending, 1 ok, 2 error
  std::atomic<int> next{0};
  std::vector<std::thread> threads;
  std::mutex mu;
  std::condition_variable cv;

  void worker() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= (int)paths.size()) return;
      Image img;
      uint8_t st = 2;
      if (read_png_file(paths[i].c_str(), &img)) {
        prepare_line(img, target_height, pad, dewarp, &results[i], &Ts[i],
                     &Hs[i]);
        st = 1;
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        status[i] = st;
      }
      cv.notify_all();
    }
  }
};

// ---------------------------------------------------------------------------
// Token-sequence edit distance (reference utils.h levenshtein)
// ---------------------------------------------------------------------------

int levenshtein_ints(const int32_t *a, int na, const int32_t *b, int nb) {
  if (na == 0) return nb;
  if (nb == 0) return na;
  std::vector<int> prev(nb + 1), cur(nb + 1);
  for (int j = 0; j <= nb; j++) prev[j] = j;
  for (int i = 1; i <= na; i++) {
    cur[0] = i;
    for (int j = 1; j <= nb; j++) {
      int sub = prev[j - 1] + (a[i - 1] != b[j - 1]);
      cur[j] = std::min(std::min(prev[j] + 1, cur[j - 1] + 1), sub);
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

int clstm_read_png(const char *path, float **out, int *h, int *w) {
  Image img;
  if (!read_png_file(path, &img)) return -1;
  *h = img.h;
  *w = img.w;
  *out = (float *)std::malloc(img.data.size() * sizeof(float));
  std::memcpy(*out, img.data.data(), img.data.size() * sizeof(float));
  return 0;
}

int clstm_write_png(const char *path, const float *img, int h, int w) {
  return write_png_file(path, img, h, w) ? 0 : -1;
}

void clstm_free(void *p) { std::free(p); }

int clstm_levenshtein(const int32_t *a, int na, const int32_t *b, int nb) {
  return levenshtein_ints(a, na, b, nb);
}

// Normalize+prepare a raw grayscale image buffer into a model input.
int clstm_prepare_line(const float *img, int h, int w, int target_height,
                       int pad, int dewarp, float **out, int *T, int *H) {
  Image im;
  im.init(h, w);
  std::memcpy(im.data.data(), img, (size_t)h * w * sizeof(float));
  std::vector<float> res;
  prepare_line(im, target_height, pad, dewarp, &res, T, H);
  *out = (float *)std::malloc(res.size() * sizeof(float));
  std::memcpy(*out, res.data(), res.size() * sizeof(float));
  return 0;
}

// Debug/test hook: expose the CenterNormalizer measure() internals.
// centers must have room for w doubles; returns r.
int clstm_debug_measure(const float *img, int h, int w, double *centers) {
  Image in;
  in.init(h, w);
  std::memcpy(in.data.data(), img, (size_t)h * w * sizeof(float));
  Image sm, un;
  gaussian_filter2d(in, &sm, h * 0.5, h * 1.0);
  uniform_filter2d(sm, &un, (int)(h * 0.5), w);
  for (size_t i = 0; i < sm.data.size(); i++)
    sm.data[i] += 0.001f * un.data[i];
  std::vector<double> center(w);
  for (int x = 0; x < w; x++) {
    int best = 0;
    float bv = sm.get(0, x);
    for (int y = 1; y < h; y++)
      if (sm.get(y, x) > bv) { bv = sm.get(y, x); best = y; }
    center[x] = (double)best;
  }
  gaussian_filter1d_vec(&center, h * 0.3);
  for (int x = 0; x < w; x++) centers[x] = center[x];
  std::vector<int64_t> icenter(w);
  for (int x = 0; x < w; x++) icenter[x] = (int64_t)(center[x] + 1e-6);  // epsilon: see io/normalize.py measure()
  double mad = 0;
  int64_t cnt = 0;
  for (int y = 0; y < h; y++)
    for (int x = 0; x < w; x++)
      if (in.get(y, x) != 0.0f) {
        mad += std::abs((double)y - (double)icenter[x]);
        cnt++;
      }
  mad = cnt ? mad / cnt : h / 4.0;
  return (int)(1 + 4.0 * mad);
}

void *clstm_loader_create(const char **paths, int n, int target_height,
                          int pad, int dewarp, int nthreads) {
  auto *L = new Loader();
  L->paths.assign(paths, paths + n);
  L->target_height = target_height;
  L->pad = pad;
  L->dewarp = dewarp;
  L->results.resize(n);
  L->Ts.assign(n, 0);
  L->Hs.assign(n, 0);
  L->status.assign(n, 0);
  if (nthreads < 1) nthreads = std::max(1u, std::thread::hardware_concurrency());
  nthreads = std::min(nthreads, std::max(1, n));
  for (int t = 0; t < nthreads; t++)
    L->threads.emplace_back(&Loader::worker, L);
  return L;
}

// Blocks until line i is ready; returns 0 ok / -1 decode error.
// The returned pointer is owned by the loader (valid until destroy).
int clstm_loader_get(void *loader, int i, float **out, int *T, int *H) {
  auto *L = (Loader *)loader;
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv.wait(lk, [&] { return L->status[i] != 0; });
  if (L->status[i] != 1) return -1;
  *out = L->results[i].data();
  *T = L->Ts[i];
  *H = L->Hs[i];
  return 0;
}

void clstm_loader_destroy(void *loader) {
  auto *L = (Loader *)loader;
  L->next.store(1 << 30);
  for (auto &t : L->threads) t.join();
  delete L;
}

}  // extern "C"
