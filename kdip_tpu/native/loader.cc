// Native threaded image-loading runtime for the kdip_tpu input pipeline.
//
// TPU-native counterpart of the reference's torch DataLoader worker pool
// (train_openai.py --num-workers N; guided_diffusion/image_datasets.py
// load_data's DataLoader(..., num_workers=1)): the reference gets parallel
// decode + prefetch from torch's native C++ DataLoader machinery, while the
// host here must keep a single Python process feeding the chip. This library
// moves the whole per-image pipeline — file read, JPEG/PNG decode,
// PIL-semantics resampling, crop, flip, float32 normalization — into C++
// worker threads that write straight into caller-owned (numpy) batch
// buffers, so the Python side only orchestrates ordering and RNG draws.
//
// Resampling reproduces PIL's 8-bit fixed-point resample path
// (Pillow src/libImaging/Resample.c: PRECISION_BITS=22 integer filter
// coefficients, clip8 rounding, horizontal-then-vertical passes, passes
// skipped at identity size) so the native loader is BIT-IDENTICAL to the
// Python path for PNG inputs, and identical whenever libjpeg's ISLOW
// decode matches PIL's bundled libjpeg-turbo (both bit-compatible for
// baseline JPEG; tests assert <=1 LSB).
//
// C ABI (consumed by kdip_tpu/native/__init__.py via ctypes):
//   kdip_loader_create(n_threads)            -> handle
//   kdip_loader_submit(handle, job...)       -> 0/err  (non-blocking)
//   kdip_loader_wait(handle, err, errlen)    -> tag of one finished job
//   kdip_loader_destroy(handle)
//   kdip_probe_size(path, &w, &h)            -> 0/err  (header-only)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <condition_variable>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------------------
// PIL-exact 8-bit resampling (Resample.c semantics)
// ---------------------------------------------------------------------------

constexpr int PRECISION_BITS = 32 - 8 - 2;  // 22, as in Pillow

enum Filter { FILTER_BOX = 0, FILTER_BILINEAR = 1, FILTER_BICUBIC = 2,
              FILTER_LANCZOS = 3 };

double box_filter(double x) { return (x > -0.5 && x <= 0.5) ? 1.0 : 0.0; }

double bilinear_filter(double x) {
  if (x < 0.0) x = -x;
  return (x < 1.0) ? 1.0 - x : 0.0;
}

double bicubic_filter(double x) {
  constexpr double a = -0.5;  // Pillow's Catmull-Rom-like constant
  if (x < 0.0) x = -x;
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

double sinc_filter(double x) {
  if (x == 0.0) return 1.0;
  x *= M_PI;
  return std::sin(x) / x;
}

double lanczos_filter(double x) {
  if (-3.0 <= x && x < 3.0) return sinc_filter(x) * sinc_filter(x / 3.0);
  return 0.0;
}

struct FilterSpec {
  double (*fn)(double);
  double support;
};

FilterSpec filter_spec(int f) {
  switch (f) {
    case FILTER_BOX: return {box_filter, 0.5};
    case FILTER_BILINEAR: return {bilinear_filter, 1.0};
    case FILTER_BICUBIC: return {bicubic_filter, 2.0};
    default: return {lanczos_filter, 3.0};
  }
}

inline uint8_t clip8(int in) {
  if (in >= (1 << (PRECISION_BITS + 8))) return 255;
  if (in <= 0) return 0;
  return static_cast<uint8_t>(in >> PRECISION_BITS);
}

// Pillow precompute_coeffs + normalize_coeffs_8bpc over the full image box.
int precompute_coeffs(int in_size, int out_size, const FilterSpec& f,
                      std::vector<int>* bounds, std::vector<int32_t>* kk) {
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = f.support * filterscale;
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  bounds->assign(out_size * 2, 0);
  std::vector<double> prekk(static_cast<size_t>(out_size) * ksize, 0.0);
  double ss = 1.0 / filterscale;
  for (int xx = 0; xx < out_size; xx++) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &prekk[static_cast<size_t>(xx) * ksize];
    double ww = 0.0;
    int x = 0;
    for (; x < xmax; x++) {
      double w = f.fn((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    if (ww != 0.0)
      for (int j = 0; j < xmax; j++) k[j] /= ww;
    for (; x < ksize; x++) k[x] = 0.0;
    (*bounds)[xx * 2] = xmin;
    (*bounds)[xx * 2 + 1] = xmax;
  }
  kk->resize(prekk.size());
  for (size_t i = 0; i < prekk.size(); i++) {
    double v = prekk[i] * (1 << PRECISION_BITS);
    (*kk)[i] = static_cast<int32_t>(v < 0 ? v - 0.5 : v + 0.5);
  }
  return ksize;
}

struct Image8 {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // HWC
  uint8_t& at(int y, int x, int ch) {
    return data[(static_cast<size_t>(y) * w + x) * c + ch];
  }
  const uint8_t& at(int y, int x, int ch) const {
    return data[(static_cast<size_t>(y) * w + x) * c + ch];
  }
};

Image8 resample_horizontal(const Image8& in, int out_w, const FilterSpec& f) {
  std::vector<int> bounds;
  std::vector<int32_t> kk;
  int ksize = precompute_coeffs(in.w, out_w, f, &bounds, &kk);
  Image8 out;
  out.w = out_w; out.h = in.h; out.c = in.c;
  out.data.resize(static_cast<size_t>(out_w) * in.h * in.c);
  for (int yy = 0; yy < in.h; yy++) {
    for (int xx = 0; xx < out_w; xx++) {
      int xmin = bounds[xx * 2], xmax = bounds[xx * 2 + 1];
      const int32_t* k = &kk[static_cast<size_t>(xx) * ksize];
      for (int ch = 0; ch < in.c; ch++) {
        int ss = 1 << (PRECISION_BITS - 1);
        for (int x = 0; x < xmax; x++)
          ss += in.at(yy, x + xmin, ch) * k[x];
        out.at(yy, xx, ch) = clip8(ss);
      }
    }
  }
  return out;
}

Image8 resample_vertical(const Image8& in, int out_h, const FilterSpec& f) {
  std::vector<int> bounds;
  std::vector<int32_t> kk;
  int ksize = precompute_coeffs(in.h, out_h, f, &bounds, &kk);
  Image8 out;
  out.w = in.w; out.h = out_h; out.c = in.c;
  out.data.resize(static_cast<size_t>(in.w) * out_h * in.c);
  for (int yy = 0; yy < out_h; yy++) {
    int ymin = bounds[yy * 2], ymax = bounds[yy * 2 + 1];
    const int32_t* k = &kk[static_cast<size_t>(yy) * ksize];
    for (int xx = 0; xx < in.w; xx++) {
      for (int ch = 0; ch < in.c; ch++) {
        int ss = 1 << (PRECISION_BITS - 1);
        for (int y = 0; y < ymax; y++)
          ss += in.at(y + ymin, xx, ch) * k[y];
        out.at(yy, xx, ch) = clip8(ss);
      }
    }
  }
  return out;
}

// PIL Image.resize semantics over the full box: horizontal pass then
// vertical pass, each skipped at identity size (PIL returns a copy).
Image8 pil_resize(Image8 img, int out_w, int out_h, int filter) {
  FilterSpec f = filter_spec(filter);
  if (img.w != out_w) img = resample_horizontal(img, out_w, f);
  if (img.h != out_h) img = resample_vertical(img, out_h, f);
  return img;
}

// ---------------------------------------------------------------------------
// Decoders
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
  char msg[JMSG_LENGTH_MAX];
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  (*cinfo->err->format_message)(cinfo, err->msg);
  longjmp(err->jb, 1);
}

bool decode_jpeg(const uint8_t* buf, size_t len, Image8* out,
                 std::string* errmsg) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    *errmsg = std::string("jpeg: ") + jerr.msg;
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  if (cinfo.jpeg_color_space == JCS_CMYK ||
      cinfo.jpeg_color_space == JCS_YCCK) {
    // PIL applies Adobe-specific inversion here; route to Python fallback.
    *errmsg = "jpeg: CMYK/YCCK unsupported in native path";
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;  // gray inputs are replicated, as in
                                    // PIL's convert("RGB")
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize(static_cast<size_t>(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = &out->data[static_cast<size_t>(cinfo.output_scanline) *
                              out->w * 3];
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadState {
  const uint8_t* buf;
  size_t len;
  size_t pos;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
  PngReadState* s = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + n > s->len) {
    png_error(png, "png: truncated stream");
    return;
  }
  std::memcpy(out, s->buf + s->pos, n);
  s->pos += n;
}

bool decode_png(const uint8_t* buf, size_t len, Image8* out,
                std::string* errmsg) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) { *errmsg = "png: alloc failed"; return false; }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    *errmsg = "png: alloc failed";
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    *errmsg = "png: decode error";
    return false;
  }
  PngReadState state{buf, len, 0};
  png_set_read_fn(png, &state, png_mem_read);
  png_read_info(png, info);
  // Mirror PIL decode + convert("RGB"): palette expanded, 16-bit stripped
  // to high byte, gray replicated, alpha dropped.
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (depth == 16) png_set_strip_16(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  int passes = png_set_interlace_handling(png);
  (void)passes;
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->c = 3;
  size_t rowbytes = png_get_rowbytes(png, info);
  if (rowbytes != static_cast<size_t>(out->w) * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    *errmsg = "png: unexpected row layout";
    return false;
  }
  out->data.resize(static_cast<size_t>(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; y++)
    rows[y] = &out->data[static_cast<size_t>(y) * rowbytes];
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool read_file(const char* path, std::vector<uint8_t>* out,
               std::string* errmsg) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { *errmsg = std::string("open failed: ") + path; return false; }
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n < 0) { std::fclose(f); *errmsg = "ftell failed"; return false; }
  out->resize(n);
  size_t got = n ? std::fread(out->data(), 1, n, f) : 0;
  std::fclose(f);
  if (got != static_cast<size_t>(n)) { *errmsg = "short read"; return false; }
  return true;
}

bool decode_any(const std::vector<uint8_t>& buf, Image8* img,
                std::string* errmsg) {
  if (buf.size() >= 2 && buf[0] == 0xFF && buf[1] == 0xD8)
    return decode_jpeg(buf.data(), buf.size(), img, errmsg);
  if (buf.size() >= 8 && std::memcmp(buf.data(), "\x89PNG\r\n\x1a\n", 8) == 0)
    return decode_png(buf.data(), buf.size(), img, errmsg);
  *errmsg = "unsupported image format (native path handles JPEG/PNG)";
  return false;
}

// ---------------------------------------------------------------------------
// Job pipeline
// ---------------------------------------------------------------------------

struct Job {
  std::string path;
  int64_t tag = 0;
  // Resize stage (pick one, or neither):
  //   smaller_dim > 0 : ADM chain — BOX-halve while min(w,h) >= 2*smaller_dim,
  //                     then BICUBIC so min side == smaller_dim
  //                     (ref: guided_diffusion/image_datasets.py:126-147).
  //   square_w/h > 0  : PIL img.resize((square_w, square_h), filter)
  //                     (ref: k_diffusion/utils.py FolderOfImages).
  int smaller_dim = 0;
  int square_w = 0, square_h = 0;
  int filter = FILTER_BICUBIC;
  // Crop stage: crop_size > 0 crops at (crop_x, crop_y); -1 centers.
  int crop_size = 0;
  int crop_x = -1, crop_y = -1;
  int flip = 0;       // horizontal flip (train-time augmentation)
  int norm_mode = 0;  // 0: v/127.5-1 (ImageDataset)  1: (v/255)*2-1 (Folder)
  float* out = nullptr;  // caller-owned; crop_size^2*3 (or w*h*3) floats
  int out_capacity = 0;  // floats; guards the no-resize/no-crop case
};

struct Done {
  int64_t tag;
  bool ok;
  std::string errmsg;
  int w = 0, h = 0;  // dims written (post-pipeline)
};

struct Loader {
  std::mutex mu;
  std::condition_variable cv_jobs;
  std::condition_variable cv_done;
  std::deque<Job> jobs;
  std::deque<Done> done;
  std::vector<std::thread> threads;
  bool shutting_down = false;

  void worker();
};

bool run_job(const Job& job, int* out_w, int* out_h, std::string* errmsg) {
  std::vector<uint8_t> buf;
  if (!read_file(job.path.c_str(), &buf, errmsg)) return false;
  Image8 img;
  if (!decode_any(buf, &img, errmsg)) return false;

  if (job.smaller_dim > 0) {
    while (std::min(img.w, img.h) >= 2 * job.smaller_dim)
      img = pil_resize(std::move(img), img.w / 2, img.h / 2, FILTER_BOX);
    double scale = static_cast<double>(job.smaller_dim) /
                   std::min(img.w, img.h);
    // Python round() is round-half-even; rint matches under the default
    // FP environment.
    int nw = static_cast<int>(std::rint(img.w * scale));
    int nh = static_cast<int>(std::rint(img.h * scale));
    img = pil_resize(std::move(img), nw, nh, job.filter);
  } else if (job.square_w > 0 && job.square_h > 0) {
    img = pil_resize(std::move(img), job.square_w, job.square_h, job.filter);
  }

  int cx = job.crop_x, cy = job.crop_y, cs = job.crop_size;
  int ow = img.w, oh = img.h;
  if (cs > 0) {
    if (cx < 0) cx = (img.w - cs) / 2;
    if (cy < 0) cy = (img.h - cs) / 2;
    if (cx < 0 || cy < 0 || cx + cs > img.w || cy + cs > img.h) {
      *errmsg = "crop out of bounds";
      return false;
    }
    ow = oh = cs;
  } else {
    cx = cy = 0;
  }
  if (ow * oh * 3 > job.out_capacity) {
    *errmsg = "output buffer too small";
    return false;
  }

  float* dst = job.out;
  for (int y = 0; y < oh; y++) {
    for (int x = 0; x < ow; x++) {
      int sx = job.flip ? cx + (ow - 1 - x) : cx + x;
      const uint8_t* px = &img.at(cy + y, sx, 0);
      for (int ch = 0; ch < 3; ch++) {
        float v = static_cast<float>(px[ch]);
        *dst++ = job.norm_mode == 0 ? v / 127.5f - 1.0f
                                    : (v / 255.0f) * 2.0f - 1.0f;
      }
    }
  }
  *out_w = ow;
  *out_h = oh;
  return true;
}

void Loader::worker() {
  for (;;) {
    Job job;
    {
      std::unique_lock<std::mutex> lock(mu);
      cv_jobs.wait(lock, [&] { return shutting_down || !jobs.empty(); });
      if (shutting_down && jobs.empty()) return;
      job = std::move(jobs.front());
      jobs.pop_front();
    }
    Done d;
    d.tag = job.tag;
    d.ok = run_job(job, &d.w, &d.h, &d.errmsg);
    {
      std::lock_guard<std::mutex> lock(mu);
      done.push_back(std::move(d));
    }
    cv_done.notify_one();
  }
}

}  // namespace

extern "C" {

void* kdip_loader_create(int n_threads) {
  if (n_threads < 1) n_threads = 1;
  Loader* l = new Loader();
  l->threads.reserve(n_threads);
  for (int i = 0; i < n_threads; i++)
    l->threads.emplace_back([l] { l->worker(); });
  return l;
}

int kdip_loader_submit(void* handle, const char* path, int64_t tag,
                       int smaller_dim, int square_w, int square_h,
                       int filter, int crop_size, int crop_x, int crop_y,
                       int flip, int norm_mode, float* out,
                       int out_capacity) {
  Loader* l = static_cast<Loader*>(handle);
  Job job;
  job.path = path;
  job.tag = tag;
  job.smaller_dim = smaller_dim;
  job.square_w = square_w;
  job.square_h = square_h;
  job.filter = filter;
  job.crop_size = crop_size;
  job.crop_x = crop_x;
  job.crop_y = crop_y;
  job.flip = flip;
  job.norm_mode = norm_mode;
  job.out = out;
  job.out_capacity = out_capacity;
  {
    std::lock_guard<std::mutex> lock(l->mu);
    if (l->shutting_down) return -1;
    l->jobs.push_back(std::move(job));
  }
  l->cv_jobs.notify_one();
  return 0;
}

// Blocks until one submitted job finishes. Returns its tag. On job failure
// returns the tag and writes the message into errbuf (empty on success);
// out_w/out_h receive the written dimensions.
int64_t kdip_loader_wait(void* handle, char* errbuf, int errlen,
                         int* out_w, int* out_h) {
  Loader* l = static_cast<Loader*>(handle);
  Done d;
  {
    std::unique_lock<std::mutex> lock(l->mu);
    l->cv_done.wait(lock, [&] { return !l->done.empty(); });
    d = std::move(l->done.front());
    l->done.pop_front();
  }
  if (errbuf && errlen > 0) {
    if (d.ok) {
      errbuf[0] = '\0';
    } else {
      std::snprintf(errbuf, errlen, "%s", d.errmsg.c_str());
    }
  }
  if (out_w) *out_w = d.w;
  if (out_h) *out_h = d.h;
  return d.tag;
}

void kdip_loader_destroy(void* handle) {
  Loader* l = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lock(l->mu);
    l->shutting_down = true;
  }
  l->cv_jobs.notify_all();
  for (auto& t : l->threads) t.join();
  delete l;
}

// Header-only size probe (for Python-side RNG draws that need dimensions
// before the decode completes). Reads a bounded prefix: with random_crop
// every image is probed (submitting thread) AND decoded (worker), so a
// whole-file read here would double per-epoch file I/O and serialize it on
// the submitting thread. Headers sit at the front; only a pathological
// JPEG whose SOF lands past the prefix triggers the full-file retry.
int kdip_probe_size(const char* path, int* w, int* h) {
  constexpr size_t kPrefix = 64 * 1024;
  for (int attempt = 0; attempt < 2; ++attempt) {
    std::vector<uint8_t> buf;
    bool whole_file = attempt == 1;
    if (whole_file) {
      std::string err;
      if (!read_file(path, &buf, &err)) return -1;
    } else {
      FILE* f = std::fopen(path, "rb");
      if (!f) return -1;
      buf.resize(kPrefix);
      size_t got = std::fread(buf.data(), 1, kPrefix, f);
      // short read + no error == the prefix IS the whole file
      whole_file = got < kPrefix && !std::ferror(f);
      std::fclose(f);
      buf.resize(got);
    }
    if (buf.size() >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) {
      jpeg_decompress_struct cinfo;
      JpegErr jerr;
      cinfo.err = jpeg_std_error(&jerr.mgr);
      jerr.mgr.error_exit = jpeg_err_exit;
      if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        if (whole_file) return -1;
        continue;  // SOF past the prefix: retry with the full file
      }
      jpeg_create_decompress(&cinfo);
      jpeg_mem_src(&cinfo, buf.data(),
                   static_cast<unsigned long>(buf.size()));
      jpeg_read_header(&cinfo, TRUE);
      *w = cinfo.image_width;
      *h = cinfo.image_height;
      jpeg_destroy_decompress(&cinfo);
      return 0;
    }
    if (buf.size() >= 24 &&
        std::memcmp(buf.data(), "\x89PNG\r\n\x1a\n", 8) == 0) {
      // IHDR is always first: width/height big-endian at offsets 16/20.
      *w = (buf[16] << 24) | (buf[17] << 16) | (buf[18] << 8) | buf[19];
      *h = (buf[20] << 24) | (buf[21] << 16) | (buf[22] << 8) | buf[23];
      return 0;
    }
    return -1;  // unknown magic: a longer read will not help
  }
  return -1;
}

}  // extern "C"
