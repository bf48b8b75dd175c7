// Native host-IO runtime for dpm_solver_tpu.
//
// Role: the reference delegates its host-side data plane to native code —
// tf.data's C++ runtime reads/decodes TFRecords for training and eval
// (examples/score_sde_jax/datasets.py:103-199), and the FID protocol writes
// and re-reads tens of thousands of PNGs per evaluation
// (examples/ddpm_and_guided-diffusion/runners/diffusion.py:450-457,
// evaluate/fid_score.py:146-170). This library is the TPU-framework
// equivalent: a small C++ data plane the Python layer drives through ctypes
// (no pybind11 in this image), so sampling throughput on the chip is never
// gated on single-threaded PIL encode or tf.data imports.
//
// Components (all extern "C", no global state, thread pool per call):
//   * PNG encode/decode batches via libpng with std::thread workers.
//   * TFRecord index/scan: mmap + the framed record layout
//     (u64 len | u32 maskedcrc(len) | payload | u32 maskedcrc(payload))
//     with CRC32C (Castagnoli) verification.
//   * Minimal tf.train.Example walker: find the first bytes/int64 value for
//     a feature key without a protobuf runtime (wire format only).
//
// Build: dpm_solver_tpu/native/build.py (g++ -O2 -shared -lpng -lz).

#include <png.h>
#include <zlib.h>

#include <csetjmp>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

// ---------------------------------------------------------------- thread map
// Run fn(i) for i in [0, n) on up to `threads` workers. Returns the number
// of failures (fn returns 0 on success).
int parallel_for(int64_t n, int threads, int (*fn)(int64_t, void*), void* ctx) {
  if (threads < 1) threads = 1;
  if (threads > n) threads = static_cast<int>(n);
  std::atomic<int64_t> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) return;
      if (fn(i, ctx) != 0) failures.fetch_add(1);
    }
  };
  if (threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(threads);
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failures.load();
}

// ------------------------------------------------------------------- CRC32C
// Castagnoli polynomial (reflected 0x82F63B78), table-driven; the TFRecord
// framing masks it as ((crc >> 15 | crc << 17) + 0xa282ead8).
struct Crc32cTable {
  uint32_t t[256];
  Crc32cTable() {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k)
        c = (c & 1) ? (0x82F63B78u ^ (c >> 1)) : (c >> 1);
      t[i] = c;
    }
  }
};
const Crc32cTable kCrc;

uint32_t crc32c(const uint8_t* p, size_t n) {
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i) c = kCrc.t[(c ^ p[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

uint32_t masked_crc(const uint8_t* p, size_t n) {
  uint32_t c = crc32c(p, n);
  return ((c >> 15) | (c << 17)) + 0xa282ead8u;
}

uint32_t load_u32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;  // TFRecord framing is little-endian; so are our targets
}

uint64_t load_u64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;
}

// --------------------------------------------------------------- PNG encode
struct PngWriteCtx {
  const uint8_t* data;
  int64_t h, w, c;
  const char** paths;
};

int png_color_type(int64_t c) {
  switch (c) {
    case 1: return PNG_COLOR_TYPE_GRAY;
    case 2: return PNG_COLOR_TYPE_GRAY_ALPHA;
    case 3: return PNG_COLOR_TYPE_RGB;
    case 4: return PNG_COLOR_TYPE_RGB_ALPHA;
    default: return -1;
  }
}

int write_one_png(int64_t i, void* vctx) {
  auto* ctx = static_cast<PngWriteCtx*>(vctx);
  int color = png_color_type(ctx->c);
  if (color < 0) return 1;
  FILE* fp = std::fopen(ctx->paths[i], "wb");
  if (!fp) return 1;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_write_struct(&png, info ? &info : nullptr);
    std::fclose(fp);
    return 1;
  }
  png_init_io(png, fp);
  // FID folders are written once and scanned once; favor encode speed over
  // ratio (tf.data's image ops make the same call).
  png_set_compression_level(png, 1);
  png_set_filter(png, 0, PNG_FILTER_SUB);
  png_set_IHDR(png, info, static_cast<png_uint_32>(ctx->w),
               static_cast<png_uint_32>(ctx->h), 8, color,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  const uint8_t* img = ctx->data + i * ctx->h * ctx->w * ctx->c;
  std::vector<png_bytep> rows(ctx->h);
  for (int64_t r = 0; r < ctx->h; ++r)
    rows[r] = const_cast<png_bytep>(img + r * ctx->w * ctx->c);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(fp);
  return 0;
}

// --------------------------------------------------------------- PNG decode
struct PngReadCtx {
  const char** paths;
  uint8_t* out;
  int64_t h, w, c;
};

int read_one_png(int64_t i, void* vctx) {
  auto* ctx = static_cast<PngReadCtx*>(vctx);
  FILE* fp = std::fopen(ctx->paths[i], "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    std::fclose(fp);
    return 1;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  // Normalize to 8-bit and to the caller's channel count: palette->RGB,
  // 16-bit->8-bit, gray<8bit expanded; add or strip alpha as needed.
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_16(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  int color = png_get_color_type(png, info);
  if (ctx->c >= 3 && (color == PNG_COLOR_TYPE_GRAY ||
                      color == PNG_COLOR_TYPE_GRAY_ALPHA))
    png_set_gray_to_rgb(png);
  if (ctx->c <= 2 && (color == PNG_COLOR_TYPE_RGB ||
                      color == PNG_COLOR_TYPE_RGB_ALPHA ||
                      color == PNG_COLOR_TYPE_PALETTE))
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  if (ctx->c == 1 || ctx->c == 3) png_set_strip_alpha(png);
  if ((ctx->c == 2 || ctx->c == 4))
    png_set_add_alpha(png, 0xFF, PNG_FILLER_AFTER);
  png_read_update_info(png, info);
  if (png_get_image_width(png, info) != static_cast<png_uint_32>(ctx->w) ||
      png_get_image_height(png, info) != static_cast<png_uint_32>(ctx->h) ||
      png_get_channels(png, info) != static_cast<png_byte>(ctx->c)) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 1;
  }
  uint8_t* img = ctx->out + i * ctx->h * ctx->w * ctx->c;
  std::vector<png_bytep> rows(ctx->h);
  for (int64_t r = 0; r < ctx->h; ++r) rows[r] = img + r * ctx->w * ctx->c;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// ------------------------------------------------- in-memory image decode
// Decodes encoded PNG/JPEG payloads straight out of TFRecord Example
// buffers — the native twin of tf.image.decode_image inside the
// reference's input pipeline (score_sde_jax/datasets.py:139).

struct MemReader {
  const uint8_t* p;
  size_t n;
  size_t pos;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t count) {
  auto* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->pos + count > r->n) {
    png_error(png, "read past end");
    return;
  }
  std::memcpy(out, r->p + r->pos, count);
  r->pos += count;
}

bool is_png(const uint8_t* p, size_t n) {
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'};
  return n >= 8 && std::memcmp(p, sig, 8) == 0;
}

bool is_jpeg(const uint8_t* p, size_t n) {
  return n >= 2 && p[0] == 0xFF && p[1] == 0xD8;
}

// Decode one in-memory PNG into out (h*w*c uint8, caller-checked dims).
int decode_png_mem(const uint8_t* buf, size_t n, uint8_t* out, int64_t h,
                   int64_t w, int64_t c) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    return 1;
  }
  MemReader reader{buf, n, 0};
  png_set_read_fn(png, &reader, png_mem_read);
  png_read_info(png, info);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_16(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  int color = png_get_color_type(png, info);
  if (c >= 3 && (color == PNG_COLOR_TYPE_GRAY ||
                 color == PNG_COLOR_TYPE_GRAY_ALPHA))
    png_set_gray_to_rgb(png);
  if (c <= 2 && (color == PNG_COLOR_TYPE_RGB ||
                 color == PNG_COLOR_TYPE_RGB_ALPHA ||
                 color == PNG_COLOR_TYPE_PALETTE))
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  if (c == 1 || c == 3) png_set_strip_alpha(png);
  if (c == 2 || c == 4) png_set_add_alpha(png, 0xFF, PNG_FILLER_AFTER);
  png_read_update_info(png, info);
  if (png_get_image_width(png, info) != static_cast<png_uint_32>(w) ||
      png_get_image_height(png, info) != static_cast<png_uint_32>(h) ||
      png_get_channels(png, info) != static_cast<png_byte>(c)) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 1;
  }
  std::vector<png_bytep> rows(h);
  for (int64_t r = 0; r < h; ++r) rows[r] = out + r * w * c;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  std::longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jmp, 1);
}

int decode_jpeg_mem(const uint8_t* buf, size_t n, uint8_t* out, int64_t h,
                    int64_t w, int64_t c) {
  if (c != 1 && c != 3) return 1;  // libjpeg emits GRAY or RGB
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf), n);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = (c == 1) ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (cinfo.output_width != static_cast<JDIMENSION>(w) ||
      cinfo.output_height != static_cast<JDIMENSION>(h) ||
      cinfo.output_components != c) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + int64_t(cinfo.output_scanline) * w * c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

struct MemDecodeCtx {
  const uint8_t* blob;
  const int64_t* offs;
  const int64_t* lens;
  uint8_t* out;
  int64_t h, w, c;
};

int decode_one_mem(int64_t i, void* vctx) {
  auto* ctx = static_cast<MemDecodeCtx*>(vctx);
  const uint8_t* p = ctx->blob + ctx->offs[i];
  size_t n = static_cast<size_t>(ctx->lens[i]);
  uint8_t* out = ctx->out + i * ctx->h * ctx->w * ctx->c;
  if (is_png(p, n)) return decode_png_mem(p, n, out, ctx->h, ctx->w, ctx->c);
  if (is_jpeg(p, n))
    return decode_jpeg_mem(p, n, out, ctx->h, ctx->w, ctx->c);
  return 1;
}

// --------------------------------------------------------- protobuf walking
// Enough of the wire format to navigate tf.train.Example:
//   Example{ Features features=1 } ; Features{ map<string,Feature> feature=1 }
//   map entry { string key=1; Feature value=2 }
//   Feature{ BytesList=1 | FloatList=2 | Int64List=3 }, each { repeated v=1 }
struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint64_t varint() {
    uint64_t v = 0;
    int shift = 0;
    while (p < end && shift < 64) {
      uint8_t b = *p++;
      v |= static_cast<uint64_t>(b & 0x7F) << shift;
      if (!(b & 0x80)) return v;
      shift += 7;
    }
    ok = false;
    return 0;
  }

  // Returns field number, sets wire type; 0 on end/error.
  uint32_t tag(uint32_t* wire) {
    if (p >= end) return 0;
    uint64_t t = varint();
    if (!ok) return 0;
    *wire = static_cast<uint32_t>(t & 7);
    return static_cast<uint32_t>(t >> 3);
  }

  // Length-delimited payload: returns start, advances past it.
  const uint8_t* len_delimited(uint64_t* n) {
    *n = varint();
    if (!ok || p + *n > end) {
      ok = false;
      return nullptr;
    }
    const uint8_t* s = p;
    p += *n;
    return s;
  }

  void skip(uint32_t wire) {
    switch (wire) {
      case 0: varint(); break;
      case 1: p += 8; break;
      case 2: {
        uint64_t n;
        len_delimited(&n);
        break;
      }
      case 5: p += 4; break;
      default: ok = false;
    }
    if (p > end) ok = false;
  }
};

// Find the Feature submessage for `key` inside a serialized Example.
// Returns true and sets [fs, fe) to the Feature bytes.
bool find_feature(const uint8_t* rec, int64_t len, const char* key,
                  const uint8_t** fs, const uint8_t** fe) {
  size_t klen = std::strlen(key);
  Cursor ex{rec, rec + len};
  uint32_t wire;
  while (uint32_t f = ex.tag(&wire)) {
    if (f == 1 && wire == 2) {  // Features
      uint64_t n;
      const uint8_t* s = ex.len_delimited(&n);
      if (!s) return false;
      Cursor feats{s, s + n};
      while (uint32_t ff = feats.tag(&wire)) {
        if (ff == 1 && wire == 2) {  // map entry
          uint64_t en;
          const uint8_t* es = feats.len_delimited(&en);
          if (!es) return false;
          Cursor entry{es, es + en};
          const uint8_t *ks = nullptr, *vs = nullptr;
          uint64_t kn = 0, vn = 0;
          while (uint32_t ef = entry.tag(&wire)) {
            if (ef == 1 && wire == 2) {
              ks = entry.len_delimited(&kn);
            } else if (ef == 2 && wire == 2) {
              vs = entry.len_delimited(&vn);
            } else {
              entry.skip(wire);
            }
            if (!entry.ok) return false;
          }
          if (ks && vs && kn == klen && std::memcmp(ks, key, klen) == 0) {
            *fs = vs;
            *fe = vs + vn;
            return true;
          }
        } else {
          feats.skip(wire);
        }
        if (!feats.ok) return false;
      }
    } else {
      ex.skip(wire);
    }
    if (!ex.ok) return false;
  }
  return false;
}

}  // namespace

extern "C" {

// Write n HxWxC uint8 images (contiguous) to paths[]. Returns the number of
// failed images (0 = all written).
int dpm_png_write_batch(const uint8_t* data, int64_t n, int64_t h, int64_t w,
                        int64_t c, const char** paths, int threads) {
  PngWriteCtx ctx{data, h, w, c, paths};
  return parallel_for(n, threads, write_one_png, &ctx);
}

// Probe a PNG's dimensions without decoding pixel data. Returns 0 on success.
int dpm_png_probe(const char* path, int64_t* h, int64_t* w, int64_t* c) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    std::fclose(fp);
    return 1;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *h = png_get_image_height(png, info);
  *w = png_get_image_width(png, info);
  int color = png_get_color_type(png, info);
  *c = (color == PNG_COLOR_TYPE_GRAY) ? 1
       : (color == PNG_COLOR_TYPE_GRAY_ALPHA) ? 2
       : (color == PNG_COLOR_TYPE_RGB_ALPHA) ? 4
                                             : 3;
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// Decode n PNGs (all HxWxC after normalization) into out. Returns the
// number of failures.
int dpm_png_read_batch(const char** paths, int64_t n, uint8_t* out, int64_t h,
                       int64_t w, int64_t c, int threads) {
  PngReadCtx ctx{paths, out, h, w, c};
  return parallel_for(n, threads, read_one_png, &ctx);
}

// Probe an in-memory encoded image (PNG or JPEG). kind: 1=png, 2=jpeg.
// Returns 0 on success.
int dpm_image_probe_mem(const uint8_t* buf, int64_t n, int64_t* h, int64_t* w,
                        int64_t* c, int* kind) {
  size_t sn = static_cast<size_t>(n);
  if (is_png(buf, sn)) {
    *kind = 1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (!png || !info || setjmp(png_jmpbuf(png))) {
      if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
      return 1;
    }
    MemReader reader{buf, sn, 0};
    png_set_read_fn(png, &reader, png_mem_read);
    png_read_info(png, info);
    *h = png_get_image_height(png, info);
    *w = png_get_image_width(png, info);
    int color = png_get_color_type(png, info);
    *c = (color == PNG_COLOR_TYPE_GRAY) ? 1
         : (color == PNG_COLOR_TYPE_GRAY_ALPHA) ? 2
         : (color == PNG_COLOR_TYPE_RGB_ALPHA) ? 4
                                               : 3;
    png_destroy_read_struct(&png, &info, nullptr);
    return 0;
  }
  if (is_jpeg(buf, sn)) {
    *kind = 2;
    jpeg_decompress_struct cinfo;
    JpegErr err;
    cinfo.err = jpeg_std_error(&err.mgr);
    err.mgr.error_exit = jpeg_err_exit;
    if (setjmp(err.jmp)) {
      jpeg_destroy_decompress(&cinfo);
      return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
                 static_cast<unsigned long>(sn));
    jpeg_read_header(&cinfo, TRUE);
    *h = cinfo.image_height;
    *w = cinfo.image_width;
    *c = cinfo.num_components;
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  return 1;
}

// Decode n encoded images (PNG/JPEG payloads at blob+offs[i], lens[i] bytes
// each; all decoding to HxWxC after channel normalization) into out.
// Returns the number of failures.
int dpm_decode_mem_batch(const uint8_t* blob, const int64_t* offs,
                         const int64_t* lens, int64_t n, uint8_t* out,
                         int64_t h, int64_t w, int64_t c, int threads) {
  MemDecodeCtx ctx{blob, offs, lens, out, h, w, c};
  return parallel_for(n, threads, decode_one_mem, &ctx);
}

// Index a TFRecord file: fill offsets[]/lengths[] (payload byte ranges) up
// to cap records. check_crc=1 verifies both masked CRC32C fields; =0 only
// the header CRC (cheap corruption guard). Returns the record count, or
// -(byte_position+1) of the first framing/CRC error.
int64_t dpm_tfrecord_index(const char* path, int64_t* offsets,
                           int64_t* lengths, int64_t cap, int check_crc) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  if (st.st_size == 0) {
    close(fd);
    return 0;
  }
  const uint8_t* base = static_cast<const uint8_t*>(
      mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (base == MAP_FAILED) return -1;
  int64_t size = st.st_size, pos = 0, count = 0;
  while (pos < size) {
    if (pos + 12 > size) {
      count = -(pos + 1);
      break;
    }
    uint64_t len = load_u64(base + pos);
    if (load_u32(base + pos + 8) != masked_crc(base + pos, 8) ||
        pos + 12 + static_cast<int64_t>(len) + 4 > size) {
      count = -(pos + 1);
      break;
    }
    const uint8_t* payload = base + pos + 12;
    if (check_crc &&
        load_u32(payload + len) != masked_crc(payload, len)) {
      count = -(pos + 1);
      break;
    }
    if (count < cap) {
      offsets[count] = pos + 12;
      lengths[count] = static_cast<int64_t>(len);
    }
    ++count;
    pos += 12 + static_cast<int64_t>(len) + 4;
  }
  munmap(const_cast<uint8_t*>(base), st.st_size);
  return count;
}

// Locate the idx-th bytes value of feature `key` inside a serialized
// tf.train.Example. Sets *off/*blen relative to rec. Returns 0 on success,
// 1 if the key/value is absent or malformed.
int dpm_example_find_bytes(const uint8_t* rec, int64_t len, const char* key,
                           int64_t idx, int64_t* off, int64_t* blen) {
  const uint8_t *fs, *fe;
  if (!find_feature(rec, len, key, &fs, &fe)) return 1;
  Cursor feat{fs, fe};
  uint32_t wire;
  while (uint32_t f = feat.tag(&wire)) {
    if (f == 1 && wire == 2) {  // BytesList
      uint64_t n;
      const uint8_t* s = feat.len_delimited(&n);
      if (!s) return 1;
      Cursor list{s, s + n};
      int64_t seen = 0;
      while (uint32_t lf = list.tag(&wire)) {
        if (lf == 1 && wire == 2) {
          uint64_t bn;
          const uint8_t* bs = list.len_delimited(&bn);
          if (!bs) return 1;
          if (seen++ == idx) {
            *off = bs - rec;
            *blen = static_cast<int64_t>(bn);
            return 0;
          }
        } else {
          list.skip(wire);
        }
        if (!list.ok) return 1;
      }
    } else {
      feat.skip(wire);
    }
    if (!feat.ok) return 1;
  }
  return 1;
}

// First int64 value of feature `key` (Int64List, packed or not). Returns 0
// on success.
int dpm_example_find_int64(const uint8_t* rec, int64_t len, const char* key,
                           int64_t* value) {
  const uint8_t *fs, *fe;
  if (!find_feature(rec, len, key, &fs, &fe)) return 1;
  Cursor feat{fs, fe};
  uint32_t wire;
  while (uint32_t f = feat.tag(&wire)) {
    if (f == 3 && wire == 2) {  // Int64List
      uint64_t n;
      const uint8_t* s = feat.len_delimited(&n);
      if (!s) return 1;
      Cursor list{s, s + n};
      while (uint32_t lf = list.tag(&wire)) {
        if (lf == 1 && wire == 0) {  // unpacked varint
          *value = static_cast<int64_t>(list.varint());
          return list.ok ? 0 : 1;
        }
        if (lf == 1 && wire == 2) {  // packed
          uint64_t pn;
          const uint8_t* ps = list.len_delimited(&pn);
          if (!ps) return 1;
          Cursor packed{ps, ps + pn};
          *value = static_cast<int64_t>(packed.varint());
          return packed.ok ? 0 : 1;
        }
        list.skip(wire);
        if (!list.ok) return 1;
      }
    } else {
      feat.skip(wire);
    }
    if (!feat.ok) return 1;
  }
  return 1;
}

// CRC32C of a buffer (unmasked); exposed for tests.
uint32_t dpm_crc32c(const uint8_t* p, int64_t n) {
  return crc32c(p, static_cast<size_t>(n));
}

}  // extern "C"
