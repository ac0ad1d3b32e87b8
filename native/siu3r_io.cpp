// siu3r_io: native IO runtime for the data loader.
//
// The reference feeds its trainer through 64 python DataLoader workers
// (configs/main.yaml:41) doing PIL JPEG/PNG decodes; this library is the
// TPU-framework equivalent of that native path: libjpeg/libpng decodes and
// segment-id packing executed by a C++ thread pool, exposed over a plain C
// ABI consumed via ctypes (no pybind11 in this image).
//
// Exposed functions (all return 0 on success):
//   sio_decode_jpeg(path, out_rgb_u8, w, h)        decode, assert size
//   sio_decode_png_rgb(path, out_rgb_u8, w, h)
//   sio_decode_png_gray16(path, out_u16, w, h)
//   sio_image_size(path, &w, &h)                   peek dimensions
//   sio_decode_batch(...)                           threaded batch decode
//   sio_pack_segments / sio_unpack_segments        1000*sem+inst <-> RGB

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

int sio_decode_jpeg(const char* path, uint8_t* out, int width, int height) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_width != width || (int)cinfo.output_height != height) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -3;
  }
  int stride = width * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

static int read_png(const char* path, int expect_color, void* out, int width,
                    int height) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -2;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  if (w != width || h != height) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -3;
  }
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (expect_color) {
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    png_set_strip_alpha(png);
    png_read_update_info(png, info);
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; y++)
      rows[y] = reinterpret_cast<uint8_t*>(out) + (size_t)y * w * 3;
    png_read_image(png, rows.data());
  } else {
    // 16-bit grayscale depth; PNG stores big-endian, we want host LE
    if (depth != 16 || color != PNG_COLOR_TYPE_GRAY) {
      // tolerate 8-bit gray by widening
      if (depth == 8 && color == PNG_COLOR_TYPE_GRAY) {
        std::vector<uint8_t> tmp((size_t)w * h);
        std::vector<png_bytep> rows(h);
        for (int y = 0; y < h; y++) rows[y] = tmp.data() + (size_t)y * w;
        png_read_image(png, rows.data());
        uint16_t* o = reinterpret_cast<uint16_t*>(out);
        for (size_t i = 0; i < tmp.size(); i++) o[i] = tmp[i];
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(f);
        return 0;
      }
      png_destroy_read_struct(&png, &info, nullptr);
      fclose(f);
      return -4;
    }
    png_set_swap(png);  // BE -> LE
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; y++)
      rows[y] = reinterpret_cast<uint8_t*>(out) + (size_t)y * w * 2;
    png_read_image(png, rows.data());
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return 0;
}

int sio_decode_png_rgb(const char* path, uint8_t* out, int w, int h) {
  return read_png(path, 1, out, w, h);
}

int sio_decode_png_gray16(const char* path, uint16_t* out, int w, int h) {
  return read_png(path, 0, out, w, h);
}

int sio_image_size(const char* path, int* w, int* h) {
  const char* dot = strrchr(path, '.');
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  unsigned char sig[8];
  if (fread(sig, 1, 8, f) != 8) {
    fclose(f);
    return -1;
  }
  fseek(f, 0, SEEK_SET);
  if (!png_sig_cmp(sig, 0, 8)) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
      png_destroy_read_struct(&png, &info, nullptr);
      fclose(f);
      return -2;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    *w = png_get_image_width(png, info);
    *h = png_get_image_height(png, info);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 0;
  }
  (void)dot;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

// kind: 0 = jpeg RGB, 1 = png RGB, 2 = png gray16
int sio_decode_batch(const char** paths, int n, int kind, void* out,
                     int width, int height, int n_threads) {
  size_t item = (kind == 2) ? (size_t)width * height * 2
                            : (size_t)width * height * 3;
  std::vector<int> status(n, 0);
  int workers = n_threads > 0 ? n_threads : 4;
  std::vector<std::thread> threads;
  for (int t = 0; t < workers; t++) {
    threads.emplace_back([&, t]() {
      for (int i = t; i < n; i += workers) {
        uint8_t* dst = reinterpret_cast<uint8_t*>(out) + (size_t)i * item;
        if (kind == 0)
          status[i] = sio_decode_jpeg(paths[i], dst, width, height);
        else if (kind == 1)
          status[i] = sio_decode_png_rgb(paths[i], dst, width, height);
        else
          status[i] = sio_decode_png_gray16(
              paths[i], reinterpret_cast<uint16_t*>(dst), width, height);
      }
    });
  }
  for (auto& th : threads) th.join();
  for (int s : status)
    if (s != 0) return s;
  return 0;
}

// segment id <-> RGB base-256 packing (reference visualizer.py:486-503)
void sio_pack_segments(const int32_t* sem, const int32_t* ins, uint8_t* rgb,
                       int64_t n) {
  for (int64_t i = 0; i < n; i++) {
    int32_t seg = sem[i] * 1000 + ins[i];
    if (seg < 0) seg = 0;
    rgb[i * 3 + 0] = seg & 0xFF;
    rgb[i * 3 + 1] = (seg >> 8) & 0xFF;
    rgb[i * 3 + 2] = (seg >> 16) & 0xFF;
  }
}

void sio_unpack_segments(const uint8_t* rgb, int32_t* sem, int32_t* ins,
                         int64_t n) {
  for (int64_t i = 0; i < n; i++) {
    int32_t seg = rgb[i * 3] | (rgb[i * 3 + 1] << 8) | (rgb[i * 3 + 2] << 16);
    sem[i] = seg / 1000;
    ins[i] = seg % 1000;
  }
}

}  // extern "C"
