// vitnative: host-side native runtime for vit_cpp_tpu.
//
// TPU-native replacement for the reference's stb_image decode path
// (load_image_from_file, vit.cpp:109-127). At the 5k images/sec/chip
// serving target JPEG decode dominates host cost (SURVEY.md §7 "Host
// preprocessing throughput"), so decoding is native C++ over libjpeg /
// libpng with a std::thread worker pool for batch decode; resize +
// normalize stay on the TPU (ops/preprocess.py resampling matmuls).
//
// C ABI (consumed via ctypes from vit_cpp_tpu/native/decoder.py):
//   vn_decode_file(path, &w, &h)        -> malloc'd RGB8 buffer or NULL
//   vn_decode_mem(buf, len, &w, &h)     -> same, from an in-memory file
//   vn_decode_batch(paths, n, threads, outs, ws, hs) -> #succeeded;
//       outs[i] == NULL marks a failed decode (harness-style skip,
//       tests/benchmark.cpp:108-125)
//   vn_free(p)                          -> free a returned buffer
//   vn_version()                        -> ABI version int
//
// Output layout matches the reference contract: interleaved HWC RGB,
// 3 channels forced regardless of source colorspace (stbi_load(...,3)).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

#define VN_ABI_VERSION 1

int vn_version() { return VN_ABI_VERSION; }

void vn_free(uint8_t *p) { std::free(p); }

// ---------------------------------------------------------------- JPEG ----

namespace {

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr *err = reinterpret_cast<JpegErr *>(cinfo->err);
    longjmp(err->jmp, 1);
}

void jpeg_silent(j_common_ptr, int) {}
void jpeg_silent_msg(j_common_ptr) {}

uint8_t *decode_jpeg(const uint8_t *buf, size_t len, int *w, int *h) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    jerr.mgr.emit_message = jpeg_silent;
    jerr.mgr.output_message = jpeg_silent_msg;

    // `out` is written between setjmp and a potential longjmp (the malloc
    // below) and read in the recovery branch; it must be volatile or its
    // value after longjmp is indeterminate (C11 7.13.2.1) — under -O3 the
    // free() could see a stale register copy on a mid-scanline error.
    uint8_t *volatile out = nullptr;
    if (setjmp(jerr.jmp)) {
        std::free(out);
        jpeg_destroy_decompress(&cinfo);
        return nullptr;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t *>(buf),
                 static_cast<unsigned long>(len));
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return nullptr;
    }
    // Force RGB regardless of the source colorspace (grayscale, YCbCr,
    // CMYK via libjpeg's converters) — the stbi_load(..., 3) contract.
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);

    const int width = static_cast<int>(cinfo.output_width);
    const int height = static_cast<int>(cinfo.output_height);
    const int comps = cinfo.output_components;  // 3 after JCS_RGB
    if (comps != 3) {
        jpeg_destroy_decompress(&cinfo);
        return nullptr;
    }
    out = static_cast<uint8_t *>(
        std::malloc(static_cast<size_t>(width) * height * 3));
    if (!out) {
        jpeg_destroy_decompress(&cinfo);
        return nullptr;
    }
    const size_t stride = static_cast<size_t>(width) * 3;
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t *row = out + stride * cinfo.output_scanline;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    *w = width;
    *h = height;
    return out;
}

// ----------------------------------------------------------------- PNG ----

struct PngReadState {
    const uint8_t *data;
    size_t len;
    size_t pos;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
    PngReadState *st =
        static_cast<PngReadState *>(png_get_io_ptr(png));
    if (st->pos + n > st->len) {
        png_error(png, "read past end");
        return;
    }
    std::memcpy(out, st->data + st->pos, n);
    st->pos += n;
}

uint8_t *decode_png(const uint8_t *buf, size_t len, int *w, int *h) {
    if (len < 8 || png_sig_cmp(buf, 0, 8) != 0) return nullptr;
    png_structp png =
        png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    if (!png) return nullptr;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return nullptr;
    }
    // Same setjmp rule as decode_jpeg: both buffers are allocated after
    // setjmp and freed in the recovery branch, so the pointers must be
    // volatile (a std::vector would have indeterminate internals after
    // longjmp — use a plain malloc'd row-pointer array instead).
    uint8_t *volatile out = nullptr;
    png_bytep *volatile rows = nullptr;
    if (setjmp(png_jmpbuf(png))) {
        std::free(out);
        std::free(rows);
        png_destroy_read_struct(&png, &info, nullptr);
        return nullptr;
    }
    PngReadState st{buf, len, 0};
    png_set_read_fn(png, &st, png_mem_read);
    png_read_info(png, info);

    // Normalize every PNG variant to 8-bit RGB: palette -> RGB, gray ->
    // 8-bit gray -> RGB, 16-bit -> 8-bit, alpha/tRNS stripped.
    png_byte color = png_get_color_type(png, info);
    png_byte depth = png_get_bit_depth(png, info);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    png_set_strip_alpha(png);
    png_read_update_info(png, info);

    const int width = static_cast<int>(png_get_image_width(png, info));
    const int height = static_cast<int>(png_get_image_height(png, info));
    if (png_get_rowbytes(png, info) != static_cast<size_t>(width) * 3) {
        png_destroy_read_struct(&png, &info, nullptr);
        return nullptr;
    }
    out = static_cast<uint8_t *>(
        std::malloc(static_cast<size_t>(width) * height * 3));
    if (!out) {
        png_destroy_read_struct(&png, &info, nullptr);
        return nullptr;
    }
    rows = static_cast<png_bytep *>(
        std::malloc(sizeof(png_bytep) * static_cast<size_t>(height)));
    if (!rows) {
        std::free(out);
        png_destroy_read_struct(&png, &info, nullptr);
        return nullptr;
    }
    for (int y = 0; y < height; ++y)
        rows[y] = out + static_cast<size_t>(width) * 3 * y;
    png_read_image(png, rows);
    png_read_end(png, nullptr);
    uint8_t *result = out;
    std::free(rows);
    png_destroy_read_struct(&png, &info, nullptr);
    *w = width;
    *h = height;
    return result;
}

// ----------------------------------------------------------------- BMP ----
// Uncompressed 24/32-bit BI_RGB bitmaps (the overwhelmingly common case the
// reference's stb_image path accepts, vit.h:5). Bottom-up and top-down rows.

uint8_t *decode_bmp(const uint8_t *buf, size_t len, int *w, int *h) {
    auto rd32 = [&](size_t off) -> uint32_t {
        return static_cast<uint32_t>(buf[off]) |
               (static_cast<uint32_t>(buf[off + 1]) << 8) |
               (static_cast<uint32_t>(buf[off + 2]) << 16) |
               (static_cast<uint32_t>(buf[off + 3]) << 24);
    };
    auto rd16 = [&](size_t off) -> uint16_t {
        return static_cast<uint16_t>(buf[off]) |
               (static_cast<uint16_t>(buf[off + 1]) << 8);
    };
    if (len < 54 || buf[0] != 'B' || buf[1] != 'M') return nullptr;
    const uint32_t data_off = rd32(10);
    const uint32_t hdr_size = rd32(14);
    if (hdr_size < 40) return nullptr;  // BITMAPINFOHEADER+
    const int32_t width = static_cast<int32_t>(rd32(18));
    const int32_t height_raw = static_cast<int32_t>(rd32(22));
    const uint16_t bpp = rd16(28);
    const uint32_t compression = rd32(30);
    if (width <= 0 || height_raw == 0) return nullptr;
    if (compression != 0 || (bpp != 24 && bpp != 32)) return nullptr;
    const bool top_down = height_raw < 0;
    const int height = top_down ? -height_raw : height_raw;
    const size_t src_stride = ((static_cast<size_t>(width) * bpp / 8) + 3) & ~size_t(3);
    if (data_off + src_stride * height > len) return nullptr;
    uint8_t *out = static_cast<uint8_t *>(
        std::malloc(static_cast<size_t>(width) * height * 3));
    if (!out) return nullptr;
    const int bytes = bpp / 8;
    for (int y = 0; y < height; ++y) {
        const uint8_t *src =
            buf + data_off + src_stride * (top_down ? y : height - 1 - y);
        uint8_t *dst = out + static_cast<size_t>(width) * 3 * y;
        for (int x = 0; x < width; ++x) {
            dst[3 * x + 0] = src[bytes * x + 2];  // BGR(A) -> RGB
            dst[3 * x + 1] = src[bytes * x + 1];
            dst[3 * x + 2] = src[bytes * x + 0];
        }
    }
    *w = width;
    *h = height;
    return out;
}

// ----------------------------------------------------------------- PNM ----
// Binary P5 (gray) / P6 (RGB) portable anymaps, maxval <= 255.

uint8_t *decode_pnm(const uint8_t *buf, size_t len, int *w, int *h) {
    if (len < 2 || buf[0] != 'P' || (buf[1] != '5' && buf[1] != '6'))
        return nullptr;
    const bool rgb = buf[1] == '6';
    size_t pos = 2;
    auto next_int = [&](long *out_val) -> bool {
        // skip whitespace and '#' comments
        for (;;) {
            while (pos < len && (buf[pos] == ' ' || buf[pos] == '\t' ||
                                 buf[pos] == '\n' || buf[pos] == '\r'))
                ++pos;
            if (pos < len && buf[pos] == '#') {
                while (pos < len && buf[pos] != '\n') ++pos;
            } else {
                break;
            }
        }
        long v = 0;
        bool any = false;
        while (pos < len && buf[pos] >= '0' && buf[pos] <= '9') {
            v = v * 10 + (buf[pos] - '0');
            ++pos;
            any = true;
        }
        *out_val = v;
        return any;
    };
    long width, height, maxval;
    if (!next_int(&width) || !next_int(&height) || !next_int(&maxval))
        return nullptr;
    if (width <= 0 || height <= 0 || maxval <= 0 || maxval > 255)
        return nullptr;
    ++pos;  // single whitespace after maxval
    const size_t npix = static_cast<size_t>(width) * height;
    const size_t need = npix * (rgb ? 3 : 1);
    if (pos + need > len) return nullptr;
    uint8_t *out = static_cast<uint8_t *>(std::malloc(npix * 3));
    if (!out) return nullptr;
    const uint8_t *src = buf + pos;
    if (rgb) {
        std::memcpy(out, src, npix * 3);
    } else {
        for (size_t i = 0; i < npix; ++i) {
            out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = src[i];
        }
    }
    *w = static_cast<int>(width);
    *h = static_cast<int>(height);
    return out;
}

uint8_t *read_file(const char *path, size_t *len) {
    FILE *f = std::fopen(path, "rb");
    if (!f) return nullptr;
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    if (sz < 0) {
        std::fclose(f);
        return nullptr;
    }
    std::fseek(f, 0, SEEK_SET);
    uint8_t *buf = static_cast<uint8_t *>(std::malloc(sz ? sz : 1));
    if (!buf) {
        std::fclose(f);
        return nullptr;
    }
    size_t got = std::fread(buf, 1, sz, f);
    std::fclose(f);
    if (got != static_cast<size_t>(sz)) {
        std::free(buf);
        return nullptr;
    }
    *len = got;
    return buf;
}

}  // namespace

// ---------------------------------------------------------------- C API ----

uint8_t *vn_decode_mem(const uint8_t *buf, size_t len, int *w, int *h) {
    if (!buf || len < 4) return nullptr;
    // dispatch on magic: JPEG SOI / PNG signature / BMP / binary PNM
    if (buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg(buf, len, w, h);
    if (buf[0] == 0x89 && buf[1] == 'P') return decode_png(buf, len, w, h);
    if (buf[0] == 'B' && buf[1] == 'M') return decode_bmp(buf, len, w, h);
    if (buf[0] == 'P' && (buf[1] == '5' || buf[1] == '6'))
        return decode_pnm(buf, len, w, h);
    // fall through: try both (some JPEGs lack the classic prefix check)
    uint8_t *out = decode_jpeg(buf, len, w, h);
    if (out) return out;
    return decode_png(buf, len, w, h);
}

uint8_t *vn_decode_file(const char *path, int *w, int *h) {
    size_t len = 0;
    uint8_t *buf = read_file(path, &len);
    if (!buf) return nullptr;
    uint8_t *out = vn_decode_mem(buf, len, w, h);
    std::free(buf);
    return out;
}

// Decode n files with a worker pool; outs[i] == NULL marks failure.
// Returns the number of successful decodes.
int vn_decode_batch(const char **paths, int n, int n_threads,
                    uint8_t **outs, int *ws, int *hs) {
    if (n <= 0) return 0;
    if (n_threads < 1) n_threads = 1;
    if (n_threads > n) n_threads = n;
    std::atomic<int> next(0), ok(0);
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            outs[i] = vn_decode_file(paths[i], &ws[i], &hs[i]);
            if (outs[i]) ok.fetch_add(1);
        }
    };
    if (n_threads == 1) {
        worker();
    } else {
        std::vector<std::thread> pool;
        pool.reserve(n_threads);
        for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
        for (auto &th : pool) th.join();
    }
    return ok.load();
}

}  // extern "C"
