// Native data-loader core: JPEG/PNG decode + resize straight into
// preallocated batch buffers, with a GIL-free thread pool.
//
// TPU-native analogue of the reference's implicit native data path
// (cv2/albumentations C backends behind torch DataLoader workers,
// reference src/data/dataset.py:116-137).  Differences that matter:
//  - JPEG decodes use libjpeg DCT scaling (decode at 1/2,1/4,1/8 when
//    downscaling) so multi-megapixel aerial photos cost a fraction of a
//    full decode;
//  - pixels land directly in the caller's batch buffer (numpy array) --
//    no per-image allocations, no stacking copy;
//  - decoding runs on std::thread workers, fully outside the GIL.
//
// Build: g++ -O3 -fPIC -shared loader.cpp -o libuda_loader.so -ljpeg -lpng
// Python binding: ctypes (uda_aerial_semantic_segmentation_research_tpu/data/native.py).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jump, 1);
}

// Bilinear resize RGB u8 (src HxWx3) -> dst (out_h x out_w x 3).
void resize_bilinear_rgb(const uint8_t* src, int h, int w, uint8_t* dst,
                         int out_h, int out_w) {
    if (h == out_h && w == out_w) {
        memcpy(dst, src, static_cast<size_t>(h) * w * 3);
        return;
    }
    const float sy = static_cast<float>(h) / out_h;
    const float sx = static_cast<float>(w) / out_w;
    for (int y = 0; y < out_h; ++y) {
        float fy = (y + 0.5f) * sy - 0.5f;
        int y0 = static_cast<int>(fy);
        y0 = std::max(0, std::min(y0, h - 1));
        int y1 = std::min(y0 + 1, h - 1);
        float wy = fy - static_cast<float>(y0);
        wy = std::max(0.0f, std::min(wy, 1.0f));
        for (int x = 0; x < out_w; ++x) {
            float fx = (x + 0.5f) * sx - 0.5f;
            int x0 = static_cast<int>(fx);
            x0 = std::max(0, std::min(x0, w - 1));
            int x1 = std::min(x0 + 1, w - 1);
            float wx = fx - static_cast<float>(x0);
            wx = std::max(0.0f, std::min(wx, 1.0f));
            for (int c = 0; c < 3; ++c) {
                float a = src[(static_cast<size_t>(y0) * w + x0) * 3 + c];
                float b = src[(static_cast<size_t>(y0) * w + x1) * 3 + c];
                float d = src[(static_cast<size_t>(y1) * w + x0) * 3 + c];
                float e = src[(static_cast<size_t>(y1) * w + x1) * 3 + c];
                float top = a + (b - a) * wx;
                float bot = d + (e - d) * wx;
                dst[(static_cast<size_t>(y) * out_w + x) * 3 + c] =
                    static_cast<uint8_t>(top + (bot - top) * wy + 0.5f);
            }
        }
    }
}

void resize_nearest_i32(const int32_t* src, int h, int w, int32_t* dst,
                        int out_h, int out_w) {
    if (h == out_h && w == out_w) {
        memcpy(dst, src, static_cast<size_t>(h) * w * sizeof(int32_t));
        return;
    }
    for (int y = 0; y < out_h; ++y) {
        int yy = std::min(static_cast<int>((y + 0.5f) * h / out_h), h - 1);
        for (int x = 0; x < out_w; ++x) {
            int xx = std::min(static_cast<int>((x + 0.5f) * w / out_w), w - 1);
            dst[static_cast<size_t>(y) * out_w + x] =
                src[static_cast<size_t>(yy) * w + xx];
        }
    }
}

// Decode one JPEG as RGB u8 into a scratch vector; returns 0 on success.
int decode_jpeg_raw(const char* path, std::vector<uint8_t>* pixels,
                    int* h, int* w, int target_h, int target_w) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return 2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;

    // DCT scaling: decode at the smallest 1/2^k >= target size
    if (target_h > 0 && target_w > 0) {
        unsigned denom = 1;
        while (denom < 8 &&
               static_cast<int>(cinfo.image_height / (denom * 2)) >= target_h &&
               static_cast<int>(cinfo.image_width / (denom * 2)) >= target_w) {
            denom *= 2;
        }
        cinfo.scale_num = 1;
        cinfo.scale_denom = denom;
    }

    jpeg_start_decompress(&cinfo);
    if (cinfo.output_components != 3) {
        // out_color_space=JCS_RGB forces 3 components; defensive check
        // must run while the decompress object is still alive.
        jpeg_abort_decompress(&cinfo);
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return 3;
    }
    *h = cinfo.output_height;
    *w = cinfo.output_width;
    const int stride = cinfo.output_width * cinfo.output_components;
    pixels->resize(static_cast<size_t>(*h) * stride);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = pixels->data() +
                       static_cast<size_t>(cinfo.output_scanline) * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
}

// Decode one PNG as grayscale label map into a scratch vector of int32.
int decode_png_raw(const char* path, std::vector<int32_t>* pixels,
                   int* h, int* w) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    if (!png) { fclose(f); return 2; }
    png_infop info = png_create_info_struct(png);
    if (!info || setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(f);
        return 2;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    png_uint_32 width = png_get_image_width(png, info);
    png_uint_32 height = png_get_image_height(png, info);
    int bit_depth = png_get_bit_depth(png, info);
    int color_type = png_get_color_type(png, info);

    // force 8-bit grayscale
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type & PNG_COLOR_MASK_COLOR) png_set_rgb_to_gray(png, 1, -1, -1);
    if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    if (bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    png_read_update_info(png, info);

    std::vector<uint8_t> row(png_get_rowbytes(png, info));
    pixels->resize(static_cast<size_t>(height) * width);
    for (png_uint_32 y = 0; y < height; ++y) {
        png_read_row(png, row.data(), nullptr);
        for (png_uint_32 x = 0; x < width; ++x) {
            (*pixels)[static_cast<size_t>(y) * width + x] = row[x];
        }
    }
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    *h = static_cast<int>(height);
    *w = static_cast<int>(width);
    return 0;
}

template <typename Fn>
void parallel_for(int n, int threads, Fn fn) {
    threads = std::max(1, std::min(threads, n));
    if (threads == 1) {
        for (int i = 0; i < n; ++i) fn(i);
        return;
    }
    std::atomic<int> next{0};
    std::vector<std::thread> pool;
    pool.reserve(threads);
    for (int t = 0; t < threads; ++t) {
        pool.emplace_back([&]() {
            for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
        });
    }
    for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Decode one JPEG -> RGB u8 (out_h x out_w x 3) in `out`. 0 on success.
int uda_decode_jpeg_rgb(const char* path, uint8_t* out, int out_h, int out_w) {
    std::vector<uint8_t> raw;
    int h = 0, w = 0;
    int rc = decode_jpeg_raw(path, &raw, &h, &w, out_h, out_w);
    if (rc) return rc;
    resize_bilinear_rgb(raw.data(), h, w, out, out_h, out_w);
    return 0;
}

// Decode one PNG label mask -> int32 (out_h x out_w) in `out`. 0 on success.
int uda_decode_png_mask(const char* path, int32_t* out, int out_h, int out_w) {
    std::vector<int32_t> raw;
    int h = 0, w = 0;
    int rc = decode_png_raw(path, &raw, &h, &w);
    if (rc) return rc;
    resize_nearest_i32(raw.data(), h, w, out, out_h, out_w);
    return 0;
}

// Decode n JPEGs into a contiguous (n, H, W, 3) u8 batch buffer with a
// thread pool.  `paths` = newline-joined path list.  Returns the number
// of failures (0 == all good).
int uda_batch_decode_jpeg(const char* paths, int n, uint8_t* out,
                          int out_h, int out_w, int threads) {
    std::vector<const char*> starts;
    std::vector<std::string> strs;
    {
        const char* p = paths;
        for (int i = 0; i < n; ++i) {
            const char* e = strchr(p, '\n');
            size_t len = e ? static_cast<size_t>(e - p) : strlen(p);
            strs.emplace_back(p, len);
            p = e ? e + 1 : p + len;
        }
    }
    std::atomic<int> failures{0};
    const size_t item = static_cast<size_t>(out_h) * out_w * 3;
    parallel_for(n, threads, [&](int i) {
        if (uda_decode_jpeg_rgb(strs[i].c_str(), out + item * i, out_h, out_w))
            failures.fetch_add(1);
    });
    return failures.load();
}

// Same for PNG masks into (n, H, W) int32.
int uda_batch_decode_png(const char* paths, int n, int32_t* out,
                         int out_h, int out_w, int threads) {
    std::vector<std::string> strs;
    {
        const char* p = paths;
        for (int i = 0; i < n; ++i) {
            const char* e = strchr(p, '\n');
            size_t len = e ? static_cast<size_t>(e - p) : strlen(p);
            strs.emplace_back(p, len);
            p = e ? e + 1 : p + len;
        }
    }
    std::atomic<int> failures{0};
    const size_t item = static_cast<size_t>(out_h) * out_w;
    parallel_for(n, threads, [&](int i) {
        if (uda_decode_png_mask(strs[i].c_str(), out + item * i, out_h, out_w))
            failures.fetch_add(1);
    });
    return failures.load();
}

// Class-pixel histogram of one PNG mask at native resolution (the
// weighted-sampler scan, reference src/data/dataset.py:48-83).
// counts must hold num_classes int64 slots; returns total pixels or -1.
long long uda_mask_class_histogram(const char* path, long long* counts,
                                   int num_classes) {
    std::vector<int32_t> raw;
    int h = 0, w = 0;
    if (decode_png_raw(path, &raw, &h, &w)) return -1;
    for (int32_t v : raw) {
        if (v >= 0 && v < num_classes) counts[v] += 1;
    }
    return static_cast<long long>(h) * w;
}

}  // extern "C"
