// Multithreaded batch JPEG tile decoder (libjpeg).
//
// Native host-plane component: the reference outsources tile decode to
// OpenSlide/libtiff (C); this build decodes TIFF JPEG tiles directly.
// Exposed via a plain C ABI consumed through ctypes
// (tiatoolbox_tpu/native/__init__.py). Decoding the whole read-region's
// tiles in parallel keeps the host tiling layer ahead of the TPU.
//
// Build: g++ -O3 -shared -fPIC jpegdec.cpp -ljpeg -o libtiatpu_native.so

#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <cstdio>
#include <thread>
#include <vector>
#include <atomic>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
    jpeg_error_mgr pub;
    jmp_buf setjmp_buffer;
};

void error_exit_handler(j_common_ptr cinfo) {
    ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
    longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG stream into dst (tile_h * tile_w * out_ch, RGB or grey).
// Returns 0 on success.
int decode_one(const uint8_t* buf, size_t size, uint8_t* dst, int tile_h,
               int tile_w, int out_ch) {
    jpeg_decompress_struct cinfo;
    ErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = error_exit_handler;
    if (setjmp(jerr.setjmp_buffer)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
                 static_cast<unsigned long>(size));
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = (out_ch == 3) ? JCS_RGB : JCS_GRAYSCALE;
    jpeg_start_decompress(&cinfo);

    const int w = static_cast<int>(cinfo.output_width);
    const int h = static_cast<int>(cinfo.output_height);
    const int ch = cinfo.output_components;
    std::vector<uint8_t> row(static_cast<size_t>(w) * ch);
    JSAMPROW rowptr = row.data();

    const int copy_w = (w < tile_w ? w : tile_w);
    for (int y = 0; y < h; ++y) {
        jpeg_read_scanlines(&cinfo, &rowptr, 1);
        if (y < tile_h) {
            std::memcpy(dst + static_cast<size_t>(y) * tile_w * out_ch,
                        row.data(), static_cast<size_t>(copy_w) * out_ch);
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

}  // namespace

extern "C" {

// Decode n JPEG buffers in parallel into a contiguous uint8 output of
// shape [n, tile_h, tile_w, out_ch]. offsets[i]/sizes[i] index into
// `data`. Returns number of failed tiles (their output left as-is).
int tiatpu_decode_jpeg_batch(const uint8_t* data, const uint64_t* offsets,
                             const uint64_t* sizes, int n, uint8_t* out,
                             int tile_h, int tile_w, int out_ch,
                             int n_threads) {
    if (n_threads < 1) n_threads = 1;
    if (n_threads > n) n_threads = n;
    std::atomic<int> next{0};
    std::atomic<int> failures{0};
    const size_t tile_bytes =
        static_cast<size_t>(tile_h) * tile_w * out_ch;

    auto worker = [&]() {
        for (;;) {
            const int i = next.fetch_add(1);
            if (i >= n) return;
            const int rc = decode_one(data + offsets[i], sizes[i],
                                      out + tile_bytes * i, tile_h, tile_w,
                                      out_ch);
            if (rc != 0) failures.fetch_add(1);
        }
    };
    if (n_threads == 1) {
        worker();
    } else {
        std::vector<std::thread> threads;
        threads.reserve(n_threads);
        for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
        for (auto& th : threads) th.join();
    }
    return failures.load();
}

// Sanity probe for ctypes loading.
// bump on any exported-symbol change: the loader rebuilds stale
// cached libraries whose version mismatches (mtime alone is not
// reliable across archive extraction / shared TIATOOLBOX_HOME)
int tiatpu_version() { return 2; }

}  // extern "C"
