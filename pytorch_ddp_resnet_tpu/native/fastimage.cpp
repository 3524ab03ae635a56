// _fastimage: native host-side image path for the streaming input pipeline.
//
// The reference's ImageNet pipeline decodes JPEGs and resizes per-sample in
// Python (torchvision ImageFolder -> PIL; reference data_util.py:27-38,
// transform_util.py:208-226). Python-side PIL holds throughput hostage at
// pod scale (SURVEY.md §7: "zero input stalls"); this module supplies the
// native-equivalent data-loader component: libjpeg decode plus a
// Pillow-bit-exact bilinear resampler, both releasing the GIL so the
// pipeline's worker threads actually run in parallel.
//
// Exposed functions (plain CPython C API, no numpy dependency):
//   decode_jpeg(data: bytes) -> (pixels: bytes, h: int, w: int)   # RGB888
//   decode_png(data: bytes) -> (pixels: bytes, h, w)   # alpha -> ValueError
//   resize_bilinear(pixels: bytes, h, w, nh, nw) -> bytes         # RGB888
//   decode_resize_jpeg(data: bytes, targets: tuple[int, ...])
//       -> (pixels: bytes, h: int, w: int)
//       # decode + successive short-side resizes, all outside the GIL
//   version() -> str
//
// The resampler reproduces Pillow's Resample.c fixed-point arithmetic
// (PRECISION_BITS = 32-8-2, round-half-away coefficients, horizontal pass
// then vertical) so the native path is bit-identical to the PIL fallback —
// fitted dataset statistics and eval numbers do not depend on which path
// ran (verified in tests/test_native.py).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <csetjmp>
#include <cmath>
#include <exception>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {
#include <jpeglib.h>
#include <png.h>
}

namespace {

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg, classic API) with longjmp error trap
// ---------------------------------------------------------------------------

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jump;
    char msg[JMSG_LENGTH_MAX];
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    (*cinfo->err->format_message)(cinfo, err->msg);
    longjmp(err->jump, 1);
}

void jpeg_err_silent(j_common_ptr, int) {}

// Same default as Pillow's MAX_IMAGE_PIXELS: the native path must not
// bypass the decompression-bomb guard the PIL path provides.
constexpr long long MAX_PIXELS = 89478485;

// RAII owner of a jpeg_decompress_struct: the destructor runs
// jpeg_destroy_decompress on EVERY exit path — longjmp error branch,
// early returns, and C++ exceptions (std::bad_alloc from out->resize)
// that propagate to the binding's catch, which previously leaked
// libjpeg-internal allocations. The struct is zero-initialized so
// destroy is a no-op before jpeg_create_decompress and idempotent after
// (jpeg_destroy nulls cinfo->mem).
struct JpegDecompressGuard {
    jpeg_decompress_struct cinfo = {};
    ~JpegDecompressGuard() { jpeg_destroy_decompress(&cinfo); }
};

// Decodes JPEG bytes to tightly-packed RGB888. Returns false (with *msg
// set) on any libjpeg error, including unsupported color spaces — the
// Python caller falls back to PIL. Runs without the GIL.
bool decode_jpeg_impl(const unsigned char* data, size_t len,
                      std::vector<unsigned char>* out,
                      int* out_h, int* out_w, char* msg,
                      int min_short = 0) {
    JpegDecompressGuard guard;
    jpeg_decompress_struct& cinfo = guard.cinfo;
    JpegErr err;
    cinfo.err = jpeg_std_error(&err.mgr);
    err.mgr.error_exit = jpeg_err_exit;
    err.mgr.emit_message = jpeg_err_silent;  // no stderr chatter
    if (setjmp(err.jump)) {
        snprintf(msg, JMSG_LENGTH_MAX, "%s", err.msg);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
                 static_cast<unsigned long>(len));
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;  // YCbCr + grayscale convert natively
    if (min_short > 0) {
        // DCT-domain downscale: decode at the smallest M/8 scale whose
        // output short side still covers min_short (the pipeline's first
        // short-side resize target), so the exact bilinear afterwards runs
        // on far fewer pixels. The scaled IDCT is a real decode of the
        // same coefficients at lower resolution (the practice of
        // torchvision/accimage/DALI ImageNet loaders); the frequencies it
        // drops are above the target Nyquist, i.e. content the bilinear
        // would have discarded. We probe jpeg_calc_output_dimensions
        // rather than assuming turbo's M/8 support: classic libjpeg
        // quantizes the ratio to 1/2^k and the probe reads whatever the
        // library will actually produce.
        //
        // The decompression-bomb cap must cover the ORIGINAL dims here
        // (the output-dims check below would pass for a huge source
        // decoded at 1/8 while the IDCT still walks every input MCU).
        if (static_cast<long long>(cinfo.image_height) *
                cinfo.image_width > MAX_PIXELS) {
            snprintf(msg, JMSG_LENGTH_MAX,
                     "image %ux%u exceeds the decompression-bomb pixel cap",
                     cinfo.image_height, cinfo.image_width);
            return false;
        }
        for (unsigned int m = 1; m <= 8; m++) {
            cinfo.scale_num = m;
            cinfo.scale_denom = 8;
            jpeg_calc_output_dimensions(&cinfo);
            const JDIMENSION s = cinfo.output_width < cinfo.output_height
                                     ? cinfo.output_width
                                     : cinfo.output_height;
            if (static_cast<long>(s) >= min_short) break;
        }
        // loop fall-through leaves 8/8 = a full decode (source smaller
        // than the target; the Python side upscales afterwards)
    }
    jpeg_start_decompress(&cinfo);

    const int h = static_cast<int>(cinfo.output_height);
    const int w = static_cast<int>(cinfo.output_width);
    if (cinfo.output_components != 3) {
        snprintf(msg, JMSG_LENGTH_MAX, "unsupported components=%d",
                 cinfo.output_components);
        return false;  // guard destroys
    }
    if (static_cast<long long>(h) * w > MAX_PIXELS) {
        snprintf(msg, JMSG_LENGTH_MAX,
                 "image %dx%d exceeds the decompression-bomb pixel cap",
                 h, w);
        return false;  // guard destroys
    }
    out->resize(static_cast<size_t>(h) * w * 3);
    const size_t stride = static_cast<size_t>(w) * 3;
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = out->data() + cinfo.output_scanline * stride;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    *out_h = h;
    *out_w = w;
    return true;
}

// PNG decode via libpng's simplified API (handles gray/palette/alpha ->
// RGB conversion internally). Returns false on any error; caller falls
// back to PIL. Runs without the GIL.
bool decode_png_impl(const unsigned char* data, size_t len,
                     std::vector<unsigned char>* out,
                     int* out_h, int* out_w, char* msg) {
    png_image image;
    memset(&image, 0, sizeof image);
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_memory(&image, data, len)) {
        snprintf(msg, JMSG_LENGTH_MAX, "%s", image.message);
        return false;
    }
    if (static_cast<long long>(image.height) * image.width > MAX_PIXELS) {
        snprintf(msg, JMSG_LENGTH_MAX,
                 "image %ux%u exceeds the decompression-bomb pixel cap",
                 image.height, image.width);
        png_image_free(&image);
        return false;
    }
    if ((image.format & PNG_FORMAT_FLAG_ALPHA) ||
        (image.format & PNG_FORMAT_FLAG_LINEAR) ||
        (image.flags & PNG_IMAGE_FLAG_COLORSPACE_NOT_sRGB)) {
        // Cases where libpng's simplified conversions diverge from PIL:
        // alpha (libpng composites, PIL strips), 16-bit/linear sources and
        // non-sRGB gamma (libpng gamma-converts to sRGB, PIL truncates /
        // ignores gAMA). Strict PIL parity -> fallback.
        snprintf(msg, JMSG_LENGTH_MAX,
                 "alpha/16-bit/non-sRGB png -> PIL fallback");
        png_image_free(&image);
        return false;
    }
    image.format = PNG_FORMAT_RGB;
    out->resize(PNG_IMAGE_SIZE(image));
    if (!png_image_finish_read(&image, nullptr, out->data(), 0, nullptr)) {
        snprintf(msg, JMSG_LENGTH_MAX, "%s", image.message);
        return false;
    }
    *out_h = static_cast<int>(image.height);
    *out_w = static_cast<int>(image.width);
    return true;
}

// ---------------------------------------------------------------------------
// Pillow-compatible bilinear resample (fixed point, 8bpc, 3 channels)
// ---------------------------------------------------------------------------

constexpr int PRECISION_BITS = 32 - 8 - 2;  // Pillow Resample.c

inline unsigned char clip8(int v) {
    v >>= PRECISION_BITS;
    if (v < 0) return 0;
    if (v > 255) return 255;
    return static_cast<unsigned char>(v);
}

inline double bilinear_filter(double x) {
    if (x < 0.0) x = -x;
    return x < 1.0 ? 1.0 - x : 0.0;
}

// Pillow's precompute_coeffs for filter support 1.0 (bilinear): for each of
// out_size output pixels, a [xmin, xmax) input window and normalized
// fixed-point weights (ksize per pixel).
void precompute_coeffs(int in_size, int out_size,
                       std::vector<int>* bounds, std::vector<int>* kk,
                       int* ksize_out) {
    const double scale = static_cast<double>(in_size) / out_size;
    const double filterscale = scale < 1.0 ? 1.0 : scale;
    const double support = 1.0 * filterscale;  // bilinear support = 1.0
    const int ksize = static_cast<int>(ceil(support)) * 2 + 1;
    bounds->assign(static_cast<size_t>(out_size) * 2, 0);
    kk->assign(static_cast<size_t>(out_size) * ksize, 0);
    std::vector<double> prekk(ksize);
    for (int xx = 0; xx < out_size; xx++) {
        const double center = (xx + 0.5) * scale;
        double ww = 0.0;
        const double ss = 1.0 / filterscale;
        // Pillow: int xmin = MAX(0, (int)(center - support + 0.5));
        int xmin = static_cast<int>(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = static_cast<int>(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        for (int x = 0; x < xmax; x++) {
            const double w = bilinear_filter((x + xmin - center + 0.5) * ss);
            prekk[x] = w;
            ww += w;
        }
        for (int x = 0; x < xmax; x++) {
            if (ww != 0.0) prekk[x] /= ww;
            // Pillow: round half away from zero into fixed point
            const double k = prekk[x];
            (*kk)[static_cast<size_t>(xx) * ksize + x] = static_cast<int>(
                k < 0 ? k * (1 << PRECISION_BITS) - 0.5
                      : k * (1 << PRECISION_BITS) + 0.5);
        }
        for (int x = xmax; x < ksize; x++)
            (*kk)[static_cast<size_t>(xx) * ksize + x] = 0;
        (*bounds)[static_cast<size_t>(xx) * 2 + 0] = xmin;
        (*bounds)[static_cast<size_t>(xx) * 2 + 1] = xmax;
    }
    *ksize_out = ksize;
}

// dst (h x nw x 3) <- horizontal resample of src (h x w x 3)
void resample_horizontal(const unsigned char* src, int h, int w,
                         unsigned char* dst, int nw,
                         const std::vector<int>& bounds,
                         const std::vector<int>& kk, int ksize) {
    for (int yy = 0; yy < h; yy++) {
        const unsigned char* srow = src + static_cast<size_t>(yy) * w * 3;
        unsigned char* drow = dst + static_cast<size_t>(yy) * nw * 3;
        for (int xx = 0; xx < nw; xx++) {
            const int xmin = bounds[static_cast<size_t>(xx) * 2 + 0];
            const int xmax = bounds[static_cast<size_t>(xx) * 2 + 1];
            const int* k = kk.data() + static_cast<size_t>(xx) * ksize;
            int ss0 = 1 << (PRECISION_BITS - 1);
            int ss1 = ss0, ss2 = ss0;
            for (int x = 0; x < xmax; x++) {
                const unsigned char* p = srow + (static_cast<size_t>(x + xmin)) * 3;
                ss0 += p[0] * k[x];
                ss1 += p[1] * k[x];
                ss2 += p[2] * k[x];
            }
            drow[xx * 3 + 0] = clip8(ss0);
            drow[xx * 3 + 1] = clip8(ss1);
            drow[xx * 3 + 2] = clip8(ss2);
        }
    }
}

// dst (nh x w x 3) <- vertical resample of src (h x w x 3)
void resample_vertical(const unsigned char* src, int /*h*/, int w,
                       unsigned char* dst, int nh,
                       const std::vector<int>& bounds,
                       const std::vector<int>& kk, int ksize) {
    for (int yy = 0; yy < nh; yy++) {
        const int ymin = bounds[static_cast<size_t>(yy) * 2 + 0];
        const int ymax = bounds[static_cast<size_t>(yy) * 2 + 1];
        const int* k = kk.data() + static_cast<size_t>(yy) * ksize;
        unsigned char* drow = dst + static_cast<size_t>(yy) * w * 3;
        for (int xx = 0; xx < w; xx++) {
            int ss0 = 1 << (PRECISION_BITS - 1);
            int ss1 = ss0, ss2 = ss0;
            for (int y = 0; y < ymax; y++) {
                const unsigned char* p =
                    src + (static_cast<size_t>(y + ymin) * w + xx) * 3;
                ss0 += p[0] * k[y];
                ss1 += p[1] * k[y];
                ss2 += p[2] * k[y];
            }
            drow[xx * 3 + 0] = clip8(ss0);
            drow[xx * 3 + 1] = clip8(ss1);
            drow[xx * 3 + 2] = clip8(ss2);
        }
    }
}

// Full 2-D resample, horizontal pass first (Pillow's ImagingResample order).
void resize_bilinear_impl(const unsigned char* src, int h, int w,
                          int nh, int nw, std::vector<unsigned char>* out) {
    std::vector<int> bounds, kk;
    int ksize;
    const unsigned char* cur = src;
    std::vector<unsigned char> tmp;
    int cur_w = w;
    if (nw != w) {
        precompute_coeffs(w, nw, &bounds, &kk, &ksize);
        tmp.resize(static_cast<size_t>(h) * nw * 3);
        resample_horizontal(cur, h, w, tmp.data(), nw, bounds, kk, ksize);
        cur = tmp.data();
        cur_w = nw;
    }
    if (nh != h) {
        precompute_coeffs(h, nh, &bounds, &kk, &ksize);
        out->resize(static_cast<size_t>(nh) * cur_w * 3);
        resample_vertical(cur, h, cur_w, out->data(), nh, bounds, kk, ksize);
    } else {
        out->assign(cur, cur + static_cast<size_t>(h) * cur_w * 3);
    }
}

// Short-side resize target -> (nh, nw), matching streaming.py's
// _resize_short_side rounding (round-half-even via Python round(); here we
// use nearbyint which matches for the positive values involved... Python's
// round() is banker's rounding; use the same).
inline long py_round(double v) {
    // round-half-to-even, like Python round()
    return std::lround(std::nearbyint(v));  // default FE_TONEAREST = half-even
}

// Returns false when the resized long side would exceed the JPEG
// dimension ceiling (extreme aspect ratios): static_cast of such a long
// to int is UB, and the allocation would be absurd — the caller falls
// back to the Python path's clean handling.
bool short_side_dims(int h, int w, int target, int* nh, int* nw) {
    constexpr long MAX_SIDE = 65535;
    if (h <= w) {
        *nh = target;
        long t = py_round(static_cast<double>(target) / h * w);
        if (t > MAX_SIDE) return false;
        *nw = t < 1 ? 1 : static_cast<int>(t);
    } else {
        long t = py_round(static_cast<double>(target) / w * h);
        if (t > MAX_SIDE) return false;
        *nh = t < 1 ? 1 : static_cast<int>(t);
        *nw = target;
    }
    return true;
}

// ---------------------------------------------------------------------------
// Python bindings
// ---------------------------------------------------------------------------

PyObject* py_decode_jpeg(PyObject*, PyObject* args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
    std::vector<unsigned char> out;
    int h = 0, w = 0;
    char msg[JMSG_LENGTH_MAX] = {0};
    bool ok;
    // try/catch inside the no-GIL region: a C++ exception (e.g. bad_alloc)
    // must not unwind past Py_END_ALLOW_THREADS or the GIL stays released.
    Py_BEGIN_ALLOW_THREADS
    try {
        ok = decode_jpeg_impl(static_cast<const unsigned char*>(buf.buf),
                              static_cast<size_t>(buf.len), &out, &h, &w,
                              msg);
    } catch (const std::exception& e) {
        snprintf(msg, JMSG_LENGTH_MAX, "%s", e.what());
        ok = false;
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    if (!ok) {
        PyErr_Format(PyExc_ValueError, "jpeg decode failed: %s", msg);
        return nullptr;
    }
    PyObject* bytes = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out.data()),
        static_cast<Py_ssize_t>(out.size()));
    if (!bytes) return nullptr;
    return Py_BuildValue("(Nii)", bytes, h, w);
}

PyObject* py_decode_png(PyObject*, PyObject* args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
    std::vector<unsigned char> out;
    int h = 0, w = 0;
    char msg[JMSG_LENGTH_MAX] = {0};
    bool ok;
    Py_BEGIN_ALLOW_THREADS
    try {
        ok = decode_png_impl(static_cast<const unsigned char*>(buf.buf),
                             static_cast<size_t>(buf.len), &out, &h, &w,
                             msg);
    } catch (const std::exception& e) {
        snprintf(msg, JMSG_LENGTH_MAX, "%s", e.what());
        ok = false;
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    if (!ok) {
        PyErr_Format(PyExc_ValueError, "png decode failed: %s", msg);
        return nullptr;
    }
    PyObject* bytes = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out.data()),
        static_cast<Py_ssize_t>(out.size()));
    if (!bytes) return nullptr;
    return Py_BuildValue("(Nii)", bytes, h, w);
}

PyObject* py_resize_bilinear(PyObject*, PyObject* args) {
    Py_buffer buf;
    int h, w, nh, nw;
    if (!PyArg_ParseTuple(args, "y*iiii", &buf, &h, &w, &nh, &nw))
        return nullptr;
    if (h <= 0 || w <= 0 || nh <= 0 || nw <= 0 ||
        buf.len != static_cast<Py_ssize_t>(h) * w * 3) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "bad dimensions for RGB888 buffer");
        return nullptr;
    }
    std::vector<unsigned char> out;
    char msg[JMSG_LENGTH_MAX] = {0};
    bool ok = true;
    Py_BEGIN_ALLOW_THREADS
    try {
        resize_bilinear_impl(static_cast<const unsigned char*>(buf.buf),
                             h, w, nh, nw, &out);
    } catch (const std::exception& e) {
        snprintf(msg, JMSG_LENGTH_MAX, "%s", e.what());
        ok = false;
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    if (!ok) {
        PyErr_Format(PyExc_ValueError, "resize failed: %s", msg);
        return nullptr;
    }
    return PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out.data()),
        static_cast<Py_ssize_t>(out.size()));
}

PyObject* py_decode_resize_jpeg(PyObject*, PyObject* args) {
    Py_buffer buf;
    PyObject* targets_obj;
    int min_short = 0;  // >0: DCT-domain scaled decode (see decode_jpeg_impl)
    if (!PyArg_ParseTuple(args, "y*O|i", &buf, &targets_obj, &min_short))
        return nullptr;
    if (min_short < 0 || min_short > 65535) {
        PyBuffer_Release(&buf);
        PyErr_Format(PyExc_ValueError,
                     "dct min_short must be in [0, 65535], got %d",
                     min_short);
        return nullptr;
    }
    std::vector<int> targets;
    PyObject* seq = PySequence_Fast(targets_obj, "targets must be a sequence");
    if (!seq) {
        PyBuffer_Release(&buf);
        return nullptr;
    }
    const Py_ssize_t nt = PySequence_Fast_GET_SIZE(seq);
    for (Py_ssize_t i = 0; i < nt; i++) {
        const long t = PyLong_AsLong(PySequence_Fast_GET_ITEM(seq, i));
        if (t == -1 && PyErr_Occurred()) {
            Py_DECREF(seq);
            PyBuffer_Release(&buf);
            return nullptr;
        }
        if (t <= 0 || t > 65535) {
            Py_DECREF(seq);
            PyBuffer_Release(&buf);
            PyErr_Format(PyExc_ValueError,
                         "short-side target must be in [1, 65535], got %ld",
                         t);
            return nullptr;
        }
        targets.push_back(static_cast<int>(t));
    }
    Py_DECREF(seq);

    std::vector<unsigned char> img, next;
    int h = 0, w = 0;
    char msg[JMSG_LENGTH_MAX] = {0};
    bool ok;
    Py_BEGIN_ALLOW_THREADS
    try {
        ok = decode_jpeg_impl(static_cast<const unsigned char*>(buf.buf),
                              static_cast<size_t>(buf.len), &img, &h, &w,
                              msg, min_short);
        if (ok) {
            for (int t : targets) {
                int nh, nw;
                if (!short_side_dims(h, w, t, &nh, &nw)) {
                    snprintf(msg, JMSG_LENGTH_MAX,
                             "resized long side exceeds 65535 -> fallback");
                    ok = false;
                    break;
                }
                if (nh == h && nw == w) continue;
                resize_bilinear_impl(img.data(), h, w, nh, nw, &next);
                img.swap(next);
                h = nh;
                w = nw;
            }
        }
    } catch (const std::exception& e) {
        snprintf(msg, JMSG_LENGTH_MAX, "%s", e.what());
        ok = false;
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    if (!ok) {
        PyErr_Format(PyExc_ValueError, "jpeg decode failed: %s", msg);
        return nullptr;
    }
    PyObject* bytes = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(img.data()),
        static_cast<Py_ssize_t>(img.size()));
    if (!bytes) return nullptr;
    return Py_BuildValue("(Nii)", bytes, h, w);
}

PyObject* py_version(PyObject*, PyObject*) {
    return PyUnicode_FromFormat("fastimage 1.1 (libjpeg %d)", JPEG_LIB_VERSION);
}

PyMethodDef methods[] = {
    {"decode_jpeg", py_decode_jpeg, METH_VARARGS,
     "decode_jpeg(data) -> (rgb_bytes, h, w)"},
    {"decode_png", py_decode_png, METH_VARARGS,
     "decode_png(data) -> (rgb_bytes, h, w); alpha PNGs raise (PIL path)"},
    {"resize_bilinear", py_resize_bilinear, METH_VARARGS,
     "resize_bilinear(rgb_bytes, h, w, nh, nw) -> rgb_bytes"},
    {"decode_resize_jpeg", py_decode_resize_jpeg, METH_VARARGS,
     "decode_resize_jpeg(data, short_side_targets[, dct_min_short])"
     " -> (rgb_bytes, h, w); dct_min_short > 0 decodes at the smallest"
     " M/8 DCT scale keeping the short side >= dct_min_short"},
    {"version", py_version, METH_NOARGS, "build/runtime version string"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastimage",
    "Native JPEG decode + Pillow-bit-exact bilinear resize.", -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__fastimage(void) {
    return PyModule_Create(&moduledef);
}
