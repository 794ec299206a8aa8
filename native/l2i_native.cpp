// l2i_native — native runtime components for latent2im_tpu.
//
// The reference leans on PyTorch's native DataLoader workers and writes image
// grids in numpy; here the host-side hot paths are C++:
//   * imgrid      — uint8 grid assembly with padded seams (single memcpy pass)
//   * load_resize — JPEG/PNG decode (libjpeg/libpng) + center-crop + bilinear
//                   resize to a square, returning raw RGB bytes
//   * Loader      — a threaded prefetching batch loader over an image-path
//                   list (decode/resize off the Python thread), feeding the
//                   regressor trainer and inversion CLI
//
// Python-facing types are kept to buffers/bytes so the extension needs no
// numpy headers; wrappers in latent2im_tpu/native/__init__.py reshape.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;
};

// ---------------------------------------------------------------------------
// decoding
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool decode_jpeg(const uint8_t* buf, size_t len, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(const uint8_t* buf, size_t len, Image* out) {
  png_image image;
  memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf, len)) return false;
  image.format = PNG_FORMAT_RGB;
  out->w = image.width;
  out->h = image.height;
  out->c = 3;
  out->data.resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, out->data.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

bool decode_image(const uint8_t* buf, size_t len, Image* out) {
  if (len >= 8 && buf[0] == 0x89 && buf[1] == 'P') return decode_png(buf, len, out);
  if (len >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) return decode_jpeg(buf, len, out);
  // fall through: try both
  return decode_jpeg(buf, len, out) || decode_png(buf, len, out);
}

bool read_file(const std::string& path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(sz);
  size_t got = fread(out->data(), 1, sz, f);
  fclose(f);
  return got == size_t(sz);
}

// ---------------------------------------------------------------------------
// center-crop + bilinear resize to size x size RGB
// ---------------------------------------------------------------------------

void crop_resize(const Image& in, int size, uint8_t* dst) {
  int dim = std::min(in.h, in.w);
  int y0 = (in.h - dim) / 2;
  int x0 = (in.w - dim) / 2;
  const double scale = double(dim) / size;
  for (int y = 0; y < size; ++y) {
    double sy = (y + 0.5) * scale - 0.5;
    int iy = int(sy < 0 ? 0 : sy);
    int iy1 = std::min(iy + 1, dim - 1);
    double fy = sy - iy;
    if (fy < 0) fy = 0;
    for (int x = 0; x < size; ++x) {
      double sx = (x + 0.5) * scale - 0.5;
      int ix = int(sx < 0 ? 0 : sx);
      int ix1 = std::min(ix + 1, dim - 1);
      double fx = sx - ix;
      if (fx < 0) fx = 0;
      for (int ch = 0; ch < 3; ++ch) {
        auto at = [&](int yy, int xx) -> double {
          return in.data[(size_t(y0 + yy) * in.w + (x0 + xx)) * in.c + ch];
        };
        double v = at(iy, ix) * (1 - fy) * (1 - fx) + at(iy, ix1) * (1 - fy) * fx +
                   at(iy1, ix) * fy * (1 - fx) + at(iy1, ix1) * fy * fx;
        dst[(size_t(y) * size + x) * 3 + ch] = uint8_t(v + 0.5);
      }
    }
  }
}

bool load_one(const std::string& path, int size, uint8_t* dst) {
  std::vector<uint8_t> raw;
  if (!read_file(path, &raw)) return false;
  Image img;
  if (!decode_image(raw.data(), raw.size(), &img)) return false;
  crop_resize(img, size, dst);
  return true;
}

// ---------------------------------------------------------------------------
// imgrid
// ---------------------------------------------------------------------------

PyObject* py_imgrid(PyObject*, PyObject* args) {
  Py_buffer buf;
  int n, h, w, c, cols, pad;
  if (!PyArg_ParseTuple(args, "y*iiiiii", &buf, &n, &h, &w, &c, &cols, &pad))
    return nullptr;
  const uint8_t* src = static_cast<const uint8_t*>(buf.buf);
  int rows = (n + cols - 1) / cols;
  int hp = h + pad, wp = w + pad;
  int gh = rows * hp - pad, gw = cols * wp - pad;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, size_t(gh) * gw * c);
  if (!out) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  uint8_t* dst = reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(out));
  memset(dst, 255, size_t(gh) * gw * c);
  Py_BEGIN_ALLOW_THREADS
  for (int i = 0; i < n; ++i) {
    int r = i / cols, col = i % cols;
    for (int y = 0; y < h; ++y) {
      const uint8_t* sp = src + ((size_t(i) * h + y) * w) * c;
      uint8_t* dp = dst + ((size_t(r * hp + y) * gw) + size_t(col) * wp) * c;
      memcpy(dp, sp, size_t(w) * c);
    }
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  return Py_BuildValue("(Nii)", out, gh, gw);
}

PyObject* py_load_resize(PyObject*, PyObject* args) {
  const char* path;
  int size;
  if (!PyArg_ParseTuple(args, "si", &path, &size)) return nullptr;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, size_t(size) * size * 3);
  if (!out) return nullptr;
  bool ok;
  Py_BEGIN_ALLOW_THREADS
  ok = load_one(path, size, reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(out)));
  Py_END_ALLOW_THREADS
  if (!ok) {
    Py_DECREF(out);
    PyErr_Format(PyExc_IOError, "failed to load/decode %s", path);
    return nullptr;
  }
  return out;
}

// ---------------------------------------------------------------------------
// threaded prefetching loader
// ---------------------------------------------------------------------------

struct LoaderObject {
  PyObject_HEAD
  std::vector<std::string>* paths;
  std::vector<int>* order;
  int size;
  int batch;
  int threads;
  size_t cursor;          // next batch start in `order`
  // prefetch state
  std::deque<std::pair<size_t, std::vector<uint8_t>>>* ready;  // (start, data)
  std::vector<std::thread>* workers;
  std::mutex* mu;
  std::condition_variable* cv;
  std::atomic<size_t>* next_fetch;
  std::atomic<bool>* stop;
  size_t max_ready;
};

void loader_worker(LoaderObject* self) {
  while (!self->stop->load()) {
    size_t start = self->next_fetch->fetch_add(self->batch);
    if (start >= self->order->size()) return;
    size_t end = std::min(start + size_t(self->batch), self->order->size());
    std::vector<uint8_t> data((end - start) * size_t(self->size) * self->size * 3);
    for (size_t i = start; i < end; ++i) {
      const std::string& p = (*self->paths)[(*self->order)[i]];
      uint8_t* dst = data.data() + (i - start) * size_t(self->size) * self->size * 3;
      if (!load_one(p, self->size, dst)) {
        memset(dst, 0, size_t(self->size) * self->size * 3);  // unreadable -> black
      }
    }
    std::unique_lock<std::mutex> lk(*self->mu);
    self->cv->wait(lk, [&] {
      return self->stop->load() || self->ready->size() < self->max_ready;
    });
    if (self->stop->load()) return;
    self->ready->emplace_back(start, std::move(data));
    self->cv->notify_all();
  }
}

void loader_stop(LoaderObject* self) {
  if (self->workers) {
    self->stop->store(true);
    self->cv->notify_all();
    for (auto& t : *self->workers)
      if (t.joinable()) t.join();
    delete self->workers;
    self->workers = nullptr;
  }
}

void loader_start_epoch(LoaderObject* self, uint64_t seed, bool shuffle) {
  loader_stop(self);
  self->ready->clear();
  self->cursor = 0;
  self->next_fetch->store(0);
  self->stop->store(false);
  if (shuffle) {
    std::mt19937_64 rng(seed);
    std::shuffle(self->order->begin(), self->order->end(), rng);
  }
  self->workers = new std::vector<std::thread>();
  for (int t = 0; t < self->threads; ++t)
    self->workers->emplace_back(loader_worker, self);
}

PyObject* Loader_new(PyTypeObject* type, PyObject* args, PyObject* kwds) {
  PyObject* path_list;
  int size, batch, threads = 2;
  static const char* kwlist[] = {"paths", "size", "batch", "threads", nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kwds, "Oii|i",
                                   const_cast<char**>(kwlist), &path_list, &size,
                                   &batch, &threads))
    return nullptr;
  auto* self = reinterpret_cast<LoaderObject*>(type->tp_alloc(type, 0));
  if (!self) return nullptr;
  self->paths = new std::vector<std::string>();
  self->order = new std::vector<int>();
  Py_ssize_t n = PySequence_Length(path_list);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PySequence_GetItem(path_list, i);
    const char* s = PyUnicode_AsUTF8(item);
    if (!s) {
      Py_XDECREF(item);
      Py_DECREF(self);
      return nullptr;
    }
    self->paths->push_back(s);
    self->order->push_back(int(i));
    Py_DECREF(item);
  }
  self->size = size;
  self->batch = batch;
  self->threads = std::max(1, threads);
  self->cursor = 0;
  self->ready = new std::deque<std::pair<size_t, std::vector<uint8_t>>>();
  self->workers = nullptr;
  self->mu = new std::mutex();
  self->cv = new std::condition_variable();
  self->next_fetch = new std::atomic<size_t>(0);
  self->stop = new std::atomic<bool>(false);
  self->max_ready = 4;
  return reinterpret_cast<PyObject*>(self);
}

void Loader_dealloc(LoaderObject* self) {
  loader_stop(self);
  delete self->paths;
  delete self->order;
  delete self->ready;
  delete self->mu;
  delete self->cv;
  delete self->next_fetch;
  delete self->stop;
  Py_TYPE(self)->tp_free(reinterpret_cast<PyObject*>(self));
}

PyObject* Loader_start_epoch(LoaderObject* self, PyObject* args, PyObject* kwds) {
  unsigned long long seed = 0;
  int shuffle = 1;
  static const char* kwlist[] = {"seed", "shuffle", nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kwds, "|Kp", const_cast<char**>(kwlist),
                                   &seed, &shuffle))
    return nullptr;
  loader_start_epoch(self, seed, shuffle);
  Py_RETURN_NONE;
}

PyObject* Loader_next_batch(LoaderObject* self, PyObject*) {
  if (self->cursor >= self->order->size()) {
    PyErr_SetNone(PyExc_StopIteration);
    return nullptr;
  }
  if (!self->workers) {
    PyErr_SetString(PyExc_RuntimeError, "call start_epoch() first");
    return nullptr;
  }
  size_t want = self->cursor;
  std::vector<uint8_t> data;
  {
    Py_BEGIN_ALLOW_THREADS
    std::unique_lock<std::mutex> lk(*self->mu);
    for (;;) {
      bool found = false;
      for (auto it = self->ready->begin(); it != self->ready->end(); ++it) {
        if (it->first == want) {
          data = std::move(it->second);
          self->ready->erase(it);
          found = true;
          break;
        }
      }
      if (found) break;
      self->cv->wait(lk);
    }
    self->cv->notify_all();
    Py_END_ALLOW_THREADS
  }
  size_t end = std::min(want + size_t(self->batch), self->order->size());
  self->cursor = end;
  PyObject* bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(data.data()), data.size());
  PyObject* idx = PyList_New(end - want);
  for (size_t i = want; i < end; ++i)
    PyList_SET_ITEM(idx, i - want, PyLong_FromLong((*self->order)[i]));
  return Py_BuildValue("(NN)", bytes, idx);
}

PyObject* Loader_len(LoaderObject* self, PyObject*) {
  return PyLong_FromSize_t(
      (self->order->size() + self->batch - 1) / self->batch);
}

PyMethodDef Loader_methods[] = {
    {"start_epoch", reinterpret_cast<PyCFunction>(Loader_start_epoch),
     METH_VARARGS | METH_KEYWORDS, "begin an epoch (shuffles, spawns workers)"},
    {"next_batch", reinterpret_cast<PyCFunction>(Loader_next_batch), METH_NOARGS,
     "-> (rgb_bytes, index_list); StopIteration at epoch end"},
    {"num_batches", reinterpret_cast<PyCFunction>(Loader_len), METH_NOARGS, ""},
    {nullptr, nullptr, 0, nullptr}};

PyTypeObject LoaderType = [] {
  PyTypeObject t = {PyVarObject_HEAD_INIT(nullptr, 0)};
  t.tp_name = "_l2i_native.Loader";
  t.tp_basicsize = sizeof(LoaderObject);
  t.tp_flags = Py_TPFLAGS_DEFAULT;
  t.tp_doc = "threaded prefetching image batch loader";
  t.tp_new = Loader_new;
  t.tp_dealloc = reinterpret_cast<destructor>(Loader_dealloc);
  t.tp_methods = Loader_methods;
  return t;
}();

PyMethodDef module_methods[] = {
    {"imgrid_raw", py_imgrid, METH_VARARGS,
     "imgrid_raw(u8_buffer, n, h, w, c, cols, pad) -> (bytes, gh, gw)"},
    {"load_resize", py_load_resize, METH_VARARGS,
     "load_resize(path, size) -> size*size*3 RGB bytes"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_l2i_native",
                         "native runtime for latent2im_tpu", -1, module_methods};

}  // namespace

PyMODINIT_FUNC PyInit__l2i_native(void) {
  if (PyType_Ready(&LoaderType) < 0) return nullptr;
  PyObject* m = PyModule_Create(&moduledef);
  if (!m) return nullptr;
  Py_INCREF(&LoaderType);
  PyModule_AddObject(m, "Loader", reinterpret_cast<PyObject*>(&LoaderType));
  return m;
}
