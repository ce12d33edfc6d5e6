// Native host-side audio runtime for the TPU serving/streaming path.
//
// The reference delegates this work to torch CPU ops and soundfile
// (streamer.py device->host hops, gradio demo WAV output); here it is a small
// C++ extension on the CPython C API (no pybind11 in the image):
//
//   float_to_pcm16(float32 buffer)            -> bytes   (clamped, vectorized)
//   write_wav(path, rate, float32 buffer)     -> int     (samples written)
//   build_delayed_labels(codes, K, bos, eos)  -> int32 buffer (T+K+1, K)
//   RingBuffer(capacity)                      -> push/pop bytes, thread-safe
//
// The ring buffer decouples the generation producer thread from an audio
// consumer (the reference uses a Python queue.Queue; this avoids the GIL on
// the byte-copy path and gives bounded memory).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <vector>

// ---------------------------------------------------------------- pcm16
static PyObject* float_to_pcm16(PyObject*, PyObject* args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return nullptr;
  if (view.len % (Py_ssize_t)sizeof(float) != 0) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "buffer length not a multiple of float32");
    return nullptr;
  }
  const Py_ssize_t n = view.len / (Py_ssize_t)sizeof(float);
  const float* src = static_cast<const float*>(view.buf);
  PyObject* out = PyBytes_FromStringAndSize(nullptr, n * 2);
  if (!out) {
    PyBuffer_Release(&view);
    return nullptr;
  }
  int16_t* dst = reinterpret_cast<int16_t*>(PyBytes_AS_STRING(out));
  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t i = 0; i < n; ++i) {
    float x = src[i];
    x = x < -1.0f ? -1.0f : (x > 1.0f ? 1.0f : x);
    dst[i] = static_cast<int16_t>(x * 32767.0f);
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  return out;
}

// ---------------------------------------------------------------- wav writer
static void put_u32(FILE* f, uint32_t v) { fwrite(&v, 4, 1, f); }
static void put_u16(FILE* f, uint16_t v) { fwrite(&v, 2, 1, f); }

static PyObject* write_wav(PyObject*, PyObject* args) {
  const char* path;
  int rate;
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "siy*", &path, &rate, &view)) return nullptr;
  const Py_ssize_t n = view.len / (Py_ssize_t)sizeof(float);
  const float* src = static_cast<const float*>(view.buf);

  std::vector<int16_t> pcm;
  int ok = 1;
  Py_BEGIN_ALLOW_THREADS
  pcm.resize(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    float x = src[i];
    x = x < -1.0f ? -1.0f : (x > 1.0f ? 1.0f : x);
    pcm[i] = static_cast<int16_t>(x * 32767.0f);
  }
  FILE* f = fopen(path, "wb");
  if (!f) {
    ok = 0;
  } else {
    const uint32_t data_bytes = static_cast<uint32_t>(n * 2);
    fwrite("RIFF", 1, 4, f);
    put_u32(f, 36 + data_bytes);
    fwrite("WAVE", 1, 4, f);
    fwrite("fmt ", 1, 4, f);
    put_u32(f, 16);
    put_u16(f, 1);                       // PCM
    put_u16(f, 1);                       // mono
    put_u32(f, static_cast<uint32_t>(rate));
    put_u32(f, static_cast<uint32_t>(rate) * 2);
    put_u16(f, 2);
    put_u16(f, 16);
    fwrite("data", 1, 4, f);
    put_u32(f, data_bytes);
    fwrite(pcm.data(), 2, n, f);
    fclose(f);
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  if (!ok) {
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }
  return PyLong_FromSsize_t(n);
}

// --------------------------------------------------- delayed label builder
// codes: int32 buffer (K*T) row-major -> labels (T+K+1, K) int32 with BOS
// prepended, codebook k shifted by k, EOS elsewhere (the training label
// post-processing; reference run_parler_tts_training.py:458-486).
static PyObject* build_delayed_labels(PyObject*, PyObject* args) {
  Py_buffer view;
  int k_codebooks, t_len, bos, eos;
  if (!PyArg_ParseTuple(args, "y*iiii", &view, &k_codebooks, &t_len, &bos, &eos))
    return nullptr;
  if (view.len != (Py_ssize_t)(sizeof(int32_t)) * k_codebooks * t_len) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "codes buffer size != K*T int32");
    return nullptr;
  }
  const int32_t* codes = static_cast<const int32_t*>(view.buf);
  const int out_t = t_len + 1 + k_codebooks;  // BOS column + delay tail
  PyObject* out = PyBytes_FromStringAndSize(nullptr,
      (Py_ssize_t)out_t * k_codebooks * (Py_ssize_t)sizeof(int32_t));
  if (!out) {
    PyBuffer_Release(&view);
    return nullptr;
  }
  int32_t* dst = reinterpret_cast<int32_t*>(PyBytes_AS_STRING(out));
  Py_BEGIN_ALLOW_THREADS
  for (int t = 0; t < out_t; ++t) {
    for (int k = 0; k < k_codebooks; ++k) {
      int32_t v;
      if (t <= k) {
        v = bos;                                   // BOS lower triangle
      } else {
        const int src_t = t - 1 - k;               // shifted source position
        v = (src_t < t_len) ? codes[k * t_len + src_t] : eos;  // EOS tail
      }
      dst[t * k_codebooks + k] = v;
    }
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  return out;
}

// ---------------------------------------------------------------- ring buffer
struct RingBufferObject {
  PyObject_HEAD
  std::vector<uint8_t>* buf;
  size_t capacity;
  std::atomic<size_t>* head;  // write index
  std::atomic<size_t>* tail;  // read index
  std::mutex* mu;
};

static int RingBuffer_init(RingBufferObject* self, PyObject* args, PyObject*) {
  Py_ssize_t capacity;
  if (!PyArg_ParseTuple(args, "n", &capacity)) return -1;
  if (capacity <= 0) {
    PyErr_SetString(PyExc_ValueError, "capacity must be positive");
    return -1;
  }
  self->capacity = static_cast<size_t>(capacity);
  self->buf = new std::vector<uint8_t>(self->capacity);
  self->head = new std::atomic<size_t>(0);
  self->tail = new std::atomic<size_t>(0);
  self->mu = new std::mutex();
  return 0;
}

static void RingBuffer_dealloc(RingBufferObject* self) {
  delete self->buf;
  delete self->head;
  delete self->tail;
  delete self->mu;
  Py_TYPE(self)->tp_free(reinterpret_cast<PyObject*>(self));
}

static PyObject* RingBuffer_push(RingBufferObject* self, PyObject* args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return nullptr;
  size_t pushed = 0;
  {
    std::lock_guard<std::mutex> lock(*self->mu);
    const size_t head = self->head->load();
    const size_t tail = self->tail->load();
    const size_t used = head - tail;
    const size_t free_space = self->capacity - used;
    pushed = std::min(free_space, static_cast<size_t>(view.len));
    for (size_t i = 0; i < pushed; ++i) {
      (*self->buf)[(head + i) % self->capacity] =
          static_cast<const uint8_t*>(view.buf)[i];
    }
    self->head->store(head + pushed);
  }
  PyBuffer_Release(&view);
  return PyLong_FromSize_t(pushed);
}

static PyObject* RingBuffer_pop(RingBufferObject* self, PyObject* args) {
  Py_ssize_t want;
  if (!PyArg_ParseTuple(args, "n", &want)) return nullptr;
  std::lock_guard<std::mutex> lock(*self->mu);
  const size_t head = self->head->load();
  const size_t tail = self->tail->load();
  const size_t avail = head - tail;
  const size_t n = std::min(avail, static_cast<size_t>(want));
  PyObject* out = PyBytes_FromStringAndSize(nullptr, n);
  if (!out) return nullptr;
  uint8_t* dst = reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(out));
  for (size_t i = 0; i < n; ++i) {
    dst[i] = (*self->buf)[(tail + i) % self->capacity];
  }
  self->tail->store(tail + n);
  return out;
}

static PyObject* RingBuffer_size(RingBufferObject* self, PyObject*) {
  return PyLong_FromSize_t(self->head->load() - self->tail->load());
}

static PyMethodDef RingBuffer_methods[] = {
    {"push", reinterpret_cast<PyCFunction>(RingBuffer_push), METH_VARARGS,
     "push(bytes) -> int pushed (bounded by capacity)"},
    {"pop", reinterpret_cast<PyCFunction>(RingBuffer_pop), METH_VARARGS,
     "pop(n) -> bytes (up to n available)"},
    {"size", reinterpret_cast<PyCFunction>(RingBuffer_size), METH_NOARGS,
     "bytes currently buffered"},
    {nullptr, nullptr, 0, nullptr}};

static PyTypeObject RingBufferType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
};

// ------------------------------------------------------------------- module
static PyMethodDef module_methods[] = {
    {"float_to_pcm16", float_to_pcm16, METH_VARARGS,
     "float32 buffer -> int16 PCM bytes (clamped)"},
    {"write_wav", write_wav, METH_VARARGS,
     "write_wav(path, rate, float32 buffer) -> samples written"},
    {"build_delayed_labels", build_delayed_labels, METH_VARARGS,
     "build_delayed_labels(codes_i32, K, T, bos, eos) -> (T+K+1, K) int32 bytes"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_audio_runtime",
    "native audio runtime for parler_tts_tpu", -1, module_methods};

PyMODINIT_FUNC PyInit__audio_runtime(void) {
  RingBufferType.tp_name = "_audio_runtime.RingBuffer";
  RingBufferType.tp_basicsize = sizeof(RingBufferObject);
  RingBufferType.tp_flags = Py_TPFLAGS_DEFAULT;
  RingBufferType.tp_new = PyType_GenericNew;
  RingBufferType.tp_init = reinterpret_cast<initproc>(RingBuffer_init);
  RingBufferType.tp_dealloc = reinterpret_cast<destructor>(RingBuffer_dealloc);
  RingBufferType.tp_methods = RingBuffer_methods;
  if (PyType_Ready(&RingBufferType) < 0) return nullptr;

  PyObject* m = PyModule_Create(&moduledef);
  if (!m) return nullptr;
  Py_INCREF(&RingBufferType);
  PyModule_AddObject(m, "RingBuffer",
                     reinterpret_cast<PyObject*>(&RingBufferType));
  return m;
}
