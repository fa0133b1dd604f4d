// C ABI shim over the tuatara-tpu engine (see tuatara_capi.h).
//
// Embeds CPython: when loaded inside a Python process (e.g. via ctypes) it
// joins the running interpreter through PyGILState; when linked into a plain
// C/C++ program it initializes one on first call (PYTHONPATH must reach the
// tuatara_tpu package, as with any embedded-Python deployment). All Python
// objects are confined to this translation unit; the exported surface is
// plain C (fixed-size records, caller-owned buffers, thread-local errors).
//
// Reference analog: the static library + pybind module exposing
// image_to_data (tuatara.h:8-13, bindings/python.cpp:54-58).

#include "tuatara_capi.h"

#include <Python.h>

#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>

namespace {

thread_local std::string g_error;

void set_error(const std::string& msg) { g_error = msg; }

void set_error_from_python() {
  PyObject *type = nullptr, *value = nullptr, *trace = nullptr;
  PyErr_Fetch(&type, &value, &trace);
  PyErr_NormalizeException(&type, &value, &trace);
  std::string msg = "python error";
  if (value != nullptr) {
    PyObject* s = PyObject_Str(value);
    if (s != nullptr) {
      const char* c = PyUnicode_AsUTF8(s);
      if (c != nullptr) msg = c;
      Py_DECREF(s);
    }
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(trace);
  set_error(msg);
}

// Initialize an interpreter exactly once if none is running (standalone
// C/C++ host). Inside a Python process Py_IsInitialized() is already true
// and we only ever join via PyGILState_Ensure.
std::once_flag g_init_once;
bool g_we_initialized = false;

void ensure_interpreter() {
  std::call_once(g_init_once, [] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);  // no signal handlers: we are a guest
      g_we_initialized = true;
      // Standalone hosts: honor TUATARA_JAX_PLATFORM (e.g. "cpu") via
      // jax.config — environments that register a JAX platform plugin at
      // interpreter startup (sitecustomize) can make the JAX_PLATFORMS env
      // var ineffective or even hang backend init when the plugin's remote
      // device is unreachable; the config override is authoritative.
      // In-process Python hosts configure jax themselves.
      PyRun_SimpleString(
          "import os\n"
          "_p = os.environ.get('TUATARA_JAX_PLATFORM')\n"
          "if _p:\n"
          "    import jax\n"
          "    jax.config.update('jax_platforms', _p)\n"
          "del _p\n");
      // Release the GIL acquired by initialization so PyGILState_Ensure
      // below works uniformly from any thread.
      PyEval_SaveThread();
    }
  });
}

struct GilGuard {
  PyGILState_STATE state;
  GilGuard() : state(PyGILState_Ensure()) {}
  ~GilGuard() { PyGILState_Release(state); }
};

}  // namespace

extern "C" const char* tuatara_last_error(void) { return g_error.c_str(); }

extern "C" int tuatara_image_to_data(const unsigned char* image, int height,
                                     int width, int channels,
                                     const char* weights_dir,
                                     const char* outputs_dir, TuataraItem* out,
                                     int max_items) {
  if (image == nullptr || out == nullptr || height <= 0 || width <= 0 ||
      (channels != 1 && channels != 3) || max_items < 0) {
    set_error("invalid arguments");
    return -1;
  }
  ensure_interpreter();
  GilGuard gil;

  int written = -1;
  PyObject* np = nullptr;
  PyObject* mod = nullptr;
  PyObject* arr = nullptr;
  PyObject* results = nullptr;

  do {
    np = PyImport_ImportModule("numpy");
    if (np == nullptr) break;
    mod = PyImport_ImportModule("tuatara_tpu");
    if (mod == nullptr) break;

    // np.frombuffer(memoryview, uint8).reshape(h, w, c) — zero-copy view of
    // the caller's buffer; the engine copies it to device immediately.
    const Py_ssize_t nbytes =
        static_cast<Py_ssize_t>(height) * width * channels;
    PyObject* mv = PyMemoryView_FromMemory(
        reinterpret_cast<char*>(const_cast<unsigned char*>(image)), nbytes,
        PyBUF_READ);
    if (mv == nullptr) break;
    PyObject* flat =
        PyObject_CallMethod(np, "frombuffer", "Os", mv, "uint8");
    Py_DECREF(mv);
    if (flat == nullptr) break;
    if (channels == 3) {
      arr = PyObject_CallMethod(flat, "reshape", "(iii)", height, width,
                                channels);
    } else {
      arr = PyObject_CallMethod(flat, "reshape", "(ii)", height, width);
    }
    Py_DECREF(flat);
    if (arr == nullptr) break;

    // tuatara_tpu.image_to_data requires ndim == 3 for reference-binding
    // parity; grayscale goes through the engine API (accepts [H, W]).
    if (channels == 3 && weights_dir != nullptr && weights_dir[0] != '\0') {
      results = PyObject_CallMethod(mod, "image_to_data", "Oss", arr,
                                    weights_dir, outputs_dir ? outputs_dir : "");
    } else if (channels == 3) {
      results = PyObject_CallMethod(mod, "image_to_data", "O", arr);
    } else {
      PyObject* get_engine = nullptr;
      PyObject* api = PyImport_ImportModule("tuatara_tpu.api");
      if (api == nullptr) break;
      get_engine = PyObject_GetAttrString(api, "get_engine");
      Py_DECREF(api);
      if (get_engine == nullptr) break;
      PyObject* engine;
      if (weights_dir != nullptr && weights_dir[0] != '\0') {
        PyObject* cfgmod = PyImport_ImportModule("tuatara_tpu.config");
        PyObject* dflt =
            cfgmod ? PyObject_GetAttrString(cfgmod, "DEFAULT_CONFIG") : nullptr;
        Py_XDECREF(cfgmod);
        engine = dflt ? PyObject_CallFunction(get_engine, "Os", dflt,
                                              weights_dir)
                      : nullptr;
        Py_XDECREF(dflt);
      } else {
        engine = PyObject_CallFunction(get_engine, nullptr);
      }
      Py_DECREF(get_engine);
      if (engine == nullptr) break;
      results = PyObject_CallMethod(engine, "run", "O", arr);
      Py_DECREF(engine);
    }
    if (results == nullptr) break;

    const Py_ssize_t n = PyList_Size(results);
    if (n < 0) break;
    written = 0;
    for (Py_ssize_t i = 0; i < n && written < max_items; ++i) {
      PyObject* item = PyList_GetItem(results, i);  // borrowed
      PyObject* text = PyDict_GetItemString(item, "text");
      PyObject* bbox = PyDict_GetItemString(item, "bbox");
      PyObject* conf = PyDict_GetItemString(item, "confidence");
      if (text == nullptr || bbox == nullptr) continue;
      TuataraItem& rec = out[written];
      std::memset(&rec, 0, sizeof(rec));
      const char* t = PyUnicode_AsUTF8(text);
      if (t != nullptr) {
        std::strncpy(rec.text, t, sizeof(rec.text) - 1);
      }
      for (int j = 0; j < 4; ++j) {
        PyObject* v = PySequence_GetItem(bbox, j);
        if (v != nullptr) {
          rec.bbox[j] = static_cast<float>(PyFloat_AsDouble(v));
          Py_DECREF(v);
        }
      }
      rec.confidence =
          conf != nullptr ? static_cast<float>(PyFloat_AsDouble(conf)) : 0.0f;
      ++written;
    }
    if (PyErr_Occurred()) {
      written = -1;
      break;
    }
    set_error("");
  } while (false);

  if (written < 0 && PyErr_Occurred()) {
    set_error_from_python();
    PyErr_Clear();
  }
  Py_XDECREF(results);
  Py_XDECREF(arr);
  Py_XDECREF(mod);
  Py_XDECREF(np);
  return written;
}
