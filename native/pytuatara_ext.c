/* Compiled CPython extension module `_pytuatara`.
 *
 * The reference ships its Python binding as a COMPILED module built with
 * pybind11 (bindings/CMakeLists.txt:1-7): `pytuatara.image_to_data(image,
 * weights_dir, outputs_dir)` whose job is marshalling — numpy buffer ->
 * cv::Mat via an ndim==3 check + memcpy (buffer_to_mat,
 * bindings/python.cpp:12-28), a call into the C++ engine, and
 * OutputItem -> dict{text, bbox} conversion (output_item_to_dict,
 * bindings/python.cpp:36-41).
 *
 * This module is the same layer rebuilt on the raw CPython C API (pybind11
 * is not available in this environment): argument + buffer-protocol
 * validation and the contiguous copy happen in C, the engine call routes
 * through the installed JAX pipeline (pytuatara._run -> tuatara_tpu engine
 * registry, models loaded once per process), and the result list of
 * {"text", "bbox"} dicts is built in C. `pytuatara.py` transparently
 * prefers this module when it has been built (native/Makefile target
 * `pyext`), so `import pytuatara` gives the compiled path exactly like the
 * reference — with the pure-Python implementation as the fallback.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <string.h>

/* numpy array from an owned contiguous bytes object:
 * np.frombuffer(raw, uint8).reshape(h, w, c). Returns a new reference or
 * NULL with an exception set. Using numpy's Python surface instead of its
 * C API keeps the extension independent of the numpy ABI version. */
static PyObject *bytes_to_ndarray(PyObject *raw, Py_ssize_t h, Py_ssize_t w,
                                  Py_ssize_t c) {
  PyObject *np = PyImport_ImportModule("numpy");
  if (!np) return NULL;
  PyObject *flat = PyObject_CallMethod(np, "frombuffer", "Os", raw, "uint8");
  Py_DECREF(np);
  if (!flat) return NULL;
  PyObject *arr =
      PyObject_CallMethod(flat, "reshape", "(nnn)", h, w, c);
  Py_DECREF(flat);
  return arr;
}

static PyObject *image_to_data(PyObject *self, PyObject *args) {
  (void)self;
  PyObject *image;
  const char *weights_dir, *outputs_dir;
  if (!PyArg_ParseTuple(args, "Oss:image_to_data", &image, &weights_dir,
                        &outputs_dir))
    return NULL;

  /* Reference argument validation (tuatara.cpp:315-323), surfaced as
   * exceptions instead of print-and-return-empty. */
  if (!weights_dir[0]) {
    PyErr_SetString(PyExc_ValueError,
                    "Please provide a value for weights_dir");
    return NULL;
  }
  if (!outputs_dir[0]) {
    PyErr_SetString(PyExc_ValueError,
                    "Please provide a value for outputs_dir");
    return NULL;
  }

  /* buffer_to_mat (bindings/python.cpp:12-28): request the buffer, check
   * ndim==3, copy once into memory this layer owns. The reference's
   * cv::Mat is CV_8UC3 — enforce the uint8 itemsize here (the pybind
   * version silently reinterprets; failing loudly is strictly safer). */
  Py_buffer view;
  if (PyObject_GetBuffer(image, &view, PyBUF_RECORDS_RO) < 0) return NULL;
  if (view.ndim != 3) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError,
                    "Input array should have 3 dimensions");
    return NULL;
  }
  if (view.itemsize != 1 ||
      (view.format && strcmp(view.format, "B") != 0 &&
       strcmp(view.format, "b") != 0)) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_TypeError,
                    "expected a uint8 image buffer (dtype uint8)");
    return NULL;
  }
  Py_ssize_t h = view.shape[0], w = view.shape[1], c = view.shape[2];
  PyObject *raw = PyBytes_FromStringAndSize(NULL, view.len);
  if (!raw) {
    PyBuffer_Release(&view);
    return NULL;
  }
  /* Handles strided (non-contiguous) sources; plain memcpy otherwise. */
  if (PyBuffer_ToContiguous(PyBytes_AS_STRING(raw), &view, view.len, 'C') <
      0) {
    Py_DECREF(raw);
    PyBuffer_Release(&view);
    return NULL;
  }
  PyBuffer_Release(&view);

  PyObject *arr = bytes_to_ndarray(raw, h, w, c);
  Py_DECREF(raw);
  if (!arr) return NULL;

  /* Engine call: pytuatara._run does the weights-dir existence check
   * (reference model-load failure, tuatara.cpp:337-340) and routes into
   * the cached OcrEngine. Imported lazily so building/importing this
   * module never drags JAX in. */
  PyObject *shim = PyImport_ImportModule("pytuatara");
  if (!shim) {
    Py_DECREF(arr);
    return NULL;
  }
  PyObject *records = PyObject_CallMethod(shim, "_run", "Oss", arr,
                                          weights_dir, outputs_dir);
  Py_DECREF(shim);
  Py_DECREF(arr);
  if (!records) return NULL;

  /* output_item_to_dict (bindings/python.cpp:36-41): the reference's
   * OutputItem carries exactly {text, bbox}; rebuild each record with
   * only those keys. */
  PyObject *seq = PySequence_Fast(records, "engine returned a non-sequence");
  Py_DECREF(records);
  if (!seq) return NULL;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  PyObject *out = PyList_New(n);
  if (!out) {
    Py_DECREF(seq);
    return NULL;
  }
  for (Py_ssize_t i = 0; i < n; i++) {
    PyObject *rec = PySequence_Fast_GET_ITEM(seq, i); /* borrowed */
    PyObject *text = PyMapping_GetItemString(rec, "text");
    PyObject *bbox = text ? PyMapping_GetItemString(rec, "bbox") : NULL;
    PyObject *item = bbox ? PyDict_New() : NULL;
    if (!item || PyDict_SetItemString(item, "text", text) < 0 ||
        PyDict_SetItemString(item, "bbox", bbox) < 0) {
      Py_XDECREF(text);
      Py_XDECREF(bbox);
      Py_XDECREF(item);
      Py_DECREF(seq);
      Py_DECREF(out);
      return NULL;
    }
    Py_DECREF(text);
    Py_DECREF(bbox);
    PyList_SET_ITEM(out, i, item); /* steals */
  }
  Py_DECREF(seq);
  return out;
}

static PyMethodDef Methods[] = {
    {"image_to_data", image_to_data, METH_VARARGS,
     "image_to_data(image, weights_dir, outputs_dir) -> "
     "[{'text': str, 'bbox': [x0, y0, x1, y1]}]\n\n"
     "Compiled marshalling layer over the tuatara-tpu OCR engine; surface\n"
     "parity with the reference's pybind11 module "
     "(bindings/python.cpp:54-58)."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_pytuatara",
    "Compiled binding for the tuatara-tpu OCR engine (see pytuatara.py).",
    -1, Methods, NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit__pytuatara(void) { return PyModule_Create(&moduledef); }
