"""C ABI surface tests (native/tuatara_capi.{h,cpp}).

The reference is consumable as a C++ static library + pybind module
(tuatara.h:8-13, bindings/python.cpp:54-58); the rebuild's equivalent is a
plain C ABI that embeds CPython and routes through the public engine. Two
integration levels:

* ctypes in-process: the shared library joins THIS interpreter via
  PyGILState and must produce exactly `tuatara_tpu.image_to_data`'s results.
* standalone subprocess: a plain C binary (no Python host) linked against
  the library runs the full pipeline end-to-end.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "native")
SO = os.path.join(NATIVE_DIR, "libtuatara_capi.so")
EXAMPLE = os.path.join(NATIVE_DIR, "capi_example")


def _build(target: str) -> bool:
    r = subprocess.run(["make", "-C", NATIVE_DIR, target],
                       capture_output=True, text=True)
    return r.returncode == 0


class _Item(ctypes.Structure):
    _fields_ = [("text", ctypes.c_char * 256),
                ("bbox", ctypes.c_float * 4),
                ("confidence", ctypes.c_float)]


def _stale(binary: str, *sources: str) -> bool:
    return not os.path.isfile(binary) or any(
        os.path.getmtime(binary) < os.path.getmtime(s) for s in sources
    )


@pytest.fixture(scope="module")
def capi():
    srcs = (os.path.join(NATIVE_DIR, "tuatara_capi.cpp"),
            os.path.join(NATIVE_DIR, "tuatara_capi.h"))
    if _stale(SO, *srcs) and not _build("libtuatara_capi.so"):
        pytest.skip("C ABI library unavailable (g++/Python headers missing?)")
    lib = ctypes.CDLL(SO)
    lib.tuatara_image_to_data.restype = ctypes.c_int
    lib.tuatara_image_to_data.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(_Item), ctypes.c_int,
    ]
    lib.tuatara_last_error.restype = ctypes.c_char_p
    return lib


def _call(lib, img, weights=None, max_items=64):
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    buf = np.ascontiguousarray(img, np.uint8)
    items = (_Item * max_items)()
    n = lib.tuatara_image_to_data(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w, c,
        weights.encode() if weights else None, None, items, max_items)
    return n, items


@pytest.mark.slow
def test_capi_matches_python_api(capi, rng):
    """In-process ctypes call == the Python API, record for record."""
    import tuatara_tpu

    img = np.full((96, 120, 3), 255, np.uint8)
    img[20:30, 10:60] = 0
    img[50:58, 30:90] = 0
    img += rng.integers(0, 10, img.shape).astype(np.uint8)

    want = tuatara_tpu.image_to_data(img)
    n, items = _call(capi, img)
    assert n == len(want), capi.tuatara_last_error().decode()
    for i, w_ in enumerate(want):
        assert items[i].text.decode() == w_["text"]
        np.testing.assert_allclose(list(items[i].bbox), w_["bbox"], atol=1e-4)
        np.testing.assert_allclose(items[i].confidence, w_["confidence"],
                                   rtol=1e-5, atol=1e-30)


@pytest.mark.slow
def test_capi_grayscale_and_errors(capi):
    gray = np.full((64, 64), 255, np.uint8)
    gray[20:30, 10:50] = 0
    n, _ = _call(capi, gray)
    assert n >= 0, capi.tuatara_last_error().decode()

    # Invalid channel count -> -1 with a message, no crash.
    bad = np.zeros((8, 8, 2), np.uint8)
    n, _ = _call(capi, bad)
    assert n == -1
    assert b"invalid" in capi.tuatara_last_error()

    # Bad weights dir -> Python FileNotFoundError surfaced as -1 + message.
    img = np.zeros((64, 64, 3), np.uint8)
    n, _ = _call(capi, img, weights="/nonexistent_weights_dir")
    assert n == -1
    assert capi.tuatara_last_error() != b""


@pytest.mark.slow
def test_capi_standalone_binary():
    """A plain C program (no Python host) linked against the C ABI runs the
    full pipeline: the embedded-interpreter path."""
    if _stale(EXAMPLE, os.path.join(NATIVE_DIR, "capi_example.c"),
              os.path.join(NATIVE_DIR, "tuatara_capi.cpp")) and not _build("capi_example"):
        pytest.skip("cannot build capi_example")
    env = dict(os.environ)
    repo = os.path.dirname(NATIVE_DIR)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # Pin the embedded interpreter to the CPU backend: conftest's in-process
    # platform override cannot reach a fresh subprocess, and the ambient
    # default (a tunneled TPU) can hang the whole test on tunnel outages —
    # this test is about the C embedding path, not the backend. The pin
    # rides TUATARA_JAX_PLATFORM (applied via jax.config inside the
    # embedded bootstrap): this environment's sitecustomize plugin
    # registration makes plain JAX_PLATFORMS ineffective. On CPU the
    # full-width default architecture compiles for minutes, so run the tiny
    # fixture weights (whose config.json instantiates the tiny models).
    env["TUATARA_JAX_PLATFORM"] = "cpu"
    weights = os.path.join(repo, "tests", "fixtures", "golden_weights")
    r = subprocess.run([EXAMPLE, weights], capture_output=True, text=True,
                       env=env, timeout=900)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "items" in r.stdout
