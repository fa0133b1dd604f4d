"""Drop-in compatibility shim for the reference's Python binding.

The reference exposes a pybind11 module `pytuatara` with exactly one function
(bindings/python.cpp:54-58):

    pytuatara.image_to_data(image, weights_dir, outputs_dir)
      -> [{"text": str, "bbox": [x0, y0, x1, y1]}]

This module reproduces that surface 1:1 on top of the TPU engine, including
the reference's argument validation (non-empty weights_dir/outputs_dir,
tuatara.cpp:315-323 — raised as typed exceptions instead of
print-and-return-empty) and its 3-D uint8 input check
(bindings/python.cpp:15-17). `outputs_dir` is accepted and unused, exactly as
in the reference (SURVEY.md quirk 6).

Like the reference, the marshalling layer is COMPILED when available: the
`_pytuatara` C extension (native/pytuatara_ext.c, built by
`make -C native pyext`) does the buffer validation/copy and result-dict
construction in C and routes through `_run` below for the engine call.
`image_to_data` resolves to it at import time, with the pure-Python
implementation (`_image_to_data_py`) as the uncompiled fallback — both are
contract-tested equal (tests/test_pyext.py).
"""

from __future__ import annotations

import os
import sys
from typing import Dict, List

import numpy as np

from tuatara_tpu import api as _api


def _run(image, weights_dir: str, outputs_dir: str) -> List[Dict]:
    """Validated engine call; shared by the compiled and Python bindings.

    The reference's weights_dir holds TorchScript artifacts; ours holds the
    converted .npz pytrees (utils/convert.py). Random-init fallback is NOT
    allowed here — the reference errors on unloadable weights
    (tuatara.cpp:337-340), so we do too. Returns the engine's full records
    (text, bbox, confidence); the binding trims them to the reference's
    OutputItem shape."""
    from tuatara_tpu.utils.weights import weights_available

    wd = weights_dir if weights_available(weights_dir) else None
    if wd is None and os.path.isdir(weights_dir):
        raise FileNotFoundError(
            f"error loading models from {weights_dir!r}: expected craft.npz/"
            "parseq.npz (convert TorchScript weights with tuatara_tpu.utils.convert)"
        )
    if wd is None:
        raise FileNotFoundError(f"weights_dir {weights_dir!r} does not exist")
    return _api.image_to_data(image, weights_dir=wd, outputs_dir=outputs_dir)


def _image_to_data_py(image, weights_dir: str, outputs_dir: str) -> List[Dict]:
    if not weights_dir:
        raise ValueError("Please provide a value for weights_dir")
    if not outputs_dir:
        raise ValueError("Please provide a value for outputs_dir")
    # Mirror the compiled binding's marshalling contract EXACTLY
    # (native/pytuatara_ext.c:70-84, same check order and exception types)
    # so whether `make -C native pyext` ran never changes observable
    # behavior: buffer protocol required (TypeError), then ndim == 3
    # (ValueError), then uint8 (TypeError). Without this, a float32 image
    # would sail on to the engine's later, differently-typed dtype guard
    # on machines where the .so happens not to be built.
    try:
        view = memoryview(image)
    except TypeError:
        raise TypeError(
            "image must support the buffer protocol "
            "(e.g. a numpy uint8 array)") from None
    if view.ndim != 3:
        raise ValueError("Input array should have 3 dimensions")
    if view.itemsize != 1 or view.format not in ("B", "b", None):
        raise TypeError("expected a uint8 image buffer (dtype uint8)")
    image = np.asarray(image)
    results = _run(image, weights_dir, outputs_dir)
    # Reference items carry exactly {text, bbox} (tuatara.h:8-11).
    return [{"text": r["text"], "bbox": r["bbox"]} for r in results]


def _load_compiled():
    """The compiled `_pytuatara` extension, if built (native/Makefile pyext).

    Never builds implicitly — importing this shim must stay cheap and
    side-effect free; tests and the Makefile own the build."""
    native = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
    if os.path.isdir(native) and native not in sys.path:
        sys.path.append(native)
    try:
        from _pytuatara import image_to_data as compiled  # noqa: PLC0415
        return compiled
    except ImportError:
        return None


image_to_data = _load_compiled() or _image_to_data_py
