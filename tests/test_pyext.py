"""Compiled `_pytuatara` extension module (native/pytuatara_ext.c).

The reference ships its Python binding as a compiled pybind11 module
(bindings/CMakeLists.txt:1-7, bindings/python.cpp:54-58) whose job is
marshalling: buffer validation + copy, engine call, OutputItem -> dict.
The rebuild's equivalent is a raw-CPython-C-API extension; `pytuatara.py`
prefers it once built. Contract here:

* validation errors are raised FROM THE C LAYER with the reference's
  messages (empty dirs, ndim != 3) plus a stricter uint8 dtype check;
* non-contiguous (strided) buffers are handled (PyBuffer_ToContiguous);
* full-pipeline results are identical to the pure-Python fallback.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE_DIR = os.path.join(REPO, "native")


@pytest.fixture(scope="module")
def compiled():
    src = os.path.join(NATIVE_DIR, "pytuatara_ext.c")
    import sysconfig

    so = os.path.join(
        NATIVE_DIR, "_pytuatara" + sysconfig.get_config_var("EXT_SUFFIX"))
    if not os.path.isfile(so) or os.path.getmtime(so) < os.path.getmtime(src):
        r = subprocess.run(["make", "-C", NATIVE_DIR, "pyext"],
                           capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"cannot build _pytuatara: {r.stderr[-300:]}")
    if NATIVE_DIR not in sys.path:
        sys.path.append(NATIVE_DIR)
    import _pytuatara

    return _pytuatara


def test_shim_prefers_compiled(compiled):
    import pytuatara

    # The shim resolved image_to_data at import; with the module built it
    # must be the C implementation (rebind in case pytuatara was imported
    # before the build fixture ran).
    impl = pytuatara._load_compiled() or pytuatara._image_to_data_py
    assert impl is compiled.image_to_data


def _assert_validation_contract(fn):
    img = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError, match="weights_dir"):
        fn(img, "", "o")
    with pytest.raises(ValueError, match="outputs_dir"):
        fn(img, "w", "")
    with pytest.raises(ValueError, match="3 dimensions"):
        fn(np.zeros((4, 4), np.uint8), "w", "o")
    with pytest.raises(TypeError, match="uint8"):
        fn(np.zeros((4, 4, 3), np.float32), "w", "o")
    with pytest.raises(FileNotFoundError):
        fn(img, "/nonexistent_weights_dir", "o")
    # Non-buffer input: the buffer protocol itself raises TypeError.
    with pytest.raises(TypeError):
        fn([[1, 2], [3, 4]], "w", "o")


def test_compiled_validation_errors(compiled):
    _assert_validation_contract(compiled.image_to_data)


def test_fallback_validation_contract_matches_compiled():
    # Whether the .so is built must never change observable behavior: the
    # pure-Python fallback obeys the exact same check order and exception
    # types as the C marshalling layer.
    import pytuatara

    _assert_validation_contract(pytuatara._image_to_data_py)


@pytest.fixture(scope="module")
def tiny_weights_dir(tmp_path_factory):
    """A servable weights_dir from a tiny seeded engine; the stored configs
    (save_weights_dir) let a default OcrEngine reconstruct the matching
    forward structure."""
    from tuatara_tpu.config import CraftConfig, ParseqConfig
    from tuatara_tpu.models.craft import init_craft_params
    from tuatara_tpu.models.parseq import init_parseq_params
    from tuatara_tpu.utils.weights import save_weights_dir
    import jax

    tiny_c = CraftConfig(stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
                         up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
                         head_channels=(8, 8, 8, 8))
    tiny_p = ParseqConfig(embed_dim=32, enc_depth=1, enc_heads=4, dec_heads=4)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    wd = str(tmp_path_factory.mktemp("pyext_weights"))
    save_weights_dir(wd, init_craft_params(k1, tiny_c),
                     init_parseq_params(k2, tiny_p), tiny_c, tiny_p)
    return wd


@pytest.mark.slow
def test_compiled_matches_python_fallback(compiled, tiny_weights_dir, rng):
    import pytuatara

    img = np.full((96, 120, 3), 255, np.uint8)
    img[20:30, 10:60] = 0
    img[50:58, 30:90] = 0
    img += rng.integers(0, 10, img.shape).astype(np.uint8)

    got = compiled.image_to_data(img, tiny_weights_dir, "/tmp")
    want = pytuatara._image_to_data_py(img, tiny_weights_dir, "/tmp")
    assert got == want
    assert all(set(r) == {"text", "bbox"} for r in got)

    # Strided view (every other column): the C layer's contiguous copy must
    # see the same pixels numpy would materialize.
    strided = img[:, ::2]
    assert not strided.flags["C_CONTIGUOUS"]
    got_s = compiled.image_to_data(strided, tiny_weights_dir, "/tmp")
    want_s = pytuatara._image_to_data_py(
        np.ascontiguousarray(strided), tiny_weights_dir, "/tmp")
    assert got_s == want_s
