"""tuatara-tpu: TPU-native two-stage OCR engine (CRAFT + PARSEQ) in JAX.

A from-scratch rebuild of the capabilities of jackvial/tuatara (a C++/LibTorch/
OpenCV CPU engine) designed for TPU: models run as fused XLA programs, the
detection post-processing (thresholding, connected-component labeling, box
fitting, crop extraction) runs on device with fixed shapes, and heatmaps/
labels/crops stay HBM-resident between the two stages.

Public API mirrors the reference's single entry point
(`pytuatara.image_to_data`, bindings/python.cpp:54-58):

    import tuatara_tpu
    results = tuatara_tpu.image_to_data(image)   # [{"text": str, "bbox": [x0,y0,x1,y1]}]

plus an engine object for persistent model state:

    engine = tuatara_tpu.OcrEngine(config)
    results = engine.run(image)
"""

from tuatara_tpu.config import CraftConfig, OcrConfig, ParseqConfig, DEFAULT_CONFIG
from tuatara_tpu.tokenizer import Tokenizer

__version__ = "0.1.0"

__all__ = [
    "OcrConfig",
    "CraftConfig",
    "ParseqConfig",
    "DEFAULT_CONFIG",
    "Tokenizer",
    "OcrEngine",
    "image_to_data",
    "__version__",
]


def __getattr__(name):
    # Lazy imports keep `import tuatara_tpu` light (no jax import) for tools
    # that only need the config/tokenizer.
    if name in ("OcrEngine", "image_to_data"):
        from tuatara_tpu import api

        return getattr(api, name)
    raise AttributeError(f"module 'tuatara_tpu' has no attribute {name!r}")
