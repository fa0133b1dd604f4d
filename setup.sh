#!/bin/bash
# Weight acquisition + native build (the reference's setup.sh analog).
#
# Reference (setup.sh:1-37): clone the HF weights repo, download LibTorch,
# apt/brew OpenCV, build pybind11. Here: the models run on JAX/TPU, so the
# only artifacts needed are the TorchScript weight files themselves —
# cloned from the SAME HF repo (setup.sh:6) and converted once to the
# engine's .npz pytrees (utils/convert.py). The native lib (host postproc
# + C ABI + compiled Python binding) builds with make alone.
set -e
cd "$(dirname "$0")"

if [ ! -d "weights" ]; then
    if git clone https://huggingface.co/jackvial/tuatara-ocr-craft-and-parseq weights_torch 2>/dev/null; then
        echo "Downloaded TorchScript weights; converting to npz pytrees..."
        python -m tuatara_tpu.convert weights_torch weights
        echo "Converted model weights into the weights directory."
    else
        echo "warning: could not reach huggingface.co (offline?)." >&2
        echo "Place craft_traced.pt / parseq_traced.pt in weights_torch/ and run:" >&2
        echo "  python -m tuatara_tpu.convert weights_torch weights" >&2
    fi
else
    echo "The weights directory already exists. Skipping download."
fi

# Native host library + compiled Python binding (optional; pure-Python
# fallbacks exist for both — pytuatara.py, ops/ host paths).
make -C native all pyext || echo "warning: native build failed; pure-Python fallbacks will be used." >&2
