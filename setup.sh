#!/bin/bash
# One-command setup: weights -> convert -> golden regen -> bench.
#
# Reference analog (setup.sh:1-37): clone the HF weights repo, download
# LibTorch, apt/brew OpenCV, build pybind11. Here the models run on
# JAX/TPU, so the chain is:
#
#   1. clone the SAME HF weights repo (reference setup.sh:6),
#   2. convert the TorchScript artifacts to the engine's npz pytrees
#      (utils/convert.py — traced-name mapping proven by
#      tests/test_torchscript_roundtrip.py on surrogate artifacts),
#   3. record the pretrained engine's outputs as a golden fixture
#      (tests/gen_pretrained_fixture.py -> golden_pretrained.json; the
#      test suite pins serving against it from then on),
#   4. run the benchmark (bench.py) with the real recognition load,
#   5. build the native host library + compiled Python binding.
#
# Zero-egress rehearsal: `./setup.sh --dry-run` skips the download and
# instead exercises the identical chain on surrogate traced artifacts with
# the exact reference layout/filenames — the full converter -> engine ->
# transcript-parity proof (including quantized/NAR/beam serving variants)
# via the roundtrip suite. This is the rehearsed "first contact with real
# weights" path: when the HF repo is reachable, drop the flag.
set -e
cd "$(dirname "$0")"

if [ "$1" = "--dry-run" ]; then
    echo "== dry run: converter/serving rehearsal on surrogate artifacts =="
    python -m pytest tests/test_torchscript_roundtrip.py -q
    echo "== dry run OK: download real weights and re-run without --dry-run =="
    exit 0
fi

if [ ! -d "weights" ]; then
    if git clone https://huggingface.co/jackvial/tuatara-ocr-craft-and-parseq weights_torch 2>/dev/null; then
        echo "Downloaded TorchScript weights; converting to npz pytrees..."
        python -m tuatara_tpu.convert weights_torch weights
        echo "Converted model weights into the weights directory."
        echo "Recording pretrained golden fixture..."
        python tests/gen_pretrained_fixture.py weights
        echo "Running benchmark..."
        TUATARA_WEIGHTS=weights python bench.py || true
    else
        echo "warning: could not reach huggingface.co (offline?)." >&2
        echo "Place craft_traced_torchscript_model.pt / parseq_torchscript.bin in weights_torch/ and run:" >&2
        echo "  python -m tuatara_tpu.convert weights_torch weights" >&2
        echo "  python tests/gen_pretrained_fixture.py weights" >&2
        echo "Or rehearse the same chain offline: ./setup.sh --dry-run" >&2
        if [ -f "evals/production_weights/craft.npz" ]; then
            echo "Falling back to the committed synthetic-trained" \
                 "production-config weights (evals/production_weights —" \
                 "full VGG16-BN CRAFT + ViT-S d384 PARSEQ trained on" \
                 "TrueType synthetic data; scripts/train_production.py)." >&2
            ln -sfn evals/production_weights weights
        fi
    fi
else
    echo "The weights directory already exists. Skipping download."
fi

# Native host library + compiled Python binding (optional; pure-Python
# fallbacks exist for both — pytuatara.py, ops/ host paths).
make -C native all pyext || echo "warning: native build failed; pure-Python fallbacks will be used." >&2
