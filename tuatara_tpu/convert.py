"""Weight-conversion CLI: reference TorchScript artifacts -> engine npz.

The reference acquires weights by downloading two TorchScript files from
HuggingFace (`jackvial/tuatara-ocr-craft-and-parseq`, setup.sh:6) into a
weights dir consumed per call (tuatara.cpp:333, 423). The equivalent here is
a ONE-TIME conversion into the engine's npz pytree format, after which no
torch dependency remains at serving time:

    # after downloading the reference weights (e.g. with its setup.sh):
    python -m tuatara_tpu.convert /path/to/reference/weights ./weights
    python -m tuatara_tpu page.png ./weights

The traced-name mapping and full-pipeline equivalence of this converter are
proven by tests/test_torchscript_roundtrip.py on surrogate traced artifacts
with the exact reference layout (no checkpoint download is possible in the
development environment).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m tuatara_tpu.convert",
        description="Convert reference TorchScript weights "
                    "(craft_traced_torchscript_model.pt + parseq_torchscript.bin) "
                    "to the engine's npz format",
    )
    p.add_argument("reference_weights_dir",
                   help="directory holding the two TorchScript artifacts")
    p.add_argument("out_weights_dir",
                   help="output directory for craft.npz / parseq.npz")
    args = p.parse_args(argv)

    from tuatara_tpu.utils.convert import convert_torchscript_weights

    convert_torchscript_weights(args.reference_weights_dir, args.out_weights_dir)
    print(f"converted -> {args.out_weights_dir} (craft.npz, parseq.npz)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
