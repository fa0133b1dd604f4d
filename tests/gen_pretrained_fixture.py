"""Record the PRETRAINED engine's outputs on the repo's test images.

First-contact apparatus (run by setup.sh after weight conversion): serve the
converted real CRAFT/PARSEQ weights (reference setup.sh:6 artifacts) at the
reference default config and write tests/fixtures/golden_pretrained.json —
[{text, bbox, confidence}] per image. tests/test_golden.py's
test_pretrained_fixture_parity then pins the serving pipeline against those
transcripts on every run (it skips while no fixture exists, i.e. in
zero-egress environments where the weights can't be downloaded).

Usage: python tests/gen_pretrained_fixture.py [weights_dir] (default ./weights)
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "fixtures", "golden_pretrained.json")

IMAGES = ["resume_example", "funsd_0001129658", "funsd_91372360",
          "rotated_text", "table_english"]


def main() -> int:
    sys.path.insert(0, os.path.dirname(HERE))
    from tuatara_tpu.api import OcrEngine
    from tuatara_tpu.config import OcrConfig
    from tuatara_tpu.utils.image import asset_path, load_image

    weights = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(os.path.dirname(HERE), "weights")
    if not os.path.isdir(weights):
        print(f"no weights dir at {weights}; run setup.sh first", file=sys.stderr)
        return 1
    engine = OcrEngine(OcrConfig(), weights_dir=weights)
    fixture = {"weights_dir": os.path.abspath(weights), "images": {}}
    for name in IMAGES:
        out = engine.run(load_image(asset_path(f"{name}.png")))
        fixture["images"][name] = out
        print(f"{name}: {len(out)} boxes; first texts: "
              f"{[r['text'] for r in out[:6]]}")
    with open(OUT, "w") as f:
        json.dump(fixture, f, indent=1)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
