#!/usr/bin/env python3
"""Table-image example (counterpart of the reference's examples/table.cpp,
which hardcodes its weights path and takes only the image argv).

    python examples/table.py [image]
"""

import os
import sys

from tuatara_tpu.api import image_to_data
from tuatara_tpu.utils.image import load_image

DEFAULT_WEIGHTS = "./weights"  # mirrors the reference's hardcoded ../../weights


def main() -> int:
    from tuatara_tpu.utils.image import asset_path

    image_path = sys.argv[1] if len(sys.argv) > 1 else asset_path("table_english.png")
    weights = DEFAULT_WEIGHTS if os.path.isdir(DEFAULT_WEIGHTS) else None
    results = image_to_data(load_image(image_path), weights, "./outputs")
    for r in results:
        print(r)
    print(f"{len(results)} boxes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
