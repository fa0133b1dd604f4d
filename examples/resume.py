#!/usr/bin/env python3
"""Resume-image example (counterpart of the reference's examples/resume.cpp:
argv = image, weights_dir, outputs_dir).

    python examples/resume.py [image] [weights_dir] [outputs_dir]
"""

import sys

from tuatara_tpu.api import image_to_data
from tuatara_tpu.utils.image import load_image


def main() -> int:
    from tuatara_tpu.utils.image import asset_path

    image_path = sys.argv[1] if len(sys.argv) > 1 else asset_path("resume_example.png")
    weights_dir = sys.argv[2] if len(sys.argv) > 2 else None
    outputs_dir = sys.argv[3] if len(sys.argv) > 3 else None
    results = image_to_data(load_image(image_path), weights_dir, outputs_dir)
    for r in results:
        print(r)
    print(f"{len(results)} boxes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
