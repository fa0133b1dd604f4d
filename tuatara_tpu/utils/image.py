"""Image IO + annotation rendering.

Python/PIL equivalent of the reference's visualization surface: the demo
driver's annotated render (bindings/run_ocr.py:10-82 — boxes, fitted text,
reading-order panel, horizontal concat) and the debug box canvas
(utils.cpp:6-48). Rendering is host-side by nature; everything here is cold
path.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

# Test/bench image assets (the reference ships these in-repo at images/;
# this repo does too, so a standalone clone runs the bench and golden tests
# without the reference mount). Resolution order: $TUATARA_IMAGES, the
# repo's own images/, then the reference mount as a last resort.
_REPO_IMAGES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "images",
)
_IMAGE_DIRS = (
    os.environ.get("TUATARA_IMAGES", ""),
    _REPO_IMAGES,
    "/root/reference/images",
)


def asset_path(name: str) -> str:
    """Resolve a test-image filename (e.g. "resume_example.png") to a path.

    Searches $TUATARA_IMAGES, the repo's images/ directory, then the
    read-only reference checkout. Raises FileNotFoundError with the
    searched locations if the asset is nowhere."""
    for d in _IMAGE_DIRS:
        if d:
            p = os.path.join(d, name)
            if os.path.isfile(p):
                return p
    raise FileNotFoundError(
        f"test image {name!r} not found in any of {[d for d in _IMAGE_DIRS if d]}"
    )


def load_image(path: str, keep_gray: bool = False) -> np.ndarray:
    """Load an image file -> [H, W, 3] uint8 RGB (the engine's input
    contract, matching the demo's PIL convert("RGB") — run_ocr.py:88-91).

    With keep_gray, natively single-channel files (PIL mode "L"/"1", e.g.
    the FUNSD scans) return [H, W] uint8 instead: the engine accepts it
    directly, produces bit-identical results to the RGB conversion (which
    just triples the channel), and the host->device transfer carries a third
    of the bytes."""
    from PIL import Image

    im = Image.open(path)
    if keep_gray and im.mode in ("L", "1", "I;16"):
        return np.asarray(im.convert("L"))
    return np.asarray(im.convert("RGB"))


def save_image(path: str, image: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(np.asarray(image).astype(np.uint8)).save(path)


def reading_order(results: List[Dict]) -> List[Dict]:
    """Sort results by (y, x) of the bbox top-left (run_ocr.py:12)."""
    return sorted(results, key=lambda r: (r["bbox"][1], r["bbox"][0]))


def annotate(image: np.ndarray, results: List[Dict]) -> np.ndarray:
    """Render OCR results like the reference demo (run_ocr.py:10-82):
    three side-by-side panels — original with green boxes, recognized text
    drawn inside each box, and a reading-order transcript column."""
    from PIL import Image, ImageDraw

    h, w = image.shape[:2]
    ordered = reading_order(results)

    boxes_panel = Image.fromarray(image.copy())
    d1 = ImageDraw.Draw(boxes_panel)
    text_panel = Image.new("RGB", (w, h), "white")
    d2 = ImageDraw.Draw(text_panel)
    list_panel = Image.new("RGB", (w, h), "white")
    d3 = ImageDraw.Draw(list_panel)

    green = (0, 200, 0)
    for r in ordered:
        x0, y0, x1, y1 = (int(v) for v in r["bbox"])
        d1.rectangle([x0, y0, x1, y1], outline=green, width=2)
        d2.rectangle([x0, y0, x1, y1], outline=(220, 220, 220), width=1)
        d2.text((x0 + 1, y0 + 1), r["text"], fill=(0, 0, 0))

    y = 4
    for r in ordered:
        d3.text((4, y), r["text"], fill=(0, 0, 0))
        y += 12
        if y > h - 12:
            break

    out = Image.new("RGB", (w * 3, h))
    out.paste(boxes_panel, (0, 0))
    out.paste(text_panel, (w, 0))
    out.paste(list_panel, (w * 2, 0))
    return np.asarray(out)


def draw_boxes_on_background(
    boxes: Sequence[Sequence[float]], height: int, width: int
) -> np.ndarray:
    """Debug aid: green box outlines on black (utils.cpp:6-48 equivalent)."""
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (width, height), "black")
    d = ImageDraw.Draw(img)
    for b in boxes:
        x0, y0, x1, y1 = (int(v) for v in b[:4])
        d.rectangle([x0, y0, x1, y1], outline=(0, 255, 0), width=1)
    return np.asarray(img)


def heatmap_to_rgb(heatmap: np.ndarray) -> np.ndarray:
    """Min-max normalized pseudo-color render of a 2-D map
    (display_2d_tensor_heatmap equivalent, utils.cpp:63-79)."""
    x = np.asarray(heatmap, np.float32)
    x = (x - x.min()) / max(x.max() - x.min(), 1e-12)
    # simple jet-ish ramp
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)
