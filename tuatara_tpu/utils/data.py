"""Training data utilities: synthetic text rendering + heatmap targets.

The reference ships no training and no data pipeline (models arrive as
opaque TorchScript). This module provides what its retrain TODO would need
(README.md:42: extended-charset retrain):

* `render_word` / `word_batch`: PIL-rendered text crops in the recognizer's
  [32, 128] shape with random fonts-free styling (scale/offset/contrast/
  noise), labels encoded with the engine tokenizer. Good enough to overfit /
  smoke-train the recognizer and to regression-test the training stack
  end-to-end without external datasets.
* `gaussian_heatmap_targets`: CRAFT-style region/affinity target maps from
  word boxes — an isotropic Gaussian splat per character slot (region) and
  between adjacent slots (affinity), the standard CRAFT weak-supervision
  target shape.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from tuatara_tpu.tokenizer import Tokenizer


def render_word(
    text: str,
    rng: np.random.Generator,
    height: int = 32,
    width: int = 128,
) -> np.ndarray:
    """Render one word -> [height, width, 3] float32 in [0, 1]."""
    from PIL import Image, ImageDraw

    img = Image.new("L", (width, height), 255)
    d = ImageDraw.Draw(img)
    # Default bitmap font; jitter position and scale via resize.
    d.text((int(rng.integers(2, 12)), int(rng.integers(2, 12))), text, fill=0)
    arr = np.asarray(img, np.float32) / 255.0
    # random contrast/brightness + noise
    arr = arr * rng.uniform(0.6, 1.0) + rng.uniform(0.0, 0.3)
    arr = np.clip(arr + rng.normal(0, 0.03, arr.shape), 0, 1)
    return np.repeat(arr[..., None], 3, axis=-1).astype(np.float32)


def word_batch(
    n: int,
    tokenizer: Tokenizer,
    rng: np.random.Generator,
    max_length: int = 25,
    min_len: int = 1,
    max_len: int = 8,
    charset: Optional[str] = None,
) -> Dict[str, np.ndarray]:
    """Random word crops + encoded labels for PARSEQ training.

    Returns {"crops" [n,32,128,3], "labels" [n,max_length+2],
    "lengths" [n], "texts" list[str]}.
    """
    # Default pool: alphanumerics (robust to tiny-font rendering).
    pool = charset or tokenizer.charset[:62]
    texts, crops, labels, lengths = [], [], [], []
    for _ in range(n):
        k = int(rng.integers(min_len, max_len + 1))
        text = "".join(pool[int(i)] for i in rng.integers(0, len(pool), k))
        ids, ln = tokenizer.encode(text, max_length)
        texts.append(text)
        crops.append(render_word(text, rng))
        labels.append(ids)
        lengths.append(ln)
    return {
        "crops": np.stack(crops),
        "labels": np.stack(labels).astype(np.int32),
        "lengths": np.asarray(lengths, np.int32),
        "texts": texts,
    }


def gaussian_heatmap_targets(
    boxes: Sequence[Sequence[float]],
    char_counts: Sequence[int],
    height: int,
    width: int,
) -> np.ndarray:
    """CRAFT-style [height, width, 2] region/affinity targets at heatmap
    resolution from word boxes [(x0, y0, x1, y1)] in heatmap coordinates.

    Each word is split into `char_counts[i]` equal character slots; a
    Gaussian splat per slot builds the region channel, one between adjacent
    slot centers builds the affinity channel.
    """
    target = np.zeros((height, width, 2), np.float32)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)

    def splat(cx, cy, sx, sy, ch):
        g = np.exp(-(((xx - cx) / max(sx, 1e-3)) ** 2 + ((yy - cy) / max(sy, 1e-3)) ** 2))
        np.maximum(target[:, :, ch], g, out=target[:, :, ch])

    for (x0, y0, x1, y1), k in zip(boxes, char_counts):
        k = max(int(k), 1)
        w = (x1 - x0) / k
        cy = (y0 + y1) / 2
        sy = (y1 - y0) / 3
        centers = [(x0 + (i + 0.5) * w, cy) for i in range(k)]
        for cx, cyy in centers:
            splat(cx, cyy, w / 2.5, sy, 0)
        for (ax, ay), (bx, by) in zip(centers[:-1], centers[1:]):
            splat((ax + bx) / 2, (ay + by) / 2, w / 2.5, sy, 1)
    return target


def detection_batch(
    b: int,
    rng: np.random.Generator,
    size: int = 64,
    words_per_page: int = 3,
) -> Dict[str, np.ndarray]:
    """Synthetic detection pages + heatmap targets for CRAFT training.

    Pages are white with dark word-bars at the box locations; targets are
    Gaussian splats at half resolution. Returns {"pages" [b,size,size,3],
    "heat" [b,size/2,size/2,2]}.
    """
    pages = np.ones((b, size, size, 3), np.float32)
    heats = np.zeros((b, size // 2, size // 2, 2), np.float32)
    for i in range(b):
        boxes, counts = [], []
        for _ in range(words_per_page):
            w = int(rng.integers(12, 28))
            h = int(rng.integers(5, 9))
            x0 = int(rng.integers(0, size - w))
            y0 = int(rng.integers(0, size - h))
            pages[i, y0:y0 + h, x0:x0 + w] = rng.uniform(0.0, 0.3)
            boxes.append((x0 / 2, y0 / 2, (x0 + w) / 2, (y0 + h) / 2))
            counts.append(max(w // 6, 1))
        heats[i] = gaussian_heatmap_targets(boxes, counts, size // 2, size // 2)
        pages[i] = np.clip(pages[i] + rng.normal(0, 0.02, pages[i].shape), 0, 1)
    return {"pages": pages, "heat": heats}


def load_funsd_annotations(path: str, level: str = "word") -> List[Dict]:
    """Load one FUNSD annotation file -> ground truth for utils/metrics.

    FUNSD (the dataset the reference's own benchmark image comes from,
    images/funsd_0001129658.png) annotates each page as
    {"form": [{"text", "box": [x0, y0, x1, y1], "words": [{"text", "box"},
    ...], ...}, ...]}. Returns [{"text", "bbox"}] at `level`:

    * "word" (default) — one entry per word, the granularity the engine
      emits and `evaluate_page`/`evaluate_engine` score against;
    * "entity" — one entry per form field (the `text` line), matching
      line-level output (`OcrEngine.run_lines`).

    Entries with empty text (FUNSD marks checkboxes/empty fields as "") are
    dropped — they have no transcript to score and the detector is not
    supposed to find them.
    """
    import json

    with open(path) as f:
        form = json.load(f)["form"]
    out: List[Dict] = []
    if level == "word":
        for field in form:
            for wrd in field.get("words", []):
                if wrd.get("text", "").strip():
                    out.append({"text": wrd["text"],
                                "bbox": [float(v) for v in wrd["box"]]})
    elif level == "entity":
        for field in form:
            if field.get("text", "").strip():
                out.append({"text": field["text"],
                            "bbox": [float(v) for v in field["box"]]})
    else:
        raise ValueError(f"level must be 'word' or 'entity', got {level!r}")
    return out
