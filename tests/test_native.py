"""Native C++ post-processing library tests: cross-check against cv2 and the
TPU (JAX) implementation on the same inputs — three independent
implementations must agree."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from tuatara_tpu import native
from tuatara_tpu.config import OcrConfig
from tuatara_tpu.ops.boxes import extract_boxes as jax_extract_boxes

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def test_label_components_matches_cv2(rng):
    m = (rng.random((40, 56)) < 0.35).astype(np.uint8)
    labels, n = native.label_components(m)
    n_cv, cv_labels = cv2.connectedComponents(m, connectivity=4)
    assert n == n_cv - 1
    # same partition
    mask = m.astype(bool)
    pairs = {}
    for a, b in zip(labels[mask].tolist(), cv_labels[mask].tolist()):
        assert pairs.setdefault(a, b) == b
    assert labels[~mask].max(initial=-1) == -1


def _synthetic(rng, h=64, w=64, nblobs=6):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    text = np.zeros((h, w), np.float32)
    link = np.zeros((h, w), np.float32)
    for _ in range(nblobs):
        cy, cx = rng.uniform(8, h - 8), rng.uniform(8, w - 8)
        sy, sx = rng.uniform(1.5, 3.5), rng.uniform(2.5, 6.0)
        text += np.exp(-(((yy - cy) / sy) ** 2 + ((xx - cx) / sx) ** 2))
        if rng.random() < 0.5:
            link += 0.8 * np.exp(-(((yy - cy) / sy) ** 2 + ((xx - cx - 5) / (sx * 2)) ** 2))
    return np.clip(text, 0, 1), np.clip(link, 0, 1)


@pytest.mark.parametrize("seed", [0, 3, 7])
def test_native_boxes_match_jax(seed, rng):
    rng = np.random.default_rng(seed)
    text, link = _synthetic(rng)
    cfg = OcrConfig(max_boxes=16, canvas_size=128)

    nboxes, ncorners, _ = native.extract_boxes(text, link, max_boxes=16)

    out = jax_extract_boxes(jnp.array(text), jnp.array(link),
                            jnp.ones((64, 64), bool), cfg)
    valid = np.asarray(out["valid"])
    jboxes = np.asarray(out["boxes"])[valid]

    got = sorted(tuple(int(v) for v in b) for b in nboxes)
    want = sorted(tuple(int(v) for v in b) for b in jboxes)
    assert got == want


def test_native_minarearect_matches_cv2(rng):
    """Rotating-calipers corners vs cv2.minAreaRect on the same point set."""
    text = np.zeros((64, 64), np.float32)
    # thick diagonal bar (4-connected) -> genuinely rotated rect
    for i in range(30):
        text[10 + i // 2: 13 + i // 2, 8 + i] = 1.0
    link = np.zeros_like(text)
    link[0, 0] = 1e-6
    boxes, corners, _ = native.extract_boxes(text, link, min_area=5)
    assert len(boxes) == 1

    def rect_area(c):
        e1 = np.hypot(*(c[1] - c[0]))
        e2 = np.hypot(*(c[2] - c[1]))
        return e1 * e2

    # Rebuild the dilated point set the library used and compare areas.
    tn = (text - text.min()) / (text.max() - text.min())
    mask = (tn > 0.4).astype(np.uint8)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(mask, connectivity=4)
    pts = np.argwhere(labels == 1)[:, ::-1].astype(np.float32)
    size = int(stats[1, cv2.CC_STAT_AREA])
    x, y, w, h = (int(stats[1, i]) for i in range(4))
    niter = int(np.sqrt(size * min(w, h) // (w * h) * 2))
    seg = np.zeros_like(mask)
    seg[labels == 1] = 255
    sx_, sy_ = max(0, x - niter), max(0, y - niter)
    ex, ey = min(64, x + w + niter + 1), min(64, y + h + niter + 1)
    kernel = np.ones((1 + niter, 1 + niter), np.uint8)
    seg[sy_:ey, sx_:ex] = cv2.dilate(seg[sy_:ey, sx_:ex], kernel)
    dpts = np.argwhere(seg > 0)[:, ::-1].astype(np.float32)
    rect = cv2.minAreaRect(dpts)
    cv_area = rect[1][0] * rect[1][1]
    assert abs(rect_area(corners[0]) - cv_area) / max(cv_area, 1) < 0.05
