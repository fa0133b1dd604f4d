"""Ops-layer parity tests against OpenCV oracles.

cv2 is the very library the reference calls (threshold, connectedComponents,
dilate, resize — tuatara.cpp:119-234), so matching it on synthetic inputs is
direct behavioral parity evidence for the device-side rewrites.
"""

import math

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tuatara_tpu.config import OcrConfig
from tuatara_tpu.ops.boxes import extract_boxes, scale_boxes, tesseract_bbox
from tuatara_tpu.ops.connected_components import compact_labels, label_components
from tuatara_tpu.ops.resize import detect_canvas, pad32, resize_geometry
from tuatara_tpu.ops.warp import crop_rects, extract_crops, extract_crops_batched

CFG = OcrConfig(max_boxes=16, canvas_size=128)


# ---------------------------------------------------------------------------
# resize geometry
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("h,w", [(100, 200), (1100, 800), (33, 31), (1024, 1024)])
def test_resize_geometry_matches_reference_math(h, w):
    """Replicates tuatara.cpp:211-220 int truncation + cap."""
    cfg = OcrConfig()
    th, tw, ratio = resize_geometry(h, w, cfg)
    target = min(cfg.mag_ratio * max(h, w), cfg.canvas_size)
    r = target / max(h, w)
    assert th == int(h * r) and tw == int(w * r)
    assert abs(ratio - r) < 1e-9


def test_pad32():
    assert pad32(64) == 64 and pad32(65) == 96 and pad32(1) == 32


def test_canvas_shape_bucketing():
    from tuatara_tpu.ops.resize import canvas_shape

    cfg = OcrConfig()  # canvas 1024, bucket 256
    ch, cw, conth, contw, ratio = canvas_shape(1000, 754, cfg)
    # canvas covers content, is bucket-aligned, and never exceeds canvas_size
    assert ch >= conth and cw >= contw
    assert ch % 256 == 0 or ch == cfg.canvas_size
    assert cw % 256 == 0 or cw == cfg.canvas_size
    assert ch <= 1024 and cw <= 1024
    # square behavior when bucketing disabled
    cfg0 = OcrConfig(canvas_bucket=0)
    ch0, cw0, *_ = canvas_shape(1000, 754, cfg0)
    assert (ch0, cw0) == (1024, 1024)
    # small image -> small canvas
    chs, cws, *_ = canvas_shape(200, 300, OcrConfig())
    assert (chs, cws) == (256, 512)


def test_detect_canvas_content_matches_cv2_resize():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (60, 90, 3), dtype=np.uint8)
    cfg = OcrConfig(canvas_size=128)
    canvas, ratio, (ch, cw) = detect_canvas(jnp.array(img), cfg)
    th, tw, _ = resize_geometry(60, 90, cfg)
    ref = cv2.resize(img.astype(np.float32), (tw, th), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(canvas)[0, :th, :tw] * 255.0
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-5)
    # Padding region is zero.
    assert np.all(np.asarray(canvas)[0, th:] == 0)
    assert (ch, cw) == (pad32(th), pad32(tw))


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------

def _random_blobs(rng, h, w, p=0.35):
    m = (rng.random((h, w)) < p).astype(np.uint8)
    return m


def _partition_equal(labels_a, labels_b, mask):
    """Two labelings agree iff they induce the same partition of mask."""
    a = labels_a[mask]
    b = labels_b[mask]
    pairs_ab = {}
    pairs_ba = {}
    for x, y in zip(a.tolist(), b.tolist()):
        if pairs_ab.setdefault(x, y) != y:
            return False
        if pairs_ba.setdefault(y, x) != x:
            return False
    return True


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_label_components_matches_cv2(seed):
    rng = np.random.default_rng(seed)
    m = _random_blobs(rng, 48, 64)
    ours, iters = jax.jit(label_components)(jnp.array(m.astype(bool)))
    ours = np.asarray(ours)
    n_cv, cv_labels = cv2.connectedComponents(m, connectivity=4)
    mask = m.astype(bool)
    assert _partition_equal(ours, cv_labels, mask)
    assert np.all(ours[~mask] == -1)
    # Component count agrees (cv counts background as label 0).
    comp, ncomp = compact_labels(jnp.array(ours), 4096)
    assert int(ncomp) == n_cv - 1


def test_label_components_snake():
    """Worst-case serpentine: long path, must converge within the iter cap."""
    h, w = 32, 32
    m = np.zeros((h, w), bool)
    for i in range(0, h, 2):
        m[i, :] = True
    for i in range(0, h - 2, 4):
        m[i + 1, -1] = True
    for i in range(2, h - 1, 4):
        m[i + 1, 0] = True
    labels, iters = label_components(jnp.array(m), max_iters=64)
    labels = np.asarray(labels)
    assert int(iters) < 64
    vals = np.unique(labels[m])
    assert len(vals) == 1  # single snake component


def test_compact_labels_budget():
    """Components beyond the budget get id K (dropped downstream); ids are
    assigned in raster order of each component's first pixel (cv2 order)."""
    m = np.zeros((8, 8), bool)
    m[::2, ::2] = True  # 16 isolated pixels
    labels, _ = label_components(jnp.array(m))
    comp, ncomp = compact_labels(labels, 16)
    assert int(ncomp) == 16
    ids = np.asarray(comp)[m]
    assert sorted(ids) == list(range(16))  # raster order, dense
    comp4, _ = compact_labels(labels, 4)
    ids4 = np.asarray(comp4)[m]
    assert (ids4[:4] == [0, 1, 2, 3]).all() and (ids4[4:] == 4).all()


# ---------------------------------------------------------------------------
# box extraction vs full reference-semantics oracle (cv2)
# ---------------------------------------------------------------------------

def _oracle_boxes(text, link, cfg):
    """Reference get_detected_boxes semantics (tuatara.cpp:119-204), emitting
    the axis-aligned AABB of the post-dilation pixel set."""
    tn = (text - text.min()) / (text.max() - text.min())
    ln = (link - link.min()) / (link.max() - link.min())
    tb = (tn > cfg.low_text).astype(np.uint8)
    lb = (ln > cfg.link_threshold).astype(np.uint8)
    comb = np.clip(tb + lb, 0, 1).astype(np.uint8)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(comb, connectivity=4)
    out = []
    H, W = text.shape
    for k in range(1, n):
        size = int(stats[k, cv2.CC_STAT_AREA])
        if size < cfg.min_component_area:
            continue
        if tn[labels == k].max() < cfg.text_threshold:
            continue
        seg = np.zeros((H, W), np.uint8)
        seg[labels == k] = 255
        seg[(lb == 1) & (tb == 0)] = 0
        x, y, w, h = (int(stats[k, i]) for i in (0, 1, 2, 3))
        niter = int(math.sqrt(size * min(w, h) // (w * h) * 2))
        sx, sy = max(0, x - niter), max(0, y - niter)
        ex, ey = min(W, x + w + niter + 1), min(H, y + h + niter + 1)
        kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (1 + niter, 1 + niter))
        seg[sy:ey, sx:ex] = cv2.dilate(seg[sy:ey, sx:ex], kernel)
        pts = cv2.findNonZero(seg)
        if pts is None:
            continue
        pts = pts.reshape(-1, 2)
        xs, ys = pts[:, 0], pts[:, 1]
        out.append((xs.min(), ys.min(), xs.max(), ys.max()))
    return sorted(out)


def _synthetic_heatmaps(rng, h, w, nblobs):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    text = np.zeros((h, w), np.float32)
    link = np.zeros((h, w), np.float32)
    for _ in range(nblobs):
        cy, cx = rng.uniform(8, h - 8), rng.uniform(8, w - 8)
        sy_, sx_ = rng.uniform(1.5, 3.5), rng.uniform(2.5, 6.0)
        text += np.exp(-(((yy - cy) / sy_) ** 2 + ((xx - cx) / sx_) ** 2))
        if rng.random() < 0.5:
            link += 0.8 * np.exp(-(((yy - cy) / sy_) ** 2 + ((xx - cx - 5) / (sx_ * 2)) ** 2))
    return np.clip(text, 0, 1), np.clip(link, 0, 1)


@pytest.mark.parametrize("seed", [0, 3, 7])
def test_extract_boxes_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    text, link = _synthetic_heatmaps(rng, 64, 64, 6)
    ref = _oracle_boxes(text, link, CFG)

    mask = jnp.ones((64, 64), bool)
    out = extract_boxes(jnp.array(text), jnp.array(link), mask, CFG)
    valid = np.asarray(out["valid"])
    got = sorted(
        tuple(int(v) for v in row) for row in np.asarray(out["boxes"])[valid]
    )
    assert got == ref, f"\nours: {got}\nref:  {ref}"


@pytest.mark.parametrize("seed", [1, 4])
def test_masked_extraction_equals_oracle_on_cropped_content(seed):
    """The claim that makes TPU canvas padding free: extraction over a
    content-masked padded map is bit-identical to the reference pipeline run
    on just the content region (normalization, CC, dilation clamps all
    confined to the content extent)."""
    rng = np.random.default_rng(seed)
    ch, cw = 48, 40
    text_full = np.zeros((64, 64), np.float32)
    link_full = np.zeros((64, 64), np.float32)
    t, l = _synthetic_heatmaps(rng, ch, cw, 4)
    text_full[:ch, :cw] = t
    link_full[:ch, :cw] = l
    # garbage in the padding region must not affect anything
    text_full[ch:, :] = rng.random((64 - ch, 64), np.float32)
    link_full[:, cw:] = rng.random((64, 64 - cw), np.float32)

    mask = np.zeros((64, 64), bool)
    mask[:ch, :cw] = True
    out = extract_boxes(jnp.array(text_full), jnp.array(link_full),
                        jnp.array(mask), CFG)
    got = sorted(
        tuple(int(v) for v in row)
        for row in np.asarray(out["boxes"])[np.asarray(out["valid"])]
    )
    ref = _oracle_boxes(t, l, CFG)
    assert got == ref, f"\nours: {got}\nref:  {ref}"


@pytest.mark.parametrize("min_area", [
    2, pytest.param(5, marks=pytest.mark.slow),
    pytest.param(10, marks=pytest.mark.slow)])
def test_windowed_area_filter_exact(min_area, rng):
    """area_ok (windowed same-label count) == true per-component area test,
    on random blobs AND adversarial thin snakes/L-shapes that maximize path
    distance per pixel."""
    from tuatara_tpu.ops.connected_components import area_ok, label_components

    m = np.asarray(rng.random((48, 64)) < 0.3)
    # adversarial: a 1-px snake of exactly min_area pixels, an L of
    # min_area-1, and isolated singletons
    m[40, 2:2 + min_area] = True
    m[44, 2:2 + max(min_area - 2, 1)] = True
    m[45, 2] = True  # L-corner
    m[46, 60] = True
    labels, _ = label_components(jnp.array(m))
    lab = np.asarray(labels)
    got = np.asarray(area_ok(labels, min_area))
    for root in np.unique(lab[lab >= 0]):
        comp = lab == root
        want = comp.sum() >= min_area
        vals = np.unique(got[comp & (lab == lab)])  # values at member pixels
        # the filter is read at the ROOT pixel downstream; check there
        ry, rx = np.unravel_index(root, m.shape)
        assert bool(got[ry, rx]) == bool(want), (root, comp.sum(), min_area)


def test_budget_not_exhausted_by_subthreshold_components():
    """Regression (found at production scale): sub-filter specks earlier in
    raster order must NOT consume box-budget slots — the filters run before
    root selection, like the reference's unbudgeted host loop."""
    import dataclasses

    h, w = 64, 64
    text = np.zeros((h, w), np.float32)
    link = np.zeros_like(text)
    link[0, 0] = 1e-6  # avoid degenerate all-equal normalization
    # 24 single-pixel specks (area 1 < min_area) in the top rows — raw
    # raster order puts ALL of them before the real components.
    for i in range(24):
        text[1 + 2 * (i // 12), 2 + 5 * (i % 12)] = 1.0
    # 6 real word-sized components lower on the page.
    real = []
    for i in range(6):
        y, x = 20 + 6 * i, 4 + 3 * i
        text[y:y + 4, x:x + 14] = 1.0
        real.append((x, y, x + 13, y + 3))

    cfg = dataclasses.replace(CFG, max_boxes=8, min_component_area=10)
    out = extract_boxes(jnp.array(text), jnp.array(link),
                        jnp.ones((h, w), bool), cfg)
    got = sorted(
        tuple(int(v) for v in row)
        for row in np.asarray(out["boxes"])[np.asarray(out["valid"])]
    )
    ref = _oracle_boxes(text, link, cfg)
    assert got == ref, f"\nours: {got}\nref:  {ref}"
    assert len(got) == 6


def test_extract_boxes_respects_content_mask():
    """Foreground outside the content extent (TPU canvas padding) is ignored."""
    text = np.zeros((64, 64), np.float32)
    text[10:14, 10:30] = 1.0   # inside content
    text[40:44, 10:30] = 1.0   # outside content
    link = np.zeros_like(text)
    link[0, 0] = 1e-6  # avoid degenerate all-equal normalization
    mask = np.zeros((64, 64), bool)
    mask[:32, :] = True
    out = extract_boxes(jnp.array(text), jnp.array(link), jnp.array(mask), CFG)
    assert int(out["count"]) == 1
    box = np.asarray(out["boxes"])[np.asarray(out["valid"])][0]
    assert box[1] >= 9 and box[3] <= 15


def test_scale_and_round():
    cfg = OcrConfig()
    b = jnp.array([[10.0, 5.0, 20.0, 9.0]])
    s = scale_boxes(b, ratio=0.5, cfg=cfg)  # x4
    np.testing.assert_allclose(np.asarray(s), [[40, 20, 80, 36]])
    np.testing.assert_allclose(np.asarray(tesseract_bbox(jnp.array([[1.5, 2.4, 2.5, 3.6]]))),
                               [[2, 2, 3, 4]])


# ---------------------------------------------------------------------------
# crop extraction vs cv2 crop+resize
# ---------------------------------------------------------------------------

def test_extract_crops_matches_cv2(rng):
    img = rng.integers(0, 255, (96, 120, 3)).astype(np.float32)
    boxes = jnp.array([
        [10.0, 20.0, 60.0, 40.0],
        [0.0, 0.0, 30.0, 10.0],
        [80.0, 70.0, 119.0, 95.0],
    ])
    rects = crop_rects(boxes, 96, 120)
    crops = extract_crops(jnp.array(img), rects, 32, 128)
    for i, (x0, y0, x1, y1) in enumerate(np.asarray(rects).astype(int)):
        ref = cv2.resize(img[y0:y1, x0:x1], (128, 32), interpolation=cv2.INTER_LINEAR)
        got = np.asarray(crops[i]) * 255.0
        err = np.abs(got - ref).max()
        assert err < 1.0, f"crop {i}: max err {err}"  # cv2 fixed-point tolerance


@pytest.mark.parametrize("C", [1, 3])
def test_extract_crops_batched_selects_pages(rng, C):
    """Batched crops pull from the RIGHT page and are bit-identical to the
    single-image path (the engine's serving crop program uses the batched
    2-tap-gather form; extract_crops wraps it for one page)."""
    pages = rng.integers(0, 255, (3, 64, 80, C)).astype(np.uint8)
    boxes = jnp.array([
        [4.0, 6.0, 40.0, 20.0],
        [0.0, 0.0, 79.0, 63.0],
        [50.0, 30.0, 70.0, 55.0],
        [10.0, 40.0, 30.0, 50.0],
    ])
    rects = crop_rects(boxes, 64, 80)
    page = jnp.array([2, 0, 1, 2], jnp.int32)
    got = np.asarray(extract_crops_batched(jnp.asarray(pages), page, rects,
                                           16, 48))
    for i, p in enumerate(np.asarray(page)):
        ref = np.asarray(extract_crops(
            jnp.asarray(pages[p]).astype(jnp.float32), rects[i:i + 1],
            16, 48))[0]
        # Same math; the uint8-in vs f32-in programs fuse the cast/lerp/255
        # chain differently (1-ulp class).
        np.testing.assert_allclose(got[i], ref, atol=4e-6)


def test_crop_rects_clamped():
    """Edge boxes are clamped (fix of reference quirk 7, tuatara.cpp:416)."""
    boxes = jnp.array([[-5.0, -3.0, 200.0, 300.0]])
    r = np.asarray(crop_rects(boxes, 96, 120))[0]
    assert r[0] == 0 and r[1] == 0 and r[2] == 120 and r[3] == 96


def test_extract_boxes_degenerate_masks():
    """Adversarial inputs: empty page, all-foreground page, single hot
    pixel — fixed shapes must hold and counts must be sane (no NaNs, no
    crashes, budget respected)."""
    from tuatara_tpu.ops.boxes import extract_boxes

    H, W = 64, 128
    mask = jnp.ones((H, W), bool)
    cfg = OcrConfig(max_boxes=32, use_pallas="off")

    # Empty: constant-zero maps normalize to all-zeros -> no boxes.
    out = extract_boxes(jnp.zeros((H, W)), jnp.zeros((H, W)), mask, cfg)
    assert int(out["count"]) == 0
    assert not bool(out["valid"].any())

    # All-foreground: one page-sized component, peak == 1 >= threshold.
    ones_t = jnp.ones((H, W)) * 0.9
    ones_t = ones_t.at[0, 0].set(0.0)  # give normalization a range
    out = extract_boxes(ones_t, jnp.zeros((H, W)), mask, cfg)
    assert int(out["count"]) == 1
    x0, y0, x1, y1 = np.asarray(out["boxes"][0])
    assert x1 - x0 >= W - 2 and y1 - y0 >= H - 2
    assert np.isfinite(np.asarray(out["boxes"])).all()

    # One hot pixel: below min_component_area -> filtered out.
    spot = jnp.zeros((H, W)).at[10, 10].set(1.0)
    out = extract_boxes(spot, jnp.zeros((H, W)), mask, cfg)
    assert int(out["count"]) == 0


def test_extract_boxes_budget_overflow_many_components(rng):
    """More passing components than max_boxes: exactly max_boxes emitted,
    raster-first, all finite."""
    from tuatara_tpu.ops.boxes import extract_boxes

    H, W = 64, 128
    t = np.zeros((H, W), np.float32)
    # 8x16 grid of 3x3 blobs = 128 components, budget 16.
    for i in range(8):
        for j in range(16):
            y, x = 2 + 8 * i, 2 + 8 * j
            t[y:y + 3, x:x + 3] = 1.0
    cfg = OcrConfig(max_boxes=16, min_component_area=4, use_pallas="off")
    out = extract_boxes(jnp.asarray(t), jnp.zeros((H, W)), jnp.ones((H, W), bool), cfg)
    assert int(out["count"]) == 16
    assert bool(out["valid"][:16].all())
    boxes = np.asarray(out["boxes"])[:16]
    assert np.isfinite(boxes).all()
    # raster-first: first box is the top-left blob
    assert boxes[0][1] <= 8
