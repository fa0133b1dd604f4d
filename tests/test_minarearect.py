"""Exact min-area-rect fitting vs cv2.minAreaRect (the reference oracle).

The reference fits rotated rects with cv::minAreaRect over the dilated
segmap's pixels (tuatara.cpp:162-179). ops/minarearect.py recomputes that
exactly on TPU shapes (row profiles -> hull chains -> edge-direction
sweep); these tests pin the exactness contract:

* property test: random rotated pixel blobs + random square dilation radii
  + content clipping, area AND corner-set equality against a brute-force
  numpy dilation followed by cv2.minAreaRect;
* pipeline test: extract_boxes(box_mode="rotated", rotated_fit="exact")
  against a cv2 oracle of the full reference get_detected_boxes semantics
  (normalize, thresholds, CC, link-only reduction, ROI dilate, minAreaRect);
* dominance test: the exact fit's area is <= the PCA approximation's on
  every component (minimality), with the gap recorded as the PCA error.
"""

import math

import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from tuatara_tpu.config import OcrConfig
from tuatara_tpu.ops.boxes import extract_boxes
from tuatara_tpu.ops.minarearect import min_area_rect_from_profiles


def _rect_area(corners):
    e1 = corners[1] - corners[0]
    e2 = corners[3] - corners[0]
    return abs(e1[0] * e2[1] - e1[1] * e2[0])


def _corner_set_close(a, b, atol=1e-2):
    """Corner sets equal as sets (order/winding-insensitive)."""
    a = np.asarray(a, np.float64).reshape(4, 2)
    b = np.asarray(b, np.float64).reshape(4, 2)
    used = [False] * 4
    for p in a:
        hit = False
        for j in range(4):
            if not used[j] and np.abs(p - b[j]).max() <= atol:
                used[j] = True
                hit = True
                break
        if not hit:
            return False
    return True


def _dilated_clipped_points(mask, glt, grb):
    """Brute-force Minkowski dilation + content clip -> (x, y) int points."""
    H, W = mask.shape
    pts = np.argwhere(mask)  # (y, x)
    out = []
    for dy in range(-glt, grb + 1):
        for dx in range(-glt, grb + 1):
            out.append(pts + [dy, dx])
    out = np.concatenate(out)
    out = out[(out[:, 0] >= 0) & (out[:, 0] < H)
              & (out[:, 1] >= 0) & (out[:, 1] < W)]
    return np.unique(out, axis=0)[:, ::-1]  # -> (x, y)


def _random_rotated_blobs(rng, H, W, K):
    masks = []
    for _ in range(K):
        m = np.zeros((H, W), bool)
        n = int(rng.integers(3, 200))
        cx, cy = rng.uniform(10, W - 10), rng.uniform(10, H - 10)
        ang = rng.uniform(0, np.pi)
        L, Wd = rng.uniform(2, 20), rng.uniform(1, 6)
        t = rng.uniform(-L, L, n)
        o = rng.uniform(-Wd, Wd, n)
        xs = np.clip(np.round(cx + t * np.cos(ang) - o * np.sin(ang)), 0, W - 1)
        ys = np.clip(np.round(cy + t * np.sin(ang) + o * np.cos(ang)), 0, H - 1)
        m[ys.astype(int), xs.astype(int)] = True
        masks.append(m)
    return masks


@pytest.mark.parametrize("seed", [0, 1, 2, 5])
def test_exact_fit_matches_cv2_minarearect(seed):
    rng = np.random.default_rng(seed)
    H, W, K = 64, 64, 8
    masks = _random_rotated_blobs(rng, H, W, K)
    member = np.stack(masks, -1)
    xs = np.arange(W, dtype=np.float32)[None, :, None]
    xmin = np.where(member, xs, 1e30).min(1)
    xmax = np.where(member, xs, -1e30).max(1)
    rvalid = member.any(1)
    glt = rng.integers(0, 4, K).astype(np.int32)
    grb = rng.integers(0, 4, K).astype(np.int32)

    corners, ok = min_area_rect_from_profiles(
        jnp.asarray(xmin), jnp.asarray(xmax), jnp.asarray(rvalid),
        jnp.asarray(glt), jnp.asarray(grb), jnp.int32(W), jnp.int32(H))
    corners, ok = np.asarray(corners), np.asarray(ok)
    assert ok.all(), "no component should overflow the hull budget here"

    for k in range(K):
        pts = _dilated_clipped_points(masks[k], int(glt[k]), int(grb[k]))
        rect = cv2.minAreaRect(pts.astype(np.int32).reshape(-1, 1, 2))
        a_cv = rect[1][0] * rect[1][1]
        a_us = _rect_area(corners[k])
        assert abs(a_us - a_cv) <= 1e-2 * max(a_cv, 1.0), (k, a_us, a_cv)
        # Same rectangle, not just same area (ties aside: fixed seeds).
        assert _corner_set_close(corners[k], cv2.boxPoints(rect), atol=5e-2), (
            k, corners[k].tolist(), cv2.boxPoints(rect).tolist())


def test_degenerate_single_row_and_point():
    """Single-pixel and single-row components fit exactly (axis rects)."""
    H, W, K = 16, 32, 2
    member = np.zeros((H, W, K), bool)
    member[5, 7, 0] = True          # single pixel
    member[8, 4:20, 1] = True       # single row segment
    xs = np.arange(W, dtype=np.float32)[None, :, None]
    xmin = np.where(member, xs, 1e30).min(1)
    xmax = np.where(member, xs, -1e30).max(1)
    rvalid = member.any(1)
    glt = np.array([1, 0], np.int32)
    grb = np.array([1, 2], np.int32)
    corners, ok = min_area_rect_from_profiles(
        jnp.asarray(xmin), jnp.asarray(xmax), jnp.asarray(rvalid),
        jnp.asarray(glt), jnp.asarray(grb), jnp.int32(W), jnp.int32(H))
    corners, ok = np.asarray(corners), np.asarray(ok)
    assert ok.all()
    # point + dilation [-1,+1]^2 -> 3x3 square, extent 2.0 as points
    assert abs(_rect_area(corners[0]) - 4.0) < 1e-3
    # row segment [4,19] + dilation x/y [0,+2] -> 18x3 point extents 17x2
    assert abs(_rect_area(corners[1]) - 34.0) < 1e-3


def _oracle_rotated_boxes(text, link, cfg):
    """Reference get_detected_boxes semantics up to minAreaRect corners
    (tuatara.cpp:119-204 with the rotated fit of :177-179)."""
    tn = (text - text.min()) / max(text.max() - text.min(), 1e-12)
    ln = (link - link.min()) / max(link.max() - link.min(), 1e-12)
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
        rect = cv2.minAreaRect(pts)
        out.append(rect)
    return out


@pytest.mark.parametrize("seed", [0, 3])
def test_pipeline_rotated_exact_matches_cv2_oracle(seed):
    """extract_boxes rotated+exact == the cv2 reference-semantics oracle."""
    rng = np.random.default_rng(seed)
    H, W = 96, 96
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    text = np.zeros((H, W), np.float32)
    link = np.zeros((H, W), np.float32)
    for _ in range(4):
        cy, cx = rng.uniform(12, H - 12), rng.uniform(12, W - 12)
        ang = rng.uniform(0, np.pi)
        u = (xx - cx) * np.cos(ang) + (yy - cy) * np.sin(ang)
        v = -(xx - cx) * np.sin(ang) + (yy - cy) * np.cos(ang)
        text += np.exp(-((u / rng.uniform(4, 8)) ** 2 + (v / rng.uniform(1.5, 3)) ** 2))
    text = np.clip(text, 0, 1)

    cfg = OcrConfig(max_boxes=16, box_mode="rotated", rotated_fit="exact",
                    use_pallas="off")
    out = extract_boxes(jnp.asarray(text), jnp.asarray(link),
                        jnp.ones((H, W), bool), cfg)
    valid = np.asarray(out["valid"])
    ours = np.asarray(out["corners"])[valid]
    oracle = _oracle_rotated_boxes(text, link, cfg)
    assert len(oracle) == valid.sum()
    o_areas = sorted(r[1][0] * r[1][1] for r in oracle)
    u_areas = sorted(_rect_area(c) for c in ours)
    np.testing.assert_allclose(u_areas, o_areas, rtol=1e-4, atol=1e-2)
    # corner-set equality per matched (by centroid) component
    o_by_c = {tuple(np.round(np.mean(cv2.boxPoints(r), 0), 1)): r
              for r in oracle}
    for c in ours:
        cent = tuple(np.round(c.mean(0), 1))
        best = min(o_by_c, key=lambda p: (p[0] - cent[0]) ** 2 + (p[1] - cent[1]) ** 2)
        assert _corner_set_close(c, cv2.boxPoints(o_by_c[best]), atol=0.1)


def test_exact_never_larger_than_pca():
    """Minimality: exact rect area <= PCA rect area on every component
    (the PCA fit is an approximation whose error this pins >= 0)."""
    rng = np.random.default_rng(7)
    H, W = 96, 96
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    text = np.zeros((H, W), np.float32)
    for _ in range(5):
        cy, cx = rng.uniform(12, H - 12), rng.uniform(12, W - 12)
        ang = rng.uniform(0, np.pi)
        u = (xx - cx) * np.cos(ang) + (yy - cy) * np.sin(ang)
        v = -(xx - cx) * np.sin(ang) + (yy - cy) * np.cos(ang)
        text += np.exp(-((u / rng.uniform(4, 9)) ** 2 + (v / rng.uniform(1.5, 3)) ** 2))
    text = np.clip(text, 0, 1)
    link = np.zeros_like(text)
    mask = jnp.ones((H, W), bool)

    base = dict(max_boxes=16, box_mode="rotated", use_pallas="off")
    exact = extract_boxes(jnp.asarray(text), jnp.asarray(link), mask,
                          OcrConfig(rotated_fit="exact", **base))
    pca = extract_boxes(jnp.asarray(text), jnp.asarray(link), mask,
                        OcrConfig(rotated_fit="pca", **base))
    v = np.asarray(exact["valid"])
    ce = np.asarray(exact["corners"])[v]
    cp = np.asarray(pca["corners"])[v]
    assert len(ce) >= 3
    for a, b in zip(ce, cp):
        assert _rect_area(a) <= _rect_area(b) + 1e-3
