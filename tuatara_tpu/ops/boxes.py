"""CRAFT heatmap -> text boxes, entirely on device with fixed shapes.

TPU-native rebuild of the reference's `get_detected_boxes`
(tuatara.cpp:119-204) + `adjust_result_coordinates` (tuatara.cpp:236-253).
The reference's per-component serial OpenCV loop (mask building, minMaxLoc,
dilate, findNonZero, minAreaRect — O(components x H*W)) becomes a constant
number of whole-image vectorized passes. Crucially for TPU, the rewrite is
**gather- and scatter-free**: per-component statistics are fused reductions
over one-hot comparisons of the label image against the K component root
values (`labels == roots[k]`), which the VPU streams at full rate, instead of
`segment_*` scatters that serialize.

Pipeline:

1. Min-max normalize region/affinity maps over the content extent
   (tuatara.cpp:120-121), binarize at `low_text` / `link_threshold`
   (tuatara.cpp:131-132, cv::THRESH_BINARY => strictly greater).
2. Combined score = union of the two binary maps (tuatara.cpp:136-137),
   intersected with the content mask (TPU canvas padding is excluded).
3. Connected components via gather-free segmented-scan labeling
   (ops/connected_components.py); component identities are the K
   raster-first root label values (cv2 label order).
4. Per-component stats from one-hot row/column presence profiles:
   area, full bbox, peak region score, and the bbox of the *reduced* pixel
   set (component minus link-only pixels, tuatara.cpp:160).
5. The reference's per-component square dilation (tuatara.cpp:162-174) is
   applied *analytically in box space*: dilating a pixel set with a
   (1+niter)^2 kernel expands its bounding box by exactly floor(niter/2)
   left/top and ceil(niter/2) right/bottom (OpenCV center anchor ax = K//2
   grows a set by ax right/bottom and K-1-ax left/top), clamped to the
   reference's ROI — which algebra shows reduces to clamping at the content
   edge. No actual dilation pass needed for axis-aligned output; verified
   bit-exact against a cv2 oracle in tests/test_ops.py.
6. Filters: area >= min_component_area (tuatara.cpp:147-148), peak score >=
   text_threshold (tuatara.cpp:150-154), non-empty reduced set, and the
   fixed `max_boxes` budget.

Box fitting: the public bbox format is axis-aligned min/max
(tuatara.cpp:256-274) and the reference crops axis-aligned too
(`boundingRect`, tuatara.cpp:416), so the default "axis" mode emits the
dilated point-set AABB directly (exact whenever the fitted minAreaRect is
axis-aligned, i.e. all horizontal text; a rotated minAreaRect's corner AABB
can be slightly larger — documented deviation). "rotated" mode additionally
fits a rotated rectangle per component for the rectification path the
reference never implemented: by default the EXACT minimum-area rectangle of
the dilated, content-clipped component (ops/minarearect.py — matches
cv2.minAreaRect / tuatara.cpp:177-179 up to fp rounding), or a cheaper PCA
second-moment approximation with `rotated_fit="pca"`.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tuatara_tpu.config import OcrConfig
from tuatara_tpu.ops.connected_components import (
    component_roots_filtered,
    label_components,
    label_components_aux,
)

# Python float, not a jnp scalar (no device work at import time).
_INF = 1e30


def _normalize(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    mn = jnp.min(jnp.where(mask, x, _INF))
    mx = jnp.max(jnp.where(mask, x, -_INF))
    return (x - mn) / jnp.maximum(mx - mn, 1e-12)


def _niter(area, w, h, mode: str):
    """Dilation radius (tuatara.cpp:166). "reference" keeps the C++ integer
    division `size*min(w,h)/(w*h)*2` inside the sqrt; "upstream" is the CRAFT
    repo's float math with the *2 outside."""
    minwh = jnp.minimum(w, h)
    if mode == "reference":
        q = (area * minwh) // jnp.maximum(w * h, 1)
        return jnp.sqrt((q * 2).astype(jnp.float32)).astype(jnp.int32)
    q = area.astype(jnp.float32) * minwh / jnp.maximum(w * h, 1)
    return (jnp.sqrt(q) * 2).astype(jnp.int32)


def _profiles(match: jnp.ndarray):
    """Row/column presence+count profiles of a [H, W, K] membership tensor.

    Returns (row_any [H,K], col_any [W,K], area [K]) as fused reductions —
    XLA streams the one-hot comparison straight into the sums, so the
    [H, W, K] tensor is never materialized.
    """
    rows = jnp.sum(match, axis=1)  # [H, K] counts
    area = jnp.sum(rows, axis=0)
    cols = jnp.sum(match, axis=0)  # [W, K]
    return rows > 0, cols > 0, area


def _extent(any_profile: jnp.ndarray, size: int):
    """(first, last) set index per column of a [size, K] boolean profile."""
    pos = jnp.arange(size, dtype=jnp.int32)[:, None]
    first = jnp.min(jnp.where(any_profile, pos, size), axis=0)
    last = jnp.max(jnp.where(any_profile, pos, -1), axis=0)
    return first, last


@partial(jax.jit, static_argnames=("cfg",))
def extract_boxes(
    textmap: jnp.ndarray,
    linkmap: jnp.ndarray,
    content_mask: jnp.ndarray,
    cfg: OcrConfig,
) -> Dict[str, jnp.ndarray]:
    """Heatmaps [H, W] fp32 + content mask [H, W] bool -> fixed-size box set.

    Returns dict with (K = cfg.max_boxes):
      boxes   [K, 4] fp32 — (x0, y0, x1, y1) inclusive pixel extents in
              heatmap coordinates, post-dilation.
      corners [K, 4, 2] fp32 — rotated rect corners (axis-aligned rects in
              "axis" mode).
      valid   [K] bool, count (scalar), num_components (scalar),
      cc_iters (scalar, labeler convergence diagnostics).
    """
    H, W = textmap.shape
    K = cfg.max_boxes

    tn = _normalize(textmap, content_mask)
    ln = _normalize(linkmap, content_mask)
    text_bin = (tn > cfg.low_text) & content_mask
    link_bin = (ln > cfg.link_threshold) & content_mask
    comb = text_bin | link_bin

    # Reduced set: component minus link-only pixels (tuatara.cpp:160).
    keep2d = ~(link_bin & ~text_bin)
    # "Contains a pixel at/above text_threshold" — the reference's per-
    # component minMaxLoc >= threshold test (tuatara.cpp:150-154), as a pixel
    # mask so root selection can pre-filter (see component_roots_filtered).
    hot2d = (tn >= cfg.text_threshold) & content_mask

    use_pallas = cfg.use_pallas == "on" or (
        cfg.use_pallas == "auto"
        and jax.default_backend() == "tpu"
        and H * W <= 512 * 512  # CC kernel holds ~6 HxW i32 arrays in VMEM
        and H % 8 == 0
        and W % 128 == 0  # stats-kernel block lane width
        and K % 128 == 0
    )

    # hot implies keep whenever text_threshold >= low_text (the reference
    # defaults); then the peak-presence pre-filter can ride the CC labeler
    # as a min-propagated aux channel instead of a scatter-max.
    hot_subsumes = cfg.text_threshold >= cfg.low_text

    # The windowed-count area filter only pays off inside the Pallas kernel
    # (labels stay VMEM-resident across the (2*min_area-1)^2-1 rolls; the
    # XLA fallback would stream ~360 full-image passes through HBM where one
    # scatter-add suffices), its cost grows with the window (past ~16 the
    # scatter-add histogram wins even in VMEM), and the window must fit in
    # the heatmap — when 2*min_area-1 exceeds a dimension the circular rolls
    # alias (dy and dy±H coincide mod H), double-counting component pixels
    # so undersized components could falsely pass and burn top-k slots.
    windowed_area = (
        use_pallas
        and 1 <= cfg.min_component_area <= 16
        and 2 * cfg.min_component_area - 1 <= min(H, W)
    )

    if use_pallas:
        from tuatara_tpu.ops.pallas.cc import (
            area_ok_pallas,
            label_components_pallas,
            label_components_pallas_aux,
        )
        from tuatara_tpu.ops.pallas.stats import component_stats

        if hot_subsumes:
            labels, hot_min, cc_iters = label_components_pallas_aux(
                comb, hot2d, cfg.cc_max_iters)
            area_map = (area_ok_pallas(labels, cfg.min_component_area)
                        if windowed_area else None)
            roots, ncomp = component_roots_filtered(
                labels, K, cfg.min_component_area, hot_min=hot_min,
                area_ok_map=area_map)
            # Every selected root already passed the hot-presence pre-filter
            # (== the reference's per-component minMaxLoc >= text_threshold
            # test), so the peak stats channel is dead — use the slimmer
            # kernel (peak was its most expensive reduction).
            from tuatara_tpu.ops.pallas.stats import component_stats_nopeak

            row_cnt, col_cnt, rrow_cnt, rcol_cnt = component_stats_nopeak(
                labels, keep2d, roots)
            peak = None
        else:
            labels, cc_iters = label_components_pallas(comb, cfg.cc_max_iters)
            roots, ncomp = component_roots_filtered(
                labels, K, cfg.min_component_area, hot2d, keep2d,
                hot_implies_keep=False)
            row_cnt, col_cnt, rrow_cnt, rcol_cnt, peak = component_stats(
                labels, tn, keep2d, roots
            )
        area = jnp.sum(row_cnt, axis=0)
        rcount = jnp.sum(rrow_cnt, axis=0)
        t, b = _extent(row_cnt > 0, H)
        l, r = _extent(col_cnt > 0, W)
        rt, rb = _extent(rrow_cnt > 0, H)
        rl, rr = _extent(rcol_cnt > 0, W)
        member = None  # only needed for the rotated-mode moment pass below
    else:
        if hot_subsumes:
            labels, hot_min, cc_iters = label_components_aux(
                comb, hot2d, cfg.cc_max_iters)
            # windowed_area is always False off-Pallas (see above): the
            # area filter here is the one scatter-add histogram inside
            # component_roots_filtered.
            roots, ncomp = component_roots_filtered(
                labels, K, cfg.min_component_area, hot_min=hot_min,
                area_ok_map=None)
        else:
            labels, cc_iters = label_components(comb, cfg.cc_max_iters)
            roots, ncomp = component_roots_filtered(
                labels, K, cfg.min_component_area, hot2d, keep2d,
                hot_implies_keep=False)

        member = labels[:, :, None] == roots[None, None, :]  # [H, W, K]
        row_any, col_any, area = _profiles(member.astype(jnp.int32))
        t, b = _extent(row_any, H)
        l, r = _extent(col_any, W)

        # With the hot-presence aux channel, selected roots already passed
        # the peak >= text_threshold test; skip the [H, W, K] select + max.
        peak = None if hot_subsumes else jnp.max(
            jnp.where(member, tn[:, :, None], -_INF), axis=(0, 1)
        )

        reduced = member & keep2d[:, :, None]
        rrow_any, rcol_any, rcount = _profiles(reduced.astype(jnp.int32))
        rt, rb = _extent(rrow_any, H)
        rl, rr = _extent(rcol_any, W)

    w_full = r - l + 1
    h_full = b - t + 1
    niter = _niter(area.astype(jnp.int32), w_full, h_full, cfg.niter_mode)
    # OpenCV dilate with a KxK kernel (K = 1+niter) and default center anchor
    # ax = K//2 grows a set by ax to the right/bottom and K-1-ax to the
    # left/top (dst(x) covers src(x-dx) for dx in [-(K-1-ax), ax]).
    grow_lt = niter // 2
    grow_rb = (niter + 1) // 2

    # Content extent (for ROI clamping at the reference's heatmap edge).
    xs1 = jnp.arange(W, dtype=jnp.int32)
    ys1 = jnp.arange(H, dtype=jnp.int32)
    cw = jnp.max(jnp.where(content_mask.any(0), xs1, -1)) + 1
    ch = jnp.max(jnp.where(content_mask.any(1), ys1, -1)) + 1

    x0 = jnp.maximum(rl - grow_lt, 0)
    y0 = jnp.maximum(rt - grow_lt, 0)
    x1 = jnp.minimum(rr + grow_rb, cw - 1)
    y1 = jnp.minimum(rb + grow_rb, ch - 1)

    valid = (
        (area >= cfg.min_component_area)
        & (rcount > 0)
        & (roots < jnp.int32(2**30))
    )
    if peak is not None:
        valid = valid & (peak >= cfg.text_threshold)

    boxes = jnp.stack(
        [x0.astype(jnp.float32), y0.astype(jnp.float32),
         x1.astype(jnp.float32), y1.astype(jnp.float32)], axis=-1
    )

    if cfg.box_mode == "rotated":
        if member is None:  # pallas stats path doesn't materialize membership
            member = labels[:, :, None] == roots[None, None, :]
        reduced = member & keep2d[:, :, None]
        if cfg.rotated_fit == "exact":
            # True minAreaRect of the dilated, clipped component (reference
            # tuatara.cpp:162-179 semantics; ops/minarearect.py design
            # notes). Falls back to the PCA fit per component only on
            # hull-budget overflow.
            from tuatara_tpu.ops.minarearect import (
                min_area_rect_from_profiles, row_profiles,
            )

            rxmin, rxmax, rany = row_profiles(reduced)
            exact, exact_ok = min_area_rect_from_profiles(
                rxmin, rxmax, rany, grow_lt, grow_rb, cw, ch)
            pca = _pca_corners(member, reduced, H, W, grow_lt, grow_rb, boxes)
            corners = jnp.where(exact_ok[:, None, None], exact, pca)
        else:
            corners = _pca_corners(member, reduced, H, W, grow_lt, grow_rb, boxes)
    else:
        corners = _aabb_corners(boxes)

    return {
        "boxes": boxes,
        "corners": corners,
        "valid": valid,
        "count": jnp.sum(valid.astype(jnp.int32)),
        "num_components": ncomp,
        "cc_iters": cc_iters,
    }


def _aabb_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [
            jnp.stack([boxes[:, 0], boxes[:, 1]], -1),
            jnp.stack([boxes[:, 2], boxes[:, 1]], -1),
            jnp.stack([boxes[:, 2], boxes[:, 3]], -1),
            jnp.stack([boxes[:, 0], boxes[:, 3]], -1),
        ],
        axis=1,
    )


def _pca_corners(member, reduced, H, W, grow_lt, grow_rb, aabb):
    """PCA-oriented rotated rect per component (approximate minAreaRect).

    Principal axis from second moments of the reduced pixel set (fused
    one-hot reductions), extents from a projection min/max pass, inflated by
    the dilation radius. For near-axis components the result collapses to
    the AABB.
    """
    K = aabb.shape[0]
    fx = jnp.arange(W, dtype=jnp.float32)[None, :, None]
    fy = jnp.arange(H, dtype=jnp.float32)[:, None, None]
    m = reduced.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(m, axis=(0, 1)), 1.0)
    sx = jnp.sum(m * fx, axis=(0, 1)) / n
    sy = jnp.sum(m * fy, axis=(0, 1)) / n
    sxx = jnp.sum(m * fx * fx, axis=(0, 1)) / n - sx * sx
    syy = jnp.sum(m * fy * fy, axis=(0, 1)) / n - sy * sy
    sxy = jnp.sum(m * fx * fy, axis=(0, 1)) / n - sx * sy
    theta = 0.5 * jnp.arctan2(2 * sxy, sxx - syy)
    c, s = jnp.cos(theta), jnp.sin(theta)

    u = fx * c[None, None, :] + fy * s[None, None, :]
    v = -fx * s[None, None, :] + fy * c[None, None, :]
    umin = jnp.min(jnp.where(reduced, u, _INF), axis=(0, 1))
    umax = jnp.max(jnp.where(reduced, u, -_INF), axis=(0, 1))
    vmin = jnp.min(jnp.where(reduced, v, _INF), axis=(0, 1))
    vmax = jnp.max(jnp.where(reduced, v, -_INF), axis=(0, 1))
    # Square dilation inflates projections by at most r*(|c|+|s|).
    infl_lo = grow_lt.astype(jnp.float32) * (jnp.abs(c) + jnp.abs(s))
    infl_hi = grow_rb.astype(jnp.float32) * (jnp.abs(c) + jnp.abs(s))
    umin, umax = umin - infl_lo, umax + infl_hi
    vmin, vmax = vmin - infl_lo, vmax + infl_hi

    def corner(uu, vv):
        return jnp.stack([uu * c - vv * s, uu * s + vv * c], axis=-1)

    corners = jnp.stack(
        [corner(umin, vmin), corner(umax, vmin), corner(umax, vmax), corner(umin, vmax)],
        axis=1,
    )
    bad = ~jnp.isfinite(corners).all(axis=(1, 2))
    return jnp.where(bad[:, None, None], _aabb_corners(aabb), corners)


def scale_boxes(boxes: jnp.ndarray, ratio: float, cfg: OcrConfig) -> jnp.ndarray:
    """Heatmap coords -> original-image coords (tuatara.cpp:236-253):
    multiply by ratio_net * (1/resize_ratio)."""
    return boxes * (cfg.ratio_net / ratio)


def tesseract_bbox(scaled_boxes: jnp.ndarray) -> jnp.ndarray:
    """Public bbox format: rounded [min_x, min_y, max_x, max_y] floats
    (tuatara.cpp:256-274). floor(x+0.5) matches std::round half-away-from-zero
    for the non-negative coordinates produced here (jnp.round would banker's-
    round exact halves)."""
    return jnp.floor(scaled_boxes + 0.5)
