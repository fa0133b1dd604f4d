"""Crop extraction as a batched bilinear gather, HBM-resident.

The reference round-trips every detected box through the host: OpenCV crop of
the axis-aligned bounding rect (tuatara.cpp:409-418), then cv::resize to
128x32 (tuatara.cpp:438-448). Here the full-resolution image stays on device
and all `max_boxes` crops are produced by one fused gather+blend into a fixed
[K, 32, 128, 3] batch — crop and resize are a single composite bilinear
sample (mathematically identical to crop-then-resize, since the intermediate
crop is an axis-aligned integer-pixel window).

Sampling convention mirrors cv::resize INTER_LINEAR (half-pixel):
  src_x = x0 + (j + 0.5) * w_box / out_w - 0.5
with coordinates clamped to the crop window (OpenCV border replication at the
crop edge), and the window itself clamped to the image — a deliberate fix of
the reference's unclamped `boundingRect` crop (quirk: tuatara.cpp:416 can
read out of bounds for edge boxes).

The perspective (rotated-rect rectification) path uses the same gather with a
projective coordinate grid — the improvement the reference TODO'd but never
built (it fits rotated rects yet crops axis-aligned, tuatara.cpp:416).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(image: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray) -> jnp.ndarray:
    """Sample image [H, W, C] at float coords sx/sy [...] -> [..., C]."""
    H, W, _ = image.shape
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)

    flat = image.reshape(H * W, -1)
    def at(yy, xx):
        return jnp.take(flat, (yy * W + xx).reshape(-1), axis=0).reshape(*xx.shape, -1)

    top = at(y0, x0) * (1 - wx) + at(y0, x1) * wx
    bot = at(y1, x0) * (1 - wx) + at(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def crop_rects(scaled_boxes: jnp.ndarray, img_h: int, img_w: int) -> jnp.ndarray:
    """Float boxes (x0,y0,x1,y1) -> integer crop windows, cv-boundingRect
    style (floor(min), span to ceil(max)+1 exclusive), clamped to the image."""
    x0 = jnp.clip(jnp.floor(scaled_boxes[:, 0]), 0, img_w - 1)
    y0 = jnp.clip(jnp.floor(scaled_boxes[:, 1]), 0, img_h - 1)
    x1 = jnp.clip(jnp.ceil(scaled_boxes[:, 2]) + 1, x0 + 1, img_w)
    y1 = jnp.clip(jnp.ceil(scaled_boxes[:, 3]) + 1, y0 + 1, img_h)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def _sample_coords(rects, out_h: int, out_w: int):
    """cv::resize INTER_LINEAR source coordinates per crop (half-pixel),
    clamped to the crop window (border replication at the crop edge —
    cv::resize samples never leave the source crop)."""
    x0, y0, x1, y1 = rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]
    jj = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w
    ii = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
    sx = x0[:, None] + jj[None, :] * (x1 - x0)[:, None] - 0.5  # [K, out_w]
    sy = y0[:, None] + ii[None, :] * (y1 - y0)[:, None] - 0.5  # [K, out_h]
    sx = jnp.clip(sx, x0[:, None], (x1 - 1.0)[:, None])
    sy = jnp.clip(sy, y0[:, None], (y1 - 1.0)[:, None])
    return sx, sy


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def extract_crops_batched(
    images: jnp.ndarray,
    page: jnp.ndarray,
    rects: jnp.ndarray,
    out_h: int = 32,
    out_w: int = 128,
) -> jnp.ndarray:
    """images [B, H, W, C] (uint8 or float, 0..255) + per-crop source page
    indices [K] + rects [K, 4] -> crops [K, out_h, out_w, C] in [0, 1]
    (the reference's /255, tuatara.cpp:446).

    TPU-first by HBM traffic, not FLOPs: bilinear output needs exactly
    4 source taps per pixel, so the warp gathers the TWO tap rows per
    output row ([K, out_h, 2, W] — megabytes, in the source dtype) and
    lerps, then the two tap columns per output column and lerps. The
    obvious alternatives both lose: gathering each crop's full source
    page materializes [K, H, W] (XLA lowers it as a dynamic-update-slice
    copy loop — measured ~20 ms/256 crops, ~400 MB of HBM traffic, the
    whole program's cost), and a dense [K, out, H] weight-matrix matmul
    (gather-as-matmul) pays dense-row reads for 2 live taps. Measured
    5.2 -> 3.5 ms synthetic, 24 -> ~4 ms inside the engine's compiled
    crop program (v5e, 256 crops from 16 1056x800 pages). All tap
    weights are exact fp32; results are bit-identical to the dense
    formulation and match cv2.resize INTER_LINEAR to fixed-point
    tolerance (test_ops.py).
    """
    B, H, W, C = images.shape
    sx, sy = _sample_coords(rects, out_h, out_w)      # [K,out_w], [K,out_h]

    fy = (sy - jnp.floor(sy))[..., None, None]        # [K,out_h,1,1]
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    flat = images.reshape(B * H, W * C)
    base = page[:, None] * H
    top = jnp.take(flat, base + y0, axis=0).astype(jnp.float32)
    bot = jnp.take(flat, base + y1, axis=0).astype(jnp.float32)
    rows = (top.reshape(-1, out_h, W, C) * (1.0 - fy)
            + bot.reshape(-1, out_h, W, C) * fy)      # [K,out_h,W,C]

    # Columns ride the MXU as a [out_w, W] x [out_h, W]^T matmul per crop:
    # wx has exactly the 2 bilinear taps live per output column (zeros
    # elsewhere contribute exact fp32 0 — bit-identical to a 2-tap lerp).
    # A take_along_axis 2-tap column gather lowers to a per-ELEMENT scalar
    # gather here (out_h*out_w*C arbitrary indices — measured 27 ms/call,
    # the whole program's cost); the matmul is ~0.5 ms.
    xs = jnp.arange(W, dtype=jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, :, None] - xs[None, None, :]))
    out = jnp.einsum("kjx,kixc->kijc", wx, rows,
                     precision=jax.lax.Precision.HIGHEST)
    return out / 255.0


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def extract_crops(
    image: jnp.ndarray,
    rects: jnp.ndarray,
    out_h: int = 32,
    out_w: int = 128,
) -> jnp.ndarray:
    """image [H, W, C] float (0..255) + rects [K, 4] -> crops [K, out_h,
    out_w, C] in [0, 1]. Single-image wrapper over extract_crops_batched."""
    K = rects.shape[0]
    page = jnp.zeros((K,), jnp.int32)
    return extract_crops_batched(image[None], page, rects, out_h, out_w)


def _quad_sample_points(corners: jnp.ndarray, out_h: int, out_w: int):
    """Per-output-pixel source coordinates for quad corners [K, 4, 2]
    (tl, tr, br, bl): bilinear interpolation of the quad's edges (for a
    parallelogram — every rotated rect — this equals the full projective
    warp). Returns (sx, sy), each [K, out_h, out_w]."""
    K = corners.shape[0]
    jj = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w
    ii = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
    u = jnp.broadcast_to(jj[None, None, :], (K, out_h, out_w))
    v = jnp.broadcast_to(ii[None, :, None], (K, out_h, out_w))
    tl, tr, br, bl = (corners[:, i] for i in range(4))

    def lerp(a, b, t):
        return a[:, None, None, :] * (1 - t[..., None]) + b[:, None, None, :] * t[..., None]

    top = lerp(tl, tr, u)
    bot = lerp(bl, br, u)
    pts = top * (1 - v[..., None]) + bot * v[..., None]  # [K, H, W, 2]
    return pts[..., 0], pts[..., 1]


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def extract_crops_perspective(
    image: jnp.ndarray,
    corners: jnp.ndarray,
    out_h: int = 32,
    out_w: int = 128,
) -> jnp.ndarray:
    """Rectified crops from rotated-rect corners [K, 4, 2] (tl, tr, br, bl),
    single image [H, W, C] (float, 0..255)."""
    sx, sy = _quad_sample_points(corners, out_h, out_w)
    return _bilinear_gather(image, sx, sy) / 255.0


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def extract_crops_perspective_batched(
    images: jnp.ndarray,
    page: jnp.ndarray,
    corners: jnp.ndarray,
    out_h: int = 32,
    out_w: int = 128,
) -> jnp.ndarray:
    """Rectified crops gathered STRAIGHT from the page batch.

    images [B, H, W, C] (uint8 or float, 0..255) + per-crop source page
    indices [K] + corners [K, 4, 2] -> crops [K, out_h, out_w, C] in [0, 1].

    Replaces the old rotated-path pattern — `jnp.take(images, page)` into a
    [K, H, W, C] per-crop page slab, then a vmapped single-image warp —
    whose page materialization alone was ~400 MB of HBM traffic per dense
    256-crop batch (XLA lowers the take as a dynamic-slice copy loop; the
    axis-aligned path killed the same pattern with its two-tap row gather).
    A slanted output row crosses arbitrarily many source rows, so the
    axis path's two-row trick does not apply; instead the 4 bilinear taps
    gather directly from the flattened batch with per-crop page offsets, in
    the SOURCE dtype (uint8 taps are 4x less gather traffic than pre-cast
    fp32). Equal to the vmapped single-image path up to fp32 rounding
    (gather-then-cast equals cast-then-gather; same tap weights, same
    clamp; only XLA fusion reassociation differs, ~1e-7 — tested)."""
    B, H, W, C = images.shape
    if B * H * W > 2**31 - 1:
        # The flat gather index (base + yy) * W + xx is int32 (x64 is off);
        # past 2^31 jnp.take would silently clamp and return wrong pixels.
        # Shapes are static under jit, so this raises at trace time.
        raise ValueError(
            f"page batch too large for int32 gather indexing: "
            f"B*H*W = {B}*{H}*{W} = {B * H * W} > 2^31-1; split the batch"
        )
    K = corners.shape[0]
    sx, sy = _quad_sample_points(corners, out_h, out_w)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    flat = images.reshape(B * H * W, C)
    base = page[:, None, None].astype(jnp.int32) * H
    # Materialize the four flat index vectors behind an optimization
    # barrier before gathering. Without it XLA fuses the whole index
    # computation (corner lerp, floor, clip, flatten) into each gather's
    # operand chain and the lowering degrades ~6x off the gather roofline
    # (measured 692 -> 117 ms per 256-crop dense batch, bit-identical
    # output; evals/perspective_profile.json has the roofline
    # attribution: a pure 4-tap jnp.take over precomputed indices costs
    # ~118 ms, so the barriered form IS the gather bound).
    idx4 = jax.lax.optimization_barrier(
        tuple(((base + yy) * W + xx).reshape(-1)
              for yy, xx in ((y0, x0), (y0, x1), (y1, x0), (y1, x1))))

    def at(idx):
        return jnp.take(flat, idx, axis=0).reshape(
            K, out_h, out_w, C).astype(jnp.float32)

    top = at(idx4[0]) * (1 - wx) + at(idx4[1]) * wx
    bot = at(idx4[2]) * (1 - wx) + at(idx4[3]) * wx
    return (top * (1 - wy) + bot * wy) / 255.0
