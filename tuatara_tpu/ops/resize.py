"""Detection preprocessing: aspect-preserving resize + pad, on device.

Mirrors the reference's `resize_aspect_ratio` geometry exactly
(tuatara.cpp:206-234): long side scaled to `mag_ratio * max(h, w)` capped at
`canvas_size`, target dims truncated to int, zero-pad bottom/right to the next
multiple of 32. TPU-first difference: the canvas is *always* padded out to
`canvas_size x canvas_size`, so the detector compiles exactly one program —
the extra padding is zeros, which CRAFT maps to near-constant background
scores, and box extraction masks by the true content extent.

Shape math runs in Python at trace time (input H/W are static per jit
specialization); the resize itself is `jax.image.resize` bilinear, which
matches cv::INTER_LINEAR's half-pixel convention (see tests/test_layers.py
bilinear parity vs torch and tests/test_ops.py vs cv2).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from tuatara_tpu.config import OcrConfig


def resize_geometry(h: int, w: int, cfg: OcrConfig) -> Tuple[int, int, float]:
    """Static geometry: (target_h, target_w, ratio) per tuatara.cpp:211-220."""
    target_size = cfg.mag_ratio * max(h, w)
    if target_size > cfg.canvas_size:
        target_size = float(cfg.canvas_size)
    ratio = target_size / max(h, w)
    # int() truncation matches the reference's static_cast<int>.
    return int(h * ratio), int(w * ratio), ratio


def pad32(n: int, multiple: int = 32) -> int:
    return n if n % multiple == 0 else n + (multiple - n % multiple)


def canvas_shape(h: int, w: int, cfg: OcrConfig) -> Tuple[int, int, int, int, float]:
    """Static canvas geometry for an input page shape.

    Returns (canvas_h, canvas_w, content_h, content_w, ratio). The canvas is
    the content extent rounded up to `canvas_bucket` (capped at canvas_size)
    so XLA compiles one detection program per bucket pair instead of always
    paying for the full square — a 1000x754 FUNSD page needs 1024x768, 25%
    less detector compute than 1024x1024. Results are identical: everything
    beyond the content extent is masked out of box extraction either way.
    """
    th, tw, ratio = resize_geometry(h, w, cfg)
    ch, cw = pad32(th, cfg.size_multiple), pad32(tw, cfg.size_multiple)
    c = cfg.canvas_size
    if ch > c or cw > c:
        raise ValueError(f"content {ch}x{cw} exceeds canvas {c}")
    b = cfg.canvas_bucket
    if b:
        canvas_h = min(pad32(ch, b), c)
        canvas_w = min(pad32(cw, b), c)
    else:
        canvas_h = canvas_w = c
    return canvas_h, canvas_w, ch, cw, ratio


def detect_canvas(
    image: jnp.ndarray, cfg: OcrConfig
) -> Tuple[jnp.ndarray, float, Tuple[int, int]]:
    """uint8/float [H, W, C] -> (fp32 canvas [1, CH, CW, C] in [0,1], ratio,
    (content_h, content_w)).

    content_h/w are the /32-padded extents the reference would have used as
    its canvas (tuatara.cpp:225-229); pixels beyond them are all-zero TPU
    padding and are masked out of box extraction.

    The cast/scale to fp32 happens AFTER the pad: when no resample is needed
    (ratio 1.0, the common full-page case) the pad runs on the uint8 input —
    4x less HBM traffic than padding a pre-cast fp32 canvas — and the
    cast + /255 fuse into the consumer. Identical values either way (the
    padding is zeros in both dtypes).
    """
    h, w = image.shape[:2]
    c = image.shape[2]
    canvas_h, canvas_w, ch, cw, ratio = canvas_shape(h, w, cfg)
    th, tw, _ = resize_geometry(h, w, cfg)
    x = image
    if (th, tw) != (h, w):  # ratio 1.0 -> identity resample, skip the gather
        x = jax.image.resize(x.astype(jnp.float32), (th, tw, c), method="bilinear")
    x = jnp.pad(x, ((0, canvas_h - th), (0, canvas_w - tw), (0, 0)))
    return (x.astype(jnp.float32) / 255.0)[None], ratio, (ch, cw)


def resize_bilinear_batch(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Batched bilinear resize [N, H, W, C] -> [N, h, w, C] (half-pixel)."""
    n, _, _, c = x.shape
    return jax.image.resize(x.astype(jnp.float32), (n, h, w, c), method="bilinear")
