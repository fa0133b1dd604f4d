"""Rotated-box / rectification path tests (BASELINE.md config 3)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tuatara_tpu.api import OcrEngine
from tuatara_tpu.config import CraftConfig, OcrConfig, ParseqConfig
from tuatara_tpu.ops.boxes import extract_boxes
from tuatara_tpu.ops.warp import extract_crops_perspective

TINY_CRAFT = CraftConfig(
    stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
    up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
    head_channels=(8, 8, 8, 8),
)
TINY_PARSEQ = ParseqConfig(
    embed_dim=32, enc_depth=1, enc_heads=4, dec_heads=4, max_label_length=7,
)


@pytest.mark.slow
def test_pca_corners_recover_rotation():
    """A 30deg-rotated bar yields a rotated rect at ~that angle whose area is
    far below its AABB's."""
    h = w = 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ang = np.deg2rad(30)
    u = (xx - 48) * np.cos(ang) + (yy - 48) * np.sin(ang)
    v = -(xx - 48) * np.sin(ang) + (yy - 48) * np.cos(ang)
    text = ((np.abs(u) < 30) & (np.abs(v) < 4)).astype(np.float32)
    link = np.zeros_like(text); link[0, 0] = 1e-6

    cfg = OcrConfig(max_boxes=8, box_mode="rotated", canvas_size=192)
    out = extract_boxes(jnp.array(text), jnp.array(link), jnp.ones((h, w), bool), cfg)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 1
    c = np.asarray(out["corners"])[valid][0]
    e1 = c[1] - c[0]
    angle = np.rad2deg(np.arctan2(e1[1], e1[0])) % 180
    assert min(abs(angle - 30), abs(angle - 150)) < 3, angle
    rect_area = np.hypot(*(c[1] - c[0])) * np.hypot(*(c[2] - c[1]))
    box = np.asarray(out["boxes"])[valid][0]
    aabb_area = (box[2] - box[0] + 1) * (box[3] - box[1] + 1)
    assert rect_area < 0.75 * aabb_area


def test_perspective_crop_rectifies():
    """Sampling along rotated corners recovers the unrotated pattern."""
    h = w = 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    ang = np.deg2rad(25)
    u = (xx - 64) * np.cos(ang) + (yy - 64) * np.sin(ang)
    # stripes along the rotated axis
    img = np.repeat((np.sin(u) > 0).astype(np.float32)[..., None] * 255, 3, -1)

    L, Hh = 40.0, 10.0
    c, s = np.cos(ang), np.sin(ang)
    center = np.array([64.0, 64.0])
    corners = np.array([
        center + [-L * c + Hh * s, -L * s - Hh * c],
        center + [L * c + Hh * s, L * s - Hh * c],
        center + [L * c - Hh * s, L * s + Hh * c],
        center + [-L * c - Hh * s, -L * s + Hh * c],
    ], np.float32)[None]
    crops = extract_crops_perspective(jnp.array(img), jnp.array(corners), 32, 128)
    crop = np.asarray(crops)[0, :, :, 0]
    # Rectified: columns are ~constant (stripes now vertical), rows vary.
    col_var = crop.std(axis=0).mean()
    row_var = crop.std(axis=1).mean()
    assert col_var < 0.3 * row_var, (col_var, row_var)


@pytest.mark.slow
def test_engine_rotated_mode_runs(rng):
    cfg = OcrConfig(canvas_size=128, max_boxes=16, rec_buckets=(16,),
                    max_label_length=7, box_mode="rotated")
    eng = OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, seed=0)
    img = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
    out = eng.run(img)
    for item in out:
        x0, y0, x1, y1 = item["bbox"]
        assert x0 <= x1 and y0 <= y1


def test_perspective_batched_matches_single(rng):
    """extract_crops_perspective_batched (direct page-batch gather — no
    [K, H, W, C] per-crop page materialization) is bit-identical to the
    vmapped single-image warp it replaced up to fp32 rounding (same tap
    weights, same clamp; gather-then-cast equals cast-then-gather for uint8
    sources — only XLA's fusion reassociation differs, ~1e-7)."""
    import jax

    from tuatara_tpu.ops.warp import extract_crops_perspective_batched

    B, H, W = 3, 64, 80
    images = (rng.random((B, H, W, 3)) * 255).astype(np.uint8)
    K = 7
    page = rng.integers(0, B, size=K).astype(np.int32)
    centers = rng.random((K, 2)) * [W, H]
    ang = rng.random((K,)) * 2 * np.pi
    L = 5 + rng.random((K,)) * 30
    Hh = 2 + rng.random((K,)) * 8
    c, s = np.cos(ang), np.sin(ang)
    corners = np.stack([
        centers + np.stack([-L * c + Hh * s, -L * s - Hh * c], -1),
        centers + np.stack([L * c + Hh * s, L * s - Hh * c], -1),
        centers + np.stack([L * c - Hh * s, L * s + Hh * c], -1),
        centers + np.stack([-L * c - Hh * s, -L * s + Hh * c], -1),
    ], axis=1).astype(np.float32)  # [K, 4, 2], some corners out of bounds

    batched = extract_crops_perspective_batched(
        jnp.asarray(images), jnp.asarray(page), jnp.asarray(corners), 16, 48)
    single = jax.vmap(
        lambda im, c4: extract_crops_perspective(
            im.astype(jnp.float32), c4[None], 16, 48)[0]
    )(jnp.asarray(images)[page], jnp.asarray(corners))
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single),
                               rtol=1e-6, atol=1e-6)
