"""Device-time attribution for the rotated-path perspective crop gather
(VERDICT r4 #5).

`extract_crops_perspective_batched` (ops/warp.py) does 4 bilinear taps per
output pixel as per-element scalar gathers — the pattern the axis path
replaced with a row-gather + tap matmul for a 6x win. A slanted output row
crosses arbitrarily many source rows, so the axis trick does not apply; the
question is whether the 4-tap gather is already at the TPU's
arbitrary-index gather roofline or leaving real time on the table.

Method: measure, at the DENSE load (256 crops from 16 pages of the bench
geometry),
  1. the full perspective warp (gather + lerp arithmetic);
  2. a pure-gather baseline: the same 4x jnp.take index volume on the same
     [B*H*W, C] table with the same index distribution (computed outside
     the timed fn), no interpolation math;
  3. the axis-aligned `extract_crops_batched` on the same rects (the
     row-gather formulation's cost for the same output volume).
(1) - (2) isolates the lerp arithmetic; (1) vs (3) prices the rotation
capability. If (1) ~= (2), the warp is gather-bound and the roofline claim
holds. Writes evals/perspective_profile.json; docs/PERFORMANCE.md quotes it.

Usage: python scripts/profile_perspective.py [--crops 256] [--angle 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def queued_ms(fn, args, n=5):
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    # value readback fence (tunnel hardening, bench.py _queued_ms)
    float(np.asarray(outs[-1]).ravel()[0])
    return (time.perf_counter() - t0) / n * 1000


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--crops", type=int, default=256)
    ap.add_argument("--pages", type=int, default=16)
    ap.add_argument("--angle", type=float, default=8.0,
                    help="box rotation, degrees")
    ap.add_argument("--out", default=os.path.join(
        REPO, "evals", "perspective_profile.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tuatara_tpu.ops.warp import (
        extract_crops_batched, extract_crops_perspective_batched,
    )

    B, H, W, C = args.pages, 1056, 800, 3
    K, oh, ow = args.crops, 32, 128
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (B, H, W, C), np.uint8))
    page = jnp.asarray(rng.integers(0, B, (K,), np.int32))

    # Rotated boxes at the fixture's typical word scale (~90x25 px).
    th = np.deg2rad(args.angle)
    cx = rng.uniform(100, W - 100, K)
    cy = rng.uniform(100, H - 100, K)
    hw, hh = 45.0, 12.5
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    base = np.array([[-hw, -hh], [hw, -hh], [hw, hh], [-hw, hh]])
    corners = jnp.asarray(
        (base @ rot.T)[None] + np.stack([cx, cy], -1)[:, None], jnp.float32)
    rects = jnp.asarray(np.stack(
        [cx - hw, cy - hh, cx + hw, cy + hh], -1), jnp.float32)

    out = {"load": {"pages": B, "crops": K, "page_hw": [H, W],
                    "angle_deg": args.angle},
           "backend": str(jax.devices()[0])}

    # (1) the full perspective warp
    warp_ms = queued_ms(
        lambda im: extract_crops_perspective_batched(im, page, corners),
        (images,))
    out["perspective_warp_ms"] = round(warp_ms, 3)

    # (2) pure-gather baseline: same index volume/distribution, no lerp.
    # Indices precomputed host-side from the same quad grid.
    from tuatara_tpu.ops.warp import _quad_sample_points

    sx, sy = _quad_sample_points(corners, oh, ow)
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, H - 1)
    basei = page[:, None, None].astype(jnp.int32) * H
    idx4 = jnp.stack([
        ((basei + y0) * W + x0).reshape(-1),
        ((basei + y0) * W + jnp.minimum(x0 + 1, W - 1)).reshape(-1),
        ((basei + jnp.minimum(y0 + 1, H - 1)) * W + x0).reshape(-1),
        ((basei + jnp.minimum(y0 + 1, H - 1)) * W
         + jnp.minimum(x0 + 1, W - 1)).reshape(-1),
    ])

    @jax.jit
    def pure_gather(im, idx):
        flat = im.reshape(B * H * W, C)
        return sum(jnp.take(flat, idx[i], axis=0).astype(jnp.float32)
                   for i in range(4))

    gather_ms = queued_ms(pure_gather, (images, idx4))
    out["pure_gather_4tap_ms"] = round(gather_ms, 3)
    out["lerp_overhead_ms"] = round(warp_ms - gather_ms, 3)
    out["gather_bound_fraction"] = round(gather_ms / warp_ms, 3)

    # (3) axis row-gather formulation on the same output volume
    axis_ms = queued_ms(
        lambda im: extract_crops_batched(im, page, rects), (images,))
    out["axis_rowgather_ms"] = round(axis_ms, 3)
    out["rotation_capability_cost_x"] = round(warp_ms / axis_ms, 2)

    # HBM-traffic floor for the gather: 4 taps * K*oh*ow * C bytes (uint8)
    # is the useful-byte count; a TPU gather moves at least one 512-byte
    # vector register row per index in the worst case — both bounds shown.
    useful_mb = 4 * K * oh * ow * C / 1e6
    out["useful_gather_mb"] = round(useful_mb, 1)

    print(json.dumps(out, indent=1))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
