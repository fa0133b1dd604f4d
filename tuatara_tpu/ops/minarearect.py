"""Exact minimum-area rotated rectangles on TPU (fixed shapes, no gathers).

The reference fits rotated rects per component with
``cv::minAreaRect(cv::findNonZero(dilated segmap))`` (tuatara.cpp:162-179):
a serial per-component convex hull + rotating-calipers walk. This module
keeps that MATH exactly but restructures it TPU-first:

1. **Row-extreme profiles.** Every convex-hull vertex of a pixel set is a
   row-extreme pixel (a vertex that is neither the min- nor max-x of its
   row is a convex combination of two same-row points). So the per-
   component [H, W] membership collapses losslessly to two [H] profiles
   (min-x, max-x per row) — fused one-hot reductions like every other
   component stat in ops/boxes.py.
2. **Dilation on profiles.** The reference's per-component square dilation
   is a Minkowski sum with the [-grow_lt, +grow_rb]^2 square; on row
   profiles that is an exact sliding window min/max over y plus a constant
   x offset, clipped at the content edge. Clipping commutes with the
   profile form: the clipped dilated set is a union of row intervals, and
   clamping an offset profile point into the content box lands on a pixel
   of the clipped set (the interval that pushed past the edge reaches the
   clamp line), so the clamped profiles are exactly the clipped set's
   row extremes.
3. **Convex hull** per component via one monotone-chain pass (lax.scan
   with an amortized pop loop) over the y-sorted profiles; left and right
   chains run as one doubled batch (the right boundary is the left
   boundary of the x-negated profile).
4. **Min-area rect by edge sweep.** The optimal rectangle has a side
   collinear with a hull edge (the rotating-calipers invariant), so
   instead of a serial calipers walk, evaluate EVERY hull-edge direction
   at once as one dense masked [K, E, P] projection min/max — VPU
   streaming work with no sequential dependence, exact like calipers.

Exactness contract: identical (up to fp rounding) to cv2.minAreaRect over
cv2.findNonZero of the dilated, content-clipped segmap — cross-checked in
tests/test_minarearect.py against cv2 and the native rotating-calipers
implementation (native/tuatara_postproc.cpp).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_INF = 1e30

# Hull-vertex budget per chain. A convex polygon with vertices on an
# n x n integer grid has O(n^(2/3)) vertices (~4*64 for n=512, split
# across two chains), so 192 per chain is comfortably past the bound for
# canvas-1024 heatmaps (H = 512); components whose chain overflows fall
# back to the caller's approximate fit (flagged in `exact_ok`).
_CHAIN_BUDGET = 192

# Upper bound on the dilation radius per side: niter <= sqrt(2*min(w,h))
# <= sqrt(2*512) = 32 for canvas-1024 heatmaps, so grow = ceil(niter/2)
# <= 16. 18 leaves margin; radii are clamped (and flagged) past it.
_MAX_GROW = 18


def row_profiles(reduced: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-row x extents of a [H, W, K] membership tensor.

    Returns (xmin [H, K], xmax [H, K], row_any [H, K]); empty rows carry
    +/-inf sentinels. Fused reductions — the [H, W, K] one-hot is streamed,
    never materialized beyond what ops/boxes.py already pays.
    """
    W = reduced.shape[1]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :, None]
    xmin = jnp.min(jnp.where(reduced, xs, _INF), axis=1)
    xmax = jnp.max(jnp.where(reduced, xs, -_INF), axis=1)
    return xmin, xmax, reduced.any(axis=1)


def _dilate_profiles(xmin, xmax, rvalid, grow_lt, grow_rb, cw, ch):
    """Exact row profiles of the dilated, content-clipped pixel set.

    Source pixel (x', y') covers dst in [p - grow_lt, p + grow_rb] per
    axis (OpenCV KxK dilate, K = 1 + niter, default center anchor — same
    convention ops/boxes.py uses for the analytic AABB dilation), so dst
    row y collects source rows y' in [y - grow_rb, y + grow_lt].
    """
    H, K = xmin.shape
    pmin = jnp.pad(xmin, ((_MAX_GROW, _MAX_GROW), (0, 0)), constant_values=_INF)
    pmax = jnp.pad(xmax, ((_MAX_GROW, _MAX_GROW), (0, 0)), constant_values=-_INF)
    pval = jnp.pad(rvalid, ((_MAX_GROW, _MAX_GROW), (0, 0)))

    lt = jnp.clip(grow_lt, 0, _MAX_GROW).astype(jnp.int32)
    rb = jnp.clip(grow_rb, 0, _MAX_GROW).astype(jnp.int32)
    grow_ok = (grow_lt <= _MAX_GROW) & (grow_rb <= _MAX_GROW)

    ds = jnp.arange(-_MAX_GROW, _MAX_GROW + 1, dtype=jnp.int32)
    dmask = (ds[:, None] >= -rb[None, :]) & (ds[:, None] <= lt[None, :])  # [D, K]

    # [D, H, K] stack of y-shifted profiles (static slices of the padding).
    smin = jnp.stack([pmin[_MAX_GROW + d: _MAX_GROW + d + H]
                      for d in range(-_MAX_GROW, _MAX_GROW + 1)])
    smax = jnp.stack([pmax[_MAX_GROW + d: _MAX_GROW + d + H]
                      for d in range(-_MAX_GROW, _MAX_GROW + 1)])
    sval = jnp.stack([pval[_MAX_GROW + d: _MAX_GROW + d + H]
                      for d in range(-_MAX_GROW, _MAX_GROW + 1)])

    m = dmask[:, None, :]
    dmin = jnp.min(jnp.where(m, smin, _INF), axis=0) - lt.astype(jnp.float32)
    dmax = jnp.max(jnp.where(m, smax, -_INF), axis=0) + rb.astype(jnp.float32)
    dval = jnp.any(sval & m, axis=0)

    ys = jnp.arange(H, dtype=jnp.int32)[:, None]
    dval = dval & (ys < ch)                      # clip rows at content edge
    dmin = jnp.maximum(dmin, 0.0)                # clip x at content edges
    dmax = jnp.minimum(dmax, cw.astype(jnp.float32) - 1.0)
    return dmin, dmax, dval, grow_ok


def _lower_chains(px, pv):
    """Monotone lower-hull chains over y-sorted profiles.

    px [B, H]: x per row (row index = y); pv [B, H] validity. Returns
    (hx [B, H], hy [B, H], cnt [B]): per batch element the hull chain of
    the points {(px[y], y) : pv[y]} that bounds the set from the LEFT
    (x as a function of y is the convex minorant). The right boundary of a
    set is the left boundary of its x-negation — callers double the batch.

    One lax.scan over rows; pops run in an amortized while_loop (total
    pops <= total pushes across the scan). All ops are [B]-vectorized.
    """
    B, H = px.shape
    ys = jnp.arange(H, dtype=jnp.float32)

    def cross(ox, oy, ax, ay, bx, by):
        # z of (A-O) x (B-O); coordinates are small ints in fp32 => exact.
        return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

    def step(carry, y):
        hx, hy, n = carry                      # [B,H], [B,H], [B] int32
        x = px[:, y]
        v = pv[:, y]
        yf = jnp.full((B,), ys[y])

        def pop_cond(c):
            hx, hy, n = c
            i1 = jnp.maximum(n - 1, 0)
            i2 = jnp.maximum(n - 2, 0)
            bi = jnp.arange(B)
            cr = cross(hx[bi, i2], hy[bi, i2], hx[bi, i1], hy[bi, i1], x, yf)
            # keep a LEFT boundary: pop while the new point makes the last
            # vertex non-essential (turn not strictly convex toward -x).
            return jnp.any(v & (n >= 2) & (cr >= 0))

        def pop_body(c):
            hx, hy, n = c
            i1 = jnp.maximum(n - 1, 0)
            i2 = jnp.maximum(n - 2, 0)
            bi = jnp.arange(B)
            cr = cross(hx[bi, i2], hy[bi, i2], hx[bi, i1], hy[bi, i1], x, yf)
            do = v & (n >= 2) & (cr >= 0)
            return hx, hy, jnp.where(do, n - 1, n)

        hx, hy, n = lax.while_loop(pop_cond, pop_body, (hx, hy, n))
        idx = jnp.where(v, n, H)               # OOB scatter index = drop
        bi = jnp.arange(B)
        hx = hx.at[bi, idx].set(x, mode="drop")
        hy = hy.at[bi, idx].set(yf, mode="drop")
        n = n + v.astype(jnp.int32)
        return (hx, hy, n), None

    init = (jnp.zeros((B, H), jnp.float32), jnp.zeros((B, H), jnp.float32),
            jnp.zeros((B,), jnp.int32))
    (hx, hy, cnt), _ = lax.scan(step, init, jnp.arange(H))
    return hx, hy, cnt


@partial(jax.jit, static_argnames=())
def min_area_rect_from_profiles(
    xmin: jnp.ndarray,
    xmax: jnp.ndarray,
    rvalid: jnp.ndarray,
    grow_lt: jnp.ndarray,
    grow_rb: jnp.ndarray,
    cw: jnp.ndarray,
    ch: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact min-area rotated rect per component from row profiles.

    xmin/xmax [H, K] fp32 row extents (+-inf on empty rows), rvalid [H, K],
    grow_lt/grow_rb [K] int32 dilation radii, cw/ch scalar content extent.

    Returns (corners [K, 4, 2] fp32 in (x, y), exact_ok [K] bool). Corner
    order matches ops/boxes._pca_corners: (umin,vmin), (umax,vmin),
    (umax,vmax), (umin,vmax) rotated back — a consistent winding for the
    perspective warp. Components that overflow the hull budget or the
    dilation-radius bound report exact_ok=False (caller falls back).
    """
    H, K = xmin.shape
    dmin, dmax, dval, grow_ok = _dilate_profiles(
        xmin, xmax, rvalid, grow_lt, grow_rb, cw, ch)

    # Doubled batch: [left profiles; negated right profiles].
    px = jnp.concatenate([dmin.T, -dmax.T], axis=0)          # [2K, H]
    pv = jnp.concatenate([dval.T, dval.T], axis=0)
    hx, hy, cnt = _lower_chains(px, pv)

    EB = min(H, _CHAIN_BUDGET)
    hx, hy = hx[:, :EB], hy[:, :EB]
    vmask = jnp.arange(EB)[None, :] < cnt[:, None]           # [2K, EB]
    overflow = cnt > EB

    # Un-mirror the right-chain block back to real x.
    sign = jnp.concatenate([jnp.ones((K,)), -jnp.ones((K,))])[:, None]
    rx = hx * sign                                            # [2K, EB]

    # Points per component: both chains' vertices. [K, P=2*EB]
    pxs = jnp.concatenate([rx[:K], rx[K:]], axis=1)
    pys = jnp.concatenate([hy[:K], hy[K:]], axis=1)
    pmask = jnp.concatenate([vmask[:K], vmask[K:]], axis=1)

    # Edge directions per component from consecutive chain vertices,
    # plus the axis direction (the Minkowski square's own edges and the
    # top/bottom row edges are axis-aligned). [K, E]
    def chain_edges(x, y, m):
        dx = x[:, 1:] - x[:, :-1]
        dy = y[:, 1:] - y[:, :-1]
        em = m[:, 1:] & m[:, :-1]
        return dx, dy, em

    dx_l, dy_l, em_l = chain_edges(rx[:K], hy[:K], vmask[:K])
    dx_r, dy_r, em_r = chain_edges(rx[K:], hy[K:], vmask[K:])
    ex = jnp.concatenate([dx_l, dx_r, jnp.ones((K, 1))], axis=1)
    ey = jnp.concatenate([dy_l, dy_r, jnp.zeros((K, 1))], axis=1)
    em = jnp.concatenate([em_l, em_r, jnp.ones((K, 1), bool)], axis=1)
    ln = jnp.sqrt(ex * ex + ey * ey)
    em = em & (ln > 0)
    ln = jnp.maximum(ln, 1e-12)
    c = ex / ln                                               # [K, E]
    s = ey / ln

    # Projection extents over the hull points for every edge direction.
    u = pxs[:, None, :] * c[:, :, None] + pys[:, None, :] * s[:, :, None]
    v = -pxs[:, None, :] * s[:, :, None] + pys[:, None, :] * c[:, :, None]
    pm = pmask[:, None, :]
    umin = jnp.min(jnp.where(pm, u, _INF), axis=2)            # [K, E]
    umax = jnp.max(jnp.where(pm, u, -_INF), axis=2)
    vmin = jnp.min(jnp.where(pm, v, _INF), axis=2)
    vmax = jnp.max(jnp.where(pm, v, -_INF), axis=2)
    area = jnp.where(em, (umax - umin) * (vmax - vmin), _INF)

    best = jnp.argmin(area, axis=1)                           # [K]
    bi = jnp.arange(K)
    bc, bs = c[bi, best], s[bi, best]
    u0, u1 = umin[bi, best], umax[bi, best]
    v0, v1 = vmin[bi, best], vmax[bi, best]

    def corner(uu, vv):
        return jnp.stack([uu * bc - vv * bs, uu * bs + vv * bc], axis=-1)

    corners = jnp.stack(
        [corner(u0, v0), corner(u1, v0), corner(u1, v1), corner(u0, v1)],
        axis=1,
    )
    has_pts = dval.any(axis=0)
    exact_ok = (grow_ok & has_pts & ~overflow[:K] & ~overflow[K:]
                & jnp.isfinite(corners).all(axis=(1, 2)))
    corners = jnp.where(jnp.isfinite(corners), corners, 0.0)
    return corners, exact_ok
