"""Connected-component labeling on TPU with fixed shapes — gather-free.

TPU-native replacement for the reference's
`cv::connectedComponentsWithStats(..., 4)` call (tuatara.cpp:142). XLA has no
native CC op; the classic label-propagation + pointer-jumping formulation is
gather-heavy, and large gathers serialize badly on TPU. Instead, labels
propagate with *segmented min-scans*:

1. Seed every foreground pixel with its own linear index.
2. One sweep = a forward+backward segmented min-scan along rows, then along
   columns (`jax.lax.associative_scan`, log-depth, pure VPU work). A single
   sweep collapses every horizontal/vertical run to its minimum label, so
   convergence takes O(#bends) sweeps — 2-4 for text-shaped blobs — inside a
   `lax.while_loop` with a change test, capped at `max_iters`.
3. Component extraction: a root is a pixel whose label equals its own index;
   the K raster-first roots come from one `top_k` over the label image —
   matching OpenCV's raster label order — and downstream stats compare
   against root *values* directly (ops/boxes.py), so no per-pixel gather or
   scatter ever happens.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Python int, not a jnp scalar: module-level jnp constants would initialize
# a device backend at import time.
_BIG = 2**30


def _topk_chunked(scores: jnp.ndarray, k: int, chunks: int = 16) -> jnp.ndarray:
    """top_k values of a flat [n] array via a two-stage reduction.

    XLA's top_k sorts the whole operand; at heatmap sizes (~200k elements
    per page) that sort is one of the larger postproc ops (~0.2 ms/page).
    Taking the per-chunk top-k first shrinks the final sort to chunks*k
    elements — exact, since the global top-k is a subset of the union of
    chunk top-ks. Falls back to plain top_k when the shape doesn't split.
    """
    n = scores.shape[0]
    if chunks <= 1 or n % chunks or n // chunks < k:
        return jax.lax.top_k(scores, k)[0]
    per, _ = jax.lax.top_k(scores.reshape(chunks, n // chunks), k)
    return jax.lax.top_k(per.reshape(-1), k)[0]


def _seg_min_scan(label: jnp.ndarray, fg: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Min-propagate labels within contiguous foreground runs along `axis`.

    Segmented scan: a background pixel resets the segment. Forward and
    backward passes give every pixel the min label of its whole run.
    """

    def combine(a, b):
        av, af = a
        bv, bf = b
        # af/bf: "segment continues through my left edge" flags.
        v = jnp.where(bf, jnp.minimum(av, bv), bv)
        return v, af & bf

    fwd, _ = jax.lax.associative_scan(combine, (label, fg), axis=axis)
    bwd, _ = jax.lax.associative_scan(combine, (label, fg), axis=axis, reverse=True)
    out = jnp.minimum(fwd, bwd)
    return jnp.where(fg, out, _BIG)


def label_components(
    mask: jnp.ndarray, max_iters: int = 64
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """4-connected CC labeling of a boolean mask [H, W].

    Returns (labels [H, W] int32, sweeps): labels hold the component's root
    linear index (its raster-first pixel) for foreground, -1 for background.
    """
    h, w = mask.shape
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    label0 = jnp.where(mask, idx, _BIG)

    def body(state):
        label, _, it = state
        new = _seg_min_scan(label, mask, axis=1)
        new = _seg_min_scan(new, mask, axis=0)
        return new, jnp.any(new != label), it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    label, _, iters = jax.lax.while_loop(
        cond, body, (label0, jnp.bool_(True), jnp.int32(0))
    )
    return jnp.where(mask, label, -1), iters


def label_components_aux(
    mask: jnp.ndarray, aux: jnp.ndarray, max_iters: int = 64
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """label_components + a second min-propagated channel (XLA fallback of
    ops/pallas/cc.label_components_pallas_aux).

    Returns (labels, auxmin, sweeps): auxmin[y, x] = min linear index of the
    aux pixels in (y, x)'s component, >= 2**30 if none. The fixpoint watches
    both channels — aux flooding can lag label convergence by a sweep."""
    h, w = mask.shape
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    label0 = jnp.where(mask, idx, _BIG)
    aux0 = jnp.where(mask & aux, idx, _BIG)

    def one(v):
        v = _seg_min_scan(v, mask, axis=1)
        return _seg_min_scan(v, mask, axis=0)

    def body(state):
        lab, av, _, it = state
        nl, na = one(lab), one(av)
        return nl, na, jnp.any(nl != lab) | jnp.any(na != av), it + 1

    def cond(state):
        _, _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    lab, av, _, iters = jax.lax.while_loop(
        cond, body, (label0, aux0, jnp.bool_(True), jnp.int32(0))
    )
    return jnp.where(mask, lab, -1), av, iters


def area_ok(labels: jnp.ndarray, min_area: int) -> jnp.ndarray:
    """[H, W] bool: pixel's component has area >= min_area, scatter-free.

    XLA fallback of ops/pallas/cc.area_ok_pallas — same windowed same-label
    count (BFS ball property; see that kernel's docstring for the proof and
    the 2*min_area-1 <= min(H, W) validity condition). NOTE: outside the
    Pallas path this streams (2*min_area-1)^2-1 full-image passes through
    HBM — the scatter-add histogram in component_roots_filtered is cheaper
    there, so the hot path only uses this on TPU (ops/boxes.py)."""
    h, w = labels.shape
    fg = labels >= 0
    count = fg.astype(jnp.int32)
    r = min_area - 1
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            s = jnp.roll(labels, (dy, dx), axis=(0, 1))
            count = count + ((s == labels) & fg).astype(jnp.int32)
    return count >= min_area


def component_roots(labels: jnp.ndarray, max_components: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The raster-first `max_components` component root indices.

    Returns (roots [K] int32 — the component's min linear index, or
    out-of-range sentinel for empty slots — and num_components). Components
    beyond the budget (later in raster order) are dropped, mirroring the
    fixed box budget. Matches OpenCV's label ordering (first-pixel raster
    order).
    """
    h, w = labels.shape
    flat = labels.reshape(-1)
    fg = flat >= 0
    is_root = fg & (flat == jnp.arange(h * w, dtype=jnp.int32))
    n = jnp.sum(is_root.astype(jnp.int32))
    # top_k of negated index over roots -> K smallest root indices, ascending.
    scores = jnp.where(is_root, -flat, -_BIG)
    k = min(max_components, h * w)
    top = _topk_chunked(scores, k)
    roots = jnp.where(top > -_BIG, -top, _BIG)
    if k < max_components:
        roots = jnp.concatenate(
            [roots, jnp.full((max_components - k,), _BIG, jnp.int32)]
        )
    return roots, n


def component_roots_filtered(
    labels: jnp.ndarray,
    max_components: int,
    min_area: int,
    hot: Optional[jnp.ndarray] = None,
    keep: Optional[jnp.ndarray] = None,
    hot_implies_keep: bool = True,
    hot_min: Optional[jnp.ndarray] = None,
    area_ok_map: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raster-first roots of components that PASS the reference filters.

    `component_roots` spends budget slots on components in raw raster order,
    so on noisy maps sub-threshold specks can exhaust the budget before real
    text components are reached (a dense page can have thousands of raw
    components vs a 256-box budget — the reference has no budget because its
    host loop visits every component, tuatara.cpp:145-154). Here the
    filters run BEFORE selection: one scatter-add accumulates per-raw-
    component (area, reduced-pixel count, hot-pixel count) keyed by the root
    index each label already carries, and only components with
    area >= min_area, a non-empty reduced set, and at least one `hot` pixel
    (max text score >= threshold, exactly the reference's minMaxLoc test)
    compete for the K slots. Downstream one-hot stats then recompute exact
    extents for just those K.

    hot/keep: [H, W] bool pixel masks (tn >= text_threshold, and the
    non-link-only reduced set). Returns (roots [K], num_raw_components).
    """
    h, w = labels.shape
    n = h * w
    flat = labels.reshape(-1)
    fg = flat >= 0
    idx = jnp.arange(n, dtype=jnp.int32)
    is_root = fg & (flat == idx)
    n_raw = jnp.sum(is_root.astype(jnp.int32))

    tgt = jnp.where(fg, flat, n)  # background -> overflow row
    if area_ok_map is not None:
        # Scatter-free windowed-count filter (area_ok / area_ok_pallas).
        area_pass = area_ok_map.reshape(-1)
    else:
        # True count via one [n]-scatter-add (a single scatter with a
        # trailing stats dim is ~6x slower on TPU).
        area = jnp.zeros((n + 1,), jnp.int32).at[tgt].add(1)[:n]
        area_pass = area >= min_area
    if hot_min is not None:
        # Presence came min-propagated alongside CC labeling (the aux channel
        # of label_components_aux / the Pallas kernel): hot_min < BIG at any
        # member pixel — in particular at the root — iff the component
        # contains a hot pixel. Requires hot_implies_keep (see below);
        # replaces a ~1.7 ms/page scatter-max with ~0.1 ms of extra VMEM
        # sweeps.
        present = hot_min.reshape(-1) < _BIG
    elif hot_implies_keep:
        # hot (tn >= text_threshold) implies keep (non-link-only) whenever
        # text_threshold >= low_text — true for the reference defaults and
        # any sane config — so presence packs into ONE 0/1/2 max field:
        # max == 2 <=> some hot pixel (which also implies a keep pixel);
        # the keep filter is then subsumed.
        hot_f = hot.reshape(-1) & fg
        keep_f = keep.reshape(-1) & fg
        pres = hot_f.astype(jnp.int32) + keep_f.astype(jnp.int32)
        bits = jnp.zeros((n + 1,), jnp.int32).at[tgt].max(pres)[:n]
        present = bits == 2
    else:
        hot_f = hot.reshape(-1) & fg
        keep_f = keep.reshape(-1) & fg
        hotp = jnp.zeros((n + 1,), jnp.int32).at[tgt].max(hot_f.astype(jnp.int32))[:n]
        keepp = jnp.zeros((n + 1,), jnp.int32).at[tgt].max(keep_f.astype(jnp.int32))[:n]
        present = (hotp > 0) & (keepp > 0)
    # Root pixel i holds its own component's stats — no gather needed.
    ok = is_root & area_pass & present

    scores = jnp.where(ok, -flat, -_BIG)
    k = min(max_components, n)
    top = _topk_chunked(scores, k)
    roots = jnp.where(top > -_BIG, -top, _BIG)
    if k < max_components:
        roots = jnp.concatenate(
            [roots, jnp.full((max_components - k,), _BIG, jnp.int32)]
        )
    return roots, n_raw


def compact_labels(
    labels: jnp.ndarray, max_components: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense component ids per pixel (compat helper for tests/diagnostics).

    The hot path (ops/boxes.py) avoids this entirely by comparing labels to
    `component_roots` values; this materializes the same mapping as a
    [H, W] id image: comp_id in [0, K) for the first K raster-ordered
    components, -1 for background, K for over-budget components.
    """
    h, w = labels.shape
    roots, n = component_roots(labels, max_components)
    eq = labels[..., None] == roots[None, None, :]  # [H, W, K]
    comp = jnp.where(
        eq.any(-1), jnp.argmax(eq, -1), jnp.where(labels >= 0, max_components, -1)
    )
    return comp.astype(jnp.int32), n
