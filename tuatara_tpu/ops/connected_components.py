"""Connected-component labeling on TPU with fixed shapes.

TPU-native replacement for the reference's
`cv::connectedComponentsWithStats(..., 4)` call (tuatara.cpp:142). XLA has no
native CC op, so labeling is an iterative fixpoint entirely on device:

1. Seed every foreground pixel with its own linear index.
2. Repeat until no label changes (``lax.while_loop``; capped at
   ``max_iters``): a 4-neighbor min-propagation sweep followed by two
   pointer-jumping steps (``label <- label[label]``, path-halving a la
   Shiloach-Vishkin/FastSV), which collapses long chains in O(log diameter)
   rounds instead of O(diameter).
3. Compact root indices to dense component ids [0, K) with a cumsum — so
   downstream per-component statistics are fixed-size `segment_*` reductions.

Ordering note: dense ids are assigned in raster order of each component's
minimum linear index (~top-most pixel), which closely tracks OpenCV's label
order; the engine's output order matches the reference's detection order
(tuatara.cpp:277 order preserved from component enumeration) for typical
documents and is deterministic always.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2**30)


def _neighbor_min(label: jnp.ndarray, fg: jnp.ndarray) -> jnp.ndarray:
    """One 4-connected min-propagation sweep over the label image [H, W]."""
    pad = _BIG
    up = jnp.concatenate([label[1:], jnp.full_like(label[:1], pad)], axis=0)
    down = jnp.concatenate([jnp.full_like(label[:1], pad), label[:-1]], axis=0)
    left = jnp.concatenate([label[:, 1:], jnp.full_like(label[:, :1], pad)], axis=1)
    right = jnp.concatenate([jnp.full_like(label[:, :1], pad), label[:, :-1]], axis=1)
    m = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))
    m = jnp.minimum(m, label)
    return jnp.where(fg, m, _BIG)


def label_components(
    mask: jnp.ndarray, max_iters: int = 64
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """4-connected CC labeling of a boolean mask [H, W].

    Returns (labels [H, W] int32, iters): labels hold the component's root
    linear index for foreground pixels and -1 for background.
    """
    h, w = mask.shape
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    label0 = jnp.where(mask, idx, _BIG)

    def body(state):
        label, _, it = state
        new = _neighbor_min(label, mask)
        # Pointer jumping: label[p] <- label[label[p]] (twice). Background
        # (_BIG) must not index the gather; clamp and re-mask.
        flat = new.reshape(-1)
        safe = jnp.where(flat >= h * w, 0, flat)
        for _ in range(2):
            flat = jnp.where(mask.reshape(-1), jnp.take(flat, safe), _BIG)
            safe = jnp.where(flat >= h * w, 0, flat)
        new = flat.reshape(h, w)
        changed = jnp.any(new != label)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    label, _, iters = jax.lax.while_loop(
        cond, body, (label0, jnp.bool_(True), jnp.int32(0))
    )
    return jnp.where(mask, label, -1), iters


def compact_labels(
    labels: jnp.ndarray, max_components: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map root-index labels to dense component ids.

    Returns (comp_id [H, W] int32 in [0, K) for foreground, -1 elsewhere;
    num_components). Components beyond `max_components` keep ids >= K and are
    dropped by downstream segment reductions (out-of-range segment ids are
    discarded), mirroring the fixed box budget.
    """
    h, w = labels.shape
    flat = labels.reshape(-1)
    fg = flat >= 0
    is_root = fg & (flat == jnp.arange(h * w, dtype=jnp.int32))
    dense_of_pos = jnp.cumsum(is_root.astype(jnp.int32)) - 1  # id at root pos
    safe = jnp.where(fg, flat, 0)
    comp = jnp.where(fg, jnp.take(dense_of_pos, safe), -1)
    return comp.reshape(h, w), jnp.sum(is_root.astype(jnp.int32))
