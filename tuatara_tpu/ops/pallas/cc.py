"""Pallas kernel: connected-component labeling entirely in VMEM.

The XLA fallback (ops/connected_components.py) converges in a few segmented
min-scan sweeps, but every sweep round-trips the label image through HBM and
pays `lax.while_loop` dispatch latency. At CRAFT's heatmap size (512x512 for
the reference 1024 canvas) the whole problem fits in VMEM (~1 MB per array),
so this kernel runs the entire fixpoint on-chip:

* one sweep = forward+backward *doubling* segmented min along lanes (W) then
  sublanes (H): after step k, each pixel holds the min label over the
  2^(k+1)-neighborhood of its contiguous foreground run (`pltpu.roll` +
  reach-flag masking, log2(N) steps per direction — no gathers, no scans);
* sweeps repeat under an in-kernel `lax.while_loop` until no label changes
  (or `max_iters`), with the change test a cheap VMEM reduction;
* outputs: labels (root linear index, -1 background) + sweep count, same
  contract as the XLA path, verified equal in tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Plain Python int: a jnp scalar here would be captured as a constant by the
# kernel closure, which pallas_call rejects.
_BIG = 2**30


def _doubling_min(v, fg, axis: int, size: int, reverse: bool):
    """Min label over each pixel's contiguous fg run prefix (or suffix).

    Reach flags are carried as int32 (Mosaic's rotate has no i1 support).
    """
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
    reach = fg.astype(jnp.int32)
    d = 1
    while d < size:
        # circular roll by size-d == roll by -d (avoid negative shifts)
        shift = (size - d) if reverse else d
        v_s = pltpu.roll(v, shift, axis=axis)
        r_s = pltpu.roll(reach, shift, axis=axis)
        # Invalidate wrapped positions.
        ok = (idx >= d) if not reverse else (idx < size - d)
        take = (reach * r_s) * ok.astype(jnp.int32)
        v = jnp.where(take > 0, jnp.minimum(v, v_s), v)
        reach = take
        d *= 2
    return v


def _cc_kernel(mask_ref, labels_ref, iters_ref, *, h: int, w: int, max_iters: int):
    fg = mask_ref[...] != 0
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    labels0 = jnp.where(fg, idx, _BIG)

    def sweep(lab):
        a = _doubling_min(lab, fg, axis=1, size=w, reverse=False)
        b = _doubling_min(lab, fg, axis=1, size=w, reverse=True)
        lab = jnp.where(fg, jnp.minimum(a, b), _BIG)
        a = _doubling_min(lab, fg, axis=0, size=h, reverse=False)
        b = _doubling_min(lab, fg, axis=0, size=h, reverse=True)
        return jnp.where(fg, jnp.minimum(a, b), _BIG)

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        lab, _, it = state
        new = sweep(lab)
        return new, jnp.any(new != lab), it + 1

    lab, _, iters = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), jnp.int32(0))
    )
    labels_ref[...] = jnp.where(fg, lab, -1)
    iters_ref[0, 0] = iters


@functools.partial(jax.jit, static_argnames=("max_iters", "interpret"))
def label_components_pallas(
    mask: jnp.ndarray, max_iters: int = 64, interpret: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops.connected_components.label_components
    when the heatmap fits in VMEM (h*w <= ~1M pixels)."""
    h, w = mask.shape
    labels, iters = pl.pallas_call(
        functools.partial(_cc_kernel, h=h, w=w, max_iters=max_iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(mask.astype(jnp.int32))
    return labels, iters[0, 0]


def _area_ok_kernel(labels_ref, out_ref, *, h: int, w: int, min_area: int):
    """Exact small-component filter without a scatter histogram.

    BFS ball property: in a connected component with area >= m, the ball of
    4-connected radius m-1 around ANY pixel holds >= m member pixels; with
    area < m the whole component fits inside it. Chebyshev distance lower-
    bounds nothing here — it UPPER-bounds path distance, so the
    (2m-1)x(2m-1) window contains the ball. Counting same-label pixels in
    that window therefore gives: count >= m  <=>  area >= m, exactly.
    Circular rolls may pull in same-component pixels from across the image
    edge; as long as 2m-1 <= min(H, W) each member pixel is counted at most
    once (distinct offsets stay distinct mod the dimension), so wrap only
    pushes count toward the true area and cannot flip the test. When the
    window EXCEEDS a dimension, offsets alias and pixels double-count —
    callers must not use this filter then (ops/boxes.py gates on it).
    4*(m-1)*m + 1 rolls of VMEM-resident labels replace a ~1.4 ms/page
    HBM scatter-add."""
    lab = labels_ref[...]
    fg = (lab >= 0).astype(jnp.int32)
    r = min_area - 1
    count = fg  # the center pixel itself
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            s = lab
            if dy:
                s = pltpu.roll(s, dy % h, axis=0)
            if dx:
                s = pltpu.roll(s, dx % w, axis=1)
            count = count + ((s == lab) & (lab >= 0)).astype(jnp.int32)
    out_ref[...] = (count >= min_area).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("min_area", "interpret"))
def area_ok_pallas(
    labels: jnp.ndarray, min_area: int, interpret: bool = False
) -> jnp.ndarray:
    """[H, W] bool: pixel's component has area >= min_area (see kernel)."""
    h, w = labels.shape
    out = pl.pallas_call(
        functools.partial(_area_ok_kernel, h=h, w=w, min_area=min_area),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(48 * 1024 * 1024, 32 * h * w)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=interpret,
    )(labels)
    return out != 0


def _cc_aux_kernel(mask_ref, aux_ref, labels_ref, auxmin_ref, iters_ref,
                   *, h: int, w: int, max_iters: int):
    """CC labeling + a second min-propagated channel in one fixpoint.

    The aux channel is seeded with the pixel index where `aux` is set (BIG
    elsewhere) and min-flooded over the SAME component connectivity, so after
    convergence every pixel of a component holds the min index of the
    component's aux pixels — `auxmin < BIG` is a per-component "contains an
    aux pixel" test read at any member pixel (ops/boxes.py uses it as the
    peak-text presence pre-filter, replacing an expensive HBM scatter-max).
    The change test watches BOTH channels: aux flooding can need a sweep or
    two more than labels (its source pixel may sit farther from the run
    structure than the root)."""
    fg = mask_ref[...] != 0
    hot = aux_ref[...] != 0
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    labels0 = jnp.where(fg, idx, _BIG)
    aux0 = jnp.where(fg & hot, idx, _BIG)

    def sweep(v):
        a = _doubling_min(v, fg, axis=1, size=w, reverse=False)
        b = _doubling_min(v, fg, axis=1, size=w, reverse=True)
        v = jnp.where(fg, jnp.minimum(a, b), _BIG)
        a = _doubling_min(v, fg, axis=0, size=h, reverse=False)
        b = _doubling_min(v, fg, axis=0, size=h, reverse=True)
        return jnp.where(fg, jnp.minimum(a, b), _BIG)

    def cond(state):
        _, _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        lab, av, _, it = state
        new_lab = sweep(lab)
        new_av = sweep(av)
        changed = jnp.any(new_lab != lab) | jnp.any(new_av != av)
        return new_lab, new_av, changed, it + 1

    lab, av, _, iters = jax.lax.while_loop(
        cond, body, (labels0, aux0, jnp.bool_(True), jnp.int32(0))
    )
    labels_ref[...] = jnp.where(fg, lab, -1)
    auxmin_ref[...] = av
    iters_ref[0, 0] = iters


@functools.partial(jax.jit, static_argnames=("max_iters", "interpret"))
def label_components_pallas_aux(
    mask: jnp.ndarray,
    aux: jnp.ndarray,
    max_iters: int = 64,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """label_components_pallas + per-component aux-presence min channel.

    Returns (labels, auxmin, iters): auxmin[y, x] is the min linear index of
    the aux pixels in (y, x)'s component, or >= 2**30 when the component has
    none (background is always >= 2**30)."""
    h, w = mask.shape
    # Two propagated channels double the fixpoint's live temporaries; the
    # default 16 MiB scoped-vmem budget OOMs at 512x384 (needs ~24 MiB) —
    # well within the part's physical VMEM, so raise the soft limit.
    labels, auxmin, iters = pl.pallas_call(
        functools.partial(_cc_aux_kernel, h=h, w=w, max_iters=max_iters),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(48 * 1024 * 1024, 32 * h * w)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(mask.astype(jnp.int32), aux.astype(jnp.int32))
    return labels, auxmin, iters[0, 0]
