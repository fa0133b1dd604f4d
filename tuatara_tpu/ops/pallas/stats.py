"""Pallas kernel: fused per-component statistics in one pass.

Computes every reduction ops/boxes.py needs — row/column membership count
profiles for the full and reduced pixel sets, and the per-component peak
region score — in a single sweep over the label image, with the one-hot
membership tensor living only in VMEM (the XLA fallback path materializes /
re-streams [H, W, K]-shaped intermediates through HBM for each reduction).

Layout: grid (K/BK, H/BH) with the row dimension innermost, so the
column-profile / peak accumulator blocks for a given root tile stay resident
in VMEM across the whole row sweep (the standard revisited-output
accumulation pattern). Counts accumulate in fp32 (exact for < 2^24 pixels).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 8     # row-tile height (fp32/int32 sublane tile)
BK = 128   # root tile (lane width)


def _bk(K: int) -> int:
    """Root-tile width. 256 when it divides K: the label block is then
    loaded/compared against all roots in ONE grid pass (two lane register
    groups), measured ~1.5x faster than two BK=128 passes at the serving
    shape (512x384 labels, K=256, batch 16: 10.4 -> 6.7 ms)."""
    return 256 if K % 256 == 0 else BK


def _bh(H: int) -> int:
    """Row-tile height for the NOPEAK kernel. 32 when it divides H (every
    serving heatmap: the canvas buckets are 256-multiples, so H = canvas/2
    is a 128-multiple): 4x fewer grid steps amortize per-step overhead,
    measured ~5% faster on top of the 256-wide root tile (7.03 -> 6.66 ms
    at the serving shape, hardware-verified). The peak kernel keeps BH=8:
    it holds more [BH, W, BK]-sized live intermediates (member + the tn
    select on top of both membership tensors) and ~16 MB/core VMEM has no
    verified headroom for them at 32 rows."""
    return 32 if H % 32 == 0 else BH


def _kernel(labels_ref, tn_ref, keep_ref, roots_ref,
            row_ref, col_ref, rrow_ref, rcol_ref, peak_ref):
    i = pl.program_id(1)  # row tile (innermost)

    lab = labels_ref[...]                      # [BH, W] int32
    roots = roots_ref[...]                     # [1, BK] int32
    member = lab[:, :, None] == roots[0][None, None, :]    # [BH, W, BK]
    mf = member.astype(jnp.float32)

    row_ref[...] = jnp.sum(mf, axis=1)         # [BH, BK]

    keep = keep_ref[...].astype(jnp.float32)   # [BH, W]
    rf = mf * keep[:, :, None]
    rrow_ref[...] = jnp.sum(rf, axis=1)

    col_part = jnp.sum(mf, axis=0)             # [W, BK]
    rcol_part = jnp.sum(rf, axis=0)
    tn = tn_ref[...]
    peak_part = jnp.max(
        jnp.where(member, tn[:, :, None], jnp.float32(-1e30)), axis=(0, 1)
    )[None, :]                                 # [1, BK]

    @pl.when(i == 0)
    def _init():
        col_ref[...] = col_part
        rcol_ref[...] = rcol_part
        peak_ref[...] = peak_part

    @pl.when(i > 0)
    def _acc():
        col_ref[...] += col_part
        rcol_ref[...] += rcol_part
        peak_ref[...] = jnp.maximum(peak_ref[...], peak_part)


def _kernel_nopeak(labels_ref, keep_ref, roots_ref,
                   row_ref, col_ref, rrow_ref, rcol_ref):
    """Profile-only variant: when peak-text presence already rode the CC
    labeler as a min-propagated aux channel (ops/boxes.py hot_subsumes),
    every selected root is known to contain a >= text_threshold pixel, so
    the per-component peak — the kernel's most expensive channel (a
    [BH, W, BK] select + full max reduction) — is dead. The reduced-set
    membership is one masked compare (labels with non-keep pixels redirected
    to a sentinel) instead of a [BH, W, BK] multiply."""
    i = pl.program_id(1)  # row tile (innermost)

    lab = labels_ref[...]                      # [BH, W] int32
    keep = keep_ref[...]                       # [BH, W] int32 (0/1)
    roots = roots_ref[...]                     # [1, BK] int32
    rts = roots[0][None, None, :]
    mf = (lab[:, :, None] == rts).astype(jnp.float32)       # [BH, W, BK]
    lab_keep = jnp.where(keep != 0, lab, -3)
    rf = (lab_keep[:, :, None] == rts).astype(jnp.float32)  # [BH, W, BK]

    row_ref[...] = jnp.sum(mf, axis=1)         # [BH, BK]
    rrow_ref[...] = jnp.sum(rf, axis=1)
    col_part = jnp.sum(mf, axis=0)             # [W, BK]
    rcol_part = jnp.sum(rf, axis=0)

    @pl.when(i == 0)
    def _init():
        col_ref[...] = col_part
        rcol_ref[...] = rcol_part

    @pl.when(i > 0)
    def _acc():
        col_ref[...] += col_part
        rcol_ref[...] += rcol_part


@functools.partial(jax.jit, static_argnames=("interpret",))
def component_stats(
    labels: jnp.ndarray,
    tn: jnp.ndarray,
    keep: jnp.ndarray,
    roots: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One-pass component statistics.

    Args: labels [H, W] int32 (root index or -1), tn [H, W] fp32 normalized
    region map, keep [H, W] bool (reduced-set mask), roots [K] int32.

    Returns (row_cnt [H, K], col_cnt [W, K], rrow_cnt [H, K],
    rcol_cnt [W, K], peak [K]) — all fp32 counts.
    """
    H, W = labels.shape
    K = roots.shape[0]
    bk = _bk(K)
    bh = BH  # see _bh: the peak kernel's VMEM pressure keeps 8-row tiles
    assert H % bh == 0 and K % bk == 0, (H, K)

    grid = (K // bk, H // bh)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bh, W), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, W), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, W), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bh, bk), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, bk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, bk), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, bk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, K), jnp.float32),
            jax.ShapeDtypeStruct((W, K), jnp.float32),
            jax.ShapeDtypeStruct((H, K), jnp.float32),
            jax.ShapeDtypeStruct((W, K), jnp.float32),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
        ],
        interpret=interpret,
    )(labels, tn, keep.astype(jnp.int32), roots[None, :])
    row, col, rrow, rcol, peak = out
    return row, col, rrow, rcol, peak[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def component_stats_nopeak(
    labels: jnp.ndarray,
    keep: jnp.ndarray,
    roots: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """component_stats without the peak channel (see _kernel_nopeak).

    Returns (row_cnt [H, K], col_cnt [W, K], rrow_cnt [H, K],
    rcol_cnt [W, K]) — fp32 counts."""
    H, W = labels.shape
    K = roots.shape[0]
    bk = _bk(K)
    bh = _bh(H)
    assert H % bh == 0 and K % bk == 0, (H, K)

    grid = (K // bk, H // bh)
    out = pl.pallas_call(
        _kernel_nopeak,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bh, W), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, W), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bh, bk), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, bk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, bk), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, bk), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, K), jnp.float32),
            jax.ShapeDtypeStruct((W, K), jnp.float32),
            jax.ShapeDtypeStruct((H, K), jnp.float32),
            jax.ShapeDtypeStruct((W, K), jnp.float32),
        ],
        interpret=interpret,
    )(labels, keep.astype(jnp.int32), roots[None, :])
    return tuple(out)
