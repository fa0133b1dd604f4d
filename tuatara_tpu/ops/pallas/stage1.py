"""Pallas kernel: fused conv3x3 + ReLU + 2x2 maxpool (CRAFT stage-1 tail).

Why: stage 1 is the detector's layout-bound tail. At serving shapes
(batch-16, 1024x768 canvas) XLA runs conv1_2 at ~39% MFU (~12 ms/batch —
its cout=64 fills half the MXU's 128 output lanes) and then pool1 re-streams
the 1.6 GB full-resolution activation through HBM (~6 ms) just to halve it.
This kernel computes conv1_2 + bias + ReLU + 2x2/2 maxpool in one pass: the
conv output tile never leaves VMEM, and the pooled result is the only write.

Design: **pack-2 im2col over column pairs**. The caller packs the padded
input to [B, H+2, (W+2)/2, 2*C] — a pure XLA reshape whose lane dim is
exactly 128 for C=64, so every DMA slice and scratch store is tile-aligned
(Mosaic constraints observed while building this: lane-concat of
sublane-shifted vectors, compound sublane<->lane reshape casts, and
non-128-lane HBM DMA slices are all unsupported — this layout needs none of
them). For output column pair (2j2, 2j2+1), the 3x3 taps cover input
columns 2j2-1..2j2+2 == packed columns j2 and j2+1 IN FULL — so the im2col
is six full-lane-width staged stores per row sub-tile, contraction depth
12*C (=768: six full MXU lane tiles), output lanes (column-parity, channel)
= 2*O = 128 (full). The horizontal pool max is then a free lane-half select
and the vertical pool max a static row-chunk pair.

FLOPs rise 1.33x (the packed kernel's zero slots) but output-lane
utilization doubles and the pool + activation round-trips vanish:
conv1_2 + pool1 measured 12.1 + 5.6 -> ~7 ms/batch class.

Numerics: bf16 inputs/weights, fp32 accumulation (preferred_element_type),
fp32 bias+ReLU — the same dtype chain as the XLA path (L.conv2d at
compute_dtype=bf16); only the accumulation ORDER differs, so results agree
to bf16 rounding, not bit-exactly (gated to the bf16 serving path;
compute_dtype=float32 keeps the XLA convs — PARITY.md's bit-stable
surface).

Reference: this replaces part of the first VGG16-BN stage of the CRAFT
trunk the reference runs inside its opaque TorchScript artifact
(tuatara.cpp:333-336).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack2_w(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C, O] -> [12C, 2*O] for the packed conv.

    Patch slot (kh, m, ci) holds input column 2*j2 + m for m in
    {-1, 0, 1, 2}; output lane (a, o) is column 2*j2 + a; tap kx = m - a + 1
    maps into the 3x3 kernel; out-of-range slots are zero. Gather + mask
    only — an einsum against a 0/1 selector runs on the MXU in reduced
    precision and corrupts weights (measured; see craft._pack4_conv_w)."""
    C, O = w.shape[2], w.shape[3]
    kxm = np.zeros((4, 2), np.int32)  # [m_idx, a]; m = m_idx - 1
    for mi in range(4):
        for a in range(2):
            kxm[mi, a] = (mi - 1) - a + 1
    valid = jnp.asarray((kxm >= 0) & (kxm <= 2))
    kxc = jnp.asarray(np.clip(kxm, 0, 2))
    wp = w[:, kxc]  # [3, 4, 2, C, O] order (kh, m, a, ci, o)
    wp = jnp.where(valid[None, :, :, None, None], wp, jnp.zeros((), w.dtype))
    wp = wp.transpose(0, 1, 3, 2, 4)  # (kh, m, ci, a, o)
    return wp.reshape(12 * C, 2 * O)


def _kernel(x_hbm, w_ref, b_ref, out_ref, slab, sem,
            *, rt: int, w: int, c: int, o: int, sub: int):
    bi = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    r0 = t * rt
    w2h = w // 2  # packed (column-pair) width

    # Haloed row slab of the packed padded input: output rows [r0, r0+rt)
    # need input rows r0-1..r0+rt, i.e. padded rows r0..r0+rt+2 (tiles
    # overlap by 2 rows — BlockSpec blocks cannot overlap, hence manual
    # DMA). Double-buffered: tile t's copy was started at step t-1, so the
    # transfer hides under the previous tile's compute.
    def get_dma(slot, ti):
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(ti * rt, rt + 2)], slab.at[slot], sem.at[slot])

    @pl.when(t == 0)
    def _warmup():
        get_dma(0, 0).start()

    @pl.when(t + 1 < nt)
    def _prefetch():
        get_dma((t + 1) % 2, t + 1).start()

    get_dma(t % 2, t).wait()
    cur = slab.at[t % 2]

    chunks = []
    for s in range(0, rt, sub):
        # For output col pair j2, the 3x3 taps over input columns
        # 2j2-1..2j2+2 are EXACTLY packed columns j2 and j2+1 (the input has
        # 1 col of zero pad, so packed col p = input cols 2p-1, 2p). Six
        # full-tile matmuls (K = 2C = 128 for the full-width stage) summed
        # in fp32 — no im2col buffer, no staging copies (an explicit
        # [M, 12C] patch matrix measured SLOWER: the scratch round-trip of
        # ~5 MB/sub-tile dominated). Weight row-chunk order (kh, m, ci)
        # matches _pack2_w.
        y = None
        for di in range(3):
            rows = cur[s + di:s + di + sub]  # [sub, wp8, 2c]
            base = di * 4 * c
            for dp in range(2):
                piece = rows[:, dp:dp + w2h, :].reshape(sub * w2h, 2 * c)
                part = jnp.dot(
                    piece,
                    w_ref[base + dp * 2 * c:base + (dp + 1) * 2 * c, :],
                    preferred_element_type=jnp.float32)
                y = part if y is None else y + part
        y = jnp.maximum(y + b_ref[...], 0.0)  # [sub*w2h, 2*o]
        # Horizontal pool max: the two column-parity lane halves.
        hm = jnp.maximum(y[:, :o], y[:, o:])  # [sub*w2h, o]
        # Vertical pool max: consecutive row chunks of the flat output.
        vm = [jnp.maximum(hm[(2 * k) * w2h:(2 * k + 1) * w2h],
                          hm[(2 * k + 1) * w2h:(2 * k + 2) * w2h])
              for k in range(sub // 2)]
        chunks.append(
            jnp.concatenate(vm, axis=0).reshape(sub // 2, w2h, o)
            .astype(jnp.bfloat16))
    out_ref[0] = jnp.concatenate(chunks, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_conv_pool(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """conv3x3(w, b) + ReLU + maxpool2x2(stride 2), fused.

    Args: x [B, H, W, C] float (activations, e.g. relu(conv1_1) output);
    w [3, 3, C, O]; b [O]. H % 16 == 0, W % 2 == 0.
    Returns pooled [B, H/2, W/2, O] bf16.
    """
    B, H, W, C = x.shape
    O = w.shape[3]
    RT = 64 if H % 64 == 0 else 16
    SUB = 8
    assert H % RT == 0 and W % 2 == 0, (H, W)
    xpad = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)))
    # Pack column pairs into lanes: [B, H+2, (W+2)/2, 2C] (pure reshape),
    # then pad the packed-column dim to a multiple of 8 — the kernel's slab
    # DMA slices HBM along it and Mosaic requires tile-aligned slice shapes.
    # The kernel never reads the extra zero columns.
    wp = (W + 2) // 2
    wp8 = -(-wp // 8) * 8
    xpk = xpad.reshape(B, H + 2, wp, 2 * C)
    if wp8 != wp:
        xpk = jnp.pad(xpk, ((0, 0), (0, 0), (0, wp8 - wp), (0, 0)))
    wf = _pack2_w(w.astype(jnp.bfloat16))
    bf = jnp.concatenate([b, b]).astype(jnp.float32).reshape(1, 2 * O)

    return pl.pallas_call(
        functools.partial(_kernel, rt=RT, w=W, c=C, o=O, sub=SUB),
        grid=(B, H // RT),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # whole xpk stays in HBM
            pl.BlockSpec((12 * C, 2 * O), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * O), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RT // 2, W // 2, O),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, O), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, RT + 2, wp8, 2 * C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xpk, wf, bf)
