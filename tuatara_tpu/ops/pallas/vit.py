"""Fused ViT encoder blocks as a Pallas TPU kernel.

Why: the PARSEQ recognizer's ViT-S encoder dominates the dense-page serving
budget (~0.107 of 0.145 ms/crop, BENCH_r04) at ~27% MFU under XLA — the
matmuls are MXU-friendly but every block pays separate HBM round-trips for
LN -> qkv -> attention -> proj -> LN -> MLP tensors (the residual stream
alone is fp32 [N,128,384] ~25 MB per pass at N=256). This kernel keeps a
tile of crops' activations in VMEM across SEVERAL blocks: per grid step it
loads [TB, S, D] once, runs `blocks_per_call` full transformer blocks
(pre-norm LN, fused-QKV projection, per-crop attention, output projection,
MLP with tanh-approx GELU — Mosaic lowers no erf; ~5e-4 max abs err vs the
XLA path's exact GELU, below bf16 resolution), and writes once. Block
weights use constant index maps, so Pallas DMAs them into VMEM once for
the whole grid, not per step.

Numerics: residual stream fp32 (same as the XLA path, where bf16 matmul
outputs are added into an fp32 stream), matmuls bf16-in/fp32-accumulate,
LN and softmax fp32. NOT bit-identical to the XLA lowering (fusion/
accumulation order differs ~1e-2 relative in bf16) — serving opt-in via
ParseqConfig.encoder_impl="pallas", default remains the XLA path; parity
mode (fp32 compute) always uses XLA.

Reference analog: none — the reference runs its encoder inside an opaque
TorchScript artifact on CPU threads (/root/reference/tuatara.cpp:450-475).
This is the TPU-native speed-of-light path for the same math.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]


def stack_vit_block_weights(blocks: List[Params]) -> Dict[str, jnp.ndarray]:
    """Stack per-block ViT weights into leading-block-dim arrays for the
    kernel, fusing q/k/v into one [D, 3D] projection (bit-identical — each
    output column is an independent dot product; see layers.fuse_mha_qkv).
    Weights are cast to bf16 (the kernel's matmul input dtype); LN
    parameters stay fp32."""
    def cat_qkv(attn):
        if "qkv" in attn:  # already fused
            return attn["qkv"]["w"], attn["qkv"].get("b")
        w = jnp.concatenate([attn["q"]["w"], attn["k"]["w"], attn["v"]["w"]],
                            axis=1)
        b = None
        if "b" in attn["q"]:
            b = jnp.concatenate([attn["q"]["b"], attn["k"]["b"],
                                 attn["v"]["b"]])
        return w, b

    qkv_w, qkv_b, o_w, o_b = [], [], [], []
    f1_w, f1_b, f2_w, f2_b = [], [], [], []
    ln1_g, ln1_b, ln2_g, ln2_b = [], [], [], []
    for blk in blocks:
        w, b = cat_qkv(blk["attn"])
        qkv_w.append(w)
        qkv_b.append(b if b is not None else jnp.zeros((w.shape[1],)))
        o_w.append(blk["attn"]["o"]["w"])
        o_b.append(blk["attn"]["o"].get(
            "b", jnp.zeros((blk["attn"]["o"]["w"].shape[1],))))
        f1_w.append(blk["mlp"]["fc1"]["w"])
        f1_b.append(blk["mlp"]["fc1"].get(
            "b", jnp.zeros((blk["mlp"]["fc1"]["w"].shape[1],))))
        f2_w.append(blk["mlp"]["fc2"]["w"])
        f2_b.append(blk["mlp"]["fc2"].get(
            "b", jnp.zeros((blk["mlp"]["fc2"]["w"].shape[1],))))
        ln1_g.append(blk["norm1"]["scale"])
        ln1_b.append(blk["norm1"]["bias"])
        ln2_g.append(blk["norm2"]["scale"])
        ln2_b.append(blk["norm2"]["bias"])

    bf = jnp.bfloat16
    return {
        "qkv_w": jnp.stack(qkv_w).astype(bf),
        "qkv_b": jnp.stack(qkv_b).astype(jnp.float32),
        "o_w": jnp.stack(o_w).astype(bf),
        "o_b": jnp.stack(o_b).astype(jnp.float32),
        "f1_w": jnp.stack(f1_w).astype(bf),
        "f1_b": jnp.stack(f1_b).astype(jnp.float32),
        "f2_w": jnp.stack(f2_w).astype(bf),
        "f2_b": jnp.stack(f2_b).astype(jnp.float32),
        "ln1_g": jnp.stack(ln1_g).astype(jnp.float32),
        "ln1_b": jnp.stack(ln1_b).astype(jnp.float32),
        "ln2_g": jnp.stack(ln2_g).astype(jnp.float32),
        "ln2_b": jnp.stack(ln2_b).astype(jnp.float32),
    }


def _ln(x32, g, b, eps):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * g + b


def _vit_blocks_kernel(
    x_ref, qkv_w, qkv_b, o_w, o_b, f1_w, f1_b, f2_w, f2_b,
    ln1_g, ln1_b, ln2_g, ln2_b, out_ref,
    *, n_blocks: int, heads: int, eps: float, tb: int, s: int, d: int,
):
    hd = d // heads
    scale = 1.0 / math.sqrt(hd)
    m = tb * s
    x = x_ref[:].astype(jnp.float32).reshape(m, d)  # residual stream, fp32

    for blk in range(n_blocks):
        # --- attention ---
        h = _ln(x, ln1_g[blk], ln1_b[blk], eps).astype(jnp.bfloat16)
        qkv = jax.lax.dot_general(
            h, qkv_w[blk], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + qkv_b[blk]  # [m, 3d] fp32
        # Per-crop, per-head attention, folding (head, crop) into one batch
        # dim. Mosaic cannot reshape-split the lane dim (m,3d)->(..,3,h,hd),
        # so heads are peeled with 64-aligned LANE SLICES (supported) and
        # regrouped along the leading dim (leading reshapes are free).
        def heads_of(base):
            return jnp.concatenate([
                jax.lax.slice(qkv, (0, base + h * hd),
                              (m, base + (h + 1) * hd))
                .reshape(1, tb, s, hd)
                for h in range(heads)
            ], axis=0).reshape(heads * tb, s, hd)

        q = heads_of(0)
        k = heads_of(d)
        v = heads_of(2 * d)
        logits = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [heads*tb, s, s]
        p = jax.nn.softmax(logits, axis=-1)
        att = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [heads*tb, s, hd]
        # back to [m, d] with head-major lanes (matches o_w's row layout)
        att = jnp.concatenate([
            jax.lax.slice(att, (h * tb, 0, 0), ((h + 1) * tb, s, hd))
            .reshape(m, hd)
            for h in range(heads)
        ], axis=1)
        proj = jax.lax.dot_general(
            att.astype(jnp.bfloat16), o_w[blk], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + o_b[blk]
        x = x + proj

        # --- MLP ---
        h = _ln(x, ln2_g[blk], ln2_b[blk], eps).astype(jnp.bfloat16)
        hmid = jax.lax.dot_general(
            h, f1_w[blk], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + f1_b[blk]
        # tanh-approx GELU: Mosaic has no erf/erfc lowering (exact GELU
        # fails to compile on real TPU); max abs err ~5e-4 vs exact, below
        # the bf16 stream's resolution (eps ~8e-3).
        hmid = jax.nn.gelu(hmid, approximate=True).astype(jnp.bfloat16)
        mlp_out = jax.lax.dot_general(
            hmid, f2_w[blk], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + f2_b[blk]
        x = x + mlp_out

    out_ref[:] = x.reshape(tb, s, d).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "eps", "tb", "blocks_per_call", "interpret"),
)
def vit_blocks_pallas(
    x: jnp.ndarray,
    stacked: Dict[str, jnp.ndarray],
    heads: int,
    eps: float = 1e-6,
    tb: int = 4,
    blocks_per_call: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run all stacked ViT blocks over x [N, S, D] (fp32 residual dtype).

    N must be a multiple of `tb` (the engine's crop slabs are bucketed
    powers of two). Blocks are processed `blocks_per_call` at a time so the
    group's weights fit VMEM alongside the activation tile; the residual
    tile stays in VMEM across the whole group.
    """
    n, s, d = x.shape
    assert n % tb == 0, (n, tb)
    n_blocks = stacked["qkv_w"].shape[0]
    grid = (n // tb,)

    def w_spec(arr):
        # whole array, constant index map -> DMA'd into VMEM once
        return pl.BlockSpec(
            arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    out = x
    for start in range(0, n_blocks, blocks_per_call):
        stop = min(start + blocks_per_call, n_blocks)
        group = {k: v[start:stop] for k, v in stacked.items()}
        nb = stop - start
        kern = functools.partial(
            _vit_blocks_kernel, n_blocks=nb, heads=heads, eps=eps,
            tb=tb, s=s, d=d,
        )
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tb, s, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [w_spec(group[k]) for k in (
                "qkv_w", "qkv_b", "o_w", "o_b", "f1_w", "f1_b",
                "f2_w", "f2_b", "ln1_g", "ln1_b", "ln2_g", "ln2_b")],
            out_specs=pl.BlockSpec((tb, s, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, s, d), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * nb * (4 * s * d * d + 2 * s * s * d
                                    + 2 * s * d * (4 * d)),
                bytes_accessed=2 * 4 * n * s * d + sum(
                    v.nbytes for v in group.values()),
                transcendentals=n * nb * s * 4 * d,
            ),
            interpret=interpret,
        )(out, *(group[k] for k in (
            "qkv_w", "qkv_b", "o_w", "o_b", "f1_w", "f1_b",
            "f2_w", "f2_b", "ln1_g", "ln1_b", "ln2_g", "ln2_b")))
    return out
