"""Fused KV-cached greedy AR decode as a Pallas TPU kernel.

Why: the PARSEQ AR decode is the serving path's least efficient program —
26 sequential steps of batch-N matvecs at ~1% MFU, bound by HBM traffic:
every step re-reads the cross-attention memory K/V (~25 MB bf16 at
N=256), the decoder weights (~4 MB), and the self-attention cache from
HBM (measured ~10-14 ms per 256-crop slab; the round-3 trace put the
cross-attention reads alone at ~6.4 ms and ~3x off the traffic roofline,
docs/PERFORMANCE.md "Decode cross-attention layout"). This kernel holds a
TILE of crops' memory K/V, the growing self-attention K/V cache, and all
decoder weights in VMEM for the WHOLE 26-step loop: HBM sees each input
once and the per-step logits once.

Semantics: the math of `parseq_greedy_decode(..., early_exit=False)`
(models/parseq.py) — depth-1 dual-stream step: content K/V from the
previous token (cached), position-query single-query self-attention over
the cache, cross-attention over the image memory, GELU MLP, final LN +
head, argmax feeds the next step. All T steps run (no data-dependent
early exit inside the kernel; transcripts are unaffected — decoding stops
at the first EOS downstream, and positions before it get identical math).
Numerics: bf16 operands with fp32 accumulation, fp32 LN/softmax — same
recipe as the XLA path; GELU is tanh-approximated (Mosaic lowers no erf;
~5e-4 max abs err, below bf16 resolution). NOT bit-identical to the XLA
lowering; serving opt-in via ParseqConfig.decode_impl="pallas".

Design notes (all forced by what Mosaic lowers WELL — found by measuring,
the per-head/batched-dot formulation compiled but ran 4x slower and its
kernel stack scaled ~tb^2):
  * NOTHING is ever split into heads. Memory K/V enter as the raw
    [N, S, D] projections (head-major lanes by construction); the
    self-attention cache is [TB, T, D] — ONE contiguous store per step.
  * Per-head attention scores come from a SEGMENT MATMUL: elementwise
    q*k products [TB, L, D] hit a constant 0/1 matrix [D, H] on the MXU,
    giving each head's lane-group sum exactly; probabilities expand back
    to lanes with its transpose [H, D]. Softmax runs over the sublane
    (length) axis. Two small exact matmuls replace 3x12 lane peels.
  * The content K/V are a precomputed TABLE [T, V, D] (a position-token
    embedding + LN + projection has no other inputs — stack_decode_weights
    builds it with one batched matmul); the in-kernel step gathers rows
    with a one-hot matmul. No embedding/LN/projection inside the loop.

Reference analog: none — the reference runs its decoder inside an opaque
TorchScript artifact on CPU threads (/root/reference/tuatara.cpp:450-475).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]


def stack_decode_weights(params: Params, cfg) -> Dict[str, jnp.ndarray]:
    """Precompute the kernel's weight bundle from a PARSEQ param tree.

    Beyond the step-static precomputation of parseq_greedy_decode (full
    query side, shifted positional table), this builds the content K/V
    TABLE over all (position, token) pairs — the content stream is a pure
    function of (token id, position), so the per-step embed+LN+projection
    collapses to a one-hot gather inside the kernel. Matmul weights are
    cast bf16 (the kernel's operand dtype); LN params, biases fp32."""
    from tuatara_tpu.models import layers as L

    layer = params["dec"][0]
    eps = cfg.layer_norm_eps
    D = cfg.embed_dim
    H = cfg.dec_heads
    T = cfg.max_label_length + 1
    bf = jnp.bfloat16

    pos_q = params["pos_queries"][0][:T]  # [T, D]
    qn_all = L.layernorm(layer["norm_q"], pos_q, eps)
    qh_all = L.linear(layer["self_attn"]["q"], qn_all, bf)  # [T, D]
    pos_table = jnp.concatenate(
        [jnp.zeros((1, D)), pos_q[: T - 1]], axis=0)  # [T, D]

    # Content K/V table over every (position, token) pair: [T, V, D].
    emb = params["text_embed"]  # [V, D]
    V = emb.shape[0]
    e_all = (math.sqrt(D) * emb)[None] + pos_table[:, None]  # [T, V, D]
    cn_all = L.layernorm(layer["norm_c"], e_all, eps)
    k_tab = L.linear(layer["self_attn"]["k"], cn_all, bf)  # [T, V, D] f32
    v_tab = L.linear(layer["self_attn"]["v"], cn_all, bf)

    def wb(p, n_out):
        return (p["w"].astype(bf),
                p.get("b", jnp.zeros((n_out,))).astype(jnp.float32))

    o_w, o_b = wb(layer["self_attn"]["o"], D)
    cq_w, cq_b = wb(layer["cross_attn"]["q"], D)
    co_w, co_b = wb(layer["cross_attn"]["o"], D)
    f1_w, f1_b = wb(layer["linear1"], layer["linear1"]["w"].shape[1])
    f2_w, f2_b = wb(layer["linear2"], D)
    num_classes = cfg.charset_size + 1
    h_w, h_b = wb(params["head"], num_classes)

    # Head segment matrix [D, H]: column h selects lanes h*hd..(h+1)*hd.
    hd = D // H
    seg = (jnp.arange(D)[:, None] // hd
           == jnp.arange(H)[None, :]).astype(jnp.float32)

    def ln(p):
        return (p["scale"].astype(jnp.float32), p["bias"].astype(jnp.float32))

    out = {
        "pos_q": pos_q.astype(jnp.float32),
        "qh_all": qh_all.astype(bf).astype(jnp.float32),  # bf16-valued; f32 storage (dynamic single-row reads of packed bf16 sublanes do not lower)
        "k_tab": k_tab.astype(bf),            # cache dtype == compute dtype
        "v_tab": v_tab.astype(bf),
        "seg": seg, "segT": seg.T.astype(jnp.float32).copy(),
        "o_w": o_w, "o_b": o_b,
        "cq_w": cq_w, "cq_b": cq_b, "co_w": co_w, "co_b": co_b,
        "f1_w": f1_w, "f1_b": f1_b, "f2_w": f2_w, "f2_b": f2_b,
        "h_w": h_w, "h_b": h_b,
    }
    for name in ("norm1", "norm2"):
        g, b = ln(layer[name])
        out[name + "_g"], out[name + "_b"] = g, b
    g, b = ln(params["dec_norm"])
    out["dec_norm_g"], out["dec_norm_b"] = g, b
    return out


def _ln(x32, g, b, eps):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * g + b


def _decode_kernel(
    mem_k, mem_v, pos_q, qh_all, k_tab, v_tab, seg, segT, o_w, o_b,
    cq_w, cq_b, co_w, co_b, f1_w, f1_b, f2_w, f2_b, h_w, h_b,
    norm1_g, norm1_b, norm2_g, norm2_b, dec_norm_g, dec_norm_b,
    out_ref, k_cache, v_cache,
    *, tb: int, t: int, t_pad: int, heads: int, d: int, s: int,
    n_classes: int, n_vocab: int, bos_id: int, eps: float,
    early_exit: bool,
):
    bf = jnp.bfloat16
    hd = d // heads
    scale = 1.0 / math.sqrt(hd)

    # Zero the caches (scratch is uninitialized and persists across grid
    # steps): positions > i are masked out of the softmax, but p=0 times a
    # NaN cache entry is NaN — zeros match the XLA path's k0/v0 init.
    # f32 caches: Mosaic cannot do single-row dynamic sublane stores into
    # packed bf16 tiles ("index in dimension 1 is a multiple of 8"); the
    # VALUES are bf16-rounded before the store, so the attention math still
    # sees compute-dtype K/V (kv_dtype semantics of the XLA path).
    k_cache[:, :, :] = jnp.zeros((tb, t_pad, d), jnp.float32)
    v_cache[:, :, :] = jnp.zeros((tb, t_pad, d), jnp.float32)
    mk_bf = mem_k[:]  # [TB, S, D] bf16, head-major lanes
    mv_bf = mem_v[:]

    def attend(q_bf, k_bf, v_bf, mask=None):
        """Single-query multi-head attention, segment-matmul formulation.

        q [TB, D] bf16, k/v [TB, L, D] bf16 -> [TB, D] fp32.
        Per-head sums: bf16 q*k products [TB, L, D] hit the 0/1 segment
        matrix on the MXU with f32 accumulation. The VPU product rounds to
        bf16 (the XLA einsum keeps exact products in the MXU accumulator),
        a bf16-class difference — and the big [TB, L, D] intermediates stay
        bf16, which is what makes the step VMEM-traffic cheap."""
        prod = q_bf[:, None, :] * k_bf  # [TB, L, D] bf16
        logits = jax.lax.dot_general(
            prod, seg[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [TB, L, H] f32
        if mask is not None:
            logits = jnp.where(mask, logits, jnp.float32(-1e30))
        # softmax over the length (sublane) axis
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)  # [TB, L, H] fp32
        p_full = jax.lax.dot_general(
            p.astype(bf), segT[:].astype(bf),
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(bf)  # [TB, L, D]: each lane gets its head's probability
        return jnp.sum((p_full * v_bf).astype(jnp.float32), axis=1)

    def mm(x_bf, w, b):
        return jax.lax.dot_general(
            x_bf, w[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b[:]

    def step(i, prev_tok):
        # --- content K/V for position i: one-hot gather from the table ---
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (tb, n_vocab), 1)
                  == prev_tok).astype(jnp.float32)
        k_i = jax.lax.dot_general(
            onehot, k_tab[pl.ds(i, 1), :, :][0].astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        v_i = jax.lax.dot_general(
            onehot, v_tab[pl.ds(i, 1), :, :][0].astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        k_cache[:, pl.ds(i, 1), :] = (
            k_i[:, None, :].astype(bf).astype(jnp.float32))
        v_cache[:, pl.ds(i, 1), :] = (
            v_i[:, None, :].astype(bf).astype(jnp.float32))

        # --- query stream: position query i over cache positions <= i ---
        q_i = jnp.broadcast_to(qh_all[pl.ds(i, 1), :], (tb, d)).astype(bf)
        mask = (jax.lax.broadcasted_iota(jnp.int32, (1, t_pad, 1), 1) <= i)
        attn = attend(q_i, k_cache[:].astype(bf), v_cache[:].astype(bf),
                      mask)
        x = pos_q[pl.ds(i, 1), :] + mm(attn.astype(bf), o_w, o_b)  # [TB, D]

        # --- cross-attention over the image memory ---
        cn1 = _ln(x, norm1_g[:], norm1_b[:], eps).astype(bf)
        qc = mm(cn1, cq_w, cq_b)
        x = x + mm(attend(qc.astype(bf), mk_bf, mv_bf).astype(bf),
                   co_w, co_b)

        # --- MLP (tanh-approx GELU: Mosaic lowers no erf) ---
        h2 = _ln(x, norm2_g[:], norm2_b[:], eps).astype(bf)
        hmid = mm(h2, f1_w, f1_b)
        hmid = jax.nn.gelu(hmid, approximate=True).astype(bf)
        x = x + mm(hmid, f2_w, f2_b)

        # --- head ---
        y = _ln(x, dec_norm_g[:], dec_norm_b[:], eps).astype(bf)
        logits_i = mm(y, h_w, h_b)  # [TB, C]
        out_ref[:, pl.ds(i, 1), :] = logits_i[:, None, :]
        # argmax as max + first-matching-index (Mosaic rejects the argmax
        # reduce's f32->i32 cast); ties resolve first, same as jnp.argmax.
        mx = jnp.max(logits_i, axis=-1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, logits_i.shape, 1)
        return jnp.min(jnp.where(logits_i == mx, lane, n_classes),
                       axis=-1, keepdims=True)

    prev0 = jnp.full((tb, 1), bos_id, jnp.int32)
    if not early_exit:
        jax.lax.fori_loop(0, t, step, prev0)
        return
    # Tile-level early exit: stop once every crop in the tile has emitted
    # EOS (the XLA path's batch early-exit, at tile granularity — pays on
    # trained weights, where most words are far shorter than T). Positions
    # never reached keep EOS-certain logits, matching early_exit=True
    # semantics downstream (softmax/argmax see a clean "ended" state).
    eos_certain = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (tb, t_pad, n_classes), 2) == 0,
        jnp.float32(30.0), jnp.float32(-30.0))
    out_ref[:, :, :] = eos_certain

    def cond(state):
        i, _, seen = state
        return jnp.logical_and(i < t, jnp.min(seen) == 0)

    def body(state):
        i, prev, seen = state
        nxt = step(i, prev)
        return i + 1, nxt, jnp.maximum(seen, (nxt == 0).astype(jnp.int32))

    jax.lax.while_loop(
        cond, body, (jnp.int32(0), prev0, jnp.zeros((tb, 1), jnp.int32)))


@functools.partial(
    jax.jit, static_argnames=("heads", "t", "n_classes", "bos_id", "eps",
                              "tb", "interpret", "early_exit"),
)
def greedy_decode_pallas(
    mem_k: jnp.ndarray,
    mem_v: jnp.ndarray,
    stacked: Dict[str, jnp.ndarray],
    heads: int,
    t: int,
    n_classes: int,
    bos_id: int,
    eps: float = 1e-6,
    tb: int = 32,
    interpret: bool = False,
    early_exit: bool = True,
) -> jnp.ndarray:
    """Run the T-step greedy decode over UNSPLIT memory K/V projections
    [N, S, D] (L.linear of cross_attn k/v over the encoder output — NOT
    head-split; see parseq.parseq_greedy_decode for the XLA analog).
    Returns logits [N, T, C]. N must be a multiple of tb."""
    n, s, d = mem_k.shape
    assert n % tb == 0, (n, tb)
    # Sublane windows (caches, the logits output) need T to tile to 8:
    # pad the step axis up and slice the result (the loop still runs t
    # steps; padded positions keep EOS-certain/zero fills).
    t_pad = -(-t // 8) * 8
    grid = (n // tb,)

    names = ("pos_q", "qh_all", "k_tab", "v_tab", "seg", "segT",
             "o_w", "o_b", "cq_w", "cq_b", "co_w", "co_b",
             "f1_w", "f1_b", "f2_w", "f2_b", "h_w", "h_b",
             "norm1_g", "norm1_b", "norm2_g", "norm2_b",
             "dec_norm_g", "dec_norm_b")

    def w_spec(arr):
        shape = arr.shape if arr.ndim >= 2 else (1,) + arr.shape
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    # 1-D weight tensors ride as [1, K] rows (Mosaic wants >= 2-D refs).
    stacked2 = {k: (v if v.ndim >= 2 else v[None]) for k, v in stacked.items()}
    n_vocab = stacked["k_tab"].shape[1]

    kern = functools.partial(
        _decode_kernel, tb=tb, t=t, t_pad=t_pad, heads=heads, d=d, s=s,
        n_classes=n_classes, n_vocab=n_vocab, bos_id=bos_id, eps=eps,
        early_exit=early_exit,
    )
    mem_spec = pl.BlockSpec((tb, s, d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    flops_step = 2 * n * (2 * n_vocab * d + 2 * d * d + 2 * (s + t) * d
                          + 2 * d * 4 * d + d * n_classes)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[mem_spec, mem_spec] + [w_spec(stacked2[k]) for k in names],
        out_specs=pl.BlockSpec((tb, t_pad, n_classes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t_pad, n_classes), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tb, t_pad, d), jnp.float32),
            pltpu.VMEM((tb, t_pad, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=t * flops_step,
            bytes_accessed=(2 * mem_k.nbytes
                            + sum(v.nbytes for v in stacked2.values())
                            + 4 * n * t * n_classes),
            transcendentals=n * t * (4 * d + s + t),
        ),
        # Mosaic hoists loop-invariant weight reads onto the kernel stack
        # (live across the whole 26-step loop); the default 16 MB scoped
        # limit is too tight for them + the [TB, S, D] cross products.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mem_k, mem_v, *(stacked2[k] for k in names))[:, :t]
