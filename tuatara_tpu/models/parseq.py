"""PARSEQ scene-text recognizer in functional JAX.

The reference runs PARSEQ as an opaque TorchScript artifact
(`parseq_torchscript.bin`, tuatara.cpp:426-432): input `[N,3,32,128]` float in
[0,1] (tuatara.cpp:440-446), output logits `[N, L, C]` which the pipeline
softmaxes and greedy-decodes (tuatara.cpp:486-493). This module implements the
architecture itself (PARSEQ paper defaults, matching the public network so
converted weights drop in):

* ViT-S encoder: 4x8 patch embed over the 32x128 crop -> 8x16=128 tokens,
  dim 384, 12 pre-norm blocks, 6 heads, final LayerNorm. No class token.
* Decoder: depth-1 dual-stream layer. The *query* stream (learned position
  queries) attends over the *content* stream (scaled token embeddings +
  position info), then cross-attends the image memory, then MLP — all
  pre-norm with distinct norms (norm_q/norm_c on the attention inputs).
* Greedy AR decode: BOS start, one token per step. TPU-first design: the
  whole decode is a single `lax.scan` over `max_label_length+1` steps with a
  preallocated content K/V cache — no dynamic shapes, one compiled program
  for any batch of crops. (The reference instead runs the TorchScript module
  over 4-crop chunks on 6 host threads — tuatara.cpp:450-475; here the batch
  dimension is the parallelism and shards over the device mesh.)
* Optional iterative refinement (cloze mask): one full-sequence pass re-reads
  the AR output with each position's own input token masked.

Vocabulary: ids follow the tokenizer layout [EOS=0, charset..., BOS, PAD]
(tuatara.cpp:36-39). The head emits charset_size+1=95 logits (EOS + charset);
BOS/PAD are never predicted.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tuatara_tpu.config import ParseqConfig
from tuatara_tpu.models import layers as L

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_parseq_params(key: jax.Array, cfg: ParseqConfig = ParseqConfig()) -> Params:
    D = cfg.embed_dim
    keys = iter(jax.random.split(key, 24 + cfg.enc_depth))
    p: Params = {}

    ph, pw = cfg.patch_size
    p["patch_embed"] = {
        "w": L.trunc_normal(next(keys), (ph * pw * 3, D)),
        "b": jnp.zeros((D,), jnp.float32),
    }
    p["pos_embed"] = L.trunc_normal(next(keys), (1, cfg.seq_len, D))
    p["enc"] = [
        L.init_vit_block(next(keys), D, cfg.enc_mlp_ratio) for _ in range(cfg.enc_depth)
    ]
    p["enc_norm"] = L.init_layernorm(D)

    p["text_embed"] = L.trunc_normal(next(keys), (cfg.num_tokens, D))
    p["pos_queries"] = L.trunc_normal(next(keys), (1, cfg.max_label_length + 1, D))

    dec_hidden = int(D * cfg.dec_mlp_ratio)
    p["dec"] = []
    for _ in range(cfg.dec_depth):
        k1, k2, k3, k4 = jax.random.split(next(keys), 4)
        p["dec"].append({
            "norm_q": L.init_layernorm(D),
            "norm_c": L.init_layernorm(D),
            "self_attn": L.init_mha(k1, D),
            "norm1": L.init_layernorm(D),
            "cross_attn": L.init_mha(k2, D),
            "norm2": L.init_layernorm(D),
            "linear1": L.init_linear(k3, D, dec_hidden),
            "linear2": L.init_linear(k4, dec_hidden, D),
        })
    p["dec_norm"] = L.init_layernorm(D)
    p["head"] = L.init_linear(next(keys), D, cfg.charset_size + 1)
    return p


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def parseq_encode(
    params: Params,
    images: jnp.ndarray,
    cfg: ParseqConfig = ParseqConfig(),
    compute_dtype=jnp.bfloat16,
    _pallas_interpret: bool = False,
) -> jnp.ndarray:
    """Encode crops [N, H, W, 3] (float in [0,1]) -> memory [N, S, D]."""
    if cfg.input_mean:
        # Model-contract input normalization (converter-detected; see
        # ParseqConfig.input_mean).
        mean = jnp.asarray(cfg.input_mean, jnp.float32)
        std = jnp.asarray(cfg.input_std or (1.0,) * len(cfg.input_mean),
                          jnp.float32)
        images = (images.astype(jnp.float32) - mean) / std
    n, h, w, c = images.shape
    ph, pw = cfg.patch_size
    gh, gw = h // ph, w // pw
    # Patchify as a reshape + one big matmul (equivalent to the stride-ph/pw
    # conv patch embed, but lowered as a single MXU-friendly GEMM).
    x = images.reshape(n, gh, ph, gw, pw, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(n, gh * gw, ph * pw * c)
    x = L.linear(params["patch_embed"], x, compute_dtype)
    x = x + params["pos_embed"]
    use_pallas = (
        cfg.encoder_impl == "pallas"
        and jnp.dtype(compute_dtype) == jnp.bfloat16
        and "wq" not in params["patch_embed"]  # int8 path keeps XLA lowering
        and n % 8 == 0
        and cfg.embed_dim % 128 == 0  # Mosaic: lane dim must tile to 128
    )
    if use_pallas:
        from tuatara_tpu.ops.pallas.vit import (
            stack_vit_block_weights, vit_blocks_pallas,
        )

        # Engines pre-stack once at construction (prestack_pallas_encoder);
        # ad-hoc callers pay a per-call stack (traced concat+cast of the
        # block weights, ~21 MB of extra HBM traffic).
        stacked = params.get("_enc_stacked")
        if stacked is None:
            stacked = stack_vit_block_weights(params["enc"])
        x = vit_blocks_pallas(x.astype(jnp.float32), stacked, cfg.enc_heads,
                              cfg.layer_norm_eps,
                              interpret=_pallas_interpret)
    else:
        for blk in params["enc"]:
            x = L.vit_block(blk, x, cfg.enc_heads, cfg.layer_norm_eps,
                            compute_dtype)
    return L.layernorm(params["enc_norm"], x, cfg.layer_norm_eps)


def prestack_pallas_encoder(params: Params, cfg: ParseqConfig) -> Params:
    """Serving-only transform: precompute the Pallas encoder kernel's
    stacked block weights ONCE (eagerly, at engine construction) under the
    `_enc_stacked` key, so each compiled recognize program receives them as
    ready inputs instead of re-tracing the concat+cast of all 12 blocks'
    weights (~21 MB of HBM traffic per forward; see parseq_encode).

    No-op unless cfg.encoder_impl == "pallas"; skipped for int8-quantized
    encoders (the quantized path keeps the XLA lowering). Idempotent.
    Returns a shallow copy — the original tree (the one checkpoints save)
    is untouched."""
    if cfg.encoder_impl != "pallas" or "_enc_stacked" in params:
        return params
    if "wq" in params["patch_embed"]:  # int8 path: pallas gate is off
        return params
    from tuatara_tpu.ops.pallas.vit import stack_vit_block_weights

    q: Params = dict(params)
    q["_enc_stacked"] = stack_vit_block_weights(params["enc"])
    return q


def prestack_pallas_decoder(params: Params, cfg: ParseqConfig) -> Params:
    """Serving-only transform: precompute the Pallas decode kernel's weight
    bundle ONCE (eagerly, at engine construction) under `_dec_stacked` —
    including the [T, V, D] content K/V table — so each compiled recognize
    program receives ready inputs (see ops/pallas/decode.py).

    No-op unless cfg.decode_impl == "pallas". Idempotent. Returns a shallow
    copy — the original tree (the one checkpoints save) is untouched."""
    if cfg.decode_impl != "pallas" or "_dec_stacked" in params:
        return params
    from tuatara_tpu.ops.pallas.decode import stack_decode_weights

    q: Params = dict(params)
    q["_dec_stacked"] = stack_decode_weights(params, cfg)
    return q


def fuse_parseq_encoder(params: Params) -> Params:
    """Serving-only transform: fuse each encoder block's q/k/v projections
    into one [D, 3D] matmul (layers.fuse_mha_qkv — bit-identical outputs).

    The encoder's self-attention then reads its activation tensor once
    instead of three times per block, and under quantized serving each
    block pays ONE activation-quantization pass instead of three. The
    decoder is untouched: its K/V-cached decode paths index the split
    q/k/v weights directly. Idempotent.

    MEASURED DEAD END on v5e (kept for other backends / future emitters):
    23.9 -> 25.5 ms per 256-crop bf16 encoder pass, stable across
    interleaved repeats (int8-dynamic: 25.9 -> 27.7). XLA already overlaps
    the three split projections, and the fused [B, L, 3D] output pays
    slice/layout copies that outweigh the saved reads — so the engine does
    NOT apply this transform (docs/PERFORMANCE.md dead-end table)."""
    if not params["enc"] or "qkv" in params["enc"][0]["attn"]:
        return params
    q: Params = dict(params)
    q["enc"] = [
        {**blk, "attn": L.fuse_mha_qkv(blk["attn"])} for blk in params["enc"]
    ]
    return q


def quantize_parseq_encoder(params: Params) -> Params:
    """Serving-only int8 quantization of the ViT encoder's linear layers.

    Per-column int8 weights + dynamic per-tensor int8 activations on the
    patch embed and every encoder block's attention q/k/v/o and MLP
    fc1/fc2 (L.linear dispatches on the "wq" key, so the forward is
    unchanged). LayerNorms, softmax, and the ENTIRE decoder stay fp32/bf16
    — the AR decode is latency-bound, not MXU-bound, and its logits feed
    argmax directly. Opt-in via OcrConfig.quantized_serving; accuracy
    deltas ride the same regression test as the detector trunk.
    """
    if "wq" in params["patch_embed"]:
        return params  # already quantized — idempotent
    q: Params = dict(params)
    q["patch_embed"] = L.quantize_linear(params["patch_embed"])
    q["enc"] = [
        {
            "norm1": blk["norm1"],
            "norm2": blk["norm2"],
            # Fused-QKV blocks (fuse_parseq_encoder) quantize the single
            # fused projection; per-column scales make this exactly equal
            # to quantizing q/k/v separately and then fusing.
            "attn": {k: L.quantize_linear(blk["attn"][k])
                     for k in blk["attn"]},
            "mlp": {k: L.quantize_linear(blk["mlp"][k])
                    for k in ("fc1", "fc2")},
        }
        for blk in params["enc"]
    ]
    return q


# ---------------------------------------------------------------------------
# Decoder layer (dual-stream; inference uses only the query stream)
# ---------------------------------------------------------------------------

def _dec_ff(layer: Params, x: jnp.ndarray, eps: float, dtype) -> jnp.ndarray:
    h = L.layernorm(layer["norm2"], x, eps)
    h = jax.nn.gelu(L.linear(layer["linear1"], h, dtype), approximate=False)
    return x + L.linear(layer["linear2"], h, dtype)


def _query_stream(
    layer: Params,
    query: jnp.ndarray,
    content_norm: jnp.ndarray,
    memory: jnp.ndarray,
    heads: int,
    eps: float,
    dtype,
    sa_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One decoder layer's query stream over pre-normed content."""
    qn = L.layernorm(layer["norm_q"], query, eps)
    query = query + L.mha(layer["self_attn"], qn, content_norm, heads, sa_mask, dtype)
    cn = L.layernorm(layer["norm1"], query, eps)
    query = query + L.mha(layer["cross_attn"], cn, memory, heads, None, dtype)
    return _dec_ff(layer, query, eps, dtype)


def _embed_tokens(params: Params, ids: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Scaled token embedding: sqrt(D) * E[ids]."""
    return math.sqrt(dim) * jnp.take(params["text_embed"], ids, axis=0)


def _content_embeddings(
    params: Params, tgt_ids: jnp.ndarray, cfg: ParseqConfig
) -> jnp.ndarray:
    """Content stream: [BOS no-pos, token_j + pos_{j-1} ...] for j >= 1."""
    emb = _embed_tokens(params, tgt_ids, cfg.embed_dim)  # [N, L, D]
    L_ = tgt_ids.shape[1]
    pos = jnp.pad(params["pos_queries"][0, : L_ - 1], ((1, 0), (0, 0)))
    return emb + pos[None]


def parseq_decode(
    params: Params,
    memory: jnp.ndarray,
    tgt_ids: jnp.ndarray,
    cfg: ParseqConfig = ParseqConfig(),
    query: Optional[jnp.ndarray] = None,
    query_mask: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Full-sequence decode (training / refinement path).

    Args:
      memory: [N, S, D] encoder output.
      tgt_ids: [N, L] content token ids (starts with BOS).
      query: [N, Lq, D] position queries; defaults to pos_queries[:L].
      query_mask: broadcastable to [N, heads, Lq, L]; True = attend.

    Returns logits [N, Lq, charset_size+1].
    """
    content = _content_embeddings(params, tgt_ids, cfg)
    if query is None:
        q = jnp.broadcast_to(
            params["pos_queries"][:, : tgt_ids.shape[1]],
            (tgt_ids.shape[0], tgt_ids.shape[1], cfg.embed_dim),
        )
    else:
        q = query
    for layer in params["dec"]:
        cn = L.layernorm(layer["norm_c"], content, cfg.layer_norm_eps)
        q = _query_stream(
            layer, q, cn, memory, cfg.dec_heads, cfg.layer_norm_eps,
            compute_dtype, sa_mask=query_mask,
        )
        # NOTE: with dec_depth == 1 the content-stream update is dead weight
        # (its output feeds nothing), so it is elided. For deeper decoders the
        # content stream would be updated here with the content mask.
    q = L.layernorm(params["dec_norm"], q, cfg.layer_norm_eps)
    return L.linear(params["head"], q, compute_dtype)


# ---------------------------------------------------------------------------
# Greedy autoregressive decode as one lax.scan (the inference hot path)
# ---------------------------------------------------------------------------

def parseq_greedy_decode(
    params: Params,
    memory: jnp.ndarray,
    cfg: ParseqConfig = ParseqConfig(),
    compute_dtype=jnp.bfloat16,
    early_exit: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy AR decode over a batch of encoded crops.

    Returns (logits [N, T, C], ids [N, T]) with T = max_label_length + 1.

    Design: depth-1 decoder => the self-attention K/V of the content stream
    are pure per-token functions of (token id, position), so they are cached
    in preallocated [N, H, T, hd] buffers and each step does one
    single-query attention over the cache — no recomputation of the prefix,
    no dynamic shapes.

    early_exit=True runs the steps under `lax.while_loop` and stops as soon
    as every sequence in the batch has emitted EOS (the reference's
    TorchScript model does the same in testing mode) — most words are far
    shorter than max_label_length, so this cuts the sequential-step cost by
    ~2-3x. Positions after the stop decode as EOS with probability-1 logits.
    """
    if cfg.dec_depth != 1:
        raise NotImplementedError("KV-cached scan decode assumes dec_depth == 1")
    if (cfg.decode_impl == "pallas" and cfg.embed_dim % 128 == 0
            and jnp.dtype(compute_dtype) == jnp.bfloat16):
        # (dim gate: Mosaic rejects the kernel's dots/reshapes when the
        # lane dim doesn't tile to 128 — smaller research configs fall
        # back to the XLA scan below. dtype gate: the kernel pre-casts
        # weights to bf16, so fp32 parity mode must take the XLA scan —
        # mirrors the encoder gate in parseq_encode.)
        # Fused VMEM-resident decode kernel (ops/pallas/decode.py).
        # early_exit=True stops each crop TILE once all its crops emitted
        # EOS (positions past the stop get EOS-certain logits, like the
        # XLA early-exit path); early_exit=False runs all T steps.
        # Engines pre-stack the weight bundle at construction
        # (prestack_pallas_decoder); ad-hoc callers pay a per-call stack.
        from tuatara_tpu.ops.pallas.decode import (
            greedy_decode_pallas, stack_decode_weights,
        )

        clayer = params["dec"][0]["cross_attn"]
        bf = jnp.dtype(compute_dtype)
        mem_k = L.linear(clayer["k"], memory, compute_dtype).astype(bf)
        mem_v = L.linear(clayer["v"], memory, compute_dtype).astype(bf)
        stacked = params.get("_dec_stacked")
        if stacked is None:
            stacked = stack_decode_weights(params, cfg)
        n = memory.shape[0]
        tb = next(c for c in (32, 16, 8, 4, 2, 1) if n % c == 0)
        logits = greedy_decode_pallas(
            mem_k, mem_v, stacked, cfg.dec_heads,
            cfg.max_label_length + 1, cfg.charset_size + 1,
            cfg.num_tokens - 2, cfg.layer_norm_eps, tb=tb,
            early_exit=early_exit)
        return logits, jnp.argmax(logits, axis=-1)
    layer = params["dec"][0]
    eps = cfg.layer_norm_eps
    N, S, D = memory.shape
    H = cfg.dec_heads
    hd = D // H
    T = cfg.max_label_length + 1
    num_classes = cfg.charset_size + 1
    bos_id = cfg.num_tokens - 2

    # Cross-attention K/V over the image memory: computed once.
    mem_k, mem_v = L.mha_kv(layer["cross_attn"], memory, H, compute_dtype)

    pos_q = params["pos_queries"][0]  # [T, D]

    # Step-static precomputation: position queries are fixed, so the entire
    # query side of the self-attention — layernorm + projection + head split
    # — is computed for ALL steps up front, and the per-step loop only does
    # the token-dependent work. Ditto the content positional table and a
    # fused (concatenated) K/V projection: fewer, larger ops per scan step.
    qn_all = L.layernorm(layer["norm_q"], pos_q[:, None], eps)  # [T, 1, D]
    q_heads_all = L.linear(layer["self_attn"]["q"], qn_all, compute_dtype)
    q_heads_all = q_heads_all.reshape(T, 1, H, hd)  # [T, 1(batch-bcast), H, hd]
    pos_table = jnp.concatenate([jnp.zeros((1, D)), pos_q[: T - 1]], axis=0)  # [T, D]
    w_kv = jnp.concatenate(
        [layer["self_attn"]["k"]["w"], layer["self_attn"]["v"]["w"]], axis=1
    )
    b_kv = jnp.concatenate(
        [layer["self_attn"]["k"]["b"], layer["self_attn"]["v"]["b"]]
    ) if "b" in layer["self_attn"]["k"] else None

    def content_kv(token_ids: jnp.ndarray, step: jnp.ndarray):
        """K/V heads for the content token entering at position `step`."""
        e = _embed_tokens(params, token_ids, D)  # [N, D]
        e = e + jax.lax.dynamic_slice(pos_table, (step, 0), (1, D))
        cn = L.layernorm(layer["norm_c"], e[:, None], eps)  # [N,1,D]
        kv = {"w": w_kv} if b_kv is None else {"w": w_kv, "b": b_kv}
        kv = L.linear(kv, cn, compute_dtype)  # [N,1,2D] one fused matmul
        k, v = kv[..., :D], kv[..., D:]
        k = k.reshape(N, 1, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(N, 1, H, hd).transpose(0, 2, 1, 3)
        return k, v  # [N, H, 1, hd]

    def decode_step(i, tokens, k_cache, v_cache):
        # Cache the content token for position i (BOS at i=0, else generated).
        tok_i = jax.lax.dynamic_slice(tokens, (0, i), (N, 1))[:, 0]
        k_i, v_i = content_kv(tok_i, i)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_i.astype(k_cache.dtype), (0, 0, i, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_i.astype(v_cache.dtype), (0, 0, i, 0))

        # Query stream for output position i over cache positions <= i,
        # using the precomputed projected query heads.
        q_res = jax.lax.dynamic_slice(pos_q, (i, 0), (1, D))[None]  # [1,1,D]
        qh = jax.lax.dynamic_slice(
            q_heads_all, (i, 0, 0, 0), (1, 1, H, hd)
        ).transpose(1, 2, 0, 3)  # [1, H, 1, hd], broadcasts over N
        mask = (jnp.arange(T)[None, None, None, :] <= i)
        attn = L.attention_core(
            jnp.broadcast_to(qh, (N, H, 1, hd)), k_cache, v_cache, mask,
            compute_dtype,
        )
        x = q_res + L.linear(
            layer["self_attn"]["o"], attn.transpose(0, 2, 1, 3).reshape(N, 1, D),
            compute_dtype,
        )
        cn = L.layernorm(layer["norm1"], x, eps)
        x = x + L.mha_with_kv(layer["cross_attn"], cn, mem_k, mem_v, H, None, compute_dtype)
        x = _dec_ff(layer, x, eps, compute_dtype)
        x = L.layernorm(params["dec_norm"], x, eps)
        logits_i = L.linear(params["head"], x, compute_dtype)[:, 0]  # [N, C]

        nxt = jnp.argmax(logits_i, axis=-1).astype(tokens.dtype)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i + 1))
        return tokens, k_cache, v_cache, logits_i

    tokens0 = jnp.full((N, T + 1), bos_id, jnp.int32)
    # Cache in compute_dtype: the entries are produced BY a compute_dtype
    # matmul and consumed by attention_core which downcasts to compute_dtype
    # anyway — an fp32 cache is a bit-identical round-trip that just doubles
    # the per-step cache read traffic (x26 steps). (VERDICT r3 task 2.)
    kv_dtype = jnp.dtype(compute_dtype)
    k0 = jnp.zeros((N, H, T, hd), kv_dtype)
    v0 = jnp.zeros((N, H, T, hd), kv_dtype)

    if not early_exit:
        def step_fn(carry, i):
            tokens, k_cache, v_cache = carry
            tokens, k_cache, v_cache, logits_i = decode_step(i, tokens, k_cache, v_cache)
            return (tokens, k_cache, v_cache), logits_i

        (tokens, _, _), logits = jax.lax.scan(
            step_fn, (tokens0, k0, v0), jnp.arange(T)
        )
        logits = logits.transpose(1, 0, 2)  # [N, T, C]
        return logits, tokens[:, 1:]

    # Early-exit variant: positions never reached keep EOS-certain logits so
    # downstream softmax/argmax/confidence see a clean "ended" distribution.
    eos_onehot = jnp.full((num_classes,), -30.0, jnp.float32).at[0].set(30.0)
    logits0 = jnp.broadcast_to(eos_onehot, (N, T, num_classes)) * jnp.ones((N, T, 1))

    def cond(state):
        i, tokens, _, _, _ = state
        # Stop once every sequence has an EOS among its generated tokens.
        seen_eos = jnp.any(tokens[:, 1:] == 0, axis=1)
        return jnp.logical_and(i < T, ~jnp.all(seen_eos))

    def body(state):
        i, tokens, k_cache, v_cache, logits = state
        tokens, k_cache, v_cache, logits_i = decode_step(i, tokens, k_cache, v_cache)
        logits = jax.lax.dynamic_update_slice(
            logits, logits_i.astype(logits.dtype)[:, None], (0, i, 0)
        )
        return i + 1, tokens, k_cache, v_cache, logits

    _, tokens, _, _, logits = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tokens0, k0, v0, logits0)
    )
    # ids from the final logits (unreached positions -> EOS).
    return logits, jnp.argmax(logits, axis=-1)


def parseq_beam_decode(
    params: Params,
    memory: jnp.ndarray,
    cfg: ParseqConfig = ParseqConfig(),
    beam_size: int = 4,
    compute_dtype=jnp.bfloat16,
    length_norm: float = 0.6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched beam search over encoded crops (BASELINE.md config 5).

    Beams fold into the batch dimension ([N*B] everywhere), so the per-step
    compute is one decoder invocation regardless of beam width; candidate
    selection is a top-k over (beam x vocab) per sequence. Finished beams
    (emitted EOS) are frozen: they propose only an EOS continuation at zero
    incremental log-prob. Returns (ids [N, T], scores [N]): the best beam is
    SELECTED under GNMT-style length normalization ((5+len)/6)^length_norm,
    but the returned score is that beam's raw (unnormalized) sum of token
    log-probs, so exp(score) is a true sequence probability comparable to
    the greedy path's confidence.
    """
    if cfg.dec_depth != 1:
        raise NotImplementedError("beam decode assumes dec_depth == 1")
    layer = params["dec"][0]
    eps = cfg.layer_norm_eps
    N, S, D = memory.shape
    H = cfg.dec_heads
    hd = D // H
    T = cfg.max_label_length + 1
    C = cfg.charset_size + 1
    B = beam_size
    bos_id = cfg.num_tokens - 2
    NB = N * B

    mem_rep = jnp.repeat(memory, B, axis=0)  # [NB, S, D]
    mem_k, mem_v = L.mha_kv(layer["cross_attn"], mem_rep, H, compute_dtype)
    pos_q = params["pos_queries"][0]

    def step_logits(tokens, k_cache, v_cache, i):
        """One decoder step for all beams: returns log-probs [NB, C]."""
        tok_i = jax.lax.dynamic_slice(tokens, (0, i), (NB, 1))[:, 0]
        e = _embed_tokens(params, tok_i, D)
        pidx = jnp.maximum(i - 1, 0)
        e = e + jnp.where(i >= 1, pos_q[pidx], 0.0)
        cn = L.layernorm(layer["norm_c"], e[:, None], eps)
        k_i = L.linear(layer["self_attn"]["k"], cn, compute_dtype)
        v_i = L.linear(layer["self_attn"]["v"], cn, compute_dtype)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_i.reshape(NB, 1, H, hd).transpose(0, 2, 1, 3).astype(k_cache.dtype),
            (0, 0, i, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_i.reshape(NB, 1, H, hd).transpose(0, 2, 1, 3).astype(v_cache.dtype),
            (0, 0, i, 0))
        q = jnp.broadcast_to(jax.lax.dynamic_slice(pos_q, (i, 0), (1, D))[None], (NB, 1, D))
        mask = jnp.arange(T)[None, None, None, :] <= i
        qn = L.layernorm(layer["norm_q"], q, eps)
        x = q + L.mha_with_kv(layer["self_attn"], qn, k_cache, v_cache, H, mask, compute_dtype)
        cn2 = L.layernorm(layer["norm1"], x, eps)
        x = x + L.mha_with_kv(layer["cross_attn"], cn2, mem_k, mem_v, H, None, compute_dtype)
        x = _dec_ff(layer, x, eps, compute_dtype)
        x = L.layernorm(params["dec_norm"], x, eps)
        logits = L.linear(params["head"], x, compute_dtype)[:, 0]
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), k_cache, v_cache

    def body(carry, i):
        tokens, k_cache, v_cache, scores, done = carry
        logp, k_cache, v_cache = step_logits(tokens, k_cache, v_cache, i)
        # Frozen beams: only EOS continues, at zero cost.
        frozen = jnp.full((NB, C), -jnp.inf).at[:, 0].set(0.0)
        logp = jnp.where(done[:, None], frozen, logp)
        # Degenerate duplicate start: at step 0 every beam of a sequence is
        # identical; allow only beam 0 to propose.
        first = (jnp.arange(NB) % B == 0)[:, None]
        logp = jnp.where((i == 0) & ~first, -jnp.inf, logp)

        cand = scores[:, None] + logp                      # [NB, C]
        cand = cand.reshape(N, B * C)
        top_s, top_i = jax.lax.top_k(cand, B)              # [N, B]
        src_beam = top_i // C                              # [N, B]
        tok = (top_i % C).astype(jnp.int32)

        # Reorder beam state by winning parent beam.
        gather_idx = (jnp.arange(N)[:, None] * B + src_beam).reshape(-1)
        tokens = jnp.take(tokens, gather_idx, axis=0)
        k_cache = jnp.take(k_cache, gather_idx, axis=0)
        v_cache = jnp.take(v_cache, gather_idx, axis=0)
        done = jnp.take(done, gather_idx, axis=0)

        tokens = jax.lax.dynamic_update_slice(
            tokens, tok.reshape(NB, 1), (0, i + 1))
        done = done | (tok.reshape(-1) == 0)
        return (tokens, k_cache, v_cache, top_s.reshape(-1), done), None

    tokens0 = jnp.full((NB, T + 1), bos_id, jnp.int32)
    # compute_dtype cache: bit-identical to fp32 (see parseq_greedy_decode).
    k0 = jnp.zeros((NB, H, T, hd), jnp.dtype(compute_dtype))
    v0 = jnp.zeros((NB, H, T, hd), jnp.dtype(compute_dtype))
    scores0 = jnp.zeros((NB,), jnp.float32)
    done0 = jnp.zeros((NB,), bool)
    (tokens, _, _, scores, done), _ = jax.lax.scan(
        body, (tokens0, k0, v0, scores0, done0), jnp.arange(T))

    ids = tokens[:, 1:].reshape(N, B, T)
    # Length-normalized scores; unfinished beams count full length.
    lengths = jnp.where(
        (ids == 0).any(-1), jnp.argmax((ids == 0).astype(jnp.int32), -1) + 1, T
    ).astype(jnp.float32)
    norm = ((5.0 + lengths) / 6.0) ** length_norm
    final = scores.reshape(N, B) / norm
    best = jnp.argmax(final, axis=1)
    ids_best = jnp.take_along_axis(ids, best[:, None, None].repeat(T, 2), 1)[:, 0]
    raw_best = jnp.take_along_axis(scores.reshape(N, B), best[:, None], 1)[:, 0]
    return ids_best, raw_best


def parseq_nar_decode(
    params: Params,
    memory: jnp.ndarray,
    cfg: ParseqConfig = ParseqConfig(),
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Single-pass non-autoregressive decode (the PARSEQ paper's NAR mode,
    upstream `decode_ar=False`): the content stream is BOS alone and all
    T positions are decoded in ONE decoder pass instead of T sequential
    steps — ~10x lower decode latency than the AR scan (which is
    sequential-step latency-bound, not MXU-bound). Pair with
    `parseq_refine` (cloze refinement) to recover most of the AR accuracy;
    a PLM-trained model supports this directly (the permutation set covers
    the no-context cloze). Returns logits [N, T, charset_size+1]."""
    N = memory.shape[0]
    T = cfg.max_label_length + 1
    bos = jnp.full((N, 1), cfg.num_tokens - 2, jnp.int32)
    q = jnp.broadcast_to(params["pos_queries"][:, :T], (N, T, cfg.embed_dim))
    return parseq_decode(params, memory, bos, cfg, query=q,
                         compute_dtype=compute_dtype)


def refine_mask(T: int) -> jnp.ndarray:
    """Cloze attention mask for refinement: query i may attend every content
    position except j == i + 1 (its own previous prediction)."""
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    return j != i + 1


def parseq_refine(
    params: Params,
    memory: jnp.ndarray,
    logits: jnp.ndarray,
    cfg: ParseqConfig = ParseqConfig(),
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """One cloze-refinement pass over AR logits (PARSEQ iterative refinement).

    Rebuilds the content stream from [BOS, argmax(logits)[:-1]], masks each
    query's own input position and every position past the first EOS, and
    re-decodes the full sequence in one shot.
    """
    N, T, _ = logits.shape
    bos_id = cfg.num_tokens - 2
    prev = jnp.argmax(logits, axis=-1)  # [N, T], vocab ids (<= charset_size)
    tgt_in = jnp.concatenate(
        [jnp.full((N, 1), bos_id, prev.dtype), prev[:, :-1]], axis=1
    )
    # Padding: positions at/after the first EOS in the content are blocked.
    pad = jnp.cumsum((tgt_in == 0).astype(jnp.int32), axis=1) > 0  # [N, T]
    mask = refine_mask(T)[None, None] & ~pad[:, None, None, :]
    return parseq_decode(
        params, memory, tgt_in, cfg, query_mask=mask, compute_dtype=compute_dtype
    )


def parseq_forward(
    params: Params,
    images: jnp.ndarray,
    cfg: ParseqConfig = ParseqConfig(),
    compute_dtype=jnp.bfloat16,
    early_exit: bool = True,
    ar: bool = True,
) -> jnp.ndarray:
    """Full inference forward: crops [N,32,128,3] in [0,1] -> logits [N,T,C].

    Mirrors the reference model's observable contract (input tuatara.cpp:
    440-446, output consumed at tuatara.cpp:486-493), including greedy AR
    decode with `refine_iters` cloze refinement passes. ar=False uses the
    single-pass NAR decode (parseq_nar_decode) instead of the AR scan —
    much lower latency, near-AR accuracy after refinement.
    """
    memory = parseq_encode(params, images, cfg, compute_dtype)
    if ar:
        logits, _ = parseq_greedy_decode(params, memory, cfg, compute_dtype,
                                         early_exit)
    else:
        logits = parseq_nar_decode(params, memory, cfg, compute_dtype)
    for _ in range(cfg.refine_iters):
        logits = parseq_refine(params, memory, logits, cfg, compute_dtype)
    return logits
