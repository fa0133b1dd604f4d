"""Fused Pallas greedy-decode kernel (ops/pallas/decode.py).

Interpret-mode caveat: THIS kernel's dynamic-index stores under fori_loop
produce spurious NaNs in Pallas interpret mode (value-dependent, absent on
real TPU and absent from the identical math run as plain jnp — see the
debugging record in docs/PERFORMANCE.md round 4). So on CPU these tests
pin the kernel's MATH via a faithful jnp transcription (segment-matmul
attention, content K/V table, bf16 product rounding) against the XLA
decode path; the TPU lowering itself is exercised by the
@pytest.mark.tpu test below and by the bench/serving configs.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tuatara_tpu.config import ParseqConfig
from tuatara_tpu.models import layers as L
from tuatara_tpu.models.parseq import (
    init_parseq_params, parseq_encode, parseq_greedy_decode,
    prestack_pallas_decoder,
)
from tuatara_tpu.ops.pallas.decode import stack_decode_weights

CFG = ParseqConfig(embed_dim=64, enc_depth=1, enc_heads=4, dec_heads=4,
                   max_label_length=7)


@pytest.fixture(scope="module")
def setup():
    params = init_parseq_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    crops = jnp.asarray(rng.random((8, 32, 128, 3)), jnp.float32)
    memory = parseq_encode(params, crops, CFG, jnp.bfloat16)
    return params, memory


def test_content_kv_table_matches_step_projection(setup):
    """The [T, V, D] content K/V table equals the XLA path's per-step
    content_kv projection for every (token, position) pair — same inputs,
    so exact up to the one bf16 cast both sides share."""
    params, _ = setup
    st = stack_decode_weights(params, CFG)
    layer = params["dec"][0]
    D = CFG.embed_dim
    T = CFG.max_label_length + 1
    V = params["text_embed"].shape[0]
    pos_table = jnp.concatenate(
        [jnp.zeros((1, D)), params["pos_queries"][0][: T - 1]], axis=0)
    for t in (0, 3, T - 1):
        toks = jnp.arange(V)
        e = math.sqrt(D) * params["text_embed"] + pos_table[t]
        cn = L.layernorm(layer["norm_c"], e, CFG.layer_norm_eps)
        k_want = L.linear(layer["self_attn"]["k"], cn, jnp.bfloat16)
        v_want = L.linear(layer["self_attn"]["v"], cn, jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(st["k_tab"][t]),
            np.asarray(k_want.astype(jnp.bfloat16)))
        np.testing.assert_array_equal(
            np.asarray(st["v_tab"][t]),
            np.asarray(v_want.astype(jnp.bfloat16)))
        del toks


def _simulate_kernel(st, mem_k, mem_v, cfg, t_steps):
    """Faithful jnp transcription of _decode_kernel's math (segment-matmul
    attention, bf16 products, fp32 LN/softmax, tanh GELU, argmax trick)."""
    bf = jnp.bfloat16
    D = cfg.embed_dim
    H = cfg.dec_heads
    hd = D // H
    TB = mem_k.shape[0]
    V = st["k_tab"].shape[1]
    C = cfg.charset_size + 1
    eps = cfg.layer_norm_eps
    scale = 1.0 / math.sqrt(hd)
    seg, segT = st["seg"], st["segT"]

    def ln(x, g, b):
        x = x.astype(jnp.float32)
        m = jnp.mean(x, -1, keepdims=True)
        v = jnp.var(x, -1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + eps) * g + b

    def attend(q_bf, k_bf, v_bf, mask=None):
        prod = q_bf[:, None, :] * k_bf
        logits = jnp.einsum("tld,dh->tlh", prod.astype(jnp.float32),
                            seg) * scale
        if mask is not None:
            logits = jnp.where(mask, logits, jnp.float32(-1e30))
        p = jax.nn.softmax(logits, axis=1)
        p_full = jnp.einsum("tlh,hd->tld", p.astype(bf).astype(jnp.float32),
                            segT).astype(bf)
        return jnp.sum((p_full * v_bf).astype(jnp.float32), axis=1)

    def mm(x_bf, w, b):
        return jnp.dot(x_bf, w.astype(bf),
                       preferred_element_type=jnp.float32) + b

    k_cache = jnp.zeros((TB, t_steps, D), jnp.float32)
    v_cache = jnp.zeros((TB, t_steps, D), jnp.float32)
    prev = jnp.full((TB, 1), cfg.num_tokens - 2, jnp.int32)
    out = []
    for i in range(t_steps):
        onehot = (jnp.arange(V)[None] == prev).astype(jnp.float32)
        k_i = onehot @ st["k_tab"][i].astype(jnp.float32)
        v_i = onehot @ st["v_tab"][i].astype(jnp.float32)
        k_cache = k_cache.at[:, i].set(k_i.astype(bf).astype(jnp.float32))
        v_cache = v_cache.at[:, i].set(v_i.astype(bf).astype(jnp.float32))
        q_i = jnp.broadcast_to(st["qh_all"][i][None], (TB, D)).astype(bf)
        mask = (jnp.arange(t_steps)[None, :, None] <= i)
        attn = attend(q_i, k_cache.astype(bf), v_cache.astype(bf), mask)
        x = st["pos_q"][i][None] + mm(attn.astype(bf), st["o_w"], st["o_b"])
        cn1 = ln(x, st["norm1_g"], st["norm1_b"]).astype(bf)
        qc = mm(cn1, st["cq_w"], st["cq_b"])
        ctx = attend(qc.astype(bf), mem_k, mem_v)
        x = x + mm(ctx.astype(bf), st["co_w"], st["co_b"])
        h2 = ln(x, st["norm2_g"], st["norm2_b"]).astype(bf)
        hmid = mm(h2, st["f1_w"], st["f1_b"])
        hmid = jax.nn.gelu(hmid, approximate=True).astype(bf)
        x = x + mm(hmid, st["f2_w"], st["f2_b"])
        y = ln(x, st["dec_norm_g"], st["dec_norm_b"]).astype(bf)
        logits_i = mm(y, st["h_w"], st["h_b"])
        out.append(logits_i)
        mx = jnp.max(logits_i, -1, keepdims=True)
        lane = jnp.arange(C)[None]
        prev = jnp.min(jnp.where(logits_i == mx, lane, C), -1,
                       keepdims=True).astype(jnp.int32)
    return jnp.stack(out, axis=1)


def test_kernel_math_matches_xla_decode(setup):
    """The kernel's exact math (jnp transcription) reproduces the XLA
    greedy decode: bf16-class logit deltas, matching argmax transcripts up
    to EOS on every sequence (post-divergence positions excluded — greedy
    feedback amplifies any first flip)."""
    params, memory = setup
    T = CFG.max_label_length + 1
    logits_ref, ids_ref = parseq_greedy_decode(
        params, memory, CFG, jnp.bfloat16, early_exit=False)
    layer = params["dec"][0]
    mem_k = L.linear(layer["cross_attn"]["k"], memory, jnp.bfloat16).astype(jnp.bfloat16)
    mem_v = L.linear(layer["cross_attn"]["v"], memory, jnp.bfloat16).astype(jnp.bfloat16)
    st = stack_decode_weights(params, CFG)
    logits = _simulate_kernel(st, mem_k, mem_v, CFG, T)
    assert not np.isnan(np.asarray(logits)).any()
    # step-0 logits are computed from identical inputs on both sides
    np.testing.assert_allclose(np.asarray(logits[:, 0]),
                               np.asarray(logits_ref[:, 0]),
                               rtol=0.1, atol=0.05)
    ids = np.asarray(jnp.argmax(logits, -1))
    ref = np.asarray(ids_ref)
    agree = (ids == ref).mean()
    assert agree > 0.9, f"transcript agreement {agree}"


def test_prestack_decoder_idempotent_and_gated(setup):
    import dataclasses

    params, _ = setup
    pcfg = dataclasses.replace(CFG, decode_impl="pallas")
    pre = prestack_pallas_decoder(params, pcfg)
    assert "_dec_stacked" in pre and "_dec_stacked" not in params
    assert prestack_pallas_decoder(pre, pcfg) is pre
    assert prestack_pallas_decoder(params, CFG) is params


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="Pallas TPU lowering; interpret mode mis-executes "
                           "this kernel's dynamic stores (see module doc)")
def test_kernel_lowering_matches_xla_on_tpu():
    # lane-aligned geometry (the serving dispatch gates on embed_dim % 128)
    import dataclasses

    from tuatara_tpu.ops.pallas.decode import greedy_decode_pallas

    cfg128 = dataclasses.replace(CFG, embed_dim=128)
    params = init_parseq_params(jax.random.PRNGKey(0), cfg128)
    memory = parseq_encode(
        params, jnp.asarray(np.random.default_rng(0).random((8, 32, 128, 3)),
                            jnp.float32), cfg128, jnp.bfloat16)
    T = cfg128.max_label_length + 1
    logits_ref, ids_ref = parseq_greedy_decode(
        params, memory, cfg128, jnp.bfloat16, early_exit=False)
    layer = params["dec"][0]
    mem_k = L.linear(layer["cross_attn"]["k"], memory, jnp.bfloat16).astype(jnp.bfloat16)
    mem_v = L.linear(layer["cross_attn"]["v"], memory, jnp.bfloat16).astype(jnp.bfloat16)
    st = stack_decode_weights(params, cfg128)
    logits = np.asarray(greedy_decode_pallas(
        mem_k, mem_v, st, cfg128.dec_heads, T, cfg128.charset_size + 1,
        cfg128.num_tokens - 2, cfg128.layer_norm_eps, tb=8))
    assert not np.isnan(logits).any()
    agree = (logits.argmax(-1) == np.asarray(ids_ref)).mean()
    assert agree > 0.9, f"transcript agreement {agree}"


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="Pallas TPU lowering (see module doc)")
@pytest.mark.slow
def test_trained_weights_accuracy_parity_on_tpu():
    """Serving with both Pallas kernels preserves ACCURACY on trained
    weights: word accuracy equal and CER within noise vs the XLA path on
    held-out synthetic pages (evals/pallas_parity_d128.json records the
    full 16-page measurement; this is a 4-page regression guard)."""
    import dataclasses
    import os

    from tuatara_tpu.api import OcrEngine
    from tuatara_tpu.config import OcrConfig
    from tuatara_tpu.utils.data import synthetic_text_pages
    from tuatara_tpu.utils.metrics import evaluate_engine

    gw = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "evals", "synthetic_weights_d128")
    if not os.path.isdir(gw):
        pytest.skip("d128 synthetic weights not present")
    cfg = OcrConfig(canvas_size=256, max_boxes=32, rec_buckets=(32,),
                    max_label_length=8)
    eng_x = OcrEngine(cfg, weights_dir=gw)
    eng_p = OcrEngine(dataclasses.replace(
        cfg, encoder_impl="pallas", decode_impl="pallas"), weights_dir=gw)
    held = synthetic_text_pages(4, eng_x.tokenizer,
                                np.random.default_rng(888), size=256,
                                words_per_page=8, max_len=8)
    imgs = [(p * 255).astype(np.uint8) for p in held["pages"]]
    ex = evaluate_engine(eng_x, imgs, held["truths"], iou_threshold=0.5)
    ep = evaluate_engine(eng_p, imgs, held["truths"], iou_threshold=0.5)
    assert ex["matched"] == ep["matched"] and ex["matched"] >= 20
    assert abs(ex["word_acc"] - ep["word_acc"]) <= 0.1
    assert abs(ex["cer"] - ep["cer"]) <= 0.05
