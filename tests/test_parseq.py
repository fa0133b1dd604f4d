"""PARSEQ model tests: shapes, and scan-decode vs full-decode consistency.

The KV-cached `lax.scan` greedy decode is an inference-optimized rewrite of
the full-sequence decoder; the two must produce identical logits on the same
prefix. That internal-consistency check is the strongest parity evidence
available without pretrained checkpoints (SURVEY.md §4.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tuatara_tpu.config import ParseqConfig
from tuatara_tpu.models.parseq import (
    init_parseq_params,
    parseq_beam_decode,
    parseq_decode,
    parseq_encode,
    parseq_forward,
    parseq_greedy_decode,
    parseq_refine,
    refine_mask,
)

# Tiny config: same topology, small dims, so the 1-core CPU host can compile
# it quickly.
CFG = ParseqConfig(
    embed_dim=32, enc_depth=2, enc_heads=4, dec_heads=4,
    max_label_length=7, charset_size=94,
)


@pytest.fixture(scope="module")
def setup():
    params = init_parseq_params(jax.random.PRNGKey(0), CFG)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (3, 32, 128, 3))
    memory = jax.jit(lambda p, x: parseq_encode(p, x, CFG, jnp.float32))(params, imgs)
    return params, imgs, memory


def test_encoder_shape(setup):
    _, _, memory = setup
    assert memory.shape == (3, CFG.seq_len, CFG.embed_dim)
    assert CFG.seq_len == 128  # 8x16 patches of 4x8 over 32x128


def test_greedy_decode_shapes(setup):
    params, _, memory = setup
    logits, ids = jax.jit(
        lambda p, m: parseq_greedy_decode(p, m, CFG, jnp.float32)
    )(params, memory)
    T = CFG.max_label_length + 1
    assert logits.shape == (3, T, CFG.charset_size + 1)
    assert ids.shape == (3, T)
    # ids are the argmax of logits (greedy)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(logits).argmax(-1))


def test_scan_decode_matches_full_decode(setup):
    """Teacher-forcing the scan's own output through the full decoder must
    reproduce the scan's logits exactly (same math, different schedule)."""
    params, _, memory = setup
    logits, ids = jax.jit(
        lambda p, m: parseq_greedy_decode(p, m, CFG, jnp.float32, early_exit=False)
    )(params, memory)
    T = CFG.max_label_length + 1
    bos = CFG.num_tokens - 2
    tgt_in = jnp.concatenate(
        [jnp.full((3, 1), bos, jnp.int32), ids[:, :-1].astype(jnp.int32)], axis=1
    )
    causal = (jnp.arange(T)[None, :] <= jnp.arange(T)[:, None])[None, None]
    full = jax.jit(
        lambda p, m, t: parseq_decode(p, m, t, CFG, query_mask=causal,
                                      compute_dtype=jnp.float32)
    )(params, memory, tgt_in)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


def test_early_exit_matches_full_up_to_eos(setup):
    """Early-exit while_loop decode agrees with the full scan on every
    position up to (and including) each sequence's first EOS; later
    positions are EOS-certain by construction."""
    params, _, memory = setup
    lf, idf = jax.jit(
        lambda p, m: parseq_greedy_decode(p, m, CFG, jnp.float32, early_exit=False)
    )(params, memory)
    le, ide = jax.jit(
        lambda p, m: parseq_greedy_decode(p, m, CFG, jnp.float32, early_exit=True)
    )(params, memory)
    idf, ide = np.asarray(idf), np.asarray(ide)
    for row_f, row_e in zip(idf, ide):
        # Agreement holds up to each sequence's own first EOS (positions
        # after it are either identically generated while the batch is still
        # alive, or EOS-certain filler after the batch stops — both ignored
        # by truncate-at-EOS decoding).
        eos_f = np.where(row_f == 0)[0]
        upto = (eos_f[0] + 1) if len(eos_f) else len(row_f)
        np.testing.assert_array_equal(row_e[:upto], row_f[:upto])


@pytest.mark.slow
def test_beam1_matches_greedy(setup):
    """Beam search with beam_size=1 must reproduce greedy decode's
    transcript (same argmax path)."""
    params, _, memory = setup
    _, gids = jax.jit(
        lambda p, m: parseq_greedy_decode(p, m, CFG, jnp.float32, early_exit=False)
    )(params, memory)
    bids, _ = jax.jit(
        lambda p, m: parseq_beam_decode(p, m, CFG, beam_size=1,
                                        compute_dtype=jnp.float32)
    )(params, memory)
    gids, bids = np.asarray(gids), np.asarray(bids)
    for g, b in zip(gids, bids):
        eos = np.where(g == 0)[0]
        upto = (eos[0] + 1) if len(eos) else len(g)
        np.testing.assert_array_equal(b[:upto], g[:upto])


@pytest.mark.slow
def test_beam_search_scores_no_worse_than_greedy(setup):
    """A wider beam's (unnormalized-comparable) sequence log-prob is >= the
    greedy path's for every crop."""
    params, _, memory = setup

    def seq_logprob(ids):
        # teacher-force and accumulate log p of the chosen tokens up to EOS
        T = CFG.max_label_length + 1
        bos = CFG.num_tokens - 2
        tgt_in = jnp.concatenate(
            [jnp.full((ids.shape[0], 1), bos, jnp.int32), ids[:, :-1].astype(jnp.int32)], 1)
        causal = (jnp.arange(T)[None, :] <= jnp.arange(T)[:, None])[None, None]
        logits = parseq_decode(params, memory, tgt_in, CFG, query_mask=causal,
                               compute_dtype=jnp.float32)
        logp = jax.nn.log_softmax(logits, -1)
        tok_lp = np.asarray(jnp.take_along_axis(logp, ids[..., None], -1)[..., 0])
        out = []
        for row_lp, row_ids in zip(tok_lp, np.asarray(ids)):
            eos = np.where(row_ids == 0)[0]
            upto = (eos[0] + 1) if len(eos) else len(row_ids)
            out.append(row_lp[:upto].sum())
        return np.array(out)

    _, gids = parseq_greedy_decode(params, memory, CFG, jnp.float32, early_exit=False)
    bids, _ = parseq_beam_decode(params, memory, CFG, beam_size=4,
                                 compute_dtype=jnp.float32)
    g_lp = seq_logprob(gids)
    b_lp = seq_logprob(bids)
    assert (b_lp >= g_lp - 1e-4).all(), (b_lp, g_lp)


def test_refine_mask_blocks_own_token():
    m = np.asarray(refine_mask(5))
    for i in range(5):
        for j in range(5):
            assert m[i, j] == (j != i + 1)


@pytest.mark.slow
def test_refine_shapes_and_changes_logits(setup):
    params, _, memory = setup
    logits, _ = parseq_greedy_decode(params, memory, CFG, jnp.float32)
    refined = jax.jit(
        lambda p, m, l: parseq_refine(p, m, l, CFG, jnp.float32)
    )(params, memory, logits)
    assert refined.shape == logits.shape
    assert np.isfinite(np.asarray(refined)).all()


def test_full_forward(setup):
    params, imgs, _ = setup
    logits = jax.jit(lambda p, x: parseq_forward(p, x, CFG, jnp.float32))(params, imgs)
    T = CFG.max_label_length + 1
    assert logits.shape == (3, T, CFG.charset_size + 1)


def test_batch_invariance(setup):
    """Row i of a batched decode equals decoding row i alone (no cross-crop
    leakage through the batch dimension)."""
    params, _, memory = setup
    logits, _ = jax.jit(
        lambda p, m: parseq_greedy_decode(p, m, CFG, jnp.float32)
    )(params, memory)
    solo, _ = jax.jit(
        lambda p, m: parseq_greedy_decode(p, m, CFG, jnp.float32)
    )(params, memory[1:2])
    np.testing.assert_allclose(np.asarray(logits[1]), np.asarray(solo[0]),
                               rtol=1e-4, atol=1e-4)


def test_nar_decode_contract(setup):
    """Single-pass NAR decode: right shapes, valid ids, deterministic, and
    it is genuinely memory-dependent (different crops -> different logits)."""
    from tuatara_tpu.models.parseq import parseq_nar_decode

    params, _, memory = setup
    T = CFG.max_label_length + 1
    logits = jax.jit(
        lambda p, m: parseq_nar_decode(p, m, CFG, jnp.float32))(params, memory)
    assert logits.shape == (3, T, CFG.charset_size + 1)
    ids = np.asarray(jnp.argmax(logits, -1))
    assert ids.min() >= 0 and ids.max() <= CFG.charset_size
    logits2 = jax.jit(
        lambda p, m: parseq_nar_decode(p, m, CFG, jnp.float32))(params, memory)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))
    assert not np.allclose(np.asarray(logits[0]), np.asarray(logits[1]))


def test_forward_nar_mode(setup):
    """parseq_forward(ar=False) runs NAR + refinement with the AR contract's
    output shape."""
    params, imgs, _ = setup
    logits = jax.jit(
        lambda p, x: parseq_forward(p, x, CFG, jnp.float32, ar=False)
    )(params, imgs)
    assert logits.shape == (3, CFG.max_label_length + 1, CFG.charset_size + 1)


def test_fused_qkv_encoder_bit_identical(setup):
    """fuse_parseq_encoder is EXACT: each matmul output column is an
    independent dot product, so concatenating q/k/v weight columns changes
    no column's math — f32, bf16, and the int8 path (per-column scales:
    quantize-after-fuse == quantize-before-fuse) must all be bit-identical
    to the split layout. (The engine does NOT apply it — measured slower
    on v5e, see the docstring — but the transform must stay exact.)"""
    from tuatara_tpu.models.parseq import (
        fuse_parseq_encoder,
        quantize_parseq_encoder,
    )

    params, imgs, _ = setup
    fused = fuse_parseq_encoder(params)
    assert "qkv" in fused["enc"][0]["attn"]
    # Idempotent; decoder untouched (K/V-cached decode indexes split keys).
    assert "qkv" in fuse_parseq_encoder(fused)["enc"][0]["attn"]
    assert "k" in fused["dec"][0]["self_attn"]

    enc = jax.jit(lambda p, x, dt: parseq_encode(p, x, CFG, dt),
                  static_argnums=2)
    for dt in (jnp.float32, jnp.bfloat16):
        a = enc(params, imgs, dt)
        b = enc(fused, imgs, dt)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    qa = enc(quantize_parseq_encoder(fused), imgs, jnp.bfloat16)
    qb = enc(quantize_parseq_encoder(params), imgs, jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(qa), np.asarray(qb))

    # Full forward through the fused encoder still decodes identically.
    fa = jax.jit(lambda p, x: parseq_forward(p, x, CFG, jnp.float32))
    np.testing.assert_array_equal(
        np.asarray(fa(params, imgs)), np.asarray(fa(fused, imgs)))
