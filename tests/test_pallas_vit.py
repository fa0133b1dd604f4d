"""Fused Pallas ViT encoder blocks == the XLA block chain (interpret mode).

The kernel (ops/pallas/vit.py) is the serving-speed path for the PARSEQ
encoder; these tests pin its math against models.layers.vit_block — same
fp32 residual stream, bf16 matmuls, exact GELU — to bf16-accumulation
tolerance on CPU interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tuatara_tpu.models import layers as L
from tuatara_tpu.ops.pallas.vit import stack_vit_block_weights, vit_blocks_pallas


def _blocks(rng_key, n_blocks, d, mlp_ratio=4.0):
    keys = jax.random.split(rng_key, n_blocks)
    return [L.init_vit_block(k, d, mlp_ratio) for k in keys]


def _xla_chain(blocks, x, heads, eps=1e-6):
    for blk in blocks:
        x = L.vit_block(blk, x, heads, eps, jnp.bfloat16)
    return x


@pytest.mark.parametrize("n_blocks,tb", [(2, 4), (3, 8)])
def test_fused_blocks_match_xla(rng, n_blocks, tb):
    d, s, heads = 128, 128, 4
    blocks = _blocks(jax.random.PRNGKey(0), n_blocks, d)
    n = 16
    x = jnp.asarray(rng.standard_normal((n, s, d)), jnp.float32)

    want = np.asarray(_xla_chain(blocks, x, heads))
    stacked = stack_vit_block_weights(blocks)
    got = np.asarray(vit_blocks_pallas(
        x, stacked, heads, tb=tb, blocks_per_call=2, interpret=True))

    # bf16 matmuls accumulate in different orders between the two lowerings;
    # tolerance is the bf16 epsilon regime scaled by depth.
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
    err = np.abs(got - want) / (np.abs(want) + 1)
    assert float(err.mean()) < 5e-3, f"mean rel err {err.mean()}"


def test_stack_weights_fuses_qkv(rng):
    d = 64
    blocks = _blocks(jax.random.PRNGKey(1), 2, d)
    st = stack_vit_block_weights(blocks)
    assert st["qkv_w"].shape == (2, d, 3 * d)
    assert st["f1_w"].shape == (2, d, 4 * d)
    np.testing.assert_allclose(
        np.asarray(st["qkv_w"][0, :, :d].astype(jnp.float32)),
        np.asarray(blocks[0]["attn"]["q"]["w"].astype(jnp.bfloat16)
                   .astype(jnp.float32)))


def test_encoder_impl_config_switch(rng):
    """parseq_encode(encoder_impl='pallas') matches the XLA encoder on the
    same weights to bf16 tolerance (full encoder incl. patch embed)."""
    import dataclasses

    from tuatara_tpu.config import ParseqConfig
    from tuatara_tpu.models.parseq import init_parseq_params, parseq_encode

    cfg = ParseqConfig(embed_dim=64, enc_depth=2, enc_heads=4,
                       max_label_length=7)
    params = init_parseq_params(jax.random.PRNGKey(2), cfg)
    crops = jnp.asarray(rng.random((8, 32, 128, 3)), jnp.float32)

    want = np.asarray(parseq_encode(params, crops, cfg, jnp.bfloat16))
    pcfg = dataclasses.replace(cfg, encoder_impl="pallas")
    got = np.asarray(parseq_encode(params, crops, pcfg, jnp.bfloat16,
                                   _pallas_interpret=True))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_prestacked_encoder_weights_identical(rng):
    """prestack_pallas_encoder stores concrete stacked weights that make
    parseq_encode produce BIT-identical outputs to the per-call stack, and
    is a no-op for xla/quantized configurations."""
    import dataclasses

    from tuatara_tpu.config import ParseqConfig
    from tuatara_tpu.models.parseq import (
        init_parseq_params, parseq_encode, prestack_pallas_encoder,
        quantize_parseq_encoder,
    )

    cfg = ParseqConfig(embed_dim=64, enc_depth=2, enc_heads=4,
                       max_label_length=7, encoder_impl="pallas")
    params = init_parseq_params(jax.random.PRNGKey(3), cfg)
    crops = jnp.asarray(rng.random((8, 32, 128, 3)), jnp.float32)

    pre = prestack_pallas_encoder(params, cfg)
    assert "_enc_stacked" in pre and "_enc_stacked" not in params
    assert not isinstance(pre["_enc_stacked"]["qkv_w"], jax.core.Tracer)
    # idempotent
    assert prestack_pallas_encoder(pre, cfg) is pre

    want = np.asarray(parseq_encode(params, crops, cfg, jnp.bfloat16,
                                    _pallas_interpret=True))
    got = np.asarray(parseq_encode(pre, crops, cfg, jnp.bfloat16,
                                   _pallas_interpret=True))
    np.testing.assert_array_equal(got, want)

    # no-ops: xla impl, and an int8-quantized encoder
    xcfg = dataclasses.replace(cfg, encoder_impl="xla")
    assert prestack_pallas_encoder(params, xcfg) is params
    qparams = quantize_parseq_encoder(params)
    assert "_enc_stacked" not in prestack_pallas_encoder(qparams, cfg)
