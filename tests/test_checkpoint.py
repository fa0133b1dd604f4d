"""Checkpoint/resume: a resumed run must continue bit-identically."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tuatara_tpu.config import CraftConfig, ParseqConfig
from tuatara_tpu.tokenizer import EXTENDED_CHARSET, Tokenizer
from tuatara_tpu.train.checkpoint import latest_step, load_checkpoint, save_checkpoint
from tuatara_tpu.train.trainer import init_train_state, train_step

TINY_CRAFT = CraftConfig(
    stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
    up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
    head_channels=(8, 8, 8, 8),
)
TINY_PARSEQ = ParseqConfig(
    embed_dim=32, enc_depth=1, enc_heads=4, dec_heads=4, max_label_length=7,
)


def _batch(rng, B=2, N=4, T=7):
    return {
        "pages": jnp.asarray(rng.random((B, 64, 64, 3)), jnp.float32),
        "heat": jnp.asarray(rng.random((B, 32, 32, 2)), jnp.float32),
        "crops": jnp.asarray(rng.random((N, 32, 128, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 90, (N, T + 2)), jnp.int32),
        "lengths": jnp.full((N,), 5, jnp.int32),
    }


@pytest.mark.slow
def test_checkpoint_resume_bit_identical(tmp_path, rng):
    state, tx = init_train_state(jax.random.PRNGKey(0), TINY_CRAFT, TINY_PARSEQ)
    step = jax.jit(functools.partial(
        train_step, tx=tx, craft_cfg=TINY_CRAFT, parseq_cfg=TINY_PARSEQ))
    batch = _batch(rng)
    key = jax.random.PRNGKey(1)

    # run 1: two steps straight through
    s1, _ = step(state, batch, key)
    s2a, m2a = step(s1, batch, key)

    # run 2: checkpoint after step 1, reload into a fresh template, continue
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, s1)
    assert latest_step(ckpt) == 1
    template, _ = init_train_state(jax.random.PRNGKey(42), TINY_CRAFT, TINY_PARSEQ)
    restored = load_checkpoint(ckpt, template)
    s2b, m2b = step(restored, batch, key)

    np.testing.assert_allclose(float(m2a["loss"]), float(m2b["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s2a.parseq_params), jax.tree.leaves(s2b.parseq_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_checkpoint_servable_by_engine(tmp_path, rng):
    """A training checkpoint is directly a serving weights_dir."""
    from tuatara_tpu.api import OcrEngine
    from tuatara_tpu.config import OcrConfig

    state, tx = init_train_state(jax.random.PRNGKey(0), TINY_CRAFT, TINY_PARSEQ)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state)
    cfg = OcrConfig(canvas_size=128, max_boxes=16, rec_buckets=(16,), max_label_length=7)
    eng = OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, weights_dir=ckpt)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    out = eng.run(img)
    assert isinstance(out, list)


def test_orbax_roundtrip(tmp_path, rng):
    pytest.importorskip("orbax.checkpoint")
    from tuatara_tpu.train.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    state, tx = init_train_state(jax.random.PRNGKey(0), TINY_CRAFT, TINY_PARSEQ)
    save_checkpoint_orbax(str(tmp_path), state)
    template, _ = init_train_state(jax.random.PRNGKey(9), TINY_CRAFT, TINY_PARSEQ)
    back = load_checkpoint_orbax(str(tmp_path), template)
    for a, b in zip(jax.tree.leaves(state.parseq_params),
                    jax.tree.leaves(back.parseq_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(back.step) == 0


def test_extended_charset_tokenizer():
    tok = Tokenizer(charset=EXTENDED_CHARSET)
    assert tok.vocab_size == 98  # EOS + 95 + BOS + PAD
    ids, n = tok.encode("ab cd", max_length=25)
    assert tok.ids_to_text(ids[1:]) == "ab cd"  # space survives
