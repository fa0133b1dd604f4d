"""End-to-end training proof: the PARSEQ training stack can actually learn.

Overfits a tiny recognizer on a handful of synthetic rendered words and
checks greedy decode reproduces them exactly — exercising data rendering,
label encoding, PLM loss/masks, optimizer, and the inference decode path in
one loop. (The reference has no training at all; this pins ours working.)
"""

import numpy as np
import pytest

from tuatara_tpu.config import ParseqConfig
from tuatara_tpu.tokenizer import Tokenizer
from tuatara_tpu.train.run import evaluate_recognizer, fit_recognizer
from tuatara_tpu.utils.data import detection_batch, gaussian_heatmap_targets, word_batch

CFG = ParseqConfig(embed_dim=48, enc_depth=2, enc_heads=4, dec_heads=4,
                   max_label_length=7)


def test_word_batch_shapes(rng):
    tok = Tokenizer()
    d = word_batch(4, tok, rng, max_length=7, max_len=5)
    assert d["crops"].shape == (4, 32, 128, 3)
    assert d["labels"].shape == (4, 9)
    assert all(1 <= len(t) <= 5 for t in d["texts"])
    # labels decode back to texts
    for ids, text in zip(d["labels"], d["texts"]):
        assert tok.ids_to_text(ids[1:]) == text


def test_heatmap_targets():
    t = gaussian_heatmap_targets([(10, 10, 40, 18)], [4], 32, 64)
    assert t.shape == (32, 64, 2)
    assert t[:, :, 0].max() > 0.9      # region peaks at char centers
    assert t[:, :, 1].max() > 0.9      # affinity between chars
    assert t[0, 0, 0] < 0.1            # background quiet


def test_detection_batch(rng):
    d = detection_batch(2, rng, size=64)
    assert d["pages"].shape == (2, 64, 64, 3)
    assert d["heat"].shape == (2, 32, 32, 2)
    assert d["heat"].max() > 0.9


@pytest.mark.slow
def test_detector_learns_synthetic_text():
    """From-scratch detector training proof: a tiny CRAFT trained briefly on
    synthetic pages produces region heat concentrated on held-out text (the
    golden fixture weights come from the same loop at more steps and
    localize real FUNSD words)."""
    from tuatara_tpu.config import CraftConfig
    from tuatara_tpu.models.craft import craft_forward
    from tuatara_tpu.train.run import fit_detector

    cfg = CraftConfig(stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
                      up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
                      head_channels=(8, 8, 8, 8))
    params, losses = fit_detector(steps=150, cfg=cfg, seed=0, log_every=50)
    assert losses[-1] < losses[0] * 0.5, losses

    import jax.numpy as jnp

    held = detection_batch(2, np.random.default_rng(99), size=96)
    scores, _ = craft_forward(params, jnp.asarray(held["pages"]), cfg)
    region = np.asarray(scores[..., 0])
    target = held["heat"][..., 0]
    on_text = region[target > 0.5].mean()
    off_text = region[target < 0.05].mean()
    assert on_text > off_text + 0.1, (on_text, off_text)


@pytest.mark.slow
def test_overfit_tiny_recognizer(rng):
    """Full PARSEQ recipe: 6 mirrored permutations so both the AR path and
    the cloze-refinement pattern are trained (refinement on a
    single-permutation model is untrained attention and rightly degrades —
    that asymmetry is itself the PARSEQ design)."""
    tok = Tokenizer()
    data = word_batch(6, tok, np.random.default_rng(3), max_length=7,
                      min_len=2, max_len=4)
    params, losses = fit_recognizer(
        steps=500, cfg=CFG, tokenizer=tok, data=data, lr=3e-3, seed=0,
        k_perms=6, log_every=200,
    )
    assert losses[-1] < losses[0] * 0.2, losses
    acc, texts = evaluate_recognizer(params, data, CFG, tok)
    assert acc >= 0.5, (acc, texts, data["texts"])


def test_font_render_and_word_pool(rng):
    """TrueType production-data path: style='font' crops, the compact uint8
    pool format, and in-place refresh (scripts/train_production.py's
    substrate)."""
    from tuatara_tpu.utils.data import (
        render_word_gray, system_fonts, word_pool,
    )

    if not system_fonts():
        pytest.skip("no .ttf fonts installed")
    tok = Tokenizer()
    g = render_word_gray("Hello1", rng)
    assert g.shape == (32, 128) and g.dtype == np.uint8
    assert g.min() < 80 and g.max() > 200  # dark glyphs on light ground

    pool = word_pool(6, tok, rng, max_length=7, max_len=5)
    assert pool["crops_u8"].shape == (6, 32, 128)
    assert pool["labels"].shape == (6, 9)
    assert pool["lengths"].min() >= 1
    # in-place refresh overwrites exactly the requested rows
    before = pool["crops_u8"].copy()
    word_pool(2, tok, np.random.default_rng(5), max_length=7, max_len=5,
              out=pool, start=3)
    assert not np.array_equal(pool["crops_u8"][3:5], before[3:5])
    assert np.array_equal(pool["crops_u8"][:3], before[:3])
    # font-style word_batch decodes labels back to texts
    d = word_batch(3, tok, rng, max_length=7, max_len=5, style="font")
    for ids, text in zip(d["labels"], d["texts"]):
        assert tok.ids_to_text(ids[1:]) == text


def test_augment_gray_u8(rng):
    """On-device augmentation contract: uint8 grayscale -> float32 RGB in
    [0,1], on the uint8 grid, different pixels for different keys (the
    anti-memorization property), identical for identical keys."""
    import jax
    import jax.numpy as jnp

    from tuatara_tpu.train.run import _augment_gray_u8

    crops = jnp.asarray(rng.integers(0, 256, (4, 32, 128), np.uint8))
    a = _augment_gray_u8(crops, jax.random.PRNGKey(0))
    assert a.shape == (4, 32, 128, 3) and a.dtype == jnp.float32
    assert float(a.min()) >= 0.0 and float(a.max()) <= 1.0
    snapped = jnp.round(a * 255.0) / 255.0
    assert float(jnp.abs(a - snapped).max()) < 1e-6
    b = _augment_gray_u8(crops, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    c = _augment_gray_u8(crops, jax.random.PRNGKey(0))
    assert np.array_equal(np.asarray(a), np.asarray(c))


@pytest.mark.slow
def test_fit_recognizer_data_iter_uint8():
    """Streaming uint8 batches through data_iter trains (the production
    trainer's path: host batch -> on-device augment -> PLM step)."""
    from tuatara_tpu.utils.data import system_fonts, word_pool

    if not system_fonts():
        pytest.skip("no .ttf fonts installed")
    tok = Tokenizer()
    pool = word_pool(8, tok, np.random.default_rng(0), max_length=7,
                     max_len=4)
    srng = np.random.default_rng(1)

    def it():
        while True:
            idx = srng.integers(0, 8, 6)
            yield {"crops": pool["crops_u8"][idx],
                   "labels": pool["labels"][idx],
                   "lengths": pool["lengths"][idx]}

    params, losses = fit_recognizer(
        steps=120, batch_size=6, cfg=CFG, tokenizer=tok, data_iter=it(),
        lr=2e-3, seed=0, k_perms=2, grad_clip=1.0, weight_decay=0.01,
        log_every=60)
    assert losses[-1] < losses[0] * 0.6, losses
