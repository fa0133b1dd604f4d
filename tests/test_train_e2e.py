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
