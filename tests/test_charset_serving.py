"""Extended-charset serving, end to end.

The reference's own TODO is a space-aware recognizer retrain (README.md:42);
the training stack here supports it (tokenizer.EXTENDED_CHARSET,
ParseqConfig(charset_size=95)). These tests prove the SERVING side holds up
its end: a recognizer trained with a non-reference charset, saved with
`save_weights_dir(..., charset=...)`, is decoded by a fresh
`OcrEngine(weights_dir=...)` with the right table — spaces and all — and a
charset/head mismatch fails loudly at engine construction instead of
misdecoding every id past the shifted slot.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tuatara_tpu.api import OcrEngine
from tuatara_tpu.config import CraftConfig, OcrConfig, ParseqConfig
from tuatara_tpu.models.craft import init_craft_params
from tuatara_tpu.tokenizer import EXTENDED_CHARSET, Tokenizer
from tuatara_tpu.train.run import evaluate_recognizer, fit_recognizer
from tuatara_tpu.utils.data import render_word
from tuatara_tpu.utils.weights import save_weights_dir

TINY_CRAFT = CraftConfig(
    stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
    up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
    head_channels=(8, 8, 8, 8),
)
TINY_EXT_PARSEQ = ParseqConfig(embed_dim=32, enc_depth=1, enc_heads=4,
                               dec_heads=4, max_label_length=7,
                               charset_size=95)  # standard 94 + space

SPACE_TEXTS = ["a b", "no go", "hi ho", "to do", "x yz", "we me"]


def _space_word_data(tok: Tokenizer, max_length: int):
    rng = np.random.default_rng(7)
    crops, labels, lengths = [], [], []
    for t in SPACE_TEXTS:
        ids, n = tok.encode(t, max_length)
        crops.append(render_word(t, rng))
        labels.append(ids)
        lengths.append(n)
    return {
        "crops": np.stack(crops),
        "labels": np.stack(labels).astype(np.int32),
        "lengths": np.asarray(lengths, np.int32),
        "texts": list(SPACE_TEXTS),
    }


@pytest.fixture(scope="module")
def ext_weights_dir(tmp_path_factory):
    """Train the tiny extended-charset recognizer on space-containing words
    (overfit) and persist it as a servable weights dir WITH the charset."""
    tok = Tokenizer(charset=EXTENDED_CHARSET)
    assert tok.vocab_size == TINY_EXT_PARSEQ.num_tokens == 98
    data = _space_word_data(tok, TINY_EXT_PARSEQ.max_label_length)
    params, losses = fit_recognizer(
        steps=500, cfg=TINY_EXT_PARSEQ, tokenizer=tok, data=data,
        lr=3e-3, seed=0, k_perms=6, log_every=100,
    )
    acc, texts = evaluate_recognizer(params, data, TINY_EXT_PARSEQ, tok)
    assert acc == 1.0, f"tiny overfit failed: {texts} (losses {losses})"

    d = tmp_path_factory.mktemp("ext_weights")
    craft_p = jax.device_get(
        init_craft_params(jax.random.PRNGKey(0), TINY_CRAFT))
    save_weights_dir(str(d), craft_p, jax.device_get(params),
                     craft_config=TINY_CRAFT, parseq_config=TINY_EXT_PARSEQ,
                     charset=EXTENDED_CHARSET)
    return str(d), data


@pytest.mark.slow
def test_engine_derives_tokenizer_from_stored_charset(ext_weights_dir):
    d, _ = ext_weights_dir
    eng = OcrEngine(OcrConfig(max_label_length=7), weights_dir=d)
    assert eng.tokenizer.charset == EXTENDED_CHARSET
    assert eng.tokenizer.vocab_size == eng.parseq_config.num_tokens == 98
    assert " " in eng.tokenizer.stoi


@pytest.mark.slow
def test_extended_charset_transcripts_through_serving_path(ext_weights_dir):
    """The engine's OWN crop+recognize program + its OWN tokenizer produce
    the space-containing transcripts.

    Detection is bypassed (a tiny overfit recognizer can't survive the
    resampling a from-scratch detector's approximate boxes introduce): the
    trained crops are pasted onto a page at known pixel-exact windows and
    fed through the same `_crop_recognize_fn` program `run_pages` dispatches,
    then decoded exactly as `_finalize` does."""
    d, data = ext_weights_dir
    eng = OcrEngine(OcrConfig(max_label_length=7), weights_dir=d)

    n = len(SPACE_TEXTS)
    rh, rw = eng.config.rec_height, eng.config.rec_width
    H, W = 64, 16 + n * (rw + 16)
    page = np.full((H, W, 3), 255, np.uint8)
    K = eng.config.max_boxes
    rects = np.zeros((1, K, 4), np.float32)
    valid = np.zeros((1, K), bool)
    for i in range(n):
        x0, y0 = 16 + i * (rw + 16), 16
        page[y0:y0 + rh, x0:x0 + rw] = np.clip(
            data["crops"][i] * 255.0, 0, 255).astype(np.uint8)
        # crop_rects windows are boundingRect-style (ceil(max)+1 exclusive):
        # [x0, y0, x0+rw-1, y0+rh-1] selects exactly the pasted pixels, so
        # the bilinear resample to (rh, rw) is the identity.
        rects[0, i] = [x0, y0, x0 + rw - 1, y0 + rh - 1]
        valid[0, i] = True

    bucket = eng._bucket(n)
    fn = eng._crop_recognize_fn(1, K, bucket, H, W, 3)
    ids, conf = fn(eng.parseq_params, jnp.asarray(page[None]),
                   jnp.asarray(rects), jnp.asarray(valid))
    texts = eng.tokenizer.decode_ids(np.asarray(ids)[:n])
    assert texts == SPACE_TEXTS
    assert all(" " in t for t in texts)


@pytest.mark.slow
def test_explicit_config_charset_overrides(ext_weights_dir):
    d, _ = ext_weights_dir
    eng = OcrEngine(OcrConfig(max_label_length=7, charset=EXTENDED_CHARSET),
                    weights_dir=d)
    assert eng.tokenizer.charset == EXTENDED_CHARSET


def test_charset_head_mismatch_raises_at_construction(tmp_path):
    """charset_size=95 weights with NO persisted charset + the default
    94-char table must refuse to construct (ids >= 88 would misdecode and
    itos could index out of range), with guidance in the message."""
    parseq_cfg = dataclasses.replace(TINY_EXT_PARSEQ)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    from tuatara_tpu.models.parseq import init_parseq_params

    save_weights_dir(
        str(tmp_path), jax.device_get(init_craft_params(k1, TINY_CRAFT)),
        jax.device_get(init_parseq_params(k2, parseq_cfg)),
        craft_config=TINY_CRAFT, parseq_config=parseq_cfg,
    )
    with pytest.raises(ValueError, match="charset"):
        OcrEngine(OcrConfig(max_label_length=7), weights_dir=str(tmp_path))


def test_default_engine_still_constructs():
    eng = OcrEngine(OcrConfig(max_label_length=7),
                    craft_config=TINY_CRAFT,
                    parseq_config=ParseqConfig(embed_dim=32, enc_depth=1,
                                               enc_heads=4, dec_heads=4,
                                               max_label_length=7))
    assert eng.tokenizer.vocab_size == eng.parseq_config.num_tokens == 97


def test_reference_bugcompat_mode_still_constructs():
    # reference_charset=True pairs a 98-entry table with a 97-class head —
    # that off-by-one IS the documented reference behavior (SURVEY quirk 8).
    eng = OcrEngine(OcrConfig(max_label_length=7, reference_charset=True),
                    craft_config=TINY_CRAFT,
                    parseq_config=ParseqConfig(embed_dim=32, enc_depth=1,
                                               enc_heads=4, dec_heads=4,
                                               max_label_length=7))
    assert eng.tokenizer.vocab_size == 98


@pytest.mark.slow
def test_nar_decode_mode_on_trained_model(ext_weights_dir):
    """decode_mode='nar' (single-pass + cloze refinement) through the
    engine's recognition program reads the overfit model's own training
    crops — the PLM objective's permutations cover the no-context cloze,
    so NAR accuracy tracks AR on a properly trained model."""
    d, data = ext_weights_dir
    eng = OcrEngine(OcrConfig(max_label_length=7, decode_mode="nar"),
                    weights_dir=d)
    n = len(SPACE_TEXTS)
    ids, conf = eng._recognize_fn(n)(eng.parseq_params,
                                     jnp.asarray(data["crops"]))
    texts = eng.tokenizer.decode_ids(np.asarray(ids))
    hits = sum(t == w for t, w in zip(texts, SPACE_TEXTS))
    assert hits >= n - 1, texts


def test_reference_bugcompat_overrides_stored_charset(tmp_path):
    """An explicit reference_charset=True must NOT be silently overridden
    by the charset persisted next to the weights: bug-compat decoding is a
    user request (the CLI's --charset reference sets exactly this flag)."""
    from tuatara_tpu.models.parseq import init_parseq_params
    from tuatara_tpu.tokenizer import REFERENCE_CHARSET, STANDARD_CHARSET

    parseq_cfg = dataclasses.replace(TINY_EXT_PARSEQ, charset_size=94)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    save_weights_dir(
        str(tmp_path), jax.device_get(init_craft_params(k1, TINY_CRAFT)),
        jax.device_get(init_parseq_params(k2, parseq_cfg)),
        craft_config=TINY_CRAFT, parseq_config=parseq_cfg,
        charset=STANDARD_CHARSET,
    )
    eng = OcrEngine(OcrConfig(max_label_length=7, reference_charset=True),
                    weights_dir=str(tmp_path))
    assert eng.tokenizer.charset == REFERENCE_CHARSET
    # Without the flag the stored table still wins over the default.
    eng2 = OcrEngine(OcrConfig(max_label_length=7), weights_dir=str(tmp_path))
    assert eng2.tokenizer.charset == STANDARD_CHARSET
