"""Tokenizer unit tests, modeled on the reference C1 semantics (tuatara.cpp:25-117)."""

import numpy as np
import pytest

from tuatara_tpu.tokenizer import (
    REFERENCE_CHARSET,
    STANDARD_CHARSET,
    Tokenizer,
)


def onehot_dists(ids, vocab):
    """[L] ids -> [L, C] fake softmax dists peaked at ids."""
    L = len(ids)
    d = np.full((L, vocab), 0.001, dtype=np.float32)
    d[np.arange(L), ids] = 0.9
    return d


def test_vocab_layout():
    tok = Tokenizer()
    assert tok.eos_id == 0
    assert tok.itos[0] == "]"
    assert tok.itos[1] == "0"
    assert tok.itos[-2] == "["
    assert tok.itos[-1] == "P"
    assert tok.vocab_size == 97  # EOS + 94 + BOS + PAD
    assert tok.bos_id == 95
    assert tok.pad_id == 96


def test_reference_vocab_is_95_chars():
    tok = Tokenizer(reference_charset=True)
    assert tok.vocab_size == 98
    # The duplicated backslash: ids 71 and 89 both decode to '\'
    dup = [i for i, c in enumerate(tok.itos) if c == "\\"]
    assert len(dup) == 2


def test_charsets_agree_on_alphanumerics():
    assert STANDARD_CHARSET[:62] == REFERENCE_CHARSET[:62]


def test_decode_simple():
    tok = Tokenizer()
    # "Hi5" then EOS then garbage
    ids = [tok.stoi["H"], tok.stoi["i"], tok.stoi["5"], tok.eos_id, tok.stoi["z"]]
    dists = onehot_dists(ids, tok.vocab_size)[None]
    assert tok.decode(dists) == ["Hi5"]


def test_decode_reference_mode_semantics():
    """Faithful bug-compat: the reference's collapsed eos_id (stoi[']'] ==
    the charset ']' slot, id 88) is DELETED by filter(), while true EOS
    (id 0) decodes to ']' and trips the live char break — so both modes
    truncate at true EOS, and only reference mode drops id-88 positions."""
    tok = Tokenizer()
    slot = tok.stoi["]"]
    assert slot == 87  # duplicate ']' collapsed to the charset slot, not 0
    ids = [tok.stoi["a"], slot, tok.stoi["b"], tok.eos_id, tok.stoi["z"]]
    dists = onehot_dists(ids, tok.vocab_size)[None]
    assert tok.decode(dists, mode="reference") == ["ab"]   # slot deleted, stop at EOS
    assert tok.decode(dists, mode="truncate") == ["a]b"]   # slot renders ']'


def test_decode_raw():
    tok = Tokenizer()
    ids = [tok.stoi["a"], tok.eos_id, tok.stoi["b"]]
    dists = onehot_dists(ids, tok.vocab_size)[None]
    assert tok.decode(dists, raw=True) == ["a]b"]


def test_punctuation_decode_standard_vs_reference():
    """Every punctuation char after '&' shifts by one slot in reference mode."""
    std = Tokenizer()
    ref = Tokenizer(reference_charset=True)
    # In the standard charset "'" is at charset index 68 -> vocab id 69.
    vid = std.stoi["'"]
    assert std.itos[vid] == "'"
    # The same vocab id in the buggy table decodes to backslash.
    assert ref.itos[vid] == "\\"


def test_encode_roundtrip():
    tok = Tokenizer()
    ids, n = tok.encode("Hello,1", max_length=25)
    assert ids.shape == (27,)
    assert ids[0] == tok.bos_id
    assert int(n) == 8  # 7 chars + EOS
    # decode skipping BOS
    assert tok.ids_to_text(ids[1:]) == "Hello,1"


def test_encode_pads_and_truncates():
    tok = Tokenizer()
    ids, n = tok.encode("a" * 40, max_length=25)
    assert ids.shape == (27,)
    assert int(n) == 26
    assert ids[-1] == tok.eos_id  # truncated label still EOS-terminated


@pytest.mark.parametrize("mode", ["truncate", "reference"])
def test_empty_prediction(mode):
    tok = Tokenizer()
    dists = onehot_dists([tok.eos_id] * 4, tok.vocab_size)[None]
    assert tok.decode(dists, mode=mode) == [""]


def test_modes_agree_without_collapsed_slot():
    """On sequences never emitting the collapsed ']' slot, reference mode and
    truncate mode produce identical transcripts — the parity statement for
    ordinary alphanumeric text."""
    tok = Tokenizer()
    ids = [tok.stoi[c] for c in "Hello42"] + [tok.eos_id, tok.stoi["x"]]
    dists = onehot_dists(ids, tok.vocab_size)[None]
    assert tok.decode(dists, mode="truncate") == tok.decode(dists, mode="reference") == ["Hello42"]


def test_decode_ids_fuzz_no_crash_and_eos_contract():
    """Random id matrices (any vocab id incl. BOS/PAD/EOS at any position):
    decode never crashes, never emits characters past the first EOS in
    truncate mode, and raw mode round-trips every id."""
    tok = Tokenizer()
    rng = np.random.default_rng(0)
    V = len(tok.itos)
    ids = rng.integers(0, V, (64, 26))
    outs = tok.decode_ids(ids)
    assert len(outs) == 64
    for row, s in zip(ids, outs):
        eos_pos = np.where(row == 0)[0]
        limit = int(eos_pos[0]) if eos_pos.size else len(row)
        assert len(s) <= limit
    raws = tok.decode_ids(ids, raw=True)
    assert all(len(r) == 26 for r in raws)


def test_decode_ids_all_special_tokens():
    """Reference semantics: EOS truncates; BOS/PAD ids decode to their
    literal table characters '['/'P' (tuatara.cpp:36-39 appends them to the
    charset table, and nothing strips them — only EOS gets handling)."""
    tok = Tokenizer()
    bos, pad = len(tok.itos) - 2, len(tok.itos) - 1
    ids = np.array([[0] * 8, [bos] * 8, [pad] * 8])
    outs = tok.decode_ids(ids)
    assert outs[0] == ""          # immediate EOS
    assert outs[1] == "[" * 8     # BOS is the literal '[' table entry
    assert outs[2] == "P" * 8     # PAD is the literal 'P' table entry
