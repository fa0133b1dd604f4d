"""Evaluation metrics (utils/metrics.py): edit distance, CER/word accuracy,
IoU matching, detection PRF, end-to-end scoring.

The reference has no evaluation subsystem (its only quality evidence is one
committed render, README.md:10); these tests pin the scoring semantics the
training stack (TRAINING.md) relies on."""

import itertools
import random

import pytest

from tuatara_tpu.utils.metrics import (
    box_iou,
    char_error_rate,
    detection_prf,
    edit_distance,
    evaluate_engine,
    evaluate_page,
    match_boxes,
    word_accuracy,
)


# ---------------------------------------------------------------------------
# Edit distance / CER / word accuracy
# ---------------------------------------------------------------------------

def _edit_distance_ref(a: str, b: str) -> int:
    """Textbook full-matrix Levenshtein as the oracle."""
    m, n = len(a), len(b)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = i
    for j in range(n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
    return d[m][n]


def test_edit_distance_known_values():
    assert edit_distance("", "") == 0
    assert edit_distance("abc", "abc") == 0
    assert edit_distance("abc", "") == 3
    assert edit_distance("", "abc") == 3
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("flaw", "lawn") == 2


def test_edit_distance_matches_oracle_exhaustive():
    # Every pair of strings up to length 3 over a 2-char alphabet.
    alpha = "ab"
    strings = [""] + ["".join(t) for k in (1, 2, 3)
                      for t in itertools.product(alpha, repeat=k)]
    for a in strings:
        for b in strings:
            assert edit_distance(a, b) == _edit_distance_ref(a, b), (a, b)


def test_edit_distance_matches_oracle_random():
    rng = random.Random(0)
    for _ in range(200):
        a = "".join(rng.choice("abcXYZ09 ") for _ in range(rng.randrange(12)))
        b = "".join(rng.choice("abcXYZ09 ") for _ in range(rng.randrange(12)))
        assert edit_distance(a, b) == _edit_distance_ref(a, b), (a, b)


def test_char_error_rate_corpus_level():
    # 1 edit over 10 truth chars, regardless of how pairs split it.
    assert char_error_rate([("helxo", "hello"), ("world", "world")]) == pytest.approx(0.1)
    assert char_error_rate([]) == 0.0
    # Spurious prediction against empty truth: edits / max(1, 0 chars).
    assert char_error_rate([("xx", "")]) == 2.0


def test_word_accuracy():
    assert word_accuracy([("a", "a"), ("b", "c")]) == 0.5
    assert word_accuracy([]) == 0.0


# ---------------------------------------------------------------------------
# IoU / matching / detection PRF
# ---------------------------------------------------------------------------

def test_box_iou_values():
    a = [0, 0, 10, 10]
    assert box_iou(a, a) == pytest.approx(1.0)
    assert box_iou(a, [10, 10, 20, 20]) == 0.0  # touching corners: no area
    assert box_iou(a, [5, 0, 15, 10]) == pytest.approx(50 / 150)
    assert box_iou(a, [2, 2, 8, 8]) == pytest.approx(36 / 100)  # containment
    assert box_iou([0, 0, 0, 10], a) == 0.0  # degenerate box


def test_match_boxes_greedy_one_to_one():
    truth = [[0, 0, 10, 10], [20, 0, 30, 10]]
    # pred 0 overlaps truth 0 strongly and truth 1 not at all; pred 1
    # overlaps BOTH truths weakly — must take the leftover truth.
    pred = [[1, 0, 11, 10], [8, 0, 22, 10]]
    m = match_boxes(pred, truth, iou_threshold=0.05)
    assert [(i, j) for i, j, _ in m] == [(0, 0), (1, 1)]
    # Every box used at most once even with many candidates.
    m2 = match_boxes([[0, 0, 10, 10]] * 3, truth, iou_threshold=0.5)
    assert len(m2) == 1


def test_match_boxes_threshold_gate():
    assert match_boxes([[0, 0, 10, 10]], [[9, 9, 20, 20]], 0.5) == []


def test_detection_prf_counts():
    truth = [[0, 0, 10, 10], [20, 0, 30, 10], [40, 0, 50, 10]]
    pred = [[0, 0, 10, 10], [20, 0, 30, 10], [100, 0, 110, 10]]
    d = detection_prf(pred, truth)
    assert (d["tp"], d["fp"], d["fn"]) == (2, 1, 1)
    assert d["precision"] == pytest.approx(2 / 3)
    assert d["recall"] == pytest.approx(2 / 3)
    assert d["f1"] == pytest.approx(2 / 3)


def test_detection_prf_empty_cases():
    perfect = detection_prf([], [])
    assert (perfect["precision"], perfect["recall"], perfect["f1"]) == (1.0, 1.0, 1.0)
    miss = detection_prf([], [[0, 0, 1, 1]])
    assert miss["recall"] == 0.0 and miss["precision"] == 0.0
    spurious = detection_prf([[0, 0, 1, 1]], [])
    assert spurious["precision"] == 0.0 and spurious["recall"] == 0.0


# ---------------------------------------------------------------------------
# End-to-end scoring
# ---------------------------------------------------------------------------

def test_evaluate_page_scores_matched_pairs_only():
    truth = [{"text": "hello", "bbox": [0, 0, 10, 10]},
             {"text": "world", "bbox": [20, 0, 30, 10]}]
    results = [{"text": "helxo", "bbox": [0, 0, 10, 10], "confidence": 0.9},
               {"text": "junk", "bbox": [100, 0, 110, 10], "confidence": 0.2}]
    s = evaluate_page(results, truth)
    assert (s["tp"], s["fp"], s["fn"], s["matched"]) == (1, 1, 1, 1)
    # CER over the one matched pair: 1 edit / 5 chars — the false alarm and
    # the miss are charged to precision/recall, not double-counted into CER.
    assert s["cer"] == pytest.approx(0.2)
    assert s["word_acc"] == 0.0


def test_evaluate_page_case_insensitive():
    truth = [{"text": "Hello", "bbox": [0, 0, 10, 10]}]
    results = [{"text": "hello", "bbox": [0, 0, 10, 10]}]
    assert evaluate_page(results, truth)["word_acc"] == 0.0
    assert evaluate_page(results, truth, case_sensitive=False)["word_acc"] == 1.0


class _StubEngine:
    """run_mixed stub returning canned per-page results (signature-compatible
    with OcrEngine.run_mixed; evaluate_engine is engine-API-only by design
    so it works on any engine-like object)."""

    def __init__(self, canned):
        self.canned = canned

    def run_mixed(self, images):
        assert len(images) == len(self.canned)
        return self.canned


def test_evaluate_engine_micro_average():
    truths = [
        [{"text": "aa", "bbox": [0, 0, 10, 10]}],
        [{"text": "bb", "bbox": [0, 0, 10, 10]},
         {"text": "cc", "bbox": [20, 0, 30, 10]}],
    ]
    canned = [
        [{"text": "aa", "bbox": [0, 0, 10, 10]}],     # page 1: perfect
        [{"text": "bx", "bbox": [0, 0, 10, 10]}],     # page 2: 1 match, 1 miss
    ]
    s = evaluate_engine(_StubEngine(canned), ["i1", "i2"], truths)
    assert (s["tp"], s["fp"], s["fn"]) == (2, 0, 1)
    assert s["precision"] == 1.0
    assert s["recall"] == pytest.approx(2 / 3)
    # 1 edit over 4 matched truth chars (aa + bb).
    assert s["cer"] == pytest.approx(0.25)
    assert s["word_acc"] == 0.5
    assert s["pages"] == 2 and s["matched"] == 2


def test_evaluate_engine_length_mismatch():
    with pytest.raises(ValueError):
        evaluate_engine(_StubEngine([]), ["i1"], [])


# ---------------------------------------------------------------------------
# FUNSD annotation loading (utils/data.py) -> metrics ground truth
# ---------------------------------------------------------------------------

def test_load_funsd_annotations(tmp_path):
    import json

    from tuatara_tpu.utils.data import load_funsd_annotations

    ann = {"form": [
        {"text": "TO: Sam", "box": [10, 10, 80, 24], "label": "question",
         "words": [{"text": "TO:", "box": [10, 10, 35, 24]},
                   {"text": "Sam", "box": [40, 10, 80, 24]}]},
        {"text": "", "box": [0, 0, 5, 5], "label": "other",
         "words": [{"text": "", "box": [0, 0, 5, 5]}]},  # checkbox: dropped
    ]}
    p = tmp_path / "page.json"
    p.write_text(json.dumps(ann))

    words = load_funsd_annotations(str(p))
    assert words == [{"text": "TO:", "bbox": [10.0, 10.0, 35.0, 24.0]},
                     {"text": "Sam", "bbox": [40.0, 10.0, 80.0, 24.0]}]
    entities = load_funsd_annotations(str(p), level="entity")
    assert entities == [{"text": "TO: Sam", "bbox": [10.0, 10.0, 80.0, 24.0]}]
    with pytest.raises(ValueError):
        load_funsd_annotations(str(p), level="line")

    # Round-trips straight into the scorer.
    s = evaluate_page(
        [{"text": "TO:", "bbox": [10, 10, 35, 24]},
         {"text": "Sam", "bbox": [40, 10, 80, 24]}], words)
    assert s["f1"] == 1.0 and s["word_acc"] == 1.0
