"""Evaluation metrics: detection and recognition quality scoring.

The reference ships no evaluation apparatus at all — its only quality
evidence is one committed annotated render (README.md:10) eyeballed by the
author. A framework that can retrain its recognizer (train/, TRAINING.md —
the reference's own retrain TODO, README.md:42) needs to SCORE the result,
so this module provides the standard OCR metrics:

* `char_error_rate` / `word_accuracy` — corpus-level recognition quality
  (Levenshtein distance over matched transcript pairs; the PARSEQ paper's
  own headline metrics).
* `detection_prf` — precision/recall/F1 of predicted boxes against ground
  truth at an IoU threshold, with greedy one-to-one matching (the ICDAR
  protocol family; greedy-by-IoU is the common simplification and is exact
  when matches are unambiguous, which axis-aligned word boxes at IoU>=0.5
  almost always are).
* `evaluate_page` / `evaluate_engine` — end-to-end scoring of engine output
  [{text, bbox, ...}] against ground truth [{text, bbox}]: detection PRF
  plus recognition metrics over the IoU-matched pairs.

Host-side pure Python by design: evaluation runs over at most a few
thousand short strings and boxes per page — device dispatch would cost more
than the arithmetic (same reasoning as ops/grouping.py).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple


def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance (unit insert/delete/substitute costs)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    # One-row DP; iterate over the longer string in the outer loop so the
    # row stays as short as possible.
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(
                prev[j] + 1,          # delete
                cur[j - 1] + 1,       # insert
                prev[j - 1] + (ca != cb),  # substitute / match
            ))
        prev = cur
    return prev[-1]


def char_error_rate(pairs: Sequence[Tuple[str, str]]) -> float:
    """Corpus CER: total edit distance / total ground-truth characters over
    (predicted, truth) pairs. 0.0 is perfect; can exceed 1.0 (predictions
    longer than truths). Empty corpus (or all-empty truths) -> 0.0 if the
    predictions are empty too, else 1.0 per spurious character convention
    (edits / max(1, chars))."""
    edits = sum(edit_distance(p, t) for p, t in pairs)
    chars = sum(len(t) for _, t in pairs)
    return edits / max(chars, 1)


def word_accuracy(pairs: Sequence[Tuple[str, str]]) -> float:
    """Exact-match rate over (predicted, truth) pairs (PARSEQ's "word
    accuracy"). Empty corpus -> 0.0 (nothing demonstrated)."""
    if not pairs:
        return 0.0
    return sum(p == t for p, t in pairs) / len(pairs)


def box_iou(a: Sequence[float], b: Sequence[float]) -> float:
    """IoU of two [x0, y0, x1, y1] boxes (exclusive of degenerate areas)."""
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(ix1 - ix0, 0.0), max(iy1 - iy0, 0.0)
    inter = iw * ih
    if inter <= 0.0:
        return 0.0
    area_a = max(a[2] - a[0], 0.0) * max(a[3] - a[1], 0.0)
    area_b = max(b[2] - b[0], 0.0) * max(b[3] - b[1], 0.0)
    union = area_a + area_b - inter
    return inter / union if union > 0.0 else 0.0


def match_boxes(
    pred: Sequence[Sequence[float]],
    truth: Sequence[Sequence[float]],
    iou_threshold: float = 0.5,
) -> List[Tuple[int, int, float]]:
    """Greedy one-to-one matching: (pred_idx, truth_idx, iou) triples,
    highest IoU first, each box used at most once, pairs below
    `iou_threshold` never matched. Ties broken by (pred, truth) index for
    determinism."""
    cands = []
    for i, p in enumerate(pred):
        for j, t in enumerate(truth):
            iou = box_iou(p, t)
            if iou >= iou_threshold:
                cands.append((-iou, i, j))
    cands.sort()
    used_p, used_t, out = set(), set(), []
    for neg_iou, i, j in cands:
        if i in used_p or j in used_t:
            continue
        used_p.add(i)
        used_t.add(j)
        out.append((i, j, -neg_iou))
    return out


def detection_prf(
    pred: Sequence[Sequence[float]],
    truth: Sequence[Sequence[float]],
    iou_threshold: float = 0.5,
) -> Dict[str, float]:
    """Detection precision/recall/F1 at an IoU threshold (greedy matching).

    Returns {precision, recall, f1, tp, fp, fn}. Empty-vs-empty is perfect
    (1.0/1.0/1.0): detecting nothing on a blank page is correct."""
    tp = len(match_boxes(pred, truth, iou_threshold))
    fp = len(pred) - tp
    fn = len(truth) - tp
    precision = tp / len(pred) if pred else (1.0 if not truth else 0.0)
    recall = tp / len(truth) if truth else (1.0 if not pred else 0.0)
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall > 0 else 0.0)
    return {"precision": precision, "recall": recall, "f1": f1,
            "tp": tp, "fp": fp, "fn": fn}


def evaluate_page(
    results: List[Dict],
    truth: List[Dict],
    iou_threshold: float = 0.5,
    case_sensitive: bool = True,
) -> Dict[str, float]:
    """Score one page's engine output against ground truth.

    `results`: [{text, bbox, ...}] as returned by OcrEngine.run;
    `truth`: [{text, bbox}] with the same bbox convention ([x0, y0, x1, y1]
    in original-image pixels). Recognition metrics are computed over the
    IoU-matched pairs only (the detection miss/false-alarm cost is carried
    by precision/recall, not double-counted into CER), which is the
    standard end-to-end protocol split."""
    det = detection_prf([r["bbox"] for r in results],
                        [t["bbox"] for t in truth], iou_threshold)
    pairs = [
        (results[i]["text"], truth[j]["text"])
        for i, j, _ in match_boxes([r["bbox"] for r in results],
                                   [t["bbox"] for t in truth], iou_threshold)
    ]
    if not case_sensitive:
        pairs = [(p.lower(), t.lower()) for p, t in pairs]
    det["cer"] = char_error_rate(pairs)
    det["word_acc"] = word_accuracy(pairs)
    det["matched"] = len(pairs)
    return det


def evaluate_engine(
    engine,
    images: Sequence,
    truths: Sequence[List[Dict]],
    iou_threshold: float = 0.5,
    case_sensitive: bool = True,
) -> Dict[str, float]:
    """End-to-end evaluation of an OcrEngine over a labeled set.

    `images`: pages OcrEngine.run accepts (mixed sizes fine — routed through
    run_mixed); `truths`: per-page [{text, bbox}]. Returns corpus-level
    {precision, recall, f1, cer, word_acc, pages, matched, tp, fp, fn}
    (micro-averaged: counts pooled over pages, the ICDAR convention)."""
    if len(images) != len(truths):
        raise ValueError(
            f"{len(images)} images but {len(truths)} truth lists")
    all_results = engine.run_mixed(list(images))
    tp = fp = fn = 0
    pairs: List[Tuple[str, str]] = []
    for results, truth in zip(all_results, truths):
        det = detection_prf([r["bbox"] for r in results],
                            [t["bbox"] for t in truth], iou_threshold)
        tp += det["tp"]
        fp += det["fp"]
        fn += det["fn"]
        pairs += [
            (results[i]["text"], truth[j]["text"])
            for i, j, _ in match_boxes([r["bbox"] for r in results],
                                       [t["bbox"] for t in truth],
                                       iou_threshold)
        ]
    if not case_sensitive:
        pairs = [(p.lower(), t.lower()) for p, t in pairs]
    precision = tp / (tp + fp) if tp + fp else (1.0 if fn == 0 else 0.0)
    recall = tp / (tp + fn) if tp + fn else (1.0 if fp == 0 else 0.0)
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall > 0 else 0.0)
    return {
        "precision": precision, "recall": recall, "f1": f1,
        "cer": char_error_rate(pairs), "word_acc": word_accuracy(pairs),
        "pages": len(list(images)), "matched": len(pairs),
        "tp": tp, "fp": fp, "fn": fn,
    }
