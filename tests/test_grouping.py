"""Line-grouping tests (ops/grouping.py — the reference TODO,
tuatara.cpp:411-414)."""

import numpy as np
import pytest

from tuatara_tpu.ops.grouping import group_lines


def w(x0, y0, x1, y1, text="w", conf=0.9):
    return {"text": text, "bbox": [x0, y0, x1, y1], "confidence": conf}


def test_single_line_joins_in_x_order():
    words = [w(50, 10, 80, 20, "world"), w(10, 11, 45, 21, "hello")]
    lines = group_lines(words)
    assert len(lines) == 1
    assert lines[0]["text"] == "hello world"
    assert lines[0]["bbox"] == [10, 10, 80, 21]
    assert [x["text"] for x in lines[0]["words"]] == ["hello", "world"]


def test_separate_lines_stay_separate():
    words = [w(10, 10, 40, 20, "a"), w(10, 30, 40, 40, "b"), w(10, 50, 40, 60, "c")]
    lines = group_lines(words)
    assert [l["text"] for l in lines] == ["a", "b", "c"]


def test_slight_baseline_jitter_still_one_line():
    # 60% vertical overlap — same line despite jitter.
    words = [w(10, 10, 40, 20, "a"), w(50, 14, 80, 24, "b")]
    assert [l["text"] for l in group_lines(words)] == ["a b"]


def test_table_gap_splits_into_cells():
    # Two words on one baseline separated by 10x the line height.
    words = [w(10, 10, 40, 20, "cell1"), w(200, 10, 240, 20, "cell2")]
    lines = group_lines(words)
    assert [l["text"] for l in lines] == ["cell1", "cell2"]
    # ... but an ordinary word gap does not split.
    words = [w(10, 10, 40, 20, "two"), w(48, 10, 80, 20, "words")]
    assert [l["text"] for l in group_lines(words)] == ["two words"]


def test_reading_order_and_confidence():
    words = [
        w(10, 50, 40, 60, "third", 0.5),
        w(60, 10, 90, 20, "second", 0.8),
        w(10, 10, 40, 20, "first", 0.2),
    ]
    lines = group_lines(words)
    assert [l["text"] for l in lines] == ["first second", "third"]
    np.testing.assert_allclose(lines[0]["confidence"], (0.2 * 0.8) ** 0.5)
    np.testing.assert_allclose(lines[1]["confidence"], 0.5)


def test_empty_input():
    assert group_lines([]) == []


@pytest.mark.slow
def test_engine_run_lines_contract(rng):
    """run_lines produces the hierarchy over a real engine run."""
    from tuatara_tpu.api import OcrEngine
    from tuatara_tpu.config import CraftConfig, OcrConfig, ParseqConfig

    cfg = OcrConfig(canvas_size=128, max_boxes=16, rec_buckets=(16,),
                    max_label_length=7)
    eng = OcrEngine(
        cfg,
        CraftConfig(stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
                    up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
                    head_channels=(8, 8, 8, 8)),
        ParseqConfig(embed_dim=32, enc_depth=1, enc_heads=4, dec_heads=4,
                     max_label_length=7),
        seed=0,
    )
    img = np.full((96, 120, 3), 255, np.uint8)
    img[20:30, 10:60] = 0
    img[50:58, 30:90] = 0
    img += rng.integers(0, 10, img.shape).astype(np.uint8)
    lines = eng.run_lines(img)
    flat_words = [wd for ln in lines for wd in ln["words"]]
    assert len(flat_words) == len(eng.run(img))
    for ln in lines:
        assert set(ln) == {"text", "bbox", "confidence", "words"}
        assert ln["text"] == " ".join(wd["text"] for wd in ln["words"])


def test_group_lines_fuzz_invariants():
    """Random boxes: every word lands in exactly one line, line bboxes
    cover their words, reading order is sorted by (y, x)."""
    rng = np.random.default_rng(5)
    words = []
    for i in range(80):
        x0 = float(rng.uniform(0, 900))
        y0 = float(rng.uniform(0, 900))
        w, h = float(rng.uniform(5, 120)), float(rng.uniform(5, 40))
        words.append({"text": f"w{i}", "bbox": [x0, y0, x0 + w, y0 + h],
                      "confidence": float(rng.uniform(0.1, 1.0))})
    lines = group_lines(words)
    members = [w["text"] for ln in lines for w in ln["words"]]
    assert sorted(members) == sorted(w["text"] for w in words)
    for ln in lines:
        lx0, ly0, lx1, ly1 = ln["bbox"]
        for w in ln["words"]:
            x0, y0, x1, y1 = w["bbox"]
            assert lx0 <= x0 and ly0 <= y0 and lx1 >= x1 and ly1 >= y1
        assert 0.0 < ln["confidence"] <= 1.0
    keys = [(ln["bbox"][1], ln["bbox"][0]) for ln in lines]
    assert keys == sorted(keys)  # exact reading order, no slack


def test_group_lines_empty_and_single():
    assert group_lines([]) == []
    one = [{"text": "a", "bbox": [0.0, 0.0, 5.0, 5.0], "confidence": 0.5}]
    lines = group_lines(one)
    assert len(lines) == 1 and lines[0]["text"] == "a"


# ---------------------------------------------------------------------------
# Block grouping
# ---------------------------------------------------------------------------

from tuatara_tpu.ops.grouping import group_blocks  # noqa: E402


def _word(x0, y0, x1, y1, text="w", conf=0.9):
    return {"text": text, "bbox": [x0, y0, x1, y1], "confidence": conf}


def test_paragraph_lines_join_one_block():
    words = [
        _word(0, 0, 50, 10, "line1a"), _word(55, 0, 90, 10, "line1b"),
        _word(0, 13, 60, 23, "line2"),
        _word(0, 26, 70, 36, "line3"),
    ]
    blocks = group_blocks(group_lines(words))
    assert len(blocks) == 1
    assert blocks[0]["text"] == "line1a line1b\nline2\nline3"
    assert len(blocks[0]["lines"]) == 3
    assert 0.0 < blocks[0]["confidence"] <= 1.0


def test_heading_break_splits_blocks():
    # Gap of 2x line height between line 2 and line 3 -> new block.
    words = [
        _word(0, 0, 60, 10, "a"),
        _word(0, 13, 60, 23, "b"),
        _word(0, 45, 60, 55, "c"),
    ]
    blocks = group_blocks(group_lines(words))
    assert len(blocks) == 2
    assert blocks[0]["text"] == "a\nb"
    assert blocks[1]["text"] == "c"


def test_side_by_side_columns_stay_separate():
    # Two columns with interleaving baselines: horizontal-overlap gate
    # must keep them apart even though lines are vertically adjacent.
    words = [
        _word(0, 0, 40, 10, "l1"), _word(100, 0, 140, 10, "r1"),
        _word(0, 12, 40, 22, "l2"), _word(100, 12, 140, 22, "r2"),
    ]
    blocks = group_blocks(group_lines(words))
    assert len(blocks) == 2
    texts = sorted(b["text"] for b in blocks)
    assert texts == ["l1\nl2", "r1\nr2"]


def test_full_width_heading_does_not_bridge_columns():
    # Regression: horizontal overlap must be tested against the block's
    # LAST line, not its union bbox — a full-width heading would otherwise
    # stretch the union over both columns and every column line would pass
    # the overlap gate, interleaving the columns into one block.
    words = [
        _word(0, 0, 140, 10, "heading"),
        _word(0, 12, 40, 22, "l1"), _word(100, 12, 140, 22, "r1"),
        _word(0, 24, 40, 34, "l2"), _word(100, 24, 140, 34, "r2"),
    ]
    blocks = group_blocks(group_lines(words))
    texts = sorted(b["text"] for b in blocks)
    # The heading may adopt the first column it touches (its extent covers
    # both), but the two columns must never fuse with EACH OTHER.
    assert not any("l1" in t and "r1" in t for t in texts)
    assert any("l1\nl2" in t for t in texts)
    assert any("r1\nr2" in t for t in texts)


def test_blocks_reading_order_and_union_bbox():
    words = [
        _word(0, 40, 60, 50, "second"),
        _word(0, 0, 60, 10, "first"),
    ]
    blocks = group_blocks(group_lines(words))
    assert [b["text"] for b in blocks] == ["first", "second"]
    assert blocks[0]["bbox"] == [0, 0, 60, 10]


def test_group_blocks_empty():
    assert group_blocks([]) == []


@pytest.mark.slow
def test_engine_run_blocks_contract(rng):
    from tuatara_tpu.api import OcrEngine
    from tuatara_tpu.config import CraftConfig, OcrConfig, ParseqConfig

    cfg = OcrConfig(canvas_size=128, max_boxes=16, rec_buckets=(16,),
                    max_label_length=7)
    tiny_c = CraftConfig(stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
                         up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
                         head_channels=(8, 8, 8, 8))
    tiny_p = ParseqConfig(embed_dim=32, enc_depth=1, enc_heads=4, dec_heads=4,
                          max_label_length=7)
    eng = OcrEngine(cfg, tiny_c, tiny_p, seed=0)
    img = rng.integers(0, 255, (96, 120, 3)).astype(np.uint8)
    blocks = eng.run_blocks(img)
    n_words = len(eng.run(img))
    assert sum(len(l["words"]) for b in blocks for l in b["lines"]) == n_words
    for b in blocks:
        assert set(b) >= {"text", "bbox", "confidence", "lines"}
