"""Engine / public-API integration tests (plumbing, caching, batching).

Uses tiny model configs so the 1-core CPU host compiles quickly. Semantic
transcript quality requires trained weights (not available in this
environment); these tests pin the pipeline contract: shapes, ordering,
determinism, engine caching, error types, and weight persistence.
"""

import numpy as np
import pytest

import jax

from tuatara_tpu.api import OcrEngine, image_to_data
from tuatara_tpu.config import CraftConfig, OcrConfig, ParseqConfig

TINY_OCR = OcrConfig(
    canvas_size=128, max_boxes=16, rec_buckets=(8, 16), max_label_length=7,
)
TINY_CRAFT = CraftConfig(
    stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
    up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
    head_channels=(8, 8, 8, 8),
)
TINY_PARSEQ = ParseqConfig(
    embed_dim=32, enc_depth=1, enc_heads=4, dec_heads=4, max_label_length=7,
)


@pytest.fixture(scope="module")
def engine():
    return OcrEngine(TINY_OCR, TINY_CRAFT, TINY_PARSEQ, seed=0)


def _page(rng, h=96, w=120):
    img = np.full((h, w, 3), 255, np.uint8)
    # black text-ish strokes to give the random detector structure
    img[20:30, 10:60] = 0
    img[50:58, 30:90] = 0
    img += rng.integers(0, 10, img.shape).astype(np.uint8)
    return img


@pytest.mark.slow
def test_run_returns_contract(engine, rng):
    out = engine.run(_page(rng))
    assert isinstance(out, list)
    for item in out:
        assert set(item) == {"text", "bbox", "confidence"}
        assert len(item["bbox"]) == 4
        x0, y0, x1, y1 = item["bbox"]
        assert x0 <= x1 and y0 <= y1
        assert isinstance(item["text"], str)
        assert 0.0 <= item["confidence"] <= 1.0
    assert set(engine.last_timings) >= {"detect_s", "recognize_s", "decode_s"}


@pytest.mark.slow
def test_determinism(engine, rng):
    img = _page(rng)
    a = engine.run(img)
    b = engine.run(img)
    assert a == b


@pytest.mark.slow
def test_compile_caching(engine, rng):
    img = _page(rng)
    engine.run(img)
    n = len(engine._detect_fns)
    engine.run(img)
    assert len(engine._detect_fns) == n  # same shape -> no new program
    engine.run(_page(rng, 64, 64))
    assert len(engine._detect_fns) == n + 1


@pytest.mark.slow
def test_run_pages_batched_matches_single(engine, rng):
    imgs = np.stack([_page(rng), _page(rng)])
    batched = engine.run_pages(imgs)
    singles = [engine.run(imgs[0]), engine.run(imgs[1])]
    assert len(batched) == 2
    for b, s in zip(batched, singles):
        assert [i["text"] for i in b] == [i["text"] for i in s]
        assert [i["bbox"] for i in b] == [i["bbox"] for i in s]


@pytest.mark.slow
def test_beam_decode_mode(rng):
    import dataclasses

    cfg = dataclasses.replace(TINY_OCR, decode_mode="beam", beam_size=2)
    eng = OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, seed=0)
    out = eng.run(_page(rng))
    for item in out:
        assert 0.0 <= item["confidence"] <= 1.0
        assert isinstance(item["text"], str)


@pytest.mark.slow
def test_nar_decode_mode(rng):
    """Single-pass NAR recognition through the full engine pipeline."""
    import dataclasses

    cfg = dataclasses.replace(TINY_OCR, decode_mode="nar")
    eng = OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, seed=0)
    out = eng.run(_page(rng))
    for item in out:
        assert 0.0 <= item["confidence"] <= 1.0
        assert isinstance(item["text"], str)
        assert len(item["bbox"]) == 4


@pytest.mark.slow
def test_dense_page_fills_buckets(rng):
    """Aggressive thresholds on noise produce many boxes, exercising larger
    recognition buckets and the multi-page slab assembly at high counts."""
    import dataclasses

    cfg = dataclasses.replace(TINY_OCR, low_text=0.02, text_threshold=0.05,
                              min_component_area=1, rec_buckets=(2, 8, 16))
    eng = OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, seed=0)
    imgs = rng.integers(0, 255, (2, 96, 120, 3)).astype(np.uint8)
    out = eng.run_pages(imgs)
    total = sum(len(r) for r in out)
    assert total >= 2  # multi-box, multi-page slab assembly exercised
    assert eng.last_timings["boxes"] == total
    for page in out:
        for item in page:
            assert len(item["bbox"]) == 4


@pytest.mark.slow
def test_grayscale_input_bit_identical_to_rgb(engine, rng):
    """[B,H,W] / [B,H,W,1] / [H,W] grayscale inputs produce exactly the
    results of the channel-tripled RGB batch (the on-device broadcast path
    that cuts H2D bytes 3x)."""
    gray = np.asarray(_page(rng))[..., 0]  # [H, W]
    rgb = np.repeat(gray[..., None], 3, axis=-1)
    ref = engine.run(rgb)

    assert engine.run(gray) == ref                      # [H, W]
    assert engine.run_pages(gray[None])[0] == ref       # [B, H, W]
    assert engine.run_pages(gray[None, ..., None])[0] == ref  # [B, H, W, 1]
    # [H, W, 1] is ONE grayscale page, not a batch of H pages of shape W x 1
    # (regression: 3-D with last dim != 3 used to always mean "gray batch").
    assert engine.run_pages(gray[..., None])[0] == ref  # [H, W, 1]

    # Mixed-shape validation still rejects nonsense.
    with pytest.raises(ValueError):
        engine.run_pages(np.zeros((2, 4, 4, 2), np.uint8))


@pytest.mark.slow
def test_warmup_compiles_serving_programs(engine):
    """warmup() must pre-compile the programs the serving path actually uses
    (detect + lazy-crop + recognition), so the first live request pays no
    compile (regression: it used to warm a bench-only recognizer)."""
    engine.warmup(64, 80)
    K = engine.config.max_boxes
    b0 = engine._bucket(1)
    assert (1, K, b0, 64, 80, 3) in engine._slab_fns
    assert b0 in engine._recognize_fns
    assert (1, 64, 80, 3) in engine._detect_fns


def test_input_validation(engine):
    with pytest.raises(ValueError):
        image_to_data(np.zeros((4, 4), np.uint8))  # ndim != 3
    # Validation raises before any dispatch, so the shared engine is safe
    # (a fresh OcrEngine costs ~20 s of fold/init compile on CPU).
    eng = engine
    with pytest.raises(ValueError):
        eng.run_pages(np.zeros((0, 4, 4, 3), np.uint8))


def test_missing_weights_dir_raises():
    with pytest.raises(FileNotFoundError):
        OcrEngine(TINY_OCR, TINY_CRAFT, TINY_PARSEQ, weights_dir="/nonexistent")


@pytest.mark.slow
def test_weights_roundtrip(engine, rng, tmp_path):
    from tuatara_tpu.utils import weights as W

    wd = str(tmp_path / "weights")
    W.save_weights_dir(wd, engine.craft_params, engine.parseq_params)
    eng2 = OcrEngine(TINY_OCR, TINY_CRAFT, TINY_PARSEQ, weights_dir=wd)
    img = _page(rng)
    assert engine.run(img) == eng2.run(img)


def test_flatten_unflatten_identity():
    from tuatara_tpu.utils.weights import flatten_tree, unflatten_tree

    tree = {"a": {"b": np.ones((2, 2))}, "list": [np.zeros(3), {"c": np.ones(1)}]}
    flat = flatten_tree(tree)
    back = unflatten_tree(flat)
    assert np.array_equal(back["a"]["b"], tree["a"]["b"])
    assert isinstance(back["list"], list)
    assert np.array_equal(back["list"][0], tree["list"][0])
    assert np.array_equal(back["list"][1]["c"], tree["list"][1]["c"])


def test_run_stream_matches_run_pages(engine):
    """The pipelined serving loop (speculative recognition, depth-2
    in-flight batches) returns element-wise identical results to the
    synchronous path — PARITY.md #18's contract."""
    rng = np.random.default_rng(7)
    batches = [
        np.stack([_page(rng), _page(rng)]),
        np.stack([_page(rng), _page(rng)]),
        np.stack([_page(rng), _page(rng)]),
    ]
    want = [engine.run_pages(b) for b in batches]
    # Reset speculation state so the stream starts cold like a fresh caller.
    engine._spec.clear()
    got = engine.run_stream(list(batches), prefetch=2, depth=2)
    assert got == want


def test_float_image_rejected(engine):
    """Float pixels would be /255'd twice inside the program -> loud
    TypeError instead (uint8 is the reference contract)."""
    with pytest.raises(TypeError, match="uint8"):
        engine.run(np.zeros((32, 32, 3), np.float32))
    with pytest.raises(TypeError, match="uint8"):
        engine.run_pages(np.zeros((1, 32, 32), np.float64))


@pytest.mark.slow
def test_run_mixed_shapes(engine):
    """Mixed-size pages: grouped by shape, results in original order,
    identical to per-page run()."""
    rng = np.random.default_rng(11)
    pages = [
        _page(rng, 96, 120),
        _page(rng, 64, 80),
        _page(rng, 96, 120),
        _page(rng, 64, 80),
        _page(rng, 96, 120),
    ]
    got = engine.run_mixed(pages, max_batch=2)
    want = [engine.run(p) for p in pages]
    assert got == want


def test_engine_stats_accumulate(engine):
    """Cumulative serving counters track pages/batches/boxes and reset."""
    rng = np.random.default_rng(13)
    engine.reset_stats()
    engine.run_pages(np.stack([_page(rng), _page(rng)]))
    engine.run(_page(rng))
    s = engine.stats
    assert s["pages"] == 3 and s["batches"] == 2
    assert s["detect_s"] > 0
    assert s["boxes"] >= 0
    engine.reset_stats()
    assert engine.stats["pages"] == 0


def test_encoder_impl_serving_override():
    """OcrConfig.encoder_impl flows into the resolved ParseqConfig and
    triggers the eager pre-stack of the Pallas kernel's block weights
    (prestack_pallas_encoder); None leaves the resolved config alone."""
    import dataclasses

    eng = OcrEngine(dataclasses.replace(TINY_OCR, encoder_impl="pallas"),
                    TINY_CRAFT, TINY_PARSEQ, seed=0)
    assert eng.parseq_config.encoder_impl == "pallas"
    assert "_enc_stacked" in eng.parseq_params

    default = OcrEngine(TINY_OCR, TINY_CRAFT, TINY_PARSEQ, seed=0)
    assert default.parseq_config.encoder_impl == "xla"
    assert "_enc_stacked" not in default.parseq_params

    # explicit parseq_config wins when the OcrConfig field is None
    pp = dataclasses.replace(TINY_PARSEQ, encoder_impl="pallas")
    explicit = OcrEngine(TINY_OCR, TINY_CRAFT, pp, seed=0)
    assert explicit.parseq_config.encoder_impl == "pallas"


def test_engine_cache_lru_eviction_and_close():
    """get_engine is LRU-bounded: evicted engines are close()d (device
    weights dropped, further use raises); the surviving entries are the
    most recently used (VERDICT r3 weak item 6)."""
    import dataclasses

    from tuatara_tpu import api

    api.clear_engines()
    old_max = api.ENGINE_CACHE_MAX
    api.ENGINE_CACHE_MAX = 2
    try:
        cfgs = [dataclasses.replace(TINY_OCR, canvas_size=64 + 32 * i)
                for i in range(3)]
        engines = [api.get_engine(c) for c in cfgs]
        assert len(api._engines) == 2
        # engine 0 was evicted and closed
        assert engines[0].craft_params is None
        with pytest.raises(RuntimeError, match="closed"):
            engines[0].run(np.zeros((32, 32, 3), np.uint8))
        # cached engines are returned as-is and still usable
        assert api.get_engine(cfgs[2]) is engines[2]
        assert engines[2].craft_params is not None
        # close is idempotent
        engines[0].close()
    finally:
        api.ENGINE_CACHE_MAX = old_max
        api.clear_engines()


def test_sorted_slab_results_identical(rng):
    """rec_sort_by_width is a pure permutation: an engine serving
    aspect-sorted recognition slabs (the default, feeding the fused decode
    kernel's tile-level early exit) must return element-wise IDENTICAL
    results to the raster-ordered path — same weights, same pages, boxes
    of mixed aspect ratios so the sort actually reorders."""
    img = np.full((2, 96, 120, 3), 255, np.uint8)
    # Wide, medium, and near-square dark regions => mixed box aspects.
    img[:, 10:18, 5:115] = 0     # aspect ~13.8
    img[:, 30:42, 20:50] = 0     # aspect ~2.5
    img[:, 60:80, 60:82] = 0     # aspect ~1.1
    img += rng.integers(0, 8, img.shape).astype(np.uint8)
    import dataclasses

    sorted_eng = OcrEngine(TINY_OCR, TINY_CRAFT, TINY_PARSEQ, seed=0)
    raster_eng = OcrEngine(
        dataclasses.replace(TINY_OCR, rec_sort_by_width=False),
        TINY_CRAFT, TINY_PARSEQ, seed=0)
    want = raster_eng.run_pages(img)
    got = sorted_eng.run_pages(img)
    assert any(len(r) >= 2 for r in want), "need multi-box pages"
    assert got == want
