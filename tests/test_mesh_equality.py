"""Mesh inference == single-device inference, with REAL boxes.

The fast mesh test (test_train_parallel.test_engine_with_mesh_matches_
unsharded) runs random weights on noise pages, where detection finds little;
these tests serve the trained tiny golden weights on real repo images so the
equality proof covers pages that actually produce word boxes — through
run_pages (odd batch sizes forcing dp padding), run_stream (speculative
recognition dispatch + fallback when the live bucket changes between
batches), and mixed batch shapes. Output-order stability is the analog of
the reference's chunk-index sorting (/root/reference/tuatara.cpp:478-485).
"""

import os

import numpy as np
import pytest

from tuatara_tpu.api import OcrEngine
from tuatara_tpu.config import OcrConfig
from tuatara_tpu.parallel.mesh import make_mesh
from tuatara_tpu.utils.image import asset_path, load_image

GOLDEN_WEIGHTS = os.path.join(os.path.dirname(__file__), "fixtures",
                              "golden_weights")

CFG = OcrConfig(canvas_size=256, max_boxes=64, rec_buckets=(64,),
                max_label_length=7)


def _results_equal(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert [i["text"] for i in ra] == [i["text"] for i in rb]
        assert [i["bbox"] for i in ra] == [i["bbox"] for i in rb]
        np.testing.assert_allclose(
            [i["confidence"] for i in ra], [i["confidence"] for i in rb],
            rtol=1e-5, atol=1e-7)


@pytest.fixture(scope="module")
def engines():
    single = OcrEngine(CFG, weights_dir=GOLDEN_WEIGHTS)
    meshed = OcrEngine(CFG, weights_dir=GOLDEN_WEIGHTS,
                       mesh=make_mesh(8, axes=("dp",)))
    return single, meshed


@pytest.mark.slow  # two engines x two page shapes compile (~2 min CPU)
def test_mesh_run_pages_equal_with_boxes(engines):
    single, meshed = engines
    rot = load_image(asset_path("rotated_text.png"))
    for b in (3, 5):  # odd sizes: dp padding 3->8, 5->8
        batch = np.stack([rot] * b)
        a = single.run_pages(batch)
        m = meshed.run_pages(batch)
        assert sum(len(r) for r in a) >= b, "no boxes detected — vacuous"
        _results_equal(a, m)


@pytest.mark.slow
def test_mesh_run_stream_equal_across_shapes(engines):
    """Streaming with batch-size and page-shape changes between batches:
    the speculative-recognition state carries across dispatches, so a
    changed live bucket exercises the fallback re-dispatch; results must
    still match the single-device engine batch for batch."""
    single, meshed = engines
    rot = load_image(asset_path("rotated_text.png"))
    fun = load_image(asset_path("funsd_0001129658.png"))
    batches = [np.stack([rot] * 3), np.stack([fun] * 2),
               np.stack([rot] * 5), np.stack([fun] * 3)]
    a = single.run_stream(list(batches), prefetch=2, depth=2)
    m = meshed.run_stream(list(batches), prefetch=2, depth=2)
    total = sum(len(r) for batch in a for r in batch)
    assert total >= 10, f"too few boxes ({total}) — vacuous equality"
    for ba, bm in zip(a, m):
        _results_equal(ba, bm)
