"""Golden-fixture regression test (SURVEY.md §4.1 strategy).

Without pretrained weights, transcript-level parity against the reference
binary is unobservable in this environment; what IS pinnable is the full
pipeline's deterministic behavior under a fixed seed — any unintended change
to preprocessing geometry, detection post-processing, crop extraction, or
decoding shifts these results. The fixture was produced by the engine at a
known-good commit on a real reference image.
"""

import json
import os

import numpy as np
import pytest

from tuatara_tpu.api import OcrEngine
from tuatara_tpu.config import CraftConfig, OcrConfig, ParseqConfig
from tuatara_tpu.utils.image import load_image

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_rotated_text_tiny.json")
IMAGE = "/root/reference/images/rotated_text.png"

TINY_CRAFT = CraftConfig(
    stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
    up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
    head_channels=(8, 8, 8, 8),
)
TINY_PARSEQ = ParseqConfig(
    embed_dim=32, enc_depth=1, enc_heads=4, dec_heads=4, max_label_length=7,
)


@pytest.mark.skipif(not os.path.isfile(IMAGE), reason="reference image absent")
def test_golden_pipeline_regression():
    with open(FIXTURE) as f:
        fix = json.load(f)
    cfg = OcrConfig(canvas_size=256, max_boxes=32, rec_buckets=(32,),
                    max_label_length=7)
    eng = OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, seed=fix["seed"])
    out = eng.run(load_image(IMAGE))
    assert len(out) == len(fix["results"])
    for got, want in zip(out, fix["results"]):
        assert got["text"] == want["text"]
        np.testing.assert_allclose(got["bbox"], want["bbox"], atol=1.0)
