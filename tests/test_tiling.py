"""Tiled detection tests (large-page path; improvement over the reference's
always-downscale, tuatara.cpp:352-358)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tuatara_tpu.api import OcrEngine
from tuatara_tpu.config import CraftConfig, OcrConfig, ParseqConfig
from tuatara_tpu.ops.tiling import extract_tiles, stitch_heatmaps, tile_positions

TINY_CRAFT = CraftConfig(
    stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
    up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
    head_channels=(8, 8, 8, 8),
)
TINY_PARSEQ = ParseqConfig(
    embed_dim=32, enc_depth=1, enc_heads=4, dec_heads=4, max_label_length=7,
)


def test_tile_positions_cover():
    pos = tile_positions(300, 128, 96)
    assert pos[0] == 0 and pos[-1] == 300 - 128
    covered = set()
    for p in pos:
        covered.update(range(p, p + 128))
    assert covered == set(range(300))


def test_extract_and_stitch_roundtrip(rng):
    """Stitching identity heatmaps of tiles reproduces the source map."""
    img = rng.random((160, 224, 2)).astype(np.float32)
    tiles, coords = extract_tiles(jnp.array(img), 128, 64)
    # pretend the "network" output at half resolution is just 2x2 max-pool
    pooled = np.asarray(tiles).reshape(len(coords), 64, 2, 64, 2, 2).max((2, 4))
    full = np.asarray(
        stitch_heatmaps(jnp.array(pooled), coords, 80, 112, ratio_net=2)
    )
    want = img.reshape(80, 2, 112, 2, 2).max((1, 3))
    np.testing.assert_allclose(full, want, rtol=1e-6)


@pytest.mark.slow
def test_engine_tiled_path(rng):
    """A page bigger than the canvas goes through tiling and produces the
    standard output contract; a white page yields no boxes."""
    cfg = OcrConfig(canvas_size=128, max_boxes=16, rec_buckets=(16,),
                    max_label_length=7, tiled_detection=True, tile_overlap=32)
    eng = OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, seed=0)
    img = (rng.random((320, 256, 3)) * 255).astype(np.uint8)
    out = eng.run(img)
    for item in out:
        x0, y0, x1, y1 = item["bbox"]
        assert 0 <= x0 <= x1 and 0 <= y0 <= y1
        assert x1 <= 256 + 64 and y1 <= 320 + 64  # sane coordinate range

    # small page still uses the plain (downscale) path
    small = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
    out_small = eng.run(small)
    assert isinstance(out_small, list)
