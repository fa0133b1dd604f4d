"""Tiled detection for pages larger than the canvas.

The reference downscales every page so its long side fits the 1024 canvas
(tuatara.cpp:352-358), destroying small text on large pages. Tiled mode
instead keeps the page at magnification resolution, runs CRAFT over
overlapping canvas-sized tiles (one batched forward — the tile dimension is
just batch), and max-blends the tile heatmaps back into one full-resolution
score map; all downstream post-processing is unchanged (SURVEY.md §5.7's
"sliding-window + heatmap-stitch" design).

Overlap absorbs convolutional boundary artifacts: scores near a tile edge
are unreliable within the network's receptive-field margin, but every
interior point of the page is covered by at least one tile that sees it
away from an edge, and max-blending prefers the stronger (interior) view.

All tile positions are static per page shape, so stitching is a fixed
sequence of slice-max updates — no scatter.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def tile_positions(size: int, tile: int, stride: int) -> List[int]:
    """Start offsets covering [0, size) with tiles of `tile`, last clamped."""
    if size <= tile:
        return [0]
    pos = list(range(0, size - tile, stride))
    pos.append(size - tile)
    return pos


def extract_tiles(
    image: jnp.ndarray, tile: int, overlap: int, ratio_net: int = 2
) -> Tuple[jnp.ndarray, List[Tuple[int, int]]]:
    """[H, W, C] -> ([n_tiles, tile, tile, C], [(y, x)] static positions).

    H and W must already be padded to >= tile. The stride (tile - overlap)
    must be a multiple of `ratio_net`: stitch_heatmaps places tiles at
    (y // ratio_net, x // ratio_net), so an odd stride would silently
    misplace heatmaps by a fraction of a heatmap pixel.
    """
    h, w = image.shape[:2]
    stride = tile - overlap
    if stride % ratio_net:
        raise ValueError(
            f"tile stride {stride} (tile {tile} - overlap {overlap}) must be "
            f"a multiple of ratio_net={ratio_net} for exact heatmap stitching"
        )
    coords = [
        (y, x)
        for y in tile_positions(h, tile, stride)
        for x in tile_positions(w, tile, stride)
    ]
    tiles = jnp.stack(
        [jax.lax.dynamic_slice(image, (y, x, 0), (tile, tile, image.shape[2]))
         for (y, x) in coords]
    )
    return tiles, coords


def stitch_heatmaps(
    tile_scores: jnp.ndarray,
    coords: List[Tuple[int, int]],
    out_h: int,
    out_w: int,
    ratio_net: int = 2,
) -> jnp.ndarray:
    """Max-blend per-tile heatmaps [n, t/r, t/r, C] into [out_h, out_w, C].

    Coordinates are image-space tile origins; heatmaps are at 1/ratio_net
    resolution.
    """
    n, th, tw, c = tile_scores.shape
    out = jnp.full((out_h, out_w, c), -jnp.inf, tile_scores.dtype)
    for i, (y, x) in enumerate(coords):
        y2, x2 = y // ratio_net, x // ratio_net
        cur = jax.lax.dynamic_slice(out, (y2, x2, 0), (th, tw, c))
        out = jax.lax.dynamic_update_slice(
            out, jnp.maximum(cur, tile_scores[i]), (y2, x2, 0)
        )
    return out
