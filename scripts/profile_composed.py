"""Per-stage device-time attribution for the composed dense serving config.

The composed config (calibrated-int8 detector + bf16 Pallas recognizer
kernels + exact-fit /32 canvas + 64-granularity recognition slabs) is the
fastest measured single-chip serving point (BENCH composed_exact_canvas_
dense_compute_pages_per_sec). This script splits its per-batch device time
into detect / crop / recognize(encoder, decode) so optimization effort lands
where the milliseconds are. Uses the bench harness's hardened _queued_ms
(distinct inputs + value-readback fence) and the same forced 116-box/page
FUNSD geometry.

Run: python scripts/profile_composed.py  (on the TPU box; ~5-10 min warm)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import PAGES, _dense_engine, _forced_geometry, _queued_ms  # noqa: E402
from tuatara_tpu.utils.image import asset_path, load_image  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tuatara_tpu.api import OcrEngine
    from tuatara_tpu.config import DEFAULT_CONFIG

    img = load_image(asset_path("funsd_0001129658.png"), keep_gray=True)
    h, w = img.shape
    pages = np.broadcast_to(img, (PAGES,) + img.shape).copy()
    weights = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "evals", "production_weights")

    forced, n_boxes = _forced_geometry(h, w, DEFAULT_CONFIG.max_boxes, PAGES)
    ccfg = dataclasses.replace(
        DEFAULT_CONFIG, quantized_serving=True, encoder_impl="pallas",
        decode_impl="pallas", canvas_bucket=32, rec_slab_multiple=64)
    eng = _dense_engine(OcrEngine, forced)(ccfg, weights_dir=weights)
    eng.calibrate(pages)
    eng.run_pages(pages)
    eng.run_pages(pages)  # speculative steady state

    out = {"boxes_per_page": n_boxes, "pages": PAGES}
    total = n_boxes * PAGES
    gran = ccfg.rec_slab_multiple
    bucket = gran * ((total + gran - 1) // gran)
    out["slab"] = bucket

    pages_dev = jax.device_put(pages)

    # Stage 1: detect program (resize + canvas + CRAFT int8 + postproc).
    detf = eng._detect_fn(PAGES, h, w, 1)
    out["detect_ms"] = round(
        _queued_ms(detf, (eng.craft_params, pages_dev)), 2)

    # Stage 2: lazy-crop program (two-row-gather bilinear slab build).
    cropf = eng._crop_fn(PAGES, ccfg.max_boxes, bucket, h, w, 1)
    crops, _inv = cropf(pages_dev, forced["rects"], forced["valid"])
    out["crop_ms"] = round(_queued_ms(
        lambda r, im: cropf(im, forced["rects"], forced["valid"]),
        (None, pages_dev)), 2)

    # Stage 3: full recognition (Pallas encoder + fused greedy decode).
    recf = eng._recognize_fn(bucket)
    out["recognize_ms"] = round(
        _queued_ms(lambda p, c: recf(p, c)[0],
                   (eng.parseq_params, crops)), 2)

    # Stage 3a: encoder alone at the same slab.
    from tuatara_tpu.models.parseq import parseq_encode

    pcfg = eng.parseq_config
    encf = jax.jit(lambda p, c: parseq_encode(p, c, pcfg))
    out["encoder_ms"] = round(
        _queued_ms(encf, (eng.parseq_params, crops)), 2)
    out["decode_ms_implied"] = round(
        out["recognize_ms"] - out["encoder_ms"], 2)

    # Whole chained dispatch (detect -> crop -> recognize), the serving unit.
    unsf = eng._unsort_fn(bucket)

    def chain(params, im):
        det = detf(eng.craft_params, im)
        cr, inv = cropf(im, det["rects"], det["valid"])
        ids, conf = recf(eng.parseq_params, cr)
        return unsf(ids, conf, inv)[0]

    out["chain_ms"] = round(_queued_ms(chain, (None, pages_dev)), 2)
    out["sum_of_stages_ms"] = round(
        out["detect_ms"] + out["crop_ms"] + out["recognize_ms"], 2)
    out["chain_pages_per_sec"] = round(PAGES / (out["chain_ms"] / 1e3), 1)

    # Encoder FLOP attribution at this slab (closed form, bf16 peak).
    S, D = pcfg.seq_len, pcfg.embed_dim
    per_block = (4 * S * D * D + 2 * S * S * D
                 + 2 * S * D * int(D * pcfg.enc_mlp_ratio)) * 2
    ph, pw = pcfg.patch_size
    enc_flops = bucket * (S * (ph * pw * 3) * D * 2
                          + pcfg.enc_depth * per_block)
    out["encoder_mfu"] = round(
        enc_flops / (out["encoder_ms"] / 1e3) / 197e12, 4)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
