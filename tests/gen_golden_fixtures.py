"""Generate the default-config golden fixtures (run once, commit outputs).

Random weights produce degenerate detections (one page-sized blob), which
pins nothing useful at production shapes. This script briefly trains the
tiny detector on synthetic text-like pages (deterministic, CPU) until it
responds to dark strokes, trains the tiny recognizer on rendered words, and
then records the FULL pipeline's outputs on all six reference images at the
DEFAULT OcrConfig geometry (1024 canvas, 256-box budget, default thresholds
and buckets) — a behavior change at production scale now fails CI.

Outputs (committed):
  tests/fixtures/golden_weights/{craft_weights,parseq_weights}.npz
  tests/fixtures/golden_default.json

Usage: PYTHONPATH=. python tests/gen_golden_fixtures.py
"""

import json
import os

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
FIXDIR = os.path.join(HERE, "fixtures")
WEIGHTS_DIR = os.path.join(FIXDIR, "golden_weights")

from tuatara_tpu.api import OcrEngine  # noqa: E402
from tuatara_tpu.config import CraftConfig, OcrConfig, ParseqConfig  # noqa: E402
from tuatara_tpu.tokenizer import Tokenizer  # noqa: E402
from tuatara_tpu.train.run import fit_detector, fit_recognizer  # noqa: E402
from tuatara_tpu.utils.data import word_batch  # noqa: E402
from tuatara_tpu.utils.image import asset_path, load_image  # noqa: E402
from tuatara_tpu.utils.weights import save_weights_dir  # noqa: E402

TINY_CRAFT = CraftConfig(
    stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
    up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
    head_channels=(8, 8, 8, 8),
)
TINY_PARSEQ = ParseqConfig(embed_dim=32, enc_depth=1, enc_heads=4, dec_heads=4,
                           max_label_length=7)
OCR = OcrConfig(max_label_length=7)  # default geometry/thresholds/buckets

IMAGES = [
    "funsd_0001129658", "funsd_91372360", "resume_example",
    "table_english", "rotated_text",
]


def main():
    # --reuse-weights: re-record pipeline outputs against the COMMITTED
    # weights without retraining — the mode for numerics-only changes, so a
    # fixture regeneration cannot conflate weight drift with math drift
    # (ADVICE r2: regenerate weights and fixtures in separate commits).
    reuse = "--reuse-weights" in os.sys.argv
    os.makedirs(WEIGHTS_DIR, exist_ok=True)
    if reuse:
        if not os.path.isfile(os.path.join(WEIGHTS_DIR, "craft.npz")):
            raise SystemExit("--reuse-weights: no committed weights found")
        print("reusing committed golden weights (no retrain)")
    else:
        craft_p, craft_losses = fit_detector(steps=400, cfg=TINY_CRAFT, seed=0)
        craft_p = jax.device_get(craft_p)
        print(f"craft loss {craft_losses[0]:.3f} -> {craft_losses[-1]:.3f}")

        tok = Tokenizer()
        data = word_batch(8, tok, np.random.default_rng(1), max_length=7,
                          min_len=2, max_len=5)
        parseq_p, losses = fit_recognizer(steps=300, cfg=TINY_PARSEQ,
                                          tokenizer=tok, data=data, lr=3e-3,
                                          seed=0, k_perms=6, log_every=100)
        print(f"parseq loss {losses[0]:.3f} -> {losses[-1]:.3f}")
        save_weights_dir(WEIGHTS_DIR, craft_p, jax.device_get(parseq_p),
                         craft_config=TINY_CRAFT, parseq_config=TINY_PARSEQ)

    engine = OcrEngine(OCR, TINY_CRAFT, TINY_PARSEQ, weights_dir=WEIGHTS_DIR)
    fixture = {"config": {"canvas_size": OCR.canvas_size,
                          "max_boxes": OCR.max_boxes,
                          "max_label_length": OCR.max_label_length},
               "images": {}}
    for name in IMAGES:
        img = load_image(asset_path(f"{name}.png"))
        out = engine.run(img)
        fixture["images"][name] = out
        print(f"{name}: {len(out)} boxes; texts: {[r['text'] for r in out[:6]]}")

    with open(os.path.join(FIXDIR, "golden_default.json"), "w") as f:
        json.dump(fixture, f, indent=1)
    print("wrote", os.path.join(FIXDIR, "golden_default.json"))


if __name__ == "__main__":
    main()
