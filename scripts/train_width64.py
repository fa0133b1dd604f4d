"""Finetune the production recognizer at HALF-WIDTH crops (32x64) and
evaluate the half-width serving preset.

Why: the recognizer encoder is ~46% of the composed dense serving budget
(scripts/profile_composed.py: encoder 75.5 ms of the 165 ms chain at the
1856-crop slab, 71.75% MFU — near the bf16 roofline, so FASTER needs FEWER
FLOPs, not a better schedule). The ViT's cost is set by its token count:
32x128 crops -> 8x16 = 128 tokens regardless of word length. Serving crops
at 32x64 (same patch size, 8x8 = 64 tokens) cuts encoder FLOPs ~2.05x
(linear terms halve, the S^2 attention term quarters) and halves the decode
kernel's cross-attention memory reads — with the SAME architecture and
weights layout; only the pos-embed grid narrows. The reference model can't
serve this geometry (it was trained at 128), but these weights are ours:
this script finetunes from evals/production_weights at width 64 and
measures exactly what the trade costs in held-out accuracy.

Produces:
  evals/production_weights_w64/   engine-loadable weights dir (detector
                                  copied from production_weights; stored
                                  ParseqConfig has img_size=(32, 64))
  evals/production_w64_eval.json  held-out word + e2e page metrics

Serving: OcrEngine(OcrConfig(rec_width=64, ...),
                   weights_dir="evals/production_weights_w64")
(the engine refuses a rec_width/img_size mismatch at construction).

Usage: python scripts/train_width64.py [--quick]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--pool", type=int, default=None)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--peak-lr", type=float, default=2e-4)
    ap.add_argument("--maxlen", type=int, default=12)
    ap.add_argument("--from-dir",
                    default=os.path.join(REPO, "evals", "production_weights"))
    ap.add_argument("--out-dir",
                    default=os.path.join(REPO, "evals",
                                         "production_weights_w64"))
    args = ap.parse_args()
    steps = args.steps or (300 if args.quick else 12000)
    pool_n = args.pool or (512 if args.quick else 65536)

    import jax
    import jax.numpy as jnp
    import optax

    from tuatara_tpu.api import OcrEngine
    from tuatara_tpu.config import OcrConfig, ParseqConfig
    from tuatara_tpu.tokenizer import Tokenizer
    from tuatara_tpu.train.run import evaluate_recognizer, fit_recognizer
    from tuatara_tpu.utils.data import synthetic_text_pages, word_batch, word_pool
    from tuatara_tpu.utils.metrics import char_error_rate, evaluate_engine
    from tuatara_tpu.utils.weights import (
        load_configs, load_weights_dir, save_weights_dir,
    )

    t_start = time.time()
    tok = Tokenizer()
    _, stored_pcfg, _ = load_configs(args.from_dir)
    base_pcfg = stored_pcfg or ParseqConfig()
    pcfg = dataclasses.replace(base_pcfg, img_size=(32, 64))

    # ---- init from the production weights, pos-embed grid 8x16 -> 8x8 ----
    # Patch tokens flatten (grid_h, grid_w) row-major (parseq_encode's
    # reshape), so the 64-wide grid's positions are the LEFT half-columns
    # of the 128-wide grid. Finetuning re-fits them to full words anyway;
    # the slice is just a better-than-random start.
    _, rec_params = load_weights_dir(args.from_dir)
    gh = base_pcfg.img_size[0] // base_pcfg.patch_size[0]
    gw = base_pcfg.img_size[1] // base_pcfg.patch_size[1]
    gw2 = 64 // base_pcfg.patch_size[1]
    pe = np.asarray(rec_params["pos_embed"])  # [1, gh*gw, D]
    rec_params = dict(rec_params)
    rec_params["pos_embed"] = jnp.asarray(
        pe.reshape(1, gh, gw, -1)[:, :, :gw2].reshape(1, gh * gw2, -1))

    # ---- pool + refresher (train_production.py's recipe at width 64) ----
    import threading

    print(f"rendering {pool_n}-word uint8 pool at 32x64 "
          f"(maxlen {args.maxlen})...", flush=True)
    t0 = time.time()
    pool = word_pool(pool_n, tok, np.random.default_rng(0),
                     max_length=pcfg.max_label_length,
                     max_len=args.maxlen, width=64)
    print(f"pool rendered in {time.time() - t0:.0f}s", flush=True)

    pool_lock = threading.Lock()
    stop_refresh = threading.Event()
    fresh_count = [0]

    def refresher():
        rrng = np.random.default_rng(123456)
        chunk = 64
        while not stop_refresh.is_set():
            tmp = word_pool(chunk, tok, rrng,
                            max_length=pcfg.max_label_length,
                            max_len=args.maxlen, width=64)
            start = int(rrng.integers(0, pool_n - chunk))
            with pool_lock:
                for k in ("crops_u8", "labels", "lengths"):
                    pool[k][start:start + chunk] = tmp[k]
            fresh_count[0] += chunk

    threading.Thread(target=refresher, daemon=True).start()
    srng = np.random.default_rng(42)

    def batch_iter():
        while True:
            idx = srng.integers(0, pool_n, args.batch)
            with pool_lock:
                yield {"crops": pool["crops_u8"][idx],
                       "labels": pool["labels"][idx],
                       "lengths": pool["lengths"][idx]}

    lr = optax.warmup_cosine_decay_schedule(
        0.0, args.peak_lr, min(500, steps // 2 + 1), steps,
        args.peak_lr / 10)
    print(f"finetuning at 32x64: {steps} steps (batch {args.batch}, "
          f"peak lr {args.peak_lr})...", flush=True)
    t0 = time.time()
    rec_params, losses = fit_recognizer(
        steps=steps, batch_size=args.batch, lr=lr, cfg=pcfg, tokenizer=tok,
        data_iter=batch_iter(), seed=1, k_perms=6, grad_clip=1.0,
        weight_decay=0.01, init_params=rec_params,
        log_every=max(steps // 20, 1))
    train_s = time.time() - t0
    stop_refresh.set()

    # ---- held-out word accuracy at width 64 ------------------------------
    def heldout(max_len, seed):
        held = word_batch(512, tok, np.random.default_rng(seed),
                          max_length=pcfg.max_label_length,
                          max_len=max_len, style="font", width=64)
        acc, texts = evaluate_recognizer(rec_params, held, pcfg, tok)
        cer = char_error_rate(list(zip(texts, held["texts"])))
        return acc, cer

    acc8, cer8 = heldout(8, 777)
    accL, cerL = heldout(args.maxlen, 778)
    print(f"held-out @32x64: word_acc<=8={acc8:.3f} cer={cer8:.4f} | "
          f"word_acc<={args.maxlen}={accL:.3f} cer={cerL:.4f} "
          f"(train {train_s:.0f}s)", flush=True)

    # ---- compose with the production detector + save ---------------------
    det_params, _ = load_weights_dir(args.from_dir)
    craft_cfg, _, charset = load_configs(args.from_dir)
    os.makedirs(args.out_dir, exist_ok=True)
    save_weights_dir(args.out_dir, det_params, jax.device_get(rec_params),
                     craft_config=craft_cfg, parseq_config=pcfg,
                     charset=charset or tok.charset)

    # ---- end-to-end on held-out synthetic pages (serving geometry) -------
    PAGE = 256
    ocr_cfg = OcrConfig(canvas_size=PAGE, max_boxes=32, rec_buckets=(32,),
                        max_label_length=pcfg.max_label_length,
                        rec_width=64)
    engine = OcrEngine(ocr_cfg, weights_dir=args.out_dir)
    held_pages = synthetic_text_pages(16, tok, np.random.default_rng(888),
                                      size=PAGE, words_per_page=8,
                                      max_len=8, style="font")
    imgs = [(p * 255).astype(np.uint8) for p in held_pages["pages"]]
    e2e = evaluate_engine(engine, imgs, held_pages["truths"],
                          iou_threshold=0.5)
    print("end-to-end held-out @rec_width=64:", json.dumps(e2e), flush=True)

    artifact = {
        "args": {"steps": steps, "pool": pool_n, "batch": args.batch,
                 "peak_lr": args.peak_lr, "maxlen": args.maxlen,
                 "quick": bool(args.quick), "from_dir":
                 os.path.relpath(args.from_dir, REPO)},
        "backend": str(jax.devices()[0]),
        "recognizer": {
            "img_size": [32, 64],
            "heldout_words": 512,
            "word_acc_len8": round(acc8, 4),
            "cer_len8": round(cer8, 4),
            f"word_acc_len{args.maxlen}": round(accL, 4),
            f"cer_len{args.maxlen}": round(cerL, 4),
            "train_seconds": round(train_s, 1),
            "loss_curve": [round(v, 4) for v in losses],
        },
        "end_to_end": {"heldout_pages": len(imgs), "iou_0.5": e2e},
        "wall_seconds": round(time.time() - t_start, 1),
    }
    out_json = os.path.join(REPO, "evals", "production_w64_eval.json")
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
