"""Minimal training loop driver.

Usage (programmatic; also exercised by tests/test_train_e2e.py):

    from tuatara_tpu.train.run import fit_recognizer
    params, history = fit_recognizer(steps=200)

This is the scaffolding a real retrain (e.g. the extended-charset run) plugs
a dataset into; it wires tokenizer -> synthetic data -> PLM loss -> optax,
all jitted. Persistence lives in train/checkpoint.py (save the returned
params with utils/weights.save_weights_dir to serve them).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tuatara_tpu.config import ParseqConfig
from tuatara_tpu.models.parseq import init_parseq_params, parseq_forward
from tuatara_tpu.tokenizer import Tokenizer
from tuatara_tpu.train.losses import parseq_plm_loss
from tuatara_tpu.utils.data import word_batch


def _augment_gray_u8(crops: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """[B, H, W] uint8 grayscale -> [B, H, W, 3] float32 in [0, 1] with the
    render-time photometric distribution re-randomized per step (contrast
    U(0.6,1.0), brightness U(0,0.3), gaussian noise sigma 0.03, snap to the
    uint8 grid — utils/data.render_word's recipe, moved on device) plus a
    small integer translation jitter (edge-replicated, +-3 px x / +-2 px y
    — an on-device stand-in for re-drawing the crop margins). Same pool
    row, different pixels every epoch: this is what lets a fixed uint8
    pool train a production-width recognizer without pixel-memorization."""
    B, H, W = crops.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    f = crops.astype(jnp.float32) / 255.0
    a = jax.random.uniform(k1, (B, 1, 1), minval=0.6, maxval=1.0)
    b = jax.random.uniform(k2, (B, 1, 1), minval=0.0, maxval=0.3)
    f = f * a + b
    f = jnp.clip(f + jax.random.normal(k3, f.shape) * 0.03, 0.0, 1.0)
    f = jnp.round(f * 255.0) / 255.0
    # translation jitter: pad edge-replicate, per-sample dynamic_slice
    py, px = 2, 3
    padded = jnp.pad(f, ((0, 0), (py, py), (px, px)), mode="edge")
    dyx = jax.random.randint(k4, (B, 2), 0,
                             jnp.array([2 * py + 1, 2 * px + 1]))
    f = jax.vmap(lambda img, d: jax.lax.dynamic_slice(
        img, (d[0], d[1]), (H, W)))(padded, dyx)
    return jnp.repeat(f[..., None], 3, axis=-1)


def fit_recognizer(
    steps: int = 200,
    batch_size: int = 8,
    lr: float = 1e-3,
    cfg: Optional[ParseqConfig] = None,
    tokenizer: Optional[Tokenizer] = None,
    k_perms: int = 1,
    seed: int = 0,
    data: Optional[Dict[str, np.ndarray]] = None,
    log_every: int = 50,
    resample: bool = False,
    charset_pool: Optional[str] = None,
    tight: bool = False,
    init_params: Optional[dict] = None,
    grad_clip: float = 0.0,
    weight_decay: float = 0.0,
    ckpt_every: int = 0,
    ckpt_fn=None,
    data_iter=None,
) -> Tuple[dict, List[float]]:
    """Train PARSEQ on synthetic rendered words; returns (params, losses).

    `resample=False` (default) trains on ONE fixed batch — the overfit /
    smoke-train mode the regression tests use. `resample=True` renders a
    FRESH `word_batch` every step (same recipe as `fit_detector`), which is
    what a recognizer that must GENERALIZE to held-out renders needs; the
    jitted step compiles once (fixed shapes), only the host-side render is
    per-step. Passing `data` with MORE rows than `batch_size` treats it as
    a pre-rendered pool and samples a random minibatch per step — the
    fast path on accelerators (rendering is host-side and serial; one
    up-front render amortizes it across all steps). `charset_pool` narrows
    the sampled characters (default: tokenizer alphanumerics).
    `init_params` resumes/warm-starts training.

    `grad_clip` > 0 wraps the optimizer in global-norm clipping and
    `weight_decay` > 0 switches adam -> adamw — the stability recipe
    production-width runs need (d128+ at the toy-run settings trained
    WORSE than d96, evals/synthetic_eval_d128.json; warmup — pass an
    optax schedule as `lr` — plus clipping fixes the early instability).

    `data_iter` (overrides `data`/`resample`): an iterator yielding a
    fresh host batch dict {"crops","labels","lengths"} per step — the
    production-run path. A FIXED pool is a word-level lookup task for a
    production-width model: ViT-S d384 memorized an 8k pool to loss 0.02
    yet scored 4.7% held-out word-acc (round-5 pilot); character-level
    reading needs effectively unbounded unique words, which a
    multiprocessing render prefetcher supplies faster than the train step
    consumes (scripts/train_production.py).
    """
    cfg = cfg or ParseqConfig()
    tok = tokenizer or Tokenizer()
    rng = np.random.default_rng(seed)

    def fresh():
        # Rendered word length must fit the label budget: longer words
        # would silently train premature EOS on truncated labels while the
        # crop still shows the full word.
        return word_batch(batch_size, tok, rng, max_length=cfg.max_label_length,
                          max_len=min(8, cfg.max_label_length),
                          charset=charset_pool, tight=tight)

    if data is None and data_iter is None:
        data = fresh()

    params = init_params or init_parseq_params(jax.random.PRNGKey(seed), cfg)
    tx = (optax.adamw(lr, weight_decay=weight_decay) if weight_decay > 0
          else optax.adam(lr))
    if grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, crops, labels, lengths, key):
        if crops.dtype == jnp.uint8 and crops.ndim == 3:
            # compact-pool path: photometrics + jitter on device
            key, kaug = jax.random.split(key)
            crops = _augment_gray_u8(crops, kaug)

        def loss_fn(p):
            loss, m = parseq_plm_loss(
                p, crops, labels, lengths, key, cfg, k_perms=k_perms,
            )
            return loss, m

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    pool = None
    if data_iter is not None:
        pass
    elif data["crops"].shape[0] > batch_size:
        # Pre-rendered pool: keep it device-resident once; sample indices
        # host-side, gather the minibatch on device (fixed shapes).
        pool = {k: jnp.asarray(v) for k, v in data.items() if k != "texts"}

    losses = []
    key = jax.random.PRNGKey(seed + 1)
    for i in range(steps):
        key, sub = jax.random.split(key)
        if data_iter is not None:
            d = next(data_iter)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(d["crops"]),
                jnp.asarray(d["labels"]), jnp.asarray(d["lengths"]), sub)
        elif pool is not None:
            idx = jnp.asarray(
                rng.integers(0, pool["crops"].shape[0], batch_size))
            params, opt_state, loss = step(
                params, opt_state, jnp.take(pool["crops"], idx, axis=0),
                jnp.take(pool["labels"], idx, axis=0),
                jnp.take(pool["lengths"], idx, axis=0), sub)
        else:
            if resample and i > 0:
                data = fresh()
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(data["crops"]),
                jnp.asarray(data["labels"]), jnp.asarray(data["lengths"]), sub)
        if i % log_every == 0 or i == steps - 1:
            losses.append(float(loss))
        if ckpt_fn is not None and ckpt_every > 0 and (
                (i + 1) % ckpt_every == 0 or i == steps - 1):
            ckpt_fn(i + 1, params, opt_state)
    return params, losses


def fit_detector(
    steps: int = 400,
    batch_size: int = 8,
    lr: float = 2e-3,
    cfg=None,
    page_size: int = 96,
    words_per_page: int = 4,
    seed: int = 0,
    log_every: int = 100,
    data_fn=None,
    init_params: Optional[dict] = None,
) -> Tuple[dict, List[float]]:
    """Train CRAFT on synthetic text-like pages; returns (params, losses).

    Fresh synthetic batches each step (utils/data.detection_batch: dark word
    bars + Gaussian region/affinity targets), OHEM loss, training-mode BN
    with running-stat threading. This loop produced the committed golden
    fixture detector (tests/gen_golden_fixtures.py), which localizes real
    FUNSD words — the from-scratch detector-training proof."""
    from tuatara_tpu.config import CraftConfig
    from tuatara_tpu.models.craft import init_craft_params
    from tuatara_tpu.train.losses import craft_loss
    from tuatara_tpu.utils.data import detection_batch

    cfg = cfg or CraftConfig()
    params = init_params or init_craft_params(jax.random.PRNGKey(seed), cfg)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    rng = np.random.default_rng(seed)

    @jax.jit
    def step(params, opt_state, pages, heat):
        def loss_fn(p):
            return craft_loss(p, pages, heat, cfg=cfg, train_bn=True)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        # BN running stats are buffers, not trained weights: splice the
        # train-forward's updated mean/var over the optimizer output.
        from tuatara_tpu.train.trainer import _splice_bn_stats

        params = _splice_bn_stats(params, metrics["craft_bn_params"])
        return params, opt_state, loss

    losses = []
    for i in range(steps):
        # data_fn overrides the built-in bar-page generator (e.g. rendered
        # TEXT pages from utils/data.synthetic_text_pages for a detector
        # that must find real glyphs); must return {"pages", "heat"}.
        d = data_fn() if data_fn is not None else detection_batch(
            batch_size, rng, size=page_size, words_per_page=words_per_page)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(d["pages"]),
                                       jnp.asarray(d["heat"]))
        if i % log_every == 0 or i == steps - 1:
            losses.append(float(loss))
    return params, losses


def evaluate_recognizer(params, data, cfg: ParseqConfig, tokenizer: Tokenizer):
    """Greedy-decode accuracy on a batch -> (exact-match rate, texts)."""
    logits = parseq_forward(params, jnp.asarray(data["crops"]), cfg,
                            compute_dtype=jnp.float32)
    texts = tokenizer.decode_ids(np.asarray(jnp.argmax(logits, -1)))
    hits = sum(t == w for t, w in zip(texts, data["texts"]))
    return hits / len(texts), texts
