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

    if data is None:
        data = fresh()

    params = init_params or init_parseq_params(jax.random.PRNGKey(seed), cfg)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, crops, labels, lengths, key):
        def loss_fn(p):
            loss, m = parseq_plm_loss(
                p, crops, labels, lengths, key, cfg, k_perms=k_perms,
            )
            return loss, m

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    pool = None
    if data["crops"].shape[0] > batch_size:
        # Pre-rendered pool: keep it device-resident once; sample indices
        # host-side, gather the minibatch on device (fixed shapes).
        pool = {k: jnp.asarray(v) for k, v in data.items() if k != "texts"}

    losses = []
    key = jax.random.PRNGKey(seed + 1)
    for i in range(steps):
        key, sub = jax.random.split(key)
        if pool is not None:
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
