"""Training losses for both model families.

The reference ships no training at all (models arrive as opaque TorchScript,
SURVEY.md §5.4); this subsystem makes the rebuilt framework self-sufficient:
it can (re)train the recognizer — e.g. the extended-charset/space-character
retrain the reference README lists as TODO — and fine-tune the detector.

* CRAFT: per-pixel MSE against region/affinity target heatmaps with
  Online Hard Negative Mining (background pixels are abundant; keep the
  hardest `neg_ratio` x positives), the standard CRAFT training objective.
* PARSEQ: permutation language modeling — cross-entropy of the decoder under
  K sampled factorization orders (always including left-to-right, plus
  mirrored pairs), the core of the PARSEQ method. Masks are built per
  permutation: query position q may attend content position c iff c's token
  precedes q in the permutation order.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tuatara_tpu.config import CraftConfig, ParseqConfig
from tuatara_tpu.models.craft import craft_forward, craft_forward_train
from tuatara_tpu.models.parseq import parseq_decode, parseq_encode


# ---------------------------------------------------------------------------
# CRAFT
# ---------------------------------------------------------------------------

def craft_loss(
    params,
    images: jnp.ndarray,
    target_heatmaps: jnp.ndarray,
    confidence: jnp.ndarray | None = None,
    cfg: CraftConfig = CraftConfig(),
    neg_ratio: float = 3.0,
    train_bn: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """OHEM-balanced MSE on (region, affinity) heatmaps.

    images [B, H, W, 3] in [0,1]; target_heatmaps [B, H/2, W/2, 2];
    confidence [B, H/2, W/2] optional per-pixel weight (weak-supervision
    confidence in the CRAFT recipe).

    With train_bn (the default), BN uses batch statistics and the updated
    running stats are returned under metrics["craft_bn_params"]
    (stop-gradient'ed full param tree) for the trainer to splice back after
    the optimizer step; train_bn=False is frozen-BN fine-tuning.
    """
    if train_bn:
        pred, _, new_bn = craft_forward_train(params, images, cfg)
    else:
        pred, _ = craft_forward(params, images, cfg)
        new_bn = None
    err = (pred - target_heatmaps) ** 2  # [B, h, w, 2]
    if confidence is not None:
        err = err * confidence[..., None]

    def channel_ohem(err_c: jnp.ndarray, tgt_c: jnp.ndarray):
        """OHEM over ONE map: positives are that map's own supervised
        pixels. Mining region and affinity separately matters — an
        affinity-positive pixel between widely spaced characters has
        region target ~0, and a region-only positive definition would
        demote it to a background negative that OHEM can drop entirely,
        removing its affinity supervision (the standard CRAFT objective
        mines the two maps independently)."""
        pos = tgt_c > 0.1
        pos_loss = jnp.where(pos, err_c, 0.0)
        n_pos = jnp.maximum(pos.sum(), 1)
        neg_vals = jnp.where(pos, -jnp.inf, err_c).reshape(-1)
        k = neg_vals.shape[0]
        sorted_negs = jnp.sort(neg_vals)[::-1]
        n_neg = jnp.minimum((neg_ratio * n_pos).astype(jnp.int32), k)
        thresh = sorted_negs[jnp.clip(n_neg - 1, 0, k - 1)]
        neg_keep = (~pos) & (err_c >= thresh) & jnp.isfinite(err_c)
        neg_loss = jnp.where(neg_keep, err_c, 0.0)
        denom = n_pos + jnp.maximum(neg_keep.sum(), 1)
        return (pos_loss.sum() + neg_loss.sum()) / denom, pos_loss.sum() / n_pos, n_pos

    l_region, pos_region, n_pos = channel_ohem(err[..., 0], target_heatmaps[..., 0])
    l_affinity, _, _ = channel_ohem(err[..., 1], target_heatmaps[..., 1])
    loss = l_region + l_affinity
    metrics = {"craft_pos": pos_region, "craft_n_pos": n_pos}
    if new_bn is not None:
        metrics["craft_bn_params"] = new_bn
    return loss, metrics


# ---------------------------------------------------------------------------
# PARSEQ permutation language modeling
# ---------------------------------------------------------------------------

def gen_permutations(key: jax.Array, max_len: int, k_perms: int) -> jnp.ndarray:
    """[K, max_len] factorization orders over label positions 1..max_len.

    Row 0 is always left-to-right; odd rows are the mirror (reverse) of the
    preceding row, matching PARSEQ's perm_mirrored recipe.
    """
    lr = jnp.arange(1, max_len + 1)
    rows = [lr]
    keys = jax.random.split(key, max(k_perms // 2, 1))
    while len(rows) < k_perms:
        if len(rows) % 2 == 1:
            rows.append(rows[-1][::-1])  # mirror of previous
        else:
            r = jax.random.permutation(keys[(len(rows) // 2 - 1) % len(keys)], lr)
            rows.append(r)
    return jnp.stack(rows[:k_perms])


def perm_attention_masks(perm: jnp.ndarray, max_len: int):
    """Masks for one factorization order `perm` [max_len] of positions
    1..max_len (position 0 = BOS, position max_len+1 = EOS slot).

    Returns (query_mask [T, T], ) where T = max_len + 1 content slots
    (BOS + max_len tokens); query q (predicting the token at output slot q,
    i.e. content slot q+1) may attend content c iff c==0 (BOS) or c's token
    comes before q+1's token in `perm`.
    """
    T = max_len + 1
    # rank[p] = position of content-slot p (1..max_len) in the permutation.
    rank = jnp.zeros((max_len + 2,), jnp.int32)
    rank = rank.at[perm].set(jnp.arange(max_len, dtype=jnp.int32) + 1)
    # content slot c has rank[c] (BOS rank 0); query for output slot q
    # corresponds to the token at content slot q+1 with rank[q+1].
    q_rank = rank[jnp.arange(1, T + 1).clip(0, max_len + 1)]  # [T]
    q_rank = jnp.where(jnp.arange(T) == max_len, max_len + 1, q_rank)  # EOS slot: sees all
    c_rank = rank[jnp.arange(T).clip(0, max_len)]  # [T], slot0=BOS rank 0
    return c_rank[None, :] < q_rank[:, None]  # [T_query, T_content]


def parseq_plm_loss(
    params,
    images: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    key: jax.Array,
    cfg: ParseqConfig = ParseqConfig(),
    k_perms: int = 6,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Permutation-LM cross-entropy.

    images [N, 32, 128, 3] in [0,1]; labels [N, max_len+2] =
    [BOS, chars..., EOS, PAD...] (tokenizer.encode layout); label_lengths [N]
    = chars + EOS count.
    """
    T = cfg.max_label_length + 1
    memory = parseq_encode(params, images, cfg)

    tgt_in = labels[:, :T]          # [BOS, chars...]
    tgt_out = labels[:, 1 : T + 1]  # [chars..., EOS, PAD...]
    steps = jnp.arange(T)[None]
    loss_mask = steps < label_lengths[:, None]  # include EOS position
    is_eos = tgt_out == 0

    perms = gen_permutations(key, cfg.max_label_length, k_perms)

    # Content key-padding mask (the PARSEQ recipe's tgt_padding_mask): block
    # attention to EOS and everything after it (PADs always follow EOS in the
    # tokenizer.encode layout) so live queries of short labels never attend
    # PAD/EOS content embeddings under mirrored/random permutations. Mirrors
    # parseq_refine (models/parseq.py).
    pad = jnp.cumsum((tgt_in == 0).astype(jnp.int32), axis=1) > 0  # [N, T]

    def one_perm(perm, keep_eos):
        qmask = perm_attention_masks(perm, cfg.max_label_length)[None, None]
        qmask = qmask & ~pad[:, None, None, :]  # [N, 1, T, T]
        logits = parseq_decode(params, memory, tgt_in, cfg, query_mask=qmask)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok_lp = jnp.take_along_axis(logp, tgt_out[..., None].clip(0, logits.shape[-1] - 1), axis=-1)[..., 0]
        # The PARSEQ recipe supervises EOS only under the canonical +
        # mirrored pair: under an arbitrary permutation "predict EOS" is
        # asked from a sparse context subset (e.g. from BOS alone), and
        # averaging that over K perms trains premature termination.
        m = loss_mask & (keep_eos | ~is_eos)
        return -(tok_lp * m).sum(), m.sum()

    keep_eos = jnp.arange(k_perms) < 2
    per_perm_loss, per_perm_count = jax.vmap(one_perm)(perms, keep_eos)
    loss = per_perm_loss.sum() / jnp.maximum(per_perm_count.sum(), 1)
    return loss, {"parseq_ce": loss}
