"""Training step + state, sharded over a device mesh.

The reference has no training, no checkpoint/resume, no distributed runtime
(SURVEY.md §2, §5.3-5.4, §5.8). This module provides the TPU-native
equivalents: a pure-functional `train_step` (joint CRAFT + PARSEQ objective)
jitted over a `jax.sharding.Mesh` with explicit data-parallel batch sharding
and tensor-parallel sharding of the transformer weights — XLA inserts the
ICI collectives (psum for gradient reduction, all-gathers for tp) from the
sharding annotations alone.

Checkpointing: train state round-trips through utils/weights.py npz
persistence (orbax-compatible pytrees).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tuatara_tpu.config import CraftConfig, ParseqConfig
from tuatara_tpu.models.craft import init_craft_params
from tuatara_tpu.models.parseq import init_parseq_params
from tuatara_tpu.train.losses import craft_loss, parseq_plm_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    craft_params: Any
    parseq_params: Any
    opt_state: Any


def make_optimizer(lr: float = 7e-4, weight_decay: float = 0.0) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=weight_decay),
    )


def init_train_state(
    key: jax.Array,
    craft_cfg: CraftConfig = CraftConfig(),
    parseq_cfg: ParseqConfig = ParseqConfig(),
    tx: Optional[optax.GradientTransformation] = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    k1, k2 = jax.random.split(key)
    craft_p = init_craft_params(k1, craft_cfg)
    parseq_p = init_parseq_params(k2, parseq_cfg)
    tx = tx or make_optimizer()
    opt_state = tx.init({"craft": craft_p, "parseq": parseq_p})
    return TrainState(jnp.int32(0), craft_p, parseq_p, opt_state), tx


def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    tx: optax.GradientTransformation,
    craft_cfg: CraftConfig = CraftConfig(),
    parseq_cfg: ParseqConfig = ParseqConfig(),
    craft_weight: float = 1.0,
    train_bn: bool = True,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One joint optimization step.

    batch keys:
      pages   [B, H, W, 3]   float in [0,1]     (detector input)
      heat    [B, H/2, W/2, 2]                  (region/affinity targets)
      crops   [N, 32, 128, 3] float in [0,1]    (recognizer input)
      labels  [N, max_len+2] int32              (BOS..EOS..PAD)
      lengths [N] int32

    With train_bn (default) the detector's BN layers normalize with batch
    statistics and their running stats update each step (spliced into the new
    state after the optimizer step — they are buffers, not trained weights).
    train_bn=False is frozen-BN fine-tuning on the stored running stats.
    """

    def loss_fn(params):
        lc, mc = craft_loss(
            params["craft"], batch["pages"], batch["heat"], cfg=craft_cfg,
            train_bn=train_bn,
        )
        lp, mp = parseq_plm_loss(
            params["parseq"], batch["crops"], batch["labels"], batch["lengths"],
            key, parseq_cfg,
        )
        return craft_weight * lc + lp, {**mc, **mp, "loss_craft": lc, "loss_parseq": lp}

    params = {"craft": state.craft_params, "parseq": state.parseq_params}
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, state.opt_state, params)
    params = optax.apply_updates(params, updates)
    craft_p = params["craft"]
    bn_params = metrics.pop("craft_bn_params", None)
    if bn_params is not None:
        craft_p = _splice_bn_stats(craft_p, bn_params)
    new_state = TrainState(
        state.step + 1, craft_p, params["parseq"], opt_state
    )
    metrics["loss"] = loss
    return new_state, metrics


def _splice_bn_stats(trained: Any, bn_source: Any) -> Any:
    """Take BN running mean/var from `bn_source` (the train-mode forward's
    updated buffers), everything else from `trained` (the optimizer output).
    Both trees share the CRAFT param structure."""

    def pick(path, a, b):
        name = getattr(path[-1], "key", None)
        return b if name in ("mean", "var") else a

    return jax.tree_util.tree_map_with_path(pick, trained, bn_source)


# ---------------------------------------------------------------------------
# Sharding layouts
# ---------------------------------------------------------------------------

def batch_pspec() -> Dict[str, P]:
    """Data-parallel: leading batch dim of every batch field over 'dp'."""
    return {
        "pages": P("dp"), "heat": P("dp"),
        "crops": P("dp"), "labels": P("dp"), "lengths": P("dp"),
    }


def parseq_param_pspecs(params: Any) -> Any:
    """Tensor-parallel layout for PARSEQ weights over the 'tp' axis.

    Attention q/k/v projections and MLP fc1 shard their output (head)
    dimension; attention output projection and MLP fc2 shard their input
    dimension — the Megatron layout, so each pair needs only one psum which
    XLA emits automatically. Everything else (norms, embeddings) replicates.
    """

    def spec_for(path: Tuple, leaf) -> P:
        names = [getattr(p, "name", getattr(p, "key", None)) or str(getattr(p, "idx", "")) for p in path]
        s = "/".join(str(n) for n in names)
        if leaf.ndim != 2:
            return P()
        if any(k in s for k in ("attn/q/w", "attn/k/w", "attn/v/w", "fc1/w", "linear1/w")):
            return P(None, "tp")
        if any(k in s for k in ("attn/o/w", "fc2/w", "linear2/w")):
            return P("tp", None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_train_state(
    mesh: Mesh, state: TrainState, tx: optax.GradientTransformation
) -> TrainState:
    """Commit the train state to the mesh: CRAFT replicated, PARSEQ
    tensor-parallel over 'tp', optimizer state resharded so Adam moments
    carry their parameter's layout.

    The EXISTING optimizer state is resharded in place (moments of a
    resumed run must survive) and no throwaway optimizer state is ever
    allocated. Moment shardings are derived STRUCTURALLY via
    optax.tree_map_params — each param-shaped optimizer leaf gets its
    parameter's sharding by tree position. (An earlier version compiled
    tx.init and read output_shardings; that silently replicated every
    moment, because tx.init's outputs are zeros_like — value-independent of
    the inputs, so GSPMD has no sharding to propagate — which is exactly
    the tp-memory blowup this function exists to avoid.)"""

    def ns(spec):
        return NamedSharding(mesh, spec)

    craft_shard = jax.tree.map(lambda _: ns(P()), state.craft_params)
    parseq_shard = jax.tree.map(
        ns, parseq_param_pspecs(state.parseq_params),
        is_leaf=lambda x: isinstance(x, P))
    craft_p = jax.device_put(state.craft_params, craft_shard)
    parseq_p = jax.device_put(state.parseq_params, parseq_shard)
    param_shardings = {"craft": craft_shard, "parseq": parseq_shard}
    opt_shardings = optax.tree_map_params(
        tx,
        lambda _leaf, s: s,
        state.opt_state,
        param_shardings,
        # Non-param leaves (Adam's step count, clip state) replicate.
        transform_non_params=lambda _leaf: ns(P()),
    )
    opt_state = jax.device_put(state.opt_state, opt_shardings)
    return TrainState(jax.device_put(state.step, ns(P())), craft_p, parseq_p, opt_state)


def shard_batch(mesh: Mesh, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    specs = batch_pspec()
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k])) for k, v in batch.items()
    }
