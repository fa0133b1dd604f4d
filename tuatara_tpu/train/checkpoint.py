"""Training checkpoint / resume.

The reference has no checkpointing of any kind (SURVEY.md §5.4 — model
persistence is read-only TorchScript loaded per call). Here the full train
state — both model parameter trees, optimizer state, and step counter —
round-trips through the same flat-npz pytree format the serving weights use
(utils/weights.py), so a checkpointed recognizer can be served directly by
pointing the engine's weights_dir at the checkpoint.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tuatara_tpu.train.trainer import TrainState
from tuatara_tpu.utils.weights import CRAFT_FILE, PARSEQ_FILE, load_params

OPT_FILE = "opt_state.npz"
META_FILE = "meta.npz"


def save_checkpoint(ckpt_dir: str, state: TrainState,
                    craft_config=None, parseq_config=None,
                    charset: "str | None" = None) -> None:
    """Persist a train state; pass the model configs (and, for a
    non-reference charset retrain, the charset string) so the checkpoint dir
    is directly servable as an OcrEngine weights_dir (the engine reads the
    stored architecture + decode table from config.json)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    host = jax.device_get(state)
    from tuatara_tpu.utils.weights import save_weights_dir

    save_weights_dir(ckpt_dir, host.craft_params, host.parseq_params,
                     craft_config=craft_config, parseq_config=parseq_config,
                     charset=charset)
    # Optimizer state is an optax pytree (tuples/namedtuples/dicts); persist
    # leaves positionally against the treedef of a reference state.
    opt_leaves = jax.tree.leaves(host.opt_state)
    np.savez(os.path.join(ckpt_dir, OPT_FILE),
             **{str(i): np.asarray(l) for i, l in enumerate(opt_leaves)})
    np.savez(os.path.join(ckpt_dir, META_FILE), step=np.asarray(host.step))


def load_checkpoint(ckpt_dir: str, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (from init_train_state)."""
    craft = load_params(os.path.join(ckpt_dir, CRAFT_FILE))
    parseq = load_params(os.path.join(ckpt_dir, PARSEQ_FILE))
    with np.load(os.path.join(ckpt_dir, OPT_FILE)) as z:
        leaves = [z[str(i)] for i in range(len(z.files))]
    treedef = jax.tree.structure(template.opt_state)
    opt_state = jax.tree.unflatten(treedef, leaves)
    with np.load(os.path.join(ckpt_dir, META_FILE)) as z:
        step = jnp.asarray(z["step"])
    return TrainState(step, craft, parseq, opt_state)


def latest_step(ckpt_dir: str) -> Optional[int]:
    meta = os.path.join(ckpt_dir, META_FILE)
    if not os.path.isfile(meta):
        return None
    with np.load(meta) as z:
        return int(z["step"])


# ---------------------------------------------------------------------------
# Optional Orbax backend (async, sharded-array aware). The npz format above
# stays the canonical interchange (servable as a weights_dir); Orbax suits
# long training runs on multi-chip meshes where per-shard async saves matter.
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(ckpt_dir: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(os.path.join(ckpt_dir, "orbax")),
            {
                "step": state.step,
                "craft": state.craft_params,
                "parseq": state.parseq_params,
                "opt": state.opt_state,
            },
            force=True,
        )


def load_checkpoint_orbax(ckpt_dir: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    target = {
        "step": template.step,
        "craft": template.craft_params,
        "parseq": template.parseq_params,
        "opt": template.opt_state,
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.abspath(os.path.join(ckpt_dir, "orbax")), target
        )
    return TrainState(restored["step"], restored["craft"],
                      restored["parseq"], restored["opt"])
