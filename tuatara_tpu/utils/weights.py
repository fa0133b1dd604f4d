"""Weight persistence and registry.

The reference re-loads both TorchScript models from disk on every
`image_to_data` call (tuatara.cpp:333-340, 423-432 — SURVEY.md quirk 6). Here
model parameters are a plain JAX pytree persisted as a flat .npz, loaded once
per process by the engine registry (tuatara_tpu.api), and device-resident for
their lifetime.

Layout: one npz per model (`craft.npz`, `parseq.npz`) inside a weights
directory — the same directory-shaped contract as the reference's
weights_dir. Keys are '/'-joined pytree paths; list entries use their index.
Conversion from the reference's TorchScript artifacts lives in
utils/convert.py.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

CRAFT_FILE = "craft.npz"
PARSEQ_FILE = "parseq.npz"
CONFIG_FILE = "config.json"
CALIB_FILE = "calibration.npz"


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Any:
    """Inverse of flatten_tree. Integer-keyed levels become lists."""
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def to_lists(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [to_lists(node[str(i)]) for i in range(len(node))]
        return {k: to_lists(v) for k, v in node.items()}

    return to_lists(root)


def save_params(path: str, params: Any) -> None:
    np.savez(path, **flatten_tree(params))


def load_params(path: str) -> Any:
    with np.load(path) as z:
        return unflatten_tree({k: z[k] for k in z.files})


def weights_available(weights_dir: str) -> bool:
    return (
        bool(weights_dir)
        and os.path.isfile(os.path.join(weights_dir, CRAFT_FILE))
        and os.path.isfile(os.path.join(weights_dir, PARSEQ_FILE))
    )


def save_weights_dir(
    weights_dir: str,
    craft_params: Any,
    parseq_params: Any,
    craft_config: Any = None,
    parseq_config: Any = None,
    charset: "str | None" = None,
) -> None:
    """Persist model weights (+ their architecture configs when given, so a
    loading engine can instantiate the matching forward structure without
    the caller re-specifying it).

    `charset`: the character table the recognizer was trained with (e.g.
    tokenizer.EXTENDED_CHARSET for a space-aware retrain). Persisting it is
    what lets a fresh OcrEngine(weights_dir=...) decode with the RIGHT table
    instead of assuming the reference 94-char layout — charset_size alone is
    ambiguous (95 chars could be reference-bug-compat OR standard+space)."""
    os.makedirs(weights_dir, exist_ok=True)
    save_params(os.path.join(weights_dir, CRAFT_FILE), craft_params)
    save_params(os.path.join(weights_dir, PARSEQ_FILE), parseq_params)
    if craft_config is not None or parseq_config is not None or charset is not None:
        import dataclasses
        import json

        meta = {}
        if craft_config is not None:
            meta["craft"] = dataclasses.asdict(craft_config)
        if parseq_config is not None:
            meta["parseq"] = dataclasses.asdict(parseq_config)
        if charset is not None:
            meta["charset"] = charset
        with open(os.path.join(weights_dir, CONFIG_FILE), "w") as f:
            json.dump(meta, f, indent=1)


def load_weights_dir(weights_dir: str):
    if not weights_available(weights_dir):
        raise FileNotFoundError(
            f"weights_dir {weights_dir!r} must contain {CRAFT_FILE} and {PARSEQ_FILE}"
        )
    return (
        load_params(os.path.join(weights_dir, CRAFT_FILE)),
        load_params(os.path.join(weights_dir, PARSEQ_FILE)),
    )


def save_calibration(path: str, craft_params: Any, parseq_params: Any) -> int:
    """Persist calibrated static activation scales ("sx" leaves, see
    layers.make_static_quant) as a flat path-keyed npz. Weights themselves
    are NOT written: the scales are an overlay on the engine's
    init-time-quantized trees, re-applied by apply_static_scales. Returns
    the number of scales written."""
    flat: Dict[str, np.ndarray] = {}
    for prefix, tree in (("craft", craft_params), ("parseq", parseq_params)):
        for k, v in flatten_tree(tree, prefix + "/").items():
            if k.endswith("/sx"):
                flat[k] = v
    if not flat:
        # Nothing calibrated: do NOT touch the filesystem — an empty
        # calibration.npz left in a weights_dir would be auto-loaded (as 0
        # scales) by every future quantized engine.
        return 0
    np.savez(path, **flat)
    return len(flat)


def load_calibration(path: str):
    """-> ({craft path: scale}, {parseq path: scale}), paths relative to
    each model's root (feed to apply_static_scales)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    craft = {k[6:]: v for k, v in flat.items() if k.startswith("craft/")}
    parseq = {k[7:]: v for k, v in flat.items() if k.startswith("parseq/")}
    return craft, parseq


def apply_static_scales(params: Any, scales: Dict[str, np.ndarray]) -> int:
    """Set "sx" leaves into a quantized pytree by '/'-joined path, in place.

    Every path must land on a quantized block (one holding "wq") — a miss
    means the calibration file was produced under a different architecture
    or quantization config, and raises rather than silently serving with
    stale/partial scales. Returns the number of scales applied."""
    for key, val in scales.items():
        parts = key.split("/")
        node = params
        try:
            for p in parts[:-1]:
                node = node[int(p)] if isinstance(node, (list, tuple)) else node[p]
        except (KeyError, IndexError, TypeError) as e:
            raise KeyError(
                f"calibration path {key!r} not found in the quantized "
                f"params tree — calibration.npz was saved under a different "
                f"architecture/quantization config ({e})"
            ) from None
        if not isinstance(node, dict) or "wq" not in node:
            raise KeyError(
                f"calibration path {key!r} does not point at a quantized "
                f"layer (no 'wq') — was the engine built with "
                f"quantized_serving=True?"
            )
        node[parts[-1]] = np.float32(val)
    return len(scales)


def _listify(v):
    return tuple(_listify(x) for x in v) if isinstance(v, list) else v


def load_configs(weights_dir: str):
    """(CraftConfig | None, ParseqConfig | None, charset str | None) stored
    next to the weights."""
    import json

    path = os.path.join(weights_dir, CONFIG_FILE)
    if not os.path.isfile(path):
        return None, None, None
    from tuatara_tpu.config import CraftConfig, ParseqConfig

    with open(path) as f:
        meta = json.load(f)
    craft = parseq = None
    if "craft" in meta:
        craft = CraftConfig(**{k: _listify(v) for k, v in meta["craft"].items()})
    if "parseq" in meta:
        parseq = ParseqConfig(**{k: _listify(v) for k, v in meta["parseq"].items()})
    return craft, parseq, meta.get("charset")
