"""Weight conversion: reference TorchScript / PyTorch checkpoints -> pytrees.

The reference's models are opaque TorchScript artifacts downloaded from HF
(setup.sh:6; loaded at tuatara.cpp:333-336, 423-432). This module converts
their parameters once into the engine's npz pytree format
(utils/weights.py), after which no torch dependency remains at serving time.

Name maps target the public upstream networks the artifacts were traced from:
* CRAFT (clovaai/CRAFT-pytorch): `basenet.sliceN.<torchvision-vgg16_bn
  index>` for the backbone, `upconvN.conv.<index>` double-convs,
  `conv_cls.<index>` head.
* PARSEQ (baudm/parseq): timm ViT encoder (`encoder.blocks.N...`, fused qkv)
  and the dual-stream decoder (`decoder.layers.0...`,
  nn.MultiheadAttention fused in_proj).

Layout transforms: conv OIHW -> HWIO; linear [out, in] -> [in, out]; fused
qkv/in_proj tensors split into separate q/k/v projections; the patch-embed
conv becomes the patchify GEMM's [ph*pw*3, D] matrix (feature order
(ph, pw, c), matching models/parseq.py's reshape).
"""

from __future__ import annotations

import difflib
import re
from typing import Any, Dict, Sequence

import numpy as np

from tuatara_tpu.config import CraftConfig, ParseqConfig


class _StateDict(dict):
    """state_dict with diagnosable misses: a missing key raises with the
    nearest ACTUAL keys listed, so first contact with a real traced artifact
    whose names differ from the surrogates is debuggable from the message
    alone (setup.sh:6 artifacts are unobservable in this environment;
    VERDICT r2 #6)."""

    def __missing__(self, key):
        near = difflib.get_close_matches(key, list(self.keys()), n=5, cutoff=0.3)
        raise KeyError(
            f"checkpoint key {key!r} not found. Nearest actual keys: {near}. "
            f"({len(self)} keys total; if they carry an unrecognized wrapper "
            f"prefix, pass the state_dict through _strip_wrapper_prefixes "
            f"with the right anchor, or strip it manually)"
        )


def _strip_wrapper_prefixes(
    sd: Dict[str, Any], anchors: Sequence[str]
) -> Dict[str, Any]:
    """Strip a common wrapper prefix (tracing wrapper attribute, Lightning's
    'model.', DataParallel's 'module.', arbitrarily nested) so that keys
    start at one of the `anchors` (architecture-root names). No-op when
    already anchored; leaves the dict unchanged when no anchor is found
    anywhere (the downstream KeyError then lists real keys)."""
    keys = list(sd.keys())
    if not keys or any(k.startswith(a) for a in anchors for k in keys):
        return sd
    for a in anchors:
        for k in keys:
            i = k.find("." + a)
            if i < 0:
                continue
            prefix = k[: i + 1]
            # Strip from every key that carries it (wrapped modules prefix
            # ALL their params; buffers added by the wrapper itself won't
            # match any converter key either way).
            return {
                (kk[len(prefix):] if kk.startswith(prefix) else kk): v
                for kk, v in sd.items()
            }
    return sd


def _conv(w, b=None) -> Dict[str, np.ndarray]:
    p = {"w": np.transpose(np.asarray(w), (2, 3, 1, 0)).astype(np.float32)}
    if b is not None:
        p["b"] = np.asarray(b).astype(np.float32)
    return p


def _bn(sd, prefix) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
        "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
    }


def _linear(sd, prefix) -> Dict[str, np.ndarray]:
    p = {"w": np.asarray(sd[f"{prefix}.weight"], np.float32).T}
    if f"{prefix}.bias" in sd:
        p["b"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return p


def _ln(sd, prefix) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
    }


# torchvision vgg16_bn conv feature-indices in trunk order, and the CRAFT
# slice each index lives in (slice1: [0,12), slice2: [12,19), slice3:
# [19,29), slice4: [29,39)).
_VGG_CONV_IDX = [0, 3, 7, 10, 14, 17, 20, 24, 27, 30, 34, 37]
_VGG_NAMES = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3",
    "conv4_1", "conv4_2", "conv4_3", "conv5_1", "conv5_2",
]


def _slice_of(idx: int) -> str:
    if idx < 12:
        return "slice1"
    if idx < 19:
        return "slice2"
    if idx < 29:
        return "slice3"
    return "slice4"


def convert_craft_state_dict(sd: Dict[str, Any], cfg: CraftConfig = CraftConfig()):
    """clovaai-CRAFT state_dict -> tuatara_tpu CRAFT param pytree.

    Robust to wrapper prefixes ('module.', 'model.', a tracing wrapper's
    attribute path); a genuinely missing key raises with the nearest actual
    keys listed."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    sd = _StateDict(_strip_wrapper_prefixes(
        sd, ("basenet.", "upconv1.", "conv_cls.")))
    p: Dict[str, Any] = {"vgg": {}, "fc": {}, "up": {}, "head": {}}
    for idx, name in zip(_VGG_CONV_IDX, _VGG_NAMES):
        base = f"basenet.{_slice_of(idx)}.{idx}"
        p["vgg"][name] = {
            "conv": _conv(sd[f"{base}.weight"], sd.get(f"{base}.bias")),
            "bn": _bn(sd, f"basenet.{_slice_of(idx + 1)}.{idx + 1}"),
        }
    p["fc"]["fc6"] = _conv(sd["basenet.slice5.1.weight"], sd.get("basenet.slice5.1.bias"))
    p["fc"]["fc7"] = _conv(sd["basenet.slice5.2.weight"], sd.get("basenet.slice5.2.bias"))
    for i in range(1, 5):
        base = f"upconv{i}.conv"
        p["up"][f"upconv{i}"] = {
            "conv1": _conv(sd[f"{base}.0.weight"], sd.get(f"{base}.0.bias")),
            "bn1": _bn(sd, f"{base}.1"),
            "conv2": _conv(sd[f"{base}.3.weight"], sd.get(f"{base}.3.bias")),
            "bn2": _bn(sd, f"{base}.4"),
        }
    for j, idx in enumerate([0, 2, 4, 6, 8], start=1):
        p["head"][f"conv{j}"] = _conv(
            sd[f"conv_cls.{idx}.weight"], sd.get(f"conv_cls.{idx}.bias")
        )
    return p


def _split_qkv(w, b, dim: int):
    """Fused [3D, D] qkv / in_proj -> separate q/k/v linear params."""
    w = np.asarray(w, np.float32)
    out = {}
    for i, name in enumerate(("q", "k", "v")):
        p = {"w": w[i * dim:(i + 1) * dim].T}
        if b is not None:
            p["b"] = np.asarray(b, np.float32)[i * dim:(i + 1) * dim]
        out[name] = p
    return out


def convert_parseq_state_dict(sd: Dict[str, Any], cfg: ParseqConfig = ParseqConfig()):
    """baudm-PARSEQ state_dict -> tuatara_tpu PARSEQ param pytree.

    Robust to wrapper prefixes (Lightning's 'model.', a tracing wrapper's
    attribute path); a genuinely missing key raises with the nearest actual
    keys listed."""
    sd = {re.sub(r"^model\.", "", k): v for k, v in sd.items()}
    sd = _StateDict(_strip_wrapper_prefixes(
        sd, ("encoder.", "decoder.", "text_embed.")))
    D = cfg.embed_dim
    ph, pw = cfg.patch_size

    pe_w = np.asarray(sd["encoder.patch_embed.proj.weight"], np.float32)  # [D,3,ph,pw]
    p: Dict[str, Any] = {
        "patch_embed": {
            "w": np.transpose(pe_w, (2, 3, 1, 0)).reshape(ph * pw * 3, D),
            "b": np.asarray(sd["encoder.patch_embed.proj.bias"], np.float32),
        },
        "pos_embed": np.asarray(sd["encoder.pos_embed"], np.float32),
        "enc": [],
        "enc_norm": _ln(sd, "encoder.norm"),
        "text_embed": np.asarray(sd["text_embed.embedding.weight"], np.float32),
        "pos_queries": np.asarray(sd["pos_queries"], np.float32),
        "dec": [],
        "dec_norm": _ln(sd, "decoder.norm"),
        "head": _linear(sd, "head"),
    }
    for i in range(cfg.enc_depth):
        b = f"encoder.blocks.{i}"
        attn = _split_qkv(sd[f"{b}.attn.qkv.weight"], sd.get(f"{b}.attn.qkv.bias"), D)
        attn["o"] = _linear(sd, f"{b}.attn.proj")
        p["enc"].append({
            "norm1": _ln(sd, f"{b}.norm1"),
            "attn": attn,
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp": {"fc1": _linear(sd, f"{b}.mlp.fc1"),
                    "fc2": _linear(sd, f"{b}.mlp.fc2")},
        })
    for i in range(cfg.dec_depth):
        b = f"decoder.layers.{i}"
        sa = _split_qkv(sd[f"{b}.self_attn.in_proj_weight"],
                        sd.get(f"{b}.self_attn.in_proj_bias"), D)
        sa["o"] = _linear(sd, f"{b}.self_attn.out_proj")
        ca = _split_qkv(sd[f"{b}.cross_attn.in_proj_weight"],
                        sd.get(f"{b}.cross_attn.in_proj_bias"), D)
        ca["o"] = _linear(sd, f"{b}.cross_attn.out_proj")
        p["dec"].append({
            "norm_q": _ln(sd, f"{b}.norm_q"),
            "norm_c": _ln(sd, f"{b}.norm_c"),
            "self_attn": sa,
            "norm1": _ln(sd, f"{b}.norm1"),
            "cross_attn": ca,
            "norm2": _ln(sd, f"{b}.norm2"),
            "linear1": _linear(sd, f"{b}.linear1"),
            "linear2": _linear(sd, f"{b}.linear2"),
        })
    return p


def _load_torch_state_dict(path: str) -> Dict[str, Any]:
    return _load_torch(path)[0]


def _load_torch(path: str):
    """TorchScript archive OR plain torch checkpoint ->
    (numpy state dict, executable jit module | None).

    First contact with real artifacts may find either format under the
    reference filenames (setup.sh:6 downloads opaque binaries): try
    `torch.jit.load` (the reference's own loader, tuatara.cpp:333/423),
    then fall back to `torch.load` accepting a bare state_dict or the
    common {'model'|'state_dict': ...} checkpoint wrappers. Raises with
    both failure reasons if neither parses. The module (when the artifact
    is executable TorchScript) feeds the normalization probe."""
    import torch

    try:
        m = torch.jit.load(path, map_location="cpu").eval()
        return {k: v.numpy() for k, v in m.state_dict().items()}, m
    except Exception as jit_err:  # noqa: BLE001 — try the other format
        try:
            # Safe mode first: bare state dicts and tensor-dict wrappers
            # load fine without unpickling arbitrary code. Only a pickled
            # nn.Module checkpoint needs weights_only=False — fall back for
            # that case (trusting the artifact is then the caller's call,
            # same trust the reference's own torch.jit.load extends).
            try:
                obj = torch.load(path, map_location="cpu", weights_only=True)
            except Exception:  # noqa: BLE001 — pickled-Module fallback
                obj = torch.load(path, map_location="cpu", weights_only=False)
        except Exception as load_err:  # noqa: BLE001
            raise ValueError(
                f"{path!r} is neither a TorchScript archive "
                f"(torch.jit.load: {jit_err}) nor a torch checkpoint "
                f"(torch.load: {load_err})"
            ) from load_err
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
        for key in ("state_dict", "model"):
            if isinstance(obj, dict) and key in obj:
                inner = obj[key]
                # {'model': <nn.Module>} (yolov5/fairseq style) — unwrap
                # the module too, not just dict-valued wrappers.
                if hasattr(inner, "state_dict") and not isinstance(inner, dict):
                    obj = inner.state_dict()
                elif isinstance(inner, dict):
                    obj = inner
        if not isinstance(obj, dict):
            raise ValueError(
                f"{path!r}: torch.load returned {type(obj).__name__}, "
                f"expected a state dict (or a checkpoint wrapping one)"
            )
        return {
            k: v.numpy() for k, v in obj.items()
            if hasattr(v, "numpy")
        }, None


# ---------------------------------------------------------------------------
# Input-normalization probe (SURVEY.md quirk 2 — first-contact insurance).
#
# The reference feeds its traced models /255-only inputs (tuatara.cpp:363-370,
# 440-446), but whether the TRACED GRAPHS normalize internally (upstream CRAFT
# trains with ImageNet mean/std; upstream PARSEQ with (x-0.5)/0.5) is
# unobservable without the artifacts. The probe answers it at conversion time:
# run the executable traced module on a fixed [0,1] input and find which input
# transform makes the converted JAX forward reproduce its output. A detected
# transform is baked into the saved CraftConfig/ParseqConfig
# (input_mean/input_std), which the model forwards apply — so the engine
# serves real artifacts correctly with no code change either way.
# ---------------------------------------------------------------------------

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

NORM_CANDIDATES = {
    "identity": ((), ()),
    # upstream-PARSEQ transform: 2x-1, i.e. mean .5 / std .5
    "pm1": ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    "imagenet": (IMAGENET_MEAN, IMAGENET_STD),
    # same stats if the trace was fed channel-swapped inputs (quirk 1)
    "imagenet_bgr": (IMAGENET_MEAN[::-1], IMAGENET_STD[::-1]),
}


def probe_input_normalization(
    module,
    params,
    model: str,
    cfg,
    rtol: float = 2e-2,
    atol: float = 2e-2,
):
    """Which input transform makes the converted JAX forward match the traced
    module? -> candidate name from NORM_CANDIDATES, or "unknown".

    `module`: an executable torch.jit module (the probe is skipped for plain
    state-dict checkpoints — there is no graph to execute). `model`:
    "craft" | "parseq". Comparison runs in fp32 with loose tolerances: the
    probe discriminates TRANSFORMS (identity vs imagenet shifts outputs by
    whole activations), not kernel-level numerics."""
    import numpy as np
    import torch

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    if model == "craft":
        x = rng.random((1, 64, 96, 3)).astype(np.float32)
    elif model == "parseq":
        x = rng.random((2, 32, 128, 3)).astype(np.float32)
    else:
        raise ValueError(f"model must be 'craft' or 'parseq', got {model!r}")

    with torch.no_grad():
        out = module(torch.tensor(np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    if isinstance(out, (tuple, list)):
        out = out[0]  # reference contract: element 0 (tuatara.cpp:382-384)
    want = np.asarray(out.float())
    if model == "craft" and want.ndim == 4 and want.shape[1] == 2 \
            and want.shape[-1] != 2:
        want = want.transpose(0, 2, 3, 1)  # NCHW head -> the NHWC contract

    def forward(xin):
        if model == "craft":
            from tuatara_tpu.models.craft import craft_forward

            return np.asarray(craft_forward(
                params, jnp.asarray(xin), cfg,
                compute_dtype=jnp.float32)[0])
        from tuatara_tpu.models.parseq import parseq_forward

        return np.asarray(parseq_forward(
            params, jnp.asarray(xin), cfg, compute_dtype=jnp.float32,
            early_exit=False))

    # Score EVERY candidate and take the best within tolerance (several can
    # land inside a loose bound on small models; the true transform is
    # orders of magnitude closer). Ties within 2x prefer identity — serving
    # must not silently add a transform the evidence can't separate from
    # none.
    scale = float(np.max(np.abs(want))) or 1.0
    errs = {}
    for name, (mean, std) in NORM_CANDIDATES.items():
        xin = x if not mean else (x - np.float32(mean)) / np.float32(std)
        got = forward(xin)
        if got.shape != want.shape:
            return "unknown"  # architecture mismatch; transforms can't fix it
        errs[name] = float(np.max(np.abs(got - want)))
    best = min(errs, key=errs.get)
    if errs[best] > atol + rtol * scale:
        return "unknown"
    if best != "identity" and errs["identity"] <= 2.0 * errs[best]:
        return "identity"
    return best


def convert_torchscript_weights(
    reference_weights_dir: str,
    out_weights_dir: str,
    craft_cfg: CraftConfig = CraftConfig(),
    parseq_cfg: ParseqConfig = ParseqConfig(),
    probe_normalization: bool = True,
) -> Dict[str, str]:
    """One-shot conversion of the reference's weights_dir (TorchScript
    artifacts, names per tuatara.cpp:333/423; plain torch checkpoints under
    the same filenames also accepted) into the engine's npz format.

    When the artifacts are executable traced modules, the input-
    normalization probe runs on each (see probe_input_normalization) and a
    detected non-identity transform is persisted into the saved model
    configs so the engine serves it automatically. Returns the per-model
    probe results ({"craft": name, "parseq": name}; "skipped" for
    non-executable checkpoints, "unknown" when nothing matched — the latter
    is LOUD: it means first contact needs investigation before serving).
    """
    import dataclasses
    import logging
    import os

    from tuatara_tpu.utils.weights import save_weights_dir

    logger = logging.getLogger("tuatara_tpu.convert")
    results: Dict[str, str] = {}
    specs = {
        "craft": ("craft_traced_torchscript_model.pt", craft_cfg,
                  convert_craft_state_dict),
        "parseq": ("parseq_torchscript.bin", parseq_cfg,
                   convert_parseq_state_dict),
    }
    params, cfgs = {}, {}
    for model, (fname, cfg, convert_fn) in specs.items():
        path = os.path.join(reference_weights_dir, fname)
        sd, module = _load_torch(path)
        params[model] = convert_fn(sd, cfg)
        verdict = "skipped"
        if probe_normalization and module is not None:
            verdict = probe_input_normalization(module, params[model], model, cfg)
            if verdict in ("identity", "skipped"):
                pass
            elif verdict == "unknown":
                logger.warning(
                    "%s: traced output matches NO known input transform "
                    "(identity/pm1/imagenet) — do not serve before "
                    "investigating (SURVEY.md quirk 2)", model)
            else:
                mean, std = NORM_CANDIDATES[verdict]
                cfg = dataclasses.replace(cfg, input_mean=mean, input_std=std)
                logger.warning(
                    "%s: traced artifact normalizes internally (%s); baked "
                    "into the saved config's input_mean/input_std", model,
                    verdict)
        cfgs[model] = cfg
        results[model] = verdict
    save_weights_dir(
        out_weights_dir,
        params["craft"],
        params["parseq"],
        craft_config=cfgs["craft"],
        parseq_config=cfgs["parseq"],
    )
    return results
