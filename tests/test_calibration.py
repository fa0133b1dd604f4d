"""Calibrated static int8 activation scales.

Covers layers.calibration / make_static_quant and OcrEngine.calibrate.
Dynamic per-tensor quantization re-measures each input's abs-max on every
forward; calibration freezes the observed scale into the params ("sx") so
serving skips the reduce. On the calibration batch itself with margin=1.0
and the scale computed by the same device expression, the static path IS
the dynamic path — which gives exact oracles below.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tuatara_tpu.api import OcrEngine
from tuatara_tpu.config import CraftConfig, OcrConfig, ParseqConfig
from tuatara_tpu.models import layers as L
from tuatara_tpu.utils.image import asset_path

GOLDEN_WEIGHTS = os.path.join(os.path.dirname(__file__), "fixtures",
                              "golden_weights")
FUNSD = asset_path("funsd_0001129658.png")


def _conv_params(rng, c=8, o=8):
    return L.quantize_conv({
        "w": jnp.asarray(rng.normal(size=(3, 3, c, o)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(o,)).astype(np.float32)),
    })


def test_static_scale_matches_dynamic_on_calibration_batch(rng):
    """With sx == the dynamic expression's own scale, conv2d_q's static
    path produces bit-identical results to the dynamic path."""
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    qp = _conv_params(rng)
    y_dyn = L.conv2d_q(qp, x)
    sx = 127.0 / jnp.maximum(jnp.max(jnp.abs(x)), 1e-12)  # == quantize_act
    y_st = L.conv2d_q({**qp, "sx": sx}, x)
    np.testing.assert_array_equal(np.asarray(y_dyn), np.asarray(y_st))


def test_linear_static_scale_matches_dynamic(rng):
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    qp = L.quantize_linear({
        "w": jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(8,)).astype(np.float32)),
    })
    sx = 127.0 / jnp.maximum(jnp.max(jnp.abs(x)), 1e-12)
    np.testing.assert_array_equal(
        np.asarray(L.linear_q(qp, x)),
        np.asarray(L.linear_q({**qp, "sx": sx}, x)))


def test_calibration_collector_and_freeze(rng):
    """The collector records one abs-max per quantized layer during a jitted
    forward (params closed over); make_static_quant freezes them; the frozen
    chain agrees with the dynamic chain on the calibration batch."""
    params = {"c1": _conv_params(rng), "c2": _conv_params(rng)}
    x = jnp.asarray(rng.normal(size=(1, 12, 12, 8)).astype(np.float32))

    def chain(p, x):
        return L.conv2d_q(p["c2"], jax.nn.relu(L.conv2d_q(p["c1"], x)))

    def fwd(x):
        with L.calibration() as col:
            chain(params, x)
            return dict(col)

    stats = jax.jit(fwd)(x)
    assert len(stats) == 2  # one entry per quantized conv
    frozen = L.make_static_quant(
        params, L.merge_calib_stats([stats]), margin=1.0)
    assert "sx" in frozen["c1"] and "sx" in frozen["c2"]
    # Unobserved layers keep dynamic quantization.
    other = L.make_static_quant({"c3": _conv_params(rng)},
                                L.merge_calib_stats([stats]), margin=1.0)
    assert "sx" not in other["c3"]

    y_dyn = np.asarray(chain(params, x))
    y_st = np.asarray(chain(frozen, x))
    # The frozen scale round-trips through a python float (1-ulp class), so
    # a borderline .5 rounding can move an int8 step — bounded, not exact.
    np.testing.assert_allclose(y_st, y_dyn,
                               atol=0.05 * float(np.abs(y_dyn).max()))


def test_merge_calib_stats_takes_max():
    a, b = {1: jnp.float32(2.0), 2: jnp.float32(5.0)}, {1: jnp.float32(3.0)}
    m = L.merge_calib_stats([a, b])
    assert m[1] == 3.0 and m[2] == 5.0


@pytest.mark.slow  # compiles a full tiny engine (~45 s CPU); math covered by the fast unit tests above
def test_engine_calibrate_plumbing():
    """Tiny quantized engine: calibrate() freezes scales into both models'
    params and the engine keeps serving (programs retrace on the new
    pytree structure)."""
    cfg = OcrConfig(canvas_size=256, max_boxes=32, rec_buckets=(32,),
                    max_label_length=7, quantized_serving=True)
    craft_cfg = CraftConfig(
        stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
        up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
        head_channels=(8, 8, 8, 8),
    )
    parseq_cfg = ParseqConfig(embed_dim=32, enc_depth=1, enc_heads=4,
                              dec_heads=4, max_label_length=7)
    eng = OcrEngine(cfg, craft_cfg, parseq_cfg, seed=0)
    rng = np.random.default_rng(0)
    pages = rng.integers(0, 255, (2, 120, 160), np.uint8)
    before = eng.run_pages(pages)
    n = eng.calibrate(pages, margin=1.0)
    # 13 quantized detector convs (VGG minus conv1_1, + fc6/fc7) + encoder
    # linears (patch embed + depth*(q,k,v,o,fc1,fc2)).
    assert n >= 13 + 1 + 6
    assert "sx" in eng.craft_params["vgg"]["conv1_2"]["conv"]
    assert "sx" in eng.craft_params["fc"]["fc6"]
    assert "sx" in eng.parseq_params["patch_embed"]
    assert "sx" in eng.parseq_params["enc"][0]["attn"]["q"]
    after = eng.run_pages(pages)
    assert len(after) == len(before) == 2


def _tiny_configs(quantized=True):
    cfg = OcrConfig(canvas_size=256, max_boxes=32, rec_buckets=(32,),
                    max_label_length=7, quantized_serving=quantized)
    craft_cfg = CraftConfig(
        stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
        up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
        head_channels=(8, 8, 8, 8),
    )
    parseq_cfg = ParseqConfig(embed_dim=32, enc_depth=1, enc_heads=4,
                              dec_heads=4, max_label_length=7)
    return cfg, craft_cfg, parseq_cfg


@pytest.mark.slow  # two engine constructions + calibrate (~50 s CPU)
def test_calibration_persistence_roundtrip(tmp_path):
    """calibrate -> save_calibration -> fresh OcrEngine(weights_dir=...)
    auto-loads the scales and produces the calibrated engine's results."""
    from tuatara_tpu.utils import weights as W

    cfg, craft_cfg, parseq_cfg = _tiny_configs()
    wdir = str(tmp_path / "w")
    base = OcrEngine(*_tiny_configs(quantized=False), seed=0)
    W.save_weights_dir(wdir, base.craft_params, base.parseq_params,
                       craft_cfg, parseq_cfg)

    pages = np.random.default_rng(0).integers(0, 255, (2, 120, 160), np.uint8)
    eng1 = OcrEngine(cfg, weights_dir=wdir)
    n = eng1.calibrate(pages, margin=1.0)
    assert n > 0
    res1 = eng1.run_pages(pages)
    path = eng1.save_calibration()
    assert path == str(tmp_path / "w" / "calibration.npz")

    eng2 = OcrEngine(cfg, weights_dir=wdir)
    sx1 = eng1.craft_params["vgg"]["conv1_2"]["conv"]["sx"]
    sx2 = eng2.craft_params["vgg"]["conv1_2"]["conv"]["sx"]
    assert float(sx1) == float(sx2)
    assert "sx" in eng2.parseq_params["patch_embed"]
    res2 = eng2.run_pages(pages)
    assert [[r["text"] for r in page] for page in res1] == \
        [[r["text"] for r in page] for page in res2]
    assert [[r["bbox"] for r in page] for page in res1] == \
        [[r["bbox"] for r in page] for page in res2]

    # The overlay gates on quantized_serving: a float engine over the same
    # weights_dir ignores calibration.npz (sx on float trees is meaningless).
    eng3 = OcrEngine(*_tiny_configs(quantized=False), weights_dir=wdir)
    assert "sx" not in eng3.craft_params["vgg"]["conv1_2"]["conv"]


def test_quantized_pallas_composition_leaves_encoder_bf16():
    """quantized_serving + encoder_impl='pallas' is the COMPOSED fast path:
    the detector quantizes to int8 while the recognizer serves the bf16
    Pallas kernels (measured faster than the int8 XLA encoder,
    docs/PERFORMANCE.md) — quantizing the encoder would only disable the
    Pallas gate."""
    cfg, craft_cfg, parseq_cfg = _tiny_configs()
    cfg = dataclasses.replace(cfg, encoder_impl="pallas",
                              decode_impl="pallas")
    eng = OcrEngine(cfg, craft_cfg, parseq_cfg, seed=0)
    # Detector trunk quantized as usual.
    assert "wq" in eng.craft_params["vgg"]["conv1_2"]["conv"]
    assert "wq" in eng.craft_params["fc"]["fc6"]
    # Encoder left bf16; the Pallas prestacks are live (the gate in
    # prestack_pallas_encoder skips int8 trees — unquantized must pass it).
    assert "wq" not in eng.parseq_params["patch_embed"]
    assert "wq" not in eng.parseq_params["enc"][0]["attn"]["q"]
    assert "_enc_stacked" in eng.parseq_params
    assert "_dec_stacked" in eng.parseq_params


@pytest.mark.slow  # engine construction + craft-side calibrate (~30 s CPU)
def test_quantized_pallas_calibrate_and_overlay(tmp_path):
    """Under the composed config calibrate() freezes DETECTOR scales only
    (the unquantized encoder contributes none and the TPU-only Pallas
    lowering is never invoked); save/auto-load round-trips; and a
    calibration.npz carrying encoder scales from the XLA-quantized config
    is tolerated (the inapplicable recognizer scales are ignored)."""
    from tuatara_tpu.utils import weights as W

    cfg, craft_cfg, parseq_cfg = _tiny_configs()
    cfg = dataclasses.replace(cfg, encoder_impl="pallas",
                              decode_impl="pallas")
    wdir = str(tmp_path / "w")
    base = OcrEngine(*_tiny_configs(quantized=False), seed=0)
    W.save_weights_dir(wdir, base.craft_params, base.parseq_params,
                       craft_cfg, parseq_cfg)

    pages = np.random.default_rng(0).integers(
        0, 255, (2, 120, 160), np.uint8)
    eng = OcrEngine(cfg, weights_dir=wdir)
    n = eng.calibrate(pages, margin=1.0)
    assert n >= 13  # the quantized detector convs — and nothing recognizer
    assert "sx" in eng.craft_params["vgg"]["conv1_2"]["conv"]
    assert "sx" not in eng.parseq_params["patch_embed"]
    path = eng.save_calibration()

    # Fresh composed engine auto-loads the detector scales.
    eng2 = OcrEngine(cfg, weights_dir=wdir)
    assert float(eng2.craft_params["vgg"]["conv1_2"]["conv"]["sx"]) == \
        float(eng.craft_params["vgg"]["conv1_2"]["conv"]["sx"])

    # A calibration file that ALSO carries recognizer scales (saved under
    # the all-XLA quantized config) must not crash the composed engine.
    import numpy as _np
    with _np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    flat["parseq/patch_embed/sx"] = _np.float32(3.0)
    _np.savez(path, **flat)
    eng3 = OcrEngine(cfg, weights_dir=wdir)
    assert "sx" not in eng3.parseq_params["patch_embed"]
    assert "sx" in eng3.craft_params["vgg"]["conv1_2"]["conv"]


def test_apply_static_scales_rejects_mismatched_tree(rng):
    from tuatara_tpu.utils import weights as W

    qp = {"layer": _conv_params(rng)}
    with pytest.raises(KeyError, match="different architecture"):
        W.apply_static_scales(qp, {"nonexistent/conv/sx": np.float32(1.0)})
    with pytest.raises(KeyError, match="quantized"):
        W.apply_static_scales({"layer": {"w": np.zeros(3)}},
                              {"layer/sx": np.float32(1.0)})


def test_save_calibration_requires_scales(tmp_path):
    eng = OcrEngine(*_tiny_configs(), seed=0)
    with pytest.raises(ValueError, match="no weights_dir"):
        eng.save_calibration()
    with pytest.raises(ValueError, match="calibrate"):
        eng.save_calibration(str(tmp_path / "c.npz"))
    # The error path must not leave a stray empty overlay behind — a later
    # quantized engine would auto-load it as "0 calibrated scales".
    assert not (tmp_path / "c.npz").exists()


def test_calibrate_requires_quantized_serving():
    cfg = OcrConfig(canvas_size=256, max_boxes=32, rec_buckets=(32,),
                    max_label_length=7)
    craft_cfg = CraftConfig(
        stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
        up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
        head_channels=(8, 8, 8, 8),
    )
    parseq_cfg = ParseqConfig(embed_dim=32, enc_depth=1, enc_heads=4,
                              dec_heads=4, max_label_length=7)
    eng = OcrEngine(cfg, craft_cfg, parseq_cfg, seed=0)
    with pytest.raises(ValueError, match="quantized_serving"):
        eng.calibrate(np.zeros((1, 64, 64), np.uint8))


@pytest.mark.skipif(not os.path.isdir(GOLDEN_WEIGHTS) or
                    not os.path.isfile(FUNSD),
                    reason="golden weights / reference image absent")
@pytest.mark.slow
def test_calibrated_static_serving_agrees_with_dynamic():
    """Calibrated-static int8 serving finds essentially the same boxes as
    dynamic int8 on the calibration page (same criterion as the
    quantized-vs-bf16 golden test: the tiny golden detector is far more
    quantization-sensitive than a real CRAFT)."""
    from tuatara_tpu.utils.image import load_image

    img = load_image(FUNSD)
    cfg = OcrConfig(max_label_length=7, quantized_serving=True)
    eng = OcrEngine(cfg, weights_dir=GOLDEN_WEIGHTS)
    dyn = eng.run(img)
    n = eng.calibrate(img[None])
    assert n > 0
    static = eng.run(img)

    def centers(res):
        return [((r["bbox"][0] + r["bbox"][2]) / 2,
                 (r["bbox"][1] + r["bbox"][3]) / 2) for r in res]

    a, b = centers(dyn), centers(static)
    assert len(b) >= 0.8 * len(a), (len(a), len(b))
    matched = sum(
        1 for (ax, ay) in a
        if any(abs(ax - bx) <= 16 and abs(ay - by) <= 16 for (bx, by) in b)
    )
    assert matched >= 0.8 * len(a), (len(a), len(b), matched)
