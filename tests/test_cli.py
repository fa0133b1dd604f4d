"""CLI (tuatara_tpu/cli.py): argv contract + --json-out / --eval flow.

The reference's CLI surface is examples/resume.cpp (positional argv) and
run_ocr.py; flag parsing is covered cheaply, the end-to-end flow with the
tiny golden-weights fixture engine is slow-tier (engine compile)."""

import json
import os

import numpy as np
import pytest

from tuatara_tpu import cli

GOLDEN_WEIGHTS = os.path.join(os.path.dirname(__file__), "fixtures",
                              "golden_weights")


def test_parser_positional_order_matches_reference():
    args = cli.build_parser().parse_args(["img.png", "w/", "o/"])
    assert (args.image, args.weights_dir, args.outputs_dir) == ("img.png", "w/", "o/")


def test_parser_calibrate_requires_quantized(capsys):
    with pytest.raises(SystemExit):
        cli.main(["img.png", "--calibrate"])
    assert "--calibrate requires --quantized" in capsys.readouterr().err


@pytest.mark.slow
def test_cli_json_out_and_eval_roundtrip(tmp_path, capsys):
    """Run the CLI, use its own --json-out as --eval ground truth on a second
    run: the self-match must score perfectly (and the eval line must be
    machine-parseable from stderr)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    img = np.full((96, 120, 3), 255, np.uint8)
    img[20:30, 10:60] = 0
    img[50:58, 30:90] = 0
    img += rng.integers(0, 10, img.shape).astype(np.uint8)
    img_path = tmp_path / "page.png"
    Image.fromarray(img).save(img_path)

    out_json = tmp_path / "results.json"
    rc = cli.main([str(img_path), GOLDEN_WEIGHTS,
                   "--canvas-size", "128", "--json-out", str(out_json)])
    assert rc == 0
    capsys.readouterr()
    results = json.loads(out_json.read_text())
    assert results, "golden-weights engine should detect the strokes"
    assert set(results[0]) == {"text", "bbox", "confidence"}

    rc = cli.main([str(img_path), GOLDEN_WEIGHTS,
                   "--canvas-size", "128", "--eval", str(out_json)])
    assert rc == 0
    err = capsys.readouterr().err
    line = next(l for l in err.splitlines() if l.startswith("eval: "))
    scores = json.loads(line[len("eval: "):])
    assert scores["f1"] == 1.0 and scores["cer"] == 0.0
    assert scores["word_acc"] == 1.0 and scores["matched"] == len(results)


@pytest.mark.slow
def test_cli_eval_funsd_schema(tmp_path, capsys):
    """--eval auto-detects a FUNSD-format annotation file ('form' key)."""
    from PIL import Image

    img = np.full((96, 120, 3), 255, np.uint8)
    img[20:30, 10:60] = 0
    img_path = tmp_path / "page.png"
    Image.fromarray(img).save(img_path)

    truth = {"form": [{"text": "x", "box": [10, 20, 60, 30],
                       "words": [{"text": "x", "box": [10, 20, 60, 30]}]}]}
    truth_path = tmp_path / "gt.json"
    truth_path.write_text(json.dumps(truth))

    rc = cli.main([str(img_path), GOLDEN_WEIGHTS,
                   "--canvas-size", "128", "--eval", str(truth_path)])
    assert rc == 0
    err = capsys.readouterr().err
    line = next(l for l in err.splitlines() if l.startswith("eval: "))
    scores = json.loads(line[len("eval: "):])
    # The scorer ran over the FUNSD-schema truth: one ground-truth box.
    assert scores["tp"] + scores["fn"] == 1


def test_latency_preset_config():
    """OcrConfig.latency: exact-fit canvas, finer buckets, overridable; the
    Pallas impls are TPU-only so on this CPU test backend they stay None."""
    import jax

    from tuatara_tpu.config import OcrConfig

    cfg = OcrConfig.latency()
    assert cfg.canvas_bucket == 32
    assert 16 in cfg.rec_buckets
    assert cfg.page_batch == 1
    if jax.default_backend() != "tpu":
        assert cfg.encoder_impl is None and cfg.decode_impl is None
    over = OcrConfig.latency(box_mode="rotated", canvas_bucket=64)
    assert over.box_mode == "rotated" and over.canvas_bucket == 64


@pytest.mark.slow
def test_cli_latency_flag(tmp_path, capsys):
    """--latency drives the preset end-to-end (CPU: XLA lowerings)."""
    from PIL import Image

    img = np.full((96, 120, 3), 255, np.uint8)
    img[20:30, 10:60] = 0
    img_path = tmp_path / "page.png"
    Image.fromarray(img).save(img_path)
    rc = cli.main([str(img_path), GOLDEN_WEIGHTS, "--latency",
                   "--canvas-size", "128"])
    assert rc == 0
