"""Training-step and sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tuatara_tpu.config import CraftConfig, OcrConfig, ParseqConfig
from tuatara_tpu.parallel.mesh import make_mesh
from tuatara_tpu.train.losses import (
    gen_permutations,
    perm_attention_masks,
)
from tuatara_tpu.train.trainer import (
    init_train_state,
    shard_batch,
    shard_train_state,
    train_step,
)

TINY_CRAFT = CraftConfig(
    stage_channels=(8, 16, 16, 16, 16), fc_channels=16,
    up_channels=((16, 16), (16, 16), (16, 8), (8, 8)),
    head_channels=(8, 8, 8, 8),
)
TINY_PARSEQ = ParseqConfig(
    embed_dim=32, enc_depth=1, enc_heads=4, dec_heads=4, max_label_length=7,
)


def _batch(rng, B=2, N=4, T=7):
    return {
        "pages": jnp.asarray(rng.random((B, 64, 64, 3)), jnp.float32),
        "heat": jnp.asarray(rng.random((B, 32, 32, 2)), jnp.float32),
        "crops": jnp.asarray(rng.random((N, 32, 128, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 90, (N, T + 2)), jnp.int32),
        "lengths": jnp.full((N,), 5, jnp.int32),
    }


def test_device_count():
    assert len(jax.devices()) == 8  # conftest virtual devices


def test_gen_permutations():
    p = gen_permutations(jax.random.PRNGKey(0), 7, 6)
    assert p.shape == (6, 7)
    np.testing.assert_array_equal(np.asarray(p[0]), np.arange(1, 8))
    np.testing.assert_array_equal(np.asarray(p[1]), np.arange(7, 0, -1))
    for row in np.asarray(p):
        assert sorted(row) == list(range(1, 8))


def test_perm_mask_lr_is_causal():
    m = np.asarray(perm_attention_masks(jnp.arange(1, 8), 7))
    T = 8
    for q in range(T):
        for c in range(T):
            # left-to-right: query q sees BOS and tokens strictly before q+1
            assert m[q, c] == (c <= q), (q, c)


@pytest.mark.slow
def test_train_step_runs_and_descends():
    rng = np.random.default_rng(0)
    state, tx = init_train_state(jax.random.PRNGKey(0), TINY_CRAFT, TINY_PARSEQ)
    batch = _batch(rng)
    import functools

    step = jax.jit(functools.partial(
        train_step, tx=tx, craft_cfg=TINY_CRAFT, parseq_cfg=TINY_PARSEQ))
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(4):
        state, metrics = step(state, batch, key)  # same key: same perms
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses  # optimizing the same batch descends
    assert int(state.step) == 4


@pytest.mark.slow
def test_craft_forward_train_updates_bn_stats():
    """Training-mode forward normalizes with batch stats and returns torch-
    momentum running-stat updates; inference forward is unchanged."""
    from tuatara_tpu.models import layers as L
    from tuatara_tpu.models.craft import (
        craft_forward, craft_forward_train, init_craft_params,
    )

    rng = np.random.default_rng(0)
    params = init_craft_params(jax.random.PRNGKey(0), TINY_CRAFT)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)

    scores_t, _, newp = jax.jit(
        lambda p, x: craft_forward_train(p, x, TINY_CRAFT, jnp.float32)
    )(params, x)
    scores_i, _ = jax.jit(
        lambda p, x: craft_forward(p, x, TINY_CRAFT, jnp.float32)
    )(params, x)
    assert not np.allclose(np.asarray(scores_t), np.asarray(scores_i))

    # First BN's running stats follow torch semantics: mean update from the
    # batch mean, var update from the UNBIASED (ddof=1) batch variance.
    h = L.conv2d(params["vgg"]["conv1_1"]["conv"], x, compute_dtype=jnp.float32)
    ha = np.asarray(h).astype(np.float64)
    bm = ha.mean((0, 1, 2))
    bv = ha.var((0, 1, 2), ddof=1)
    old = np.asarray(params["vgg"]["conv1_1"]["bn"]["mean"])
    old_v = np.asarray(params["vgg"]["conv1_1"]["bn"]["var"])
    np.testing.assert_allclose(
        np.asarray(newp["vgg"]["conv1_1"]["bn"]["mean"]),
        0.9 * old + 0.1 * bm, rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(newp["vgg"]["conv1_1"]["bn"]["var"]),
        0.9 * old_v + 0.1 * bv, rtol=1e-4, atol=1e-6,
    )
    # Decoder BNs update too; weights pass through untouched.
    assert not np.allclose(
        np.asarray(newp["up"]["upconv4"]["bn2"]["var"]),
        np.asarray(params["up"]["upconv4"]["bn2"]["var"]),
    )
    np.testing.assert_array_equal(
        np.asarray(newp["vgg"]["conv1_1"]["conv"]["w"]),
        np.asarray(params["vgg"]["conv1_1"]["conv"]["w"]),
    )


@pytest.mark.slow
def test_train_step_threads_bn_running_stats():
    """After a step, the new state's BN mean/var are the train-forward's
    updated buffers (not optimizer-mangled), matching a direct recompute."""
    import functools

    from tuatara_tpu.models.craft import craft_forward_train

    rng = np.random.default_rng(0)
    state, tx = init_train_state(jax.random.PRNGKey(0), TINY_CRAFT, TINY_PARSEQ)
    batch = _batch(rng)
    step = jax.jit(functools.partial(
        train_step, tx=tx, craft_cfg=TINY_CRAFT, parseq_cfg=TINY_PARSEQ))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert "craft_bn_params" not in metrics

    _, _, expected = jax.jit(
        lambda p, x: craft_forward_train(p, x, TINY_CRAFT)
    )(state.craft_params, batch["pages"])
    got = new_state.craft_params["vgg"]["conv2_2"]["bn"]
    np.testing.assert_allclose(
        np.asarray(got["mean"]),
        np.asarray(expected["vgg"]["conv2_2"]["bn"]["mean"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got["var"]),
        np.asarray(expected["vgg"]["conv2_2"]["bn"]["var"]), rtol=1e-5)
    # Non-buffer BN params (scale/bias) DID take an optimizer update.
    assert not np.allclose(
        np.asarray(new_state.craft_params["vgg"]["conv2_2"]["bn"]["scale"]),
        np.asarray(state.craft_params["vgg"]["conv2_2"]["bn"]["scale"]),
    )


@pytest.mark.slow
def test_plm_loss_ignores_padding_content():
    """PAD positions after EOS must be invisible to live queries: mutating
    them cannot change the PLM loss (the content key-padding mask)."""
    from tuatara_tpu.models.parseq import init_parseq_params
    from tuatara_tpu.train.losses import parseq_plm_loss

    cfg = TINY_PARSEQ
    rng = np.random.default_rng(1)
    params = init_parseq_params(jax.random.PRNGKey(2), cfg)
    crops = jnp.asarray(rng.random((2, 32, 128, 3)), jnp.float32)
    bos, pad = cfg.num_tokens - 2, cfg.num_tokens - 1
    T = cfg.max_label_length  # 7 -> labels [N, 9]
    labels = np.full((2, T + 2), pad, np.int32)
    labels[:, 0] = bos
    labels[0, 1:3] = [5, 9]
    labels[0, 3] = 0  # EOS
    labels[1, 1:5] = [12, 3, 44, 7]
    labels[1, 5] = 0
    lengths = np.asarray([3, 5], np.int32)

    lossf = jax.jit(lambda lab: parseq_plm_loss(
        params, crops, jnp.asarray(lab), jnp.asarray(lengths),
        jax.random.PRNGKey(3), cfg, k_perms=6)[0])
    base = np.asarray(lossf(labels))

    mutated = labels.copy()
    mutated[0, 4:T + 1] = 33  # garbage in PAD slots of tgt_in (after EOS)
    mutated[1, 6:T + 1] = 61
    np.testing.assert_array_equal(base, np.asarray(lossf(mutated)))


@pytest.mark.slow
def test_train_step_sharded_matches_single_device():
    rng = np.random.default_rng(0)
    state, tx = init_train_state(jax.random.PRNGKey(0), TINY_CRAFT, TINY_PARSEQ)
    batch = _batch(rng, B=4, N=8)
    import functools

    stepf = functools.partial(
        train_step, tx=tx, craft_cfg=TINY_CRAFT, parseq_cfg=TINY_PARSEQ)

    _, m_single = jax.jit(stepf)(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(8, axes=("dp", "tp"), shape=(4, 2))
    sstate = shard_train_state(mesh, state, tx)
    sbatch = shard_batch(mesh, batch)
    news, m_shard = jax.jit(stepf)(sstate, sbatch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_shard["loss"]), rtol=2e-4,
    )
    # tp weights actually sharded
    w = news.parseq_params["enc"][0]["attn"]["q"]["w"]
    assert len(w.sharding.device_set) == 8


@pytest.mark.slow
def test_shard_mid_training_preserves_optimizer_state():
    """Sharding a mid-training state must keep Adam moments/step (regression:
    an earlier version re-ran tx.init, silently zeroing them)."""
    import functools

    rng = np.random.default_rng(0)
    state, tx = init_train_state(jax.random.PRNGKey(0), TINY_CRAFT, TINY_PARSEQ)
    batch = _batch(rng, B=4, N=8)
    stepf = jax.jit(functools.partial(
        train_step, tx=tx, craft_cfg=TINY_CRAFT, parseq_cfg=TINY_PARSEQ))
    key = jax.random.PRNGKey(1)

    s1, _ = stepf(state, batch, key)
    _, m2_plain = stepf(s1, batch, key)

    mesh = make_mesh(8, axes=("dp", "tp"), shape=(4, 2))
    s1_sharded = shard_train_state(mesh, jax.device_get(s1), tx)
    _, m2_sharded = stepf(s1_sharded, shard_batch(mesh, batch), key)

    np.testing.assert_allclose(
        float(m2_plain["loss"]), float(m2_sharded["loss"]), rtol=2e-4)

    # The resharded Adam moments must carry their parameter's tp layout —
    # NOT a silently replicated fallback (the memory blowup shard_train_state
    # exists to avoid). q/w shards P(None, "tp"): per-device second dim is
    # 1/2 of full under tp=2.
    from jax.sharding import NamedSharding

    def _find_qw_moment(tree):
        # optax.chain(clip, adamw) state; walk to an adamw ScaleByAdamState.
        for leaf_state in jax.tree.leaves(
                tree, is_leaf=lambda x: hasattr(x, "mu")):
            if hasattr(leaf_state, "mu"):
                return leaf_state.mu["parseq"]["enc"][0]["attn"]["q"]["w"]
        raise AssertionError("no adam state found")

    mu_qw = _find_qw_moment(s1_sharded.opt_state)
    assert isinstance(mu_qw.sharding, NamedSharding)
    full = mu_qw.shape
    shard_shape = mu_qw.sharding.shard_shape(full)
    assert shard_shape == (full[0], full[1] // 2), (
        f"q/w moment not tp-sharded: {shard_shape} of {full}")


@pytest.mark.slow
def test_run_stream_propagates_producer_errors():
    """A bad batch in the stream raises instead of deadlocking."""
    from tuatara_tpu.api import OcrEngine
    from tuatara_tpu.config import OcrConfig

    cfg = OcrConfig(canvas_size=128, max_boxes=16, rec_buckets=(16,),
                    max_label_length=7)
    eng = OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, seed=0)

    def gen():
        yield np.zeros((1, 64, 64, 3), np.uint8)
        raise RuntimeError("bad batch source")

    with pytest.raises(RuntimeError, match="bad batch source"):
        eng.run_stream(gen())


@pytest.mark.slow
def test_sharded_ocr_programs_export():
    """The parallel.sharded_ocr_programs helper composes with the lazy-crop
    detect output (regression: it previously expected a 'crops' key detect
    no longer emits)."""
    from tuatara_tpu.api import OcrEngine
    from tuatara_tpu.parallel import shard_pages, sharded_ocr_programs

    cfg = OcrConfig(canvas_size=128, max_boxes=16, rec_buckets=(16,),
                    max_label_length=7)
    mesh = make_mesh(8, axes=("dp",))
    eng = OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, seed=0, mesh=mesh)
    with pytest.raises(ValueError, match="mesh"):
        sharded_ocr_programs(OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, seed=0),
                             mesh, 8, 64, 64)
    detect, recognize_for = sharded_ocr_programs(eng, mesh, 8, 64, 64)

    rng = np.random.default_rng(0)
    pages = shard_pages(mesh, rng.integers(0, 255, (8, 64, 64, 3)).astype(np.uint8))
    det = detect(eng.craft_params, pages)
    assert set(det) >= {"bbox", "valid", "rects", "count"}
    ids, conf = recognize_for(16)(eng.parseq_params, pages, det["rects"],
                                  det["valid"])
    assert ids.shape[0] == 16 and conf.shape == (16,)


@pytest.mark.slow
def test_engine_with_mesh_matches_unsharded():
    from tuatara_tpu.api import OcrEngine

    cfg = OcrConfig(canvas_size=128, max_boxes=16, rec_buckets=(16,),
                    max_label_length=7)
    rng = np.random.default_rng(0)
    pages = rng.integers(0, 255, (3, 96, 96, 3)).astype(np.uint8)  # 3 % dp != 0
    plain = OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, seed=0)
    mesh = make_mesh(8, axes=("dp",))
    sharded = OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, seed=0, mesh=mesh)
    a = plain.run_pages(pages)
    b = sharded.run_pages(pages)
    assert len(b) == 3
    for ra, rb in zip(a, b):
        assert [i["text"] for i in ra] == [i["text"] for i in rb]
        assert [i["bbox"] for i in ra] == [i["bbox"] for i in rb]


@pytest.mark.slow  # sharded + unsharded calibrated engines (~90 s CPU); fast mesh coverage remains above
def test_quantized_calibrated_engine_under_mesh_matches_unsharded():
    """quantized_serving + engine.calibrate compose with dp sharding: the
    mesh engine's results equal the meshless quantized engine's, before
    and after freezing static activation scales (the calibration forward
    runs over the SHARDED params tree; scales are scalars, replicated)."""
    from tuatara_tpu.api import OcrEngine

    cfg = OcrConfig(canvas_size=128, max_boxes=16, rec_buckets=(16,),
                    max_label_length=7, quantized_serving=True)
    rng = np.random.default_rng(0)
    pages = rng.integers(0, 255, (4, 96, 96, 3)).astype(np.uint8)
    plain = OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, seed=0)
    sharded = OcrEngine(cfg, TINY_CRAFT, TINY_PARSEQ, seed=0,
                        mesh=make_mesh(8, axes=("dp",)))
    a = plain.run_pages(pages)
    b = sharded.run_pages(pages)
    for ra, rb in zip(a, b):
        assert [i["text"] for i in ra] == [i["text"] for i in rb]

    na = plain.calibrate(pages, margin=1.0)
    nb = sharded.calibrate(pages, margin=1.0)
    assert na == nb > 0
    a = plain.run_pages(pages)
    b = sharded.run_pages(pages)
    assert len(b) == 4
    for ra, rb in zip(a, b):
        assert [i["text"] for i in ra] == [i["text"] for i in rb]
        assert [i["bbox"] for i in ra] == [i["bbox"] for i in rb]
