"""Pallas kernel tests (interpret mode on CPU) vs the XLA reference paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tuatara_tpu.config import OcrConfig
from tuatara_tpu.ops.boxes import extract_boxes
from tuatara_tpu.ops.connected_components import component_roots, label_components
from tuatara_tpu.ops.pallas.cc import label_components_pallas
from tuatara_tpu.ops.pallas.stats import component_stats


@pytest.mark.parametrize("seed", [0, pytest.param(1, marks=pytest.mark.slow)])
def test_cc_kernel_matches_xla(seed):
    rng = np.random.default_rng(seed)
    m = jnp.array(rng.random((64, 128)) < 0.35)
    ref, _ = label_components(m)
    got, iters = label_components_pallas(m, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert int(iters) >= 1


def test_cc_kernel_snake():
    h, w = 32, 128
    m = np.zeros((h, w), bool)
    for i in range(0, h, 2):
        m[i, :] = True
    for i in range(0, h - 2, 4):
        m[i + 1, -1] = True
    for i in range(2, h - 1, 4):
        m[i + 1, 0] = True
    ref, _ = label_components(jnp.array(m))
    got, _ = label_components_pallas(jnp.array(m), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("seed", [0, pytest.param(2, marks=pytest.mark.slow)])
def test_cc_aux_kernel_matches_xla_and_bruteforce(seed):
    """The aux min channel: kernel == XLA fallback == per-component brute
    force (min aux-pixel index, BIG when the component has none)."""
    from tuatara_tpu.ops.connected_components import label_components_aux
    from tuatara_tpu.ops.pallas.cc import label_components_pallas_aux

    rng = np.random.default_rng(seed)
    m = rng.random((64, 128)) < 0.35
    hot = (rng.random((64, 128)) < 0.08) & m
    ref_lab, ref_aux, _ = label_components_aux(jnp.array(m), jnp.array(hot))
    got_lab, got_aux, _ = label_components_pallas_aux(jnp.array(m), jnp.array(hot),
                                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(got_lab), np.asarray(ref_lab))
    np.testing.assert_array_equal(np.asarray(got_aux), np.asarray(ref_aux))

    # brute force
    lab = np.asarray(ref_lab)
    aux = np.asarray(ref_aux)
    idx = np.arange(m.size).reshape(m.shape)
    for root in np.unique(lab[lab >= 0]):
        comp = lab == root
        hot_idx = idx[comp & hot]
        want = hot_idx.min() if hot_idx.size else 2**30
        got_vals = np.unique(aux[comp])
        assert got_vals.size == 1
        assert (got_vals[0] == want) or (got_vals[0] >= 2**30 and want >= 2**30)


@pytest.mark.parametrize("K", [128, 256])  # 256 = single-pass bk=256 tile
@pytest.mark.parametrize("h", [32, 40])    # 32 = bh=32 tile; 40 = bh=8
def test_stats_kernel_matches_onehot(rng, K, h):
    w = 128
    m = jnp.array(rng.random((h, w)) < 0.3)
    labels, _ = label_components(m)
    roots, _ = component_roots(labels, K)
    tn = jnp.array(rng.random((h, w), np.float32))
    keep = jnp.array(rng.random((h, w)) < 0.8)

    row, col, rrow, rcol, peak = component_stats(labels, tn, keep, roots,
                                                 interpret=True)

    member = np.asarray(labels)[:, :, None] == np.asarray(roots)[None, None, :]
    np.testing.assert_array_equal(np.asarray(row), member.sum(1))
    np.testing.assert_array_equal(np.asarray(col), member.sum(0))
    red = member & np.asarray(keep)[:, :, None]
    np.testing.assert_array_equal(np.asarray(rrow), red.sum(1))
    np.testing.assert_array_equal(np.asarray(rcol), red.sum(0))
    want_peak = np.where(member, np.asarray(tn)[:, :, None], -1e30).max((0, 1))
    np.testing.assert_allclose(np.asarray(peak), want_peak, rtol=1e-6)


@pytest.mark.parametrize("K", [128, 256])  # 256 = single-pass bk=256 tile
@pytest.mark.parametrize("h", [32, 40])    # 32 = bh=32 tile; 40 = bh=8
def test_stats_nopeak_kernel_matches_onehot(rng, K, h):
    from tuatara_tpu.ops.pallas.stats import component_stats_nopeak

    w = 128
    m = jnp.array(rng.random((h, w)) < 0.3)
    labels, _ = label_components(m)
    roots, _ = component_roots(labels, K)
    keep = jnp.array(rng.random((h, w)) < 0.8)

    row, col, rrow, rcol = component_stats_nopeak(labels, keep, roots,
                                                  interpret=True)

    member = np.asarray(labels)[:, :, None] == np.asarray(roots)[None, None, :]
    np.testing.assert_array_equal(np.asarray(row), member.sum(1))
    np.testing.assert_array_equal(np.asarray(col), member.sum(0))
    red = member & np.asarray(keep)[:, :, None]
    np.testing.assert_array_equal(np.asarray(rrow), red.sum(1))
    np.testing.assert_array_equal(np.asarray(rcol), red.sum(0))


@pytest.mark.slow
def test_extract_boxes_pallas_path_matches(rng):
    """Full extract_boxes with kernels forced on (interpret via CPU) equals
    the XLA path."""
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    text = np.zeros((h, w), np.float32)
    for cy, cx in [(12, 20), (40, 30), (25, 50)]:
        text += np.exp(-(((yy - cy) / 2.5) ** 2 + ((xx - cx) / 5.0) ** 2))
    text = np.clip(text, 0, 1)
    link = np.zeros_like(text)
    link[0, 0] = 1e-6
    mask = jnp.ones((h, w), bool)

    off = extract_boxes(jnp.array(text), jnp.array(link), mask,
                        OcrConfig(max_boxes=128, use_pallas="off"))
    # interpret-mode kernels run on CPU; "on" forces the pallas path
    import tuatara_tpu.ops.pallas.cc as cc_mod
    import tuatara_tpu.ops.pallas.stats as st_mod
    import functools

    patched = {
        (cc_mod, "label_components_pallas"),
        (cc_mod, "label_components_pallas_aux"),
        (cc_mod, "area_ok_pallas"),
        (st_mod, "component_stats"),
        (st_mod, "component_stats_nopeak"),
    }
    originals = {(m, n): getattr(m, n) for m, n in patched}
    for (m, n), f in originals.items():
        setattr(m, n, functools.partial(f, interpret=True))
    try:
        on = extract_boxes(jnp.array(text), jnp.array(link), mask,
                           OcrConfig(max_boxes=128, use_pallas="on"))
    finally:
        for (m, n), f in originals.items():
            setattr(m, n, f)

    np.testing.assert_array_equal(np.asarray(off["valid"]), np.asarray(on["valid"]))
    np.testing.assert_array_equal(np.asarray(off["boxes"]), np.asarray(on["boxes"]))
