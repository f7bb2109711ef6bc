"""Native C++ host library vs numpy reference cross-checks."""

import numpy as np
import pytest

from exllama_tpu import native
from exllama_tpu.formats import gptq

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native host lib unavailable (no g++?)"
)


@pytest.mark.parametrize("act_order", [False, True])
@pytest.mark.parametrize("n", [512, 1024 + 256])
def test_native_repack_matches_numpy(act_order, n):
    rng = np.random.default_rng(0)
    k, gs = 256, 32
    w = rng.normal(size=(k, n)).astype(np.float32)
    t = gptq.quantize_matrix(w, gs, act_order, rng)

    # numpy reference path
    q = gptq.unpack_gptq_qweight(t["qweight"])
    x_map = None
    if act_order:
        q, x_map = gptq.make_sequential(q, t["g_idx"], gs)
    want_words = gptq.pack_kgroup(q, gs)
    z = gptq.unpack_gptq_qzeros(t["qzeros"]).astype(np.float32)
    s = t["scales"].astype(np.float32)
    want_zscale = (z + 1.0) * s

    # native path
    xm = native.make_x_map(t["g_idx"], k // gs) if act_order else None
    if act_order:
        np.testing.assert_array_equal(xm, x_map)
    got_words = native.repack_kgroup(t["qweight"], xm, k, n, gs)
    np.testing.assert_array_equal(got_words, want_words)

    so, zo = native.zscale(t["qzeros"], t["scales"], k // gs, n)
    np.testing.assert_allclose(so[:, :n], s, rtol=1e-6)
    np.testing.assert_allclose(zo[:, :n], want_zscale, rtol=1e-6)
    assert np.all(so[:, n:] == 0) and np.all(zo[:, n:] == 0)


def test_native_rep_penalty_matches_reference_loop():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_sampling import ref_rep_mask

    rng = np.random.default_rng(1)
    vocab, seq_len = 64, 40
    seq = rng.integers(0, vocab, size=(seq_len,)).astype(np.int64)
    got = native.rep_penalty_mask(seq, vocab, 1.3, 8, 8, seq_len)
    want = ref_rep_mask(seq, seq_len, vocab, 1.3, 8, 8)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_loader_uses_native_and_matches():
    """load_quant_tensor must give identical results with and without the
    native fast path."""
    rng = np.random.default_rng(2)
    k, n, gs = 256, 768, 128
    w = rng.normal(size=(k, n)).astype(np.float32)
    t = gptq.quantize_matrix(w, gs, True, rng)

    qt_native = gptq.load_quant_tensor(
        t["qweight"], t["qzeros"], t["scales"], t["g_idx"]
    )
    # force numpy path by passing f32 scales (native path requires f16)
    qt_numpy = gptq.load_quant_tensor(
        t["qweight"], t["qzeros"], t["scales"].astype(np.float32),
        t["g_idx"],
    )
    np.testing.assert_array_equal(
        np.asarray(qt_native.qweight), np.asarray(qt_numpy.qweight)
    )
    np.testing.assert_allclose(
        np.asarray(qt_native.zscale), np.asarray(qt_numpy.zscale), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(qt_native.x_map), np.asarray(qt_numpy.x_map)
    )


@pytest.mark.parametrize("act_order", [False, True])
@pytest.mark.parametrize("n", [512, 1024 + 256])
def test_native_repack_npair_matches_numpy(act_order, n):
    rng = np.random.default_rng(3)
    k, gs = 256, 32
    w = rng.normal(size=(k, n)).astype(np.float32)
    t = gptq.quantize_matrix(w, gs, act_order, rng)

    q = gptq.unpack_gptq_qweight(t["qweight"])
    x_map = None
    if act_order:
        q, x_map = gptq.make_sequential(q, t["g_idx"], gs)
    want = gptq.pack_npair(q)

    xm = native.make_x_map(t["g_idx"], k // gs) if act_order else None
    got = native.repack_npair(t["qweight"], xm, k, n)
    np.testing.assert_array_equal(got, want)
