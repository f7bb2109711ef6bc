"""Golden-value tests for the GPTQ wire format and the TPU panel layout.

Strategy mirrors the reference's dual-path cross-validation idea
(test_benchmark_inference.py:239-246): every transform must round-trip, and
dequantization must reproduce hand-packed matrices exactly.
"""

import numpy as np
import pytest

from exllama_tpu.formats import gptq


def test_qweight_pack_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 16, size=(64, 48), dtype=np.uint8)
    packed = gptq.pack_gptq_qweight(q)
    assert packed.shape == (8, 48) and packed.dtype == np.int32
    assert np.array_equal(gptq.unpack_gptq_qweight(packed), q)


def test_qzeros_pack_roundtrip():
    rng = np.random.default_rng(1)
    z = rng.integers(0, 16, size=(4, 64), dtype=np.uint8)
    packed = gptq.pack_gptq_qzeros(z)
    assert packed.shape == (4, 8) and packed.dtype == np.int32
    assert np.array_equal(gptq.unpack_gptq_qzeros(packed), z)


def test_qweight_packing_golden():
    # Hand-built: rows 0..7 of column 0 are 1..8; one int32 word packs them
    # little-nibble-first (bits 4*i hold row r*8+i), matching GPTQ.
    q = np.zeros((8, 8), dtype=np.uint8)
    q[:, 0] = np.arange(1, 9)
    packed = gptq.pack_gptq_qweight(q)
    expect = 0
    for i in range(8):
        expect |= (i + 1) << (4 * i)
    assert packed[0, 0] == np.int32(np.uint32(expect))


def test_panel_roundtrip_and_padding():
    rng = np.random.default_rng(2)
    for n in (256, 1024, 1024 + 512, 3 * 1024):
        q = rng.integers(0, 16, size=(32, n), dtype=np.uint8)
        words = gptq.repack_panels(q)
        n_pad = -(-n // gptq.PANEL) * gptq.PANEL
        assert words.shape == (32, n_pad // 8)
        back = gptq.unpack_panels(words, n)
        assert np.array_equal(back, q)
        # padded columns are zero
        full = gptq.unpack_panels(words)
        assert np.all(full[:, n:] == 0)


def test_kgroup_roundtrip_and_padding():
    rng = np.random.default_rng(7)
    for gs in (32, 128):
        for n in (256, 300, 1024 + 512):
            q = rng.integers(0, 16, size=(256, n), dtype=np.uint8)
            words = gptq.pack_kgroup(q, gs)
            n_pad = -(-n // gptq.N_ALIGN) * gptq.N_ALIGN
            assert words.shape == (256 // 8, n_pad)
            back = gptq.unpack_kgroup(words, gs, n)
            assert np.array_equal(back, q)


def test_kgroup_layout_golden():
    # logical k-row g*gs + off (off < gs/2) must land in the LOW nibble of
    # int8 row g*gs/2 + off; row g*gs + gs/2 + off in the HIGH nibble,
    # top-bit flipped. int8 row r' = word r'//4, byte r'%4 (little endian).
    gs, k, n = 32, 64, 256
    q = np.zeros((k, n), dtype=np.uint8)
    q[3, 0] = 5        # group 0, off 3 → lo nibble of int8 row 3
    q[16 + 3, 0] = 9   # group 0 second half → hi nibble of int8 row 3, ^8
    words = gptq.pack_kgroup(q, gs).view(np.uint32)
    byte = (words[0, 0] >> (8 * 3)) & 0xFF
    assert byte & 0x0F == 5
    assert ((byte >> 4) & 0x0F) == (9 ^ 8)


def test_panel_layout_golden():
    # True column c = p*PANEL + i*LANE + j must land in word column
    # p*LANE + j, nibble i.
    k, n = 8, 2 * gptq.PANEL
    q = np.zeros((k, n), dtype=np.uint8)
    c = 1 * gptq.PANEL + 3 * gptq.LANE + 17  # panel 1, nibble 3, lane 17
    q[0, c] = 0xA
    words = gptq.repack_panels(q)
    word = np.uint32(words[0, 1 * gptq.LANE + 17])
    assert (word >> (4 * 3)) & 0xF == 0xA
    assert word & ~np.uint32(0xF << 12) == 0


def test_make_sequential_preserves_dot_product():
    rng = np.random.default_rng(3)
    k, n, gs = 256, 16, 32
    q = rng.integers(0, 16, size=(k, n), dtype=np.uint8)
    perm = rng.permutation(k)
    g_idx = np.empty(k, dtype=np.int32)
    g_idx[perm] = np.arange(k) // gs
    q_seq, x_map = gptq.make_sequential(q, g_idx, gs)
    # rows now group-sequential
    assert np.array_equal(g_idx[x_map], np.arange(k) // gs)
    x = rng.normal(size=(k,)).astype(np.float32)
    # dot with per-row scale by original group
    s = rng.normal(size=(k // gs, n)).astype(np.float32)
    w_orig = q.astype(np.float32) * s[g_idx]
    w_seq = q_seq.astype(np.float32) * np.repeat(s, gs, axis=0)
    np.testing.assert_allclose(x @ w_orig, x[x_map] @ w_seq, rtol=1e-5)


@pytest.mark.parametrize("act_order", [False, True])
@pytest.mark.parametrize("groupsize", [32, 128])
def test_quantize_load_dequantize_roundtrip(act_order, groupsize):
    """quantize_matrix → load_quant_tensor → dequantize reproduces the
    quantized weight exactly (quantization error only, no format error)."""
    rng = np.random.default_rng(4)
    k, n = 256, 512
    w = rng.normal(size=(k, n)).astype(np.float32)
    tensors = gptq.quantize_matrix(w, groupsize, act_order, rng)
    qt = gptq.load_quant_tensor(
        tensors["qweight"],
        tensors["qzeros"],
        tensors["scales"],
        tensors.get("g_idx"),
        scale_dtype=np.float32,  # exact-layout check; bf16 default below
    )
    assert qt.in_features == k and qt.out_features == n
    assert qt.groupsize == groupsize
    assert qt.act_order == act_order

    w_hat = gptq.dequantize(qt)
    # Manually dequantize the wire format as the oracle:
    q = gptq.unpack_gptq_qweight(tensors["qweight"]).astype(np.float32)
    z = gptq.unpack_gptq_qzeros(tensors["qzeros"]).astype(np.float32)
    s = tensors["scales"].astype(np.float32)
    g_idx = tensors.get("g_idx")
    if g_idx is None:
        g_idx = np.arange(k) // groupsize
    w_wire = (q - (z[g_idx] + 1.0)) * s[g_idx]

    if act_order:
        x_map = np.asarray(qt.x_map)
        w_wire = w_wire[x_map]
    np.testing.assert_allclose(w_hat, w_wire, atol=1e-5)

    # and the dequantized weight approximates the original
    err = np.abs(w_hat if not act_order else w_hat[np.argsort(x_map)] - w)
    # scale ~ (max-min)/15 ~ 6 sigma/15 -> max err ~ scale/2 ~ 0.2
    assert np.median(np.abs(gptq.dequantize(qt))) > 0  # sanity

    x = rng.normal(size=(4, k)).astype(np.float32)
    xs = x[:, np.asarray(qt.x_map)] if act_order else x
    ref = x @ w
    got = xs @ w_hat
    # quantization noise bound: 4-bit min/max on gaussian weights gives
    # ~13% rms weight error; the matvec should stay in that regime.
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.2, rel


def test_bf16_scale_storage_error_bound():
    """Default (bf16) scale storage: relative dequant error bounded by
    bf16 rounding (2^-9), far under 4-bit quantization noise."""
    rng = np.random.default_rng(9)
    k, n = 256, 512
    w = rng.normal(size=(k, n)).astype(np.float32)
    tensors = gptq.quantize_matrix(w, 128, False, rng)
    qt32 = gptq.load_quant_tensor(
        tensors["qweight"], tensors["qzeros"], tensors["scales"],
        scale_dtype=np.float32,
    )
    qt16 = gptq.load_quant_tensor(
        tensors["qweight"], tensors["qzeros"], tensors["scales"]
    )
    import ml_dtypes

    assert np.asarray(qt16.scales).dtype == ml_dtypes.bfloat16
    w32 = gptq.dequantize(qt32)
    w16 = gptq.dequantize(qt16)
    denom = np.abs(w32).max()
    assert np.abs(w16 - w32).max() / denom < 2 ** -7


def test_npair_roundtrip_and_padding():
    rng = np.random.default_rng(11)
    for n in (512, 1000, 1024 + 512):
        q = rng.integers(0, 16, size=(64, n), dtype=np.uint8)
        words = gptq.pack_npair(q)
        n_pad = -(-n // gptq.N_ALIGN) * gptq.N_ALIGN
        assert words.shape == (64 // 4, n_pad // 2)
        back = gptq.unpack_npair(words, n)
        assert np.array_equal(back, q)


def test_npair_layout_golden():
    # byte (row k, packed col J): block b = J // 512; LOW nibble = col
    # b*1024 + J%512, HIGH nibble = col b*1024 + 512 + J%512, XOR 8.
    # int8 row k sits in int32 word k//4, byte k%4 (little endian).
    q = np.zeros((8, 2048), dtype=np.uint8)
    q[5, 3] = 7        # block 0, lo of packed col 3
    q[5, 512 + 3] = 9  # block 0, hi of packed col 3
    q[5, 1024 + 40] = 3  # block 1, lo of packed col 512 + 40
    words = gptq.pack_npair(q).view(np.uint32)
    byte = (words[1, 3] >> (8 * 1)) & 0xFF    # row 5 = word 1, byte 1
    assert byte & 0x0F == 7
    assert (byte >> 4) & 0x0F == (9 ^ 8)
    byte2 = (words[1, 512 + 40] >> (8 * 1)) & 0xFF
    assert byte2 & 0x0F == 3
    assert (byte2 >> 4) & 0x0F == (0 ^ 8)


def test_permute_out_columns_roundtrip():
    """Column-permuted npair tensor dequantizes to the column-permuted
    original (incl. zeroed padded columns)."""
    import numpy as np

    from exllama_tpu.formats.gptq import (
        dequantize, load_quant_tensor, permute_out_columns, quantize_matrix,
    )

    rng = np.random.default_rng(5)
    k, n = 256, 1104   # n not a multiple of N_ALIGN → padded columns exist
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.1
    t = quantize_matrix(w, 128, False, rng)
    qt = load_quant_tensor(t["qweight"], t["qzeros"], t["scales"])
    perm = rng.permutation(n)
    qp = permute_out_columns(qt, perm)
    d0 = dequantize(qt)[:, :n]
    d1 = dequantize(qp)
    np.testing.assert_array_equal(d1[:, :n], d0[:, perm])
    assert np.all(d1[:, n:] == 0)


def test_act_order_down_fold_exact():
    """fold_act_order: act-order model with the down permutation folded into
    gate/up columns is BIT-identical to the unfolded path (same dequant
    values, same dot pairs, same accumulation order)."""
    import numpy as np

    from exllama_tpu.cache import ExLlamaCache
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.models.llama import ExLlama

    def build(fold):
        cfg = ExLlamaConfig()
        cfg.hidden_size = 256
        cfg.intermediate_size = 512
        cfg.num_attention_heads = 4
        cfg.num_key_value_heads = 4
        cfg.head_dim = 64
        cfg.num_hidden_layers = 2
        cfg.vocab_size = 128
        cfg.max_seq_len = 64
        cfg.tuning.matmul_impl = "xla"
        cfg.tuning.fold_act_order = fold
        params = make_synthetic_params(cfg, 64, act_order=True, seed=11)
        return ExLlama(cfg, params=params)

    m_f, m_u = build(True), build(False)
    assert m_f.params.layers[0].down.x_map is None        # folded
    assert m_u.params.layers[0].down.x_map is not None    # not folded
    assert getattr(m_f.params, "_down_folds", None) is not None
    ids = (np.arange(10, dtype=np.int32)[None, :] * 7 + 3) % 128
    out_f = np.asarray(m_f.forward(ids, ExLlamaCache(m_f)))
    out_u = np.asarray(m_u.forward(ids, ExLlamaCache(m_u)))
    np.testing.assert_array_equal(out_f, out_u)


def test_act_order_down_fold_lora(tmp_path):
    """LoRA adapters on gate/up/down of a folded act-order model are
    re-permuted at load: folded+lora == unfolded+lora bit-exactly."""
    import numpy as np

    from exllama_tpu.cache import ExLlamaCache
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.lora import ExLlamaLora
    from exllama_tpu.models.llama import ExLlama
    from tests.test_lora import write_adapter

    def build(fold):
        cfg = ExLlamaConfig()
        cfg.hidden_size = 256
        cfg.intermediate_size = 512
        cfg.num_attention_heads = 4
        cfg.num_key_value_heads = 4
        cfg.head_dim = 64
        cfg.num_hidden_layers = 2
        cfg.vocab_size = 128
        cfg.max_seq_len = 64
        cfg.tuning.matmul_impl = "xla"
        cfg.tuning.fold_act_order = fold
        params = make_synthetic_params(cfg, 64, act_order=True, seed=11)
        return ExLlama(cfg, params=params)

    ids = (np.arange(10, dtype=np.int32)[None, :] * 7 + 3) % 128
    outs = {}
    for fold in (True, False):
        m = build(fold)
        cfg_path, bin_path = write_adapter(str(tmp_path), m, scale=0.05)
        lora = ExLlamaLora(m, cfg_path, bin_path)
        from exllama_tpu.models.llama import forward_chunk

        cache = ExLlamaCache(m)
        logits, new_kv = forward_chunk(
            m.params, cache.state, ids, np.int32(0), None, lora.stacked,
            attend_len=64, last_token_only=True, preprocess_only=False,
            heads=4, kv_heads=4, head_dim=64, eps=m.config.rms_norm_eps,
            matmul_impl="xla",
        )
        outs[fold] = np.asarray(logits)
    np.testing.assert_array_equal(outs[True], outs[False])
