"""End-to-end model forward tests on a tiny synthetic Llama.

Validates: prefill/decode equivalence (prefill N tokens then decode must
match one full forward — the KV cache invariant), chunked prefill equality,
GQA, batched left-pad masking (reference's batch sanity test,
test_benchmark_inference.py:258-312), act-order and g32 paths.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.models.llama import ExLlama


def tiny_config(**kw):
    c = ExLlamaConfig()
    c.hidden_size = 256
    c.intermediate_size = 512
    c.num_attention_heads = 4
    c.num_key_value_heads = kw.pop("kv_heads", 4)
    c.head_dim = 64
    c.num_hidden_layers = 2
    c.vocab_size = 128
    c.max_seq_len = 64
    c.max_input_len = kw.pop("max_input_len", 64)
    c.max_attention_size = kw.pop("max_attention_size", 64 * 64)
    c.tuning.matmul_impl = "xla"
    c.tuning.attn_len_bucket = kw.pop("attn_len_bucket", 16)
    for k, v in kw.items():
        setattr(c, k, v)
    return c


def make_model(cfg=None, groupsize=128, act_order=False, seed=0):
    cfg = cfg or tiny_config()
    params = make_synthetic_params(cfg, groupsize, act_order, seed)
    return ExLlama(cfg, params=params)


@pytest.mark.parametrize("kv_heads", [4, 2])
def test_full_forward_runs(kv_heads):
    model = make_model(tiny_config(kv_heads=kv_heads))
    cache = ExLlamaCache(model)
    ids = np.arange(10, dtype=np.int32)[None, :] % 128
    logits = model.forward(ids, cache, last_id_only=False)
    assert logits.shape == (1, 10, 128)
    assert cache.current_seq_len == 10
    assert np.all(np.isfinite(np.asarray(logits)))


def test_prefill_then_decode_matches_full_forward():
    model = make_model()
    ids = (np.arange(12, dtype=np.int32)[None, :] * 7 + 3) % 128

    cache_a = ExLlamaCache(model)
    full = np.asarray(model.forward(ids, cache_a, last_id_only=False))

    cache_b = ExLlamaCache(model)
    model.forward(ids[:, :-1], cache_b, preprocess_only=True)
    assert cache_b.current_seq_len == 11
    last = np.asarray(model.forward(ids[:, -1:], cache_b))
    np.testing.assert_allclose(last[:, 0], full[:, -1], rtol=3e-2, atol=3e-2)


def test_chunked_prefill_matches_unchunked():
    cfg = tiny_config(max_input_len=5, max_attention_size=8 * 8)
    model_chunked = make_model(cfg)
    cache_a = ExLlamaCache(model_chunked)
    ids = (np.arange(20, dtype=np.int32)[None, :] * 13 + 1) % 128
    out_a = np.asarray(model_chunked.forward(ids, cache_a, last_id_only=True))

    cfg2 = tiny_config()
    model_full = ExLlama(cfg2, params=model_chunked.params)
    cache_b = ExLlamaCache(model_full)
    out_b = np.asarray(model_full.forward(ids, cache_b, last_id_only=True))
    np.testing.assert_allclose(out_a, out_b, rtol=3e-2, atol=3e-2)
    assert cache_a.current_seq_len == cache_b.current_seq_len == 20


@pytest.mark.parametrize("groupsize,act_order", [(32, False), (128, True)])
def test_quant_variants(groupsize, act_order):
    model = make_model(groupsize=groupsize, act_order=act_order)
    cache = ExLlamaCache(model)
    ids = np.arange(8, dtype=np.int32)[None, :]
    logits = model.forward(ids, cache)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_batched_left_padding_consistency():
    """Rows with identical content but different left-padding must produce
    the same logits (reference -v -v check, test_benchmark_inference.py:258-312)."""
    model = make_model()
    cfg = model.config
    prompt = ((np.arange(6) * 11 + 2) % 128).astype(np.int32)

    # Single-row run of the longer prompt = the oracle.
    longer = ((np.arange(9) * 5 + 7) % 128).astype(np.int32)
    cache_1 = ExLlamaCache(model)
    ref = np.asarray(model.forward(longer[None, :], cache_1))

    # Mixed batch: row 0 = short prompt left-padded by 3 (masked out), rows
    # 1 & 2 = identical copies of the longer prompt, unpadded. The padded
    # row must not perturb the others, and identical rows must be identical
    # (reference -v -v, test_benchmark_inference.py:258-312).
    pad = 3
    b_ids = np.zeros((3, 9), dtype=np.int32)
    b_ids[0, pad:] = prompt
    b_ids[1, :] = longer
    b_ids[2, :] = longer
    mask = np.zeros((3, cfg.max_seq_len), dtype=bool)
    mask[0, pad:9] = True
    mask[1, :9] = True
    mask[2, :9] = True

    cache_2 = ExLlamaCache(model, batch_size=3)
    out = np.asarray(
        model.forward(b_ids, cache_2, input_mask=jnp.asarray(mask))
    )
    np.testing.assert_allclose(out[1], out[2], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[1], ref[0], rtol=3e-2, atol=3e-2)
    assert np.all(np.isfinite(out[0]))


def test_pallas_interpret_model_matches_xla():
    cfg = tiny_config()
    cfg.tuning.matmul_impl = "xla"
    model = make_model(cfg)
    ids = np.arange(8, dtype=np.int32)[None, :]
    cache = ExLlamaCache(model)
    ref = np.asarray(model.forward(ids, cache))

    cfg2 = tiny_config()
    cfg2.tuning.matmul_impl = "pallas_interpret"
    model2 = ExLlama(cfg2, params=model.params)
    cache2 = ExLlamaCache(model2)
    got = np.asarray(model2.forward(ids, cache2))
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


def test_quantized_lm_head_close_to_bf16_head():
    """tuning.quantize_lm_head swaps the fp/bf16 head for a 4-bit one; with
    the SAME head weights the logits must stay within 4-bit quantization
    error of the dense head."""
    import dataclasses

    from exllama_tpu.cache import ExLlamaCache
    from exllama_tpu.formats.gptq import (
        QuantTensor, load_quant_tensor, quantize_matrix,
    )
    from exllama_tpu.models.llama import ExLlama

    cfg = tiny_config()
    m_dense = make_model(cfg)
    head = np.asarray(m_dense.params.lm_head, np.float32)  # [h, vocab]
    t = quantize_matrix(head, 32, False)
    qt = load_quant_tensor(t["qweight"], t["qzeros"], t["scales"])
    assert isinstance(qt, QuantTensor)
    params_q = dataclasses.replace(m_dense.params, lm_head=qt)
    m_q = ExLlama(cfg, params=params_q)

    ids = (np.arange(8, dtype=np.int32)[None] * 3 + 1) % cfg.vocab_size
    l1 = np.asarray(m_dense.forward(ids, ExLlamaCache(m_dense)), np.float32)
    l2 = np.asarray(m_q.forward(ids, ExLlamaCache(m_q)), np.float32)
    scale = np.abs(l1).max() + 1e-9
    assert np.abs(l1 - l2).max() / scale < 0.15  # 4-bit head noise bound


def test_quantize_lm_head_flag_builds_quant_tensor():
    from exllama_tpu.formats.gptq import QuantTensor
    from exllama_tpu.formats.loader import make_synthetic_params

    cfg = tiny_config()
    cfg.tuning.quantize_lm_head = True
    params = make_synthetic_params(cfg, 32, False, seed=0)
    assert isinstance(params.lm_head, QuantTensor)
    m = ExLlama(cfg, params=params)
    from exllama_tpu.cache import ExLlamaCache

    ids = (np.arange(6, dtype=np.int32)[None] * 3 + 1) % cfg.vocab_size
    lg = np.asarray(m.forward(ids, ExLlamaCache(m)), np.float32)
    assert np.isfinite(lg).all()


def test_fused_projections_match_unfused():
    """Fused qkv/gateup must be bit-identical to per-projection matmuls
    in the xla impl (same dequantized weights, same dot contractions)."""
    cfg_f = tiny_config()
    cfg_u = tiny_config()
    cfg_u.tuning.fuse_projections = False
    params_f = make_synthetic_params(cfg_f, 32, False, seed=3)
    params_u = make_synthetic_params(cfg_u, 32, False, seed=3)
    assert params_f.layers[0].qkv is not None
    assert params_f.layers[0].q is None
    assert params_u.layers[0].qkv is None

    m_f = ExLlama(cfg_f, params=params_f)
    m_u = ExLlama(cfg_u, params=params_u)
    ids = (np.arange(9, dtype=np.int32)[None] * 5 + 2) % cfg_f.vocab_size
    lf = np.asarray(m_f.forward(ids, ExLlamaCache(m_f), last_id_only=False))
    lu = np.asarray(m_u.forward(ids, ExLlamaCache(m_u), last_id_only=False))
    np.testing.assert_allclose(lf, lu, rtol=2e-2, atol=2e-2)


def test_fusion_skipped_for_act_order():
    cfg = tiny_config()
    params = make_synthetic_params(cfg, 32, act_order=True, seed=1)
    assert params.layers[0].qkv is None
    assert params.layers[0].q is not None


def test_head_mode_argmax_matches_logits_argmax():
    """forward_chunk(head_mode='argmax') must pick the same token as
    argmax over the logits head, for dense and quantized lm_heads."""
    import functools

    import jax

    from exllama_tpu.models.llama import forward_chunk

    for quant_head in (False, True):
        cfg = tiny_config()
        if quant_head:
            cfg.tuning.quantize_lm_head = True
        model = make_model(cfg)
        cache = ExLlamaCache(model)
        ids = (np.arange(9, dtype=np.int32)[None, :] * 5 + 2) % 128
        lg = model.forward(ids, cache)
        tok0 = int(np.argmax(np.asarray(lg)[0, -1]))

        step = functools.partial(
            forward_chunk,
            attend_len=64, last_token_only=True, preprocess_only=False,
            heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim, eps=cfg.rms_norm_eps,
            matmul_impl="xla",
        )
        kv0 = jax.tree.map(lambda x: x.copy(), cache.state)
        lg2, _ = step(model.params, kv0,
                      jnp.asarray([[tok0]], jnp.int32),
                      jnp.int32(cache.current_seq_len), None, None)
        ref = int(np.argmax(np.asarray(lg2)[0, -1]))
        kv1 = jax.tree.map(lambda x: x.copy(), cache.state)
        tok, _ = functools.partial(step, head_mode="argmax")(
            model.params, kv1, jnp.asarray([[tok0]], jnp.int32),
            jnp.int32(cache.current_seq_len), None, None)
        assert tok.shape == (1, 1) and tok.dtype == jnp.int32
        assert int(tok[0, 0]) == ref, (quant_head, int(tok[0, 0]), ref)


def test_auto_attn_impl_engages_fused_layer_tail(monkeypatch):
    """Regression: attn_impl='auto' (every caller that doesn't thread
    model._attn_impl() — engine, beam, speculative, bench) must resolve to
    'flash' at trace time FOR LONG-ATTEND DECODE so the fused layer-tail
    megakernel engages; the gate used to compare the literal string 'auto'
    and silently fall back to the separate kernels. Short attend
    (attend_len ≤ 256) intentionally demotes to xla attention instead
    (round-5 measurement, scripts/ab_best2.py) — covered below."""
    import exllama_tpu.models.llama as L
    import exllama_tpu.ops.attn_block as AB
    from exllama_tpu.models.llama import forward_chunk

    cfg = tiny_config()
    cfg.num_attention_heads = 2
    cfg.num_key_value_heads = 2
    cfg.head_dim = 128          # lane-legal: attn_o_applicable requires it
    cfg.hidden_size = 256
    cfg.tuning.matmul_impl = "pallas_interpret"
    # shrink the short-attend xla demotion threshold below this test's
    # attend_len=16 so the flash/fused resolution still engages at tiny
    # test shapes; the short leg below drops under it instead
    monkeypatch.setattr(L, "SHORT_ATTEND_XLA_LEN", 8)
    model = make_model(cfg)
    cache = ExLlamaCache(model)
    ids = np.arange(6, dtype=np.int32)[None, :]
    model.forward(ids, cache, preprocess_only=True)
    # prefill the short-attend leg's cache NOW, before default_backend is
    # patched to "tpu" below — afterwards model.forward would resolve
    # attn_impl=auto to the real flash kernel, which cannot lower on the
    # CPU test backend
    cache2 = ExLlamaCache(model)
    model.forward(ids, cache2, preprocess_only=True)

    calls = []
    real = AB.layer_tail

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(AB, "layer_tail", spy)
    # 'auto' resolves via the backend; pretend TPU (kernels stay interpret
    # via matmul_impl so this runs on the CPU test backend)
    monkeypatch.setattr(L.jax, "default_backend", lambda: "tpu")

    out, _ = forward_chunk(
        model.params, cache.state, jnp.asarray([[5]], jnp.int32),
        jnp.int32(cache.current_seq_len), None, None,
        attend_len=16, last_token_only=True, preprocess_only=False,
        heads=2, kv_heads=2, head_dim=128, eps=cfg.rms_norm_eps,
        matmul_impl="pallas_interpret",
    )
    assert len(calls) == cfg.num_hidden_layers
    assert np.all(np.isfinite(np.asarray(out)))

    # short-attend decode (attend_len ≤ 256): auto demotes to xla
    # attention — the megakernel must NOT engage, and the step must agree
    # with the long-attend one on the visible window
    calls.clear()
    out2, _ = forward_chunk(
        model.params, cache2.state, jnp.asarray([[5]], jnp.int32),
        jnp.int32(cache2.current_seq_len), None, None,
        attend_len=8, last_token_only=True, preprocess_only=False,
        heads=2, kv_heads=2, head_dim=128, eps=cfg.rms_norm_eps,
        matmul_impl="pallas_interpret",
    )
    assert len(calls) == 0
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(out2, np.float32),
        rtol=3e-2, atol=3e-2,
    )
