"""int8 KV cache: quantization roundtrip, forward accuracy vs bf16 cache,
flash-kernel (interpret) parity, and cache-op coverage.

No reference counterpart (the reference cache is fp16-only,
model.py:576-577); the invariant here is that per-(token, head) int8 KV
changes logits only within the int8 noise floor.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.models.llama import ExLlama
from exllama_tpu.ops.attention import (
    attend,
    quantize_kv_rows,
    update_kv_cache,
)


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
    c.max_input_len = 64
    c.max_attention_size = 64 * 64
    c.tuning.matmul_impl = "xla"
    c.tuning.attn_len_bucket = 16
    for k, v in kw.items():
        setattr(c, k, v)
    return c


def test_quantize_kv_rows_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 3, 64)) * 0.3, jnp.bfloat16)
    q, s = quantize_kv_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 5, 3)
    back = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    ref = np.asarray(x, np.float32)
    err = np.abs(back - ref).max()
    assert err <= np.abs(ref).max() / 127 + 1e-6


def test_update_kv_cache_int8_scalar_and_vector_cursors():
    rng = np.random.default_rng(1)
    b, hkv, s_max, d, t = 2, 3, 16, 64, 4
    kc = jnp.zeros((b, hkv, s_max, d), jnp.int8)
    vc = jnp.zeros((b, hkv, s_max, d), jnp.int8)
    ks = jnp.zeros((b, hkv, s_max), jnp.float32)
    vs = jnp.zeros((b, hkv, s_max), jnp.float32)
    nk = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.bfloat16)
    nv = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.bfloat16)

    kc2, vc2, ks2, vs2 = update_kv_cache(kc, vc, nk, nv, jnp.int32(3), ks, vs)
    deq = np.asarray(kc2, np.float32)[:, :, 3:7] * np.asarray(ks2)[
        :, :, 3:7, None
    ]
    ref = np.asarray(jnp.swapaxes(nk, 1, 2), np.float32)
    assert np.abs(deq - ref).max() < 0.02
    assert np.asarray(ks2)[:, :, :3].max() == 0

    cursors = jnp.asarray([0, 5], jnp.int32)
    kc3, vc3, ks3, vs3 = update_kv_cache(kc, vc, nk, nv, cursors, ks, vs)
    assert np.asarray(ks3)[0, :, :4].min() > 0
    assert np.asarray(ks3)[1, :, 5:9].min() > 0
    assert np.asarray(ks3)[1, :, :5].max() == 0


@pytest.mark.parametrize("impl", ["xla", "flash_interpret"])
def test_attend_int8_close_to_bf16(impl):
    rng = np.random.default_rng(2)
    b, t, h, d, s_max = 1, 4, 4, 128, 32
    hkv = 2
    q = jnp.asarray(rng.standard_normal((b, t, h, d)) * 0.5, jnp.bfloat16)
    nk = jnp.asarray(rng.standard_normal((b, 8, hkv, d)) * 0.5, jnp.bfloat16)
    nv = jnp.asarray(rng.standard_normal((b, 8, hkv, d)) * 0.5, jnp.bfloat16)

    kc_b = jnp.zeros((b, hkv, s_max, d), jnp.bfloat16)
    vc_b = jnp.zeros((b, hkv, s_max, d), jnp.bfloat16)
    kc_b, vc_b, _, _ = update_kv_cache(kc_b, vc_b, nk, nv, jnp.int32(0))

    kc_q = jnp.zeros((b, hkv, s_max, d), jnp.int8)
    vc_q = jnp.zeros((b, hkv, s_max, d), jnp.int8)
    ks = jnp.zeros((b, hkv, s_max), jnp.float32)
    vs = jnp.zeros((b, hkv, s_max), jnp.float32)
    kc_q, vc_q, ks, vs = update_kv_cache(
        kc_q, vc_q, nk, nv, jnp.int32(0), ks, vs
    )

    past = jnp.int32(4)  # queries sit after 4 cached rows
    ref = np.asarray(
        attend(q, kc_b, vc_b, past, 32, impl="xla"), np.float32
    )
    got = np.asarray(
        attend(q, kc_q, vc_q, past, 32, impl=impl, k_scale=ks, v_scale=vs),
        np.float32,
    )
    assert np.abs(got - ref).max() < 0.05


def test_int8_cache_forward_close_to_bf16():
    cfg_b = tiny_config()
    cfg_q = tiny_config()
    cfg_q.tuning.kv_cache_dtype = "int8"
    params = make_synthetic_params(cfg_b, 32, False, seed=5)
    m_b = ExLlama(cfg_b, params=params)
    m_q = ExLlama(cfg_q, params=params)

    cache_b = ExLlamaCache(m_b)
    cache_q = ExLlamaCache(m_q)
    assert cache_q.state.k[0].dtype == jnp.int8
    assert cache_q.state.k_scale is not None

    ids = (np.arange(12, dtype=np.int32)[None] * 7 + 3) % cfg_b.vocab_size
    lb = np.asarray(m_b.forward(ids, cache_b, last_id_only=False), np.float32)
    lq = np.asarray(m_q.forward(ids, cache_q, last_id_only=False), np.float32)
    scale = np.abs(lb).max() + 1e-9
    assert np.abs(lb - lq).max() / scale < 0.05

    # decode continuation stays close too
    tb = np.asarray(
        m_b.forward(ids[:, -1:] * 0 + 5, cache_b), np.float32
    )
    tq = np.asarray(
        m_q.forward(ids[:, -1:] * 0 + 5, cache_q), np.float32
    )
    assert np.abs(tb - tq).max() / (np.abs(tb).max() + 1e-9) < 0.05


def test_int8_cache_ops():
    cfg = tiny_config()
    cfg.tuning.kv_cache_dtype = "int8"
    params = make_synthetic_params(cfg, 32, False, seed=6)
    m = ExLlama(cfg, params=params)
    cache = ExLlamaCache(m)
    ids = (np.arange(8, dtype=np.int32)[None] * 3 + 1) % cfg.vocab_size
    m.forward(ids, cache, preprocess_only=True)

    c2 = cache.clone()
    assert c2.state.k_scale is not None
    c2.roll_left()
    assert c2.current_seq_len == cache.current_seq_len - 1
    np.testing.assert_array_equal(
        np.asarray(c2.state.k_scale[0][:, :, 0]),
        np.asarray(cache.state.k_scale[0][:, :, 1]),
    )

    tgt = ExLlamaCache(m, batch_size=2)
    cache.copy_states(tgt, 0, 8, 0, 8, 0, 1, 0, 2)
    np.testing.assert_array_equal(
        np.asarray(tgt.state.k[0][1, :, :8]),
        np.asarray(cache.state.k[0][0, :, :8]),
    )
    np.testing.assert_array_equal(
        np.asarray(tgt.state.v_scale[0][1, :, :8]),
        np.asarray(cache.state.v_scale[0][0, :, :8]),
    )


def test_int8_generator_end_to_end():
    from exllama_tpu.generator import ExLlamaGenerator
    from exllama_tpu.tokenizer import FakeTokenizer

    cfg = tiny_config()
    cfg.tuning.kv_cache_dtype = "int8"
    params = make_synthetic_params(cfg, 32, False, seed=7)
    m = ExLlama(cfg, params=params)
    gen = ExLlamaGenerator(m, FakeTokenizer(), ExLlamaCache(m))
    gen.settings.temperature = 1.0
    gen.settings.top_k = 1
    out = gen.generate_simple("hello world", max_new_tokens=8)
    assert isinstance(out, str) and len(out) > 0


# ---------------------------------------------------------------------------
# int4 KV cache (packed two-per-byte along D — quarter the stream)
# ---------------------------------------------------------------------------

def test_quantize_kv_rows4_roundtrip():
    from exllama_tpu.ops.attention import quantize_kv_rows4, unpack_kv4

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 5, 3, 64)) * 0.3, jnp.bfloat16)
    q, s = quantize_kv_rows4(x)
    assert q.dtype == jnp.int8 and q.shape == (2, 5, 3, 32)
    assert s.shape == (2, 5, 3)
    back = np.asarray(unpack_kv4(jnp.asarray(q), jnp.float32)) \
        * np.asarray(s)[..., None]
    ref = np.asarray(x, np.float32)
    err = np.abs(back - ref).max()
    assert err <= np.abs(ref).max() / 7 + 1e-6      # int4 step bound


@pytest.mark.parametrize("impl", ["xla", "flash_interpret"])
def test_attend_int4_close_to_bf16(impl):
    rng = np.random.default_rng(8)
    b, t, h, d, s_max = 1, 4, 4, 128, 32
    hkv = 2
    q = jnp.asarray(rng.standard_normal((b, t, h, d)) * 0.5, jnp.bfloat16)
    nk = jnp.asarray(rng.standard_normal((b, 8, hkv, d)) * 0.5, jnp.bfloat16)
    nv = jnp.asarray(rng.standard_normal((b, 8, hkv, d)) * 0.5, jnp.bfloat16)

    kc_b = jnp.zeros((b, hkv, s_max, d), jnp.bfloat16)
    vc_b = jnp.zeros((b, hkv, s_max, d), jnp.bfloat16)
    kc_b, vc_b, _, _ = update_kv_cache(kc_b, vc_b, nk, nv, jnp.int32(0))

    kc_q = jnp.zeros((b, hkv, s_max, d // 2), jnp.int8)   # packed int4
    vc_q = jnp.zeros((b, hkv, s_max, d // 2), jnp.int8)
    ks = jnp.zeros((b, hkv, s_max), jnp.float32)
    vs = jnp.zeros((b, hkv, s_max), jnp.float32)
    kc_q, vc_q, ks, vs = update_kv_cache(
        kc_q, vc_q, nk, nv, jnp.int32(0), ks, vs
    )

    past = jnp.int32(4)
    ref = np.asarray(attend(q, kc_b, vc_b, past, 32, impl="xla"), np.float32)
    got = np.asarray(
        attend(q, kc_q, vc_q, past, 32, impl=impl, k_scale=ks, v_scale=vs),
        np.float32,
    )
    # int4 noise floor is ~18x int8's; still bounded per row
    assert np.abs(got - ref).max() < 0.35
    # and the two impls agree with each other tightly
    if impl == "flash_interpret":
        oracle = np.asarray(
            attend(q, kc_q, vc_q, past, 32, impl="xla",
                   k_scale=ks, v_scale=vs),
            np.float32,
        )
        assert np.abs(got - oracle).max() < 0.03


def test_int4_cache_forward_and_decode():
    cfg_b = tiny_config()
    cfg_q = tiny_config()
    cfg_q.tuning.kv_cache_dtype = "int4"
    params = make_synthetic_params(cfg_b, 32, False, seed=9)
    m_b = ExLlama(cfg_b, params=params)
    m_q = ExLlama(cfg_q, params=params)

    cache_b = ExLlamaCache(m_b)
    cache_q = ExLlamaCache(m_q)
    assert cache_q.state.k[0].dtype == jnp.int8
    assert cache_q.state.k[0].shape[-1] == cfg_b.head_dim // 2
    assert cache_q.state.k_scale is not None

    ids = (np.arange(12, dtype=np.int32)[None] * 7 + 3) % cfg_b.vocab_size
    lb = np.asarray(m_b.forward(ids, cache_b, last_id_only=False), np.float32)
    lq = np.asarray(m_q.forward(ids, cache_q, last_id_only=False), np.float32)
    scale = np.abs(lb).max() + 1e-9
    assert np.abs(lb - lq).max() / scale < 0.45    # int4 noise, bounded

    # deferred-commit decode steps run and stay finite/close
    for tok in (5, 9, 2):
        tb = np.asarray(
            m_b.forward(np.array([[tok]], np.int32), cache_b), np.float32
        )
        tq = np.asarray(
            m_q.forward(np.array([[tok]], np.int32), cache_q), np.float32
        )
        assert np.abs(tb - tq).max() / (np.abs(tb).max() + 1e-9) < 0.45
    assert cache_q.current_seq_len == cache_b.current_seq_len == 15


def test_int4_megakernel_matches_oracle():
    """Fused layer-tail decode (flash_interpret) with an int4 cache matches
    the xla-attention path on the same int4 cache (same quantized data —
    tight tolerance; only impl differs)."""
    cfg_a = tiny_config(kv_heads=2)
    cfg_a.head_dim = 128
    cfg_a.hidden_size = 512
    cfg_a.num_attention_heads = 4
    cfg_a.tuning.kv_cache_dtype = "int4"
    cfg_a.tuning.matmul_impl = "pallas_interpret"
    cfg_a.tuning.attn_impl = "flash_interpret"
    params = make_synthetic_params(cfg_a, 128, False, seed=10)
    m_a = ExLlama(cfg_a, params=params)
    cache_a = ExLlamaCache(m_a)

    cfg_o = tiny_config(kv_heads=2)
    cfg_o.head_dim = 128
    cfg_o.hidden_size = 512
    cfg_o.num_attention_heads = 4
    cfg_o.tuning.kv_cache_dtype = "int4"
    cfg_o.tuning.matmul_impl = "pallas_interpret"
    cfg_o.tuning.attn_impl = "xla"
    m_o = ExLlama(cfg_o, params=params)
    cache_o = ExLlamaCache(m_o)

    ids = (np.arange(10, dtype=np.int32)[None] * 5 + 1) % cfg_a.vocab_size
    m_a.forward(ids, cache_a, preprocess_only=True)
    m_o.forward(ids, cache_o, preprocess_only=True)
    got = np.asarray(m_a.forward(np.array([[7]], np.int32), cache_a))
    ref = np.asarray(m_o.forward(np.array([[7]], np.int32), cache_o))
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 0.04
