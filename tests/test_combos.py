"""Cross-feature combinations: act-order × LoRA × fusion × a8 × int8-KV ×
speculative. Each pairing has bitten some engine somewhere; cheap on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.models.llama import ExLlama


def tiny(**kw):
    c = ExLlamaConfig()
    c.hidden_size = 256
    c.intermediate_size = 512
    c.num_attention_heads = 4
    c.num_key_value_heads = kw.pop("kv_heads", 2)
    c.head_dim = 64
    c.num_hidden_layers = 2
    c.vocab_size = 128
    c.max_seq_len = 64
    c.max_input_len = 64
    c.max_attention_size = 64 * 64
    c.tuning.matmul_impl = kw.pop("impl", "xla")
    c.tuning.attn_len_bucket = 16
    for k, v in kw.items():
        setattr(c.tuning, k, v) if hasattr(c.tuning, k) else setattr(c, k, v)
    return c


IDS = (np.arange(10, dtype=np.int32)[None] * 7 + 3) % 128


def logits_of(cfg, gs=32, act=False, seed=4):
    params = make_synthetic_params(cfg, gs, act, seed=seed)
    m = ExLlama(cfg, params=params)
    return np.asarray(
        m.forward(IDS, ExLlamaCache(m), last_id_only=False), np.float32
    )


def test_actorder_pallas_interpret_with_int8kv_matches_xla():
    a = logits_of(tiny(impl="xla", kv_cache_dtype="int8"), act=True)
    b = logits_of(
        tiny(impl="pallas_interpret", kv_cache_dtype="int8"), act=True
    )
    assert np.abs(a - b).max() / np.abs(a).max() < 0.03


def test_a8_interpret_with_actorder_runs():
    lg = logits_of(tiny(impl="pallas_a8_interpret"), act=True)
    assert np.isfinite(lg).all()


def test_gqa_a8_int8kv_speculative_end_to_end():
    from exllama_tpu.speculative import NgramProposer, SpeculativeGenerator
    from exllama_tpu.tokenizer import FakeTokenizer

    cfg = tiny(impl="pallas_a8_interpret", kv_cache_dtype="int8")
    params = make_synthetic_params(cfg, 32, False, seed=5)
    m = ExLlama(cfg, params=params)
    gen = SpeculativeGenerator(
        m, FakeTokenizer(), ExLlamaCache(m), NgramProposer()
    )
    gen.settings.top_k = 1
    out = gen.generate_tokens(IDS[0], 8)
    assert len(out) == 18 and np.all((out >= 0) & (out < 128))


def test_lora_with_actorder_and_fused_base():
    """LoRA low-rank adds must apply to ORIGINAL x for act-order bases
    (permutation only affects the quantized matmul input)."""
    import dataclasses as dc

    from exllama_tpu.lora import LayerLora
    from exllama_tpu.ops.quant import q4_matmul
    from exllama_tpu.formats import gptq

    rng = np.random.default_rng(6)
    k, n = 256, 512
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.05
    t = gptq.quantize_matrix(w, 32, True, rng)
    qt = gptq.load_quant_tensor(
        t["qweight"], t["qzeros"], t["scales"], t["g_idx"]
    )
    a = rng.normal(size=(k, 4)).astype(np.float32)
    b = rng.normal(size=(4, n)).astype(np.float32) * 0.1
    x = jnp.asarray(rng.normal(size=(3, k)), jnp.bfloat16)

    base = np.asarray(q4_matmul(x, qt, impl="xla"), np.float32)
    lora_term = np.asarray(
        jnp.dot(jnp.dot(x.astype(jnp.float32), a), b), np.float32
    )
    got = np.asarray(
        q4_matmul(
            x, qt, impl="pallas_interpret",
            lora=(jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16)),
        ),
        np.float32,
    )
    ref = base + lora_term
    assert np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9) < 0.04
