"""Generator-layer tests: cache-aware ops, sampling loop, constraints.

Uses a tiny synthetic model + the byte-level FakeTokenizer; oracle checks
mirror the reference's behaviors (generator.py:177-382)."""

import numpy as np
import pytest

from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.generator import ExLlamaGenerator
from exllama_tpu.models.llama import ExLlama
from exllama_tpu.tokenizer import FakeTokenizer


@pytest.fixture(scope="module")
def gen():
    cfg = ExLlamaConfig()
    cfg.hidden_size = 256
    cfg.intermediate_size = 512
    cfg.num_attention_heads = 4
    cfg.num_key_value_heads = 4
    cfg.head_dim = 64
    cfg.num_hidden_layers = 2
    cfg.vocab_size = 260  # FakeTokenizer byte vocab
    cfg.max_seq_len = 96
    cfg.tuning.matmul_impl = "xla"
    cfg.tuning.attn_len_bucket = 32
    params = make_synthetic_params(cfg, 128, False, seed=5)
    model = ExLlama(cfg, params=params)
    tokenizer = FakeTokenizer()
    cache = ExLlamaCache(model)
    return ExLlamaGenerator(model, tokenizer, cache, seed=7)


def test_generate_simple_roundtrip(gen):
    gen.settings.temperature = 1.0
    gen.settings.top_k = 1  # greedy for determinism
    text = gen.generate_simple("hello", max_new_tokens=8)
    assert text.startswith("hello")
    assert gen.gen_num_tokens() <= 5 + 8
    assert gen.cache.current_seq_len == gen.gen_num_tokens() - 1


def test_gen_begin_reuse_common_prefix(gen):
    ids1 = gen.tokenizer.encode("the quick brown fox")
    gen.gen_begin(ids1)
    for _ in range(4):
        gen.gen_single_token()
    seq_after = gen.sequence.copy()
    cache_len = gen.cache.current_seq_len

    # Same prefix + different tail → must reuse ≥ prefix length - 1
    ids2 = gen.tokenizer.encode("the quick brown cat")
    reused = gen.gen_begin_reuse(ids2)
    assert reused >= len("the quick brown ")  # byte-level: 1 token per byte
    assert gen.cache.current_seq_len == gen.sequence.shape[1] - 1
    np.testing.assert_array_equal(gen.sequence, ids2)

    # Disjoint prompt → no reuse
    ids3 = gen.tokenizer.encode("zzz")
    reused = gen.gen_begin_reuse(ids3)
    assert reused == 0


def test_reuse_matches_fresh_prefill(gen):
    """Decoding after prefix-reuse must equal decoding after fresh prefill."""
    gen.settings.top_k = 1
    ids1 = gen.tokenizer.encode("abcdefgh")
    gen.gen_begin(ids1)
    ids2 = gen.tokenizer.encode("abcdefxy")
    gen.gen_begin_reuse(ids2)
    t_reuse = gen.gen_single_token().copy()

    gen.gen_begin(ids2)
    t_fresh = gen.gen_single_token().copy()
    np.testing.assert_array_equal(t_reuse, t_fresh)


def test_gen_rewind(gen):
    ids = gen.tokenizer.encode("rewind test")
    gen.gen_begin(ids)
    n0 = gen.gen_num_tokens()
    c0 = gen.cache.current_seq_len
    for _ in range(3):
        gen.gen_single_token()
    gen.gen_rewind(3)
    assert gen.gen_num_tokens() == n0
    assert gen.cache.current_seq_len == c0


def test_constraints_force_tokens(gen):
    ids = gen.tokenizer.encode("abc")
    gen.gen_begin(ids)
    allowed = [10, 11, 12]
    tok = gen.gen_single_token(constraints=allowed)
    assert int(tok[0, 0]) in allowed


def test_disallow_tokens(gen):
    ids = gen.tokenizer.encode("abc")
    gen.gen_begin(ids)
    gen.settings.top_k = 1
    t1 = int(gen.gen_single_token()[0, 0])
    gen.gen_rewind(1)
    gen.disallow_tokens([t1])
    t2 = int(gen.gen_single_token()[0, 0])
    assert t2 != t1
    gen.disallow_tokens(None)


def test_rep_penalty_reduces_repeats(gen):
    """With a huge repetition penalty and greedy sampling, the same token
    should not repeat forever."""
    ids = gen.tokenizer.encode("x")
    gen.settings.top_k = 1
    gen.settings.token_repetition_penalty_max = 1000.0
    gen.gen_begin(ids)
    toks = [int(gen.gen_single_token()[0, 0]) for _ in range(6)]
    assert len(set(toks)) > 1
    gen.settings.token_repetition_penalty_max = 1.15


def test_gen_tokens_matches_single_token_greedy(gen):
    """The on-device chunked loop must reproduce the per-token path
    exactly under greedy sampling (same forwards, same penalty state)."""
    gen.settings.temperature = 1.0
    gen.settings.top_k = 1
    ids = gen.tokenizer.encode("the quick brown fox")
    gen.gen_begin(ids)
    ref = [int(gen.gen_single_token()[0, 0]) for _ in range(6)]
    ref_cursor = gen.cache.current_seq_len

    gen.gen_begin(ids)
    toks = gen.gen_tokens(6)
    assert toks.shape == (1, 6)
    assert toks[0].tolist() == ref
    assert gen.cache.current_seq_len == ref_cursor
    assert gen.sequence.shape[1] == ids.shape[1] + 6


def test_generate_simple_chunked_matches_per_token(gen):
    gen.settings.temperature = 1.0
    gen.settings.top_k = 1
    t1 = gen.generate_simple("hello world", max_new_tokens=9, loop_chunk=4)
    t2 = gen.generate_simple("hello world", max_new_tokens=9, loop_chunk=1)
    assert t1 == t2
