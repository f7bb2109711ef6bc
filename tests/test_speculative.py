"""Speculative decoding: output-equivalence with plain decoding (the core
invariant — drafting must never change what greedy decoding produces),
n-gram proposer behavior, draft-model acceptance, stop tokens."""

import numpy as np
import pytest

from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.generator import ExLlamaGenerator
from exllama_tpu.models.llama import ExLlama
from exllama_tpu.speculative import (
    DraftModelProposer,
    NgramProposer,
    SpeculativeGenerator,
)
from exllama_tpu.tokenizer import FakeTokenizer


def tiny_config(**kw):
    c = ExLlamaConfig()
    c.hidden_size = 256
    c.intermediate_size = 512
    c.num_attention_heads = 4
    c.num_key_value_heads = 4
    c.head_dim = 64
    c.num_hidden_layers = 2
    c.vocab_size = 128
    c.max_seq_len = 128
    c.max_input_len = 128
    c.max_attention_size = 128 * 128
    c.tuning.matmul_impl = "xla"
    c.tuning.attn_len_bucket = 16
    for k, v in kw.items():
        setattr(c, k, v)
    return c


def make_model(seed=0, cfg=None):
    cfg = cfg or tiny_config()
    params = make_synthetic_params(cfg, 32, False, seed=seed)
    return ExLlama(cfg, params=params)


def greedy_reference(model, ids, n):
    """Plain one-token-at-a-time greedy continuation."""
    import jax.numpy as jnp

    cache = ExLlamaCache(model)
    seq = list(map(int, ids))
    if len(seq) > 1:
        model.forward(np.asarray(seq[:-1], np.int32)[None], cache,
                      preprocess_only=True)
    for _ in range(n):
        lg = model.forward(np.asarray(seq[-1:], np.int32)[None], cache)
        seq.append(int(jnp.argmax(lg[0, -1])))
    return np.asarray(seq, np.int32)


def test_ngram_proposer_matches_history():
    p = NgramProposer(max_ngram=2, max_draft=4)
    seq = np.asarray([5, 6, 7, 8, 9, 5, 6], np.int32)
    d = p.propose(seq, 4)
    np.testing.assert_array_equal(d, [7, 8, 9, 5])  # follows last [5, 6]
    # no match → empty
    assert len(p.propose(np.asarray([1, 2, 3], np.int32), 4)) == 0


def test_speculative_greedy_equals_plain_greedy():
    model = make_model()
    ids = (np.arange(10, dtype=np.int32) * 7 + 3) % 128
    ref = greedy_reference(model, ids, 24)

    gen = SpeculativeGenerator(
        model, FakeTokenizer(), ExLlamaCache(model), NgramProposer()
    )
    gen.settings.top_k = 1
    got = gen.generate_tokens(ids, 24)
    np.testing.assert_array_equal(got, ref)
    assert gen.stats["forwards"] <= 25  # never worse than 1 forward/token


def test_draft_model_proposer_self_draft_accepts_everything():
    model = make_model()
    ids = (np.arange(8, dtype=np.int32) * 5 + 2) % 128
    ref = greedy_reference(model, ids, 16)

    draft = DraftModelProposer(model, max_draft=4)
    gen = SpeculativeGenerator(
        model, FakeTokenizer(), ExLlamaCache(model), draft
    )
    gen.settings.top_k = 1
    got = gen.generate_tokens(ids, 16)
    np.testing.assert_array_equal(got, ref)
    # drafting with the target itself must accept every greedy draft
    assert gen.acceptance_rate == 1.0
    assert gen.stats["forwards"] < 16


def test_speculative_stop_token():
    model = make_model()
    ids = (np.arange(8, dtype=np.int32) * 5 + 2) % 128
    ref = greedy_reference(model, ids, 30)
    stop_tok = int(ref[len(ids) + 5])  # force an early stop mid-stream

    gen = SpeculativeGenerator(
        model, FakeTokenizer(), ExLlamaCache(model), NgramProposer()
    )
    gen.settings.top_k = 1
    got = gen.generate_tokens(ids, 30, stop_tokens=(stop_tok,))
    assert int(got[-1]) == stop_tok
    np.testing.assert_array_equal(got, ref[: len(got)])


def test_speculative_sampled_runs():
    model = make_model()
    ids = (np.arange(8, dtype=np.int32) * 3 + 1) % 128
    gen = SpeculativeGenerator(
        model, FakeTokenizer(), ExLlamaCache(model), NgramProposer(), seed=7
    )
    gen.settings.temperature = 1.0
    gen.settings.top_k = 0
    got = gen.generate_tokens(ids, 12)
    assert len(got) == len(ids) + 12
    assert np.all((got >= 0) & (got < 128))
