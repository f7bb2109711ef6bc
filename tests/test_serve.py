"""Continuous batching engine tests.

Key invariant: a request decoded through the slotted engine (greedy) must
produce exactly the same tokens as the plain single-sequence generator —
regardless of what other requests share the batch or when it was admitted."""

import numpy as np
import pytest

from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.generator import ExLlamaGenerator
from exllama_tpu.models.llama import ExLlama
from exllama_tpu.ops.sampling import SamplerSettings
from exllama_tpu.serve import ContinuousBatchingEngine
from exllama_tpu.tokenizer import FakeTokenizer


@pytest.fixture(scope="module")
def model():
    cfg = ExLlamaConfig()
    cfg.hidden_size = 256
    cfg.intermediate_size = 512
    cfg.num_attention_heads = 4
    cfg.num_key_value_heads = 2
    cfg.head_dim = 64
    cfg.num_hidden_layers = 2
    cfg.vocab_size = 260
    cfg.max_seq_len = 128
    cfg.tuning.matmul_impl = "xla"
    cfg.tuning.attn_len_bucket = 32
    return ExLlama(cfg, params=make_synthetic_params(cfg, 128, False, seed=31))


GREEDY = SamplerSettings(temperature=1.0, top_k=1, top_p=0.0,
                         token_repetition_penalty_max=1.0)


def oracle_tokens(model, prompt_ids, n):
    gen = ExLlamaGenerator(model, FakeTokenizer(),
                           ExLlamaCache(model), seed=0)
    gen.settings = SamplerSettings(**{**GREEDY.__dict__})
    gen.gen_begin(np.asarray(prompt_ids)[None, :])
    return [int(gen.gen_single_token()[0, 0]) for _ in range(n)]


def test_single_request_matches_generator(model):
    eng = ContinuousBatchingEngine(model, FakeTokenizer(), max_slots=4)
    ids = FakeTokenizer().encode("continuous batching!")[0]
    req = eng.submit(ids, max_new_tokens=8, settings=GREEDY,
                     stop_tokens=(-1,))
    eng.run()
    want = oracle_tokens(model, ids, 8)
    assert req.new_tokens == want


def test_concurrent_requests_are_independent(model):
    tok = FakeTokenizer()
    eng = ContinuousBatchingEngine(model, tok, max_slots=4)
    prompts = [b"alpha prompt", b"tiny", b"a different longer prompt here"]
    idss = [tok.encode(p.decode())[0] for p in prompts]
    reqs = [
        eng.submit(ids, max_new_tokens=6, settings=GREEDY, stop_tokens=(-1,))
        for ids in idss
    ]
    eng.run()
    for ids, req in zip(idss, reqs):
        assert req.new_tokens == oracle_tokens(model, ids, 6), ids


def test_late_admission_and_slot_reuse(model):
    """More requests than slots: later requests must wait for free slots and
    still decode correctly on reused slots."""
    tok = FakeTokenizer()
    eng = ContinuousBatchingEngine(model, tok, max_slots=2)
    idss = [tok.encode(f"prompt number {i}")[0] for i in range(5)]
    reqs = [
        eng.submit(ids, max_new_tokens=4, settings=GREEDY, stop_tokens=(-1,))
        for ids in idss
    ]
    # queue longer than slots
    assert len(eng.queue) == 5
    eng.run()
    for ids, req in zip(idss, reqs):
        assert req.state == "done"
        assert req.new_tokens == oracle_tokens(model, ids, 4)


def test_mid_flight_admission(model):
    """Admit a new request while others are mid-decode."""
    tok = FakeTokenizer()
    eng = ContinuousBatchingEngine(model, tok, max_slots=4)
    a = eng.submit(tok.encode("first")[0], max_new_tokens=10,
                   settings=GREEDY, stop_tokens=(-1,))
    for _ in range(3):
        eng.step()
    b = eng.submit(tok.encode("second, later")[0], max_new_tokens=5,
                   settings=GREEDY, stop_tokens=(-1,))
    eng.run()
    assert a.new_tokens == oracle_tokens(model, tok.encode("first")[0], 10)
    assert b.new_tokens == oracle_tokens(
        model, tok.encode("second, later")[0], 5
    )


def test_stop_token_frees_slot(model):
    tok = FakeTokenizer()
    eng = ContinuousBatchingEngine(model, tok, max_slots=2)
    ids = tok.encode("stop early")[0]
    want = oracle_tokens(model, ids, 8)
    stop = want[2]
    req = eng.submit(ids, max_new_tokens=8, settings=GREEDY,
                     stop_tokens=(stop,))
    eng.run()
    assert req.new_tokens == want[:3]  # includes the stop token
    assert len(eng.free) == 2


def test_streaming_callback(model):
    tok = FakeTokenizer()
    eng = ContinuousBatchingEngine(model, tok, max_slots=2)
    seen = []
    eng.submit(tok.encode("cb")[0], max_new_tokens=4, settings=GREEDY,
               stop_tokens=(-1,), on_token=lambda r, t: seen.append(t))
    eng.run()
    assert len(seen) == 4
