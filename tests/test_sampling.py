"""Sampler semantics tests against hand-computed oracles that replicate the
reference's loops (generator.py:91-170, cpu_func/rep_penalty.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exllama_tpu.ops.sampling import (
    SamplerSettings,
    apply_rep_penalty,
    greedy,
    rep_penalty_mask,
    sample,
)


def ref_rep_mask(sequence, seq_len, vocab, penalty, sustain, decay):
    """Direct transcription of the reference C++ loop as the oracle."""
    mask = np.ones(vocab, np.float32)
    v = penalty
    dv = (1.0 - penalty) / decay if decay else 0.0
    s = seq_len if sustain == -1 else sustain
    beg = max(seq_len - s - decay, 0)
    i = seq_len
    while i > beg:
        i -= 1
        t = sequence[i]
        if v > mask[t]:
            mask[t] = v
        s -= 1
        if s < 0:
            v += dv
    return np.maximum(mask, 1.0)


@pytest.mark.parametrize("sustain,decay", [(4, 4), (2, 0), (-1, 4)])
def test_rep_penalty_mask_matches_reference_loop(sustain, decay):
    rng = np.random.default_rng(0)
    vocab, s_max, seq_len = 32, 24, 17
    seq = rng.integers(0, vocab, size=(1, s_max)).astype(np.int32)
    got = np.asarray(
        rep_penalty_mask(
            jnp.asarray(seq), jnp.int32(seq_len), vocab, 1.25, sustain, decay
        )
    )[0]
    want = ref_rep_mask(seq[0], seq_len, vocab, 1.25, sustain, decay)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_apply_rep_penalty_sign_semantics():
    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    seq = jnp.asarray([[0, 1]], dtype=jnp.int32)
    out = np.asarray(
        apply_rep_penalty(logits, seq, jnp.int32(2), 2.0, 256, 128)
    )[0]
    assert out[0] == pytest.approx(1.0)    # positive: divided
    assert out[1] == pytest.approx(-4.0)   # negative: multiplied
    assert out[2] == pytest.approx(1.0)    # untouched


def test_penalty_one_is_neutral():
    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    seq = jnp.asarray([[0, 1]], dtype=jnp.int32)
    out = np.asarray(
        apply_rep_penalty(logits, seq, jnp.int32(2), 1.0, 256, 128)
    )
    np.testing.assert_allclose(out, np.asarray(logits), rtol=1e-6)


def test_greedy_and_topk1_agree():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(3, 64)).astype(np.float32))
    s = SamplerSettings(temperature=1.0, top_k=1, top_p=0.0)
    toks, _ = sample(logits, jax.random.PRNGKey(0), s)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(greedy(logits)))


def _sample_many(logits, settings, n=64):
    fn = jax.jit(lambda lg, k: sample(lg, k, settings)[0])
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    return {int(fn(logits, k)[0]) for k in keys}


def test_top_p_cutoff():
    # probs [0.5, 0.3, 0.2]: top_p=0.6 keeps only the top token (inclusive
    # cumsum 0.8 > 0.6 at index 1); top_p=0.9 keeps two.
    p = np.array([0.5, 0.3, 0.2])
    logits = jnp.asarray(np.log(p)[None, :].astype(np.float32))
    assert _sample_many(logits, SamplerSettings(temperature=1.0, top_k=0, top_p=0.6)) == {0}
    assert _sample_many(logits, SamplerSettings(temperature=1.0, top_k=0, top_p=0.9)) == {0, 1}


def test_min_p_embedded_in_top_p():
    # min_p=0.25 excludes the 0.2 token even when top_p would include it
    p = np.array([0.5, 0.3, 0.2])
    logits = jnp.asarray(np.log(p)[None, :].astype(np.float32))
    s = SamplerSettings(temperature=1.0, top_k=0, top_p=1.01, min_p=0.25)
    assert _sample_many(logits, s) == {0, 1}


def test_typical_sampling_runs_and_filters():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(1, 32)).astype(np.float32) * 3)
    s = SamplerSettings(temperature=1.0, top_k=0, top_p=0.0, typical=0.4)
    assert len(_sample_many(logits, s, n=32)) < 32  # filtered something


def test_disallowed_tokens_never_sampled():
    logits = jnp.zeros((2, 16), jnp.float32)
    banned = np.zeros(16, bool)
    banned[:8] = True
    s = SamplerSettings(temperature=1.0, top_k=0, top_p=0.0)
    fn = jax.jit(lambda lg, k: sample(lg, k, s, disallowed=jnp.asarray(banned))[0])
    for k in jax.random.split(jax.random.PRNGKey(0), 16):
        assert np.all(np.asarray(fn(logits, k)) >= 8)


def test_batch_rows_sample_independently():
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    s = SamplerSettings(temperature=1.0, top_k=0, top_p=0.0)
    t, _ = sample(logits, jax.random.PRNGKey(0), s)
    assert t.shape == (4,)


def test_rep_mask_windowed_matches_full():
    """The engine's windowed penalty mask (scatter over the last
    sustain+decay positions only) must equal the full-history mask —
    older tokens are outside the decay window by construction."""
    import jax.numpy as jnp
    import numpy as np

    from exllama_tpu.ops.sampling import rep_penalty_mask
    from exllama_tpu.serve.engine import _rep_mask_windowed

    rng = np.random.default_rng(3)
    s_max, vocab, b = 2048, 333, 4
    bufs = rng.integers(0, vocab, size=(b, s_max)).astype(np.int32)
    lens = np.asarray([5, 300, 1000, 2048], np.int32)
    pens = np.asarray([1.3, 1.0, 2.0, 1.15], np.float32)
    for sustain, decay in ((256, 128), (0, 64), (64, 0)):
        got = np.asarray(_rep_mask_windowed(
            jnp.asarray(bufs), jnp.asarray(lens), jnp.asarray(pens),
            vocab, sustain, decay,
        ))
        ref = np.stack([
            np.asarray(rep_penalty_mask(
                jnp.asarray(bufs[i:i + 1]), jnp.int32(lens[i]), vocab,
                jnp.float32(pens[i]), sustain, decay,
            ))[0]
            for i in range(b)
        ])
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
