"""Speculative decoding: draft-and-verify over the standard model API.

No reference counterpart (turboderp/exllama decodes strictly one token per
forward); this is the natural TPU extension: decode is HBM-bandwidth-bound
(one token streams all 3.5 GB of weights), so verifying k+1 drafted tokens
in ONE forward costs nearly the same HBM traffic as one token — accepted
drafts are almost-free tokens/s.

Two proposers:

  * :class:`NgramProposer` — prompt-lookup decoding: match the trailing
    n-gram of the sequence against its own history and propose the tokens
    that followed last time. No second model, no extra memory; wins on
    repetitive/structured text (code, JSON, quotes, chat).
  * :class:`DraftModelProposer` — a smaller ExLlama (e.g. a 3B drafting for
    a 33B) runs k single-token steps; its KV cache is kept in sync with the
    committed sequence via rewind.

Verification uses exact-match acceptance: at every drafted position a token
is sampled from the TARGET distribution (same sampler settings as normal
decoding); the draft survives while it equals that sample. Emitted tokens
are therefore always target-distribution samples — the scheme changes
throughput, never the output distribution (greedy decoding accepts while
the draft equals the argmax).

KV bookkeeping: a verify forward appends k+1 cache rows; on partial
acceptance the cursor rewinds to the committed length. Stale rows beyond
the cursor are dead — causal masking ignores them and the next forward
overwrites them (same invariant the generator's gen_rewind relies on,
reference generator.py:254-260).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from exllama_tpu.ops.sampling import SamplerSettings, _sample_row


@functools.partial(jax.jit, static_argnums=())
def _sample_grid(
    logits: jax.Array,     # [P, V] f32 (padded to a fixed P)
    keys: jax.Array,       # [P, 2] u32
    temperature: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array,
    min_p: jax.Array,
    typical: jax.Array,
) -> jax.Array:
    """One jit, compiled once per padded P: sample a token per position."""
    toks, _ = jax.vmap(
        lambda row, k: _sample_row(
            row, k, temperature, top_k, top_p, min_p, typical
        )
    )(logits, keys)
    return toks


class NgramProposer:
    """Prompt-lookup proposer: longest trailing n-gram match in history."""

    def __init__(self, max_ngram: int = 3, min_ngram: int = 1,
                 max_draft: int = 8):
        self.max_ngram = max_ngram
        self.min_ngram = min_ngram
        self.max_draft = max_draft

    def propose(self, seq: np.ndarray, k: int) -> np.ndarray:
        """seq: [T] committed tokens → up to min(k, max_draft) draft tokens.

        Vectorized n-gram lookup: a python scan over all window starts was
        O(T·n) per call and dominated engine spec-mode steps (~20 ms/slot
        at T≈1000); the sliding-window comparison is one numpy pass.
        """
        k = min(k, self.max_draft)
        seq = np.asarray(seq)
        t = len(seq)
        for n in range(min(self.max_ngram, t - 1), self.min_ngram - 1, -1):
            tail = seq[t - n :]
            # most recent earlier occurrence of the trailing n-gram
            wins = np.lib.stride_tricks.sliding_window_view(seq[:-1], n)
            hits = np.nonzero((wins == tail).all(axis=1))[0]
            for start in hits[::-1]:
                follow = seq[start + n : start + n + k]
                if len(follow):
                    return np.asarray(follow, np.int32)
                break
        return np.zeros((0,), np.int32)

    # lifecycle hooks (no state)
    def begin(self, seq: np.ndarray) -> None: ...
    def commit(self, seq: np.ndarray) -> None: ...


class DraftModelProposer:
    """Small-model proposer; greedy-drafts k tokens with its own cache."""

    def __init__(self, draft_model, max_draft: int = 8):
        from exllama_tpu.cache import ExLlamaCache

        self.model = draft_model
        self.cache = ExLlamaCache(draft_model)
        self.max_draft = max_draft
        self._len = 0  # committed tokens reflected in the draft cache

    def begin(self, seq: np.ndarray) -> None:
        self.cache.current_seq_len = 0
        self._len = len(seq)
        if len(seq) > 1:
            self.model.forward(
                seq[None, :-1].astype(np.int32), self.cache,
                preprocess_only=True,
            )

    def commit(self, seq: np.ndarray) -> None:
        """Advance the draft cache over newly committed tokens (the drafted
        prefix is usually already cached; rewind covers mispredictions)."""
        keep = min(self.cache.current_seq_len, len(seq) - 1)
        self.cache.current_seq_len = keep
        if len(seq) - 1 > keep:
            self.model.forward(
                seq[None, keep:-1].astype(np.int32), self.cache,
                preprocess_only=True,
            )
        self._len = len(seq)

    def propose(self, seq: np.ndarray, k: int) -> np.ndarray:
        k = min(k, self.max_draft,
                self.model.config.max_seq_len - len(seq) - 1)
        out = []
        tok = np.asarray([[seq[-1]]], np.int32)
        for _ in range(max(k, 0)):
            logits = self.model.forward(tok, self.cache)
            tok = np.asarray(
                jnp.argmax(logits[:, -1, :], axis=-1), np.int32
            )[:, None]
            out.append(int(tok[0, 0]))
        # rewind the drafted rows; commit() re-syncs after acceptance
        self.cache.current_seq_len -= len(out)
        return np.asarray(out, np.int32)


class SpeculativeGenerator:
    """Single-stream generator with draft-and-verify decoding.

    API mirrors ExLlamaGenerator.generate_simple; `stats` reports drafted /
    accepted counts and forwards used.
    """

    def __init__(self, model, tokenizer, cache, proposer, seed: int = 0):
        self.model = model
        self.tokenizer = tokenizer
        self.cache = cache
        self.proposer = proposer
        self.settings = SamplerSettings()
        self.key = jax.random.PRNGKey(seed)
        self.lookahead = 8
        self.stats = {"drafted": 0, "accepted": 0, "forwards": 0,
                      "tokens": 0}

    # ----------------------------------------------------------- internals

    def _sample_positions(self, logits: np.ndarray) -> np.ndarray:
        """Sample one token per position from [T, V] target logits.

        Pads T to a fixed lookahead+1 so `_sample_grid` compiles exactly
        once per vocab size (T varies per verify step; an eager vmap here
        used to dispatch thousands of tiny one-shape executables).
        """
        s = self.settings
        t = logits.shape[0]
        p = max(self.lookahead + 1, t)
        lg = np.asarray(logits, np.float32)
        if t < p:
            lg = np.concatenate([lg, np.broadcast_to(lg[:1], (p - t,) + lg.shape[1:])])
        self.key, sub = jax.random.split(self.key)
        keys = jax.random.split(sub, p)
        toks = _sample_grid(
            jnp.asarray(lg), keys,
            jnp.float32(s.temperature), jnp.int32(s.top_k),
            jnp.float32(s.top_p), jnp.float32(s.min_p),
            jnp.float32(s.typical),
        )
        return np.asarray(toks, np.int32)[:t]

    def generate_tokens(self, ids: np.ndarray, max_new_tokens: int,
                        stop_tokens=()) -> np.ndarray:
        """ids: [T] prompt → [T+new] sequence (greedy/sampled per settings)."""
        seq = np.asarray(ids, np.int32).reshape(-1)
        cfg = self.model.config
        self.cache.current_seq_len = 0
        if len(seq) > 1:
            self.model.forward(
                seq[None, :-1], self.cache, preprocess_only=True
            )
        self.proposer.begin(seq)
        stop = set(int(t) for t in stop_tokens)

        produced = 0
        while produced < max_new_tokens and len(seq) < cfg.max_seq_len - 1:
            budget = min(
                self.lookahead,
                max_new_tokens - produced - 1,
                cfg.max_seq_len - 1 - len(seq),
            )
            draft = self.proposer.propose(seq, max(budget, 0))
            k = len(draft)
            ids_step = np.concatenate([seq[-1:], draft])[None, :]  # [1, k+1]
            logits = self.model.forward(
                ids_step, self.cache, last_id_only=False
            )
            self.stats["forwards"] += 1
            self.stats["drafted"] += k
            lg = np.asarray(logits[0], np.float32)          # [k+1, V]
            samples = self._sample_positions(lg)            # [k+1]

            accepted = 0
            new_tokens = []
            for i in range(k):
                if samples[i] == draft[i]:
                    accepted += 1
                    new_tokens.append(int(draft[i]))
                    if int(draft[i]) in stop:
                        break
                else:
                    break
            hit_stop = bool(new_tokens) and new_tokens[-1] in stop
            if not hit_stop:
                # bonus token when everything matched, else the target's
                # correction at the first mismatch
                new_tokens.append(int(samples[accepted]))
            self.stats["accepted"] += accepted

            seq = np.concatenate([seq, np.asarray(new_tokens, np.int32)])
            # rewind the k+1 freshly written cache rows down to the
            # committed length (rows past the cursor are dead, see module
            # docstring)
            self.cache.current_seq_len = len(seq) - 1
            produced += len(new_tokens)
            self.stats["tokens"] += len(new_tokens)
            self.proposer.commit(seq)
            if new_tokens and new_tokens[-1] in stop:
                break
        return seq

    def generate_simple(self, prompt: str, max_new_tokens: int = 128) -> str:
        ids = np.asarray(
            self.tokenizer.encode(prompt), np.int32
        ).reshape(-1)
        eos = getattr(self.tokenizer, "eos_token_id", None)
        stop = (eos,) if eos is not None else ()
        seq = self.generate_tokens(ids, max_new_tokens, stop_tokens=stop)
        return self.tokenizer.decode(seq)  # [T] → str

    @property
    def acceptance_rate(self) -> float:
        d = self.stats["drafted"]
        return self.stats["accepted"] / d if d else 0.0
