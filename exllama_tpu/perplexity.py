"""Perplexity evaluation.

Re-design of the reference's ``Perplexity`` (perplexity.py): load a dataset
as jsonl (one chunk per line) or raw text (fixed windows with overlap),
compute ppl = exp(−mean log p(target)) over chunks via full-context logits.
The log-softmax + gather runs on device in fp32; chunks stream through the
model with the cache reset per chunk (matching the reference's methodology
so numbers are comparable, perplexity.py:92-138).

The ``gptq-for-llama`` preset replicates that project's methodology
(128 × 2048-token raw-text windows, perplexity.py:160-166).
"""

from __future__ import annotations

import json
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from exllama_tpu.cache import ExLlamaCache


@jax.jit
def _chunk_logprob(logits: jax.Array, targets: jax.Array):
    """Sum of log p(target) and count over one chunk.

    logits [1, T, V] fp32 predicting tokens 1..T; targets [1, T]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.sum(tgt), targets.size


class Perplexity:
    def __init__(self, model, cache: Optional[ExLlamaCache] = None,
                 tokenizer=None):
        self.model = model
        self.cache = cache or ExLlamaCache(model)
        self.tokenizer = tokenizer
        self.dataset_chunks: list[np.ndarray] = []

    # ---------------------------------------------------------------- data

    def load(
        self,
        dataset_path: str,
        chunk_size: int = 2048,
        chunk_truncate: Optional[int] = None,
        overlap: int = 0,
        minlength: int = 50,
        json_key: str = "text",
    ):
        """jsonl → one chunk per line; raw text → fixed windows + overlap
        (reference perplexity.py:55-89)."""
        self.dataset_chunks = []
        if dataset_path.endswith(".jsonl") or dataset_path.endswith(".json"):
            with open(dataset_path, encoding="utf-8") as f:
                for line in f:
                    text = json.loads(line)[json_key]
                    if len(text) < minlength:
                        continue
                    ids = self.tokenizer.encode(text)
                    if chunk_truncate is not None:
                        ids = ids[:, :chunk_truncate]
                    if ids.shape[1] >= 2:
                        self.dataset_chunks.append(np.asarray(ids, np.int32))
        else:
            with open(dataset_path, encoding="utf-8") as f:
                text = f.read()
            ids = self.tokenizer.encode(text)[0]
            step = chunk_size - overlap
            for start in range(0, len(ids) - chunk_size, step):
                chunk = ids[start : start + chunk_size][None, :]
                if chunk_truncate is not None:
                    chunk = chunk[:, :chunk_truncate]
                self.dataset_chunks.append(np.asarray(chunk, np.int32))

    # ---------------------------------------------------------------- eval

    def test(
        self,
        chunk_limit: Optional[int] = None,
        lora=None,
        ppl_token: bool = False,
        silent: bool = False,
    ) -> float:
        """Perplexity over loaded chunks. ``ppl_token`` forces token-by-token
        decode-path evaluation (the reference's kernel cross-check mode,
        test_benchmark_inference.py:239-246)."""
        logprob_sum = 0.0
        token_count = 0
        chunks = self.dataset_chunks
        if chunk_limit is not None:
            chunks = chunks[:chunk_limit]
        for idx, ids in enumerate(chunks):
            ids = ids[:, : self.model.config.max_seq_len]
            self.cache.current_seq_len = 0
            if ppl_token:
                # decode path: feed one token at a time
                lps = []
                for t in range(ids.shape[1] - 1):
                    logits = self.model.forward(
                        ids[:, t : t + 1], self.cache, lora=lora
                    )
                    lp, _ = _chunk_logprob(logits, ids[:, t + 1 : t + 2])
                    lps.append(lp)
                logprob_sum += float(jnp.sum(jnp.stack(lps)))
                token_count += ids.shape[1] - 1
            else:
                logits = self.model.forward(
                    ids[:, :-1], self.cache, last_id_only=False, lora=lora
                )
                lp, n = _chunk_logprob(logits, ids[:, 1:])
                logprob_sum += float(lp)
                token_count += int(n)
            if not silent:
                print(".", end="", flush=True)
        if not silent:
            print()
        return math.exp(-logprob_sum / max(token_count, 1))
