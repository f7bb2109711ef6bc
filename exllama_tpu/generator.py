"""Stateful generator: sampling loop, cache management, constrained decoding.

Re-design of the reference's ``ExLlamaGenerator`` (generator.py). Host-side
state management (sequence bookkeeping, prefix reuse, rewind/prune) mirrors
the reference exactly; the compute differs TPU-style:

  * sampling runs on device inside jit (ops/sampling.py) — the reference
    round-trips fp32 logits to a CPU extension per token
    (generator.py:333-339);
  * the token history for repetition penalty lives in a fixed-size device
    buffer [B, max_seq_len] updated functionally, so the per-token sampling
    step compiles once regardless of sequence length;
  * randomness is an explicit jax PRNG key (seedable, reproducible).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from exllama_tpu.ops.sampling import SamplerSettings, apply_rep_penalty, sample


@functools.partial(
    jax.jit, static_argnames=("sustain", "decay", "top_k_static")
)
def _sample_step(
    logits,          # [B, 1, V] f32 (model output)
    seq_buf,         # [B, S_max] int32 device token history
    seq_len,         # scalar int32
    key,
    temperature,
    top_k,
    top_p,
    min_p,
    typical,
    penalty_max,
    bos_token_id,
    logit_bias,      # [V] f32 additive (constraints / disallow), or zeros
    *,
    sustain: int,
    decay: int,
    top_k_static: int = -1,  # unused; kept for future specialization
):
    lg = logits[:, -1, :].astype(jnp.float32)
    lg = apply_rep_penalty(lg, seq_buf, seq_len, penalty_max, sustain, decay)
    # ban BOS like the reference (generator.py:352)
    lg = lg.at[:, bos_token_id].add(-10000.0)
    lg = lg + logit_bias[None, :]

    b, v = lg.shape
    keys = jax.random.split(key, b)
    from exllama_tpu.ops.sampling import _sample_row

    tokens, probs = jax.vmap(
        lambda row, k: _sample_row(
            row, k, temperature, top_k, top_p, min_p, typical
        )
    )(lg, keys)
    seq_buf = jax.lax.dynamic_update_slice(
        seq_buf, tokens[:, None], (jnp.int32(0), seq_len)
    )
    return tokens, probs, seq_buf


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "attend_len", "heads", "kv_heads", "head_dim", "eps",
        "matmul_impl", "attn_impl", "sustain", "decay",
        "mlp_fuse", "attn_fuse", "qkv_fuse", "mesh",
    ),
    donate_argnames=("kv",),
)
def _decode_loop_n(
    params, kv, seq_buf, tok, past, key,
    temperature, top_k, top_p, min_p, typical, penalty_max,
    bos_token_id, logit_bias, lora,
    *,
    n: int, attend_len: int, heads: int, kv_heads: int, head_dim: int,
    eps: float, matmul_impl: str, attn_impl: str,
    sustain: int, decay: int,
    mlp_fuse: bool = True, attn_fuse: bool = True, qkv_fuse: bool = False,
    mesh=None,
):
    """n chained (forward → rep-penalty → sample) steps in ONE dispatch.

    The reference's sampling loop round-trips to the host every token
    (generator.py:344-382) — microseconds on PCIe, a full RPC on remote
    TPU hosts, and a dispatch either way. Chaining the steps under one
    jit removes all of it; the host only sees the n sampled tokens."""
    from exllama_tpu.models.llama import forward_chunk

    b = tok.shape[0]
    out = jnp.zeros((n, b), jnp.int32)

    def body(i, carry):
        kv, seq_buf, tok, pos, key, out = carry
        logits, kv = forward_chunk(
            params, kv, tok, pos, None, lora,
            attend_len=attend_len, last_token_only=True,
            preprocess_only=False, heads=heads, kv_heads=kv_heads,
            head_dim=head_dim, eps=eps, matmul_impl=matmul_impl,
            attn_impl=attn_impl, mlp_fuse=mlp_fuse, attn_fuse=attn_fuse,
            qkv_fuse=qkv_fuse, mesh=mesh,
        )
        key, sub = jax.random.split(key)
        tokens, _, seq_buf = _sample_step(
            logits.astype(jnp.float32), seq_buf, pos + 1, sub,
            temperature, top_k, top_p, min_p, typical, penalty_max,
            bos_token_id, logit_bias, sustain=sustain, decay=decay,
        )
        out = out.at[i].set(tokens)
        return kv, seq_buf, tokens[:, None], pos + 1, key, out

    kv, seq_buf, tok, pos, key, out = jax.lax.fori_loop(
        0, n, body,
        (kv, seq_buf, tok, jnp.int32(past), key, out),
    )
    return out, kv, seq_buf


@functools.partial(
    jax.jit,
    static_argnames=("n_out", "sustain", "decay"),
)
def _beam_init_filter(
    logits,        # [1, 1, V] f32
    hist,          # [1, S_max] int32
    hist_len,      # scalar int32
    bias,          # [V] f32 (BOS ban / disallow)
    key,
    temperature, top_k, top_p, min_p, typical, penalty_max,
    *,
    n_out: int,
    sustain: int,
    decay: int,
):
    """Initial beam expansion on device: filtered distribution → gumbel
    top-k (multinomial without replacement). Returns (tokens [n_out],
    lps [n_out], valid [n_out])."""
    from exllama_tpu.ops.sampling import filter_probs

    lg = logits[:, -1, :].astype(jnp.float32) + bias[None, :]
    lg = apply_rep_penalty(lg, hist, hist_len, penalty_max, sustain, decay)
    probs = filter_probs(lg, temperature, top_k, top_p, min_p, typical)[0]
    g = jax.random.gumbel(key, probs.shape)
    scores = jnp.where(probs > 0, jnp.log(probs + 1e-30) + g, -jnp.inf)
    _, toks = jax.lax.top_k(scores, n_out)
    p = probs[toks]
    return toks.astype(jnp.int32), jnp.log(p + 1e-30), p > 0


@functools.partial(
    jax.jit,
    static_argnames=("attend_len", "heads", "kv_heads", "head_dim", "eps",
                     "matmul_impl", "n_out", "sustain", "decay",
                     "attn_impl", "mlp_fuse", "attn_fuse", "qkv_fuse"),
    donate_argnames=("kv",),
)
def _beam_step(
    params,
    kv,            # beam-cache KVCacheState, [n, ...] rows
    toks,          # [n, 1] int32 last beam tokens
    past,          # scalar int32
    lps,           # [n] f32 cumulative log-probs
    hist,          # [n, S_max] int32 committed + lookahead history
    hist_len,      # scalar int32
    bias,          # [V] f32
    temperature, top_k, top_p, min_p, typical, penalty_max,
    lora,
    *,
    attend_len: int,
    heads: int,
    kv_heads: int,
    head_dim: int,
    eps: float,
    matmul_impl: str,
    n_out: int,
    sustain: int,
    decay: int,
    attn_impl: str = "auto",
    mlp_fuse: bool = True,
    attn_fuse: bool = True,
    qkv_fuse: bool = False,
):
    """One beam-search lookahead step entirely on device: batched forward
    over all beams → rep penalty → sampler filtering → joint top-k over
    [n·V] candidates → gather of beam-cache rows by parent. The host
    fetches only (parents, tokens, lps) — 3·n_out scalars — instead of
    the [n, V] probability matrices of a host-side selection loop
    (reference forwards each beam separately and swaps per-beam caches,
    generator.py:386-691)."""
    from exllama_tpu.cache import _map_state
    from exllama_tpu.models.llama import forward_chunk
    from exllama_tpu.ops.sampling import filter_probs

    logits, kv = forward_chunk(
        params, kv, toks, past, None, lora,
        attend_len=attend_len, last_token_only=True, preprocess_only=False,
        heads=heads, kv_heads=kv_heads, head_dim=head_dim, eps=eps,
        matmul_impl=matmul_impl, attn_impl=attn_impl,
        mlp_fuse=mlp_fuse, attn_fuse=attn_fuse, qkv_fuse=qkv_fuse,
    )
    lg = logits[:, -1, :].astype(jnp.float32) + bias[None, :]
    lg = apply_rep_penalty(lg, hist, hist_len, penalty_max, sustain, decay)
    probs = filter_probs(lg, temperature, top_k, top_p, min_p, typical)
    v = probs.shape[1]
    cand = jnp.where(
        probs > 0, lps[:, None] + jnp.log(probs + 1e-30), -jnp.inf
    )
    scores, top = jax.lax.top_k(cand.reshape(-1), n_out)
    parents = (top // v).astype(jnp.int32)
    tokens = (top % v).astype(jnp.int32)
    kv = _map_state(lambda x: jnp.take(x, parents, axis=0), kv)
    return kv, parents, tokens, scores


class ExLlamaGenerator:
    """API mirror of the reference generator (generator.py:7-715)."""

    Settings = SamplerSettings

    def __init__(self, model, tokenizer, cache, seed: int = 0):
        self.model = model
        self.tokenizer = tokenizer
        self.cache = cache
        self.lora = None
        self.disallowed_tokens: Optional[list[int]] = None
        self.key = jax.random.PRNGKey(seed)
        self.in_beam_search = False
        self.beams = None
        self.reset()

    def reset(self):
        self.cache.current_seq_len = 0
        self.sequence: Optional[np.ndarray] = None          # [B, cur]
        self.sequence_actual: Optional[np.ndarray] = None
        self.settings = SamplerSettings()
        self._seq_buf = jnp.zeros(
            (self.cache.batch_size, self.cache.max_seq_len), jnp.int32
        )
        self._mask = None
        self._beam_cache = None
        self._beam_seqs: Optional[np.ndarray] = None
        self._beam_lps: Optional[np.ndarray] = None
        self._beam_prefix = 0

    # ------------------------------------------------------------------ rng

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # ------------------------------------------------------- cache plumbing

    def _sync_seq_buf(self):
        """Rewrite the device history buffer from the host sequence."""
        buf = np.zeros(
            (self.cache.batch_size, self.cache.max_seq_len), np.int32
        )
        if self.sequence is not None and self.sequence.shape[1] > 0:
            n = min(self.sequence.shape[1], self.cache.max_seq_len)
            buf[:, :n] = self.sequence[:, :n]
        self._seq_buf = jnp.asarray(buf)

    def gen_begin(self, in_tokens, mask=None):
        """Reset and prefill all but the last token (generator.py:177-186)."""
        self.end_beam_search()
        in_tokens = np.asarray(in_tokens, dtype=np.int32)
        self.sequence = in_tokens.copy()
        self.sequence_actual = in_tokens.copy()
        self.cache.current_seq_len = 0
        self._mask = None if mask is None else jnp.asarray(mask)
        self._sync_seq_buf()
        if in_tokens.shape[1] > 1:
            self.model.forward(
                in_tokens[:, :-1],
                self.cache,
                preprocess_only=True,
                lora=self.lora,
                input_mask=self._mask,
            )

    def gen_begin_empty(self):
        self.end_beam_search()
        self.sequence = None
        self.sequence_actual = None
        self.cache.current_seq_len = 0

    def gen_begin_reuse(self, in_tokens, mask=None) -> int:
        """Longest-common-prefix KV reuse (generator.py:197-222)."""
        self.end_beam_search()
        in_tokens = np.asarray(in_tokens, dtype=np.int32)
        if self.sequence is None or self.cache.current_seq_len == 0:
            self.gen_begin(in_tokens, mask=mask)
            return 0

        reuse = 0
        limit = min(self.sequence.shape[1], in_tokens.shape[1])
        while reuse < limit and self.sequence[0, reuse] == in_tokens[0, reuse]:
            reuse += 1
        if reuse < 2:
            self.gen_begin(in_tokens, mask=mask)
            return 0

        self.cache.current_seq_len = reuse - 1
        self.sequence = self.sequence[:, :reuse]
        self.sequence_actual = self.sequence.copy()
        self._mask = None if mask is None else jnp.asarray(mask)
        self._sync_seq_buf()
        if reuse < in_tokens.shape[1]:
            self.gen_feed_tokens(in_tokens[:, reuse:], mask=mask)
        return reuse

    def gen_feed_tokens(self, in_tokens, mask=None):
        """Append + prefill, leaving the final token unforwarded
        (generator.py:225-243)."""
        if self.sequence is None:
            self.gen_begin(in_tokens, mask=mask)
            return
        self.end_beam_search()
        in_tokens = np.asarray(in_tokens, dtype=np.int32)
        start = self.sequence.shape[1] - 1
        self.sequence = np.concatenate([self.sequence, in_tokens], axis=1)
        if mask is not None:
            self._mask = jnp.asarray(mask)
        if start < self.sequence.shape[1] - 1:
            self.model.forward(
                self.sequence[:, start:-1],
                self.cache,
                preprocess_only=True,
                lora=self.lora,
                input_mask=self._mask,
            )
        self.sequence_actual = self.sequence
        self._sync_seq_buf()

    def gen_accept_token(self, token: np.ndarray):
        self.end_beam_search()
        token = np.asarray(token, dtype=np.int32).reshape(
            -1, 1
        )
        if self.sequence is None:
            self.sequence = token.copy()
        else:
            self.sequence = np.concatenate([self.sequence, token], axis=1)
        self.sequence_actual = self.sequence

    def gen_rewind(self, num_tokens: int):
        if num_tokens == 0:
            return
        self.end_beam_search()
        self.sequence = self.sequence[:, :-num_tokens]
        self.cache.current_seq_len -= num_tokens
        self.sequence_actual = self.sequence
        self._sync_seq_buf()

    def gen_prune_right(self, tokens: int, mask=None):
        self.end_beam_search()
        if tokens > self.sequence.shape[1] - 1:
            return
        self.gen_begin(self.sequence[:, tokens:], mask=mask)
        self.sequence_actual = self.sequence

    def gen_prune_left(self, num_tokens: int, mask=None):
        num_tokens = min(num_tokens, self.sequence_actual.shape[1] - 1)
        self.end_beam_search()
        self.sequence = self.sequence[:, num_tokens:]
        self.gen_begin(self.sequence, mask=mask)

    def gen_prune_to(self, min_tokens_to_keep: int, token_id: int, mask=None):
        """Drop leading history up to occurrences of ``token_id`` until under
        budget (generator.py:271-287)."""
        self.end_beam_search()
        if self.gen_num_tokens() <= min_tokens_to_keep:
            return
        while self.gen_num_tokens() > min_tokens_to_keep:
            pruned = False
            for i in range(self.sequence.shape[1] - 1):
                if self.sequence[0, i] == token_id:
                    self.sequence = self.sequence[:, i + 1 :]
                    pruned = True
                    break
            if not pruned:
                break
        self.gen_begin(self.sequence, mask=mask)

    def gen_num_tokens(self) -> int:
        return self.sequence_actual.shape[1]

    def disallow_tokens(self, tokens):
        self.disallowed_tokens = tokens

    # ------------------------------------------------------------- sampling

    def _logit_bias(self, constraints=None) -> jnp.ndarray:
        v = self.model.config.vocab_size
        bias = np.zeros((v,), np.float32)
        if self.disallowed_tokens:
            bias[np.asarray(self.disallowed_tokens)] = -np.inf
        if constraints is not None:
            # reference: +10000 on allowed, -10000 on all (generator.py:357-366)
            bias -= 10000.0
            bias[np.asarray(constraints)] += 10000.0
        return jnp.asarray(bias)

    def gen_single_token(self, constraints=None, mask=None):
        """Forward last token → rep penalty → sample → accept
        (generator.py:344-382). Returns np [B, 1] tokens."""
        self.end_beam_search()
        if self.sequence is None:
            if constraints is not None:
                token = np.array([[int(constraints[0])]], np.int32)
            else:
                token = np.array(
                    [[self.tokenizer.bos_token_id]], np.int32
                )
            self.gen_accept_token(token)
            return token

        logits = self.model.forward(
            self.sequence[:, -1:],
            self.cache,
            lora=self.lora,
            input_mask=self._mask if mask is None else jnp.asarray(mask),
        )
        s = self.settings
        min_p = s.min_p + 0.01 if constraints is not None else s.min_p
        tokens, _, self._seq_buf = _sample_step(
            logits,
            self._seq_buf,
            jnp.int32(self.sequence.shape[1]),
            self._next_key(),
            jnp.float32(s.temperature),
            jnp.int32(s.top_k),
            jnp.float32(s.top_p),
            jnp.float32(min_p),
            jnp.float32(s.typical),
            jnp.float32(s.token_repetition_penalty_max),
            jnp.int32(self.tokenizer.bos_token_id),
            self._logit_bias(constraints),
            sustain=s.token_repetition_penalty_sustain,
            decay=s.token_repetition_penalty_decay,
        )
        token = np.asarray(tokens).reshape(-1, 1)
        self.gen_accept_token(token)
        return token

    # ---------------------------------------------------------- simple loop

    def gen_tokens(self, n: int) -> np.ndarray:
        """n sampled tokens in ONE device dispatch (`_decode_loop_n`):
        forward, repetition penalty, the full sampler stack, and the
        history-buffer update all chained on device. Semantically n
        `gen_single_token()` calls without constraints/mask overrides.
        Returns np [B, n]; sequence and cache advance by n."""
        self.end_beam_search()
        assert self.sequence is not None and self.sequence.shape[1] > 0
        cfg = self.model.config
        s = self.settings
        past = self.cache.current_seq_len
        assert past + n <= cfg.max_seq_len, (past, n)
        out, kv, self._seq_buf = _decode_loop_n(
            self.model.params, self.cache.state, self._seq_buf,
            jnp.asarray(self.sequence[:, -1:]), jnp.int32(past),
            self._next_key(),
            jnp.float32(s.temperature), jnp.int32(s.top_k),
            jnp.float32(s.top_p), jnp.float32(s.min_p),
            jnp.float32(s.typical),
            jnp.float32(s.token_repetition_penalty_max),
            jnp.int32(self.tokenizer.bos_token_id),
            self._logit_bias(None),
            self.lora.stacked if self.lora is not None else None,
            n=n,
            attend_len=self.model._attend_len(past + n + 1),
            heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim,
            eps=cfg.rms_norm_eps,
            matmul_impl=self.model._matmul_impl(),
            attn_impl=self.model._attn_impl(),
            sustain=s.token_repetition_penalty_sustain,
            decay=s.token_repetition_penalty_decay,
            mlp_fuse=cfg.tuning.fuse_mlp,
            attn_fuse=cfg.tuning.fuse_attn,
            qkv_fuse=cfg.tuning.fuse_qkv,
            mesh=self.model.mesh,
        )
        self.cache.state = kv
        self.cache.current_seq_len = past + n
        toks = np.asarray(out).T.astype(np.int32)     # [B, n]
        self.sequence = np.concatenate([self.sequence, toks], axis=1)
        self.sequence_actual = self.sequence
        return toks

    def generate_simple(self, prompt, max_new_tokens: int = 128,
                        loop_chunk: int = 16):
        """Encode → prefill → sample loop with per-row EOS tracking →
        decode (generator.py:311-328). Decodes ``loop_chunk`` tokens per
        device dispatch (gen_tokens); EOS is checked between chunks and
        overshoot past the all-rows-EOS point is rewound, so the result
        matches the reference's per-token loop. Left-padded batches (which
        need the attention input mask) keep the per-token path."""
        self.end_beam_search()
        ids, mask = self.tokenizer.encode(
            prompt,
            return_mask=True,
            max_seq_len=self.model.config.max_seq_len,
        )
        # pad mask out to max_seq_len for the attention input_mask
        full_mask = np.zeros(
            (ids.shape[0], self.model.config.max_seq_len), bool
        )
        full_mask[:, : ids.shape[1]] = mask
        self.gen_begin(ids, mask=full_mask if not mask.all() else None)

        max_new_tokens = min(
            max_new_tokens, self.model.config.max_seq_len - ids.shape[1]
        )
        eos = np.zeros((ids.shape[0],), bool)
        eos_id = self.tokenizer.eos_token_id
        if self._mask is None and loop_chunk > 1:
            done = 0
            while done < max_new_tokens:
                k = min(loop_chunk, max_new_tokens - done)
                toks = self.gen_tokens(k)             # [B, k]
                done += k
                # earliest chunk position after which every row has EOS
                seen = eos[:, None] | np.cumsum(
                    toks == eos_id, axis=1
                ).astype(bool)
                allpos = np.nonzero(seen.all(axis=0))[0]
                if allpos.size:
                    self.gen_rewind(k - (int(allpos[0]) + 1))
                    break
                eos = seen[:, -1]
        else:
            for _ in range(max_new_tokens):
                token = self.gen_single_token()
                eos |= token[:, 0] == eos_id
                if eos.all():
                    break
        text = self.tokenizer.decode(
            self.sequence[0] if self.sequence.shape[0] == 1 else self.sequence
        )
        return text

    # --------------------------------------------- classifier-free guidance

    def sample_current(self, logits_row, num=1):
        """Sample from an externally-mixed logits row [V] with the current
        settings (reference generator.sample_current used by example_cfg)."""
        from exllama_tpu.ops.sampling import _filter_row

        s = self.settings
        sp = _filter_row(
            jnp.asarray(logits_row, jnp.float32),
            jnp.float32(s.temperature),
            jnp.int32(s.top_k),
            jnp.float32(s.top_p),
            jnp.float32(s.min_p),
            jnp.float32(s.typical),
        )
        choice = jax.random.categorical(
            self._next_key(), jnp.log(sp + 1e-30)
        )
        return np.asarray(choice).reshape(1, 1), np.asarray(sp[choice])

    def generate_cfg(self, prompts: list, alpha: float,
                     max_new_tokens: int) -> str:
        """Classifier-free guidance decoding (reference example_cfg.py:60-82):
        batch of (conditional, unconditional) prompts; per step the two rows'
        log-softmaxes mix as (1-alpha)·cond + alpha·uncond; the sampled token
        is broadcast to both rows."""
        assert len(prompts) == 2, "CFG needs (positive, negative) prompts"
        from exllama_tpu.ops.sampling import apply_rep_penalty

        ids, mask = self.tokenizer.encode(
            prompts, return_mask=True,
            max_seq_len=self.model.config.max_seq_len,
        )
        full_mask = np.zeros(
            (2, self.model.config.max_seq_len), bool
        )
        full_mask[:, : ids.shape[1]] = mask
        self.gen_begin(ids, mask=full_mask)

        s = self.settings
        for _ in range(max_new_tokens):
            logits = self.model.forward(
                self.sequence[:, -1:], self.cache, lora=self.lora,
                input_mask=self._mask,
            )
            lg = logits[:, -1, :].astype(jnp.float32)
            lg = apply_rep_penalty(
                lg, self._seq_buf, jnp.int32(self.sequence.shape[1]),
                jnp.float32(s.token_repetition_penalty_max),
                s.token_repetition_penalty_sustain,
                s.token_repetition_penalty_decay,
            )
            lp = jax.nn.log_softmax(lg, axis=-1)
            mixed = (1.0 - alpha) * lp[0] + alpha * lp[1]
            token, _ = self.sample_current(mixed)
            if int(token[0, 0]) == self.tokenizer.eos_token_id:
                break
            self.gen_accept_token(np.repeat(token, 2, axis=0))
            self._sync_seq_buf()
        return self.tokenizer.decode(self.sequence[0])

    # ----------------------------------------------------------- beam search
    #
    # TPU re-design of the reference's beam search (generator.py:386-691).
    # The reference forwards each beam separately and swaps small per-beam KV
    # caches in and out of the main cache (Beam.to_sequence /
    # record_last_cache_column). Here beams ARE the batch dimension: one
    # batched forward per lookahead step evaluates every beam, and beam
    # reordering is a row gather on the beam cache. Semantics preserved:
    # `beams` hypotheses with `beam_length` lookahead; each beam_search()
    # call commits the first token of the best beam, prunes beams that don't
    # share it, and slides the window. Initial beams are a multinomial
    # draw without replacement from the filtered distribution; subsequent
    # expansion is top-(beams) over the union of per-beam filtered
    # candidates ranked by cumulative log-prob — exactly the reference's
    # selection rule.

    def begin_beam_search(self):
        self.beams = None
        if self.settings.beams == 1 and self.settings.beam_length == 1:
            return
        if self.model.mesh is not None:
            from exllama_tpu.parallel.mesh import mesh_axis_sizes

            if mesh_axis_sizes(self.model.mesh)[1] > 1:
                raise NotImplementedError(
                    "beam search over a tensor-parallel mesh is not "
                    "supported (per-beam cache gathers assume local KV)"
                )
        self.in_beam_search = True

    def _beam_bias(self):
        """[V] additive bias for beam scoring: BOS ban + disallowed tokens
        (same hard bans as the single-token path, reference
        generator.py:352, 101-102). Constant across a search, so the device
        array is cached — one upload per disallowed-set change, not one per
        lookahead step."""
        key = tuple(self.disallowed_tokens or ())
        cached = getattr(self, "_beam_bias_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        bias = np.zeros((self.model.config.vocab_size,), np.float32)
        bias[self.tokenizer.bos_token_id] -= 10000.0
        if self.disallowed_tokens:
            bias[np.asarray(self.disallowed_tokens)] = -np.inf
        dev = jnp.asarray(bias)
        self._beam_bias_cache = (key, dev)
        return dev

    def _beam_hist(self, n_rows):
        """Per-beam token history (committed + lookahead) for the
        repetition penalty; [n, S_max] int32 + scalar length."""
        hist = np.zeros((n_rows, self.cache.max_seq_len), np.int32)
        base = self.sequence[0]
        for i in range(n_rows):
            row = base
            if self._beam_seqs is not None:
                row = np.concatenate([base, self._beam_seqs[i]])
            m = min(len(row), self.cache.max_seq_len)
            hist[i, :m] = row[:m]
        hist_len = min(
            len(base)
            + (0 if self._beam_seqs is None else self._beam_seqs.shape[1]),
            self.cache.max_seq_len,
        )
        return hist, hist_len

    def beam_search(self):
        s = self.settings
        if s.beams == 1 and s.beam_length == 1:
            return self.gen_single_token()
        if self.sequence is None:
            return self.gen_single_token()
        assert self.in_beam_search
        from exllama_tpu.cache import ExLlamaCache, KVCacheState, _map_state

        n_beams = s.beams
        max_lookahead = min(
            self.model.config.max_seq_len - s.beam_length, s.beam_length
        )

        while self.beams is None or self._beam_seqs.shape[1] < max_lookahead:
            if self.beams is None:
                # Re-expansion: the main cache may be stale if previous
                # commits consumed a full lookahead window — sync it first.
                self._sync_main_cache_from_beams()

                # Initial expansion off the main cache.
                logits = self.model.forward(
                    self.sequence[:, -1:], self.cache, lora=self.lora,
                    input_mask=self._mask,
                )
                self._beam_prefix = self.sequence.shape[1]
                self._beam_seqs = None
                # device-side: filter + gumbel top-k (multinomial without
                # replacement); fetch only n_beams (token, lp, valid) rows
                hist, hist_len = self._beam_hist(1)
                toks_d, lps_d, valid_d = _beam_init_filter(
                    jnp.asarray(logits, jnp.float32),
                    jnp.asarray(hist), jnp.int32(hist_len),
                    self._beam_bias(), self._next_key(),
                    jnp.float32(s.temperature), jnp.int32(s.top_k),
                    jnp.float32(s.top_p), jnp.float32(s.min_p),
                    jnp.float32(s.typical),
                    jnp.float32(s.token_repetition_penalty_max),
                    n_out=n_beams,
                    sustain=s.token_repetition_penalty_sustain,
                    decay=s.token_repetition_penalty_decay,
                )
                toks = np.asarray(toks_d)
                lps = np.asarray(lps_d)
                k = max(1, int(np.asarray(valid_d).sum()))
                toks = toks[:k]
                self._beam_seqs = toks[:, None]
                self._beam_lps = lps[:k]

                # Beam cache: broadcast the main cache prefix to all rows.
                if self._beam_cache is None or self._beam_cache.shape[1] != k:
                    self._beam_cache = ExLlamaCache(
                        shape=(
                            self.cache.shape[0],
                            k,
                            self.cache.max_seq_len,
                            self.cache.shape[3],
                            self.cache.shape[4],
                        ),
                        dtype=self.cache.dtype,
                    )
                pref = self.cache.current_seq_len
                self.cache.copy_states(
                    self._beam_cache, 0, pref, 0, pref,
                    from_row=0, from_rows=1, to_row=0, to_rows=k,
                )
                self._beam_cache.current_seq_len = pref
                self.beams = True  # sentinel: beams active
            else:
                n = self._beam_seqs.shape[0]
                cfg = self.model.config
                past = self._beam_cache.current_seq_len
                hist, hist_len = self._beam_hist(n)
                new_state, parents_d, tokens_d, scores_d = _beam_step(
                    self.model.params,
                    self._beam_cache.state,
                    jnp.asarray(self._beam_seqs[:, -1:]),
                    jnp.int32(past),
                    jnp.asarray(self._beam_lps, jnp.float32),
                    jnp.asarray(hist), jnp.int32(hist_len),
                    self._beam_bias(),
                    jnp.float32(s.temperature), jnp.int32(s.top_k),
                    jnp.float32(s.top_p), jnp.float32(s.min_p),
                    jnp.float32(s.typical),
                    jnp.float32(s.token_repetition_penalty_max),
                    self.lora.stacked if self.lora is not None else None,
                    attend_len=self.model._attend_len(past + 1),
                    heads=cfg.num_attention_heads,
                    kv_heads=cfg.num_key_value_heads,
                    head_dim=cfg.head_dim,
                    eps=cfg.rms_norm_eps,
                    matmul_impl=self.model._matmul_impl(),
                    n_out=n_beams,
                    sustain=s.token_repetition_penalty_sustain,
                    decay=s.token_repetition_penalty_decay,
                    attn_impl=self.model._attn_impl(),
                    mlp_fuse=cfg.tuning.fuse_mlp,
                    attn_fuse=cfg.tuning.fuse_attn,
                    qkv_fuse=cfg.tuning.fuse_qkv,
                )
                self._beam_cache.state = new_state
                self._beam_cache.current_seq_len = past + 1
                # host sync: 3·n_beams scalars, not [n, V] probabilities
                parents = np.asarray(parents_d)
                tokens = np.asarray(tokens_d)
                scores = np.asarray(scores_d)
                k = min(n_beams, max(1, int(np.isfinite(scores).sum())))
                if k < n_beams:
                    parents, tokens, scores = (
                        parents[:k], tokens[:k], scores[:k]
                    )
                    st = self._beam_cache.state
                    self._beam_cache.state = _map_state(
                        lambda x: x[:k], st
                    )
                    # keep .shape honest so the re-expansion reuse check
                    # (shape[1] != k) sees the pruned row count
                    sh = self._beam_cache.shape
                    self._beam_cache.shape = (sh[0], k) + tuple(sh[2:])
                self._beam_seqs = np.concatenate(
                    [self._beam_seqs[parents], tokens[:, None]], axis=1
                )
                self._beam_lps = scores

        # Lookahead full: commit the first token of the best beam.
        best = int(np.argmax(self._beam_lps))
        best_token = int(self._beam_seqs[best, 0])
        self.sequence = np.concatenate(
            [self.sequence, np.array([[best_token]], np.int32)], axis=1
        )
        self.sequence_actual = self.sequence
        self._sync_seq_buf()

        # Prune beams that don't start with the winner; slide the window.
        keep = np.nonzero(self._beam_seqs[:, 0] == best_token)[0]
        keep = np.concatenate([[best], keep[keep != best]]).astype(np.int64)
        st = self._beam_cache.state
        idx = jnp.asarray(keep)
        self._beam_cache.state = _map_state(
            lambda x: jnp.take(x, idx, axis=0), st
        )
        sh = self._beam_cache.shape
        self._beam_cache.shape = (sh[0], len(keep)) + tuple(sh[2:])
        self._beam_seqs = self._beam_seqs[keep][:, 1:]
        self._beam_lps = self._beam_lps[keep]
        self._beam_prefix += 1
        if self._beam_seqs.shape[1] == 0:
            self._beam_seqs = None
            self.beams = None  # forces re-expansion next call

        return np.array([[best_token]], np.int32)

    def _sync_main_cache_from_beams(self):
        """Copy committed-position KV from beam row 0 back into the main
        cache (all kept rows hold identical KV for committed positions —
        they share the committed prefix by construction)."""
        if self.sequence is None:
            return
        target_len = self.sequence.shape[1] - 1
        valid = self.cache.current_seq_len
        if self._beam_cache is not None and target_len > valid:
            self._beam_cache.copy_states(
                self.cache, valid, target_len - valid, valid,
                target_len - valid, from_row=0, from_rows=1, to_row=0,
                to_rows=1,
            )
            self.cache.current_seq_len = target_len

    def end_beam_search(self):
        if not self.in_beam_search:
            return
        self.sequence = self.sequence_actual.copy()
        self._sync_main_cache_from_beams()
        self.cache.current_seq_len = self.sequence.shape[1] - 1
        self.beams = None
        self._beam_seqs = None
        self._beam_cache = None
        self.in_beam_search = False

    def replace_last_token(self, token, seq=False):
        self.sequence_actual[:, -1] = int(np.asarray(token).reshape(-1)[0])
        if seq:
            self.sequence[:, -1] = int(np.asarray(token).reshape(-1)[0])

    def sequence_ends_with(self, tokens) -> bool:
        tokens = np.asarray(tokens).reshape(-1)
        n = len(tokens)
        if self.sequence_actual.shape[1] < n + 1:
            return False
        return bool(
            np.array_equal(self.sequence_actual[0, -n:], tokens)
        )
