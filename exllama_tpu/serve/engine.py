"""Continuous batching engine: slotted KV cache, per-slot cursors, admission
between decode steps.

No reference counterpart — ExLlama is strictly one-sequence-at-a-time (its
batch support is static left-padded batches). This subsystem is the serving
layer BASELINE.json asks for:

  * the KV cache is a fixed pool of ``max_slots`` slots
    (per-layer [slots, Hkv, S_max, D]); each slot has its own position cursor, so
    sequences of different lengths decode together in one batched step;
  * one jitted decode step advances every active slot (per-slot RoPE
    positions, per-slot causal masking, per-slot sampler settings — all
    vectorized, no recompilation as requests come and go);
  * new requests are admitted between decode steps: the prompt (minus its
    last token, which becomes the slot's first decode input — same trick as
    the generator's gen_begin) is prefilled into a single-row scratch cache
    at bucketed lengths, then copied into the slot;
  * finished requests (EOS / max_new_tokens) free their slot immediately.

Decode-step compilation is amortized: one compile per (attend-length bucket)
regardless of which slots are active.
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
from collections import deque
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from exllama_tpu.cache import ExLlamaCache, KVCacheState
from exllama_tpu.models.llama import forward_chunk
from exllama_tpu.ops.sampling import SamplerSettings, _filter_row, rep_penalty_mask

QUEUED, RUNNING, DONE = "queued", "running", "done"
_req_counter = itertools.count()


@dataclasses.dataclass
class Request:
    req_id: int
    prompt_ids: np.ndarray                  # [P]
    max_new_tokens: int
    settings: SamplerSettings
    stop_tokens: tuple
    new_tokens: list = dataclasses.field(default_factory=list)
    state: str = QUEUED
    slot: int = -1
    on_token: Optional[Callable] = None     # streaming callback(req, tok)

    @property
    def output_ids(self) -> np.ndarray:
        return np.asarray(self.new_tokens, np.int32)


@functools.partial(
    jax.jit,
    static_argnames=("attend_len", "heads", "kv_heads", "head_dim", "eps",
                     "matmul_impl", "sustain", "decay"),
    donate_argnames=("kv",),
)
def _engine_step(
    params,
    kv: KVCacheState,
    tokens,        # [B, 1] int32: each slot's pending token
    pos,           # [B] int32 per-slot cursors
    seq_bufs,      # [B, S_max] token history
    seq_lens,      # [B] int32
    key,
    active,        # [B] bool
    temperature,   # [B] f32 sampler vectors
    top_k,         # [B] i32
    top_p,
    min_p,
    typical,
    penalty_max,   # [B] f32
    eos_ban,       # [B, V] additive bias (bos ban etc.)
    *,
    attend_len: int,
    heads: int,
    kv_heads: int,
    head_dim: int,
    eps: float,
    matmul_impl: str,
    sustain: int,
    decay: int,
):
    logits, kv = forward_chunk(
        params, kv, tokens, pos, None, None,
        attend_len=attend_len, last_token_only=True, preprocess_only=False,
        heads=heads, kv_heads=kv_heads, head_dim=head_dim, eps=eps,
        matmul_impl=matmul_impl,
    )
    lg = logits[:, -1, :].astype(jnp.float32)

    # per-slot repetition penalty over each slot's own history
    # (rep_penalty_mask expects a scalar seq_len; vmap it per row)
    def row_mask(buf, slen, pen):
        return rep_penalty_mask(
            buf[None, :], slen, lg.shape[-1], pen, sustain, decay
        )[0]

    vmask = jax.vmap(row_mask)(seq_bufs, seq_lens, penalty_max)
    lg = jnp.where(lg > 0, lg / vmask, lg * vmask)
    lg = lg + eos_ban

    b = lg.shape[0]
    keys = jax.random.split(key, b)
    sp = jax.vmap(_filter_row)(lg, temperature, top_k, top_p, min_p, typical)
    new_tokens = jax.vmap(
        lambda p, k: jax.random.categorical(k, jnp.log(p + 1e-30))
    )(sp, keys).astype(jnp.int32)

    # append to history at seq_lens (only meaningful for active slots)
    seq_bufs = jax.vmap(
        lambda buf, t, l: jax.lax.dynamic_update_slice(buf, t[None], (l,))
    )(seq_bufs, new_tokens, seq_lens)
    act = active.astype(jnp.int32)
    pos = pos + act
    seq_lens = seq_lens + act
    return new_tokens, kv, seq_bufs, pos, seq_lens


@functools.partial(
    jax.jit,
    static_argnames=("copy_len", "slot_s_max"),
    donate_argnames=("kv",),
)
def _install_slot(kv: KVCacheState, scratch: KVCacheState, slot,
                  *, copy_len: int, slot_s_max: int):
    """Copy scratch rows [0, copy_len) into batch row ``slot``."""
    z = jnp.zeros((), jnp.int32)

    def install(dst, src):
        # rank-generic: KV [B, Hkv, S, D] and int8-cache scales [B, Hkv, S]
        sizes = (1, src.shape[1], copy_len) + src.shape[3:]
        s = jax.lax.dynamic_slice(src, (z,) * src.ndim, sizes)
        return jax.lax.dynamic_update_slice(
            dst, s.astype(dst.dtype), (slot,) + (z,) * (src.ndim - 1)
        )

    def install_tuple(dsts, srcs):
        if dsts is None:
            return None
        return tuple(install(d, s) for d, s in zip(dsts, srcs))

    return KVCacheState(
        k=install_tuple(kv.k, scratch.k),
        v=install_tuple(kv.v, scratch.v),
        k_scale=install_tuple(kv.k_scale, scratch.k_scale),
        v_scale=install_tuple(kv.v_scale, scratch.v_scale),
    )


class ContinuousBatchingEngine:
    def __init__(self, model, tokenizer=None, max_slots: int = 8,
                 seed: int = 0, prefill_bucket: int = 64,
                 attn_bucket: int = 256):
        self.model = model
        self.tokenizer = tokenizer
        self.max_slots = max_slots
        self.prefill_bucket = prefill_bucket
        self.attn_bucket = attn_bucket
        cfg = model.config
        self.cache = ExLlamaCache(model, batch_size=max_slots)
        self.scratch = ExLlamaCache(model, batch_size=1)
        self.key = jax.random.PRNGKey(seed)

        s_max = cfg.max_seq_len
        self.pos = np.zeros(max_slots, np.int32)
        self.pending = np.zeros(max_slots, np.int32)
        self.seq_lens = np.zeros(max_slots, np.int32)
        self.seq_bufs = jnp.zeros((max_slots, s_max), jnp.int32)
        self.slot_req: list[Optional[Request]] = [None] * max_slots
        self.free = deque(range(max_slots))
        self.queue: deque[Request] = deque()
        # engine-wide rep-penalty window (static for compile stability)
        self.rep_sustain = 256
        self.rep_decay = 128
        # ban BOS like the generator (reference generator.py:352)
        self._bias = np.zeros((max_slots, cfg.vocab_size), np.float32)
        bos = getattr(tokenizer, "bos_token_id", 1) if tokenizer else 1
        self._bias[:, bos] = -10000.0

    # ------------------------------------------------------------ admission

    def submit(self, prompt, max_new_tokens: int = 128,
               settings: Optional[SamplerSettings] = None,
               stop_tokens: tuple = (), on_token=None) -> Request:
        if isinstance(prompt, str):
            assert self.tokenizer is not None
            ids = np.asarray(self.tokenizer.encode(prompt))[0]
        else:
            ids = np.asarray(prompt, np.int32).reshape(-1)
        cfg = self.model.config
        limit = cfg.max_seq_len - max_new_tokens - 1
        ids = ids[-limit:] if limit > 0 else ids[:1]
        st = settings or SamplerSettings()
        if self.tokenizer is not None and not stop_tokens:
            stop_tokens = (self.tokenizer.eos_token_id,)
        req = Request(
            req_id=next(_req_counter),
            prompt_ids=ids.astype(np.int32),
            max_new_tokens=max_new_tokens,
            settings=st,
            stop_tokens=tuple(stop_tokens),
            on_token=on_token,
        )
        self.queue.append(req)
        return req

    def _admit_one(self, req: Request):
        slot = self.free.popleft()
        ids = req.prompt_ids
        plen = len(ids)
        cfg = self.model.config

        if plen > 1:
            # prefill prompt[:-1] at bucketed length into the scratch cache
            pref = ids[:-1]
            bucket = -(-len(pref) // self.prefill_bucket) * self.prefill_bucket
            bucket = min(bucket, cfg.max_seq_len)
            padded = np.zeros((1, bucket), np.int32)
            padded[0, : len(pref)] = pref
            self.scratch.current_seq_len = 0
            self.model.forward(
                padded, self.scratch, preprocess_only=True
            )
            self.cache.state = _install_slot(
                self.cache.state, self.scratch.state, jnp.int32(slot),
                copy_len=bucket, slot_s_max=cfg.max_seq_len,
            )

        self.pos[slot] = plen - 1
        self.pending[slot] = ids[-1]
        self.seq_lens[slot] = plen
        buf = np.zeros((cfg.max_seq_len,), np.int32)
        buf[:plen] = ids
        self.seq_bufs = self.seq_bufs.at[slot].set(jnp.asarray(buf))
        self.slot_req[slot] = req
        req.slot = slot
        req.state = RUNNING

    def _admit(self):
        while self.free and self.queue:
            self._admit_one(self.queue.popleft())

    # ----------------------------------------------------------------- step

    @property
    def num_active(self) -> int:
        return self.max_slots - len(self.free)

    def has_work(self) -> bool:
        return bool(self.queue) or self.num_active > 0

    def step(self) -> list[tuple[Request, int, bool]]:
        """Admit pending requests, run one batched decode step, retire
        finished ones. Returns [(request, token, finished), ...]."""
        self._admit()
        if self.num_active == 0:
            return []
        cfg = self.model.config

        active = np.array([r is not None for r in self.slot_req])
        max_pos = int(self.pos[active].max()) + 1 if active.any() else 1
        attend_len = min(
            cfg.max_seq_len,
            -(-max_pos // self.attn_bucket) * self.attn_bucket,
        )

        # per-slot sampler vectors
        def vec(attr, default, dtype):
            return np.asarray(
                [
                    getattr(r.settings, attr) if r else default
                    for r in self.slot_req
                ],
                dtype,
            )

        self.key, sub = jax.random.split(self.key)
        tokens, new_kv, self.seq_bufs, pos_new, lens_new = _engine_step(
            self.model.params,
            self.cache.state,
            jnp.asarray(self.pending[:, None]),
            jnp.asarray(self.pos),
            self.seq_bufs,
            jnp.asarray(self.seq_lens),
            sub,
            jnp.asarray(active),
            jnp.asarray(vec("temperature", 1.0, np.float32)),
            jnp.asarray(vec("top_k", 1, np.int32)),
            jnp.asarray(vec("top_p", 0.0, np.float32)),
            jnp.asarray(vec("min_p", 0.0, np.float32)),
            jnp.asarray(vec("typical", 0.0, np.float32)),
            jnp.asarray(vec("token_repetition_penalty_max", 1.0, np.float32)),
            jnp.asarray(self._bias),
            attend_len=attend_len,
            heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim,
            eps=cfg.rms_norm_eps,
            matmul_impl=self.model._matmul_impl(),
            sustain=self.rep_sustain,
            decay=self.rep_decay,
        )
        self.cache.state = new_kv
        tokens = np.asarray(tokens)
        # np.asarray on jax arrays gives read-only views; we mutate these
        self.pos = np.array(pos_new)
        self.seq_lens = np.array(lens_new)

        results = []
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            tok = int(tokens[slot])
            req.new_tokens.append(tok)
            self.pending[slot] = tok
            finished = (
                tok in req.stop_tokens
                or len(req.new_tokens) >= req.max_new_tokens
                or int(self.pos[slot]) >= cfg.max_seq_len - 1
            )
            if req.on_token is not None:
                req.on_token(req, tok)
            if finished:
                req.state = DONE
                self.slot_req[slot] = None
                self.free.append(slot)
            results.append((req, tok, finished))
        return results

    def run(self) -> list[Request]:
        """Drain queue + active slots to completion; returns finished reqs."""
        done = []
        while self.has_work():
            for req, _tok, finished in self.step():
                if finished:
                    done.append(req)
        return done

    def generate(self, prompts: list, max_new_tokens: int = 128,
                 settings: Optional[SamplerSettings] = None) -> list[str]:
        """Convenience: submit all, drain, decode."""
        reqs = [
            self.submit(p, max_new_tokens, settings) for p in prompts
        ]
        self.run()
        assert all(r.state == DONE for r in reqs)
        return [
            self.tokenizer.decode(r.output_ids) if self.tokenizer else r.output_ids
            for r in reqs
        ]
