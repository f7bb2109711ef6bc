"""Continuous batching engine: slotted KV cache, per-slot cursors, chunked
admission interleaved with decode, per-request LoRA, stop-strings.

No reference counterpart — ExLlama is strictly one-sequence-at-a-time (its
batch support is static left-padded batches). This subsystem is the serving
layer BASELINE.json asks for:

  * the KV cache is a fixed pool of ``max_slots`` slots
    (per-layer [slots, Hkv, S_max, D]); each slot has its own position
    cursor, so sequences of different lengths decode together in one
    batched step;
  * one jitted decode step advances every active slot (per-slot RoPE
    positions, per-slot causal masking, per-slot sampler settings — all
    vectorized, no recompilation as requests come and go);
  * admission prefill is CHUNKED and interleaved: each ``step()`` runs at
    most one prefill chunk (``prefill_bucket`` tokens into the scratch
    cache) before the batched decode step, so running requests stall at
    most one chunk per decode token while a long prompt is admitted;
  * per-request LoRA: adapters registered once (``register_lora``) are
    gathered into per-slot batched A/B tensors, applied inside the same
    batched step (zero rows for slots without an adapter);
  * stop-strings with held-text streaming detokenization (the
    alt_generator's holding logic, per slot): partial stop-string matches
    are held back and only released when they can no longer complete;
  * finished requests (EOS / stop-string / max_new_tokens) free their slot
    immediately;
  * speculative mode (``spec_proposer=NgramProposer()``): each step drafts
    up to ``spec_lookahead`` tokens per slot on the host (prompt-lookup),
    verifies them all in ONE batched K+1-token forward, and commits the
    accepted prefix device-side — multiple tokens per request per step at
    the HBM cost of roughly one.

Decode-step compilation is amortized: one compile per (attend-length
bucket, lora-on/off) regardless of which slots are active.
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
from exllama_tpu.ops.sampling import (
    SamplerSettings,
    _filter_row,
    filter_sample_rows,
    rep_penalty_mask,
)

QUEUED, PREFILL, RUNNING, DONE = "queued", "prefill", "running", "done"
_req_counter = itertools.count()


@dataclasses.dataclass
class Request:
    req_id: int
    prompt_ids: np.ndarray                  # [P]
    max_new_tokens: int
    settings: SamplerSettings
    stop_tokens: tuple
    stop_strings: tuple = ()
    lora_id: int = -1                       # register_lora() handle, -1=none
    new_tokens: list = dataclasses.field(default_factory=list)
    state: str = QUEUED
    slot: int = -1
    on_token: Optional[Callable] = None     # streaming callback(req, tok)
    on_text: Optional[Callable] = None      # streaming callback(req, text)
    text: str = ""                          # released (post-holding) text
    _decoded: str = ""                      # decode of the detok window
    _detok_base: int = 0                    # window start in new_tokens
    _held: str = ""                         # held-back possible stop prefix

    @property
    def output_ids(self) -> np.ndarray:
        return np.asarray(self.new_tokens, np.int32)


@dataclasses.dataclass
class _StackedLora:
    """Adapter pytree in the shape model.forward expects (``.stacked``)."""

    stacked: tuple


@dataclasses.dataclass
class _Admission:
    """In-flight chunked prefill of one request into the scratch cache."""

    req: Request
    slot: int
    pref: np.ndarray        # prompt_ids[:-1]
    done: int = 0           # tokens prefilled so far (multiple of chunk)


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_seq_row(bufs, row, idx):
    """Write one slot's history row ([S_max] into [slots, S_max]) under
    jit — a single cached executable instead of an eager scatter."""
    return jax.lax.dynamic_update_slice(bufs, row[None, :], (idx, 0))


def _rep_mask_windowed(seq_bufs, seq_lens, penalty_max, vocab, sustain,
                       decay):
    """[B, V] repetition-penalty factors over each slot's history, sliced
    to the only window that can matter: with a finite sustain, tokens older
    than sustain+decay are unpenalized (ops/sampling.rep_penalty_mask), so
    the scatter-max runs over the last W = ceil128(sustain+decay) positions
    instead of the whole [B, S_max] buffer (5x less scatter at 2k ctx).
    Ages are window-relative and identical to the full-buffer form."""
    s_max = seq_bufs.shape[1]
    if sustain < 0:
        w = s_max
    else:
        w = min(s_max, -(-(sustain + decay) // 128) * 128)

    def row_mask(buf, slen, pen):
        start = jnp.maximum(slen - w, 0)
        win = jax.lax.dynamic_slice(buf, (start,), (w,))
        wlen = jnp.minimum(slen, w)
        return rep_penalty_mask(
            win[None, :], wlen, vocab, pen, sustain, decay
        )[0]

    return jax.vmap(row_mask)(seq_bufs, seq_lens, penalty_max)


def _split_held(combined: str, stops: tuple) -> tuple[str, str, int]:
    """Streaming stop-string holding over the shared withhold-split
    primitive (utils/streaming.py), case-insensitive per serving
    convention. Returns (release, hold, match) with match >= 0 iff a full
    stop string occurred (at the released-prefix boundary)."""
    from exllama_tpu.utils.streaming import split_on_stop_strings

    safe, held, matched = split_on_stop_strings(
        combined, stops, fold_case=True
    )
    return safe, held, (len(safe) if matched else -1)


@functools.partial(
    jax.jit,
    static_argnames=("attend_len", "heads", "kv_heads", "head_dim", "eps",
                     "matmul_impl", "sustain", "decay", "attn_impl",
                     "mlp_fuse", "attn_fuse", "qkv_fuse", "candidate_cap",
                     "mesh", "use_rep", "greedy_all"),
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
    lora,          # stacked per-slot LoRA pytree or None
    *,
    attend_len: int,
    heads: int,
    kv_heads: int,
    head_dim: int,
    eps: float,
    matmul_impl: str,
    sustain: int,
    decay: int,
    attn_impl: str = "auto",
    mlp_fuse: bool = True,
    attn_fuse: bool = True,
    qkv_fuse: bool = False,
    candidate_cap: int = 0,
    mesh=None,
    use_rep: bool = True,
    greedy_all: bool = False,
):
    logits, kv = forward_chunk(
        params, kv, tokens, pos, None, lora,
        attend_len=attend_len, last_token_only=True, preprocess_only=False,
        heads=heads, kv_heads=kv_heads, head_dim=head_dim, eps=eps,
        matmul_impl=matmul_impl, attn_impl=attn_impl,
        mlp_fuse=mlp_fuse, attn_fuse=attn_fuse, qkv_fuse=qkv_fuse,
        mesh=mesh,
    )
    lg = logits[:, -1, :].astype(jnp.float32)

    if use_rep:
        # per-slot repetition penalty over each slot's own history.
        # Only the last sustain+decay positions can carry a penalty, so the
        # scatter-max runs over that window (a [B, W<=384] dynamic slice)
        # instead of the full [B, S_max] history — the full-history rebuild
        # was the engine step's dominant non-forward cost (VERDICT r4 weak
        # #3). use_rep=False (every slot at penalty 1.0 — exact no-op)
        # removes it entirely.
        vmask = _rep_mask_windowed(
            seq_bufs, seq_lens, penalty_max, lg.shape[-1], sustain, decay
        )
        lg = jnp.where(lg > 0, lg / vmask, lg * vmask)
    lg = lg + eos_ban

    b = lg.shape[0]
    if greedy_all:
        # every slot at top_k == 1: the filter keeps exactly one candidate,
        # so sampling IS argmax — skip the full-vocab filter pipeline
        # (the per-row 32k sort was the biggest non-forward step cost)
        new_tokens = jnp.argmax(lg, axis=-1).astype(jnp.int32)
    else:
        keys = jax.random.split(key, b)
        new_tokens = filter_sample_rows(
            lg, keys, temperature, top_k, top_p, min_p, typical,
            candidate_cap=candidate_cap,
        )

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
    static_argnames=("attend_len", "heads", "kv_heads", "head_dim", "eps",
                     "matmul_impl", "sustain", "decay", "attn_impl",
                     "mlp_fuse", "attn_fuse", "qkv_fuse", "candidate_cap",
                     "mesh", "use_rep", "greedy_all"),
    donate_argnames=("kv",),
)
def _engine_spec_step(
    params,
    kv: KVCacheState,
    tokens,        # [B, K+1] int32: pending token + K padded draft tokens
    draft,         # [B, K] int32 (padding arbitrary beyond k_valid)
    k_valid,       # [B] int32: number of real draft tokens per slot
    pos,           # [B] int32 per-slot cursors
    seq_bufs,      # [B, S_max]
    seq_lens,      # [B]
    key,
    active,        # [B] bool
    temperature, top_k, top_p, min_p, typical,   # [B] sampler vectors
    penalty_max,   # [B] f32
    eos_ban,       # [B, V]
    lora,
    *,
    attend_len: int,
    heads: int,
    kv_heads: int,
    head_dim: int,
    eps: float,
    matmul_impl: str,
    sustain: int,
    decay: int,
    attn_impl: str = "auto",
    mlp_fuse: bool = True,
    attn_fuse: bool = True,
    qkv_fuse: bool = False,
    candidate_cap: int = 0,
    mesh=None,
    use_rep: bool = True,
    greedy_all: bool = False,
):
    """Speculative (draft-and-verify) engine step: one forward over K+1
    tokens per slot, target-distribution samples at every position,
    device-side prefix acceptance. Emitted tokens are always target
    samples (same guarantee as speculative.SpeculativeGenerator) — the
    one approximation is that the repetition-penalty mask is computed
    from the committed history once per step, not per drafted position
    (exact whenever penalty_max == 1.0).

    Returns (out_tokens [B, K+1], counts [B], kv, seq_bufs, pos, seq_lens):
    slot b commits out_tokens[b, :counts[b]].
    """
    b, k1 = tokens.shape
    logits, kv = forward_chunk(
        params, kv, tokens, pos, None, lora,
        attend_len=attend_len, last_token_only=False, preprocess_only=False,
        heads=heads, kv_heads=kv_heads, head_dim=head_dim, eps=eps,
        matmul_impl=matmul_impl, attn_impl=attn_impl,
        mlp_fuse=mlp_fuse, attn_fuse=attn_fuse, qkv_fuse=qkv_fuse,
        mesh=mesh,
    )
    lg = logits.astype(jnp.float32)                     # [B, K+1, V]

    if use_rep:
        vmask = _rep_mask_windowed(
            seq_bufs, seq_lens, penalty_max, lg.shape[-1], sustain, decay
        )[:, None, :]
        lg = jnp.where(lg > 0, lg / vmask, lg * vmask)
    lg = lg + eos_ban[:, None, :]

    if greedy_all:
        samples = jnp.argmax(lg, axis=-1).astype(jnp.int32)   # [B, K+1]
    else:
        keys = jax.random.split(key, b * k1)
        samples = filter_sample_rows(
            lg.reshape(b * k1, -1), keys,
            *(jnp.broadcast_to(v[:, None], (b, k1)).reshape(b * k1)
              for v in (temperature, top_k, top_p, min_p, typical)),
            candidate_cap=candidate_cap,
        ).reshape(b, k1)                                # [B, K+1]

    # prefix acceptance: position i survives while the target's sample
    # equals the draft; m = length of the surviving prefix
    i_k = jnp.arange(k1 - 1, dtype=jnp.int32)[None, :]
    match = (samples[:, : k1 - 1] == draft) & (i_k < k_valid[:, None])
    m = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)  # [B]
    corr = jnp.take_along_axis(samples, m[:, None], axis=1)[:, 0]
    i_all = jnp.arange(k1, dtype=jnp.int32)[None, :]
    draft_pad = jnp.concatenate(
        [draft, jnp.zeros((b, 1), jnp.int32)], axis=1
    )
    out_tokens = jnp.where(i_all < m[:, None], draft_pad, corr[:, None])
    counts = (m + 1) * active.astype(jnp.int32)

    # masked history append: K+1 candidate rows, only counts of them real;
    # rows past counts land beyond the committed length and are overwritten
    # by the next step's write at the advanced cursor
    def write_row(buf, toks, l, cnt):
        cur = jax.lax.dynamic_slice(buf, (l,), (k1,))
        upd = jnp.where(jnp.arange(k1) < cnt, toks, cur)
        return jax.lax.dynamic_update_slice(buf, upd, (l,))

    seq_bufs = jax.vmap(write_row)(seq_bufs, out_tokens, seq_lens, counts)
    pos = pos + counts
    seq_lens = seq_lens + counts
    # ONE packed device->host payload: through a remote-TPU tunnel every
    # separate fetch is a ~25 ms round-trip; four of them dominated the
    # whole spec step (round-5 finding — 1-slot spec measured slower than
    # plain decode purely from host-sync overhead)
    packed = jnp.concatenate(
        [out_tokens, counts[:, None], pos[:, None], seq_lens[:, None]],
        axis=1,
    ).astype(jnp.int32)
    return packed, kv, seq_bufs, pos, seq_lens


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
                 attn_bucket: int = 256, mesh=None,
                 spec_proposer=None, spec_lookahead: int = 4,
                 sampler_candidate_cap: int = 0):
        self.model = model
        self.tokenizer = tokenizer
        self.max_slots = max_slots
        self.prefill_bucket = prefill_bucket
        self.attn_bucket = attn_bucket
        # speculative mode: a host-side per-slot proposer with a
        # propose(seq, k) -> np.ndarray method and no cross-call state
        # (speculative.NgramProposer). Draft-model proposers keep a KV
        # cache per stream and are not slotted yet.
        self.spec_proposer = spec_proposer
        self.spec_lookahead = spec_lookahead
        self.spec_stats = {"drafted": 0, "accepted": 0, "steps": 0}
        # 0 = reference-parity full-vocab sampling. C > 0 pre-selects the
        # top-C logits per position before the filter pipeline (one 32k
        # sort per row is the dominant sampler cost of a batched step);
        # top_p/typical then renormalize over the top-C mass — opt-in.
        self.sampler_candidate_cap = sampler_candidate_cap
        cfg = model.config
        self.mesh = mesh if mesh is not None else getattr(model, "mesh", None)
        self.cache = ExLlamaCache(model, batch_size=max_slots)
        self.scratch = ExLlamaCache(model, batch_size=1)
        if self.mesh is not None:
            # multi-chip serving: slot cache shards batch over dp and
            # kv-heads over tp; the B=1 admission scratch shards heads only
            from jax.sharding import NamedSharding, PartitionSpec as P

            from exllama_tpu.parallel.mesh import shard_cache

            dp = dict(
                zip(self.mesh.axis_names, self.mesh.devices.shape)
            ).get("dp", 1)
            assert max_slots % dp == 0, (
                f"max_slots ({max_slots}) must divide over dp ({dp})"
            )
            shard_cache(self.cache, self.mesh)
            sh4 = NamedSharding(self.mesh, P(None, "tp", None, None))
            sh3 = NamedSharding(self.mesh, P(None, "tp", None))

            def put(t, s):
                return None if t is None else tuple(
                    jax.device_put(x, s) for x in t
                )

            self.scratch.state = KVCacheState(
                k=put(self.scratch.state.k, sh4),
                v=put(self.scratch.state.v, sh4),
                k_scale=put(self.scratch.state.k_scale, sh3),
                v_scale=put(self.scratch.state.v_scale, sh3),
            )
        self.key = jax.random.PRNGKey(seed)

        s_max = cfg.max_seq_len
        self.pos = np.zeros(max_slots, np.int32)
        self.pending = np.zeros(max_slots, np.int32)
        self.seq_lens = np.zeros(max_slots, np.int32)
        self.seq_bufs = jnp.zeros((max_slots, s_max), jnp.int32)
        self.slot_req: list[Optional[Request]] = [None] * max_slots
        if jax.process_count() > 1:
            # cross-host continuous batching: every process runs the same
            # jitted step over the globally sharded cache, but each host
            # admits only into its own slot range (BASELINE config 5)
            from exllama_tpu.parallel.multihost import local_batch_slice

            sl = local_batch_slice(max_slots)
            self.free = deque(range(sl.start, sl.stop))
        else:
            self.free = deque(range(max_slots))
        self.queue: deque[Request] = deque()
        self.admitting: deque[_Admission] = deque()
        # engine-wide rep-penalty window (static for compile stability)
        self.rep_sustain = 256
        self.rep_decay = 128
        # ban BOS like the generator (reference generator.py:352)
        self._bias = np.zeros((max_slots, cfg.vocab_size), np.float32)
        bos = getattr(tokenizer, "bos_token_id", 1) if tokenizer else 1
        self._bias[:, bos] = -10000.0
        # per-request LoRA registry: adapter id -> stacked LayerLora tuple
        self._loras: list = []
        self._slot_lora = np.full(max_slots, -1, np.int32)
        self._batched_lora = None      # rebuilt when slot↔adapter map changes
        self._lora_dirty = False
        # Device-side step operands (cursors, pending tokens, sampler
        # vectors) are cached between steps and refreshed only when the
        # slot map changes — on a steady decode step the only host↔device
        # traffic is ONE packed fetch of (tokens, pos, lens). Each
        # host→device upload costs a full RPC round trip on remote-tunnel
        # hosts (docs/PERFORMANCE.md round 3) and ~µs locally.
        self._dev_ops = None
        self._sched_dirty = True

    # --------------------------------------------------------------- LoRA

    def register_lora(self, lora) -> int:
        """Register an adapter (ExLlamaLora or its ``.stacked`` pytree) for
        per-request use; returns the id to set as ``Request.lora_id``."""
        stacked = getattr(lora, "stacked", lora)
        self._loras.append(stacked)
        return len(self._loras) - 1

    def _rebuild_batched_lora(self):
        """Per-slot batched A/B tensors ([slots, in, r]/[slots, r, out]),
        zero rows for slots without an adapter. None when no active slot
        carries one (keeps the no-lora compile)."""
        from exllama_tpu.lora import LayerLora, _PROJ_NAMES

        self._lora_dirty = False
        if not self._loras or np.all(self._slot_lora < 0):
            self._batched_lora = None
            return
        n_layers = self.model.config.num_hidden_layers
        # max rank across adapters (smaller adapters zero-pad)
        def rank_of(stacked):
            for ll in stacked:
                for p in _PROJ_NAMES:
                    ab = getattr(ll, p)
                    if ab is not None:
                        return ab[0].shape[1]
            return 0

        rmax = max(rank_of(s) for s in self._loras)
        layers = []
        for li in range(n_layers):
            fields = {}
            for p in _PROJ_NAMES:
                adapted = [
                    s for s in self._loras if getattr(s[li], p) is not None
                ]
                if not adapted:
                    fields[p] = None
                    continue
                a0, b0 = getattr(adapted[0][li], p)
                k_in, n_out = a0.shape[0], b0.shape[1]
                a_b = np.zeros((self.max_slots, k_in, rmax), np.float32)
                b_b = np.zeros((self.max_slots, rmax, n_out), np.float32)
                for slot in range(self.max_slots):
                    lid = int(self._slot_lora[slot])
                    if lid < 0:
                        continue
                    ab = getattr(self._loras[lid][li], p)
                    if ab is None:
                        continue
                    a, b = np.asarray(ab[0], np.float32), np.asarray(
                        ab[1], np.float32
                    )
                    a_b[slot, :, : a.shape[1]] = a
                    b_b[slot, : b.shape[0], :] = b
                fields[p] = (
                    jnp.asarray(a_b, jnp.bfloat16),
                    jnp.asarray(b_b, jnp.bfloat16),
                )
            layers.append(LayerLora(**fields))
        self._batched_lora = tuple(layers)

    # ------------------------------------------------------------ admission

    def submit(self, prompt, max_new_tokens: int = 128,
               settings: Optional[SamplerSettings] = None,
               stop_tokens: tuple = (), stop_strings: tuple = (),
               lora_id: int = -1, on_token=None, on_text=None) -> Request:
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
            stop_strings=tuple(stop_strings),
            lora_id=lora_id,
            on_token=on_token,
            on_text=on_text,
        )
        self.queue.append(req)
        return req

    def _begin_admission(self, req: Request):
        """Reserve a slot; prompt KV prefills chunk-by-chunk across steps."""
        slot = self.free.popleft()
        req.slot = slot
        req.state = PREFILL
        pref = req.prompt_ids[:-1]
        self.admitting.append(_Admission(req=req, slot=slot, pref=pref))
        if len(pref) == 0:
            self._finish_admission(self.admitting.pop())

    def _prefill_chunk(self, adm: _Admission):
        """One ``prefill_bucket``-sized chunk into the scratch cache."""
        c = self.prefill_bucket
        if adm.done == 0:
            self.scratch.current_seq_len = 0
        chunk = adm.pref[adm.done : adm.done + c]
        padded = np.zeros((1, c), np.int32)
        padded[: , : len(chunk)] = chunk
        lora = None
        if adm.req.lora_id >= 0:
            # prompt KV must reflect the request's adapter, like a
            # dedicated generator would (reference applies LoRA on every
            # forward, model.py:207-214)
            lora = _StackedLora(self._loras[adm.req.lora_id])
        self.model.forward(
            padded, self.scratch, preprocess_only=True, lora=lora
        )
        adm.done += c

    def _finish_admission(self, adm: _Admission):
        req, slot = adm.req, adm.slot
        cfg = self.model.config
        if adm.done > 0:
            copy_len = min(adm.done, cfg.max_seq_len)
            self.cache.state = _install_slot(
                self.cache.state, self.scratch.state, jnp.int32(slot),
                copy_len=copy_len, slot_s_max=cfg.max_seq_len,
            )
        ids = req.prompt_ids
        plen = len(ids)
        self.pos[slot] = plen - 1
        self.pending[slot] = ids[-1]
        self.seq_lens[slot] = plen
        buf = np.zeros((cfg.max_seq_len,), np.int32)
        buf[:plen] = ids
        # jitted row write (one cached executable) rather than an eager
        # scatter: eager one-shot XLA:CPU executables accumulate per shape
        # and have segfaulted mid-suite before (round 4/5; eager
        # multi-device scatter crashed under the 8-device test mesh)
        self.seq_bufs = _set_seq_row(
            self.seq_bufs, jnp.asarray(buf), jnp.int32(slot)
        )
        self.slot_req[slot] = req
        req.state = RUNNING
        self._sched_dirty = True
        if int(self._slot_lora[slot]) != req.lora_id:
            self._slot_lora[slot] = req.lora_id
            self._lora_dirty = True

    def _admit(self):
        # start admissions for queued requests while slots are free
        while self.free and self.queue:
            self._begin_admission(self.queue.popleft())
        # advance at most ONE prefill chunk per step: running requests
        # stall at most one chunk per decode token (VERDICT r1 weak #4)
        if self.admitting:
            adm = self.admitting[0]
            self._prefill_chunk(adm)
            if adm.done >= len(adm.pref):
                self._finish_admission(self.admitting.popleft())

    # ----------------------------------------------------------------- step

    @property
    def num_active(self) -> int:
        return sum(r is not None for r in self.slot_req)

    def has_work(self) -> bool:
        return (
            bool(self.queue) or bool(self.admitting) or self.num_active > 0
        )

    # ------------------------------------------------------- stream/detok

    # Incremental-detok window: re-decode only the last ≤64 output tokens
    # per step (token/text joins never reach further back than a few
    # tokens), rebasing to the last 16 when the window fills — O(n) total
    # instead of the O(n²) of re-decoding the full output every token.
    _DETOK_WINDOW = 64
    _DETOK_KEEP = 16

    def _stream_text(self, req: Request, finished: bool) -> bool:
        """Incremental detokenize + stop-string holding. Returns True if a
        stop string completed (request must finish)."""
        if self.tokenizer is None:
            return False
        ids = req.output_ids
        tail = ids[req._detok_base:]
        decoded = self.tokenizer.decode(tail)
        new_text = decoded[len(req._decoded):]
        req._decoded = decoded
        if len(tail) > self._DETOK_WINDOW:
            req._detok_base = len(ids) - self._DETOK_KEEP
            req._decoded = self.tokenizer.decode(ids[req._detok_base:])
        combined = req._held + new_text
        if not req.stop_strings:
            release, req._held, match = combined, "", -1
        else:
            release, req._held, match = _split_held(
                combined, req.stop_strings
            )
        if finished and match < 0:
            release, req._held = combined, ""
        if release:
            req.text += release
            if req.on_text is not None:
                req.on_text(req, release)
        return match >= 0

    def _sampler_vec(self, attr, default, dtype):
        return np.asarray(
            [
                getattr(r.settings, attr) if r else default
                for r in self.slot_req
            ],
            dtype,
        )

    def step(self) -> list[tuple[Request, int, bool]]:
        """Admit pending requests (≤1 prefill chunk), run one batched
        decode step, retire finished ones. Returns
        [(request, token, finished), ...]. With ``spec_proposer`` set, a
        step verifies up to ``spec_lookahead`` drafted tokens per slot in
        the same batched forward and may return several tokens per
        request."""
        self._admit()
        if self.num_active == 0:
            return []
        cfg = self.model.config

        active = np.array([r is not None for r in self.slot_req])
        max_pos = int(self.pos[active].max()) + 1 if active.any() else 1
        if (
            self.spec_proposer is not None
            # the masked K+1 history/cache writes need headroom; fall back
            # to plain steps near the end of the window
            and max_pos + self.spec_lookahead + 1 <= cfg.max_seq_len - 1
        ):
            return self._step_spec(active, max_pos)
        attend_len = min(
            cfg.max_seq_len,
            -(-max_pos // self.attn_bucket) * self.attn_bucket,
        )
        if self._lora_dirty:
            self._rebuild_batched_lora()

        vec = self._sampler_vec

        if self._sched_dirty or self._dev_ops is None:
            self._dev_ops = {
                "pending": jnp.asarray(self.pending[:, None]),
                "pos": jnp.asarray(self.pos),
                "lens": jnp.asarray(self.seq_lens),
                "active": jnp.asarray(active),
                "temp": jnp.asarray(vec("temperature", 1.0, np.float32)),
                "top_k": jnp.asarray(vec("top_k", 1, np.int32)),
                "top_p": jnp.asarray(vec("top_p", 0.0, np.float32)),
                "min_p": jnp.asarray(vec("min_p", 0.0, np.float32)),
                "typical": jnp.asarray(vec("typical", 0.0, np.float32)),
                "rep": jnp.asarray(
                    vec("token_repetition_penalty_max", 1.0, np.float32)
                ),
                "bias": jnp.asarray(self._bias),
            }
            # penalty 1.0 on every slot is an exact no-op: skip the mask
            # build statically (one extra compile variant, large step win)
            self._use_rep = bool(
                np.any(vec("token_repetition_penalty_max", 1.0, np.float32)
                       != 1.0)
            )
            # top_k == 1 on every OCCUPIED slot (empty slots default to 1
            # here; their outputs are unused): sampling degenerates to
            # argmax exactly
            self._greedy_all = bool(
                np.all(vec("top_k", 1, np.int32) == 1)
            )
            self._sched_dirty = False
        dev = self._dev_ops

        self.key, sub = jax.random.split(self.key)
        tokens, new_kv, self.seq_bufs, pos_new, lens_new = _engine_step(
            self.model.params,
            self.cache.state,
            dev["pending"],
            dev["pos"],
            self.seq_bufs,
            dev["lens"],
            sub,
            dev["active"],
            dev["temp"],
            dev["top_k"],
            dev["top_p"],
            dev["min_p"],
            dev["typical"],
            dev["rep"],
            dev["bias"],
            self._batched_lora,
            attend_len=attend_len,
            heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim,
            eps=cfg.rms_norm_eps,
            matmul_impl=self.model._matmul_impl(),
            sustain=self.rep_sustain,
            decay=self.rep_decay,
            attn_impl=self.model._attn_impl(),
            mlp_fuse=self.model.config.tuning.fuse_mlp,
            attn_fuse=self.model.config.tuning.fuse_attn,
            qkv_fuse=self.model.config.tuning.fuse_qkv,
            candidate_cap=self.sampler_candidate_cap,
            mesh=self.mesh,
            use_rep=getattr(self, "_use_rep", True),
            greedy_all=getattr(self, "_greedy_all", False),
        )
        self.cache.state = new_kv
        # device-side copies roll forward as next step's operands (no
        # re-upload unless the slot map changes)...
        tokens_dev = tokens.reshape(-1).astype(jnp.int32)
        self._dev_ops["pending"] = tokens_dev.reshape(-1, 1)
        self._dev_ops["pos"] = pos_new
        self._dev_ops["lens"] = lens_new
        # ...and ONE packed device→host fetch gives the scheduler its
        # mirrors (tokens, cursors, lengths).
        packed = np.asarray(jnp.stack([
            tokens_dev, pos_new.astype(jnp.int32),
            lens_new.astype(jnp.int32),
        ]))
        tokens = packed[0]
        # np.asarray on jax arrays gives read-only views; we mutate these
        self.pos = np.array(packed[1])
        self.seq_lens = np.array(packed[2])

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
            if req.stop_strings or req.on_text is not None:
                if self._stream_text(req, finished):
                    finished = True
            if finished:
                req.state = DONE
                self.slot_req[slot] = None
                self.free.append(slot)
                self._sched_dirty = True
            results.append((req, tok, finished))
        return results

    def _step_spec(self, active, max_pos) -> list[tuple[Request, int, bool]]:
        """Speculative step: host-side drafts per slot, one batched K+1
        verify forward, commit the accepted prefix (+ correction/bonus)."""
        cfg = self.model.config
        self._sched_dirty = True   # spec commits bypass the device-op cache
        kd = self.spec_lookahead
        k1 = kd + 1
        draft = np.zeros((self.max_slots, kd), np.int32)
        k_valid = np.zeros(self.max_slots, np.int32)
        tokens = np.zeros((self.max_slots, k1), np.int32)
        tokens[:, 0] = self.pending
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            seq = np.concatenate(
                [req.prompt_ids, np.asarray(req.new_tokens, np.int32)]
            )
            d = self.spec_proposer.propose(seq, kd)
            draft[slot, : len(d)] = d
            k_valid[slot] = len(d)
            tokens[slot, 1 : 1 + len(d)] = d
        attend_len = min(
            cfg.max_seq_len,
            -(-(max_pos + k1) // self.attn_bucket) * self.attn_bucket,
        )
        if self._lora_dirty:
            self._rebuild_batched_lora()
        vec = self._sampler_vec

        self.key, sub = jax.random.split(self.key)
        packed_dev, new_kv, self.seq_bufs, pos_new, lens_new = (
            _engine_spec_step(
                self.model.params,
                self.cache.state,
                jnp.asarray(tokens),
                jnp.asarray(draft),
                jnp.asarray(k_valid),
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
                jnp.asarray(
                    vec("token_repetition_penalty_max", 1.0, np.float32)
                ),
                jnp.asarray(self._bias),
                self._batched_lora,
                attend_len=attend_len,
                heads=cfg.num_attention_heads,
                kv_heads=cfg.num_key_value_heads,
                head_dim=cfg.head_dim,
                eps=cfg.rms_norm_eps,
                matmul_impl=self.model._matmul_impl(),
                sustain=self.rep_sustain,
                decay=self.rep_decay,
                attn_impl=self.model._attn_impl(),
                mlp_fuse=self.model.config.tuning.fuse_mlp,
                attn_fuse=self.model.config.tuning.fuse_attn,
                qkv_fuse=self.model.config.tuning.fuse_qkv,
                candidate_cap=self.sampler_candidate_cap,
                mesh=self.mesh,
                use_rep=getattr(self, "_use_rep", True),
                greedy_all=getattr(self, "_greedy_all", False),
            )
        )
        self.cache.state = new_kv
        packed = np.asarray(packed_dev)          # the ONE host fetch
        out_tokens = packed[:, :k1]
        counts = packed[:, k1]
        self.pos = np.array(packed[:, k1 + 1])
        self.seq_lens = np.array(packed[:, k1 + 2])
        self.spec_stats["steps"] += 1

        results = []
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            c = int(counts[slot])
            self.spec_stats["drafted"] += int(k_valid[slot])
            self.spec_stats["accepted"] += c - 1
            finished = False
            for j in range(c):
                tok = int(out_tokens[slot, j])
                req.new_tokens.append(tok)
                self.pending[slot] = tok
                finished = (
                    tok in req.stop_tokens
                    or len(req.new_tokens) >= req.max_new_tokens
                    or int(self.pos[slot]) >= cfg.max_seq_len - 1
                )
                if req.on_token is not None:
                    req.on_token(req, tok)
                if req.stop_strings or req.on_text is not None:
                    if self._stream_text(req, finished):
                        finished = True
                results.append((req, tok, finished))
                if finished:
                    break
            if finished:
                req.state = DONE
                self.slot_req[slot] = None
                self.free.append(slot)
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
