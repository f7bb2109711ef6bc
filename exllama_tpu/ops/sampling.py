"""On-device sampling: the reference's full sampler set, vectorized.

Reference semantics reproduced exactly (generator.py:91-170 and
cpu_func/rep_penalty.cpp), but everything is jnp on fp32 logits inside jit —
no per-row Python loops, no CPU round-trips per token:

  * temperature → softmax
  * top-k (0 = disabled)
  * top-p with embedded min-p cutoff: walking the descending-prob list,
    token i (i>0) survives iff inclusive-cumsum(i) <= top_p and
    prob(i) >= min_p; the top token always survives
  * locally-typical sampling: on the renormalized surviving set, rank by
    |−H − log p| ascending, keep while inclusive-cumsum <= typical
  * repetition penalty with sustain window + linear decay tail, applied as
    logit/v for positive logits and logit*v for negative (most-recent
    occurrence of a token decides its penalty — equivalently max, since the
    penalty decays monotonically going back)
  * disallowed tokens (-inf), constraint forcing (reference
    generator.py:357-366: +/-10000 logit offsets)

All functions are batched over rows and jit-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class SamplerSettings:
    """Mirror of the reference's ExLlamaGenerator.Settings (generator.py:9-23)."""

    temperature: float = 0.95
    top_k: int = 40
    top_p: float = 0.65
    min_p: float = 0.0
    typical: float = 0.0
    token_repetition_penalty_max: float = 1.15
    token_repetition_penalty_sustain: int = 256
    token_repetition_penalty_decay: int = 128
    beams: int = 1
    beam_length: int = 1


def rep_penalty_mask(
    sequence: jax.Array,    # [B, S] int32 token history (positions < seq_len valid)
    seq_len: jax.Array,     # scalar int32: number of valid positions
    vocab_size: int,
    penalty_max: float,
    sustain: int,
    decay: int,
) -> jax.Array:
    """Per-token penalty factor [B, V] (reference rep_penalty_cpu).

    Walking back from the newest token: the most recent ``sustain`` tokens
    get ``penalty_max``; older ones decay linearly to 1.0 over ``decay``
    positions; anything older is unpenalized. sustain == -1 → whole context.
    """
    b, s_max = sequence.shape
    pos = jnp.arange(s_max, dtype=jnp.int32)[None, :]      # [1, S]
    age = (seq_len - 1 - pos).astype(jnp.float32)          # 0 = newest
    # Reference loop order (rep_penalty.cpp): v is applied, *then* s is
    # decremented and v bumped — so the token at age == sustain still gets
    # the full penalty, and the processed window is age < sustain + decay.
    if sustain == -1:
        v = jnp.full_like(age, penalty_max)
        in_window = pos >= 0
    else:
        dv = (1.0 - penalty_max) / decay if decay else 0.0
        v = jnp.where(
            age <= sustain,
            penalty_max,
            penalty_max + dv * (age - sustain),
        )
        in_window = age < sustain + decay
    valid = (pos < seq_len) & in_window & (v > 1.0)
    v = jnp.where(valid, v, 1.0)

    # scatter-max: most recent occurrence has the largest v
    ids = jnp.where(pos < seq_len, sequence, vocab_size)   # park invalid
    v = jnp.broadcast_to(v, ids.shape)
    mask_ext = jnp.ones((b, vocab_size + 1), jnp.float32)
    mask_ext = jax.vmap(lambda m, i, val: m.at[i].max(val))(mask_ext, ids, v)
    return mask_ext[:, :vocab_size]


def apply_rep_penalty(
    logits: jax.Array,     # [B, V] f32
    sequence: jax.Array,   # [B, S]
    seq_len: jax.Array,
    penalty_max: float,
    sustain: int,
    decay: int,
) -> jax.Array:
    """logits/v where positive, logits*v where negative (rep_penalty.cpp:36-74).

    ``penalty_max`` may be traced; 1.0 is exactly neutral (v == 1 everywhere),
    so there is no need for a static early-out.
    """
    v = rep_penalty_mask(
        sequence, seq_len, logits.shape[-1], penalty_max, sustain, decay
    )
    return jnp.where(logits > 0.0, logits / v, logits * v)


def _filter_row(
    logits: jax.Array,     # [V] f32
    temperature: jax.Array,
    top_k: jax.Array,      # int32 scalar, 0 = disabled
    top_p: jax.Array,
    min_p: jax.Array,
    typical: jax.Array,
) -> jax.Array:
    """The reference filtering pipeline → normalized probs [V] in vocab
    order, exact zeros on filtered-out tokens. Shared by sampling (categorical
    over the result) and beam search (candidate distributions)."""
    v = logits.shape[-1]
    logits = logits / temperature + 1e-8
    probs = jax.nn.softmax(logits, axis=-1)

    sp, si = jax.lax.top_k(probs, v)  # full descending sort
    ranks = jnp.arange(v)

    # top-k (0 = disabled); traced so settings changes don't recompile
    keep = jnp.where(top_k > 0, ranks < top_k, True)
    sp = jnp.where(keep, sp, 0.0)
    sp = sp / jnp.sum(sp)

    # top-p with embedded min-p (see module docstring for the exact rule)
    def do_top_p(sp):
        cum = jnp.cumsum(sp)
        keep = (ranks == 0) | ((cum <= top_p) & (sp >= min_p))
        sp = jnp.where(keep, sp, 0.0)
        return sp / jnp.sum(sp)

    sp = jax.lax.cond(top_p > 0.0, do_top_p, lambda s: s, sp)

    # locally-typical sampling
    def do_typical(sp):
        logp = jnp.log(sp + 1e-10)
        neg_entropy = jnp.sum(jnp.where(sp > 0, sp * logp, 0.0))
        dev = jnp.abs(neg_entropy - logp)
        dev = jnp.where(sp > 0, dev, jnp.inf)
        order = jnp.argsort(dev)                 # ascending deviation
        sp_t = sp[order]
        cum = jnp.cumsum(sp_t)
        keep_t = (ranks == 0) | (cum <= typical)
        sp_t = jnp.where(keep_t, sp_t, 0.0)
        sp_new = jnp.zeros_like(sp).at[order].set(sp_t)
        return sp_new / jnp.sum(sp_new)

    sp = jax.lax.cond(typical > 0.0, do_typical, lambda s: s, sp)

    # scatter the filtered probs back to vocab order
    return jnp.zeros_like(sp).at[si].set(sp)


def filter_probs(
    logits: jax.Array,     # [B, V] f32
    temperature,
    top_k,
    top_p,
    min_p,
    typical,
) -> jax.Array:
    """Batched :func:`_filter_row`."""
    return jax.vmap(
        lambda row: _filter_row(
            row,
            jnp.float32(temperature),
            jnp.int32(top_k),
            jnp.float32(top_p),
            jnp.float32(min_p),
            jnp.float32(typical),
        )
    )(logits.astype(jnp.float32))


def _sample_row(
    logits: jax.Array,     # [V] f32
    key: jax.Array,
    temperature: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array,
    min_p: jax.Array,
    typical: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """One row of the reference sampling pipeline. Returns (token, prob)."""
    sp = _filter_row(logits, temperature, top_k, top_p, min_p, typical)
    choice = jax.random.categorical(key, jnp.log(sp + 1e-30))
    return choice, sp[choice]


def sample(
    logits: jax.Array,              # [B, V] f32
    key: jax.Array,
    settings: SamplerSettings,
    disallowed: Optional[jax.Array] = None,  # [V] bool, True = banned
    logit_bias: Optional[jax.Array] = None,  # [B, V] or [V] additive
) -> tuple[jax.Array, jax.Array]:
    """Sample one token per row. Returns (tokens [B], probs [B])."""
    b = logits.shape[0]
    logits = logits.astype(jnp.float32)
    if disallowed is not None:
        logits = jnp.where(disallowed[None, :], -jnp.inf, logits)
    if logit_bias is not None:
        logits = logits + logit_bias

    keys = jax.random.split(key, b)
    tokens, probs = jax.vmap(
        lambda lg, k: _sample_row(
            lg,
            k,
            jnp.float32(settings.temperature),
            jnp.int32(settings.top_k),
            jnp.float32(settings.top_p),
            jnp.float32(settings.min_p),
            jnp.float32(settings.typical),
        )
    )(logits, keys)
    return tokens.astype(jnp.int32), probs


def greedy(logits: jax.Array) -> jax.Array:
    """Argmax per row (the temperature→0 limit / top_k=1)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def filter_sample_rows(
    lg: jax.Array,         # [B, V] f32 (penalties/bias already applied)
    keys: jax.Array,       # [B, 2] u32
    temperature: jax.Array,  # [B] sampler vectors
    top_k: jax.Array,
    top_p: jax.Array,
    min_p: jax.Array,
    typical: jax.Array,
    candidate_cap: int = 0,
) -> jax.Array:
    """Batched filter+sample with an optional static candidate cap.

    The exact pipeline (cap=0, the default) runs the reference-parity
    filter over the full vocabulary — one 32k-wide sort per row, the
    dominant device cost of a batched-engine sampling step. With
    ``candidate_cap=C``, `lax.top_k` pre-selects the C highest logits and
    the identical pipeline runs C-wide; top_p/typical masses are then
    relative to the top-C renormalization (a deviation from the
    reference's full-distribution semantics — opt-in only, see
    ContinuousBatchingEngine(sampler_candidate_cap=...)). top_k/min_p are
    unaffected whenever top_k <= C.
    """
    v = lg.shape[-1]
    if candidate_cap and candidate_cap < v:
        vals, idx = jax.lax.top_k(lg, candidate_cap)    # [B, C]
        sp = jax.vmap(_filter_row)(
            vals, temperature, top_k, top_p, min_p, typical
        )
        choice = jax.vmap(
            lambda p, k: jax.random.categorical(k, jnp.log(p + 1e-30))
        )(sp, keys)
        return jnp.take_along_axis(
            idx, choice[:, None], axis=1
        )[:, 0].astype(jnp.int32)
    sp = jax.vmap(_filter_row)(
        lg, temperature, top_k, top_p, min_p, typical
    )
    return jax.vmap(
        lambda p, k: jax.random.categorical(k, jnp.log(p + 1e-30))
    )(sp, keys).astype(jnp.int32)
