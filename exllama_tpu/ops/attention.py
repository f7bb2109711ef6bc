"""GQA attention over a preallocated KV cache.

TPU-native re-design of the reference's attention paths (model.py:295-502).
The reference picks between flash-attn-2, explicit matmul-softmax-matmul, and
torch SDPA by row-count thresholds; here there is one masked-attention
formulation built from einsums that XLA fuses, with GQA handled by reshaping
q to [B, T, Hkv, G, D] and broadcasting against the KV heads — the KV tensor
is never materialized per query head (the reference materializes repeat_kv,
model.py:310-319; on TPU that would waste HBM bandwidth).

The KV cache layout is [B, S_max, Hkv, D] (sequence-major: new rows from a
decode/prefill step form a contiguous dynamic-update-slice, and attention
reads stream linearly over HBM). ``attend_len`` is a static bound on how much
of the cache is read — the host rounds the live length up to a bucket
(TuningParams.attn_len_bucket) so decode doesn't stream the whole max_seq_len
cache on short contexts; masking handles the remainder exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # additive mask value (reference uses fp16 -65504, model.py:1014)


def update_kv_cache(
    k_cache: jax.Array,   # [B, S_max, Hkv, D]
    v_cache: jax.Array,
    new_k: jax.Array,     # [B, T, Hkv, D]
    new_v: jax.Array,
    past_len: jax.Array,  # scalar int32, or [B] for per-slot cursors
) -> tuple[jax.Array, jax.Array]:
    """Write T new KV rows at position past_len (functional update).

    Analogue of the reference's cache write (model.py:440-443 and
    update_cache_kernel, q4_attn.cu:19-72). Under jit with donated cache
    buffers XLA performs this in place. A [B]-shaped past_len writes each
    batch row at its own offset (continuous-batching slots).
    """
    if past_len.ndim == 1:
        def row(kc, vc, nk, nv, p):
            z = jnp.zeros((), jnp.int32)
            kc = jax.lax.dynamic_update_slice(
                kc, nk.astype(kc.dtype), (p.astype(jnp.int32), z, z)
            )
            vc = jax.lax.dynamic_update_slice(
                vc, nv.astype(vc.dtype), (p.astype(jnp.int32), z, z)
            )
            return kc, vc

        return jax.vmap(row)(k_cache, v_cache, new_k, new_v, past_len)

    zeros = (jnp.zeros((), jnp.int32),) * 2
    start = (jnp.zeros((), jnp.int32), past_len.astype(jnp.int32)) + zeros
    k_cache = jax.lax.dynamic_update_slice(k_cache, new_k.astype(k_cache.dtype), start)
    v_cache = jax.lax.dynamic_update_slice(v_cache, new_v.astype(v_cache.dtype), start)
    return k_cache, v_cache


def attend(
    q: jax.Array,          # [B, T, H, D]
    k_cache: jax.Array,    # [B, S_max, Hkv, D]
    v_cache: jax.Array,    # [B, S_max, Hkv, D]
    past_len: jax.Array,   # scalar or [B]: queries are at positions past_len+t
    attend_len: int,       # static: read cache[:, :attend_len]
    input_mask: Optional[jax.Array] = None,  # [B, S_max] bool, True = valid
) -> jax.Array:
    """Masked causal GQA attention. Returns [B, T, H, D] in q.dtype.

    Causality: query t attends to cache position s iff s <= past_len + t
    (and s < attend_len, and input_mask[b, s] if given — the reference's
    left-padding mask for batched generation, model.py:1014-1033).
    A [B]-shaped past_len gives each row its own cursor (continuous
    batching slots).
    """
    b, t, h, d = q.shape
    hkv = k_cache.shape[2]
    g = h // hkv

    k = k_cache[:, :attend_len]
    v = v_cache[:, :attend_len]

    qf = q.reshape(b, t, hkv, g, d)
    scale = 1.0 / (d ** 0.5)
    # scores [B, Hkv, G, T, S]
    scores = jnp.einsum(
        "bthgd,bshd->bhgts", qf, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale

    s_pos = jnp.arange(attend_len, dtype=jnp.int32)    # [S]
    t_off = jnp.arange(t, dtype=jnp.int32)             # [T]
    if past_len.ndim == 1:
        t_pos = past_len[:, None] + t_off[None, :]     # [B, T]
        causal = s_pos[None, None, :] <= t_pos[:, :, None]  # [B, T, S]
        mask = causal[:, None, None, :, :]
    else:
        t_pos = past_len + t_off[:, None]              # [T, 1]
        causal = s_pos[None, :] <= t_pos               # [T, S]
        mask = causal[None, None, None, :, :]
    if input_mask is not None:
        valid = input_mask[:, :attend_len][:, None, None, None, :]
        mask = jnp.logical_and(mask, valid)
    scores = jnp.where(mask, scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, v)
    return out.reshape(b, t, h, d).astype(q.dtype)
