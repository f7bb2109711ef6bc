"""Sequence parallelism: KV cache sharded over the sequence axis + ring
attention for prefill.

No reference counterpart — the reference's longest context is bounded by one
GPU's VRAM and handled by chunked prefill + RoPE scaling (SURVEY.md §5).
On TPU the sequence axis shards over an ``sp`` mesh axis so a context can
span many chips' HBM:

  * **Decode** (``sp_attend``): each shard holds S/sp cache rows and runs
    local online-softmax attention; shards combine with the standard
    log-sum-exp reduction — ``psum`` of the rescaled unnormalized outputs
    and ``pmax`` of the row maxima — one collective round per step, riding
    ICI. This is "distributed flash decoding".
  * **Cache writes** (``sp_update_kv_cache``): position p lives on shard
    p // S_local; non-owners write their existing rows back (a masked
    no-op), so the op is uniform across shards (SPMD-safe).
  * **Prefill** (``ring_attend_prefill``): queries stay sharded; KV blocks
    rotate around the ring via ``ppermute`` (classic ring attention).
    Causality is enforced per (query-shard, kv-shard) pair from global
    positions, so each shard skips nothing it needs and double-counts
    nothing.

All functions are written to run INSIDE ``shard_map`` over a mesh with an
``sp`` axis (tests use the 8-device CPU mesh; tp/dp axes compose the usual
way — KV here shards as [B, Hkv(tp), S(sp), D]).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG = -0.7 * float(np.finfo(np.float32).max)


def make_sp_mesh(sp: int, tp: int = 1, dp: int = 1,
                 devices: Optional[list] = None) -> Mesh:
    """3-axis mesh (dp, tp, sp); sp innermost so it rides ICI."""
    devices = devices if devices is not None else jax.devices()
    n = dp * tp * sp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, tp, sp)
    return Mesh(arr, axis_names=("dp", "tp", "sp"))


def sp_cache_sharding(mesh: Mesh) -> NamedSharding:
    """Per-layer KV [B, Hkv, S, D]: batch over dp, heads over tp, SEQUENCE
    over sp."""
    return NamedSharding(mesh, P("dp", "tp", "sp", None))


# ---------------------------------------------------------------------------
# shard_map-internal pieces
# ---------------------------------------------------------------------------

def _local_stats(q, k, v, valid):
    """Unnormalized local attention: returns (o_unnorm, l, m).

    q [B,T,H,D]; k/v [B,Hkv,S_loc,D]; valid [B,T,S_loc] bool (causal+mask).
    o_unnorm = sum_s exp(s - m) v; caller rescales by global m and sums l.
    """
    b, t, h, d = q.shape
    hkv = k.shape[1]
    g = h // hkv
    qf = q.reshape(b, t, hkv, g, d)
    s = jnp.einsum("bthgd,bhsd->bhgts", qf, k,
                   preferred_element_type=jnp.float32)
    s = s * (1.0 / (d ** 0.5))
    vmask = valid[:, None, None, :, :]                  # [B,1,1,T,S]
    s = jnp.where(vmask, s, _NEG)
    m = jnp.max(s, axis=-1)                             # [B,Hkv,G,T]
    m = jnp.maximum(m, -1e30)                           # all-masked guard
    p = jnp.exp(s - m[..., None])
    p = jnp.where(vmask, p, 0.0)
    l = jnp.sum(p, axis=-1)                             # [B,Hkv,G,T]
    o = jnp.einsum("bhgts,bhsd->bhgtd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)  # [B,Hkv,G,T,D]
    return o, l, m


def _finish(o, l, m, q_shape, dtype):
    b, t, h, d = q_shape
    l = jnp.where(l == 0.0, 1.0, l)
    out = o / l[..., None]
    hkv = out.shape[1]
    out = out.transpose(0, 3, 1, 2, 4).reshape(b, t, h, d)
    return out.astype(dtype)


def sp_attend(
    q: jax.Array,          # [B, T, H, D] replicated over sp
    k_shard: jax.Array,    # [B, Hkv, S_loc, D] this shard's cache rows
    v_shard: jax.Array,
    past_len: jax.Array,   # scalar int32 (or [B])
    axis: str = "sp",
    k_scale: Optional[jax.Array] = None,   # [B, Hkv, S_loc] f32 (int8 KV)
    v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Decode/short-T attention over sequence-sharded KV (inside shard_map).

    Combines shards with the flash-style LSE reduction: one pmax + two
    psums over ``axis`` per step. int8 caches pass per-row scale strips
    and dequantize on this shard's rows only.
    """
    b, t, h, d = q.shape
    s_loc = k_shard.shape[2]
    if k_shard.shape[-1] != d:     # packed int4 KV (D/2 bytes)
        from exllama_tpu.ops.attention import unpack_kv4

        k_shard = unpack_kv4(k_shard, jnp.float32)
        v_shard = unpack_kv4(v_shard, jnp.float32)
    if k_scale is not None:
        k_shard = (
            k_shard.astype(jnp.float32) * k_scale[..., None]
        ).astype(q.dtype)
        v_shard = (
            v_shard.astype(jnp.float32) * v_scale[..., None]
        ).astype(q.dtype)
    idx = jax.lax.axis_index(axis)
    offset = idx * s_loc

    pos = offset + jnp.arange(s_loc, dtype=jnp.int32)   # global positions
    t_off = jnp.arange(t, dtype=jnp.int32)
    if past_len.ndim == 1:
        t_pos = past_len[:, None] + t_off[None, :]      # [B, T]
        valid = pos[None, None, :] <= t_pos[:, :, None]
    else:
        t_pos = past_len + t_off                        # [T]
        valid = jnp.broadcast_to(
            pos[None, None, :] <= t_pos[None, :, None], (b, t, s_loc)
        )

    o, l, m = _local_stats(q, k_shard, v_shard, valid)
    m_g = jax.lax.pmax(m, axis)
    corr = jnp.exp(m - m_g)
    l_g = jax.lax.psum(l * corr, axis)
    o_g = jax.lax.psum(o * corr[..., None], axis)
    return _finish(o_g, l_g, m_g, q.shape, q.dtype)


def sp_update_kv_cache(
    k_shard: jax.Array,    # [B, Hkv, S_loc, D]
    v_shard: jax.Array,
    new_k: jax.Array,      # [B, T, Hkv, D] (T small; decode T=1)
    new_v: jax.Array,
    past_len: jax.Array,   # scalar int32
    axis: str = "sp",
    k_scale: Optional[jax.Array] = None,   # [B, Hkv, S_loc] f32 (int8 KV)
    v_scale: Optional[jax.Array] = None,
):
    """Owner-masked cache write (inside shard_map): position past_len+i goes
    to shard (past_len+i) // S_loc; other shards rewrite their own rows.
    int8 caches quantize the new rows per head and write scale strips the
    same owner-masked way. Returns (k, v) or (k, v, k_scale, v_scale)."""
    b, t, hkv, d = new_k.shape
    s_loc = k_shard.shape[2]
    idx = jax.lax.axis_index(axis)
    quantized = k_scale is not None
    if quantized:
        from exllama_tpu.ops.attention import (
            quantize_kv_rows,
            quantize_kv_rows4,
        )

        quant = (
            quantize_kv_rows4
            if k_shard.shape[-1] != new_k.shape[-1]   # packed int4 cache
            else quantize_kv_rows
        )
        qk, sk = quant(new_k)                 # [B,T,Hkv,D(/2)], [B,T,Hkv]
        qv, sv = quant(new_v)
        nk = jnp.swapaxes(qk, 1, 2)           # [B, Hkv, T, D]
        nv = jnp.swapaxes(qv, 1, 2)
        nks = jnp.swapaxes(sk, 1, 2)          # [B, Hkv, T]
        nvs = jnp.swapaxes(sv, 1, 2)
    else:
        nk = jnp.swapaxes(new_k, 1, 2)        # [B, Hkv, T, D]
        nv = jnp.swapaxes(new_v, 1, 2)

    dw = nk.shape[-1]            # D, or D/2 for packed int4 rows

    def write_one(i, carry):
        kc, vc, ksc, vsc = carry
        p = past_len.astype(jnp.int32) + i
        own = (p // s_loc) == idx
        loc = p % s_loc
        krow = jax.lax.dynamic_slice(
            nk, (0, 0, i, 0), (b, hkv, 1, dw)
        ).astype(kc.dtype)
        vrow = jax.lax.dynamic_slice(
            nv, (0, 0, i, 0), (b, hkv, 1, dw)
        ).astype(vc.dtype)
        kcur = jax.lax.dynamic_slice(kc, (0, 0, loc, 0), (b, hkv, 1, dw))
        vcur = jax.lax.dynamic_slice(vc, (0, 0, loc, 0), (b, hkv, 1, dw))
        kc = jax.lax.dynamic_update_slice(
            kc, jnp.where(own, krow, kcur), (0, 0, loc, 0)
        )
        vc = jax.lax.dynamic_update_slice(
            vc, jnp.where(own, vrow, vcur), (0, 0, loc, 0)
        )
        if quantized:
            ksrow = jax.lax.dynamic_slice(nks, (0, 0, i), (b, hkv, 1))
            vsrow = jax.lax.dynamic_slice(nvs, (0, 0, i), (b, hkv, 1))
            kscur = jax.lax.dynamic_slice(ksc, (0, 0, loc), (b, hkv, 1))
            vscur = jax.lax.dynamic_slice(vsc, (0, 0, loc), (b, hkv, 1))
            ksc = jax.lax.dynamic_update_slice(
                ksc, jnp.where(own, ksrow, kscur), (0, 0, loc)
            )
            vsc = jax.lax.dynamic_update_slice(
                vsc, jnp.where(own, vsrow, vscur), (0, 0, loc)
            )
        return kc, vc, ksc, vsc

    z = jnp.zeros((), jnp.float32)
    kc, vc, ksc, vsc = jax.lax.fori_loop(
        0, t, write_one,
        (k_shard, v_shard,
         k_scale if quantized else z, v_scale if quantized else z),
    )
    if quantized:
        return kc, vc, ksc, vsc
    return kc, vc


def ring_attend_prefill(
    q: jax.Array,          # [B, T_loc, H, D] sequence-sharded queries
    k: jax.Array,          # [B, T_loc, Hkv, D] sequence-sharded keys
    v: jax.Array,
    axis: str = "sp",
    axis_size: Optional[int] = None,
) -> jax.Array:
    """Causal ring attention (inside shard_map): KV rotates via ppermute.

    Query block stays put; after ``sp`` rotations every query has seen every
    KV block. Global causality from block offsets: query shard i holds
    positions [i*T_loc, (i+1)*T_loc); incoming KV block j likewise.
    """
    b, t_loc, h, d = q.shape
    hkv = k.shape[2]
    n = axis_size or jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]  # pass KV to the next shard

    kb = jnp.swapaxes(k, 1, 2)  # [B, Hkv, T_loc, D]
    vb = jnp.swapaxes(v, 1, 2)

    q_pos = idx * t_loc + jnp.arange(t_loc, dtype=jnp.int32)

    o = jnp.zeros((b, hkv, h // hkv, t_loc, d), jnp.float32)
    l = jnp.zeros((b, hkv, h // hkv, t_loc), jnp.float32)
    m = jnp.full((b, hkv, h // hkv, t_loc), -1e30, jnp.float32)
    # carries must be marked device-varying over the ring axis or the loop's
    # in/out types disagree (replicated in, varying out)
    o, l, m = (jax.lax.pvary(x, (axis,)) for x in (o, l, m))

    def step(r, carry):
        o, l, m, kb, vb = carry
        src = (idx - r) % n                 # whose block we hold this round
        kv_pos = src * t_loc + jnp.arange(t_loc, dtype=jnp.int32)
        valid = kv_pos[None, None, :] <= q_pos[None, :, None]
        valid = jnp.broadcast_to(valid, (b, t_loc, t_loc))
        o_r, l_r, m_r = _local_stats(q, kb, vb, valid)
        m_new = jnp.maximum(m, m_r)
        c_old = jnp.exp(m - m_new)
        c_r = jnp.exp(m_r - m_new)
        o = o * c_old[..., None] + o_r * c_r[..., None]
        l = l * c_old + l_r * c_r
        kb2 = jax.lax.ppermute(kb, axis, perm)
        vb2 = jax.lax.ppermute(vb, axis, perm)
        return o, l, m_new, kb2, vb2

    o, l, m, _, _ = jax.lax.fori_loop(0, n, step, (o, l, m, kb, vb))
    return _finish(o, l, m, q.shape, q.dtype)


# ---------------------------------------------------------------------------
# Full-model sequence-parallel decode step
# ---------------------------------------------------------------------------

def sp_kv_sharding(mesh: Mesh) -> NamedSharding:
    """KV sharding for the sp-only decode mode: [B, Hkv, S(sp), D]."""
    return NamedSharding(mesh, P(None, None, "sp", None))


def shard_cache_sp(cache, mesh: Mesh):
    """Place an ExLlamaCache's KV over the sp axis (sequence-sharded).
    int8 caches shard their [B, Hkv, S] scale strips the same way."""
    from exllama_tpu.cache import KVCacheState

    sh = sp_kv_sharding(mesh)
    sh3 = NamedSharding(mesh, P(None, None, "sp"))
    quantized = cache.state.k_scale is not None
    cache.state = KVCacheState(
        k=tuple(jax.device_put(x, sh) for x in cache.state.k),
        v=tuple(jax.device_put(x, sh) for x in cache.state.v),
        k_scale=tuple(
            jax.device_put(x, sh3) for x in cache.state.k_scale
        ) if quantized else None,
        v_scale=tuple(
            jax.device_put(x, sh3) for x in cache.state.v_scale
        ) if quantized else None,
    )
    return cache


def make_sp_decode_fn(model, mesh: Mesh):
    """Build a jitted decode step with the KV cache sharded over ``sp``.

    The model-integration mode for parallel/sequence.py: weights and the
    token replicate across the sp axis (each shard holds S/sp cache rows of
    every layer — the regime where the CONTEXT, not the weights, outgrows
    one chip's HBM); attention runs as distributed flash decoding
    (sp_attend) and cache writes are owner-masked (sp_update_kv_cache).
    One pmax + two psums per layer ride ICI. Composes with the generator
    loop exactly like forward_chunk: ``fn(params, kv, tok, past) →
    (logits, kv)``.
    """
    import functools

    from exllama_tpu.cache import KVCacheState
    from exllama_tpu.formats.gptq import padded_n
    from exllama_tpu.ops.norms import rms_norm
    from exllama_tpu.ops.quant import q4_matmul
    from exllama_tpu.ops.rope import apply_rope_sliced, slice_tables

    try:
        from jax.experimental.shard_map import shard_map
    except ImportError:  # newer jax
        from jax.sharding import shard_map

    cfg = model.config
    heads, kv_heads, d = (
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    )
    eps = cfg.rms_norm_eps
    impl = model._matmul_impl()
    nq, nkv = heads * d, kv_heads * d

    def step(params, kv, tok, past):
        b, t = tok.shape
        quantized = kv.k_scale is not None
        h = jnp.take(params.embed, tok, axis=0)
        sin_t, cos_t = slice_tables(
            params.rope_sin, params.rope_cos, past, t
        )
        k_new, v_new, ks_new, vs_new = [], [], [], []
        for li, lp in enumerate(params.layers):
            a = rms_norm(h, lp.input_norm, eps)
            if lp.qkv is not None:
                fused = q4_matmul(a, lp.qkv, impl=impl)
                ok = padded_n(nq)
                ov = ok + padded_n(nkv)
                q = fused[..., :nq]
                k = fused[..., ok : ok + nkv]
                v = fused[..., ov : ov + nkv]
            else:
                q = q4_matmul(a, lp.q, impl=impl)
                k = q4_matmul(a, lp.k, impl=impl)
                v = q4_matmul(a, lp.v, impl=impl)
            q = apply_rope_sliced(q.reshape(b, t, heads, d), sin_t, cos_t)
            k = apply_rope_sliced(k.reshape(b, t, kv_heads, d), sin_t, cos_t)
            v = v.reshape(b, t, kv_heads, d)
            if quantized:
                kc, vc, ksc, vsc = sp_update_kv_cache(
                    kv.k[li], kv.v[li], k, v, past,
                    k_scale=kv.k_scale[li], v_scale=kv.v_scale[li],
                )
                attn = sp_attend(q, kc, vc, past, k_scale=ksc, v_scale=vsc)
                ks_new.append(ksc)
                vs_new.append(vsc)
            else:
                kc, vc = sp_update_kv_cache(
                    kv.k[li], kv.v[li], k, v, past
                )
                attn = sp_attend(q, kc, vc, past)
            k_new.append(kc)
            v_new.append(vc)
            h = h + q4_matmul(
                attn.reshape(b, t, nq), lp.o, impl=impl
            )
            a = rms_norm(h, lp.post_norm, eps)
            if lp.gateup is not None:
                ni = lp.down.in_features
                fu = q4_matmul(a, lp.gateup, impl=impl)
                ou = padded_n(ni)
                g, u = fu[..., :ni], fu[..., ou : ou + ni]
            else:
                g = q4_matmul(a, lp.gate, impl=impl)
                u = q4_matmul(a, lp.up, impl=impl)
            h = h + q4_matmul(
                jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u,
                lp.down, impl=impl,
            )
        h2 = rms_norm(h[:, -1:, :], params.norm, eps)
        logits = jnp.dot(
            h2, params.lm_head, preferred_element_type=jnp.float32
        )
        return logits, KVCacheState(
            tuple(k_new), tuple(v_new),
            k_scale=tuple(ks_new) if quantized else None,
            v_scale=tuple(vs_new) if quantized else None,
        )

    kv_spec = P(None, None, "sp", None)
    sc_spec = P(None, None, "sp")
    rep = lambda tree: jax.tree.map(lambda _: P(), tree)

    def kv_specs(kv):
        quantized = kv.k_scale is not None
        return KVCacheState(
            k=tuple(kv_spec for _ in kv.k),
            v=tuple(kv_spec for _ in kv.v),
            k_scale=tuple(sc_spec for _ in kv.k_scale) if quantized else None,
            v_scale=tuple(sc_spec for _ in kv.v_scale) if quantized else None,
        )

    @functools.partial(jax.jit, donate_argnames=("kv",))
    def fn(params, kv, tok, past):
        mapped = shard_map(
            step,
            mesh=mesh,
            in_specs=(rep(params), kv_specs(kv), P(), P()),
            out_specs=(P(), kv_specs(kv)),
            check_rep=False,
        )
        return mapped(params, kv, tok, past)

    return fn
