"""Ablation timing of the decode step: which pieces cost what.

Each variant runs a 64-iteration in-jit decode loop on the 32-layer
7B-shaped model, min of 3 timed runs (the only reliable method here, see
.claude/skills/verify/SKILL.md).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.ops.attention import attend, update_kv_cache
from exllama_tpu.ops.norms import rms_norm
from exllama_tpu.ops.quant import q4_matmul
from exllama_tpu.ops.rope import apply_rope
from exllama_tpu.formats.gptq import padded_n

DECODE = 64


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def make_step(cfg, ablate: frozenset):
    heads, kv_heads, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                          cfg.head_dim)
    eps = cfg.rms_norm_eps
    nq = heads * d
    nkv = kv_heads * d

    def layer(h, lp, kc, vc, ksc, vsc, sin, cos, pos, past):
        b, t, hidden = h.shape
        a = h if "norms" in ablate else rms_norm(h, lp.input_norm, eps)
        if "qkv" in ablate:
            q = jnp.zeros((b, t, nq), h.dtype)
            k = jnp.zeros((b, t, nkv), h.dtype)
            v = jnp.zeros((b, t, nkv), h.dtype)
        else:
            fused = q4_matmul(a, lp.qkv, impl="pallas")
            ok = padded_n(nq)
            ov = ok + padded_n(nkv)
            q, k, v = (fused[..., :nq], fused[..., ok:ok + nkv],
                       fused[..., ov:ov + nkv])
        q = q.reshape(b, t, heads, d)
        k = k.reshape(b, t, kv_heads, d)
        v = v.reshape(b, t, kv_heads, d)
        if "rope" not in ablate:
            q = apply_rope(q, sin, cos, pos)
            k = apply_rope(k, sin, cos, pos)
        if "kvupd" not in ablate:
            kc, vc, ksc, vsc = update_kv_cache(kc, vc, k, v, past, ksc, vsc)
        if "attend" in ablate:
            attn = q
        else:
            attn = attend(q, kc, vc, past, cfg.max_seq_len, None,
                          impl="flash", k_scale=ksc, v_scale=vsc)
        if "oproj" not in ablate:
            h = h + q4_matmul(attn.reshape(b, t, nq), lp.o, impl="pallas")
        a = h if "norms" in ablate else rms_norm(h, lp.post_norm, eps)
        if "mlp" not in ablate:
            ni = lp.down.in_features
            fused = q4_matmul(a, lp.gateup, impl="pallas")
            ou = padded_n(ni)
            g, u = fused[..., :ni], fused[..., ou:ou + ni]
            x = jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u
            h = h + q4_matmul(x, lp.down, impl="pallas")
        return h, kc, vc, ksc, vsc

    def step(params, kv, tok, past):
        h = jnp.take(params.embed, tok, axis=0)
        pos = past + jnp.arange(tok.shape[1], dtype=jnp.int32)
        kn, vn, ksn, vsn = [], [], [], []
        qkv = kv.k_scale is not None
        for li, lp in enumerate(params.layers):
            h, kc, vc, ksc, vsc = layer(
                h, lp, kv.k[li], kv.v[li],
                kv.k_scale[li] if qkv else None,
                kv.v_scale[li] if qkv else None,
                params.rope_sin, params.rope_cos, pos, past)
            kn.append(kc); vn.append(vc); ksn.append(ksc); vsn.append(vsc)
        from exllama_tpu.cache import KVCacheState
        nkv2 = KVCacheState(tuple(kn), tuple(vn),
                            tuple(ksn) if qkv else None,
                            tuple(vsn) if qkv else None)
        if "head" in ablate:
            logits = h[:, -1:, :1].astype(jnp.float32)
            tok = jnp.zeros_like(tok)
            return logits, nkv2, tok
        h2 = rms_norm(h[:, -1:, :], params.norm, eps)
        logits = jnp.dot(h2, params.lm_head,
                         preferred_element_type=jnp.float32)
        tok = jnp.argmax(logits[:, -1, :], axis=-1)[:, None].astype(jnp.int32)
        return logits, nkv2, tok

    @functools.partial(jax.jit, donate_argnames=("kv",))
    def decode_n(params, kv, tok, past):
        def body(i, carry):
            kv, tok, pos = carry
            _, kv, tok = step(params, kv, tok, pos)
            return kv, tok, pos + 1
        kv, tok, pos = jax.lax.fori_loop(0, DECODE, body, (kv, tok, past))
        return kv, tok

    return decode_n


def main():
    variants = sys.argv[1:] or [
        "full", "attend", "kvupd+attend", "head", "mlp", "qkv",
        "norms", "rope",
    ]
    model = B.build_model(32)
    cfg = model.config
    cache = ExLlamaCache(model)
    past = jnp.int32(1920)
    tok0 = jnp.asarray([[1]], jnp.int32)

    def sync(x):
        return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]

    for name in variants:
        ab = frozenset() if name == "full" else frozenset(name.split("+"))
        fn = make_step(cfg, ab)
        kv = ExLlamaCache(model).state
        kv, tok = fn(model.params, kv, tok0, past)
        sync(tok)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            kv, tok = fn(model.params, kv, tok0, past)
            sync(tok)
            times.append(time.perf_counter() - t0)
        ms = min(times) / DECODE * 1e3
        log(f"{name:16s}: {ms:6.3f} ms/tok  ({1e3/ms:6.1f} tok/s)")


def prefill_main():
    """Prefill ablation: python .bench_ablate.py --prefill [variants...]"""
    variants = sys.argv[2:] or ["full", "attend", "mlp", "qkv", "norms+rope"]
    model = B.build_model(32)
    cfg = model.config
    PLEN = 1920

    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, size=(1, PLEN)).astype(np.int32)
    )

    def sync(x):
        return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]

    for name in variants:
        ab = frozenset() if name == "full" else frozenset(name.split("+"))
        fn = make_step_prefill(cfg, ab)
        kv = ExLlamaCache(model).state
        kv = fn(model.params, kv, ids, jnp.int32(0))
        sync(kv.k[0][0, 0, 0, :1])  # scalar fetch; whole-leaf fetch costs 300ms+
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            kv = fn(model.params, kv, ids, jnp.int32(0))
            sync(kv.k[0][0, 0, 0, :1])
            times.append(time.perf_counter() - t0)
        ms = min(times)
        log(f"prefill {name:12s}: {ms*1e3:7.1f} ms  ({PLEN/ms:7.0f} tok/s)")


def make_step_prefill(cfg, ablate: frozenset):
    heads, kv_heads, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                          cfg.head_dim)
    eps = cfg.rms_norm_eps
    nq = heads * d
    nkv = kv_heads * d

    def layer(h, lp, kc, vc, sin, cos, pos, past):
        b, t, hidden = h.shape
        a = h if "norms" in ablate else rms_norm(h, lp.input_norm, eps)
        if "qkv" in ablate:
            q = jnp.zeros((b, t, nq), h.dtype)
            k = jnp.zeros((b, t, nkv), h.dtype)
            v = jnp.zeros((b, t, nkv), h.dtype)
        else:
            fused = q4_matmul(a, lp.qkv, impl="pallas")
            ok = padded_n(nq)
            ov = ok + padded_n(nkv)
            q, k, v = (fused[..., :nq], fused[..., ok:ok + nkv],
                       fused[..., ov:ov + nkv])
        q = q.reshape(b, t, heads, d)
        k = k.reshape(b, t, kv_heads, d)
        v = v.reshape(b, t, kv_heads, d)
        if "rope" not in ablate:
            q = apply_rope(q, sin, cos, pos)
            k = apply_rope(k, sin, cos, pos)
        if "kvupd" not in ablate:
            kc, vc, _, _ = update_kv_cache(kc, vc, k, v, past)
        if "attend" in ablate:
            attn = q
        else:
            attn = attend(q, kc, vc, past, cfg.max_seq_len, None,
                          impl="flash")
        if "oproj" not in ablate:
            h = h + q4_matmul(attn.reshape(b, t, nq), lp.o, impl="pallas")
        a = h if "norms" in ablate else rms_norm(h, lp.post_norm, eps)
        if "mlp" not in ablate:
            ni = lp.down.in_features
            fused = q4_matmul(a, lp.gateup, impl="pallas")
            ou = padded_n(ni)
            g, u = fused[..., :ni], fused[..., ou:ou + ni]
            x = jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u
            h = h + q4_matmul(x, lp.down, impl="pallas")
        return h, kc, vc

    @functools.partial(jax.jit, donate_argnames=("kv",))
    def prefill(params, kv, toks, past):
        h = jnp.take(params.embed, toks, axis=0)
        pos = past + jnp.arange(toks.shape[1], dtype=jnp.int32)
        kn, vn = [], []
        for li, lp in enumerate(params.layers):
            h, kc, vc = layer(h, lp, kv.k[li], kv.v[li],
                              params.rope_sin, params.rope_cos, pos, past)
            kn.append(kc); vn.append(vc)
        from exllama_tpu.cache import KVCacheState
        return KVCacheState(tuple(kn), tuple(vn), None, None)

    return prefill


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--prefill":
        prefill_main()
    else:
        main()
