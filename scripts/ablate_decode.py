"""Decode ablation at 7B: attribute the per-step budget by stubbing one
piece at a time (numerics-invalid, timing-valid). Fresh jit per variant
(patches are invisible to the jit cache), interleaved timing, 128-step
chained loops, latency excluded by construction (deltas).

PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/ablate_decode.py \
    [--impl pallas_a8x2]
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.models import llama as L

PROMPT = 1920
N = 128
REPS = 4


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="pallas_a8x2")
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"

    cfg = ExLlamaConfig()
    cfg.num_hidden_layers = 32
    cfg.max_seq_len = 2048
    cfg.max_input_len = 2048
    cfg.max_attention_size = 2048 ** 2
    params = make_synthetic_params(cfg, 128, False, seed=0, fast=True)
    model = L.ExLlama(cfg, params=params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (1, PROMPT)), jnp.int32)
    cache = ExLlamaCache(model)
    model.forward(np.asarray(ids), cache, preprocess_only=True)
    sync(cache.state.k[0][0, 3, 0, :1])

    inner = L.forward_chunk.__wrapped__

    def fresh_jit():
        step = functools.partial(
            inner, attend_len=cfg.max_seq_len, last_token_only=True,
            preprocess_only=False, heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
            eps=cfg.rms_norm_eps, matmul_impl=args.impl,
            head_mode="argmax",
        )

        @functools.partial(jax.jit, donate_argnums=(1,))
        def decode_n(params, kv, tok, past):
            def body(i, carry):
                kv, tok, pos = carry
                tok, kv = step(params, kv, tok, pos, None, None)
                return kv, tok, pos + 1
            kv, tok, pos = jax.lax.fori_loop(0, N, body, (kv, tok, past))
            return kv, tok
        return decode_n

    real_attend = L.attend
    real_commit_mod = sys.modules["exllama_tpu.ops.attention"]
    real_commit = real_commit_mod.commit_kv_cache
    real_mm = L.q4_matmul
    from exllama_tpu.ops import dense as D
    real_head = D.head_argmax
    from exllama_tpu.ops import attn_block as AB
    real_tail = AB.layer_tail

    def no_commit(kc, vc, nk, nv, past, ks=None, vs=None, impl="auto",
                  interpret=False):
        return kc, vc, ks, vs

    def fake_mm(x, qt, impl="auto", lora=None, norm_w=None, norm_eps=1e-6):
        return jnp.zeros((*x.shape[:-1], qt.out_features), x.dtype)

    def fake_head(h, norm_w, w, eps, impl="auto"):
        return jnp.zeros((h.shape[0], 1), jnp.int32)

    def tail_no_attn(h, q, kc, vc, past, al, o, pn, gu, dn, eps, new_kv,
                     input_mask=None, k_scale=None, v_scale=None,
                     impl="pallas"):
        # skip the fused layer kernel entirely: o-proj+MLP via plain calls
        from exllama_tpu.ops.mlp import q4_mlp
        b, t, hh, d = q.shape
        attn = q.reshape(b, t, hh * d)
        h = h + L.q4_matmul(attn, o, impl=impl)
        return q4_mlp(h, pn, gu, dn, eps, impl=impl)

    variants = [
        ("base", lambda: None, lambda: None),
        ("no_commit",
         lambda: setattr(real_commit_mod, "commit_kv_cache", no_commit),
         lambda: setattr(real_commit_mod, "commit_kv_cache", real_commit)),
        ("no_head", lambda: setattr(D, "head_argmax", fake_head),
         lambda: setattr(D, "head_argmax", real_head)),
        ("no_attn_tail",
         lambda: setattr(AB, "layer_tail", tail_no_attn),
         lambda: setattr(AB, "layer_tail", real_tail)),
        ("no_matmul", lambda: setattr(L, "q4_matmul", fake_mm),
         lambda: setattr(L, "q4_matmul", real_mm)),
    ]

    # forward_chunk imports commit_kv_cache and head_argmax lazily inside
    # the function body, so module-attr patches are seen at trace time.
    fns = {}
    kv = cache.state
    tok0 = jnp.asarray([[1]], jnp.int32)
    past = jnp.int32(PROMPT)
    for name, patch, unpatch in variants:
        patch()
        try:
            fn = fresh_jit()
            t0 = time.time()
            kv, tok = fn(model.params, kv, tok0, past)
            sync(tok)
            fns[name] = fn
            print(f" -- compiled {name} ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f" !! {name} failed: {str(e).splitlines()[0][:160]}",
                  flush=True)
        finally:
            unpatch()

    times = {n: [] for n in fns}
    for _ in range(REPS):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            kv, tok = fn(model.params, kv, tok0, past)
            sync(tok)
            times[name].append(time.perf_counter() - t0)

    base = min(times["base"])
    print(f"\nbase ({args.impl}): {base/N*1e3:.3f} ms/tok "
          f"({N/base:.1f} tok/s naive)", flush=True)
    for name in times:
        if name == "base":
            continue
        t = min(times[name])
        print(f"{name}: {t/N*1e3:.3f} ms/tok -> piece costs "
              f"{(base-t)/N*1e3:.3f} ms/tok", flush=True)


if __name__ == "__main__":
    main()
