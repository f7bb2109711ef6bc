"""Prefill ablation: time the real prefill with individual pieces stubbed
out (numerics-invalid, timing-valid) to attribute the per-layer budget.

Each variant gets its OWN jax.jit wrapper created while its monkeypatch is
active (a module-level jitted function would silently reuse the base
executable — the patch is invisible to the jit cache). All variants are
then timed interleaved, so pool drift hits them alike.

PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/ablate_prefill.py
"""
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
LAYERS = 16
REPS = 4


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def main():
    assert jax.default_backend() == "tpu"
    cfg = ExLlamaConfig()
    cfg.num_hidden_layers = LAYERS
    cfg.max_seq_len = 2048
    cfg.max_input_len = 2048
    cfg.max_attention_size = 2048 ** 2
    params = make_synthetic_params(cfg, 128, False, seed=0, fast=True)
    model = L.ExLlama(cfg, params=params)
    ids = jnp.asarray(
        (np.arange(PROMPT, dtype=np.int32)[None, :] * 31 + 7) % 32000
    )

    inner = L.forward_chunk.__wrapped__   # un-jitted forward_chunk

    def fresh_jit():
        fc = functools.partial(
            inner,
            attend_len=cfg.max_seq_len,
            last_token_only=True,
            preprocess_only=True,
            heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim,
            eps=cfg.rms_norm_eps,
            matmul_impl="pallas",
        )

        @functools.partial(jax.jit, donate_argnums=(1,))
        def run(params, kv, toks):
            _, kv = fc(params, kv, toks, jnp.int32(0), None, None)
            return kv
        return run

    # (name, patch(), unpatch()) triples
    import jax.nn as jnn
    real_silu, real_attend = jnn.silu, L.attend
    real_upd, real_rope = L.update_kv_cache, L.apply_rope_sliced
    real_mm = L.q4_matmul

    def fake_mm(x, qt, impl="auto", lora=None, norm_w=None, norm_eps=1e-6):
        return jnp.zeros((*x.shape[:-1], qt.out_features), x.dtype)

    variants = [
        ("base", lambda: None, lambda: None),
        ("no_silu", lambda: setattr(jnn, "silu", lambda x: x),
         lambda: setattr(jnn, "silu", real_silu)),
        ("no_attend", lambda: setattr(
            L, "attend", lambda q, kc, vc, past, al, mask=None, **kw: q),
         lambda: setattr(L, "attend", real_attend)),
        ("no_kvwrite", lambda: setattr(
            L, "update_kv_cache",
            lambda kc, vc, nk, nv, past, ks=None, vs=None: (kc, vc, ks, vs)),
         lambda: setattr(L, "update_kv_cache", real_upd)),
        ("no_matmul", lambda: setattr(L, "q4_matmul", fake_mm),
         lambda: setattr(L, "q4_matmul", real_mm)),
        ("no_rope", lambda: setattr(
            L, "apply_rope_sliced", lambda x, s, c: x),
         lambda: setattr(L, "apply_rope_sliced", real_rope)),
    ]

    fns = {}
    kv = ExLlamaCache(model).state
    for name, patch, unpatch in variants:
        patch()
        try:
            fn = fresh_jit()
            t0 = time.time()
            kv = fn(model.params, kv, ids)   # trace+compile WITH the patch
            sync(kv.k[0][0, 3, 0, :1])
            print(f" -- compiled {name} ({time.time()-t0:.0f}s)", flush=True)
            fns[name] = fn
        finally:
            unpatch()

    times = {n: [] for n in fns}
    for _ in range(REPS):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            kv = fn(model.params, kv, ids)
            sync(kv.k[0][0, 3, 0, :1])
            times[name].append(time.perf_counter() - t0)

    base = min(times["base"])
    print(f"\nbase: {base*1e3:.1f} ms ({PROMPT/base:.0f} tok/s "
          f"at {LAYERS} layers)", flush=True)
    for name in times:
        if name == "base":
            continue
        t = min(times[name])
        print(f"{name}: {t*1e3:.1f} ms  -> piece costs {(base-t)*1e3:.1f} ms"
              f" ({(base-t)/LAYERS*1e3:.2f} ms/layer)", flush=True)


if __name__ == "__main__":
    main()
