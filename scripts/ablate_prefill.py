"""Prefill ablation: time the real 16-layer prefill with individual
pieces stubbed out (numerics-invalid, timing-valid) to attribute the
per-layer budget. Monkeypatches are applied before each trace; every
variant gets its own jit so there is no stale-executable hazard.

PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/ablate_prefill.py
"""
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


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def build():
    cfg = ExLlamaConfig()
    cfg.num_hidden_layers = LAYERS
    cfg.max_seq_len = 2048
    cfg.max_input_len = 2048
    cfg.max_attention_size = 2048 ** 2
    params = make_synthetic_params(cfg, 128, False, seed=0, fast=True)
    return L.ExLlama(cfg, params=params)


def time_prefill(model, label):
    ids = (np.arange(PROMPT, dtype=np.int32)[None, :] * 31 + 7) % 32000

    def run():
        cache = ExLlamaCache(model)
        t0 = time.perf_counter()
        model.forward(ids, cache, preprocess_only=True)
        sync(cache.state.k[0][0, 3, 0, :1])
        return time.perf_counter() - t0

    run()  # compile
    best = min(run() for _ in range(3))
    print(f" -- {label}: {best*1e3:.1f} ms ({PROMPT/best:.0f} tok/s)",
          flush=True)
    return best


def main():
    assert jax.default_backend() == "tpu"
    model = build()

    base = time_prefill(model, "base")

    # (1) silu -> identity (removes the transcendental, keeps the mul)
    import jax.nn as jnn
    real_silu = jnn.silu
    jnn.silu = lambda x: x
    t = time_prefill(model, "silu=identity")
    jnn.silu = real_silu
    print(f"    silu cost: {(base-t)*1e3:.1f} ms", flush=True)

    # (2) attention -> passthrough (removes the flash kernel)
    real_attend = L.attend
    L.attend = lambda q, kc, vc, past, al, mask=None, **kw: q
    t = time_prefill(model, "attend=passthrough")
    L.attend = real_attend
    print(f"    attention cost: {(base-t)*1e3:.1f} ms", flush=True)

    # (3) KV write -> no-op
    real_upd = L.update_kv_cache
    L.update_kv_cache = lambda kc, vc, nk, nv, past, ks=None, vs=None: (
        kc, vc, ks, vs)
    t = time_prefill(model, "kvwrite=noop")
    L.update_kv_cache = real_upd
    print(f"    kv-write cost: {(base-t)*1e3:.1f} ms", flush=True)

    # (4) rope -> identity
    real_rope = L.apply_rope_sliced
    L.apply_rope_sliced = lambda x, s, c: x
    t = time_prefill(model, "rope=identity")
    L.apply_rope_sliced = real_rope
    print(f"    rope cost: {(base-t)*1e3:.1f} ms", flush=True)

    # (5) norms -> identity
    from exllama_tpu.ops import norms as N
    real_norm = L.rms_norm
    L.rms_norm = lambda x, w, eps: x
    t = time_prefill(model, "norm=identity")
    L.rms_norm = real_norm
    print(f"    norm cost: {(base-t)*1e3:.1f} ms", flush=True)

    # (6) matmuls -> cheap slice (removes ALL q4 kernels; keeps shapes via
    # zeros of the right width — everything else still runs)
    real_mm = L.q4_matmul
    def fake_mm(x, qt, impl="auto", lora=None, norm_w=None, norm_eps=1e-6):
        m = x.shape[:-1]
        from exllama_tpu.formats.gptq import padded_n
        return jnp.zeros(
            (*m, qt.out_features
             if qt.out_features % 1024 == 0 else qt.out_features),
            x.dtype,
        )
    L.q4_matmul = fake_mm
    t = time_prefill(model, "matmul=zeros")
    L.q4_matmul = real_mm
    print(f"    matmul cost: {(base-t)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
