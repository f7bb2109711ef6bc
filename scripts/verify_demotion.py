"""Verify the round-5 short-attend demotion end-to-end on the real TPU.

Drives the public forward path (full-width 7B matrices, 2 layers) and
compares decode-step logits between attn_impl="flash" (pinned) and
attn_impl="auto" (demoted to xla at B=1 attend<=1024 and B*attend<=8192)
on the same prefilled cache. Contract: max|delta| within bf16
accumulation-order noise (<= ~2-3% of logit scale).

PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/verify_demotion.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from exllama_tpu.cache import ExLlamaCache
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.models.llama import forward_chunk, ExLlama
    from exllama_tpu.formats.loader import make_synthetic_params

    assert jax.default_backend() == "tpu", jax.default_backend()

    cfg = ExLlamaConfig()
    cfg.num_hidden_layers = 2
    cfg.max_seq_len = 1024
    cfg.max_input_len = 1024
    params = make_synthetic_params(cfg, 128, False, seed=3, fast=True)
    model = ExLlama(cfg, params=params)

    common = dict(
        heads=cfg.num_attention_heads, kv_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim, eps=cfg.rms_norm_eps,
        matmul_impl="pallas", last_token_only=True, preprocess_only=False,
    )

    rng = np.random.default_rng(0)
    ok = True
    for b, attend in ((1, 1024), (1, 256), (4, 1024)):
        ids = rng.integers(2, cfg.vocab_size, (b, 48)).astype(np.int32)
        tok = rng.integers(2, cfg.vocab_size, (b, 1)).astype(np.int32)
        outs = {}
        for impl in ("flash", "auto"):
            # fresh prefill per impl: forward_chunk donates the kv state
            cache = ExLlamaCache(model, batch_size=b)
            model.forward(ids, cache, preprocess_only=True)
            lg, _ = forward_chunk(
                model.params, cache.state, jnp.asarray(tok),
                jnp.int32(cache.current_seq_len), None, None,
                attend_len=attend, attn_impl=impl, **common,
            )
            outs[impl] = np.asarray(lg, np.float32)
        scale = np.abs(outs["flash"]).max()
        d = np.abs(outs["flash"] - outs["auto"]).max()
        rel = d / scale
        verdict = "ok" if rel < 0.03 else "FAIL"
        ok &= verdict == "ok"
        log(f"B={b} attend={attend}: max|d|={d:.4f} scale={scale:.2f} "
            f"rel={rel:.4%} -> {verdict}")
    print("PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
