"""Best-context decode A/B on the real TPU (reference "Best" = first 128
tokens on near-empty context, README.md:154-156; its 4090 number is 173).

Times variants back-to-back in one process (pool noise makes cross-run
comparison unsound): the model-only cost (chained argmax forward steps) and
the full bench path (gen_tokens: sampler stack + history update), across
the fusion/head knobs that could close the ~1.5 ms/step fixed overhead.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_best.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DECODE_LEN = 128


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from exllama_tpu.cache import ExLlamaCache
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.models.llama import ExLlama, forward_chunk

    assert jax.default_backend() == "tpu"

    def build(quant_head=False, bucket=256):
        cfg = ExLlamaConfig()
        cfg.max_seq_len = 2048
        cfg.max_input_len = 2048
        cfg.max_attention_size = 2048 ** 2
        cfg.tuning.attn_len_bucket = bucket
        cfg.tuning.quantize_lm_head = quant_head
        params = make_synthetic_params(cfg, 128, False, seed=0, fast=True)
        return ExLlama(cfg, params=params)

    base = build()
    qh = build(quant_head=True)

    @jax.jit
    def _ident(x):
        return x + 1

    z = jnp.zeros((8, 128), jnp.bfloat16)
    np.asarray(_ident(z))
    lat = min(
        (lambda t0: (np.asarray(_ident(z)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(8)
    )
    log(f"RPC latency {lat*1e3:.1f} ms")

    def timed_model(model, tag, **over):
        cfg = model.config
        cache = ExLlamaCache(model)
        step = functools.partial(
            forward_chunk,
            attend_len=model._attend_len(1 + DECODE_LEN),
            last_token_only=True, preprocess_only=False,
            heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
            eps=cfg.rms_norm_eps, matmul_impl="pallas",
            head_mode="argmax", **over,
        )

        @functools.partial(jax.jit, donate_argnames=("kv",),
                           static_argnames=("n",))
        def decode_n(params, kv, tok, past, n):
            def body(i, c):
                kv, tok, pos = c
                tok, kv = step(params, kv, tok, pos, None, None)
                return kv, tok.reshape(1, 1).astype(jnp.int32), pos + 1
            kv, tok, pos = jax.lax.fori_loop(0, n, body, (kv, tok, past))
            return kv, tok

        tok0 = jnp.asarray([[1]], jnp.int32)
        kv = cache.state
        for n in (32, 128):
            kv, tok = decode_n(model.params, kv, tok0, jnp.int32(1), n)
            np.asarray(tok).ravel()[0]
        ts = {32: [], 128: []}
        for _ in range(4):
            for n in (128, 32):
                t0 = time.perf_counter()
                kv, tok = decode_n(model.params, kv, tok0, jnp.int32(1), n)
                np.asarray(tok).ravel()[0]
                ts[n].append(time.perf_counter() - t0)
        per = (min(ts[128]) - min(ts[32])) / 96
        log(f"{tag:24s} model-only: {per*1e3:.3f} ms/tok = {1/per:.1f} t/s")
        return 1 / per

    res = {}
    res["base"] = timed_model(base, "base (fused default)")
    res["qkvfuse"] = timed_model(base, "qkv_fuse (layer_step)",
                                 qkv_fuse=True)
    res["qhead"] = timed_model(qh, "quantized lm_head")
    res["qhead_qkv"] = timed_model(qh, "quantized head + qkvfuse",
                                   qkv_fuse=True)
    b128 = build(bucket=128)
    res["bucket128"] = timed_model(b128, "attn bucket 128")

    # full bench path (sampler included) on the best variant and base
    from exllama_tpu.generator import ExLlamaGenerator
    from exllama_tpu.tokenizer import FakeTokenizer

    def timed_bench(model, tag):
        cache = ExLlamaCache(model)
        gen = ExLlamaGenerator(model, FakeTokenizer(), cache)
        gen.settings.top_k = 1
        gen.gen_begin(np.asarray([[1]], np.int32))
        for n in (32, 128):
            gen.gen_tokens(n)
            gen.gen_rewind(n)
        best = {32: [], 128: []}
        for _ in range(4):
            for n in (128, 32):
                t0 = time.perf_counter()
                gen.gen_tokens(n)
                gen.gen_rewind(n)
                best[n].append(time.perf_counter() - t0)
        per = (min(best[128]) - min(best[32])) / 96
        log(f"{tag:24s} bench-path: {per*1e3:.3f} ms/tok = {1/per:.1f} t/s")
        return 1 / per

    res["bench_base"] = timed_bench(base, "base")
    res["bench_qhead"] = timed_bench(qh, "quantized lm_head")
    print(json.dumps({k: round(v, 1) for k, v in res.items()}))


if __name__ == "__main__":
    main()
