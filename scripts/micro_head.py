"""Isolate the lm_head cost in the best-ctx decode step: time the chained
step with (a) no head at all (preprocess_only), (b) dense bf16 head via the
fused head_argmax kernel, (c) dense head via plain dense_matmul+argmax,
(d) quantized (q4) head. Two-length fits, min-timed, one process.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_head.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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

    def build(quant_head=False):
        cfg = ExLlamaConfig()
        cfg.max_seq_len = 2048
        cfg.max_input_len = 2048
        cfg.tuning.quantize_lm_head = quant_head
        params = make_synthetic_params(cfg, 128, False, seed=0, fast=True)
        return ExLlama(cfg, params=params)

    log("building models...")
    base = build()
    qh = build(quant_head=True)
    log("models built")

    def timed(model, tag, head_mode, preprocess=False):
        cfg = model.config
        cache = ExLlamaCache(model)
        step = functools.partial(
            forward_chunk,
            attend_len=256, last_token_only=True,
            preprocess_only=preprocess,
            heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
            eps=cfg.rms_norm_eps, matmul_impl="pallas",
            head_mode=head_mode,
        )

        @functools.partial(jax.jit, donate_argnames=("kv",),
                           static_argnames=("n",))
        def decode_n(params, kv, tok, past, n):
            def body(i, c):
                kv, tok, pos = c
                out, kv = step(params, kv, tok, pos, None, None)
                if preprocess:
                    nxt = tok
                elif head_mode == "logits":
                    nxt = jnp.argmax(out[:, -1, :], -1)[:, None].astype(
                        jnp.int32
                    )
                else:
                    nxt = out.reshape(1, 1).astype(jnp.int32) % 32000
                return kv, nxt, pos + 1
            kv, tok, pos = jax.lax.fori_loop(0, n, body, (kv, tok, past))
            return kv, tok

        log(f"compiling {tag}...")
        tok0 = jnp.asarray([[1]], jnp.int32)
        kv = cache.state
        for n in (32, 128):
            kv, tok = decode_n(model.params, kv, tok0, jnp.int32(1), n)
            np.asarray(tok).ravel()[0]
        ts = {32: [], 128: []}
        for _ in range(5):
            for n in (128, 32):
                t0 = time.perf_counter()
                kv, tok = decode_n(model.params, kv, tok0, jnp.int32(1), n)
                np.asarray(tok).ravel()[0]
                ts[n].append(time.perf_counter() - t0)
        per = (min(ts[128]) - min(ts[32])) / 96
        log(f"{tag:28s}: {per*1e3:.3f} ms/tok = {1/per:.1f} t/s")
        return per

    t_none = timed(base, "no head (preprocess_only)", "logits",
                   preprocess=True)
    t_argmax = timed(base, "dense head_argmax kernel", "argmax")
    t_logits = timed(base, "dense logits + jnp argmax", "logits")
    t_q4 = timed(qh, "q4 head + argmax", "argmax")
    log(f"head costs vs no-head: argmax_kernel "
        f"{(t_argmax-t_none)*1e3:.3f} ms, q4 {(t_q4-t_none)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
