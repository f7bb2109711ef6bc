"""Decompose the engine's batched (B=8) decode step cost on the real TPU.

VERDICT r4 item 5 asks for <=15 ms machine time per 8-slot/1024-ctx step;
round-5 cuts got 19.1 ms with sampler+rep already out of the path (greedy
bench config), so the remainder is the B=8 forward + step glue. This times
chained 128-step loops (one RPC per 128 steps -> raw/128 ~= machine time)
for nested components:

  nohead   : forward_chunk preprocess_only (layers only)
  argmax   : + lm_head argmax head (what the greedy engine needs)
  sep      : argmax with mlp_fuse=False, attn_fuse=False (megakernel gate
             check at B=8 -- the fuse defaults were A/B'd at B=1 only)
  glue     : + the engine step's history append / cursor math / eos bias
  rep      : glue + the windowed rep-penalty mask (cost when penalties on)
  sampler  : glue + full-vocab filter pipeline (cost when sampling on)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/ab_b8.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("AB_B8_SLOTS", "8"))
CTX = int(os.environ.get("AB_B8_CTX", "1024"))
STEPS = 128
LAYERS = int(os.environ.get("AB_B8_LAYERS", "32"))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from exllama_tpu.cache import ExLlamaCache
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.models.llama import ExLlama, forward_chunk
    from exllama_tpu.ops.sampling import filter_sample_rows
    from exllama_tpu.serve.engine import _rep_mask_windowed

    cfg = ExLlamaConfig()
    cfg.num_hidden_layers = LAYERS
    cfg.max_seq_len = CTX
    cfg.max_input_len = CTX
    cfg.max_attention_size = CTX ** 2
    params = make_synthetic_params(cfg, 128, False, seed=0, fast=True)
    model = ExLlama(cfg, params=params)

    def sync(x):
        return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]

    rng = np.random.default_rng(0)
    prompt_len = CTX - STEPS - 16
    cache = ExLlamaCache(model, batch_size=B)
    ids = rng.integers(0, cfg.vocab_size, size=(B, prompt_len)).astype(
        np.int32
    )
    model.forward(ids, cache, preprocess_only=True)
    sync(cache.state.k[0][0, 1, 0, :1])
    kv0 = cache.state
    log(f"prefill done (B={B}, ctx={CTX}, prompt={prompt_len})")

    def make(kind, fuse=True):
        nohead_kinds = ("nohead", "xla_attn", "attend512")
        step = functools.partial(
            forward_chunk,
            attend_len=512 if kind == "attend512" else CTX,
            last_token_only=True,
            preprocess_only=(kind in nohead_kinds),
            heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
            eps=cfg.rms_norm_eps, matmul_impl="pallas",
            mlp_fuse=fuse, attn_fuse=fuse,
            attn_impl="xla" if kind == "xla_attn" else "auto",
            head_mode="logits" if kind in ("rep", "sampler") else (
                "argmax" if kind not in nohead_kinds else "logits"),
        )

        @functools.partial(jax.jit, donate_argnames=("kv",))
        def loop(params, kv, tok, pos, seq_bufs, seq_lens, key, eos_ban):
            def body(i, c):
                kv, tok, pos, seq_bufs, seq_lens, key = c
                out, kv = step(params, kv, tok, pos, None, None)
                if kind in nohead_kinds:
                    nxt = tok
                elif kind in ("argmax", "sep"):
                    nxt = out.reshape(B, 1).astype(jnp.int32) % 32000
                    pos = pos + 1
                else:
                    lg = out.reshape(B, -1).astype(jnp.float32)
                    if kind == "rep":
                        vmask = _rep_mask_windowed(
                            seq_bufs, seq_lens, jnp.full((B,), 1.15),
                            lg.shape[-1], 256, 128,
                        )
                        lg = jnp.where(lg > 0, lg / vmask, lg * vmask)
                    lg = lg + eos_ban
                    if kind == "sampler":
                        key, sub = jax.random.split(key)
                        keys = jax.random.split(sub, B)
                        nt = filter_sample_rows(
                            lg, keys, jnp.full((B,), 0.8),
                            jnp.full((B,), 40, jnp.int32),
                            jnp.full((B,), 0.65), jnp.zeros((B,)),
                            jnp.zeros((B,)),
                        )
                    else:
                        nt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                    seq_bufs = jax.vmap(
                        lambda buf, t, l: jax.lax.dynamic_update_slice(
                            buf, t[None], (l,))
                    )(seq_bufs, nt, seq_lens)
                    seq_lens = seq_lens + 1
                    pos = pos + 1
                    nxt = nt[:, None]
                if kind in nohead_kinds:
                    pos = pos + 1
                return kv, nxt, pos, seq_bufs, seq_lens, key
            c = jax.lax.fori_loop(
                0, STEPS, body, (kv, tok, pos, seq_bufs, seq_lens, key))
            return c[0], c[1]
        return loop

    if os.environ.get("AB_B8_ATTN"):
        # attention-isolation set: the first run showed the B=8 layer
        # stack at 15.7 ms vs a 10.5 ms stream roofline with fusion
        # gates/glue/head all neutral -- localize attention vs GEMV.
        kinds = [("nohead", True), ("xla_attn", False),
                 ("attend512", True)]
    else:
        kinds = [("nohead", True), ("argmax", True), ("sep", False),
                 ("glue", True), ("rep", True), ("sampler", True)]
    tok0 = jnp.asarray(np.full((B, 1), 7, np.int32))
    seq_bufs0 = jnp.zeros((B, CTX), jnp.int32)
    eos_ban = jnp.zeros((B, cfg.vocab_size), jnp.float32)
    key0 = jax.random.PRNGKey(0)

    loops, kv = {}, kv0
    for kind, fuse in kinds:
        name = kind
        loops[name] = make(kind, fuse)
        t0 = time.time()
        pos0 = jnp.full((B,), prompt_len, jnp.int32)
        lens0 = jnp.full((B,), prompt_len, jnp.int32)
        kv, tok = loops[name](model.params, kv, tok0, pos0, seq_bufs0,
                              lens0, key0, eos_ban)
        sync(tok)
        log(f"compiled {name} ({time.time() - t0:.0f}s)")

    times = {n: [] for n, _ in kinds}
    for _ in range(4):
        for kind, fuse in kinds:
            name = kind
            pos0 = jnp.full((B,), prompt_len, jnp.int32)
            lens0 = jnp.full((B,), prompt_len, jnp.int32)
            t0 = time.perf_counter()
            kv, tok = loops[name](model.params, kv, tok0, pos0, seq_bufs0,
                                  lens0, key0, eos_ban)
            sync(tok)
            times[name].append(time.perf_counter() - t0)

    out = {}
    for name, ts in times.items():
        ms = min(ts) / STEPS * 1e3
        out[name] = round(ms, 2)
        log(f"{name:8s}: {ms:6.2f} ms/step  "
            f"(all: {[round(t / STEPS * 1e3, 2) for t in ts]})")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
