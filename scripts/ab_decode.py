"""Within-session A/B of decode-path configurations on the real TPU.

The shared pool's run-to-run noise makes cross-round comparisons unsound
(round-3 finding: even the unchanged prefill moved 10%); this script times
every variant in ONE process back-to-back, interleaving repeats, so
numbers are comparable. 128-token chained greedy decode at worst context,
identical to bench.py's methodology.

Usage: python scripts/ab_decode.py [--layers 32] [--variants a,b,...]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    # name: (kv_dtype, step overrides)
    "fused_strip": ("bf16", dict()),
    "fused_xla": ("bf16", dict(commit_impl="xla")),
    "sep_strip": ("bf16", dict(mlp_fuse=False, attn_fuse=False)),
    "sep_xla": ("bf16", dict(mlp_fuse=False, attn_fuse=False,
                             commit_impl="xla")),
    "qkvfuse_strip": ("bf16", dict(qkv_fuse=True)),
    "int8_fused": ("int8", dict()),
    "int8_sep": ("int8", dict(mlp_fuse=False, attn_fuse=False)),
    "int4_turbo_fused": ("int4", dict(matmul_impl="pallas_a8")),
    "int4_turbo_sep": ("int4", dict(matmul_impl="pallas_a8",
                                    mlp_fuse=False, attn_fuse=False)),
    "turbo_fused": ("int8", dict(matmul_impl="pallas_a8")),
    "turbo_sep": ("int8", dict(matmul_impl="pallas_a8",
                               mlp_fuse=False, attn_fuse=False)),
    # exact-grade two-pass W4A8 (bf16 KV): headline candidate
    "a8x2_fused": ("bf16", dict(matmul_impl="pallas_a8x2")),
    "a8x2_sep": ("bf16", dict(matmul_impl="pallas_a8x2",
                              mlp_fuse=False, attn_fuse=False)),
    "a8_bf16kv": ("bf16", dict(matmul_impl="pallas_a8")),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--decode_len", type=int, default=128)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--variants", default="fused_strip,fused_xla,"
                    "sep_strip,sep_xla")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from exllama_tpu.cache import ExLlamaCache
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.models.llama import ExLlama, forward_chunk

    cfg = ExLlamaConfig()
    cfg.num_hidden_layers = args.layers
    cfg.max_seq_len = 2048
    cfg.max_input_len = 2048
    cfg.max_attention_size = 2048 ** 2
    params = make_synthetic_params(cfg, groupsize=128, act_order=False,
                                   seed=0, fast=True)
    model = ExLlama(cfg, params=params)

    rng = np.random.default_rng(0)
    prompt_len, decode_len = 1920, args.decode_len
    ids = rng.integers(0, cfg.vocab_size,
                       size=(1, prompt_len)).astype(np.int32)

    def sync(x):
        return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]

    def make_decoder(**over):
        kw = dict(
            attend_len=cfg.max_seq_len, last_token_only=True,
            preprocess_only=False, heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
            eps=cfg.rms_norm_eps, matmul_impl=model._matmul_impl(),
            head_mode="argmax",
        )
        kw.update(over)
        step = functools.partial(forward_chunk, **kw)

        @functools.partial(jax.jit, donate_argnames=("kv",))
        def decode_n(params, kv, tok, past_len):
            def body(i, carry):
                kv, tok, pos = carry
                tok, kv = step(params, kv, tok, pos, None, None)
                return kv, tok, pos + 1
            kv, tok, pos = jax.lax.fori_loop(
                0, decode_len, body, (kv, tok, past_len))
            return kv, tok
        return decode_n

    names = args.variants.split(",")
    tok0 = jnp.asarray([[1]], jnp.int32)
    past = jnp.int32(prompt_len)

    # per-call RPC latency of the tunnel (subtracted from every timing)
    @jax.jit
    def _ident(x):
        return x + 1

    z8 = jnp.zeros((8, 128), jnp.bfloat16)
    sync(_ident(z8))
    lat = min(
        (lambda t0: (sync(_ident(z8)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(8)
    )
    print(f" -- per-call RPC latency {lat*1e3:.1f} ms", flush=True)

    # prefill once per kv dtype
    kv_of = {}
    for name in names:
        dt, _ = VARIANTS[name]
        if dt not in kv_of:
            c = ExLlamaCache(
                model, dtype={"bf16": jnp.bfloat16, "int8": jnp.int8,
                              "int4": "int4"}[dt])
            model.forward(ids, c, preprocess_only=True)
            sync(c.state.k[0][0, 17, 0, :1])
            kv_of[dt] = c.state
    print(" -- prefills ready", flush=True)

    # compile + warm all variants first (one live kv buffer per dtype,
    # threaded through every donating call)
    decs = {}
    for name in names:
        dt, over = VARIANTS[name]
        dec = make_decoder(**over)
        t0 = time.time()
        kv_of[dt], tok = dec(model.params, kv_of[dt], tok0, past)
        sync(tok)
        decs[name] = dec
        print(f" -- compiled {name} ({time.time()-t0:.0f}s)", flush=True)

    # interleaved timing: round-robin so pool drift hits all variants alike
    times = {n: [] for n in names}
    for _ in range(args.reps):
        for name in names:
            dec = decs[name]
            dt = VARIANTS[name][0]
            t0 = time.perf_counter()
            kv_of[dt], tok = dec(model.params, kv_of[dt], tok0, past)
            sync(tok)
            times[name].append(time.perf_counter() - t0)

    out = {"rpc_latency_ms": round(lat * 1e3, 1)}
    for name in names:
        t = min(times[name])
        ts = decode_len / max(t - lat, 1e-9)
        out[name] = round(ts, 2)
        print(f" -- {name}: {ts:.2f} tok/s  (raw {decode_len/t:.2f}; "
              f"all raw: {[round(decode_len/x, 1) for x in times[name]]})",
              flush=True)
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
