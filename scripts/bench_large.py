"""Per-chip decode/prefill for the big BASELINE configs: 33B g128,
33B g128 act-order, 33B g32 act-order, 70B-GQA g128 act-order.

Counterparts: reference README.md:143-145 (33B rows) and README.md:175-176
(70B rows, dual-GPU there); BASELINE.md tables. The reference measures these
on real checkpoints; here the checkpoint is synthetic (identical
compute/memory profile — make_synthetic_params fast path) because the
environment has no model zoo (docs/PARITY.md).

Neither 33B (~17 GB int4 + scales) nor 70B (~36 GB) fits one v5e chip's
16 GB HBM, so this measures TRUNCATED-LAYER models at two depths L1 < L2
with identical per-layer shapes and separates the per-layer slope from the
fixed (embed/head/sampling) cost:

    t(L) = a·L + b   →   a = (t2−t1)/(L2−L1),  b = t1 − a·L1
    full-model tok/s = 1 / (a·L_full + b)

The per-layer slope `a` is the quantity the HBM roofline bounds, so the
reported roofline fraction (a vs per-layer-bytes/740 GB/s) is measured, not
extrapolated; only the total includes the linear extrapolation. On real
multi-chip hardware the full model runs TP over `parallel/mesh.py` instead.

Usage: python scripts/bench_large.py [33b-g128 33b-g128-act 33b-g32-act
                                      70b-g128-act] [--json OUT.json]
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PROMPT_LEN = 1920
DECODE_LEN = 64

# name -> (hidden, inter, heads, kv_heads, layers, groupsize, act_order,
#          (L1, L2), baseline {prompt, best, worst})
CONFIGS = {
    # Llama-33B: 6656 hidden, 52 heads, 60 layers, 17920 inter
    "33b-g128": (6656, 17920, 52, 52, 60, 128, False, (12, 24),
                 {"prompt": 2959, "best": 47, "worst": 40}),
    "33b-g128-act": (6656, 17920, 52, 52, 60, 128, True, (12, 24),
                     {"prompt": 2784, "best": 45, "worst": 37}),
    # the HBM-tight config: g32 doubles the scale stream, act-order
    # stresses the in-kernel permute at K=6656/17920
    "33b-g32-act": (6656, 17920, 52, 52, 60, 32, True, (12, 24),
                    {"prompt": 2636, "best": 41, "worst": 37}),
    # Llama-2-70B GQA: 8192 hidden, 64 q / 8 kv heads, 80 layers
    "70b-g128-act": (8192, 28672, 64, 8, 80, 128, True, (8, 16),
                     {"prompt": 914, "best": 17, "worst": 14}),
    # Llama-65B: 8192 hidden, 64 MHA heads, 80 layers (reference row is
    # dual-GPU, README.md:173 — per-chip slope comparison here)
    "65b-g128-act": (8192, 22016, 64, 64, 80, 128, True, (8, 16),
                     {"prompt": 1109, "best": 20, "worst": 18}),
}


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def build(name, layers):
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.models.llama import ExLlama

    h, inter, heads, kvh, _, gs, act, _, _ = CONFIGS[name]
    cfg = ExLlamaConfig()
    cfg.hidden_size = h
    cfg.intermediate_size = inter
    cfg.num_attention_heads = heads
    cfg.num_key_value_heads = kvh
    cfg.head_dim = 128
    cfg.num_hidden_layers = layers
    cfg.vocab_size = 32000
    cfg.max_seq_len = 2048
    cfg.max_input_len = 2048
    cfg.max_attention_size = 2048 ** 2
    params = make_synthetic_params(cfg, groupsize=gs, act_order=act, seed=0,
                                   fast=True)
    return ExLlama(cfg, params=params)


def layer_bytes(name):
    """HBM bytes streamed per decode token per layer (weights + scales +
    bf16 KV read at full 2048 ctx)."""
    h, inter, heads, kvh, _, gs, act, _, _ = CONFIGS[name]
    kvdim = kvh * 128
    qdim = heads * 128
    w = 2 * h * qdim + 2 * h * kvdim + 3 * h * inter   # weights count
    wb = w // 2                                        # int4 packed
    sb = (w // gs) * 2 * 2                             # bf16 scale+zscale
    kvb = 2 * 2048 * kvdim * 2                         # bf16 K+V read
    return wb + sb + kvb


def head_bytes(h, vocab=32000):
    return h * vocab * 2 + h * 2                       # bf16 lm_head + norm


def measure(name):
    import jax
    import jax.numpy as jnp

    from exllama_tpu.cache import ExLlamaCache
    from exllama_tpu.models.llama import forward_chunk

    _, _, heads, kvh, l_full, gs, act, (l1, l2), base = CONFIGS[name]
    rng = np.random.default_rng(0)
    out = {"config": name, "layers_full": l_full,
           "layers_measured": [l1, l2]}

    def sync(x):
        return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]

    decode_t = {}
    prefill_t = {}
    turbo_t = {}
    best_t = {}
    for L in (l1, l2):
        log(f"{name}: building {L}-layer model...")
        model = build(name, L)
        cfg = model.config
        cache = ExLlamaCache(model)
        ids = rng.integers(0, cfg.vocab_size,
                           size=(1, PROMPT_LEN)).astype(np.int32)

        def prefill():
            cache.current_seq_len = 0
            t0 = time.perf_counter()
            model.forward(ids, cache, preprocess_only=True)
            sync(cache.state.k[0][0, 0, 0, :1])
            return time.perf_counter() - t0

        prefill()
        prefill_t[L] = min(prefill(), prefill())
        log(f"  prefill({L} layers): {prefill_t[L]*1e3:.0f} ms")

        # turbo prompt (a8t): deqw8 in-kernel requant with static column
        # scales, NO resident images — at full depth residency cannot fit
        # these models on one chip, so the honest slope is the
        # image-free path (partial residency only improves on it)
        model.config.tuning.matmul_impl = "pallas_a8t"
        p_save = model.params
        from exllama_tpu.models.llama import _attach_prefill_w8

        model.config.tuning.prefill_w8_budget_gb = 1e-6  # scales only
        model.params = _attach_prefill_w8(model.params, model.config)
        prefill()
        turbo_t[L] = min(prefill(), prefill())
        log(f"  turbo prefill({L} layers): {turbo_t[L]*1e3:.0f} ms")
        model.params = p_save
        model.config.tuning.matmul_impl = "auto"

        step = functools.partial(
            forward_chunk, attend_len=cfg.max_seq_len, last_token_only=True,
            preprocess_only=False, heads=heads, kv_heads=kvh, head_dim=128,
            eps=cfg.rms_norm_eps, matmul_impl=model._matmul_impl(),
            head_mode="argmax",
        )

        @functools.partial(jax.jit, donate_argnames=("kv",))
        def decode_n(params, kv, tok, past):
            def body(i, c):
                kv, tok, pos = c
                tok, kv = step(params, kv, tok, pos, None, None)
                return kv, tok, pos + 1
            kv, tok, pos = jax.lax.fori_loop(
                0, DECODE_LEN, body, (kv, tok, past))
            return kv, tok

        tok0 = jnp.asarray([[1]], jnp.int32)
        past = jnp.int32(PROMPT_LEN)
        kv = cache.state
        kv, tok = decode_n(model.params, kv, tok0, past)
        sync(tok)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            kv, tok = decode_n(model.params, kv, tok0, past)
            sync(tok)
            ts.append(time.perf_counter() - t0)
        decode_t[L] = min(ts) / DECODE_LEN
        log(f"  worst decode({L} layers): {decode_t[L]*1e3:.2f} ms/tok")

        # best: empty context
        step_b = functools.partial(
            forward_chunk, attend_len=256, last_token_only=True,
            preprocess_only=False, heads=heads, kv_heads=kvh, head_dim=128,
            eps=cfg.rms_norm_eps, matmul_impl=model._matmul_impl(),
            attn_impl=model._attn_impl(), head_mode="argmax",
        )

        @functools.partial(jax.jit, donate_argnames=("kv",))
        def decode_b(params, kv, tok, past):
            def body(i, c):
                kv, tok, pos = c
                tok, kv = step_b(params, kv, tok, pos, None, None)
                return kv, tok, pos + 1
            kv, tok, pos = jax.lax.fori_loop(
                0, DECODE_LEN, body, (kv, tok, past))
            return kv, tok

        kv, tok = decode_b(model.params, kv, tok0, jnp.int32(1))
        sync(tok)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            kv, tok = decode_b(model.params, kv, tok0, jnp.int32(1))
            sync(tok)
            ts.append(time.perf_counter() - t0)
        best_t[L] = min(ts) / DECODE_LEN
        log(f"  best decode({L} layers): {best_t[L]*1e3:.2f} ms/tok")

        del model, cache, kv

    # linear extrapolation t(L) = a*L + b
    def extrap(t):
        a = (t[l2] - t[l1]) / (l2 - l1)
        b = t[l1] - a * l1
        return a, b, a * l_full + b

    a_d, b_d, t_full = extrap(decode_t)
    _, _, t_best = extrap(best_t)
    a_p, b_p, t_pre = extrap(prefill_t)
    _, _, t_turbo = extrap(turbo_t)

    lb = layer_bytes(name)
    roof_layer = lb / 740e9                 # s/token/layer at HBM roofline
    worst_ts = 1.0 / t_full
    out.update({
        "worst_decode_tok_s": round(worst_ts, 2),
        "best_decode_tok_s": round(1.0 / t_best, 2),
        "prompt_tok_s": round(PROMPT_LEN / t_pre, 1),
        "turbo_prompt_tok_s": round(PROMPT_LEN / t_turbo, 1),
        "per_layer_ms": round(a_d * 1e3, 4),
        "per_layer_roofline_ms": round(roof_layer * 1e3, 4),
        "layer_roofline_frac": round(roof_layer / a_d, 3),
        "fixed_ms": round(b_d * 1e3, 3),
        "baseline_worst": base["worst"],
        "baseline_best": base["best"],
        "baseline_prompt": base["prompt"],
        "vs_baseline_worst": round(worst_ts / base["worst"], 3),
    })
    log(f"{name}: full-model worst {worst_ts:.1f} tok/s "
        f"(baseline {base['worst']}), per-layer roofline frac "
        f"{out['layer_roofline_frac']:.2f}")
    return out


def main():
    argv = sys.argv[1:]
    js = None
    if "--json" in argv:
        i = argv.index("--json")
        js = argv[i + 1]
        del argv[i:i + 2]
    names = [a for a in argv if not a.startswith("--")] or list(CONFIGS)
    for n in names:
        if n not in CONFIGS:
            sys.exit(f"unknown config {n!r}; choose from {list(CONFIGS)}")
    results = [measure(n) for n in names]
    for r in results:
        print(json.dumps(r))
    if js:
        with open(js, "w") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
