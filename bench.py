"""Benchmark harness: Llama-7B-shaped 4-bit decode + prefill on one chip.

Mirrors the reference's perf methodology (test_benchmark_inference.py -p:
prompt pass over the context, then timed 128-token decode; README.md:154-156
metric definitions). The checkpoint is synthetic (quantize_matrix of random
weights — identical compute/memory profile to a real GPTQ checkpoint).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline: 140 tok/s = reference RTX-4090 "worst" decode at 7B g128
(BASELINE.md), the north-star per-chip number.

Every section runs under its own guard: a compile/runtime failure in one
variant nulls that field and lands in "errors", it cannot zero the round's
evidence (round-2 lesson — VERDICT.md).
"""

import functools
import json
import time
import traceback

import numpy as np

ERRORS: dict[str, str] = {}


def guard(name):
    """Run section fn() under a guard; on failure record and return None."""
    def deco(fn):
        def run(*a, **k):
            try:
                return fn(*a, **k)
            except Exception as e:
                first = str(e).split("\n")[0][:300]
                ERRORS[name] = f"{type(e).__name__}: {first}"
                print(f" !! {name} failed: {type(e).__name__}: {first}",
                      flush=True)
                return None
        return run
    return deco


def build_model(layers=32):
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.models.llama import ExLlama

    cfg = ExLlamaConfig()  # defaults are exactly Llama-7B
    cfg.num_hidden_layers = layers
    cfg.max_seq_len = 2048
    cfg.max_input_len = 2048
    cfg.max_attention_size = 2048 ** 2
    params = make_synthetic_params(
        cfg, groupsize=128, act_order=False, seed=0, fast=True
    )
    return ExLlama(cfg, params=params)


def main():
    import jax
    import jax.numpy as jnp

    from exllama_tpu.cache import ExLlamaCache
    from exllama_tpu.models.llama import forward_chunk

    backend = jax.default_backend()
    layers = 32 if backend == "tpu" else 2
    model = build_model(layers)
    cfg = model.config

    rng = np.random.default_rng(0)
    prompt_len, decode_len = 1920, 128
    ids = rng.integers(0, cfg.vocab_size, size=(1, prompt_len)).astype(np.int32)

    def sync(x):
        # axon's block_until_ready can return before execution finishes;
        # fetching a value to host is the only reliable fence.
        return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]

    def make_step(**over):
        kw = dict(
            attend_len=cfg.max_seq_len,
            last_token_only=True,
            preprocess_only=False,
            heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_heads,
            head_dim=cfg.head_dim,
            eps=cfg.rms_norm_eps,
            matmul_impl=model._matmul_impl(),
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
                0, decode_len, body, (kv, tok, past_len)
            )
            return kv, tok

        return decode_n

    def fresh_kv(dtype=None):
        """Prefill a fresh cache (decode loops donate their kv)."""
        c = ExLlamaCache(model) if dtype is None else ExLlamaCache(
            model, dtype=dtype)
        c.current_seq_len = 0
        model.forward(ids, c, preprocess_only=True)
        sync(c.state.k[0][0, 17, 0, :1])
        return c

    tok0 = jnp.asarray([[1]], jnp.int32)

    def timed_decode(decode_n, kv, past, reps=3):
        """Compile + time; returns (tok/s, last kv) or raises. Never reuses
        a donated buffer: the caller must not touch kv afterwards."""
        kv, tok = decode_n(model.params, kv, tok0, past)  # compile+run
        sync(tok)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            kv, tok = decode_n(model.params, kv, tok0, past)
            sync(tok)
            times.append(time.perf_counter() - t0)
        return decode_len / min(times), kv

    # ---- prompt pass (prefill), 1 warmup + 2 timed (reference does 2)
    @guard("prompt")
    def run_prompt():
        def prefill():
            cache = ExLlamaCache(model)
            t0 = time.perf_counter()
            model.forward(ids, cache, preprocess_only=True)
            sync(cache.state.k[0][0, 17, 0, :1])
            return time.perf_counter() - t0

        prefill()  # compile
        ts = prompt_len / min(prefill(), prefill())
        print(f" -- prompt {ts:.1f} tok/s", flush=True)
        return ts

    prompt_ts = run_prompt()

    # ---- turbo prefill (W4A8 int8 MXU dots; opt-in extra)
    @guard("turbo_prompt")
    def run_turbo_prompt():
        if backend != "tpu":
            return None
        import copy

        from exllama_tpu.models.llama import ExLlama as _E

        cfg_t = copy.deepcopy(cfg)
        cfg_t.tuning.matmul_impl = "pallas_a8t"
        model_t = _E(cfg_t, params=model.params)

        def prefill_turbo():
            cache_t = ExLlamaCache(model_t)
            t0 = time.perf_counter()
            model_t.forward(ids, cache_t, preprocess_only=True)
            sync(cache_t.state.k[0][0, 17, 0, :1])
            return time.perf_counter() - t0

        prefill_turbo()
        ts = prompt_len / min(prefill_turbo(), prefill_turbo())
        print(f" -- turbo prompt {ts:.1f} tok/s", flush=True)
        return ts

    turbo_prompt_ts = run_turbo_prompt()

    # ---- worst-ctx decode, default fusion flags; on a lowering failure
    # fall back to separate kernels and remember for the later variants.
    past = jnp.int32(prompt_len)
    fuse_over = {}

    @guard("decode_fused")
    def run_decode_fused():
        return timed_decode(make_step(), fresh_kv().state, past)[0]

    decode_ts = run_decode_fused()
    if decode_ts is None:
        fuse_over = {"mlp_fuse": False, "attn_fuse": False}

        @guard("decode_separate")
        def run_decode_sep():
            return timed_decode(
                make_step(**fuse_over), fresh_kv().state, past)[0]

        decode_ts = run_decode_sep()
    if decode_ts is not None:
        print(f" -- worst decode {decode_ts:.2f} tok/s", flush=True)

    # ---- whole-layer megakernel (tuning.fuse_qkv): exact numerics
    @guard("qkvfuse")
    def run_qkvfuse():
        if backend != "tpu" or fuse_over:
            return None
        ts, _ = timed_decode(
            make_step(qkv_fuse=True), fresh_kv().state, past)
        print(f" -- qkvfuse decode {ts:.2f} tok/s", flush=True)
        return ts

    qkvfuse_ts = run_qkvfuse()
    if qkvfuse_ts is not None and decode_ts is not None \
            and qkvfuse_ts > decode_ts:
        decode_ts = qkvfuse_ts   # exact numerics — same metric

    # ---- "best" decode: empty context (reference README.md:154-156)
    @guard("best_decode")
    def run_best():
        step = make_step(attend_len=256, attn_impl=model._attn_impl(),
                         **fuse_over)
        ts, _ = timed_decode(step, fresh_kv().state, jnp.int32(1))
        print(f" -- best decode {ts:.2f} tok/s", flush=True)
        return ts

    best_ts = run_best()

    # ---- int8 KV cache decode (opt-in TPU-native extra)
    @guard("int8kv_decode")
    def run_int8kv():
        ts, _ = timed_decode(
            make_step(**fuse_over), fresh_kv(jnp.int8).state, past)
        print(f" -- int8kv decode {ts:.2f} tok/s", flush=True)
        return ts

    int8kv_ts = run_int8kv()

    # ---- turbo: W4A8 GEMV + int8 KV
    @guard("turbo_decode")
    def run_turbo():
        ts, _ = timed_decode(
            make_step(matmul_impl="pallas_a8", **fuse_over),
            fresh_kv(jnp.int8).state, past)
        print(f" -- turbo decode {ts:.2f} tok/s", flush=True)
        return ts

    turbo_ts = run_turbo()

    # ---- max-throughput extra: turbo + int4 KV
    @guard("int4kv_turbo_decode")
    def run_int4_turbo():
        ts, _ = timed_decode(
            make_step(matmul_impl="pallas_a8", **fuse_over),
            fresh_kv("int4").state, past)
        print(f" -- int4kv turbo decode {ts:.2f} tok/s", flush=True)
        return ts

    int4_turbo_ts = run_int4_turbo()

    # HBM-roofline framing: bytes per decode token at full context over the
    # measured stream bandwidth; the reference runs 64% of ITS roofline
    # (140 t/s * 4.6GB/token / 1008 GB/s on a 4090).
    hkv = cfg.num_key_value_heads
    bytes_per_tok = (
        model.num_params_bytes()
        - cfg.vocab_size * cfg.hidden_size * 2  # embed not streamed
        + 2 * cfg.num_hidden_layers * cfg.max_seq_len * hkv
        * cfg.head_dim * 2
    )
    hbm_gbps = 740.0  # measured v5e stream bandwidth (docs/PERFORMANCE.md)
    roofline_ts = hbm_gbps * 1e9 / bytes_per_tok

    rnd = lambda v, n=2: (round(v, n) if v is not None else None)  # noqa: E731
    print(json.dumps({
        "metric": "decode_tok_s_llama7b_q4_worst_ctx2048",
        "value": rnd(decode_ts),
        "unit": "tok/s",
        "vs_baseline": rnd(decode_ts / 140.0, 3) if decode_ts else None,
        "best_decode_tok_s": rnd(best_ts),
        "int8kv_decode_tok_s": rnd(int8kv_ts),
        "turbo_decode_tok_s": rnd(turbo_ts),
        "prompt_tok_s": rnd(prompt_ts, 1),
        "turbo_prompt_tok_s": rnd(turbo_prompt_ts, 1),
        "qkvfuse_decode_tok_s": rnd(qkvfuse_ts),
        "int4kv_turbo_decode_tok_s": rnd(int4_turbo_ts),
        "roofline_tok_s": round(roofline_ts, 1),
        "roofline_frac": (
            rnd(decode_ts / roofline_ts, 3) if decode_ts else None
        ),
        "fused_path": not fuse_over,
        "errors": ERRORS or None,
        "backend": backend,
        "layers": layers,
        "note": "synthetic 7B g128; baseline 140 tok/s = reference 4090 worst-decode (BASELINE.md); int8kv/turbo = opt-in int8 KV cache and W4A8 modes",
    }))


if __name__ == "__main__":
    main()
