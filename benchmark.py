"""Benchmark / validation harness (reference: test_benchmark_inference.py).

Modes (combinable, like the reference's -p/-ppl/-v flags):

  -p        perf: prompt pass over (length-128) tokens, then two timed
            128-token decodes; reports prompt t/s + best/worst decode t/s
            and device memory (reference test_benchmark_inference.py:161-198)
  -ppl      perplexity on a jsonl/text dataset (-ds), 8 chunks by default
  -v        validate: run perplexity twice — once on the XLA dequant+dot
            path and once on the fused Pallas kernel — the two must agree
            (the reference's dual-path cross-check,
            test_benchmark_inference.py:239-246); plus a greedy-completion
            smoke test
  -v -v     adds the batched-generation sanity check: identical prompts in a
            batch must produce identical continuations (ref. :258-312)

Works against a real GPTQ checkpoint (-d) or a synthetic one (--synthetic
[7b|13b|...]), since this environment has no model zoo.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from exllama_tpu import model_init
from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.generator import ExLlamaGenerator
from exllama_tpu.perplexity import Perplexity

SYNTH_SHAPES = {
    "tiny": dict(hidden_size=256, intermediate_size=512,
                 num_attention_heads=4, num_key_value_heads=4, head_dim=64,
                 num_hidden_layers=2, vocab_size=32000),
    "3b": dict(hidden_size=3200, intermediate_size=8640,
               num_attention_heads=32, num_key_value_heads=32, head_dim=100,
               num_hidden_layers=26, vocab_size=32000),
    "7b": dict(hidden_size=4096, intermediate_size=11008,
               num_attention_heads=32, num_key_value_heads=32, head_dim=128,
               num_hidden_layers=32, vocab_size=32000),
    "13b": dict(hidden_size=5120, intermediate_size=13824,
                num_attention_heads=40, num_key_value_heads=40, head_dim=128,
                num_hidden_layers=40, vocab_size=32000),
}


def build_synthetic(name, args):
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.models.llama import ExLlama
    from exllama_tpu.tokenizer import FakeTokenizer

    cfg = ExLlamaConfig()
    for k, v in SYNTH_SHAPES[name].items():
        setattr(cfg, k, v)
    cfg.max_seq_len = args.length
    cfg.max_input_len = args.length
    cfg.max_attention_size = args.length ** 2
    cfg.tuning.matmul_impl = args.matmul_impl
    cfg.tuning.attn_len_bucket = args.attn_bucket
    if getattr(args, "scale_f32", False):
        cfg.tuning.scale_dtype = "f32"
    params = make_synthetic_params(
        cfg, groupsize=args.groupsize, act_order=args.act_order, seed=0
    )
    from exllama_tpu.models.llama import ExLlama

    model = ExLlama(cfg, params=params)
    tok = FakeTokenizer()
    tok.vocab_size = cfg.vocab_size
    return cfg, model, tok


def timer(fn):
    t0 = time.perf_counter()
    r = fn()
    return time.perf_counter() - t0, r


def mem_report():
    import jax

    total = 0
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            total += stats.get("bytes_in_use", 0)
    return total


def run_perf(model, cache, args):
    cfg = model.config
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size,
                       size=(1, args.length - 128)).astype(np.int32)

    def fence():
        # block_until_ready does not fence through the axon tunnel; the
        # only reliable fence is fetching a value to host.
        np.asarray(cache.state.k[0][0, 0, 0, :1])

    # warmup at the TIMED shape (2x, like the reference's warmup passes) —
    # a shorter warmup compiles a different chunk length and the timed
    # pass would then include the real compile.
    print(f" -- compiling + warming prefill (T={ids.shape[1]}; first "
          "compile can take minutes through the remote-compile tunnel)",
          flush=True)
    for _ in range(2):
        cache.current_seq_len = 0
        model.forward(ids, cache, preprocess_only=True)
        fence()
    cache.current_seq_len = 0
    t, _ = timer(lambda: (
        model.forward(ids, cache, preprocess_only=True),
        fence(),
    ))
    print(f" ** Speed: {ids.shape[1] / t:.2f} prompt tokens/second")

    # decode 128 tokens twice: "best" = empty-ish ctx, "worst" = full ctx.
    # gen_tokens(n) runs the whole sampled loop in one device dispatch; a
    # two-length fit (128 vs 32) removes the per-dispatch RPC latency that
    # would otherwise be billed to the machine (docs/PERFORMANCE.md).
    gen = ExLlamaGenerator(model, _dummy_tok(cfg), cache)
    gen.settings.top_k = 1
    def timed_chunk(gen, n, reps=2):
        best = None
        for _ in range(reps):
            t, _ = timer(lambda: gen.gen_tokens(n))
            gen.gen_rewind(n)
            best = t if best is None else min(best, t)
        return best

    for label, begin_len in (("best", 1), ("worst", ids.shape[1])):
        print(f" -- compiling + warming {label}-case decode", flush=True)
        gen.gen_begin(ids[:, :begin_len])
        for n in (32, 128):  # compile both loop lengths
            gen.gen_tokens(n)
            gen.gen_rewind(n)
        t_long = timed_chunk(gen, 128)
        t_short = timed_chunk(gen, 32)
        per_tok = (t_long - t_short) / 96
        print(f" ** Speed: {1 / per_tok:.2f} tokens/second ({label}) "
              f"[raw single-call {128 / t_long:.2f}]")

    print(f" ** Device memory in use: {mem_report() / 1024**2:,.2f} MB")


def run_streams(model, args):
    """Aggregate throughput with N concurrent streams through the
    continuous-batching engine (the reference's `-cs` sweep,
    sh/test_benchmark_perf.sh — which it implements with a batch loop;
    here it exercises the real serving engine)."""
    import time as _time

    from exllama_tpu.serve.engine import ContinuousBatchingEngine

    cfg = model.config
    n = args.streams
    eng = ContinuousBatchingEngine(
        model, tokenizer=_dummy_tok(cfg), max_slots=n,
        attn_bucket=256,
    )
    rng = np.random.default_rng(0)
    new_tokens = 64
    for i in range(n):
        plen = int(rng.integers(32, 128))
        prompt = rng.integers(0, cfg.vocab_size, size=(plen,)).astype(np.int32)
        eng.submit(prompt, max_new_tokens=new_tokens, stop_tokens=(-1,))
    # warmup/compile step
    eng.step()
    t0 = _time.perf_counter()
    produced = 0
    while eng.has_work():
        produced += len(eng.step())
    dt = _time.perf_counter() - t0
    print(f" ** Aggregate: {produced} tokens over {n} streams in {dt:.2f}s "
          f"= {produced / dt:.1f} tok/s")


def _dummy_tok(cfg):
    from exllama_tpu.tokenizer import FakeTokenizer

    t = FakeTokenizer()
    t.vocab_size = cfg.vocab_size
    return t


def run_ppl(model, cache, tokenizer, args, impl=None):
    if impl is not None:
        model.config.tuning.matmul_impl = impl
    ppl = Perplexity(model, cache, tokenizer)
    ppl.load(args.dataset, chunk_truncate=args.length)
    value = ppl.test(chunk_limit=args.ppl_chunks, silent=False)
    label = impl or model.config.tuning.matmul_impl
    print(f" ** Perplexity ({label}): {value:.4f}")
    return value


def run_ppl_turbo(model, cache, tokenizer, args):
    """Numerics certificate for the opt-in turbo modes (the ±0.05-ppl
    contract, BASELINE.md; reference methodology
    test_benchmark_inference.py:226-256 generalized to the approximate
    paths): perplexity deltas vs the exact kernel path on the SAME
    checkpoint + dataset. ``pallas_a8t`` is the turbo-PREFILL mode —
    full-chunk logits exercise exactly the prefill kernels the turbo
    prompt numbers ride; ``pallas_a8``/``pallas_a8x2`` are DECODE modes,
    certified token-by-token (each position forwarded through the GEMV
    kernels like real decode)."""
    import json as _json

    import jax

    sfx = "" if jax.default_backend() == "tpu" else "_interpret"
    res = {}
    res["exact"] = run_ppl(model, cache, tokenizer, args, impl="pallas" + sfx)

    from exllama_tpu.models.llama import _attach_prefill_w8

    model.config.tuning.matmul_impl = "pallas_a8t" + sfx
    p_save = model.params
    model.params = _attach_prefill_w8(model.params, model.config)
    res["a8t"] = run_ppl(
        model, cache, tokenizer, args, impl="pallas_a8t" + sfx
    )
    model.params = p_save

    tk_chunks = max(1, args.ppl_chunks // 4)   # token-by-token is ~100x
    for impl in ("pallas_a8", "pallas_a8x2"):
        model.config.tuning.matmul_impl = impl + sfx
        ppl = Perplexity(model, cache, tokenizer)
        ppl.load(args.dataset, chunk_truncate=args.length)
        v = ppl.test(chunk_limit=tk_chunks, ppl_token=True, silent=False)
        # exact-path token-by-token baseline over the same chunks
        model.config.tuning.matmul_impl = "pallas" + sfx
        ppl2 = Perplexity(model, cache, tokenizer)
        ppl2.load(args.dataset, chunk_truncate=args.length)
        v0 = ppl2.test(chunk_limit=tk_chunks, ppl_token=True, silent=False)
        res[impl.replace("pallas_", "") + "_token"] = v
        res["exact_token"] = v0
        print(f" ** Token ppl {impl}: {v:.4f} (exact {v0:.4f}, "
              f"Δ {v - v0:+.4f})")
    model.config.tuning.matmul_impl = "auto"
    out = {
        "exact_ppl": res["exact"],
        "a8t_ppl": res["a8t"],
        "a8t_delta": res["a8t"] - res["exact"],
        "a8_token_delta": res.get("a8_token", 0) - res.get("exact_token", 0),
        "a8x2_token_delta": res.get("a8x2_token", 0)
        - res.get("exact_token", 0),
    }
    print(" ** turbo-ppl certificate: " + _json.dumps(
        {k: round(v, 4) for k, v in out.items()}
    ))
    return out


def run_validate(model, cache, tokenizer, args, level):
    import jax

    # 1. dual-path cross-validation through perplexity (or logit diff when
    # no dataset is available)
    if args.dataset:
        p_ref = run_ppl(model, cache, tokenizer, args, impl="xla")
        if jax.default_backend() == "tpu":
            p_fused = run_ppl(model, cache, tokenizer, args, impl="pallas")
            delta = abs(p_ref - p_fused)
            print(f" ** Ppl delta xla↔pallas: {delta:.5f}")
            assert delta < 0.01 + 0.01 * p_ref, "kernel cross-check FAILED"
    else:
        rng = np.random.default_rng(1)
        ids = rng.integers(0, model.config.vocab_size, size=(1, 64)).astype(
            np.int32
        )
        cache.current_seq_len = 0
        model.config.tuning.matmul_impl = "xla"
        ref = np.asarray(model.forward(ids, cache))
        if jax.default_backend() == "tpu":
            cache.current_seq_len = 0
            model.config.tuning.matmul_impl = "pallas"
            got = np.asarray(model.forward(ids, cache))
            d = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
            print(f" ** Logit rel-delta xla↔pallas: {d:.4f}")
            assert d < 0.05, "kernel cross-check FAILED"
        else:
            print(" ** (single path on CPU backend; cross-check skipped)")

    # 2. greedy-completion smoke test
    gen = ExLlamaGenerator(model, tokenizer, cache)
    gen.settings.top_k = 1
    text = gen.generate_simple("To be or not to be, that is the",
                               max_new_tokens=24)
    print(f" ** Completion: {text!r}")

    # 3. batched sanity: identical prompts → identical rows
    if level >= 2:
        bsz = 4
        cache_b = ExLlamaCache(model, batch_size=bsz)
        gen_b = ExLlamaGenerator(model, tokenizer, cache_b)
        gen_b.settings.top_k = 1
        texts = gen_b.generate_simple(["All your base"] * bsz,
                                      max_new_tokens=16)
        assert all(t == texts[0] for t in texts), "batched rows diverged"
        print(f" ** Batched ({bsz} identical rows): consistent ✓")
    print(" ** Validation passed")


def main():
    parser = argparse.ArgumentParser(description="benchmark/validate")
    model_init.add_args(parser)
    parser.add_argument("-p", "--perf", action="store_true")
    parser.add_argument("-ppl", "--perplexity", action="store_true")
    parser.add_argument("-v", "--validate", action="count", default=0)
    parser.add_argument("-ds", "--dataset", type=str, default=None)
    parser.add_argument("--ppl_chunks", type=int, default=8)
    parser.add_argument("--ppl_turbo", action="store_true",
                        help="perplexity deltas of the opt-in turbo modes "
                             "(a8t prefill; a8/a8x2 decode, token-by-token) "
                             "vs the exact kernel path")
    parser.add_argument("--synthetic", type=str, choices=list(SYNTH_SHAPES),
                        help="use a fabricated checkpoint of this size")
    parser.add_argument("--groupsize", type=int, default=128)
    parser.add_argument("--act_order", action="store_true")
    parser.add_argument("-cs", "--streams", type=int, default=0,
                        help="aggregate throughput over N concurrent "
                             "streams via the continuous-batching engine")
    parser.add_argument("--scale_f32", action="store_true",
                        help="store quantization scales in f32 "
                             "(strict-parity validation; default bf16 — "
                             "see docs/PARITY.md)")
    args = parser.parse_args()
    model_init.apply_platform(args)
    if args.dataset is None and (
        args.perplexity or args.validate or args.ppl_turbo
    ):
        bundled = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "datasets", "wikitext2_val_sample.jsonl",
        )
        if os.path.exists(bundled):
            args.dataset = bundled

    if args.synthetic:
        cfg, model, tokenizer = build_synthetic(args.synthetic, args)
        model_init.print_options(
            argparse.Namespace(**{**vars(args), "config": "synthetic",
                                  "model": args.synthetic}),
        )
    else:
        cfg, model, tokenizer, _ = model_init.build(args)

    cache = ExLlamaCache(model)
    if args.perf:
        run_perf(model, cache, args)
    if args.streams:
        run_streams(model, args)
    if args.perplexity and args.dataset:
        run_ppl(model, cache, tokenizer, args)
    if args.ppl_turbo and args.dataset:
        run_ppl_turbo(model, cache, tokenizer, args)
    if args.validate:
        run_validate(model, cache, tokenizer, args, args.validate)


if __name__ == "__main__":
    main()
