"""Continuous-batching engine throughput on one chip (the 'Batched decode'
table in docs/PERFORMANCE.md): aggregate decode tok/s at several slot
counts, plus a speculative-mode row on ngram-friendly prompts.

Run from the repo root on the TPU. ENGINE_LAYERS overrides depth for smoke
runs."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.models.llama import ExLlama
from exllama_tpu.ops.sampling import SamplerSettings
from exllama_tpu.serve import ContinuousBatchingEngine
from exllama_tpu.speculative import NgramProposer
from exllama_tpu.tokenizer import FakeTokenizer


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def build(ctx):
    cfg = ExLlamaConfig()                       # 7B shapes
    cfg.num_hidden_layers = int(os.environ.get("ENGINE_LAYERS", "32"))
    cfg.max_seq_len = ctx
    cfg.max_input_len = ctx
    cfg.max_attention_size = ctx ** 2
    params = make_synthetic_params(cfg, 128, False, seed=0, fast=True)
    return ExLlama(cfg, params=params)


GREEDY = SamplerSettings(temperature=1.0, top_k=1, top_p=0.0,
                         token_repetition_penalty_max=1.0)


def run_config(slots, ctx, spec=False, steps=48, spec_prompts="friendly"):
    model = build(ctx)
    eng = ContinuousBatchingEngine(
        model, FakeTokenizer(), max_slots=slots, prefill_bucket=256,
        spec_proposer=NgramProposer(max_ngram=3, max_draft=6)
        if spec else None,
        # ENGINE_CAND_CAP=1024: opt-in top-C sampler pre-selection (skips
        # the per-row full-vocab sort; top_p/typical renormalize over C)
        sampler_candidate_cap=int(os.environ.get("ENGINE_CAND_CAP", "0")),
    )
    rng = np.random.default_rng(1)
    prompt_len = ctx - steps - 8
    for i in range(slots):
        if spec and spec_prompts == "friendly":
            # repetitive prompts so prompt-lookup drafts accept
            base = rng.integers(0, 32000, size=16).astype(np.int32)
            prompt = np.tile(base, prompt_len // 16 + 1)[:prompt_len]
        else:
            prompt = rng.integers(0, 32000, size=prompt_len).astype(np.int32)
        eng.submit(prompt, max_new_tokens=10_000, settings=GREEDY,
                   stop_tokens=(-1,))
    # admit + warm the decode step
    warm = 0
    while any(r.state != "running" for r in eng.slot_req if r) or warm < 3:
        eng.step()
        warm += 1
    t0 = time.perf_counter()
    toks = 0
    for _ in range(steps):
        toks += len(eng.step())
    dt = time.perf_counter() - t0
    agg = toks / dt
    # every eng.step() is a host-driven dispatch (continuous batching needs
    # per-step host logic); through the axon tunnel each pays the measured
    # RPC latency, which would be microseconds on a local TPU host. Report
    # both (same methodology as bench.py).
    lat = _rpc_latency()
    adj = toks / max(dt - steps * lat, 1e-9)
    tag = "spec " if spec else ""
    log(f"slots={slots:>2} ctx={ctx:>5} {tag}aggregate: {adj:7.1f} tok/s "
        f"(raw {agg:.1f}; {dt / steps * 1e3:.1f} ms/step raw, "
        f"rpc {lat * 1e3:.1f} ms, {toks} toks/{steps} steps)")
    # The adjustment assumes exactly ONE tunnel-bound RPC per step; return
    # raw alongside so artifacts stay auditable (ADVICE r4).
    return {"adjusted_tok_s": adj, "raw_tok_s": agg,
            "ms_per_step_raw": dt / steps * 1e3, "rpc_ms": lat * 1e3}


_LAT = None


def _rpc_latency():
    global _LAT
    if _LAT is not None:
        return _LAT
    import jax
    import jax.numpy as jnp

    @jax.jit
    def ident(x):
        return x + 1

    z = jnp.zeros((8, 128), jnp.bfloat16)
    np.asarray(ident(z))
    best = float("inf")
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(ident(z))
        best = min(best, time.perf_counter() - t0)
    _LAT = best
    return _LAT


def main():
    import json

    results = {
        "slots1_ctx2048": run_config(1, 2048),
        "slots8_ctx1024": run_config(8, 1024),
        "slots16_ctx512": run_config(16, 512),
        "spec_slots8_ctx1024": run_config(8, 1024, spec=True),
        # 1-slot speculative latency (spec's natural win is single-stream;
        # VERDICT r4 item 8): an ngram-friendly prompt and an adversarial
        # (random, drafts never accept) one
        "spec_slots1_ctx2048": run_config(1, 2048, spec=True),
        "spec_slots1_ctx2048_adversarial": run_config(
            1, 2048, spec=True, spec_prompts="adversarial"
        ),
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
