"""Best-ctx layer-stack overhead probe (round 5).

micro_head.py showed the decode head is ~0.26 ms (dense fused) / ~0 (q4):
the best-ctx gap to the reference's 173 t/s lives in the LAYER STACK —
6.35 ms/step no-head at attend_len=256 vs a ~4.9 ms component sum. This
times no-head chained decode loops across attend lengths and fusion/attn
impls in one process to localize the overhead:

  fused_256 : layer_tail megakernel path, attend 256 (bench best-ctx gate)
  sep_256   : attn_fuse=False mlp_fuse=False (separate kernels)
  xla_256   : separate + attn_impl="xla" (no flash kernel at short KV)
  fused_64  : attend 64 (does cost scale with KV length or stay fixed?)
  fused_2048: attend 2048 (in-process worst-ctx; KV stream delta check)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/ab_best2.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 128


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from exllama_tpu.cache import ExLlamaCache
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.models.llama import ExLlama, forward_chunk

    cfg = ExLlamaConfig()
    cfg.max_seq_len = 2048
    cfg.max_input_len = 2048
    cfg.max_attention_size = 2048 ** 2
    params = make_synthetic_params(cfg, 128, False, seed=0, fast=True)
    model = ExLlama(cfg, params=params)

    def sync(x):
        return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]

    if os.environ.get("AB_BEST2_XLA2048"):
        # round-2 of the probe: B=8 showed xla attention beating flash at
        # attend 1024 (ab_b8.py AB_B8_ATTN) — check whether the B=1
        # worst-ctx headline path also prefers xla before regating it.
        VARIANTS = {
            "fused_2048": dict(attend_len=2048),
            "xla_2048": dict(attend_len=2048, mlp_fuse=False,
                             attn_fuse=False, attn_impl="xla"),
            "xlafuse_2048": dict(attend_len=2048, attn_impl="xla"),
            "xla_1024": dict(attend_len=1024, mlp_fuse=False,
                             attn_fuse=False, attn_impl="xla"),
            "fused_1024": dict(attend_len=1024),
        }
    elif os.environ.get("AB_BEST2_DEFAULT"):
        # round-3 of the probe: the short-attend auto demotion shipped off
        # the xla_256 (fuse-off) reading, but the shipped default keeps
        # mlp_fuse=True (q4_mlp engages regardless of attn impl) — measure
        # the ACTUAL default combo plus full-step (head included) rows so
        # the numbers compare 1:1 against the reference's 173 t/s.
        head = dict(preprocess_only=False, head_mode="argmax")
        VARIANTS = {
            "xsep_256": dict(attend_len=256, mlp_fuse=False,
                             attn_fuse=False, attn_impl="xla"),
            "xmlp_256": dict(attend_len=256, attn_fuse=False,
                             attn_impl="xla"),
            "default_256": dict(attend_len=256, attn_impl="auto"),
            "xmlp_head_256": dict(attend_len=256, attn_fuse=False,
                                  attn_impl="xla", **head),
            "xsep_head_256": dict(attend_len=256, mlp_fuse=False,
                                  attn_fuse=False, attn_impl="xla", **head),
            # unfused dense head (rms_norm + dense GEMV + XLA argmax):
            # micro_head measured it 0.05 ms CHEAPER than the fused
            # head_argmax kernel at T=1
            "xmlp_lhead_256": dict(attend_len=256, attn_fuse=False,
                                   attn_impl="xla", preprocess_only=False,
                                   head_mode="logits"),
        }
    else:
        VARIANTS = {
            "fused_256": dict(attend_len=256),
            "sep_256": dict(attend_len=256, mlp_fuse=False,
                            attn_fuse=False),
            "xla_256": dict(attend_len=256, mlp_fuse=False,
                            attn_fuse=False, attn_impl="xla"),
            "fused_64": dict(attend_len=64),
            "fused_2048": dict(attend_len=2048),
        }

    def make(over):
        kw = dict(
            last_token_only=True, preprocess_only=True,
            heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
            eps=cfg.rms_norm_eps, matmul_impl="pallas",
            # pin flash: since the round-5 short-attend auto demotion the
            # "auto" impl resolves to xla at attend<=256, which would
            # silently change what the fused_* variants measure
            attn_impl="flash",
        )
        kw.update(over)
        with_head = not kw.get("preprocess_only", True)
        step = functools.partial(forward_chunk, **kw)

        @functools.partial(jax.jit, donate_argnames=("kv",))
        def loop(params, kv, tok, pos):
            def body(i, c):
                kv, tok, pos = c
                out, kv = step(params, kv, tok, pos, None, None)
                if with_head:
                    # feed the produced token back so the head isn't DCE'd
                    if kw.get("head_mode") == "logits":
                        out = jnp.argmax(out[:, -1, :], axis=-1)
                    tok = out.reshape(1, 1).astype(jnp.int32)
                return kv, tok, pos + 1
            return jax.lax.fori_loop(0, STEPS, body, (kv, tok, pos))
        return loop

    tok0 = jnp.asarray([[1]], jnp.int32)
    loops, kvs = {}, {}
    for name, over in VARIANTS.items():
        loops[name] = make(over)
        kvs[name] = ExLlamaCache(model).state
        t0 = time.time()
        kvs[name], tok, _ = loops[name](
            model.params, kvs[name], tok0, jnp.int32(1))
        sync(tok)
        log(f"compiled {name} ({time.time() - t0:.0f}s)")

    times = {n: [] for n in VARIANTS}
    for _ in range(4):
        for name in VARIANTS:
            t0 = time.perf_counter()
            kvs[name], tok, _ = loops[name](
                model.params, kvs[name], tok0, jnp.int32(1))
            sync(tok)
            times[name].append(time.perf_counter() - t0)

    out = {}
    for name, ts in times.items():
        ms = min(ts) / STEPS * 1e3
        out[name] = round(ms, 3)
        log(f"{name:10s}: {ms:6.3f} ms/step = {1e3 / ms:6.1f} t/s  "
            f"(all: {[round(t / STEPS * 1e3, 2) for t in ts]})")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
