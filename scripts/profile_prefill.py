"""Locate the prefill end-to-end vs kernel-roofline gap (VERDICT item #2).

Phase-level decomposition on the real TPU, all host-fetch fenced:
  (a) full prefill (flash attention) at two layer depths → per-layer slope
      + fixed cost (embed/rope tables/final glue)
  (b) same with attn_impl='xla'   → attention-impl delta
  (c) isolated flash-prefill attention at exact shapes → attention roofline
  (d) isolated q4 prefill matmuls at exact shapes      → matmul floor
  (e) isolated MLP elementwise (silu·mul at [M, inter]) → glue cost
The gap (a) − (c) − (d) − (e) is reshapes/KV-writes/norm glue.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_prefill.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.models.llama import ExLlama

PROMPT = 1920


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def timed(fn, iters=3):
    fn()  # compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def build(layers, attn_impl="auto"):
    cfg = ExLlamaConfig()
    cfg.num_hidden_layers = layers
    cfg.max_seq_len = 2048
    cfg.max_input_len = 2048
    cfg.max_attention_size = 2048 ** 2
    cfg.tuning.attn_impl = attn_impl
    params = make_synthetic_params(cfg, 128, False, seed=0, fast=True)
    return ExLlama(cfg, params=params)


def prefill_time(model):
    cache = ExLlamaCache(model)
    ids = (np.arange(PROMPT, dtype=np.int32)[None, :] * 31 + 7) % 32000

    def run():
        cache.current_seq_len = 0
        model.forward(ids, cache, preprocess_only=True)
        sync(cache.state.k[0][0, 3, 0, :1])

    return timed(run)


def main():
    # ---- (a) full prefill at 2 depths
    m32 = build(32)
    t32 = prefill_time(m32)
    m16 = build(16)
    t16 = prefill_time(m16)
    slope = (t32 - t16) / 16.0
    fixed = t32 - 32 * slope
    print(f"(a) full prefill: 32L {t32*1e3:.1f} ms ({PROMPT/t32:.0f} tok/s), "
          f"16L {t16*1e3:.1f} ms -> {slope*1e3:.2f} ms/layer + "
          f"{fixed*1e3:.1f} ms fixed")

    # ---- (b) xla attention delta (16 layers is enough for the slope)
    mx = ExLlama(m16.config, params=m16.params)
    mx.config.tuning.attn_impl = "xla"
    tx = prefill_time(mx)
    print(f"(b) attn xla vs flash @16L: {tx*1e3:.1f} vs {t16*1e3:.1f} ms "
          f"(delta {(tx-t16)*1e3:.1f} ms)")

    # ---- (c) isolated flash prefill attention, exact shapes, 32 reps
    from exllama_tpu.ops.attention import attend

    b, h, d, s = 1, 32, 128, 2048
    q = jnp.zeros((b, PROMPT, h, d), jnp.bfloat16) + 0.01
    kc = jnp.zeros((b, h, s, d), jnp.bfloat16) + 0.01
    vc = jnp.zeros((b, h, s, d), jnp.bfloat16) + 0.01

    @functools.partial(jax.jit, static_argnames=("reps",))
    def attn_loop(q, kc, vc, *, reps):
        acc = q
        out = None
        for _ in range(reps):
            out = attend(acc, kc, vc, jnp.int32(0), s, None, impl="flash")
            acc = q + 0.0 * out[:, :1, :1, :1].astype(q.dtype)
        return out[0, 0, 0, :1].astype(jnp.float32)

    f = lambda: np.asarray(attn_loop(q, kc, vc, reps=32))
    t_attn = timed(f)
    print(f"(c) flash prefill attention x32: {t_attn*1e3:.1f} ms "
          f"({t_attn/32*1e3:.2f} ms/layer)")

    # ---- (d) matmul floor from per-layer FLOPs at the measured kernel rate
    # (use scripts/micro_prefill.py for the per-shape numbers; here compute
    # the ideal-time framing at 145 TF/s)
    flops_layer = 2 * PROMPT * (
        4096 * (4096 + 2 * 4096) +       # qkv (fused) + o... see below
        0
    )
    # 7B layer: qkv 4096->(4096+4096+4096 fused? MHA: q,k,v each 4096) + o
    # + gate/up 4096->11008 x2 + down 11008->4096
    flops_layer = 2 * PROMPT * (3 * 4096 * 4096 + 4096 * 4096 +
                                2 * 4096 * 11008 + 11008 * 4096)
    t_mm_roof = flops_layer / 145e12
    print(f"(d) matmul floor at 145 TF/s: {t_mm_roof*1e3:.2f} ms/layer "
          f"({t_mm_roof*32*1e3:.1f} ms total)")

    # ---- (e) MLP elementwise silu.mul at [PROMPT, 11008]
    g = jnp.zeros((PROMPT, 11008), jnp.bfloat16) + 0.3
    u = jnp.zeros((PROMPT, 11008), jnp.bfloat16) + 0.2

    @functools.partial(jax.jit, static_argnames=("reps",))
    def ew_loop(g, u, *, reps):
        acc = g
        out = None
        for _ in range(reps):
            out = jax.nn.silu(acc.astype(jnp.float32)).astype(u.dtype) * u
            acc = g + 0.0 * out[:, :1]
        return out[0, :1].astype(jnp.float32)

    t_ew = timed(lambda: np.asarray(ew_loop(g, u, reps=32)))
    print(f"(e) silu-mul f32 x32: {t_ew*1e3:.1f} ms "
          f"({t_ew/32*1e3:.2f} ms/layer)")

    resid = slope - t_attn / 32 - t_mm_roof - t_ew / 32
    print(f"residual glue per layer (slope - c - d - e): {resid*1e3:.2f} ms")


if __name__ == "__main__":
    main()
