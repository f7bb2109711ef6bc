"""Hardware canary: compile + run each Pallas kernel family on the real TPU.

Round-2 shipped kernels that passed every interpret-mode test but failed
Mosaic compilation on the chip (VERDICT.md round 2). This script is the
gate that prevents that: it exercises each kernel family at Llama-7B
shapes with a tiny (2-layer) model so compiles stay fast, records
pass/fail per family, and exits non-zero if any DEFAULT-ON path fails.

Usage:  python scripts/tpu_canary.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS: dict[str, dict] = {}


def check(name: str, default_on: bool = True):
    def deco(fn):
        def run():
            t0 = time.perf_counter()
            try:
                fn()
                RESULTS[name] = {
                    "ok": True, "default_on": default_on,
                    "secs": round(time.perf_counter() - t0, 1),
                }
                print(f" -- PASS {name}"
                      f" ({RESULTS[name]['secs']}s)", flush=True)
            except Exception as e:
                msg = str(e)
                key = msg.split("\n")[0]
                for line in msg.split("\n"):
                    ls = line.strip()
                    if "Mosaic" in ls or "INTERNAL" in ls:
                        key = ls
                    if "must be aligned" in ls or "The MLIR operation" in ls \
                            or "tpu.memref" in ls:
                        key = key + " | " + ls
                RESULTS[name] = {
                    "ok": False, "default_on": default_on,
                    "secs": round(time.perf_counter() - t0, 1),
                    "error": key[:500],
                }
                print(f" !! FAIL {name}: {key[:200]}", flush=True)
                if ARGS.verbose:
                    traceback.print_exc()
        return run
    return deco


def _model(layers=2, kv="bf16", groupsize=128, act_order=False,
           shape="7b"):
    import jax.numpy as jnp

    from exllama_tpu.cache import ExLlamaCache
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.models.llama import ExLlama

    cfg = ExLlamaConfig()
    if shape == "33b":      # hidden % 1024 != 0 (padded npair columns)
        cfg.hidden_size = 6656
        cfg.intermediate_size = 17920
        cfg.num_attention_heads = 52
        cfg.num_key_value_heads = 52
        cfg.head_dim = 128
    elif shape == "d64":    # 64-lane head dim + GQA
        cfg.hidden_size = 2048
        cfg.intermediate_size = 5632
        cfg.num_attention_heads = 32
        cfg.num_key_value_heads = 8
        cfg.head_dim = 64
    cfg.num_hidden_layers = layers
    cfg.max_seq_len = 2048
    cfg.max_input_len = 2048
    cfg.max_attention_size = 2048 ** 2
    params = make_synthetic_params(cfg, groupsize=groupsize,
                                   act_order=act_order, seed=0, fast=True)
    model = ExLlama(cfg, params=params)
    dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8, "int4": "int4"}[kv]
    cache = ExLlamaCache(model, dtype=dtype)
    return model, cache


def _decode_step(model, cache, past=512, **over):
    """One T=1 decode step through forward_chunk with given fusion flags."""
    import jax.numpy as jnp

    from exllama_tpu.models.llama import forward_chunk

    cfg = model.config
    kw = dict(
        attend_len=cfg.max_seq_len,
        last_token_only=True,
        preprocess_only=False,
        heads=cfg.num_attention_heads,
        kv_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        eps=cfg.rms_norm_eps,
        matmul_impl="pallas",
        head_mode="argmax",
    )
    kw.update(over)
    tok, new_kv = forward_chunk(
        model.params, cache.state, jnp.asarray([[1]], jnp.int32),
        jnp.int32(past), None, None, **kw)
    cache.state = new_kv   # forward_chunk donates kv — rebind the new state
    np.asarray(tok)  # force execution
    return tok


def main():
    import jax

    assert jax.default_backend() == "tpu", (
        "canary must run on TPU; got " + jax.default_backend())

    model, cache = _model()
    model_i8, cache_i8 = _model(kv="int8")
    model_i4, cache_i4 = _model(kv="int4")

    @check("decode_separate_kernels")
    def c1():
        _decode_step(model, cache, mlp_fuse=False, attn_fuse=False)

    @check("decode_fused_default")       # fuse_attn+fuse_mlp (layer_tail)
    def c2():
        _decode_step(model, cache, mlp_fuse=True, attn_fuse=True)

    @check("decode_qkvfuse", default_on=False)
    def c3():
        _decode_step(model, cache, mlp_fuse=True, attn_fuse=True,
                     qkv_fuse=True)

    @check("decode_int8kv")
    def c4():
        _decode_step(model_i8, cache_i8)

    @check("decode_int4kv_turbo")
    def c5():
        _decode_step(model_i4, cache_i4, matmul_impl="pallas_a8")

    @check("decode_turbo_a8")
    def c6():
        _decode_step(model_i8, cache_i8, matmul_impl="pallas_a8")

    @check("prefill_T256")
    def c7():
        import jax.numpy as jnp

        from exllama_tpu.models.llama import forward_chunk

        cfg = model.config
        toks = jnp.ones((1, 256), jnp.int32)
        _, kvn = forward_chunk(
            model.params, cache.state, toks, jnp.int32(0), None, None,
            attend_len=256, last_token_only=True, preprocess_only=True,
            heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
            eps=cfg.rms_norm_eps, matmul_impl="pallas")
        cache.state = kvn
        np.asarray(kvn.k[0][0, 0, 0, :1])

    def _prefill(m_, c_, t=256, past=0, batch=1, mask=False, **over):
        import jax.numpy as jnp

        from exllama_tpu.models.llama import forward_chunk

        cfg_ = m_.config
        toks = jnp.ones((batch, t), jnp.int32)
        im = None
        if mask:
            im_np = np.ones((batch, cfg_.max_seq_len), bool)
            im_np[:, :2] = False
            im = jnp.asarray(im_np)
        kw = dict(
            attend_len=past + t, last_token_only=True, preprocess_only=True,
            heads=cfg_.num_attention_heads,
            kv_heads=cfg_.num_key_value_heads, head_dim=cfg_.head_dim,
            eps=cfg_.rms_norm_eps, matmul_impl="pallas")
        kw.update(over)
        _, kvn = forward_chunk(
            m_.params, c_.state, toks, jnp.int32(past), None, im, **kw)
        c_.state = kvn
        np.asarray(kvn.k[0][0, 0, 0, :1])

    # the prefill-shaped flash kernel (in-kernel KV loop) engages at
    # T*g >= 256: cover its shape combos (KV dtypes, GQA+D64, a past>0
    # continuation chunk, and the left-pad bias path)
    @check("prefill_T256_int8kv")
    def c7b():
        _prefill(model_i8, cache_i8)

    @check("prefill_T256_int4kv")
    def c7c():
        _prefill(model_i4, cache_i4)

    @check("prefill_chunk_past")
    def c7d():
        _prefill(model, cache, t=256, past=256)

    @check("prefill_d64_gqa")
    def c7e():
        m, c = _model(layers=1, shape="d64")
        _prefill(m, c)

    @check("prefill_batch_mask")
    def c7f():
        import jax.numpy as jnp

        from exllama_tpu.cache import ExLlamaCache

        cache2 = ExLlamaCache(model, batch_size=2)
        _prefill(model, cache2, batch=2, mask=True)
        del cache2

    @check("prefill_turbo_a8t", default_on=False)
    def c8():
        import jax.numpy as jnp

        from exllama_tpu.models.llama import forward_chunk

        cfg = model.config
        toks = jnp.ones((1, 256), jnp.int32)
        _, kvn = forward_chunk(
            model.params, cache.state, toks, jnp.int32(0), None, None,
            attend_len=256, last_token_only=True, preprocess_only=True,
            heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
            eps=cfg.rms_norm_eps, matmul_impl="pallas_a8t")
        cache.state = kvn
        np.asarray(kvn.k[0][0, 0, 0, :1])

    @check("prefill_turbo_w8", default_on=False)
    def c8b():
        # resident-int8 weights: the _w8_matmul_kernel pallas path
        from exllama_tpu.models.llama import _attach_prefill_w8

        p0 = model.params
        model.params = _attach_prefill_w8(p0, model.config)
        try:
            _prefill(model, cache, matmul_impl="pallas_a8t")
        finally:
            model.params = p0

    @check("decode_batch8_slots")        # per-slot cursors (engine path)
    def c9():
        import jax.numpy as jnp

        from exllama_tpu.cache import ExLlamaCache
        from exllama_tpu.models.llama import forward_chunk

        cfg = model.config
        cache8 = ExLlamaCache(model, batch_size=8)
        cursors = jnp.asarray([3, 70, 500, 129, 64, 1, 1000, 2000],
                              jnp.int32) % cfg.max_seq_len
        toks = jnp.ones((8, 1), jnp.int32)
        tok, _ = forward_chunk(
            model.params, cache8.state, toks, cursors, None, None,
            attend_len=cfg.max_seq_len, last_token_only=True,
            preprocess_only=False, heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
            eps=cfg.rms_norm_eps, matmul_impl="pallas", head_mode="argmax")
        np.asarray(tok)

    # risky shape combos (VERDICT r2 item 9): these pass interpret tests
    # but have never seen real Mosaic until this canary
    @check("decode_33b_shapes")          # hidden 6656 (non-1024-multiple)
    def c10():
        m, c = _model(layers=1, shape="33b")
        _decode_step(m, c, heads=m.config.num_attention_heads,
                     kv_heads=m.config.num_key_value_heads,
                     head_dim=m.config.head_dim)

    @check("decode_33b_g32_act")         # g32 + act-order at 6656
    def c11():
        m, c = _model(layers=1, shape="33b", groupsize=32, act_order=True)
        _decode_step(m, c, heads=m.config.num_attention_heads,
                     kv_heads=m.config.num_key_value_heads,
                     head_dim=m.config.head_dim)

    @check("decode_d64_gqa")             # head_dim 64 + GQA 32q/8kv
    def c12():
        m, c = _model(layers=1, shape="d64")
        _decode_step(m, c, heads=m.config.num_attention_heads,
                     kv_heads=m.config.num_key_value_heads,
                     head_dim=m.config.head_dim)

    @check("decode_d64_int8kv")
    def c13():
        m, c = _model(layers=1, shape="d64", kv="int8")
        _decode_step(m, c, heads=m.config.num_attention_heads,
                     kv_heads=m.config.num_key_value_heads,
                     head_dim=m.config.head_dim)

    @check("tp4_local_shard_kernels")
    def c14():
        # Mosaic legality of the PER-SHARD kernel shapes a tp=4 7B
        # deployment runs under shard_map (VERDICT r4 item 1): retile the
        # packed weights, slice shard 0's segment on this one chip, and
        # compile+run the decode GEMV and prefill kernels at the local
        # widths (fused qkv 3x1024 cols, gateup 2x3072, down K=2816).
        import dataclasses as dc

        import jax.numpy as jnp

        from exllama_tpu.config import ExLlamaConfig
        from exllama_tpu.formats.gptq import localize_for_tp
        from exllama_tpu.formats.loader import make_synthetic_params
        from exllama_tpu.ops.quant import q4_matmul
        from exllama_tpu.parallel.mesh import prepare_params_tp

        tp = 4
        cfg = ExLlamaConfig()      # 7B widths
        cfg.num_hidden_layers = 1
        cfg.tuning.fuse_projections = False
        p = make_synthetic_params(cfg, groupsize=128, act_order=False,
                                  fast=True)
        pt = prepare_params_tp(p, tp, fuse=True)
        lp = pt.layers[0]

        def shard0(qt, mode):
            loc = localize_for_tp(qt, mode)
            if mode == "out":
                w = qt.qweight.shape[1] // tp
                s = qt.scales.shape[1] // tp
                return dc.replace(
                    loc,
                    qweight=jnp.asarray(qt.qweight[:, :w]),
                    scales=jnp.asarray(qt.scales[:, :s]),
                    zscale=jnp.asarray(qt.zscale[:, :s]),
                )
            rows = qt.qweight.shape[0] // tp
            g = qt.scales.shape[0] // tp
            return dc.replace(
                loc,
                qweight=jnp.asarray(qt.qweight[:rows]),
                scales=jnp.asarray(qt.scales[:g]),
                zscale=jnp.asarray(qt.zscale[:g]),
            )

        qkv0 = shard0(lp.qkv, "out")
        gu0 = shard0(lp.gateup, "out")
        o0 = shard0(lp.o, "in")
        dn0 = shard0(lp.down, "in")
        x_h = jnp.ones((1, cfg.hidden_size), jnp.bfloat16)
        x_o = jnp.ones((1, o0.in_features), jnp.bfloat16)
        x_d = jnp.ones((1, dn0.in_features), jnp.bfloat16)
        for xx, qt in ((x_h, qkv0), (x_h, gu0), (x_o, o0), (x_d, dn0)):
            np.asarray(q4_matmul(xx, qt, impl="pallas"))           # GEMV
            xp = jnp.ones((256, xx.shape[1]), jnp.bfloat16)
            np.asarray(q4_matmul(xp, qt, impl="pallas"))           # prefill

    for c in (c1, c2, c3, c4, c5, c6, c7, c7b, c7c, c7d, c7e, c7f,
              c8, c8b, c9, c10, c11, c12, c13, c14):
        c()

    bad_default = [k for k, v in RESULTS.items()
                   if not v["ok"] and v["default_on"]]
    out = {
        "ok": not bad_default,
        "failed_default_paths": bad_default,
        "checks": RESULTS,
    }
    if ARGS.json:
        with open(ARGS.json, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({k: v["ok"] for k, v in RESULTS.items()}))
    sys.exit(0 if not bad_default else 1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--verbose", action="store_true")
    ARGS = ap.parse_args()
    main()
