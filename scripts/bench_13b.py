"""Llama-13B-shaped act-order decode/prefill on one chip (BASELINE config
#2: '13B g128 act-order, batch-1 chat decode'). Run from the repo root."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.models.llama import ExLlama, forward_chunk


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


cfg = ExLlamaConfig()
cfg.hidden_size = 5120
cfg.intermediate_size = 13824
cfg.num_attention_heads = 40
cfg.num_key_value_heads = 40
cfg.head_dim = 128
cfg.num_hidden_layers = int(os.environ.get("B13_LAYERS", "40"))
cfg.vocab_size = 32000
cfg.max_seq_len = 2048
cfg.max_input_len = 2048
cfg.max_attention_size = 2048 ** 2

log("building synthetic 13B act-order checkpoint...")
import os as _os
_act = _os.environ.get("B13_ACT", "1") == "1"
params = make_synthetic_params(cfg, groupsize=128, act_order=_act, seed=0,
                               fast=True)
model = ExLlama(cfg, params=params)
cache = ExLlamaCache(model)

rng = np.random.default_rng(0)
prompt_len, decode_len = 1920, 64
ids = rng.integers(0, cfg.vocab_size, size=(1, prompt_len)).astype(np.int32)

# per-call RPC latency of the axon tunnel (pure dispatch+fetch overhead,
# subtracted from single-call timings — docs/PERFORMANCE.md round 3)
@jax.jit
def _ident(x):
    return x + 1

_z = jnp.zeros((8, 128), jnp.bfloat16)
np.asarray(_ident(_z))
LAT = min(
    (lambda t0: (np.asarray(_ident(_z)), time.perf_counter() - t0)[1])(
        time.perf_counter()
    )
    for _ in range(8)
)
log(f"RPC latency {LAT*1e3:.1f} ms")

t0 = time.perf_counter()
model.forward(ids, cache, preprocess_only=True)
np.asarray(cache.state.k[0][0, 0, 0, :1])
log(f"prefill compile+run {time.perf_counter()-t0:.1f}s")
cache.current_seq_len = 0
t0 = time.perf_counter()
model.forward(ids, cache, preprocess_only=True)
np.asarray(cache.state.k[0][0, 0, 0, :1])
_traw = time.perf_counter() - t0
prompt_ts = prompt_len / max(_traw - LAT, 1e-9)
log(f"prompt: {prompt_ts:.0f} tok/s (raw {prompt_len/_traw:.0f})")

# --- turbo prompt (W4A8, partial residency under the default auto budget:
# 13B fits the full model on one chip, so this is the real end-to-end
# deployment path — images attach benefit-ordered until the HBM budget,
# the rest runs the in-kernel requant with static column scales)
try:
    from exllama_tpu.models.llama import _attach_prefill_w8

    model.config.tuning.matmul_impl = "pallas_a8t"
    t0 = time.perf_counter()
    params_t = _attach_prefill_w8(model.params, model.config)
    n_img = sum(
        1 for lp in params_t.layers
        for f in ("q", "k", "v", "o", "gate", "up", "down", "qkv", "gateup")
        if getattr(lp, f) is not None and getattr(lp, f).w8 is not None
    )
    p_save, model.params = model.params, params_t
    log(f"w8 attach: {n_img} images in {time.perf_counter()-t0:.0f}s")
    best_t = None
    for _ in range(3):
        cache.current_seq_len = 0
        t0 = time.perf_counter()
        model.forward(ids, cache, preprocess_only=True)
        np.asarray(cache.state.k[0][0, 0, 0, :1])
        dt = time.perf_counter() - t0
        best_t = dt if best_t is None else min(best_t, dt)
    turbo_ts = prompt_len / max(best_t - LAT, 1e-9)
    log(f"turbo prompt: {turbo_ts:.0f} tok/s (raw {prompt_len/best_t:.0f}; "
        f"reference 13B g128 4090: 7,507)")
    model.params = p_save
    del params_t
    model.config.tuning.matmul_impl = "auto"
except Exception as e:
    log(f" !! turbo prompt failed ({type(e).__name__}: {str(e)[:200]})")
    model.config.tuning.matmul_impl = "auto"

step = functools.partial(
    forward_chunk, attend_len=cfg.max_seq_len, last_token_only=True,
    preprocess_only=False, heads=cfg.num_attention_heads,
    kv_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
    eps=cfg.rms_norm_eps, matmul_impl="pallas",
)


@functools.partial(jax.jit, donate_argnames=("kv",))
def decode_n(params, kv, tok, past):
    def body(i, c):
        kv, tok, pos = c
        lg, kv = step(params, kv, tok, pos, None, None)
        return (kv, jnp.argmax(lg[:, -1, :], -1)[:, None].astype(jnp.int32),
                pos + 1)
    kv, tok, pos = jax.lax.fori_loop(0, decode_len, body, (kv, tok, past))
    return kv, tok


kv = cache.state
tok0 = jnp.asarray([[1]], jnp.int32)
past = jnp.int32(prompt_len)
kv, tok = decode_n(model.params, kv, tok0, past)
np.asarray(tok).ravel()[0]
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    kv, tok = decode_n(model.params, kv, tok0, past)
    np.asarray(tok).ravel()[0]
    ts.append(time.perf_counter() - t0)
dt = max(min(ts) - LAT, 1e-9) / decode_len
log(f"13B act={_act} worst decode: {dt*1e3:.2f} ms/tok = {1/dt:.1f} tok/s "
    f"(raw {decode_len/min(ts):.1f}; "
    f"reference 13B g128 non-act 4090: 86 tok/s worst)")


# --- whole-layer megakernel (tuning.fuse_qkv), exact numerics; act-order
# checkpoints skip it (gates reject x_map qkv) so this mainly matters for
# B13_ACT=0 runs. Guarded like bench.py.
if not _act:
    try:
        step_f = functools.partial(
            forward_chunk, attend_len=cfg.max_seq_len, last_token_only=True,
            preprocess_only=False, heads=cfg.num_attention_heads,
            kv_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
            eps=cfg.rms_norm_eps, matmul_impl="pallas", qkv_fuse=True,
        )

        @functools.partial(jax.jit, donate_argnames=("kv",))
        def decode_f(params, kv, tok, past):
            def body(i, c):
                kv, tok, pos = c
                lg, kv = step_f(params, kv, tok, pos, None, None)
                return (kv,
                        jnp.argmax(lg[:, -1, :], -1)[:, None].astype(
                            jnp.int32),
                        pos + 1)
            kv, tok, pos = jax.lax.fori_loop(
                0, decode_len, body, (kv, tok, past))
            return kv, tok

        kv, tok = decode_f(model.params, kv, tok0, past)
        np.asarray(tok).ravel()[0]
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            kv, tok = decode_f(model.params, kv, tok0, past)
            np.asarray(tok).ravel()[0]
            ts.append(time.perf_counter() - t0)
        dtf = max(min(ts) - LAT, 1e-9) / decode_len
        log(f"13B megakernel decode: {dtf*1e3:.2f} ms/tok = "
            f"{1/dtf:.1f} tok/s")
    except Exception as e:
        log(f" !! megakernel decode failed ({type(e).__name__})")

# --- turbo (W4A8) decode
try:
    step_t = functools.partial(
        forward_chunk, attend_len=cfg.max_seq_len, last_token_only=True,
        preprocess_only=False, heads=cfg.num_attention_heads,
        kv_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
        eps=cfg.rms_norm_eps, matmul_impl="pallas_a8",
    )

    @functools.partial(jax.jit, donate_argnames=("kv",))
    def decode_t(params, kv, tok, past):
        def body(i, c):
            kv, tok, pos = c
            lg, kv = step_t(params, kv, tok, pos, None, None)
            return (kv,
                    jnp.argmax(lg[:, -1, :], -1)[:, None].astype(jnp.int32),
                    pos + 1)
        kv, tok, pos = jax.lax.fori_loop(0, decode_len, body, (kv, tok, past))
        return kv, tok

    kv, tok = decode_t(model.params, kv, tok0, past)
    np.asarray(tok).ravel()[0]
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        kv, tok = decode_t(model.params, kv, tok0, past)
        np.asarray(tok).ravel()[0]
        ts.append(time.perf_counter() - t0)
    dtt = max(min(ts) - LAT, 1e-9) / decode_len
    log(f"13B turbo decode: {dtt*1e3:.2f} ms/tok = {1/dtt:.1f} tok/s")
except Exception as e:
    log(f" !! turbo decode failed ({type(e).__name__})")
