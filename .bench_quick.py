"""Quick worst-ctx decode measurement (no prefill/best/int8)."""
import functools, time
import jax, jax.numpy as jnp, numpy as np
import bench as B
from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.models.llama import forward_chunk

import os as _os
if _os.environ.get("BQ_ACT"):
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.models.llama import ExLlama
    _cfg = ExLlamaConfig()
    _cfg.num_hidden_layers = 32
    _cfg.max_seq_len = 2048
    _cfg.max_input_len = 2048
    _cfg.max_attention_size = 2048 ** 2
    _params = make_synthetic_params(_cfg, groupsize=128, act_order=True,
                                    seed=0, fast=True)
    model = ExLlama(_cfg, params=_params)
else:
    model = B.build_model(32)
cfg = model.config
step = functools.partial(forward_chunk, attend_len=cfg.max_seq_len,
    last_token_only=True, preprocess_only=False, heads=cfg.num_attention_heads,
    kv_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
    eps=cfg.rms_norm_eps, matmul_impl=__import__("os").environ.get("BQ_IMPL", "pallas"))

@functools.partial(jax.jit, donate_argnames=("kv",))
def decode_n(params, kv, tok, past):
    def body(i, c):
        kv, tok, pos = c
        lg, kv = step(params, kv, tok, pos, None, None)
        return kv, jnp.argmax(lg[:, -1, :], -1)[:, None].astype(jnp.int32), pos + 1
    kv, tok, pos = jax.lax.fori_loop(0, 64, body, (kv, tok, past))
    return kv, tok

kv = ExLlamaCache(model).state
tok0 = jnp.asarray([[1]], jnp.int32)
past = jnp.int32(1920)
kv, tok = decode_n(model.params, kv, tok0, past)
np.asarray(tok).ravel()[0]
ts = []
for _ in range(4):
    t0 = time.perf_counter()
    kv, tok = decode_n(model.params, kv, tok0, past)
    np.asarray(tok).ravel()[0]
    ts.append(time.perf_counter() - t0)
dt = min(ts) / 64
print(f"worst decode: {dt*1e3:.3f} ms/tok = {1/dt:.1f} tok/s", flush=True)
