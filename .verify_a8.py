"""TPU numeric check of the W4A8 kernel + turbo (a8 + int8 KV) timing."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.models.llama import ExLlama, forward_chunk
from exllama_tpu.formats.loader import make_synthetic_params

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

cfg = ExLlamaConfig()
cfg.num_hidden_layers = 2
cfg.max_seq_len = 256
params = make_synthetic_params(cfg, groupsize=128, act_order=False, seed=0)
m = ExLlama(cfg, params=params)
ids = (np.arange(24, dtype=np.int32)[None, :] * 37 + 11) % 32000

cfg.tuning.matmul_impl = "xla"
a = np.asarray(m.forward(ids, ExLlamaCache(m), last_id_only=False), np.float32)
cfg.tuning.matmul_impl = "pallas_a8"
b = np.asarray(m.forward(ids, ExLlamaCache(m), last_id_only=False), np.float32)
rel = np.abs(a - b).max() / np.abs(a).max()
log(f"pallas_a8 vs xla on TPU: max|d|/scale = {rel:.4f}")
assert rel < 0.04, rel

# turbo decode timing: a8 + int8 KV, 32-layer
import bench as B
model = B.build_model(32)
bigcfg = model.config
step = functools.partial(forward_chunk, attend_len=bigcfg.max_seq_len,
    last_token_only=True, preprocess_only=False,
    heads=bigcfg.num_attention_heads, kv_heads=bigcfg.num_key_value_heads,
    head_dim=bigcfg.head_dim, eps=bigcfg.rms_norm_eps,
    matmul_impl="pallas_a8")

@functools.partial(jax.jit, donate_argnames=("kv",))
def decode_n(params, kv, tok, past):
    def body(i, c):
        kv, tok, pos = c
        lg, kv = step(params, kv, tok, pos, None, None)
        return kv, jnp.argmax(lg[:, -1, :], -1)[:, None].astype(jnp.int32), pos + 1
    kv, tok, pos = jax.lax.fori_loop(0, 64, body, (kv, tok, past))
    return kv, tok

kv = ExLlamaCache(model, dtype=jnp.int8).state
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
log(f"turbo (a8 + int8 KV) worst decode: {dt*1e3:.3f} ms/tok = {1/dt:.1f} tok/s")
