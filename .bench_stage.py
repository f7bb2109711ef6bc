import time, numpy as np, jax, jax.numpy as jnp, functools, sys
def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)
layers = int(sys.argv[1]); plen = int(sys.argv[2]); dlen = int(sys.argv[3])
import bench as B
from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.models.llama import forward_chunk
log(f"building model layers={layers}")
model = B.build_model(layers)
cfg = model.config
cache = ExLlamaCache(model)
rng = np.random.default_rng(0)
ids = rng.integers(0, cfg.vocab_size, size=(1, plen)).astype(np.int32)
log("prefill compile+run...")
t0=time.perf_counter()
model.forward(ids, cache, preprocess_only=True)
v = np.asarray(cache.state.k[0,0,0,0,:1])
log(f"prefill done {time.perf_counter()-t0:.1f}s")
t0=time.perf_counter()
cache.current_seq_len=0
model.forward(ids, cache, preprocess_only=True)
v = np.asarray(cache.state.k[0,0,0,0,:1])
dt = time.perf_counter()-t0
log(f"prefill warm: {dt:.3f}s = {plen/dt:.0f} tok/s")
step = functools.partial(forward_chunk, attend_len=cfg.max_seq_len,
    last_token_only=True, preprocess_only=False, heads=cfg.num_attention_heads,
    kv_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
    eps=cfg.rms_norm_eps, matmul_impl="pallas")
log("single decode step compile...")
t0=time.perf_counter()
lg, kv = step(model.params, cache.state, jnp.asarray([[1]], jnp.int32), jnp.int32(plen), None, None)
v = np.asarray(lg[0,0,:1])
log(f"decode step compiled {time.perf_counter()-t0:.1f}s")
# warm decode loop (host-driven)
t0=time.perf_counter()
for i in range(dlen):
    lg, kv = step(model.params, kv, jnp.asarray([[1]], jnp.int32), jnp.int32(plen+1+i), None, None)
v = np.asarray(lg[0,0,:1])
dt=(time.perf_counter()-t0)/dlen
log(f"decode host-loop: {dt*1e3:.2f} ms/tok = {1/dt:.1f} tok/s")
