"""Continuous-batching engine throughput with/without turbo modes."""
import os, time
import numpy as np
import jax.numpy as jnp

from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.models.llama import ExLlama
from exllama_tpu.serve.engine import ContinuousBatchingEngine
from exllama_tpu.ops.sampling import SamplerSettings

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

MODE = os.environ.get("ENG_MODE", "base")  # base | turbo
cfg = ExLlamaConfig()
cfg.num_hidden_layers = 32
cfg.max_seq_len = 1024
cfg.max_input_len = 1024
cfg.max_attention_size = 1024 ** 2
if MODE == "turbo":
    cfg.tuning.matmul_impl = "pallas_a8"
    cfg.tuning.kv_cache_dtype = "int8"
params = make_synthetic_params(cfg, groupsize=128, act_order=False, seed=0,
                               fast=True)
model = ExLlama(cfg, params=params)

SLOTS = 8
eng = ContinuousBatchingEngine(model, max_slots=SLOTS, attn_bucket=1024)
rng = np.random.default_rng(0)
st = SamplerSettings(); st.top_k = 1
for i in range(SLOTS):
    eng.submit(rng.integers(0, 32000, size=(900,)).astype(np.int32),
               max_new_tokens=120, settings=st)
# warm (admission prefill + first steps compile)
for _ in range(4):
    eng.step()
log("warm done; timing 40 steps x8 slots")
t0 = time.perf_counter()
n = 0
for _ in range(40):
    out = eng.step()
    n += sum(1 for r, tok, fin in out)
import jax
np.asarray(jax.tree.leaves(eng.cache.state)[0][0, 0, 0, :1])
dt = time.perf_counter() - t0
log(f"{MODE}: {n} tokens in {dt:.3f}s = {n/dt:.0f} tok/s aggregate "
    f"({SLOTS} slots, ctx ~900)")
