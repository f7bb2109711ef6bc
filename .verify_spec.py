"""Drive SpeculativeGenerator on the real TPU (pallas path)."""
import time
import numpy as np
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.models.llama import ExLlama
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.speculative import NgramProposer, SpeculativeGenerator
from exllama_tpu.tokenizer import FakeTokenizer
import jax.numpy as jnp

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

cfg = ExLlamaConfig()
cfg.num_hidden_layers = 2
cfg.max_seq_len = 256
cfg.tuning.matmul_impl = "pallas"
params = make_synthetic_params(cfg, groupsize=128, act_order=False, seed=0)
model = ExLlama(cfg, params=params)
ids = (np.arange(10, dtype=np.int32) * 7 + 3) % 32000

# plain greedy reference
cache = ExLlamaCache(model)
seq = list(map(int, ids))
model.forward(np.asarray(seq[:-1], np.int32)[None], cache, preprocess_only=True)
for _ in range(16):
    lg = model.forward(np.asarray(seq[-1:], np.int32)[None], cache)
    seq.append(int(jnp.argmax(lg[0, -1])))
ref = np.asarray(seq, np.int32)
log("plain greedy done")

gen = SpeculativeGenerator(model, FakeTokenizer(), ExLlamaCache(model), NgramProposer())
gen.settings.top_k = 1
got = gen.generate_tokens(ids, 16)
log(f"spec: forwards={gen.stats['forwards']} accepted={gen.stats['accepted']}/{gen.stats['drafted']}")
assert np.array_equal(got, ref), (got, ref)
log("speculative greedy == plain greedy on TPU: OK")
