"""Quick prompt-only measurement."""
import time
import numpy as np
import bench as B
from exllama_tpu.cache import ExLlamaCache

model = B.build_model(32)
cache = ExLlamaCache(model)
rng = np.random.default_rng(0)
ids = rng.integers(0, model.config.vocab_size, size=(1, 1920)).astype(np.int32)

def prefill():
    cache.current_seq_len = 0
    t0 = time.perf_counter()
    model.forward(ids, cache, preprocess_only=True)
    np.asarray(cache.state.k[0][0, 17, 0, :1])
    return time.perf_counter() - t0

prefill()
ts = [prefill() for _ in range(4)]
print(f"prompt: {1920/min(ts):.0f} tok/s ({min(ts)*1e3:.1f} ms)", flush=True)
