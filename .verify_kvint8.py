"""Drive int8-KV on the real TPU: flash-kernel correctness vs xla oracle,
then full-model closeness int8 vs bf16 cache."""
import time
import numpy as np
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.models.llama import ExLlama
from exllama_tpu.formats.loader import make_synthetic_params


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def build(kv_dtype, attn, seed=0):
    cfg = ExLlamaConfig()
    cfg.num_hidden_layers = 2
    cfg.max_seq_len = 256
    cfg.tuning.matmul_impl = "pallas"
    cfg.tuning.attn_impl = attn
    cfg.tuning.kv_cache_dtype = kv_dtype
    params = make_synthetic_params(cfg, groupsize=128, act_order=False,
                                  seed=seed)
    return ExLlama(cfg, params=params)


ids = (np.arange(48, dtype=np.int32)[None, :] * 37 + 11) % 32000

# flash+int8 vs xla+int8 (same quantized cache → isolates the kernel)
m_flash = build("int8", "flash")
m_xla = build("int8", "xla")
a = np.asarray(m_flash.forward(ids, ExLlamaCache(m_flash), last_id_only=False), np.float32)
b = np.asarray(m_xla.forward(ids, ExLlamaCache(m_xla), last_id_only=False), np.float32)
rel = np.abs(a - b).max() / np.abs(b).max()
log(f"flash-int8 vs xla-int8: max|d|/scale = {rel:.4f}")
assert rel < 0.03, rel

# int8 cache vs bf16 cache (both flash)
m_b = build("bf16", "flash")
c = np.asarray(m_b.forward(ids, ExLlamaCache(m_b), last_id_only=False), np.float32)
rel2 = np.abs(a - c).max() / np.abs(c).max()
log(f"int8 vs bf16 cache (flash): max|d|/scale = {rel2:.4f}")
assert rel2 < 0.06, rel2

# decode steps after prefill, batch 2 masked
m = m_flash
cache = ExLlamaCache(m, batch_size=2)
bids = np.concatenate([ids[:, :32], ids[:, 8:40]], axis=0)
mask = np.ones((2, 256), bool)
m.forward(bids, cache, preprocess_only=True)
for i in range(3):
    lg = m.forward(bids[:, -1:], cache, input_mask=mask)
assert np.isfinite(np.asarray(lg)).all()
log("batched int8 decode finite OK")
log("ALL OK")
