"""TPU numeric check: act-order in-kernel permute vs xla oracle."""
import time
import numpy as np
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.models.llama import ExLlama
from exllama_tpu.formats.loader import make_synthetic_params

def log(*a): print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)

for gs in (128, 32):
    cfg = ExLlamaConfig()
    cfg.num_hidden_layers = 2
    cfg.max_seq_len = 128
    params = make_synthetic_params(cfg, groupsize=gs, act_order=True, seed=1)
    m = ExLlama(cfg, params=params)
    ids = (np.arange(3, dtype=np.int32)[None, :] * 37 + 11) % 32000  # decode-ish T

    cfg.tuning.matmul_impl = "xla"
    a = np.asarray(m.forward(ids, ExLlamaCache(m), last_id_only=False), np.float32)
    cfg.tuning.matmul_impl = "pallas"
    b = np.asarray(m.forward(ids, ExLlamaCache(m), last_id_only=False), np.float32)
    rel = np.abs(a - b).max() / np.abs(a).max()
    log(f"act-order gs={gs} pallas(kernel-permute) vs xla: max|d|/scale = {rel:.4f}")
    assert rel < 0.03, rel
log("ALL OK")
