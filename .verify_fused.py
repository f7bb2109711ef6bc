"""Verify fused projections + bf16 scales end-to-end on the real TPU."""
import time
import numpy as np
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.models.llama import ExLlama
from exllama_tpu.formats.loader import make_synthetic_params


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def build(gs, act, fuse, impl, seed=0):
    cfg = ExLlamaConfig()
    cfg.num_hidden_layers = 2
    cfg.max_seq_len = 256
    cfg.tuning.matmul_impl = impl
    cfg.tuning.fuse_projections = fuse
    params = make_synthetic_params(cfg, groupsize=gs, act_order=act, seed=seed)
    return ExLlama(cfg, params=params)


def run(model, ids, mask=None):
    cache = ExLlamaCache(model, batch_size=ids.shape[0])
    lg = model.forward(ids, cache, last_id_only=False, input_mask=mask)
    return np.asarray(lg, np.float32)


rng = np.random.default_rng(0)
ids = (np.arange(16, dtype=np.int32)[None, :] * 37 + 11) % 32000

for gs, act in ((128, False), (32, False), (128, True)):
    m_pal = build(gs, act, True, "pallas")
    m_xla = build(gs, act, False, "xla")
    lp = m_pal.params.layers[0]
    fused = lp.qkv is not None
    a = run(m_pal, ids)
    b = run(m_xla, ids)
    scale = np.abs(b).max()
    rel = np.abs(a - b).max() / scale
    log(f"gs={gs} act={act} fused={fused}: max|d|/scale = {rel:.4f}")
    assert rel < 0.03, rel

# batch>1 with left-pad mask, fused pallas
m = build(128, False, True, "pallas")
b_ids = np.zeros((2, 16), np.int32)
b_ids[0] = ids[0]
b_ids[1, 4:] = ids[0, : 12]
mask = np.ones((2, 256), bool)
mask[1, :4] = False
lg = run(m, b_ids, mask)
assert np.isfinite(lg).all()
log("batched masked forward finite OK", lg.shape)

# greedy decode continuation: fused-pallas vs unfused-xla tokens w/ margin rule
m2 = build(128, False, False, "pallas")
a = run(m, ids)
c = run(m2, ids)
noise = np.abs(a - c).max()
log(f"fused vs unfused pallas: max|d| = {noise:.4f} (logit scale {np.abs(a).max():.1f})")
log("ALL OK")
