"""Pod-mesh (dcn, dp, tp) sharding on virtual devices.

Single-process stand-in for an N-host run: the mesh layout, param/cache
shardings, and the jitted forward are identical to multi-host execution —
only the number of processes differs (jax.distributed adds processes, not
new sharding semantics)."""

import numpy as np
import jax
import pytest

from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.models.llama import ExLlama
from exllama_tpu.parallel import multihost
from exllama_tpu.parallel.mesh import shard_params


def cfg_small():
    from exllama_tpu.config import ExLlamaConfig

    c = ExLlamaConfig()
    c.hidden_size = 1024
    c.intermediate_size = 2048
    c.num_attention_heads = 16
    c.num_key_value_heads = 8
    c.head_dim = 128
    c.num_hidden_layers = 2
    c.vocab_size = 256
    c.max_seq_len = 32
    c.max_input_len = 32
    c.tuning.matmul_impl = "xla"
    c.tuning.fuse_projections = False  # TP shards per-projection columns
    c.tuning.attn_len_bucket = 16
    return c


def test_pod_mesh_forward_matches_single_device():
    cfg = cfg_small()
    params = make_synthetic_params(cfg, 128, False, seed=5)
    ids = (np.arange(2 * 8, dtype=np.int32).reshape(2, 8) * 5 + 2) % cfg.vocab_size

    model = ExLlama(cfg, params=params)
    ref = np.asarray(model.forward(ids, ExLlamaCache(model, batch_size=2)))

    mesh = multihost.make_pod_mesh(tp=4, dp_per_host=2)
    assert mesh.shape == {"dcn": 1, "dp": 2, "tp": 4}
    sharded = shard_params(params, mesh)
    model_s = ExLlama(cfg, params=sharded, mesh=mesh)
    cache_s = multihost.shard_cache_pod(
        ExLlamaCache(model_s, batch_size=2), mesh
    )
    got = np.asarray(model_s.forward(ids, cache_s))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_local_batch_slice_single_process():
    assert multihost.local_batch_slice(8) == slice(0, 8)


def test_initialize_single_host_noop():
    # single-process initialize must not raise on repeat calls
    try:
        multihost.initialize(num_processes=1, process_id=0,
                             coordinator_address="127.0.0.1:12321")
    except Exception:
        pytest.skip("distributed init unavailable in this environment")
