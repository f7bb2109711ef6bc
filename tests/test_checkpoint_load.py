"""End-to-end checkpoint loading: config.json + sharded GPTQ safetensors →
ExLlama → forward, and the shard-splitter utility round trip.

This is the full user entry path (the reference's 5-object dance,
example_basic.py:19-26) driven against a fabricated on-disk checkpoint —
the only piece unit tests elsewhere don't cover is the safetensors scan /
multi-shard streaming / key routing of formats/loader.py
(reference model.py:731-841).
"""

import json
import os

import numpy as np
import pytest
import safetensors.numpy

from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.gptq import quantize_matrix
from exllama_tpu.models.llama import ExLlama


CFG = dict(
    hidden_size=256,
    intermediate_size=512,
    num_attention_heads=4,
    num_key_value_heads=2,
    num_hidden_layers=2,
    vocab_size=384,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    bos_token_id=1,
    eos_token_id=2,
    pad_token_id=0,
)


def write_checkpoint(dirname: str, groupsize=32, act_order=False, seed=9):
    rng = np.random.default_rng(seed)
    h = CFG["hidden_size"]
    inter = CFG["intermediate_size"]
    kvdim = CFG["num_key_value_heads"] * (h // CFG["num_attention_heads"])
    tensors = {}

    def put_quant(prefix, k, n):
        w = rng.standard_normal((k, n), dtype=np.float32) * 0.02
        t = quantize_matrix(w, groupsize, act_order, rng)
        tensors[f"{prefix}.qweight"] = t["qweight"]
        tensors[f"{prefix}.qzeros"] = t["qzeros"]
        tensors[f"{prefix}.scales"] = t["scales"]
        if act_order:
            tensors[f"{prefix}.g_idx"] = t["g_idx"]

    for i in range(CFG["num_hidden_layers"]):
        p = f"model.layers.{i}"
        tensors[f"{p}.input_layernorm.weight"] = np.ones(h, np.float32)
        tensors[f"{p}.post_attention_layernorm.weight"] = np.ones(h, np.float32)
        put_quant(f"{p}.self_attn.q_proj", h, h)
        put_quant(f"{p}.self_attn.k_proj", h, kvdim)
        put_quant(f"{p}.self_attn.v_proj", h, kvdim)
        put_quant(f"{p}.self_attn.o_proj", h, h)
        put_quant(f"{p}.mlp.gate_proj", h, inter)
        put_quant(f"{p}.mlp.up_proj", h, inter)
        put_quant(f"{p}.mlp.down_proj", inter, h)
    tensors["model.embed_tokens.weight"] = (
        rng.standard_normal((CFG["vocab_size"], h), dtype=np.float32) * 0.02
    )
    tensors["model.norm.weight"] = np.ones(h, np.float32)
    tensors["lm_head.weight"] = (
        rng.standard_normal((CFG["vocab_size"], h), dtype=np.float32) * 0.02
    )

    # split into two shards like a real multi-file checkpoint
    keys = sorted(tensors)
    mid = len(keys) // 2
    safetensors.numpy.save_file(
        {k: tensors[k] for k in keys[:mid]},
        os.path.join(dirname, "model-00001-of-00002.safetensors"),
    )
    safetensors.numpy.save_file(
        {k: tensors[k] for k in keys[mid:]},
        os.path.join(dirname, "model-00002-of-00002.safetensors"),
    )
    with open(os.path.join(dirname, "config.json"), "w") as f:
        json.dump(CFG, f)
    return tensors


@pytest.mark.parametrize("act_order", [False, True])
def test_load_sharded_checkpoint_and_forward(tmp_path, act_order):
    write_checkpoint(str(tmp_path), act_order=act_order)
    config = ExLlamaConfig(os.path.join(str(tmp_path), "config.json"))
    config.model_path = str(tmp_path)
    config.max_seq_len = 64
    config.max_input_len = 64
    config.tuning.matmul_impl = "xla"
    config.tuning.attn_len_bucket = 32

    model = ExLlama(config)
    assert config.groupsize == 32
    assert config.act_order == act_order
    cache = ExLlamaCache(model)
    ids = (np.arange(12, dtype=np.int32)[None] * 7 + 3) % CFG["vocab_size"]
    logits = model.forward(ids, cache, last_id_only=False)
    lg = np.asarray(logits, np.float32)
    assert lg.shape == (1, 12, CFG["vocab_size"])
    assert np.isfinite(lg).all()

    # decode continues coherently (same argmax from cached vs full forward)
    nxt = int(lg[0, -1].argmax())
    lg2 = model.forward(np.array([[nxt]], np.int32), cache)
    cache2 = ExLlamaCache(model)
    full = model.forward(
        np.concatenate([ids, [[nxt]]], axis=1), cache2, last_id_only=True
    )
    np.testing.assert_allclose(
        np.asarray(lg2, np.float32),
        np.asarray(full, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_shard_util_roundtrip(tmp_path):
    """util/shard.py equivalent: split a single-file checkpoint and load the
    shards back (reference util/shard.py:30-80)."""
    tensors = write_checkpoint(str(tmp_path))
    from exllama_tpu.utils.shard import shard_file

    single = os.path.join(str(tmp_path), "single.safetensors")
    safetensors.numpy.save_file(tensors, single)
    outdir = os.path.join(str(tmp_path), "shards")
    os.makedirs(outdir)
    files = shard_file(single, max_gb=200_000 / 1024**3, output_dir=outdir)
    assert len(files) > 1
    back = {}
    for fn in files:
        with safetensors.safe_open(fn, framework="np") as f:
            for k in f.keys():
                back[k] = f.get_tensor(k)
    assert sorted(back) == sorted(tensors)
    for k in tensors:
        np.testing.assert_array_equal(back[k], tensors[k])


def test_fabricated_checkpoint_loads_and_decodes(tmp_path):
    """utils/fabricate writes wire-format GPTQ shards + index; the loader
    must scan/stream/repack them and the model must decode (the disk-path
    rehearsal entry, VERDICT r1 missing #3)."""
    from exllama_tpu.utils.fabricate import fabricate

    out, total = fabricate(
        str(tmp_path), model="tiny", groupsize=32, act_order=True,
        shard_gb=0.01, seed=4, verbose=False,
    )
    assert total > 0
    files = os.listdir(str(tmp_path))
    assert "config.json" in files
    assert "model.safetensors.index.json" in files
    assert sum(f.endswith(".safetensors") for f in files) >= 2

    config = ExLlamaConfig(os.path.join(str(tmp_path), "config.json"))
    config.model_path = str(tmp_path)
    config.max_seq_len = 64
    config.tuning.matmul_impl = "xla"
    model = ExLlama(config)
    assert config.groupsize == 32 and config.act_order
    cache = ExLlamaCache(model)
    ids = (np.arange(8, dtype=np.int32)[None, :] * 3 + 1) % 100
    lg = model.forward(ids, cache)
    assert np.all(np.isfinite(np.asarray(lg)))
    lg2 = model.forward(np.asarray([[5]], np.int32), cache)
    assert np.all(np.isfinite(np.asarray(lg2)))
