"""LoRA loader + application tests with a fabricated PEFT adapter."""

import json
import os

import numpy as np
import pytest

from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.lora import ExLlamaLora
from exllama_tpu.models.llama import ExLlama


def tiny_model():
    cfg = ExLlamaConfig()
    cfg.hidden_size = 256
    cfg.intermediate_size = 512
    cfg.num_attention_heads = 4
    cfg.num_key_value_heads = 4
    cfg.head_dim = 64
    cfg.num_hidden_layers = 2
    cfg.vocab_size = 128
    cfg.max_seq_len = 64
    cfg.tuning.matmul_impl = "xla"
    return ExLlama(cfg, params=make_synthetic_params(cfg, 128, False, seed=3))


def write_adapter(tmpdir, model, scale=0.01, r=4, alpha=8, zero=False):
    import safetensors.numpy

    cfg_path = os.path.join(tmpdir, "adapter_config.json")
    with open(cfg_path, "w") as f:
        json.dump({"r": r, "lora_alpha": alpha, "fan_in_fan_out": False}, f)
    rng = np.random.default_rng(0)
    tensors = {}
    h = model.config.hidden_size
    for li in range(model.config.num_hidden_layers):
        for proj, dim_in, dim_out in [
            ("self_attn.q_proj", h, 256),
            ("mlp.down_proj", 512, h),
        ]:
            base = f"base_model.model.model.layers.{li}.{proj}"
            a = rng.normal(size=(r, dim_in)).astype(np.float32) * scale
            b = rng.normal(size=(dim_out, r)).astype(np.float32) * scale
            if zero:
                a[:] = 0
                b[:] = 0
            tensors[f"{base}.lora_A.weight"] = a
            tensors[f"{base}.lora_B.weight"] = b
    path = os.path.join(tmpdir, "adapter_model.safetensors")
    safetensors.numpy.save_file(tensors, path)
    return cfg_path, path


def run(model, lora=None):
    cache = ExLlamaCache(model)
    ids = (np.arange(8, dtype=np.int32)[None, :] * 3 + 1) % 128
    return np.asarray(model.forward(ids, cache, lora=lora))


def test_zero_adapter_is_identity(tmp_path):
    model = tiny_model()
    cfgp, path = write_adapter(str(tmp_path), model, zero=True)
    lora = ExLlamaLora(model, cfgp, path)
    assert lora.lora_scaling == 2.0
    base = run(model)
    with_lora = run(model, lora=lora)
    np.testing.assert_allclose(base, with_lora, atol=1e-5)


def test_nonzero_adapter_changes_output(tmp_path):
    model = tiny_model()
    cfgp, path = write_adapter(str(tmp_path), model, scale=0.1)
    lora = ExLlamaLora(model, cfgp, path)
    assert lora.stacked[0].q is not None
    assert lora.stacked[0].down is not None
    assert lora.stacked[0].k is None  # not adapted
    base = run(model)
    with_lora = run(model, lora=lora)
    assert np.max(np.abs(base - with_lora)) > 1e-3


def test_bad_shape_rejected(tmp_path):
    import safetensors.numpy

    model = tiny_model()
    with open(tmp_path / "adapter_config.json", "w") as f:
        json.dump({"r": 4, "lora_alpha": 8}, f)
    tensors = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
            np.zeros((4, 999), np.float32),
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight":
            np.zeros((256, 4), np.float32),
    }
    path = str(tmp_path / "adapter_model.safetensors")
    safetensors.numpy.save_file(tensors, path)
    with pytest.raises(ValueError, match="incompatible"):
        ExLlamaLora(model, str(tmp_path / "adapter_config.json"), path)


def test_nonzero_bias_rejected(tmp_path):
    import safetensors.numpy

    model = tiny_model()
    with open(tmp_path / "adapter_config.json", "w") as f:
        json.dump({"r": 4, "lora_alpha": 8}, f)
    tensors = {
        "base_model.model.model.layers.0.self_attn.q_proj.bias":
            np.ones((256,), np.float32),
    }
    path = str(tmp_path / "adapter_model.safetensors")
    safetensors.numpy.save_file(tensors, path)
    with pytest.raises(ValueError, match="bias"):
        ExLlamaLora(model, str(tmp_path / "adapter_config.json"), path)
