"""exllama_tpu — a TPU-native 4-bit GPTQ LLM inference engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of ExLlama
(reference: turboderp/exllama): packed GPTQ weights resident in HBM, fused
dequant+matmul Pallas kernels on the MXU, GQA attention over a preallocated
bf16 KV cache, a full sampling/generation layer (streaming, stop conditions,
CFG, beam search, LoRA), and tensor-sharded multi-chip serving over ICI via
jax.sharding.

Public API mirrors the reference's 5-object dance (example_basic.py:19-26 in
the reference):

    config    = ExLlamaConfig("config.json"); config.model_path = "..."
    model     = ExLlama(config)
    tokenizer = ExLlamaTokenizer("tokenizer.model")
    cache     = ExLlamaCache(model)
    generator = ExLlamaGenerator(model, tokenizer, cache)
"""

from exllama_tpu.utils.compile_cache import init_compilation_cache

init_compilation_cache()

from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.version import __version__

__all__ = ["ExLlamaConfig", "__version__"]
