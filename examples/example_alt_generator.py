"""Streaming generation with stop conditions
(reference example_alt_generator.py)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import build_from_args
from exllama_tpu.alt_generator import ExLlamaAltGenerator

args, cfg, model, tokenizer, cache = build_from_args("streaming")
generator = ExLlamaAltGenerator(model, tokenizer, cache)

settings = ExLlamaAltGenerator.Settings()
settings.temperature = 0.8

prompt = "A short poem about the TPU:\n\n"
stop_conditions = ["\n\n", tokenizer.eos_token_id]

generator.begin_stream(prompt, stop_conditions, 200, settings)
print(prompt, end="", flush=True)
while True:
    chunk, eos = generator.stream()
    print(chunk, end="", flush=True)
    if eos:
        break
print()
