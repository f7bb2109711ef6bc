"""Batched generation with left-padded prompts (reference example_batch.py)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import build_from_args
from exllama_tpu.generator import ExLlamaGenerator

prompts = [
    "Once upon a time,",
    "I don't like to",
    "A turbo encabulator is a",
    "In the words of Mark Twain,",
]

args, cfg, model, tokenizer, cache = build_from_args(
    "batched generation", batch_size=len(prompts)
)
generator = ExLlamaGenerator(model, tokenizer, cache)
generator.settings.top_k = 40

for line in generator.generate_simple(
    prompts, max_new_tokens=args.max_new or 100
):
    print(line)
    print("---")
