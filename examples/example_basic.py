"""Minimal usage: the 5-object dance + generate_simple
(reference example_basic.py)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import build_from_args
from exllama_tpu.generator import ExLlamaGenerator

args, cfg, model, tokenizer, cache = build_from_args("basic generation")

generator = ExLlamaGenerator(model, tokenizer, cache)
generator.settings.token_repetition_penalty_max = 1.2
generator.settings.temperature = 0.95
generator.settings.top_p = 0.65
generator.settings.top_k = 100

prompt = "Once upon a time,"
print(generator.generate_simple(prompt,
                                max_new_tokens=args.max_new or 200))
