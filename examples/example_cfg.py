"""Classifier-free guidance over a (positive, negative) system-prompt pair
(reference example_cfg.py). Sweep alpha to interpolate/extrapolate between
the two behaviors."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import build_from_args
from exllama_tpu.generator import ExLlamaGenerator

f_positive = "[INST] You are a helpful assistant. {prompt} [/INST]"
f_negative = "[INST] You are a rude and obnoxious assistant. {prompt} [/INST]"

question = "Tell me about Homer Simpson"
prompts = [
    f_positive.replace("{prompt}", question),
    f_negative.replace("{prompt}", question),
]

args, cfg, model, tokenizer, cache = build_from_args("CFG", batch_size=2)
generator = ExLlamaGenerator(model, tokenizer, cache)

for i in range(10):
    alpha = i / 5.0 - 0.4
    print(f"\n----- alpha = {alpha:.1f} -----")
    output = generator.generate_cfg(
        prompts, alpha, max_new_tokens=args.max_new or 200
    )
    print(output[len(prompts[0]):].strip())
