"""Generation with a LoRA adapter on the quantized base
(reference example_lora.py)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.common import build_from_args
from exllama_tpu.generator import ExLlamaGenerator
from exllama_tpu.lora import ExLlamaLora


def extra(parser):
    parser.add_argument("--lora_dir", required=True,
                        help="dir with adapter_config.json + adapter_model.safetensors")


args, cfg, model, tokenizer, cache = build_from_args("LoRA", extra_args=extra)

lora = ExLlamaLora(
    model,
    os.path.join(args.lora_dir, "adapter_config.json"),
    os.path.join(args.lora_dir, "adapter_model.safetensors"),
)

generator = ExLlamaGenerator(model, tokenizer, cache)
generator.lora = lora
print(generator.generate_simple(
    "### Instruction:\nList five ways to improve attention.\n### Response:",
    max_new_tokens=args.max_new or 200,
))
