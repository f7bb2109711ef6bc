"""Speculative decoding: n-gram prompt-lookup and draft-model drafting.

Beyond-reference extension (the reference decodes one token per forward).
Decode is HBM-bound, so verifying k drafted tokens in one forward costs
almost the same as one token — accepted drafts are nearly free throughput.
Output distribution is unchanged (exact-match acceptance).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from common import build_from_args

from exllama_tpu.speculative import (
    DraftModelProposer,
    NgramProposer,
    SpeculativeGenerator,
)


def main():
    args, cfg, model, tokenizer, cache = build_from_args(
        "Speculative decoding example"
    )

    # Prompt-lookup drafting: no second model; wins on repetitive text.
    gen = SpeculativeGenerator(
        model, tokenizer, cache, NgramProposer(max_ngram=3, max_draft=8)
    )
    gen.settings.top_k = 1  # greedy (identical to plain greedy decoding)
    text = gen.generate_simple(
        "def fibonacci(n):\n    ",
        max_new_tokens=args.max_new or 128
    )
    print(text)
    print(
        f"-- {gen.stats['tokens']} tokens in {gen.stats['forwards']} "
        f"forwards, acceptance {gen.acceptance_rate:.0%}"
    )

    # Draft-model drafting: point a second, smaller GPTQ checkpoint at the
    # same tokenizer family and pass DraftModelProposer(draft_model).
    # draft = ExLlama(draft_config)
    # gen = SpeculativeGenerator(model, tokenizer, cache,
    #                            DraftModelProposer(draft, max_draft=8))


if __name__ == "__main__":
    main()
