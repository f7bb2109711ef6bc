"""Shared example bootstrap: real checkpoint via -d, or --synthetic."""

import argparse

from exllama_tpu import model_init
from exllama_tpu.cache import ExLlamaCache


def build_from_args(description, batch_size=1, extra_args=None):
    parser = argparse.ArgumentParser(description=description)
    model_init.add_args(parser)
    parser.add_argument("--synthetic", type=str, default=None,
                        choices=["tiny", "7b"],
                        help="fabricated checkpoint instead of -d")
    parser.add_argument("--groupsize", type=int, default=128)
    parser.add_argument("--max_new", type=int, default=None,
                        help="override each example's generation length "
                             "(smoke tests pass a small value)")
    parser.add_argument("--act_order", action="store_true")
    if extra_args:
        extra_args(parser)
    args = parser.parse_args()

    if args.synthetic:
        # honor --cpu BEFORE first device use (model_init.build does this
        # on the real-checkpoint path; without it a --synthetic --cpu run
        # still initializes the TPU plugin — and hangs if the tunnel is
        # down)
        model_init.apply_platform(args)
        import benchmark as bench_mod

        cfg, model, tokenizer = bench_mod.build_synthetic(
            args.synthetic, args
        )
    else:
        cfg, model, tokenizer, _ = model_init.build(args)
    cache = ExLlamaCache(model, batch_size=batch_size)
    return args, cfg, model, tokenizer, cache
