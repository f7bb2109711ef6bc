"""Shared CLI argument vocabulary → ExLlamaConfig factory.

Analogue of the reference's model_init.py: one argparse vocabulary shared by
the benchmark, examples, and webui, mapped onto a config by make_config().
CUDA-specific flags (gpu_split, fused tuning thresholds, affinity) become
their TPU equivalents (mesh axes, kernel impl, attention bucketing).
"""

from __future__ import annotations

import argparse
import glob
import os

from exllama_tpu.config import ExLlamaConfig


def add_args(parser: argparse.ArgumentParser):
    parser.add_argument("-d", "--directory", type=str,
                        help="Path to model directory (config.json + tokenizer + .safetensors)")
    parser.add_argument("-c", "--config", type=str, help="Path to config.json")
    parser.add_argument("-m", "--model", type=str,
                        help="Path to model.safetensors (file or shard dir)")
    parser.add_argument("-t", "--tokenizer", type=str,
                        help="Path to tokenizer.model / tokenizer.json")

    parser.add_argument("-l", "--length", type=int, default=2048,
                        help="Maximum sequence length")
    parser.add_argument("-cpe", "--compress_pos_emb", type=float, default=1.0,
                        help="Linear RoPE position compression")
    parser.add_argument("-a", "--alpha", type=float, default=1.0,
                        help="NTK-alpha RoPE scaling")
    parser.add_argument("-theta", "--theta", type=float,
                        help="Override rope_theta directly")

    # TPU runtime (replaces the reference's -gs gpu_split and CUDA tuning)
    parser.add_argument("--tp", type=int, default=1,
                        help="Tensor-parallel degree over the device mesh")
    parser.add_argument("--dp", type=int, default=1,
                        help="Data/batch-parallel degree")
    parser.add_argument("--kv_int8", action="store_true",
                        help="int8 KV cache (halves the KV stream; "
                             "per-token-per-head scales)")
    parser.add_argument("--pad_head_dim", action="store_true",
                        help="pad odd head dims (e.g. 100) to a "
                             "flash-legal width in the KV cache so the "
                             "Pallas flash kernel applies (exact; costs "
                             "the pad fraction in KV memory)")
    parser.add_argument("--kv_int4", action="store_true",
                        help="int4 KV cache (quarter the KV stream, two "
                             "values per byte; coarser than int8 — "
                             "throughput-over-quality serving)")
    parser.add_argument("--turbo", action="store_true",
                        help="W4A8 decode matmuls + int8 KV cache "
                             "(fastest; small activation-quant noise)")
    parser.add_argument("--a8x2", action="store_true",
                        help="two-pass W4A8 decode matmuls, bf16 KV: "
                             "exact-grade (activation-quant error below "
                             "the reference's own fp16 accumulation) at "
                             "near-turbo speed")
    parser.add_argument("--turbo_prefill", action="store_true",
                        help="with --turbo: W4A8 prefill too (int8 MXU "
                             "dots, ~2x prefill rate; noisier — prefill "
                             "quant error compounds through the KV cache). "
                             "Keeps a resident int8 weight image in HBM "
                             "when it fits tuning.prefill_w8_budget_gb "
                             "(beats the reference's 4090 prompt rate at "
                             "7B); falls back to in-kernel requant")
    parser.add_argument("--no_fuse", action="store_true",
                        help="disable load-time qkv/gateup projection "
                             "fusion (required before TP sharding)")
    parser.add_argument("--fuse_layer", action="store_true",
                        help="whole-layer decode megakernel (one Pallas "
                             "kernel per layer: norm + qkv + rope + "
                             "attention + o + MLP; tuning.fuse_qkv)")
    parser.add_argument("--matmul_impl", type=str, default="auto",
                        choices=["auto", "pallas", "xla"],
                        help="q4 matmul implementation")
    parser.add_argument("--attn_bucket", type=int, default=256,
                        help="Decode attention length bucket (0 = full cache)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (skip TPU init)")
    parser.add_argument("--max_input_len", type=int, default=2048,
                        help="Chunked-prefill max rows per chunk")


def apply_platform(args):
    """Honor --cpu BEFORE first device use (the TPU plugin would otherwise
    initialize — or hang when the chip is unreachable)."""
    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")


def get_model_files(args):
    """Resolve -d into explicit paths (reference model_init.py:50-80)."""
    if args.directory is not None:
        args.config = os.path.join(args.directory, "config.json")
        st = glob.glob(os.path.join(args.directory, "*.safetensors"))
        if not st:
            raise FileNotFoundError(
                f"no .safetensors in {args.directory}"
            )
        args.model = args.directory if len(st) > 1 else st[0]
        for cand in ("tokenizer.model", "tokenizer.json"):
            p = os.path.join(args.directory, cand)
            if os.path.exists(p):
                args.tokenizer = p
                break
    missing = [k for k in ("config", "model")
               if getattr(args, k) is None]
    if missing:
        raise ValueError(f"missing arguments: {missing} (or use -d)")
    # tokenizer-less directories (fabricated rehearsal checkpoints,
    # utils/fabricate.py) fall back to the byte-level FakeTokenizer
    if args.tokenizer is None and args.directory is None:
        raise ValueError("missing arguments: ['tokenizer'] (or use -d)")


def make_config(args) -> ExLlamaConfig:
    config = ExLlamaConfig(args.config)
    config.model_path = args.model
    config.max_seq_len = args.length
    config.max_input_len = min(args.max_input_len, args.length)
    config.max_attention_size = args.length ** 2
    config.compress_pos_emb = args.compress_pos_emb
    if args.theta:
        config.rotary_embedding_base = args.theta
    if args.alpha != 1.0:
        config.alpha_value = args.alpha
        config.calculate_rotary_embedding_base()
    config.tp_size = args.tp
    config.dp_size = args.dp
    config.tuning.matmul_impl = args.matmul_impl
    config.tuning.attn_len_bucket = args.attn_bucket
    if getattr(args, "kv_int8", False) or getattr(args, "turbo", False):
        config.tuning.kv_cache_dtype = "int8"
    if getattr(args, "kv_int4", False):
        config.tuning.kv_cache_dtype = "int4"
    if getattr(args, "pad_head_dim", False):
        config.tuning.pad_head_dim = True
    if getattr(args, "turbo", False) and args.matmul_impl == "auto":
        config.tuning.matmul_impl = (
            "pallas_a8t" if getattr(args, "turbo_prefill", False)
            else "pallas_a8"
        )
    elif getattr(args, "a8x2", False) and args.matmul_impl == "auto":
        config.tuning.matmul_impl = "pallas_a8x2"
    elif getattr(args, "turbo_prefill", False):
        print(" !! --turbo_prefill ignored: requires --turbo with "
              "--matmul_impl auto (got "
              f"turbo={getattr(args, 'turbo', False)}, "
              f"matmul_impl={args.matmul_impl})")
    if getattr(args, "no_fuse", False) or args.tp > 1 or args.dp > 1:
        config.tuning.fuse_projections = False
    if getattr(args, "fuse_layer", False):
        config.tuning.fuse_qkv = True
    if getattr(args, "scale_f32", False):
        config.tuning.scale_dtype = "f32"
    return config


def print_options(args, extra: dict | None = None):
    print(f" -- Model config: {args.config}")
    print(f" -- Model: {args.model}")
    print(f" -- Sequence length: {args.length}")
    if args.compress_pos_emb != 1.0:
        print(f" -- RoPE compression: {args.compress_pos_emb}")
    if args.alpha != 1.0:
        print(f" -- NTK alpha: {args.alpha}")
    print(f" -- Mesh: tp={args.tp} dp={args.dp}, "
          f"matmul={args.matmul_impl}, attn_bucket={args.attn_bucket}")
    if extra:
        for k, v in extra.items():
            print(f" -- {k}: {v}")


def build(args):
    """Config + model + tokenizer + mesh from parsed args."""
    import jax

    from exllama_tpu.models.llama import ExLlama
    from exllama_tpu.parallel.mesh import make_mesh
    from exllama_tpu.tokenizer import ExLlamaTokenizer

    apply_platform(args)
    get_model_files(args)
    config = make_config(args)
    mesh = None
    if args.tp * args.dp > 1:
        mesh = make_mesh(tp=args.tp, dp=args.dp)
    model = ExLlama(config, mesh=mesh)
    if args.tokenizer is None:
        from exllama_tpu.tokenizer import FakeTokenizer

        print(" !! no tokenizer file found; using byte-level FakeTokenizer")
        tokenizer = FakeTokenizer()
    else:
        tokenizer = ExLlamaTokenizer(args.tokenizer)
    print(f" -- Groupsize (inferred): {config.groupsize}")
    print(f" -- Act-order (inferred): {config.act_order}")
    return config, model, tokenizer, mesh
