"""Model + runtime configuration.

TPU-native re-design of the reference's ``ExLlamaConfig`` (reference
model.py:39-127): parses a HuggingFace ``config.json`` for the Llama family,
holds the runtime knobs (sequence lengths, chunked-prefill bounds, RoPE
scaling) and the TPU tuning knobs that replace the reference's CUDA tuning
params (model.py:93-117).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Optional


@dataclasses.dataclass
class TuningParams:
    """Kernel/runtime tuning knobs (TPU analogue of reference tuning.h:4-16).

    The reference tunes CUDA thresholds (matmul_recons_thd, fused_mlp_thd,
    sdp_thd, stream juggling). On TPU the analogous levers are kernel choice
    and tile shapes.
    """

    # 'pallas' = fused dequant+matmul Pallas kernel; 'xla' = dequantize then
    # jnp.dot (the analogue of the reference's reconstruct+cuBLAS path,
    # exllama_ext.cpp:217-239); 'auto' picks per-backend.
    matmul_impl: str = "auto"
    attn_impl: str = "auto"       # "flash" (Pallas) | "xla" | "auto"
    # Quantize the lm_head to 4-bit at load (the reference keeps it fp16,
    # model.py:845-847 — leave False for strict output parity; True saves
    # ~0.35 ms/token at 7B for a small logit-precision cost).
    quantize_lm_head: bool = False
    # Rows at/above which the Pallas kernel switches from the GEMV tiling to
    # the MXU prefill tiling (both are the same kernel family; this only
    # changes block shapes).
    matmul_prefill_rows: int = 8
    # K-dimension tile for the q4 matmul kernel. Must be a multiple of the
    # quantization groupsize.
    q4_block_k: int = 512
    # KV cache storage: "bf16" (reference parity — its cache is fp16,
    # model.py:576-577), "int8" (per-token-per-head symmetric quantization
    # with f32 scales; halves the KV stream that dominates long-context
    # decode), or "int4" (two values packed per byte along head_dim —
    # quarter the stream; coarser: scale = rowmax/7, so reserve it for
    # throughput-over-quality serving). No reference counterpart.
    kv_cache_dtype: str = "bf16"
    # Fuse the q/k/v and gate/up projections into single kernel calls at
    # load time (weights concatenated along output columns). The TPU
    # analogue of the reference's q4_attn/q4_mlp launch fusion; disabled
    # automatically for act-order checkpoints and TP-sharded meshes.
    fuse_projections: bool = True
    # Fuse the whole decode MLP block (post-norm → gate/up GEMV → silu·mul →
    # down GEMV → residual) into one Pallas kernel (ops/mlp.q4_mlp) — the
    # TPU analogue of the reference's q4_mlp megakernel (q4_mlp.cu:100-199).
    # Applies only where fused_mlp_applicable() holds (npair, no act-order,
    # no MLP LoRA, decode-sized M); otherwise the
    # separate-kernel path runs regardless of this flag.
    fuse_mlp: bool = True
    # Fuse decode attention + o-projection + residual into one Pallas kernel
    # (ops/attn_block.attn_block_o) — the analogue of the reference's q4_attn
    # megakernel (q4_attn.cu:74-204). Applies on the deferred-commit decode
    # path when attn_o_applicable() holds; falls back otherwise.
    fuse_attn: bool = True
    # Fuse the ENTIRE decode layer into one Pallas kernel: input-norm +
    # fused-qkv GEMV + rope ride ahead of the attention/o-proj/MLP phases
    # (ops/attn_block.layer_step), removing the remaining per-layer launch
    # + glue between the qkv projection and the layer tail. Requires
    # fuse_projections, fuse_attn, and fuse_mlp paths to all be applicable.
    # Default off until validated on real TPU hardware (interpret-mode
    # numerics match the separate-kernel path exactly).
    fuse_qkv: bool = False
    # Allocate the KV cache with head_dim zero-padded to a flash-legal
    # width (64 or a multiple of 128): odd head dims (OpenLlama-3B's 100)
    # then use the Pallas flash kernel instead of the einsum fallback that
    # materializes the score matrix. Exact (pad columns contribute 0);
    # costs the pad fraction in KV memory. Incompatible with int4 KV.
    pad_head_dim: bool = False
    # Fold the act-order down-proj activation permutation into the gate/up
    # OUTPUT column order at load time: silu(gate)·up then emerges already
    # in the order down's group-sequential rows expect, so down loses its
    # x_map entirely (no in-kernel permute at decode, no XLA activation
    # gather at prefill — the largest act-order matmul, and the one whose K
    # exceeds the in-kernel permute cap at 33B+). Pure load-time weight
    # transform; numerics unchanged. Single-chip path only (TP keeps the
    # in-kernel permute). LoRA adapters on gate/up/down are re-permuted to
    # match at lora-load time.
    fold_act_order: bool = True
    # Deferred-commit KV write implementation for decode steps: "pallas"
    # (strip read-modify-write kernel, one call for all layers), "xla"
    # (per-layer dynamic-update-slices), or "auto" (kernel where its shape
    # gates hold, else xla).
    commit_impl: str = "auto"
    # Decode-time attention length bucketing: round the attended KV length up
    # to a multiple of this to bound recompilation while skipping most of the
    # unused cache (0 = always attend over the full max_seq_len).
    attn_len_bucket: int = 256
    # Storage dtype for per-group quantization scales/zero-scales: "bf16"
    # (default — halves the scale stream; up to ~2^-9 relative weight error
    # vs the reference's fp16 scales, see docs/PARITY.md) or "f32" for
    # strict-parity validation runs (scales kept at full precision).
    scale_dtype: str = "bf16"
    # Turbo prefill (matmul_impl="pallas_a8t") weight strategy: "auto"
    # keeps a load-time int8 re-quantization of every layer weight resident
    # in HBM when it fits the budget below (prefill then runs pure int8 MXU
    # dots with no in-kernel dequant — ~2x the bf16 matmul rate on v5e);
    # "off" always uses the in-kernel requant (deqw8) instead; "on" forces
    # residency regardless of budget. No effect on exact/decode paths.
    prefill_w8: str = "auto"
    # "auto" spends this HBM budget on (packed weights + configured KV
    # cache + as many per-tensor w8 images as fit, benefit-ordered —
    # models/llama._attach_prefill_w8); the ~2.5 GiB left over covers
    # activations + kernel workspace on a 16 GiB v5e. Engines running many
    # slots (larger KV than the batch-1 estimate) should lower this.
    prefill_w8_budget_gb: float = 13.5


class ExLlamaConfig:
    """Parses config.json and holds runtime settings.

    Mirrors the surface of reference model.py:39-127 so users of the
    reference can port call sites directly, but all fields drive a JAX/TPU
    runtime instead of CUDA tuning globals.
    """

    def __init__(self, model_config_path: Optional[str] = None):
        if model_config_path is not None:
            with open(model_config_path) as f:
                read_config = json.load(f)
        else:
            read_config = {}

        self.model_config_path = model_config_path

        # -- Model architecture (HF config.json fields; reference model.py:51-81)
        self.bos_token_id = read_config.get("bos_token_id", 1)
        self.eos_token_id = read_config.get("eos_token_id", 2)
        self.pad_token_id = read_config.get("pad_token_id", 0)
        self.hidden_size = read_config.get("hidden_size", 4096)
        self.initializer_range = read_config.get("initializer_range", 0.02)
        self.intermediate_size = read_config.get("intermediate_size", 11008)
        self.num_attention_heads = read_config.get("num_attention_heads", 32)
        self.num_hidden_layers = read_config.get("num_hidden_layers", 32)
        # GQA: absent for Llama-1 → same as n_heads (reference model.py:62-67)
        self.num_key_value_heads = read_config.get(
            "num_key_value_heads", self.num_attention_heads
        )
        self.vocab_size = read_config.get("vocab_size", 32000)
        self.rms_norm_eps = read_config.get("rms_norm_eps", 1e-6)
        self.rotary_embedding_base = read_config.get("rope_theta", 10000.0)
        self.head_dim = read_config.get(
            "head_dim", self.hidden_size // self.num_attention_heads
        )
        self.num_key_value_groups = (
            self.num_attention_heads // self.num_key_value_heads
        )

        # -- Checkpoint location (set by the user after construction, like the
        # reference's config.model_path)
        self.model_path: Optional[str] = None

        # -- Runtime knobs (reference model.py:83-91)
        self.max_seq_len = 2048          # KV cache capacity / context limit
        self.max_input_len = 2048        # chunked-prefill max rows per chunk
        self.max_attention_size = 2048 ** 2  # bound on q_len*k_len per chunk
        self.compress_pos_emb = 1.0      # linear RoPE position compression
        self.alpha_value = 1.0           # NTK RoPE alpha scaling
        self.batch_size = 1              # KV cache batch dimension

        # -- Quantization knobs (normally auto-detected from tensor shapes)
        self.groupsize: Optional[int] = None
        self.act_order: bool = False

        # -- TPU runtime
        self.tuning = TuningParams()
        self.dtype = "bfloat16"          # activation dtype
        self.tp_size = 1                 # tensor-parallel degree over mesh
        self.dp_size = 1                 # data/batch-parallel degree

    def calculate_rotary_embedding_base(self):
        """NTK alpha → effective theta (reference model.py:126-127)."""
        self.rotary_embedding_base = self.rotary_embedding_base * (
            self.alpha_value ** (self.head_dim / (self.head_dim - 2))
        )

    @property
    def rope_scale(self) -> float:
        return 1.0 / self.compress_pos_emb

    def model_files(self) -> list[str]:
        """All .safetensors shards under model_path (file or directory)."""
        assert self.model_path is not None, "config.model_path not set"
        if os.path.isdir(self.model_path):
            files = sorted(
                os.path.join(self.model_path, fn)
                for fn in os.listdir(self.model_path)
                if fn.endswith(".safetensors")
            )
        else:
            files = [self.model_path]
        if not files:
            raise FileNotFoundError(
                f"no .safetensors found under {self.model_path}"
            )
        return files
