"""The Llama-family model: parameters, forward pass, decode step.

TPU-native re-design of the reference's ``ExLlama`` (model.py:719-1092) and
its module classes (ExLlamaAttention/MLP/RMSNorm/DecoderLayer). Key design
translations:

  * The reference walks per-layer Python modules, hopping devices
    (model.py:1053-1058). Here all layers live in one pytree (a tuple of
    per-layer params) and the forward pass is one jitted program with the
    layer loop unrolled — weights sharded declaratively over the mesh
    instead of placed per-layer. Unrolled rather than lax.scan on purpose:
    scan over stacked [L, ...] params/KV forces XLA to materialize each
    layer's weight and cache slices as copies around the Pallas calls
    (measured ~3x the whole decode budget at 7B on v5e); per-layer arrays
    feed each kernel its operand directly.
  * The reference's fused CUDA megakernels (q4_attn/q4_mlp) exist to cut
    kernel-launch overhead; under XLA everything is one jitted graph, and
    the Pallas q4 matmul plus XLA fusion of the elementwise glue gives the
    same effect without hand-scheduling.
  * The KV cache threads through functionally and is donated between steps
    so XLA updates the buffers in place.
  * Chunked prefill mirrors the reference exactly: chunks bounded by
    ``max_input_len`` and by solving (past+cs)*cs <= max_attention_size
    (model.py:948-963).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from exllama_tpu.cache import ExLlamaCache, KVCacheState
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.gptq import QuantTensor, padded_n
from exllama_tpu.ops.attention import attend, update_kv_cache
from exllama_tpu.ops.norms import rms_norm
from exllama_tpu.ops.quant import q4_matmul
from exllama_tpu.ops.rope import apply_rope_sliced, rope_tables, slice_tables

# Decode steps whose attention window is at most this many tokens resolve
# attn_impl="auto" to XLA attention instead of the flash kernel: the KV
# stream is tiny there and the flash kernel's (plus the flash-gated layer
# megakernels') fixed cost dominates — measured layers-only at B=1
# (scripts/ab_best2.py, 2026-08-21):
#   attend  256: fused-flash 6.58 ms vs xla+mlpfuse 5.57 ms (xla wins)
#   attend 1024: fused-flash 6.66 ms vs xla-separate 6.61 ms (tie; the
#                mlp_fuse gain of ~0.19 ms is attend-independent, so the
#                shipped xla+mlpfuse combo wins)
#   attend 2048: fused-flash 7.05 ms vs xla+mlpfuse 7.28 ms (flash wins —
#                worst-ctx keeps the flash megakernel path)
# Module-level so tests can shrink it.
SHORT_ATTEND_XLA_LEN = 1024
# Batched decode (B>1) demotes over a larger window: the flash decode
# kernel's fixed cost scales with the batched grid, so XLA attention wins
# well past the B=1 threshold — measured layers-only at B=8 attend 1024:
# fused-flash 15.76 ms vs separate-XLA 13.80 ms (scripts/ab_b8.py
# AB_B8_ATTN, 2026-08-21). Applied as b·attend ≤ this product so the
# boundary tracks the measured point without extrapolating to B·attend
# regimes no probe has covered.
SHORT_ATTEND_XLA_BATCH_PRODUCT = 8 * 1024


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LayerParams:
    """One decoder layer (each layer owns its arrays — see module doc)."""

    input_norm: jax.Array   # [hidden]
    post_norm: jax.Array    # [hidden]
    q: Optional[QuantTensor]
    k: Optional[QuantTensor]
    v: Optional[QuantTensor]
    o: QuantTensor
    gate: Optional[QuantTensor]
    up: Optional[QuantTensor]
    down: QuantTensor
    # Load-time fused projections (formats/gptq.concat_quant_tensors): when
    # set, the corresponding unfused fields above are None. The TPU analogue
    # of the reference's q4_attn/q4_mlp launch fusion (q4_attn.cu:74-204).
    qkv: Optional[QuantTensor] = None
    gateup: Optional[QuantTensor] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ModelParams:
    embed: jax.Array        # [vocab, hidden] bf16
    layers: tuple           # tuple[LayerParams] — one entry per layer
    norm: jax.Array         # [hidden]
    lm_head: jax.Array      # [hidden, vocab] bf16
    rope_sin: jax.Array     # [max_seq_len, head_dim] f32
    rope_cos: jax.Array


def stack_layers(layers: list[LayerParams]) -> tuple:
    """Pack per-layer params for ModelParams.layers (a plain tuple)."""
    return tuple(layers)


def fuse_layer_projections(lp: LayerParams) -> LayerParams:
    """Fuse q/k/v → qkv and gate/up → gateup (single kernel calls each).

    No-op (returns ``lp`` unchanged) for act-order layers, whose per-tensor
    activation permutations prevent weight concatenation.
    """
    from exllama_tpu.formats.gptq import concat_quant_tensors

    if lp.qkv is not None or any(
        t.x_map is not None for t in (lp.q, lp.k, lp.v, lp.gate, lp.up)
    ):
        return lp
    return dataclasses.replace(
        lp,
        q=None, k=None, v=None, gate=None, up=None,
        qkv=concat_quant_tensors([lp.q, lp.k, lp.v]),
        gateup=concat_quant_tensors([lp.gate, lp.up]),
    )


# ---------------------------------------------------------------------------
# Forward pass (pure function; static config captured via closure/partial)
# ---------------------------------------------------------------------------

def _decoder_layer(
    h: jax.Array,               # [B, T, hidden]
    lp: LayerParams,            # single layer
    kc: jax.Array,              # [B, Hkv, S, D] (bf16, or int8 with scales)
    vc: jax.Array,
    ksc,                        # [B, Hkv, S] f32 or None
    vsc,
    *,
    cfg_heads: int,
    cfg_kv_heads: int,
    cfg_head_dim: int,
    eps: float,
    rope_sin: jax.Array,        # [1|B, T, 1, D] pre-sliced (slice_tables)
    rope_cos: jax.Array,
    past_len: jax.Array,
    attend_len: int,
    input_mask: Optional[jax.Array],
    matmul_impl: str,
    attn_impl: str = "auto",
    lora=None,
    defer_kv: bool = False,
    mlp_fuse: bool = True,
    attn_fuse: bool = True,
    qkv_fuse: bool = False,
    tp_axis: Optional[str] = None,
):
    b, t, hidden = h.shape

    def _psum(y):
        # Megatron row-parallel reduction: o/down produce partial sums of
        # their K-sharded contraction; one psum over the tp axis per block
        # (parallel/mesh.py module doc) restores the full activation.
        return jax.lax.psum(y, tp_axis) if tp_axis is not None else y

    def lora_ab(name):
        if lora is None:
            return None
        return getattr(lora, name, None)

    def proj(x, qt, name):
        return q4_matmul(x, qt, impl=matmul_impl, lora=lora_ab(name))

    def lora_add(out, x, name):
        # Low-rank add for slices of a fused projection (same math as the
        # fused-lora path inside q4_matmul; handles per-row adapters too).
        ab = lora_ab(name)
        if ab is None:
            return out
        from exllama_tpu.ops.quant import lora_delta

        return out + lora_delta(x, ab)

    # --- attention (reference ExLlamaAttention.forward, model.py:421-502)
    nq = cfg_heads * cfg_head_dim
    nkv = cfg_kv_heads * cfg_head_dim
    qkv_lora = any(lora_ab(n) is not None for n in ("q", "k", "v"))

    # Whole-layer megakernel: input-norm + qkv GEMV + rope + attention +
    # o-proj + MLP in ONE kernel (deferred-commit decode only). Fused
    # megakernels bake the residual adds in, which cannot straddle a TP
    # psum boundary — single-shard only.
    if defer_kv and qkv_fuse and attn_fuse and mlp_fuse \
            and tp_axis is None and attn_impl.startswith("flash"):
        from exllama_tpu.ops.attn_block import (
            attn_o_applicable,
            layer_fusion_budget_ok,
            layer_step,
            layer_step_applicable,
        )
        from exllama_tpu.ops.mlp import fused_mlp_applicable

        any_lora = lora is not None and any(
            lora_ab(n) is not None
            for n in ("q", "k", "v", "o", "gate", "up", "down")
        )
        if (
            layer_step_applicable(
                lp.qkv, lp.o, hidden, cfg_heads, cfg_head_dim,
                matmul_impl, any_lora,
            )
            and attn_o_applicable(
                lp.o, hidden, cfg_heads, cfg_head_dim, t, matmul_impl,
                deferred=True, has_lora=False, batch=b,
            )
            and fused_mlp_applicable(
                lp.gateup, lp.down, hidden, b * t, matmul_impl,
                has_lora=False,
            )
            and layer_fusion_budget_ok(
                lp.o, lp.gateup, lp.down, lp.qkv, hidden, cfg_heads,
                cfg_kv_heads, cfg_head_dim, attend_len, b,
                int8_kv=ksc is not None,
            )
        ):
            h, k_row, v_row = layer_step(
                h, lp.qkv, lp.input_norm, rope_sin, rope_cos, kc, vc,
                past_len, attend_len, lp.o, lp.post_norm, lp.gateup,
                lp.down, eps, cfg_heads, cfg_kv_heads, cfg_head_dim,
                input_mask=input_mask, k_scale=ksc, v_scale=vsc,
                impl=matmul_impl,
            )
            return h, kc, vc, ksc, vsc, k_row, v_row

    if lp.qkv is not None and not qkv_lora:
        # input norm rides along in the GEMV kernel prologue (decode) or
        # is applied inside q4_matmul (prefill/fallback paths)
        fused = q4_matmul(h, lp.qkv, impl=matmul_impl,
                          norm_w=lp.input_norm, norm_eps=eps)
        ok = padded_n(nq)
        ov = ok + padded_n(nkv)
        q = fused[..., :nq]
        k = fused[..., ok : ok + nkv]
        v = fused[..., ov : ov + nkv]
    elif lp.qkv is not None:
        a = rms_norm(h, lp.input_norm, eps)
        fused = q4_matmul(a, lp.qkv, impl=matmul_impl)
        ok = padded_n(nq)
        ov = ok + padded_n(nkv)
        q = lora_add(fused[..., :nq], a, "q")
        k = lora_add(fused[..., ok : ok + nkv], a, "k")
        v = lora_add(fused[..., ov : ov + nkv], a, "v")
    else:
        a = rms_norm(h, lp.input_norm, eps)
        q = proj(a, lp.q, "q")
        k = proj(a, lp.k, "k")
        v = proj(a, lp.v, "v")
    q = q.reshape(b, t, cfg_heads, cfg_head_dim)
    k = k.reshape(b, t, cfg_kv_heads, cfg_head_dim)
    v = v.reshape(b, t, cfg_kv_heads, cfg_head_dim)
    q = apply_rope_sliced(q, rope_sin, rope_cos)
    k = apply_rope_sliced(k, rope_sin, rope_cos)
    # Padded-head-dim cache (tuning.pad_head_dim): odd head dims (e.g.
    # OpenLlama-3B's 100) ride the flash kernel by zero-padding q/k/v to
    # the cache's lane-legal width — pad columns contribute exactly 0 to
    # the scores and produce 0 output columns (sliced off below).
    d_pad = kc.shape[-1] - cfg_head_dim
    if d_pad > 0:
        pad4 = ((0, 0), (0, 0), (0, 0), (0, d_pad))
        # attend() scales scores by 1/sqrt(padded_d); pre-scale q so the
        # effective softmax scale stays 1/sqrt(true head_dim)
        f = (kc.shape[-1] / cfg_head_dim) ** 0.5
        q = (q.astype(jnp.float32) * f).astype(q.dtype)
        q = jnp.pad(q, pad4)
        k = jnp.pad(k, pad4)
        v = jnp.pad(v, pad4)
    k_row = v_row = None
    if defer_kv:
        # deferred commit (T=1): attend folds the in-flight row in; the
        # caller batches all layers' cache writes into one kernel call
        # (ops/attention.commit_kv_cache)
        k_row, v_row = k, v
        from exllama_tpu.ops.attn_block import (
            attn_block_o, attn_o_applicable,
        )

        if attn_fuse and tp_axis is None and attn_impl.startswith("flash") \
                and attn_o_applicable(
            lp.o, hidden, cfg_heads, cfg_head_dim, t, matmul_impl,
            deferred=True, has_lora=lora_ab("o") is not None, batch=b,
        ):
            from exllama_tpu.ops.mlp import fused_mlp_applicable

            from exllama_tpu.ops.attn_block import layer_fusion_budget_ok

            if mlp_fuse and fused_mlp_applicable(
                lp.gateup, lp.down, hidden, b * t, matmul_impl,
                has_lora=any(
                    lora_ab(n) is not None for n in ("gate", "up", "down")
                ),
            ) and layer_fusion_budget_ok(
                lp.o, lp.gateup, lp.down, None, hidden, cfg_heads,
                cfg_kv_heads, cfg_head_dim, attend_len, b,
                int8_kv=ksc is not None,
            ):
                # the whole layer tail (attention → o-proj → residual →
                # post-norm → MLP → residual) in ONE kernel
                from exllama_tpu.ops.attn_block import layer_tail

                h = layer_tail(
                    h, q, kc, vc, past_len, attend_len, lp.o,
                    lp.post_norm, lp.gateup, lp.down, eps, (k, v),
                    input_mask=input_mask, k_scale=ksc, v_scale=vsc,
                    impl=matmul_impl,
                )
                return h, kc, vc, ksc, vsc, k_row, v_row
            # attention + o-projection + residual in ONE kernel
            h = attn_block_o(
                h, q, kc, vc, past_len, attend_len, lp.o, (k, v),
                input_mask=input_mask, k_scale=ksc, v_scale=vsc,
                impl=matmul_impl,
            )
            attn = None
        else:
            attn = attend(q, kc, vc, past_len, attend_len, input_mask,
                          impl=attn_impl, k_scale=ksc, v_scale=vsc,
                          new_kv=(k, v))
    else:
        kc, vc, ksc, vsc = update_kv_cache(kc, vc, k, v, past_len, ksc, vsc)
        attn = attend(q, kc, vc, past_len, attend_len, input_mask,
                      impl=attn_impl, k_scale=ksc, v_scale=vsc)
    if attn is not None:
        if d_pad > 0:
            attn = attn[..., :cfg_head_dim]
        attn2 = attn.reshape(b, t, cfg_heads * cfg_head_dim)
        if tp_axis is not None and lp.o.x_map is not None:
            # act-order o under TP: the K permutation crosses head-shard
            # boundaries, so gather the full attention output (one tiled
            # all-gather of [B, T, H*D] over tp) and select this shard's
            # K rows by its x_map slice (global indices; sliced by the
            # P("tp") sharding in parallel/mesh._quant_specs).
            attn_full = jax.lax.all_gather(
                attn2, tp_axis, axis=-1, tiled=True
            )
            x_o = jnp.take(attn_full, lp.o.x_map, axis=-1)
            o_qt = dataclasses.replace(lp.o, x_map=None)
            h = h + _psum(q4_matmul(x_o, o_qt, impl=matmul_impl))
        else:
            h = h + _psum(proj(attn2, lp.o, "o"))

    # --- MLP (reference ExLlamaMLP.forward, model.py:266-273)
    from exllama_tpu.ops.mlp import fused_mlp_applicable, q4_mlp

    if mlp_fuse and tp_axis is None and fused_mlp_applicable(
        lp.gateup, lp.down, hidden, b * t, matmul_impl,
        has_lora=any(
            lora_ab(n) is not None for n in ("gate", "up", "down")
        ),
    ):
        # whole block (norm→gateup→silu·mul→down→residual) in ONE kernel
        h = q4_mlp(h, lp.post_norm, lp.gateup, lp.down, eps,
                   impl=matmul_impl)
        return h, kc, vc, ksc, vsc, k_row, v_row
    a = rms_norm(h, lp.post_norm, eps)
    mlp_lora = any(
        lora_ab(n) is not None for n in ("gate", "up", "down")
    )
    if lp.gateup is not None and not mlp_lora \
            and os.environ.get("EXL_GLU_FUSE", "0") == "1":
        # MEASURED NEGATIVE at 7B prefill (round 4): the down kernel's
        # [bm, 2*inter] input re-streams per N block, which costs more HBM
        # than the silu·mul materialization it avoids (exact prompt 9,244
        # -> 8,386). Kept opt-in for wider-N/narrower-inter shapes.
        ni = lp.down.in_features
        fused = q4_matmul(a, lp.gateup, impl=matmul_impl)
        h = h + _psum(q4_matmul(
            fused, lp.down, impl=matmul_impl, glu=(ni, padded_n(ni)),
        ))
        return h, kc, vc, ksc, vsc, k_row, v_row
    if lp.gateup is not None:
        ni = lp.down.in_features
        fused = q4_matmul(a, lp.gateup, impl=matmul_impl)
        ou = padded_n(ni)
        g = lora_add(fused[..., :ni], a, "gate")
        u = lora_add(fused[..., ou : ou + ni], a, "up")
    else:
        g = proj(a, lp.gate, "gate")
        u = proj(a, lp.up, "up")
    h = h + _psum(
        proj(jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u,
             lp.down, "down")
    )
    return h, kc, vc, ksc, vsc, k_row, v_row


def _localize_layer_tp(lp: LayerParams, tp: int) -> LayerParams:
    """Per-shard view of a retiled layer inside shard_map: array leaves are
    already local shards; rewrite the static metadata to match
    (formats/gptq.localize_for_tp)."""
    from exllama_tpu.formats.gptq import localize_for_tp

    def loc(qt, mode):
        return None if qt is None else localize_for_tp(qt, mode)

    return dataclasses.replace(
        lp,
        q=loc(lp.q, "out"),
        k=loc(lp.k, "out"),
        v=loc(lp.v, "out"),
        o=loc(lp.o, "in"),
        gate=loc(lp.gate, "out"),
        up=loc(lp.up, "out"),
        down=loc(lp.down, "in"),
        qkv=loc(lp.qkv, "out"),
        gateup=loc(lp.gateup, "out"),
    )


def _forward_impl(
    params: ModelParams,
    kv: KVCacheState,
    tokens: jax.Array,           # [B, T] int32
    past_len: jax.Array,         # scalar int32
    input_mask: Optional[jax.Array],  # [B, S_max] bool or None
    lora,                        # stacked LoRA pytree or None
    *,
    attend_len: int,
    last_token_only: bool,
    preprocess_only: bool,
    heads: int,
    kv_heads: int,
    head_dim: int,
    eps: float,
    matmul_impl: str,
    attn_impl: str = "auto",
    head_mode: str = "logits",
    mlp_fuse: bool = True,
    attn_fuse: bool = True,
    qkv_fuse: bool = False,
    commit_impl: str = "auto",
    tp: int = 1,
    tp_axis: Optional[str] = None,
):
    """One forward chunk over all layers. Returns (logits|None, new KV).

    Analogue of reference ``ExLlama._forward`` (model.py:989-1082):
    embedding → layer loop → final norm → lm_head, fp32 logits; with
    ``preprocess_only`` skipping the head (prefill) and ``last_token_only``
    slicing before the head (decode/prefill-final). The layer loop is
    unrolled over the per-layer params tuple (see module doc).

    Under ``tp_axis`` (running per-shard inside shard_map,
    ``forward_chunk(mesh=...)``): heads/kv-heads and the quantized tensors'
    metadata become per-shard local views, the fused residual megakernels
    stay off (their in-kernel residual adds cannot straddle the psum
    boundaries), and o/down psum their row-parallel partials.
    """
    b, t = tokens.shape
    if tp_axis is not None and tp > 1:
        assert heads % tp == 0 and kv_heads % tp == 0, (heads, kv_heads, tp)
        heads //= tp
        kv_heads //= tp
        params = dataclasses.replace(
            params,
            layers=tuple(
                _localize_layer_tp(lp, tp) for lp in params.layers
            ),
        )
        # in-kernel-residual megakernels are incompatible with the psum
        # boundary (see _decoder_layer); the GEMV/prefill kernels, fused
        # qkv/gateup layouts and norm prologues all run per-shard.
        mlp_fuse = False
        attn_fuse = False
    if attn_impl == "auto":
        # Resolve here (trace time) so the fused-layer gates below see the
        # concrete impl — callers that don't thread model._attn_impl()
        # (engine, beam, speculative) still get the megakernel path.
        #
        # Short-attend decode steps take XLA attention instead: the flash
        # kernel's (and, transitively, the fused layer megakernels') fixed
        # cost dominates its KV-stream advantage until the window is large
        # — see the SHORT_ATTEND_XLA_* tables above for the measured
        # crossovers (B=1 crossover ~1024–2048; B>1 scales with the
        # batched grid). Worst-ctx (B=1, attend 2048) keeps flash+fusion.
        # "flash"/"xla" pin the impl explicitly.
        from exllama_tpu.ops.attention import flash_supported_head_dim

        demote = t == 1 and (
            attend_len <= SHORT_ATTEND_XLA_LEN
            or (b > 1 and b * attend_len <= SHORT_ATTEND_XLA_BATCH_PRODUCT)
        )
        attn_impl = (
            "flash"
            if jax.default_backend() == "tpu"
            and flash_supported_head_dim(head_dim)
            and not demote
            else "xla"
        )
    h = jnp.take(params.embed, tokens, axis=0)  # [B, T, hidden]
    # past_len may be scalar or [B] (per-slot cursors, continuous batching);
    # rope tables are sliced once per chunk, not per layer
    sin_t, cos_t = slice_tables(params.rope_sin, params.rope_cos, past_len, t)

    layer_fn = functools.partial(
        _decoder_layer,
        cfg_heads=heads,
        cfg_kv_heads=kv_heads,
        cfg_head_dim=head_dim,
        eps=eps,
        rope_sin=sin_t,
        rope_cos=cos_t,
        past_len=past_len,
        attend_len=attend_len,
        input_mask=input_mask,
        matmul_impl=matmul_impl,
        attn_impl=attn_impl,
        mlp_fuse=mlp_fuse,
        attn_fuse=attn_fuse,
        qkv_fuse=qkv_fuse,
        tp_axis=tp_axis if tp > 1 else None,
    )

    quantized_kv = kv.k_scale is not None
    # Deferred commit for decode steps (T=1): layers attend over the cache
    # plus their in-flight row; all layers' cache writes happen in ONE
    # batched kernel call at the end instead of 2·L update-slice ops.
    defer = t == 1
    k_new, v_new, ks_new, vs_new = [], [], [], []
    k_rows, v_rows = [], []
    for li, lp in enumerate(params.layers):
        lw = None if lora is None else lora[li]
        h, kc, vc, ksc, vsc, k_row, v_row = layer_fn(
            h, lp, kv.k[li], kv.v[li],
            kv.k_scale[li] if quantized_kv else None,
            kv.v_scale[li] if quantized_kv else None,
            lora=lw,
            defer_kv=defer,
        )
        if defer:
            k_rows.append(k_row)
            v_rows.append(v_row)
        else:
            k_new.append(kc)
            v_new.append(vc)
            ks_new.append(ksc)
            vs_new.append(vsc)
    if defer:
        from exllama_tpu.ops.attention import commit_kv_cache

        ks, vs, kss, vss = commit_kv_cache(
            kv.k, kv.v,
            jnp.stack(k_rows), jnp.stack(v_rows), past_len,
            kv.k_scale, kv.v_scale,
            impl=commit_impl,
            interpret=matmul_impl.endswith("_interpret"),
        )
        new_kv = KVCacheState(k=ks, v=vs, k_scale=kss, v_scale=vss)
    else:
        new_kv = KVCacheState(
            k=tuple(k_new),
            v=tuple(v_new),
            k_scale=tuple(ks_new) if quantized_kv else None,
            v_scale=tuple(vs_new) if quantized_kv else None,
        )

    if preprocess_only:
        return None, new_kv

    if last_token_only:
        h = h[:, -1:, :]
    if head_mode == "argmax" and not isinstance(params.lm_head, QuantTensor):
        # Greedy decode head: rms_norm + lm_head GEMV + argmax fused into
        # one kernel (ops/dense.head_argmax) — nothing downstream needs the
        # [B, V] fp32 logits, so skip materializing them entirely.
        from exllama_tpu.ops.dense import head_argmax

        tok = head_argmax(
            h, params.norm, params.lm_head, eps,
            impl=(matmul_impl if matmul_impl.startswith("pallas")
                  else "xla"),
        )
        return tok, new_kv
    h = rms_norm(h, params.norm, eps)
    if head_mode == "argmax":
        logits = q4_matmul(h, params.lm_head, impl=matmul_impl)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_kv
    if isinstance(params.lm_head, QuantTensor):
        logits = q4_matmul(h, params.lm_head, impl=matmul_impl).astype(
            jnp.float32
        )
    else:
        from exllama_tpu.ops.dense import dense_matmul

        logits = dense_matmul(
            h, params.lm_head, out_dtype=jnp.float32,
            impl=(
                matmul_impl if matmul_impl.startswith("pallas") else "xla"
            ),
        )
    return logits, new_kv


def _kv_state_specs(kv: KVCacheState, dp_axis):
    """KVCacheState-shaped pytree of PartitionSpecs for shard_map.
    ``dp_axis`` is "dp" for a batch-sharded cache or None for a
    batch-replicated one (e.g. the engine's B=1 prefill scratch)."""
    from jax.sharding import PartitionSpec as P

    sh4 = P(dp_axis, "tp", None, None)
    sh3 = P(dp_axis, "tp", None)
    return KVCacheState(
        k=tuple(sh4 for _ in kv.k),
        v=tuple(sh4 for _ in kv.v),
        k_scale=None if kv.k_scale is None
        else tuple(sh3 for _ in kv.k_scale),
        v_scale=None if kv.v_scale is None
        else tuple(sh3 for _ in kv.v_scale),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "attend_len",
        "last_token_only",
        "preprocess_only",
        "heads",
        "kv_heads",
        "head_dim",
        "eps",
        "matmul_impl",
        "attn_impl",
        "head_mode",
        "mlp_fuse",
        "attn_fuse",
        "qkv_fuse",
        "commit_impl",
        "mesh",
    ),
    donate_argnames=("kv",),
)
def forward_chunk(
    params: ModelParams,
    kv: KVCacheState,
    tokens: jax.Array,           # [B, T] int32
    past_len: jax.Array,         # scalar or [B] int32
    input_mask: Optional[jax.Array],  # [B, S_max] bool or None
    lora,                        # stacked LoRA pytree or None
    *,
    attend_len: int,
    last_token_only: bool,
    preprocess_only: bool,
    heads: int,
    kv_heads: int,
    head_dim: int,
    eps: float,
    matmul_impl: str,
    attn_impl: str = "auto",
    head_mode: str = "logits",
    mlp_fuse: bool = True,
    attn_fuse: bool = True,
    qkv_fuse: bool = False,
    commit_impl: str = "auto",
    mesh=None,
):
    """Public forward entry (see _forward_impl for the compute semantics).

    Single-device / host-replicated: runs the impl directly. With ``mesh``
    (a dp×tp jax.sharding.Mesh, params placed by parallel/mesh.shard_params):
    the WHOLE forward runs inside shard_map — every Pallas kernel executes
    on its local shard (local heads for attention, retiled column/row
    segments for the q4 matmuls) with explicit Megatron psums, replacing the
    reference's sequential per-layer device walk (model.py:1053-1058) with
    true tensor parallelism over ICI.
    """
    kw = dict(
        attend_len=attend_len,
        last_token_only=last_token_only,
        preprocess_only=preprocess_only,
        heads=heads,
        kv_heads=kv_heads,
        head_dim=head_dim,
        eps=eps,
        matmul_impl=matmul_impl,
        attn_impl=attn_impl,
        head_mode=head_mode,
        mlp_fuse=mlp_fuse,
        attn_fuse=attn_fuse,
        qkv_fuse=qkv_fuse,
        commit_impl=commit_impl,
    )
    if mesh is None:
        return _forward_impl(
            params, kv, tokens, past_len, input_mask, lora, **kw
        )

    from jax.sharding import PartitionSpec as P

    from exllama_tpu.parallel.mesh import mesh_axis_sizes, param_pspecs

    dp, tp = mesh_axis_sizes(mesh)
    b = tokens.shape[0]
    # Batch shards over dp when it divides evenly; otherwise (e.g. the
    # engine's B=1 prefill into its batch-replicated scratch cache) the dp
    # replicas compute the same batch redundantly — correct either way,
    # shard_map reshards inputs to match the specs.
    dpb = "dp" if (dp > 1 and b % dp == 0) else None
    if lora is not None:
        assert tp == 1, (
            "LoRA is not supported on the tensor-parallel shard_map path yet"
        )
        # per-slot stacked adapters carry a leading batch axis (dp-sharded);
        # whole-batch adapters replicate
        lora_specs = jax.tree.map(
            lambda x: P(dpb, *([None] * (x.ndim - 1)))
            if x.ndim == 3 else P(*([None] * x.ndim)),
            lora,
        )
    else:
        lora_specs = None

    pspecs = param_pspecs(params, tp)
    kv_specs = _kv_state_specs(kv, dpb)
    tok_spec = P(dpb, None)
    past_spec = P() if jnp.ndim(past_len) == 0 else P(dpb)
    mask_spec = None if input_mask is None else P(dpb, None)
    if preprocess_only:
        out_spec = None
    elif head_mode == "argmax":
        out_spec = P(dpb, None)
    else:
        out_spec = P(dpb, None, None)

    body = functools.partial(
        _forward_impl, **kw, tp=tp, tp_axis="tp",
    )
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(pspecs, kv_specs, tok_spec, past_spec, mask_spec,
                  lora_specs),
        out_specs=(out_spec, kv_specs),
        check_vma=False,
    )(params, kv, tokens, past_len, input_mask, lora)


# ---------------------------------------------------------------------------
# ExLlama — host-side model object
# ---------------------------------------------------------------------------

_W8_FIELDS = ("q", "k", "v", "o", "gate", "up", "down", "qkv", "gateup")


def _attach_prefill_w8(params: ModelParams, config, tp: int = 1) -> ModelParams:
    """Attach resident int8 weight images for turbo prefill (see
    formats.gptq.with_w8). Gated on the configured HBM budget under
    ``prefill_w8="auto"``: the w8 image costs K*N_pad bytes per tensor
    (2x the packed 4-bit weights). Under tensor parallelism the budget is
    per chip, so the weight/KV bytes divide by ``tp`` (each shard holds and
    re-quantizes only its segment)."""
    from exllama_tpu.formats.gptq import QuantTensor, with_w8

    qts = []
    for lp in params.layers:
        for f in _W8_FIELDS:
            qt = getattr(lp, f)
            if isinstance(qt, QuantTensor):
                qts.append(qt)
    w8_budget = None       # None = attach everything (prefill_w8="on")
    if config.tuning.prefill_w8 == "auto":
        packed = sum(
            qt.qweight.nbytes + qt.scales.nbytes + qt.zscale.nbytes
            for qt in qts
        )
        # the configured KV cache still has to fit next to the w8 image
        # (ADVICE r4): batch-1 at max_seq_len — engines with many slots or
        # larger batches should lower prefill_w8_budget_gb accordingly
        kv_itemsize = {"bf16": 2, "int8": 1, "int4": 0.5}.get(
            config.tuning.kv_cache_dtype, 2
        )
        kv_bytes = int(
            2 * config.num_hidden_layers * config.max_seq_len
            * config.num_key_value_heads * config.head_dim * kv_itemsize
        )
        budget = config.tuning.prefill_w8_budget_gb * (1 << 30)
        # PARTIAL residency (round 5): above ~7B the full w8 image never
        # fits, which used to disable the turbo path entirely (VERDICT r4
        # missing #2) — instead spend whatever budget remains after the
        # packed weights + KV on as many per-tensor images as fit; every
        # resident byte converts its matmul from the in-kernel-requant rate
        # to the pure int8-MXU rate.
        # budget exhausted by weights+KV alone: no images, but the static
        # column scales (4 B/col) still attach below
        w8_budget = max(budget * max(tp, 1) - packed - kv_bytes, 0)

    from exllama_tpu.formats.gptq import with_w8_scale

    # Benefit-per-byte priority (measured, scripts/micro_prefill13 round 5):
    # the down-proj's in-kernel-requant rate is the weakest (its large-K
    # kernel gains ~14.5 µs/MB of image vs ~3 for qkv/gateup and ~0 for o),
    # so when only part of the model fits, spend the image budget on downs
    # first, then the MLP columns, then qkv; o gains nothing.
    prio = {"down": 0, "gateup": 1, "gate": 1, "up": 1,
            "qkv": 2, "q": 2, "k": 2, "v": 2, "o": 9}
    order = []
    for li, lp in enumerate(params.layers):
        for f in _W8_FIELDS:
            qt = getattr(lp, f)
            if isinstance(qt, QuantTensor):
                cost = qt.in_features * qt.padded_out_features + (
                    4 * qt.padded_out_features
                )
                order.append((prio[f], li, f, cost))
    order.sort(key=lambda t: (t[0], t[1]))

    spent = 0
    attach_image = set()
    for p, li, f, cost in order:
        if p >= 9:
            continue
        if w8_budget is not None and spent + cost > w8_budget:
            continue
        spent += cost
        attach_image.add((li, f))

    new_layers = []
    for li, lp in enumerate(params.layers):
        repl = {}
        for f in _W8_FIELDS:
            qt = getattr(lp, f)
            if not isinstance(qt, QuantTensor):
                continue
            if (li, f) in attach_image:
                repl[f] = with_w8(qt)
            else:
                # static column scales only (4 B/column): the in-kernel
                # requant path still skips its per-call dequant+reduce
                repl[f] = with_w8_scale(qt)
        new_layers.append(dataclasses.replace(lp, **repl) if repl else lp)
    return dataclasses.replace(params, layers=tuple(new_layers))


class ExLlama:
    """Host-side model wrapper: owns params + config, exposes ``forward``.

    API mirrors the reference's ExLlama (model.py:719-1092): construct from a
    config whose ``model_path`` points at a GPTQ safetensors checkpoint, then
    ``forward(input_ids, cache, last_id_only, preprocess_only, lora,
    input_mask)``.
    """

    def __init__(
        self,
        config: ExLlamaConfig,
        params: Optional[ModelParams] = None,
        mesh=None,
    ):
        self.config = config
        self.mesh = mesh
        if params is None:
            from exllama_tpu.formats.loader import load_model_params

            params = load_model_params(config, mesh=mesh)
        self.params = params
        if (
            self._matmul_impl() == "pallas_a8t"
            and config.tuning.prefill_w8 != "off"
            and jax.default_backend() == "tpu"
        ):
            tp = 1
            if mesh is not None:
                from exllama_tpu.parallel.mesh import mesh_axis_sizes

                tp = mesh_axis_sizes(mesh)[1]
            self.params = _attach_prefill_w8(self.params, config, tp=tp)
            if mesh is not None:
                # place the new w8 leaves per the declarative specs (the
                # jitted _build_w8 ran under GSPMD and left its own layout)
                from exllama_tpu.parallel.mesh import param_shardings

                self.params = jax.device_put(
                    self.params, param_shardings(self.params, mesh)
                )

    # -- helpers ------------------------------------------------------------

    def _attend_len(self, upto: int) -> int:
        bucket = self.config.tuning.attn_len_bucket
        if bucket <= 0:
            return self.config.max_seq_len
        return min(self.config.max_seq_len, -(-upto // bucket) * bucket)

    def _matmul_impl(self) -> str:
        impl = self.config.tuning.matmul_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        return impl

    def _attn_impl(self) -> str:
        impl = self.config.tuning.attn_impl
        if impl == "auto":
            # Mirror attend()'s own head-dim gate (ops/attention.py): the
            # flash kernel requires a lane-aligned head_dim; other dims
            # (e.g. OpenLlama-3B's 100) take the einsum path.
            from exllama_tpu.ops.attention import flash_supported_head_dim

            if jax.default_backend() == "tpu" and flash_supported_head_dim(
                self.config.head_dim
            ):
                # Stay "auto": forward_chunk resolves per call so its
                # short-attend demotion (flash→xla at attend_len ≤ 256,
                # where the flash kernel's fixed cost beats the tiny KV
                # stream — scripts/ab_best2.py) can see attend_len.
                return "auto"
            impl = (
                "flash"
                if jax.default_backend() == "tpu"
                and self.config.tuning.pad_head_dim
                else "xla"
            )
        return impl

    def num_params_bytes(self) -> int:
        return sum(
            x.nbytes for x in jax.tree.leaves(self.params)
        )

    # -- forward ------------------------------------------------------------

    def forward(
        self,
        input_ids,                    # [B, T] (np or jnp) int32
        cache: ExLlamaCache,
        last_id_only: bool = True,
        preprocess_only: bool = False,
        lora=None,
        input_mask=None,              # [B, S_max] bool, True = valid
    ):
        """Chunked forward (reference model.py:924-986). Mutates ``cache``
        (rebinds its device state + advances the cursor). Returns fp32
        logits [B, 1, vocab] / [B, T, vocab] or None if preprocess_only."""
        cfg = self.config
        tokens = jnp.asarray(input_ids, dtype=jnp.int32)
        b, q_len = tokens.shape

        remaining = q_len
        start = 0
        result = None
        while remaining > 0:
            chunk = min(remaining, cfg.max_input_len // max(b, 1), q_len)
            # bound (past+cs)*cs <= max_attention_size (model.py:956-963)
            past = cache.current_seq_len
            if (past + chunk) * chunk > cfg.max_attention_size:
                cs = int(
                    (
                        -past
                        + math.sqrt(past * past + 4.0 * cfg.max_attention_size)
                    )
                    / 2.0
                )
                chunk = max(min(chunk, cs), 1)
            is_last = start + chunk >= q_len
            logits, new_state = forward_chunk(
                self.params,
                cache.state,
                tokens[:, start : start + chunk],
                jnp.int32(past),
                input_mask,
                lora.stacked if lora is not None else None,
                attend_len=self._attend_len(past + chunk),
                last_token_only=last_id_only,
                preprocess_only=preprocess_only and is_last or not is_last,
                heads=cfg.num_attention_heads,
                kv_heads=cfg.num_key_value_heads,
                head_dim=cfg.head_dim,
                eps=cfg.rms_norm_eps,
                matmul_impl=self._matmul_impl(),
                attn_impl=self._attn_impl(),
                mlp_fuse=self.config.tuning.fuse_mlp,
                attn_fuse=self.config.tuning.fuse_attn,
                qkv_fuse=self.config.tuning.fuse_qkv,
                commit_impl=self.config.tuning.commit_impl,
                mesh=self.mesh,
            )
            cache.state = new_state
            cache.current_seq_len += chunk
            if is_last:
                result = logits
            start += chunk
            remaining -= chunk
        return result
