"""Fused MLP megakernel (ops/mlp.q4_mlp) vs the separate-kernel path.

The fused kernel claims operation-for-operation numerics parity with the
unfused decode path (same group math, same cast points) — asserted here at
tight tolerance on CPU interpret, plus the standard oracle cross-check and
an end-to-end forward_chunk equivalence (mlp_fuse on/off).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from exllama_tpu.formats import gptq
from exllama_tpu.ops import mlp as mlp_mod
from exllama_tpu.ops.mlp import fused_mlp_applicable, q4_mlp
from exllama_tpu.ops.norms import rms_norm
from exllama_tpu.ops.quant import q4_matmul

HIDDEN = 1024
INTER = 1152          # pads to 2048: exercises the gu column-pair offset


def make_qt(k, n, gs, seed):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.1
    t = gptq.quantize_matrix(w, gs, act_order=False, rng=rng)
    return gptq.load_quant_tensor(
        t["qweight"], t["qzeros"], t["scales"], t.get("g_idx")
    )


def make_mlp(gs, seed=3):
    gate = make_qt(HIDDEN, INTER, gs, seed)
    up = make_qt(HIDDEN, INTER, gs, seed + 1)
    down = make_qt(INTER, HIDDEN, gs, seed + 2)
    gateup = gptq.concat_quant_tensors([gate, up])
    return gateup, down


def unfused_reference(h, nw, gateup, down, eps, impl):
    """The exact separate-kernel MLP path from models/llama._decoder_layer."""
    a = rms_norm(h, nw, eps)
    ni = down.in_features
    fused = q4_matmul(a, gateup, impl=impl)
    ou = gptq.padded_n(ni)
    g = fused[..., :ni]
    u = fused[..., ou : ou + ni]
    mid = jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u
    return h + q4_matmul(mid, down, impl=impl)


import jax  # noqa: E402  (after use in docstring-level helpers)


@pytest.mark.parametrize("gs", [32, 128])
@pytest.mark.parametrize("m", [1, 5])
def test_fused_matches_unfused_pallas(gs, m):
    gateup, down = make_mlp(gs)
    rng = np.random.default_rng(11)
    h = jnp.asarray(
        (rng.normal(size=(1, m, HIDDEN)) * 0.5), jnp.bfloat16
    )
    nw = jnp.asarray(rng.normal(size=(HIDDEN,)) * 0.2 + 1.0, jnp.bfloat16)
    assert fused_mlp_applicable(
        gateup, down, HIDDEN, m, "pallas_interpret", has_lora=False
    )
    got = q4_mlp(h, nw, gateup, down, 1e-6, impl="pallas_interpret")
    ref = unfused_reference(h, nw, gateup, down, 1e-6, "pallas_interpret")
    assert got.shape == ref.shape == (1, m, HIDDEN)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=2e-2,
    )


def test_fused_multi_step_phases(monkeypatch):
    """Force bn_a/bn_b below the whole width so both phases take several
    grid steps (clamped index maps + scratch reuse across steps)."""
    monkeypatch.setattr(mlp_mod, "_STEP_BYTES_MAX", HIDDEN * 1024 // 2)
    gateup, down = make_mlp(128, seed=9)
    rng = np.random.default_rng(4)
    h = jnp.asarray(rng.normal(size=(2, 1, HIDDEN)) * 0.5, jnp.bfloat16)
    nw = jnp.asarray(rng.normal(size=(HIDDEN,)) * 0.2 + 1.0, jnp.bfloat16)
    got = q4_mlp(h, nw, gateup, down, 1e-6, impl="pallas_interpret")
    ref = unfused_reference(h, nw, gateup, down, 1e-6, "pallas_interpret")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=2e-2,
    )


def test_fused_matches_oracle(gs=128):
    """Standard dual-path check against the XLA dequant oracle."""
    gateup, down = make_mlp(gs, seed=21)
    rng = np.random.default_rng(5)
    h = jnp.asarray(rng.normal(size=(1, 1, HIDDEN)) * 0.5, jnp.bfloat16)
    nw = jnp.asarray(rng.normal(size=(HIDDEN,)) * 0.2 + 1.0, jnp.bfloat16)
    got = q4_mlp(h, nw, gateup, down, 1e-6, impl="pallas_interpret")
    ref = np.asarray(
        unfused_reference(h, nw, gateup, down, 1e-6, "xla"), np.float32
    )
    # cross-impl bf16 accumulation noise scales with the output magnitude
    atol = 0.03 * float(np.abs(ref).max())
    np.testing.assert_allclose(
        np.asarray(got, np.float32), ref, rtol=0, atol=atol,
    )


def test_applicability_gates():
    gateup, down = make_mlp(128)
    ok = dict(hidden=HIDDEN, m=1, matmul_impl="pallas", has_lora=False)

    def app(**kw):
        a = {**ok, **kw}
        return fused_mlp_applicable(
            gateup, down, a["hidden"], a["m"], a["matmul_impl"],
            a["has_lora"],
        )

    assert app()
    assert not app(has_lora=True)            # MLP LoRA → separate path
    assert not app(matmul_impl="xla")        # oracle path stays pure XLA
    assert app(matmul_impl="pallas_a8")      # turbo rides the fused kernel
    assert not app(m=64)                     # prefill keeps deqw kernels
    assert not app(hidden=HIDDEN + 512)      # residual/padding mismatch
    assert not fused_mlp_applicable(
        None, down, HIDDEN, 1, "pallas", False
    )


def test_forward_chunk_fuse_flag_equivalence():
    """End-to-end: forward_chunk(mlp_fuse=True) == (mlp_fuse=False) on a
    model whose shapes qualify for the fused kernel."""
    from exllama_tpu.cache import ExLlamaCache
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.models.llama import ExLlama

    cfg = ExLlamaConfig()
    cfg.hidden_size = HIDDEN
    cfg.intermediate_size = INTER
    cfg.num_attention_heads = 8
    cfg.num_key_value_heads = 8
    cfg.head_dim = 128
    cfg.num_hidden_layers = 2
    cfg.vocab_size = 2048
    cfg.max_seq_len = 128
    cfg.tuning.matmul_impl = "pallas_interpret"
    cfg.tuning.attn_impl = "xla"
    params = make_synthetic_params(cfg, groupsize=128, act_order=False,
                                   seed=0)
    ids = (np.arange(10, dtype=np.int32)[None, :] * 13 + 7) % cfg.vocab_size

    outs = {}
    for fuse in (True, False):
        cfg.tuning.fuse_mlp = fuse
        model = ExLlama(cfg, params=params)
        cache = ExLlamaCache(model)
        logits = model.forward(ids, cache)
        # decode one token too (the fused kernel's target regime)
        step = model.forward(
            np.argmax(np.asarray(logits[:, -1]), -1)[None].astype(np.int32),
            cache,
        )
        outs[fuse] = (np.asarray(logits, np.float32),
                      np.asarray(step, np.float32))
    for i in range(2):
        ref = outs[False][i]
        atol = 0.02 * max(1.0, float(np.abs(ref).max()))
        np.testing.assert_allclose(outs[True][i], ref, atol=atol)


def test_fused_a8_matches_unfused_a8():
    """Turbo (W4A8) fused MLP == turbo separate-kernel path: both quantize
    activations identically per (row, group), so they agree tightly."""
    gateup, down = make_mlp(128, seed=51)
    rng = np.random.default_rng(52)
    h = jnp.asarray(rng.normal(size=(1, 1, HIDDEN)) * 0.5, jnp.bfloat16)
    nw = jnp.asarray(rng.normal(size=(HIDDEN,)) * 0.2 + 1.0, jnp.bfloat16)
    assert fused_mlp_applicable(
        gateup, down, HIDDEN, 1, "pallas_a8", has_lora=False
    )
    got = q4_mlp(h, nw, gateup, down, 1e-6, impl="pallas_a8_interpret")
    ref = unfused_reference(h, nw, gateup, down, 1e-6, "pallas_a8_interpret")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=2e-2,
    )


def test_non_aligned_hidden_mlp():
    """hidden % N_ALIGN != 0 (33B's 6656 shape class): fused MLP pads the
    residual to the npair width internally and matches the unfused path."""
    hidden, inter = 1536, 1152
    gate = make_qt(hidden, inter, 128, 81)
    up = make_qt(hidden, inter, 128, 82)
    down = make_qt(inter, hidden, 128, 83)
    gateup = gptq.concat_quant_tensors([gate, up])
    assert down.padded_out_features != hidden        # truly non-aligned
    assert fused_mlp_applicable(
        gateup, down, hidden, 1, "pallas_interpret", has_lora=False
    )
    rng = np.random.default_rng(84)
    h = jnp.asarray(rng.normal(size=(1, 1, hidden)) * 0.5, jnp.bfloat16)
    nw = jnp.asarray(rng.normal(size=(hidden,)) * 0.2 + 1.0, jnp.bfloat16)
    got = q4_mlp(h, nw, gateup, down, 1e-6, impl="pallas_interpret")
    ref = unfused_reference(h, nw, gateup, down, 1e-6, "pallas_interpret")
    assert got.shape == ref.shape == (1, 1, hidden)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=2e-2,
    )
