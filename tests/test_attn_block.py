"""Fused attention block (ops/attn_block.attn_block_o) vs the separate
attend + o-projection + residual path, on the deferred-commit decode shapes
it targets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exllama_tpu.formats import gptq
from exllama_tpu.ops.attention import attend_xla
from exllama_tpu.ops.attn_block import attn_block_o, attn_o_applicable
from exllama_tpu.ops.quant import q4_matmul

HIDDEN = 1024
HEADS = 8
D = 128


def make_o(gs=128, seed=2):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(HIDDEN, HIDDEN)).astype(np.float32) * 0.08
    t = gptq.quantize_matrix(w, gs, act_order=False, rng=rng)
    return gptq.load_quant_tensor(
        t["qweight"], t["qzeros"], t["scales"], t.get("g_idx")
    )


def setup(b, hkv, s_max, past, seed=0, int8_kv=False, mask=None):
    rng = np.random.default_rng(seed)
    g = HEADS // hkv
    h = jnp.asarray(rng.normal(size=(b, 1, HIDDEN)) * 0.5, jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(b, 1, HEADS, D)) * 0.5, jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(b, hkv, s_max, D)) * 0.5, jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(b, hkv, s_max, D)) * 0.5, jnp.bfloat16)
    kn = jnp.asarray(rng.normal(size=(b, 1, hkv, D)) * 0.5, jnp.bfloat16)
    vn = jnp.asarray(rng.normal(size=(b, 1, hkv, D)) * 0.5, jnp.bfloat16)
    ks = vs = None
    if int8_kv:
        from exllama_tpu.ops.attention import quantize_kv_rows

        qk, sk = quantize_kv_rows(jnp.swapaxes(kc, 1, 2))
        qv, sv = quantize_kv_rows(jnp.swapaxes(vc, 1, 2))
        kc = jnp.swapaxes(qk, 1, 2)
        vc = jnp.swapaxes(qv, 1, 2)
        ks = jnp.swapaxes(sk, 1, 2)
        vs = jnp.swapaxes(sv, 1, 2)
    return h, q, kc, vc, kn, vn, ks, vs


def reference(h, q, kc, vc, kn, vn, past, attend_len, o, ks, vs, mask):
    attn = attend_xla(
        q, kc, vc, past, attend_len, input_mask=mask,
        k_scale=ks, v_scale=vs, new_kv=(kn, vn),
    )
    b = h.shape[0]
    out = q4_matmul(
        attn.reshape(b, 1, HEADS * D), o, impl="pallas_interpret"
    )
    return h + out


def check(got, ref, tol=0.03):
    ref = np.asarray(ref, np.float32)
    atol = tol * max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(got, np.float32), ref, atol=atol)


@pytest.mark.parametrize("hkv", [8, 2])     # MHA and GQA (g=4)
@pytest.mark.parametrize("past", [0, 5, 255])
def test_fused_matches_reference(hkv, past):
    o = make_o()
    h, q, kc, vc, kn, vn, ks, vs = setup(1, hkv, 256, past)
    p = jnp.int32(past)
    got = attn_block_o(
        h, q, kc, vc, p, 256, o, (kn, vn), impl="pallas_interpret"
    )
    ref = reference(h, q, kc, vc, kn, vn, p, 256, o, None, None, None)
    check(got, ref)


def test_per_slot_cursors_batch():
    o = make_o()
    b = 3
    h, q, kc, vc, kn, vn, ks, vs = setup(b, 8, 256, 0, seed=5)
    past = jnp.asarray([0, 7, 133], jnp.int32)
    got = attn_block_o(
        h, q, kc, vc, past, 256, o, (kn, vn), impl="pallas_interpret"
    )
    ref = reference(h, q, kc, vc, kn, vn, past, 256, o, None, None, None)
    check(got, ref)


def test_int8_kv_cache():
    o = make_o()
    h, q, kc, vc, kn, vn, ks, vs = setup(1, 8, 256, 100, int8_kv=True)
    p = jnp.int32(100)
    got = attn_block_o(
        h, q, kc, vc, p, 256, o, (kn, vn),
        k_scale=ks, v_scale=vs, impl="pallas_interpret",
    )
    ref = reference(h, q, kc, vc, kn, vn, p, 256, o, ks, vs, None)
    check(got, ref)


def test_left_pad_mask():
    o = make_o()
    b = 2
    h, q, kc, vc, kn, vn, ks, vs = setup(b, 8, 256, 0, seed=8)
    past = jnp.asarray([40, 64], jnp.int32)
    mask = np.ones((b, 256), bool)
    mask[0, :17] = False    # left padding on row 0
    mask = jnp.asarray(mask)
    got = attn_block_o(
        h, q, kc, vc, past, 256, o, (kn, vn), input_mask=mask,
        impl="pallas_interpret",
    )
    ref = reference(h, q, kc, vc, kn, vn, past, 256, o, None, None, mask)
    check(got, ref)


def test_multi_kv_strips(monkeypatch):
    """attend_len spanning several KV blocks per head strip."""
    import exllama_tpu.ops.attn_block as ab

    monkeypatch.setattr(ab, "_pick_bk", lambda al: 128)
    o = make_o()
    h, q, kc, vc, kn, vn, ks, vs = setup(1, 8, 512, 300, seed=12)
    p = jnp.int32(300)
    got = attn_block_o(
        h, q, kc, vc, p, 512, o, (kn, vn), impl="pallas_interpret"
    )
    ref = reference(h, q, kc, vc, kn, vn, p, 512, o, None, None, None)
    check(got, ref)


def test_applicability_gates():
    o = make_o()
    assert attn_o_applicable(o, HIDDEN, HEADS, D, 1, "pallas", True, False)
    assert not attn_o_applicable(o, HIDDEN, HEADS, D, 4, "pallas", True,
                                 False)               # prefill
    assert not attn_o_applicable(o, HIDDEN, HEADS, D, 1, "pallas", False,
                                 False)               # non-deferred
    assert not attn_o_applicable(o, HIDDEN, HEADS, D, 1, "xla", True, False)
    assert not attn_o_applicable(o, HIDDEN, HEADS, D, 1, "pallas", True,
                                 True)                # o-proj LoRA
    assert not attn_o_applicable(o, HIDDEN, HEADS, 64, 1, "pallas", True,
                                 False)               # D=64 → flash-64 path
    assert not attn_o_applicable(None, HIDDEN, HEADS, D, 1, "pallas", True,
                                 False)
    assert attn_o_applicable(o, HIDDEN, HEADS, D, 1, "pallas", True, False,
                             batch=32)                # GEMV regime edge
    assert not attn_o_applicable(o, HIDDEN, HEADS, D, 1, "pallas", True,
                                 False, batch=33)     # kernel pads bm<=32


def test_forward_chunk_attn_fuse_equivalence():
    """End-to-end decode step: attn_fuse on (flash_interpret) vs off (xla
    oracle attention) must agree."""
    from exllama_tpu.cache import ExLlamaCache
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.models.llama import ExLlama

    cfg = ExLlamaConfig()
    cfg.hidden_size = HIDDEN
    cfg.intermediate_size = 1152
    cfg.num_attention_heads = HEADS
    cfg.num_key_value_heads = HEADS
    cfg.head_dim = D
    cfg.num_hidden_layers = 2
    cfg.vocab_size = 2048
    cfg.max_seq_len = 128
    cfg.tuning.matmul_impl = "pallas_interpret"
    params = make_synthetic_params(cfg, groupsize=128, act_order=False,
                                   seed=0)
    ids = (np.arange(10, dtype=np.int32)[None, :] * 13 + 7) % cfg.vocab_size

    outs = {}
    for fuse in (True, False):
        cfg.tuning.fuse_attn = fuse
        cfg.tuning.attn_impl = "flash_interpret" if fuse else "xla"
        model = ExLlama(cfg, params=params)
        cache = ExLlamaCache(model)
        logits = model.forward(ids, cache)
        tok = np.argmax(np.asarray(logits[:, -1]), -1)[None].astype(np.int32)
        step = model.forward(tok, cache)
        outs[fuse] = np.asarray(step, np.float32)
    ref = outs[False]
    atol = 0.03 * max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(outs[True], ref, atol=atol)


def make_mlp(gs=128, seed=31, inter=1152):
    rng = np.random.default_rng(seed)

    def qt(k, n, sd):
        r = np.random.default_rng(sd)
        w = r.normal(size=(k, n)).astype(np.float32) * 0.1
        t = gptq.quantize_matrix(w, gs, act_order=False, rng=r)
        return gptq.load_quant_tensor(
            t["qweight"], t["qzeros"], t["scales"], t.get("g_idx")
        )

    gate = qt(HIDDEN, inter, seed)
    up = qt(HIDDEN, inter, seed + 1)
    down = qt(inter, HIDDEN, seed + 2)
    return gptq.concat_quant_tensors([gate, up]), down


@pytest.mark.parametrize("hkv", [8, 2])
def test_layer_tail_matches_separate(hkv):
    """attn+o+residual+norm+MLP megakernel == the separate-kernel chain."""
    from exllama_tpu.ops.attn_block import layer_tail
    from exllama_tpu.ops.mlp import q4_mlp

    o = make_o()
    gateup, down = make_mlp()
    h, q, kc, vc, kn, vn, ks, vs = setup(1, hkv, 256, 77, seed=19)
    rng = np.random.default_rng(23)
    nw = jnp.asarray(rng.normal(size=(HIDDEN,)) * 0.2 + 1.0, jnp.bfloat16)
    p = jnp.int32(77)
    got = layer_tail(
        h, q, kc, vc, p, 256, o, nw, gateup, down, 1e-6, (kn, vn),
        impl="pallas_interpret",
    )
    h_mid = reference(h, q, kc, vc, kn, vn, p, 256, o, None, None, None)
    ref = q4_mlp(h_mid, nw, gateup, down, 1e-6, impl="pallas_interpret")
    check(got, ref)


def test_layer_tail_per_slot_int8():
    """Megakernel with per-slot cursors + int8 KV cache."""
    from exllama_tpu.ops.attn_block import layer_tail
    from exllama_tpu.ops.mlp import q4_mlp

    o = make_o()
    gateup, down = make_mlp(seed=41)
    b = 2
    h, q, kc, vc, kn, vn, ks, vs = setup(b, 8, 256, 0, seed=29,
                                         int8_kv=True)
    rng = np.random.default_rng(37)
    nw = jnp.asarray(rng.normal(size=(HIDDEN,)) * 0.2 + 1.0, jnp.bfloat16)
    past = jnp.asarray([13, 201], jnp.int32)
    got = layer_tail(
        h, q, kc, vc, past, 256, o, nw, gateup, down, 1e-6, (kn, vn),
        k_scale=ks, v_scale=vs, impl="pallas_interpret",
    )
    h_mid = reference(h, q, kc, vc, kn, vn, past, 256, o, ks, vs, None)
    ref = q4_mlp(h_mid, nw, gateup, down, 1e-6, impl="pallas_interpret")
    check(got, ref)


def test_layer_tail_a8():
    """Turbo megakernel: GEMV phases use W4A8; attention stays bf16 exact."""
    from exllama_tpu.ops.attn_block import layer_tail
    from exllama_tpu.ops.mlp import q4_mlp

    o = make_o()
    gateup, down = make_mlp(seed=61)
    h, q, kc, vc, kn, vn, ks, vs = setup(1, 8, 256, 90, seed=62)
    rng = np.random.default_rng(63)
    nw = jnp.asarray(rng.normal(size=(HIDDEN,)) * 0.2 + 1.0, jnp.bfloat16)
    p = jnp.int32(90)
    got = layer_tail(
        h, q, kc, vc, p, 256, o, nw, gateup, down, 1e-6, (kn, vn),
        impl="pallas_a8_interpret",
    )
    # same flash attention as the kernel so the check isolates the a8 GEMVs
    from exllama_tpu.ops.attention import attend_flash

    attn = attend_flash(q, kc, vc, p, 256, new_kv=(kn, vn), interpret=True)
    h_mid = h + q4_matmul(
        attn.reshape(1, 1, HEADS * D), o, impl="pallas_a8_interpret"
    )
    ref = q4_mlp(h_mid, nw, gateup, down, 1e-6, impl="pallas_a8_interpret")
    check(got, ref)


def test_non_aligned_hidden():
    """hidden % N_ALIGN != 0 (33B's 6656 shape class): the kernel runs with
    the residual zero-padded to the npair width and the result is exact."""
    from exllama_tpu.ops.attn_block import attn_o_applicable, layer_tail
    from exllama_tpu.ops.mlp import fused_mlp_applicable, q4_mlp

    hidden, heads, inter = 1536, 12, 1152
    rng = np.random.default_rng(71)

    def qt(k, n, seed):
        r = np.random.default_rng(seed)
        w = r.normal(size=(k, n)).astype(np.float32) * 0.08
        t = gptq.quantize_matrix(w, 128, act_order=False, rng=r)
        return gptq.load_quant_tensor(
            t["qweight"], t["qzeros"], t["scales"], t.get("g_idx")
        )

    o = qt(hidden, hidden, 72)
    gate, up = qt(hidden, inter, 73), qt(hidden, inter, 74)
    down = qt(inter, hidden, 75)
    gateup = gptq.concat_quant_tensors([gate, up])
    assert o.padded_out_features != hidden           # truly non-aligned
    assert attn_o_applicable(o, hidden, heads, D, 1, "pallas", True, False)
    assert fused_mlp_applicable(gateup, down, hidden, 1, "pallas", False)

    b, hkv, s_max, past = 1, 4, 256, 90
    h = jnp.asarray(rng.normal(size=(b, 1, hidden)) * 0.5, jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(b, 1, heads, D)) * 0.5, jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(b, hkv, s_max, D)) * 0.5, jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(b, hkv, s_max, D)) * 0.5, jnp.bfloat16)
    kn = jnp.asarray(rng.normal(size=(b, 1, hkv, D)) * 0.5, jnp.bfloat16)
    vn = jnp.asarray(rng.normal(size=(b, 1, hkv, D)) * 0.5, jnp.bfloat16)
    nw = jnp.asarray(rng.normal(size=(hidden,)) * 0.2 + 1.0, jnp.bfloat16)
    p = jnp.int32(past)

    # attn-only fused block
    got = attn_block_o(
        h, q, kc, vc, p, 256, o, (kn, vn), impl="pallas_interpret"
    )
    attn = attend_xla(q, kc, vc, p, 256, new_kv=(kn, vn))
    h_mid = h + q4_matmul(
        attn.reshape(b, 1, heads * D), o, impl="pallas_interpret"
    )
    check(got, h_mid)

    # whole layer tail (attn + o + norm + MLP) in one kernel
    got2 = layer_tail(
        h, q, kc, vc, p, 256, o, nw, gateup, down, 1e-6, (kn, vn),
        impl="pallas_interpret",
    )
    ref2 = q4_mlp(h_mid, nw, gateup, down, 1e-6, impl="pallas_interpret")
    assert got2.shape == (b, 1, hidden)
    check(got2, ref2)


# ---------------------------------------------------------------------------
# Whole-layer megakernel (layer_step): norm + qkv GEMV + rope + attention +
# o-proj + MLP in one kernel vs the separate-kernel chain.
# ---------------------------------------------------------------------------

def _mk_qt(k, n, seed, gs=128):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.08
    t = gptq.quantize_matrix(w, gs, act_order=False, rng=rng)
    return gptq.load_quant_tensor(
        t["qweight"], t["qzeros"], t["scales"], t.get("g_idx")
    )


def _layer_setup(b, hkv, s_max, seed=21, hidden=HIDDEN, inter=1152,
                 int8_kv=False):
    rng = np.random.default_rng(seed)
    heads = hidden // D
    qkv = gptq.concat_quant_tensors([
        _mk_qt(hidden, heads * D, seed + 1),
        _mk_qt(hidden, hkv * D, seed + 2),
        _mk_qt(hidden, hkv * D, seed + 3),
    ])
    o = _mk_qt(hidden, hidden, seed + 4)
    gateup = gptq.concat_quant_tensors([
        _mk_qt(hidden, inter, seed + 5), _mk_qt(hidden, inter, seed + 6),
    ])
    down = _mk_qt(inter, hidden, seed + 7)
    h = jnp.asarray(rng.normal(size=(b, 1, hidden)) * 0.5, jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(b, hkv, s_max, D)) * 0.5, jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(b, hkv, s_max, D)) * 0.5, jnp.bfloat16)
    iw = jnp.asarray(rng.normal(size=(hidden,)) * 0.2 + 1.0, jnp.bfloat16)
    nw = jnp.asarray(rng.normal(size=(hidden,)) * 0.2 + 1.0, jnp.bfloat16)
    ks = vs = None
    if int8_kv:
        from exllama_tpu.ops.attention import quantize_kv_rows

        qk, sk = quantize_kv_rows(jnp.swapaxes(kc, 1, 2))
        qv, sv = quantize_kv_rows(jnp.swapaxes(vc, 1, 2))
        kc, vc = jnp.swapaxes(qk, 1, 2), jnp.swapaxes(qv, 1, 2)
        ks, vs = jnp.swapaxes(sk, 1, 2), jnp.swapaxes(sv, 1, 2)
    return qkv, o, gateup, down, h, kc, vc, iw, nw, ks, vs


def _layer_oracle(h, qkv, iw, sin_t, cos_t, kc, vc, past, attend_len,
                  o, nw, gateup, down, eps, heads, hkv, impl, ks, vs,
                  mask=None):
    """The separate-kernel decode chain (what _decoder_layer runs with
    qkv_fuse=False): in-kernel-norm qkv GEMV, XLA rope, layer-tail fused
    reference built from attend_xla + q4_matmul + q4_mlp oracles."""
    from exllama_tpu.formats.gptq import padded_n
    from exllama_tpu.ops.mlp import q4_mlp
    from exllama_tpu.ops.rope import apply_rope_sliced

    b = h.shape[0]
    fused = q4_matmul(h, qkv, impl=impl, norm_w=iw, norm_eps=eps)
    nq, nkv = heads * D, hkv * D
    ok = padded_n(nq)
    ov = ok + padded_n(nkv)
    q = fused[..., :nq].reshape(b, 1, heads, D)
    k = fused[..., ok : ok + nkv].reshape(b, 1, hkv, D)
    v = fused[..., ov : ov + nkv].reshape(b, 1, hkv, D)
    q = apply_rope_sliced(q, sin_t, cos_t)
    k = apply_rope_sliced(k, sin_t, cos_t)
    attn = attend_xla(q, kc, vc, past, attend_len, input_mask=mask,
                      k_scale=ks, v_scale=vs, new_kv=(k, v))
    h_mid = h + q4_matmul(attn.reshape(b, 1, heads * D), o, impl=impl)
    out = q4_mlp(h_mid, nw, gateup, down, eps, impl=impl)
    return out, k, v


@pytest.mark.parametrize("hkv,past", [(8, 90), (2, 0), (2, 255)])
def test_layer_step_matches_separate(hkv, past):
    from exllama_tpu.ops.attn_block import layer_step, layer_step_applicable
    from exllama_tpu.ops.rope import rope_tables, slice_tables

    (qkv, o, gateup, down, h, kc, vc, iw, nw,
     ks, vs) = _layer_setup(1, hkv, 256)
    heads = HIDDEN // D
    assert layer_step_applicable(qkv, o, HIDDEN, heads, D,
                                 "pallas_interpret", False)
    sin, cos = rope_tables(256, D)
    p = jnp.int32(past)
    sin_t, cos_t = slice_tables(sin, cos, p, 1)
    got, kr, vr = layer_step(
        h, qkv, iw, sin_t, cos_t, kc, vc, p, 256, o, nw, gateup, down,
        1e-6, heads, hkv, D, impl="pallas_interpret",
    )
    ref, k_ref, v_ref = _layer_oracle(
        h, qkv, iw, sin_t, cos_t, kc, vc, p, 256, o, nw, gateup, down,
        1e-6, heads, hkv, "pallas_interpret", ks, vs,
    )
    assert got.shape == (1, 1, HIDDEN)
    check(got, ref)
    np.testing.assert_array_equal(np.asarray(kr), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(vr), np.asarray(v_ref))


def test_layer_step_batch_cursors_and_mask():
    from exllama_tpu.ops.attn_block import layer_step
    from exllama_tpu.ops.rope import rope_tables, slice_tables

    b = 3
    (qkv, o, gateup, down, h, kc, vc, iw, nw,
     ks, vs) = _layer_setup(b, 8, 256, seed=33)
    heads = HIDDEN // D
    past = jnp.asarray([20, 7, 133], jnp.int32)
    mask = np.ones((b, 256), bool)
    mask[0, :9] = False
    mask = jnp.asarray(mask)
    sin, cos = rope_tables(256, D)
    sin_t, cos_t = slice_tables(sin, cos, past, 1)
    got, kr, vr = layer_step(
        h, qkv, iw, sin_t, cos_t, kc, vc, past, 256, o, nw, gateup, down,
        1e-6, heads, 8, D, input_mask=mask, impl="pallas_interpret",
    )
    ref, k_ref, v_ref = _layer_oracle(
        h, qkv, iw, sin_t, cos_t, kc, vc, past, 256, o, nw, gateup, down,
        1e-6, heads, 8, "pallas_interpret", ks, vs, mask=mask,
    )
    check(got, ref)
    np.testing.assert_array_equal(np.asarray(kr), np.asarray(k_ref))


def test_layer_step_int8_kv_and_a8():
    from exllama_tpu.ops.attn_block import layer_step
    from exllama_tpu.ops.rope import rope_tables, slice_tables

    (qkv, o, gateup, down, h, kc, vc, iw, nw,
     ks, vs) = _layer_setup(1, 8, 256, seed=44, int8_kv=True)
    heads = HIDDEN // D
    p = jnp.int32(77)
    sin, cos = rope_tables(256, D)
    sin_t, cos_t = slice_tables(sin, cos, p, 1)
    for impl in ("pallas_interpret", "pallas_a8_interpret"):
        got, kr, vr = layer_step(
            h, qkv, iw, sin_t, cos_t, kc, vc, p, 256, o, nw, gateup,
            down, 1e-6, heads, 8, D, k_scale=ks, v_scale=vs, impl=impl,
        )
        ref, k_ref, v_ref = _layer_oracle(
            h, qkv, iw, sin_t, cos_t, kc, vc, p, 256, o, nw, gateup,
            down, 1e-6, heads, 8, impl, ks, vs,
        )
        check(got, ref, tol=0.05 if "a8" in impl else 0.03)
        np.testing.assert_array_equal(np.asarray(kr), np.asarray(k_ref))


def test_layer_step_non_aligned_hidden():
    """hidden % N_ALIGN != 0 (the 33B shape class) through the whole-layer
    kernel: zero-padded residual columns end-to-end."""
    from exllama_tpu.ops.attn_block import layer_step, layer_step_applicable
    from exllama_tpu.ops.rope import rope_tables, slice_tables

    hidden, hkv = 1536, 4
    (qkv, o, gateup, down, h, kc, vc, iw, nw,
     ks, vs) = _layer_setup(1, hkv, 256, seed=55, hidden=hidden)
    heads = hidden // D
    assert down.padded_out_features != hidden
    assert layer_step_applicable(qkv, o, hidden, heads, D,
                                 "pallas_interpret", False)
    p = jnp.int32(64)
    sin, cos = rope_tables(256, D)
    sin_t, cos_t = slice_tables(sin, cos, p, 1)
    got, kr, vr = layer_step(
        h, qkv, iw, sin_t, cos_t, kc, vc, p, 256, o, nw, gateup, down,
        1e-6, heads, hkv, D, impl="pallas_interpret",
    )
    ref, k_ref, v_ref = _layer_oracle(
        h, qkv, iw, sin_t, cos_t, kc, vc, p, 256, o, nw, gateup, down,
        1e-6, heads, hkv, "pallas_interpret", ks, vs,
    )
    assert got.shape == (1, 1, hidden)
    check(got, ref)
    np.testing.assert_array_equal(np.asarray(kr), np.asarray(k_ref))


def test_forward_chunk_qkv_fuse_equivalence():
    """End-to-end decode step with the whole-layer megakernel
    (tuning.fuse_qkv=True) vs the xla-oracle attention path."""
    from exllama_tpu.cache import ExLlamaCache
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.models.llama import ExLlama

    cfg = ExLlamaConfig()
    cfg.hidden_size = HIDDEN
    cfg.intermediate_size = 1152
    cfg.num_attention_heads = HEADS
    cfg.num_key_value_heads = 4       # GQA g=2
    cfg.head_dim = D
    cfg.num_hidden_layers = 2
    cfg.vocab_size = 2048
    cfg.max_seq_len = 128
    cfg.tuning.matmul_impl = "pallas_interpret"
    params = make_synthetic_params(cfg, groupsize=128, act_order=False,
                                   seed=9)
    ids = (np.arange(10, dtype=np.int32)[None, :] * 13 + 7) % cfg.vocab_size

    import exllama_tpu.ops.attn_block as AB
    real = AB.layer_step
    calls = []

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    outs = {}
    for fuse in (True, False):
        cfg.tuning.fuse_qkv = fuse
        cfg.tuning.attn_impl = "flash_interpret" if fuse else "xla"
        AB.layer_step = spy if fuse else real
        try:
            model = ExLlama(cfg, params=params)
            cache = ExLlamaCache(model)
            logits = model.forward(ids, cache)
            tok = np.argmax(
                np.asarray(logits[:, -1]), -1
            )[None].astype(np.int32)
            step = model.forward(tok, cache)
        finally:
            AB.layer_step = real
        outs[fuse] = np.asarray(step, np.float32)
    assert len(calls) == cfg.num_hidden_layers  # megakernel actually ran
    ref = outs[False]
    atol = 0.03 * max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(outs[True], ref, atol=atol)


def test_mixed_groupsize_falls_back():
    """A checkpoint with o at groupsize 64 but MLP at 128 must NOT engage
    the combined layer kernels (their scale reshapes assume one groupsize);
    the layer falls back to separate kernels and stays correct."""
    from exllama_tpu.ops.attn_block import layer_fusion_budget_ok

    o64 = _mk_qt(HIDDEN, HIDDEN, 61, gs=64)
    gateup = gptq.concat_quant_tensors(
        [_mk_qt(HIDDEN, 1152, 62), _mk_qt(HIDDEN, 1152, 63)]
    )
    down = _mk_qt(1152, HIDDEN, 64)
    assert not layer_fusion_budget_ok(
        o64, gateup, down, None, HIDDEN, HEADS, HEADS, D, 256, 1, False
    )
    o = _mk_qt(HIDDEN, HIDDEN, 65)
    assert layer_fusion_budget_ok(
        o, gateup, down, None, HIDDEN, HEADS, HEADS, D, 256, 1, False
    )

    # end-to-end: model with mixed groupsizes still decodes correctly
    from exllama_tpu.cache import ExLlamaCache
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.models.llama import ExLlama

    cfg = ExLlamaConfig()
    cfg.hidden_size = HIDDEN
    cfg.intermediate_size = 1152
    cfg.num_attention_heads = HEADS
    cfg.num_key_value_heads = HEADS
    cfg.head_dim = D
    cfg.num_hidden_layers = 1
    cfg.vocab_size = 512
    cfg.max_seq_len = 64
    cfg.tuning.matmul_impl = "pallas_interpret"
    cfg.tuning.attn_impl = "flash_interpret"
    params = make_synthetic_params(cfg, 128, False, seed=66)
    # swap in a gs=64 o-proj (same dequant scale distribution)
    import dataclasses as dc

    lp = params.layers[0]
    params = dc.replace(
        params, layers=(dc.replace(lp, o=_mk_qt(HIDDEN, HIDDEN, 67, gs=64)),)
    )
    model = ExLlama(cfg, params=params)
    cache = ExLlamaCache(model)
    ids = np.arange(6, dtype=np.int32)[None, :] % 512
    logits = model.forward(ids, cache)
    step = model.forward(np.array([[3]], np.int32), cache)
    assert np.all(np.isfinite(np.asarray(step)))

    cfg2 = ExLlamaConfig()
    for a in ("hidden_size", "intermediate_size", "num_attention_heads",
              "num_key_value_heads", "head_dim", "num_hidden_layers",
              "vocab_size", "max_seq_len"):
        setattr(cfg2, a, getattr(cfg, a))
    cfg2.tuning.matmul_impl = "xla"
    model2 = ExLlama(cfg2, params=params)
    cache2 = ExLlamaCache(model2)
    model2.forward(ids, cache2)
    ref = model2.forward(np.array([[3]], np.int32), cache2)
    check(step, ref)
