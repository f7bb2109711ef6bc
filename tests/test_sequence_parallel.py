"""Sequence parallelism on the 8-device CPU mesh: sp_attend and the
owner-masked cache write must match single-device attention exactly; ring
prefill attention must match full causal attention."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from exllama_tpu.ops.attention import attend_xla, update_kv_cache
from exllama_tpu.parallel.sequence import (
    make_sp_mesh,
    ring_attend_prefill,
    sp_attend,
    sp_cache_sharding,
    sp_update_kv_cache,
)

B, T, H, HKV, D, S = 2, 1, 8, 4, 64, 64


def _mk(seed, sp=8):
    rng = np.random.default_rng(seed)
    mesh = make_sp_mesh(sp=sp)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.5, jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, HKV, S, D)) * 0.5, jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, HKV, S, D)) * 0.5, jnp.float32)
    return mesh, q, kc, vc


@pytest.mark.parametrize("past", [0, 17, 40, 63])
def test_sp_attend_matches_single_device(past):
    mesh, q, kc, vc = _mk(0)
    ref = attend_xla(q, kc, vc, jnp.int32(past), S)

    spec_kv = P(None, None, "sp", None)
    fn = shard_map(
        functools.partial(sp_attend, axis="sp"),
        mesh=mesh,
        in_specs=(P(None), spec_kv, spec_kv, P()),
        out_specs=P(None),
    )
    got = fn(q, kc, vc, jnp.int32(past))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_sp_attend_batch_cursors():
    mesh, q, kc, vc = _mk(1)
    past = jnp.asarray([9, 33], jnp.int32)
    ref = attend_xla(q, kc, vc, past, S)
    spec_kv = P(None, None, "sp", None)
    fn = shard_map(
        functools.partial(sp_attend, axis="sp"),
        mesh=mesh,
        in_specs=(P(None), spec_kv, spec_kv, P(None)),
        out_specs=P(None),
    )
    got = fn(q, kc, vc, past)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


@pytest.mark.parametrize("past,t", [(0, 1), (13, 1), (30, 4), (62, 1)])
def test_sp_cache_write_matches_dense(past, t):
    rng = np.random.default_rng(2)
    mesh = make_sp_mesh(sp=8)
    kc = jnp.zeros((B, HKV, S, D), jnp.float32)
    vc = jnp.zeros((B, HKV, S, D), jnp.float32)
    nk = jnp.asarray(rng.standard_normal((B, t, HKV, D)), jnp.float32)
    nv = jnp.asarray(rng.standard_normal((B, t, HKV, D)), jnp.float32)

    ref_k, ref_v, _, _ = update_kv_cache(kc, vc, nk, nv, jnp.int32(past))

    spec_kv = P(None, None, "sp", None)
    fn = shard_map(
        functools.partial(sp_update_kv_cache, axis="sp"),
        mesh=mesh,
        in_specs=(spec_kv, spec_kv, P(None), P(None), P()),
        out_specs=(spec_kv, spec_kv),
    )
    got_k, got_v = fn(kc, vc, nk, nv, jnp.int32(past))
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))


def test_sp_decode_loop_end_to_end():
    """Write+attend loop over sharded cache == dense attention per step."""
    rng = np.random.default_rng(3)
    mesh = make_sp_mesh(sp=8)
    spec_kv = P(None, None, "sp", None)

    kc_s = jnp.zeros((B, HKV, S, D), jnp.float32)
    vc_s = jnp.zeros((B, HKV, S, D), jnp.float32)
    kc_d = jnp.zeros((B, HKV, S, D), jnp.float32)
    vc_d = jnp.zeros((B, HKV, S, D), jnp.float32)

    def sharded_step(kc, vc, nk, nv, q, past):
        kc, vc = sp_update_kv_cache(kc, vc, nk, nv, past)
        out = sp_attend(q, kc, vc, past)
        return kc, vc, out

    fn = shard_map(
        sharded_step,
        mesh=mesh,
        in_specs=(spec_kv, spec_kv, P(None), P(None), P(None), P()),
        out_specs=(spec_kv, spec_kv, P(None)),
    )

    for step in range(6):
        nk = jnp.asarray(rng.standard_normal((B, 1, HKV, D)), jnp.float32)
        nv = jnp.asarray(rng.standard_normal((B, 1, HKV, D)), jnp.float32)
        q = jnp.asarray(rng.standard_normal((B, 1, H, D)) * 0.4, jnp.float32)
        past = jnp.int32(step)
        kc_s, vc_s, got = fn(kc_s, vc_s, nk, nv, q, past)
        kc_d, vc_d, _, _ = update_kv_cache(kc_d, vc_d, nk, nv, past)
        ref = attend_xla(q, kc_d, vc_d, past, S)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
        )


@pytest.mark.parametrize("past", [0, 17, 63])
def test_sp_attend_int8_matches_single_device(past):
    """int8 KV × sp: sharded dequant-attend == single-device int8 attend."""
    from exllama_tpu.ops.attention import quantize_kv_rows

    mesh, q, kc, vc = _mk(5)
    qk, sk = quantize_kv_rows(jnp.swapaxes(kc, 1, 2))   # [B,S,HKV,*]
    qv, sv = quantize_kv_rows(jnp.swapaxes(vc, 1, 2))
    kc_q = jnp.swapaxes(qk, 1, 2)                       # [B,HKV,S,D] int8
    vc_q = jnp.swapaxes(qv, 1, 2)
    ks = jnp.swapaxes(sk, 1, 2)                         # [B,HKV,S] f32
    vs = jnp.swapaxes(sv, 1, 2)

    ref = attend_xla(q, kc_q, vc_q, jnp.int32(past), S,
                     k_scale=ks, v_scale=vs)

    spec_kv = P(None, None, "sp", None)
    spec_sc = P(None, None, "sp")
    fn = shard_map(
        lambda q, kc, vc, p, ks, vs: sp_attend(
            q, kc, vc, p, axis="sp", k_scale=ks, v_scale=vs
        ),
        mesh=mesh,
        in_specs=(P(None), spec_kv, spec_kv, P(), spec_sc, spec_sc),
        out_specs=P(None),
    )
    got = fn(q, kc_q, vc_q, jnp.int32(past), ks, vs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


@pytest.mark.parametrize("past,t", [(0, 1), (13, 1), (30, 4)])
def test_sp_cache_write_int8_matches_dense(past, t):
    """int8 KV × sp: owner-masked quantized write == dense quantized write
    (values AND scale strips bit-identical)."""
    rng = np.random.default_rng(6)
    mesh = make_sp_mesh(sp=8)
    kc = jnp.zeros((B, HKV, S, D), jnp.int8)
    vc = jnp.zeros((B, HKV, S, D), jnp.int8)
    ks = jnp.zeros((B, HKV, S), jnp.float32)
    vs = jnp.zeros((B, HKV, S), jnp.float32)
    nk = jnp.asarray(rng.standard_normal((B, t, HKV, D)), jnp.float32)
    nv = jnp.asarray(rng.standard_normal((B, t, HKV, D)), jnp.float32)

    ref = update_kv_cache(kc, vc, nk, nv, jnp.int32(past),
                          k_scale=ks, v_scale=vs)

    spec_kv = P(None, None, "sp", None)
    spec_sc = P(None, None, "sp")
    fn = shard_map(
        lambda kc, vc, nk, nv, p, ks, vs: sp_update_kv_cache(
            kc, vc, nk, nv, p, axis="sp", k_scale=ks, v_scale=vs
        ),
        mesh=mesh,
        in_specs=(spec_kv, spec_kv, P(None), P(None), P(),
                  spec_sc, spec_sc),
        out_specs=(spec_kv, spec_kv, spec_sc, spec_sc),
    )
    got = fn(kc, vc, nk, nv, jnp.int32(past), ks, vs)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


@pytest.mark.parametrize("t_total", [64, 128])
def test_ring_prefill_matches_causal(t_total):
    rng = np.random.default_rng(4)
    mesh = make_sp_mesh(sp=8)
    q = jnp.asarray(rng.standard_normal((B, t_total, H, D)) * 0.4, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, t_total, HKV, D)) * 0.4, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, t_total, HKV, D)) * 0.4, jnp.float32)

    # dense causal reference via attend_xla on a freshly "written" cache
    kc = jnp.swapaxes(k, 1, 2)
    vc = jnp.swapaxes(v, 1, 2)
    ref = attend_xla(q, kc, vc, jnp.int32(0), t_total)

    spec_q = P(None, "sp", None, None)
    fn = shard_map(
        functools.partial(ring_attend_prefill, axis="sp", axis_size=8),
        mesh=mesh,
        in_specs=(spec_q, spec_q, spec_q),
        out_specs=spec_q,
    )
    got = fn(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=3e-3, atol=3e-3
    )


def test_sp_cache_sharding_spec():
    mesh = make_sp_mesh(sp=2, tp=2, dp=2)
    sh = sp_cache_sharding(mesh)
    assert sh.spec == P("dp", "tp", "sp", None)


@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_sp_model_decode_matches_forward_chunk(kv_dtype):
    """Full-model sequence-parallel decode (make_sp_decode_fn) must match
    the standard forward on an 8-way S-sharded cache — for both bf16 and
    int8 (quantized, scale strips S-sharded alongside) caches."""
    from exllama_tpu.cache import ExLlamaCache
    from exllama_tpu.config import ExLlamaConfig
    from exllama_tpu.formats.loader import make_synthetic_params
    from exllama_tpu.models.llama import ExLlama
    from exllama_tpu.parallel.sequence import (
        make_sp_decode_fn,
        shard_cache_sp,
    )

    cfg = ExLlamaConfig()
    cfg.hidden_size = 256
    cfg.intermediate_size = 512
    cfg.num_attention_heads = 4
    cfg.num_key_value_heads = 2
    cfg.head_dim = 64
    cfg.num_hidden_layers = 2
    cfg.vocab_size = 128
    cfg.max_seq_len = 64
    cfg.max_input_len = 64
    cfg.max_attention_size = 64 * 64
    cfg.tuning.matmul_impl = "xla"
    cfg.tuning.attn_len_bucket = 0
    if kv_dtype == "int8":
        cfg.tuning.kv_cache_dtype = "int8"

    params = make_synthetic_params(cfg, 32, False, seed=9)
    model = ExLlama(cfg, params=params)
    mesh = make_sp_mesh(sp=8)

    ids = (np.arange(10, dtype=np.int32)[None] * 7 + 3) % cfg.vocab_size

    # reference: plain forward decode (prefill all but last, feed last)
    cache_ref = ExLlamaCache(model)
    model.forward(ids[:, :-1], cache_ref, preprocess_only=True)
    ref_logits = []
    seq = list(map(int, ids[0]))
    for _ in range(4):
        lg = model.forward(
            np.asarray(seq[-1:], np.int32)[None], cache_ref
        )
        ref_logits.append(np.asarray(lg, np.float32))
        seq.append(int(np.argmax(lg[0, -1])))

    # sp: prefill token-by-token through the sp step (write+attend), then
    # compare the same decode steps
    cache_sp = shard_cache_sp(ExLlamaCache(model), mesh)
    fn = make_sp_decode_fn(model, mesh)
    kv = cache_sp.state
    for i in range(len(ids[0]) - 1):
        _, kv = fn(model.params, kv, ids[:, i : i + 1], jnp.int32(i))
    seq2 = list(map(int, ids[0]))
    for step in range(4):
        past = jnp.int32(len(seq2) - 1)
        lg, kv = fn(
            model.params, kv, np.asarray(seq2[-1:], np.int32)[None], past
        )
        lg = np.asarray(lg, np.float32)
        np.testing.assert_allclose(
            lg, ref_logits[step], rtol=3e-2, atol=3e-2
        )
        seq2.append(int(np.argmax(lg[0, -1])))
    assert seq2 == seq


@pytest.mark.parametrize("past", [0, 17, 63])
def test_sp_attend_int4_matches_single_device(past):
    """packed int4 KV × sp: sharded unpack-dequant-attend == single-device
    int4 attend (same packed data → tight agreement)."""
    from exllama_tpu.ops.attention import quantize_kv_rows4

    mesh, q, kc, vc = _mk(6)
    qk, sk = quantize_kv_rows4(jnp.swapaxes(kc, 1, 2))  # [B,S,HKV,D/2]
    qv, sv = quantize_kv_rows4(jnp.swapaxes(vc, 1, 2))
    kc_q = jnp.swapaxes(qk, 1, 2)                       # [B,HKV,S,D/2] int8
    vc_q = jnp.swapaxes(qv, 1, 2)
    ks = jnp.swapaxes(sk, 1, 2)
    vs = jnp.swapaxes(sv, 1, 2)

    ref = attend_xla(q, kc_q, vc_q, jnp.int32(past), S,
                     k_scale=ks, v_scale=vs)

    spec_kv = P(None, None, "sp", None)
    spec_sc = P(None, None, "sp")
    fn = shard_map(
        lambda q, kc, vc, p, ks, vs: sp_attend(
            q, kc, vc, p, axis="sp", k_scale=ks, v_scale=vs
        ),
        mesh=mesh,
        in_specs=(P(None), spec_kv, spec_kv, P(), spec_sc, spec_sc),
        out_specs=P(None),
    )
    got = fn(q, kc_q, vc_q, jnp.int32(past), ks, vs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_sp_cache_write_int4_matches_dense():
    """Owner-masked int4 writes match the dense int4 update."""
    from exllama_tpu.ops.attention import update_kv_cache

    mesh, q, kc, vc = _mk(7)
    b, hkv, d = kc.shape[0], kc.shape[1], kc.shape[3]
    rng = np.random.default_rng(12)
    nk = jnp.asarray(rng.standard_normal((b, 1, hkv, d)) * 0.5, jnp.bfloat16)
    nv = jnp.asarray(rng.standard_normal((b, 1, hkv, d)) * 0.5, jnp.bfloat16)
    past = jnp.int32(21)

    kc_q = jnp.zeros((b, hkv, S, d // 2), jnp.int8)
    vc_q = jnp.zeros((b, hkv, S, d // 2), jnp.int8)
    ks = jnp.zeros((b, hkv, S), jnp.float32)
    vs = jnp.zeros((b, hkv, S), jnp.float32)
    ref_k, ref_v, ref_ks, ref_vs = update_kv_cache(
        kc_q, vc_q, nk, nv, past, ks, vs
    )

    spec_kv = P(None, None, "sp", None)
    spec_sc = P(None, None, "sp")
    fn = shard_map(
        lambda kc, vc, nk, nv, p, ks, vs: sp_update_kv_cache(
            kc, vc, nk, nv, p, axis="sp", k_scale=ks, v_scale=vs
        ),
        mesh=mesh,
        in_specs=(spec_kv, spec_kv, P(None), P(None), P(),
                  spec_sc, spec_sc),
        out_specs=(spec_kv, spec_kv, spec_sc, spec_sc),
    )
    got_k, got_v, got_ks, got_vs = fn(kc_q, vc_q, nk, nv, past, ks, vs)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
    np.testing.assert_allclose(np.asarray(got_ks), np.asarray(ref_ks))
    np.testing.assert_allclose(np.asarray(got_vs), np.asarray(ref_vs))
