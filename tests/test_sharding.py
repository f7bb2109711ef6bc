"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The tp>1 path runs the WHOLE forward inside shard_map (forward_chunk's
mesh argument): packed weights are retiled into per-shard segments
(formats/gptq.retile_*_for_tp), every matmul executes on its local shard —
including the Pallas kernels (exercised here in interpret mode) — and
Megatron psums restore the o/down partials. Verifies placement, numerical
agreement with the single-device forward for both the XLA oracle and the
Pallas kernel stack, act-order handling (down fold + o all-gather), fused
projections under tp, and the continuous-batching engine over a dp×tp mesh.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.models.llama import ExLlama
from exllama_tpu.parallel.mesh import (
    make_mesh,
    shard_cache,
    shard_params,
)


def cfg_for_mesh(matmul_impl="xla"):
    c = ExLlamaConfig()
    # Small but TP-interesting shapes: 16 heads / 8 kv heads (GQA 2:1),
    # intermediate 1280 is NOT a multiple of tp*N_ALIGN, so the per-shard
    # retiling must pad each gate/up/down segment independently.
    c.hidden_size = 2048
    c.intermediate_size = 1280
    c.num_attention_heads = 16
    c.num_key_value_heads = 8
    c.head_dim = 128
    c.num_hidden_layers = 2
    c.vocab_size = 256
    c.max_seq_len = 32
    c.max_input_len = 32
    c.tuning.matmul_impl = matmul_impl
    c.tuning.fuse_projections = False
    c.tuning.attn_len_bucket = 16
    return c


@pytest.fixture(scope="module")
def setup():
    cfg = cfg_for_mesh()
    params = make_synthetic_params(cfg, 128, False, seed=11)
    return cfg, params


def test_param_shardings_placement(setup):
    cfg, params = setup
    mesh = make_mesh(tp=2, dp=2)
    sharded = shard_params(params, mesh)
    lp = sharded.layers[0]
    # out-sharded tensors carry column-split specs, in-sharded row-split
    assert lp.q.qweight.sharding.spec == P(None, "tp")
    assert lp.k.qweight.sharding.spec == P(None, "tp")
    assert lp.o.qweight.sharding.spec == P("tp", None)
    assert lp.down.qweight.sharding.spec == P("tp", None)
    # retiled metadata: q keeps its exact width (head-aligned), gate pads
    # each 640-column shard chunk to the 128-row step of down's K split
    assert lp.q.tp_segments == 2 and lp.q.out_features == 2048
    assert lp.gate.tp_segments == 2
    assert lp.gate.out_features == 2 * 640  # 640 % 128 == 0: no keep pad
    assert lp.down.in_features == 1280
    # per-shard stored segments are independently padded to N_ALIGN
    assert lp.gate.qweight.shape[1] * 2 == 2 * 1024
    assert isinstance(lp.q.qweight.sharding, NamedSharding)


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
def test_sharded_forward_matches_single_device(setup, impl):
    """tp=4 shard_map forward (both the XLA oracle and the Pallas kernels
    in interpret mode) must match the single-device forward."""
    _, params = setup
    cfg = cfg_for_mesh(impl)
    ids = (np.arange(8, dtype=np.int32)[None, :] * 5 + 2) % cfg.vocab_size

    model = ExLlama(cfg, params=params)
    ref = np.asarray(model.forward(ids, ExLlamaCache(model)))

    mesh = make_mesh(tp=4, dp=1)
    sharded = shard_params(params, mesh)
    model_s = ExLlama(cfg, params=sharded, mesh=mesh)
    cache_s = shard_cache(ExLlamaCache(model_s), mesh)
    got = np.asarray(model_s.forward(ids, cache_s))
    # tolerance: K-split psums re-associate the f32 partial sums and the
    # bf16 residual stream re-rounds per layer — ~2-4% of logit scale over
    # 2 layers (same order as the xla-vs-pallas cross-impl noise)
    np.testing.assert_allclose(got, ref, rtol=4e-2, atol=4e-2)


def test_dp_tp_decode_executes(setup):
    cfg, params = setup
    mesh = make_mesh(tp=2, dp=2)
    sharded = shard_params(params, mesh)
    model = ExLlama(cfg, params=sharded, mesh=mesh)
    cache = shard_cache(ExLlamaCache(model, batch_size=2), mesh)
    ids = (np.arange(12, dtype=np.int32).reshape(2, 6) * 3 + 1) % cfg.vocab_size
    model.forward(ids, cache, preprocess_only=True)
    logits = model.forward(
        np.asarray([[5], [7]], np.int32), cache, last_id_only=True
    )
    assert logits.shape == (2, 1, cfg.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))
    assert cache.current_seq_len == 7


@pytest.mark.parametrize("tp,impl", [(2, "xla"), (4, "xla"),
                                     (2, "pallas_interpret")])
def test_tp_act_order_matches_single_device(tp, impl):
    """act-order checkpoints under TP: down's x_map folds into gate/up at
    load (required — its K permutation crosses shard boundaries); o's
    x_map rides an all-gather of the attention output plus a per-shard
    row gather (models/llama._decoder_layer); q/k/v/gate/up x_maps are
    K-side and replicate."""
    cfg = cfg_for_mesh(impl)
    params = make_synthetic_params(cfg, 128, True, seed=13)
    assert any(
        lp.o.x_map is not None or lp.q.x_map is not None
        for lp in params.layers
    ), "synthetic act-order params must carry x_map"
    # the fold removed down's x_map already at build time
    assert all(lp.down.x_map is None for lp in params.layers)
    ids = (np.arange(8, dtype=np.int32)[None, :] * 7 + 3) % cfg.vocab_size

    model = ExLlama(cfg, params=params)
    ref = np.asarray(model.forward(ids, ExLlamaCache(model)))

    mesh = make_mesh(tp=tp, dp=1)
    sharded = shard_params(params, mesh)
    model_s = ExLlama(cfg, params=sharded, mesh=mesh)
    cache_s = shard_cache(ExLlamaCache(model_s), mesh)
    got = np.asarray(model_s.forward(ids, cache_s))
    # tolerance: see test_sharded_forward_matches_single_device
    np.testing.assert_allclose(got, ref, rtol=4e-2, atol=4e-2)

    # and a decode step on top of the prefilled cache
    tok = np.asarray([[9]], np.int32)
    got_d = np.asarray(model_s.forward(tok, cache_s))
    assert np.all(np.isfinite(got_d))


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
def test_tp_fused_projections_match(impl):
    """fuse_projections under tp>1: the loader retiles q/k/v (gate/up)
    first, then fuses per shard with interleaved segments
    (formats/gptq.fuse_quant_tensors_tp) — forward must match the unfused
    single-device reference."""
    cfg = cfg_for_mesh(impl)
    ids = (np.arange(8, dtype=np.int32)[None, :] * 5 + 2) % cfg.vocab_size

    params_ref = make_synthetic_params(cfg, 128, False, seed=3)
    model = ExLlama(cfg, params=params_ref)
    ref = np.asarray(model.forward(ids, ExLlamaCache(model)))

    cfg_f = cfg_for_mesh(impl)
    cfg_f.tuning.fuse_projections = True
    mesh = make_mesh(tp=2, dp=1)
    p_tp = make_synthetic_params(cfg_f, 128, False, seed=3, mesh=mesh)
    assert all(
        lp.qkv is not None and lp.qkv.tp_segments == 2
        and lp.gateup is not None for lp in p_tp.layers
    )
    model_s = ExLlama(cfg_f, params=p_tp, mesh=mesh)
    cache_s = shard_cache(ExLlamaCache(model_s), mesh)
    got = np.asarray(model_s.forward(ids, cache_s))
    # tolerance: see test_sharded_forward_matches_single_device
    np.testing.assert_allclose(got, ref, rtol=4e-2, atol=4e-2)


def test_retile_roundtrip_dequant():
    """retile_out/in_for_tp preserve the dequantized matrix exactly:
    stitching the per-shard segments back together reproduces dequant(qt)."""
    from exllama_tpu.formats.gptq import (
        dequantize,
        load_quant_tensor,
        padded_n,
        quantize_matrix,
        retile_in_for_tp,
        retile_out_for_tp,
    )

    rng = np.random.default_rng(7)
    w = rng.standard_normal((512, 1280), dtype=np.float32) * 0.1
    t = quantize_matrix(w, 128, False, rng)
    qt = load_quant_tensor(t["qweight"], t["qzeros"], t["scales"])
    ref = dequantize(qt)                        # [512, 1280]

    tp = 4
    keep = -(-(1280 // tp) // 128) * 128          # 384: off the even split
    r = retile_out_for_tp(qt, tp, chunk=keep)
    assert r.tp_segments == tp and r.out_features == tp * keep
    seg = padded_n(keep)
    full = dequantize(dataclasses.replace(
        r, tp_segments=1, out_features=r.padded_out_features))
    for s in range(tp):
        lo, hi = s * keep, min((s + 1) * keep, 1280)
        got = full[:, s * seg : s * seg + (hi - lo)]
        np.testing.assert_array_equal(got, ref[:, lo:hi])
        # chunk-pad columns dequantize to exactly 0
        np.testing.assert_array_equal(
            full[:, s * seg + (hi - lo) : (s + 1) * seg], 0.0
        )

    r2 = retile_in_for_tp(qt, tp, row_step=128)  # 512/4=128: no row pad
    assert r2.tp_segments == tp and r2.in_features == 512
    full2 = dequantize(dataclasses.replace(r2, tp_segments=1))[:, :1280]
    np.testing.assert_array_equal(full2, ref)

    # uneven-split case (the 65B-style shape class): K=320 over tp=5 at
    # row step 128 -> uniform chunk 128; the last chunk is short and
    # trailing shards are all-zero padding
    w3 = rng.standard_normal((320, 1024), dtype=np.float32) * 0.1
    t3 = quantize_matrix(w3, 32, False, rng)
    qt3 = load_quant_tensor(t3["qweight"], t3["qzeros"], t3["scales"])
    r3 = retile_in_for_tp(qt3, 5, row_step=128)
    assert r3.in_features == 5 * 128
    full3 = dequantize(dataclasses.replace(r3, tp_segments=1))
    ref3 = dequantize(qt3)
    for s in range(5):
        lo, hi = s * 128, min((s + 1) * 128, 320)
        rows = max(hi - lo, 0)
        np.testing.assert_array_equal(
            full3[s * 128 : s * 128 + rows], ref3[lo:hi]
        )
        np.testing.assert_array_equal(
            full3[s * 128 + rows : (s + 1) * 128], 0.0
        )


def _engine_mesh_tokens(mesh_spec):
    """Greedy-decode 4 requests through the continuous-batching engine;
    ``mesh_spec`` is None (single device) or (tp, dp). Module-level so the
    test below can invoke the mesh variant in a fresh subprocess."""
    from exllama_tpu.ops.sampling import SamplerSettings
    from exllama_tpu.serve import ContinuousBatchingEngine
    from exllama_tpu.tokenizer import FakeTokenizer

    cfg = cfg_for_mesh()
    cfg.max_seq_len = 64
    # token-exactness on synthetic weights needs argmax margins above the
    # psum-reassociation noise (~3% of logit scale); a small vocab widens
    # the top-2 gap (verify SKILL.md, round-2 lessons)
    cfg.vocab_size = 32
    params = make_synthetic_params(cfg, 128, False, seed=21)
    greedy = SamplerSettings(temperature=1.0, top_k=1, top_p=0.0,
                             token_repetition_penalty_max=1.0)
    prompts = [
        (np.arange(10, dtype=np.int32) * (3 + i) + 1) % cfg.vocab_size
        for i in range(4)
    ]
    mesh = None
    model = ExLlama(cfg, params=params)
    if mesh_spec is not None:
        tp, dp = mesh_spec
        mesh = make_mesh(tp=tp, dp=dp)
        model = ExLlama(cfg, params=shard_params(params, mesh), mesh=mesh)
    eng = ContinuousBatchingEngine(
        model, FakeTokenizer(), max_slots=4, prefill_bucket=8,
        mesh=mesh,
    )
    reqs = [
        eng.submit(ids, max_new_tokens=4, settings=greedy,
                   stop_tokens=(-1,))
        for ids in prompts
    ]
    eng.run()
    return [r.new_tokens for r in reqs]


def test_engine_over_mesh_matches_unsharded():
    """Continuous-batching engine on a dp×tp mesh (sharded slot cache,
    chunked admission) must decode exactly like the unsharded engine.

    The mesh variant runs in a FRESH INTERPRETER: late in a long suite,
    XLA:CPU segfaults while COMPILING the 8-device engine executable (an
    upstream compiler bug that needs ~300 prior in-process compilations to
    trigger — observed crashing in backend_compile, in cache serialize,
    AND in cache deserialize across round-5 runs; the same compile in a
    fresh process is reliable every time)."""
    import json
    import subprocess
    import sys
    import textwrap

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = textwrap.dedent(
        f"""
        import os
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        os.environ["EXLLAMA_TPU_CACHE_DIR"] = "off"
        import jax
        jax.config.update("jax_platforms", "cpu")
        import sys
        sys.path.insert(0, {repo!r})
        sys.path.insert(0, {os.path.join(repo, "tests")!r})
        import json
        from test_sharding import _engine_mesh_tokens
        ref = _engine_mesh_tokens(None)
        got = _engine_mesh_tokens((2, 2))
        print("RESULT=" + json.dumps({{"ref": ref, "got": got}}))
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = next(
        ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT=")
    )
    res = json.loads(line[len("RESULT="):])
    assert res["got"] == res["ref"], res
