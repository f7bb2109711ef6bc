"""Flash-attention kernel vs the XLA oracle (interpret mode on CPU).

The kernel and the einsum path implement one semantics (causal with
chunked-prefill offset, per-row cursors, left-pad masks, GQA); this is the
dual-path cross-validation the reference uses for its matmul kernels
(test_benchmark_inference.py:239-246), applied to attention.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from exllama_tpu.ops.attention import attend_flash, attend_xla, update_kv_cache


def make_case(b, t, h, hkv, d, s_max, past, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((b, hkv, s_max, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((b, hkv, s_max, d)), jnp.bfloat16)
    return q, kc, vc


@pytest.mark.parametrize(
    "b,t,h,hkv,past,attend_len",
    [
        (1, 1, 4, 4, 37, 64),     # MHA decode
        (1, 1, 8, 2, 37, 64),     # GQA decode
        (1, 16, 4, 2, 5, 64),     # chunked prefill with offset
        (2, 1, 4, 4, 30, 64),     # batch decode
        (1, 64, 4, 4, 0, 64),     # full prefill
    ],
)
def test_flash_matches_xla(b, t, h, hkv, past, attend_len):
    d, s_max = 128, 64
    q, kc, vc = make_case(b, t, h, hkv, d, s_max, past)
    pl_ = jnp.int32(past)
    ref = np.asarray(attend_xla(q, kc, vc, pl_, attend_len), np.float32)
    got = np.asarray(
        attend_flash(q, kc, vc, pl_, attend_len, interpret=True), np.float32
    )
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)


def test_flash_per_row_past_and_mask():
    b, t, h, hkv, d, s_max = 3, 1, 4, 2, 128, 64
    q, kc, vc = make_case(b, t, h, hkv, d, s_max, 0, seed=7)
    past = jnp.asarray([3, 17, 40], jnp.int32)
    mask = np.ones((b, s_max), bool)
    mask[0, :2] = False   # left padding on row 0
    mask[2, :10] = False
    mask = jnp.asarray(mask)
    ref = np.asarray(attend_xla(q, kc, vc, past, 64, mask), np.float32)
    got = np.asarray(
        attend_flash(q, kc, vc, past, 64, mask, interpret=True), np.float32
    )
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize(
    "h,hkv,t",
    [
        (56, 8, 80),   # Yi-34B GQA ratio g=7: non-power-of-2, r_total=560
        (12, 4, 128),  # g=3, r_total=384 > 256 exercises the tiled branch
    ],
)
def test_flash_prefill_non_pow2_gqa(h, hkv, t):
    """g that does not divide 512 used to hang the q-tile chooser forever
    (ADVICE r1); the tile must start from a multiple of g."""
    d, s_max, past = 128, 128, 0
    q, kc, vc = make_case(1, t, h, hkv, d, s_max, past, seed=3)
    pl_ = jnp.int32(past)
    ref = np.asarray(attend_xla(q, kc, vc, pl_, 128), np.float32)
    got = np.asarray(
        attend_flash(q, kc, vc, pl_, 128, interpret=True), np.float32
    )
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)


def test_flash_head_dim_64():
    """D=64 rides the full-dimension legality rule (VERDICT #10)."""
    b, t, h, hkv, d, s_max = 1, 8, 4, 2, 64, 64
    q, kc, vc = make_case(b, t, h, hkv, d, s_max, 7, seed=11)
    pl_ = jnp.int32(7)
    ref = np.asarray(attend_xla(q, kc, vc, pl_, 64), np.float32)
    got = np.asarray(
        attend_flash(q, kc, vc, pl_, 64, interpret=True), np.float32
    )
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("per_slot", [False, True])
def test_deferred_attend_matches_committed(per_slot):
    """attend(new_kv=row) over a cache WITHOUT the current row must equal
    attend over the cache WITH the row committed (both impls)."""
    b, t, h, hkv, d, s_max = 2, 1, 8, 4, 128, 64
    rng = np.random.default_rng(5)
    q, kc, vc = make_case(b, t, h, hkv, d, s_max, 0, seed=5)
    nk = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.bfloat16)
    nv = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.bfloat16)
    past = (
        jnp.asarray([13, 37], jnp.int32) if per_slot else jnp.int32(21)
    )
    kc2, vc2, _, _ = update_kv_cache(kc, vc, nk, nv, past)
    ref = np.asarray(attend_xla(q, kc2, vc2, past, s_max), np.float32)
    got_xla = np.asarray(
        attend_xla(q, kc, vc, past, s_max, new_kv=(nk, nv)), np.float32
    )
    np.testing.assert_allclose(got_xla, ref, atol=3e-2, rtol=3e-2)
    got_fl = np.asarray(
        attend_flash(q, kc, vc, past, s_max, new_kv=(nk, nv),
                     interpret=True),
        np.float32,
    )
    np.testing.assert_allclose(got_fl, ref, atol=3e-2, rtol=3e-2)


def test_deferred_attend_empty_cache():
    """past=0: everything comes from the in-flight row."""
    b, t, h, hkv, d, s_max = 1, 1, 4, 2, 128, 64
    rng = np.random.default_rng(6)
    q, kc, vc = make_case(b, t, h, hkv, d, s_max, 0, seed=6)
    nk = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.bfloat16)
    nv = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.bfloat16)
    past = jnp.int32(0)
    kc2, vc2, _, _ = update_kv_cache(
        jnp.zeros_like(kc), jnp.zeros_like(vc), nk, nv, past
    )
    ref = np.asarray(attend_xla(q, kc2, vc2, past, s_max), np.float32)
    for fn in (attend_xla, lambda *a, **kw: attend_flash(
            *a, **kw, interpret=True)):
        got = np.asarray(
            fn(q, kc, vc, past, s_max, new_kv=(nk, nv)), np.float32
        )
        np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("per_slot,quantized", [
    (False, False), (True, False), (False, True), (True, True),
])
def test_commit_kv_cache_kernel_matches_xla(per_slot, quantized):
    from exllama_tpu.ops.attention import commit_kv_cache

    # s = 128: the strip-RMW kernel needs S divisible by its strip widths
    # (8/32 rows, 128-lane scale strips); smaller caches fall back to xla
    L, b, hkv, s, d = 3, 2, 2, 128, 128
    rng = np.random.default_rng(9)
    if quantized:
        kcs = tuple(jnp.zeros((b, hkv, s, d), jnp.int8) for _ in range(L))
        vcs = tuple(jnp.zeros((b, hkv, s, d), jnp.int8) for _ in range(L))
        kss = tuple(jnp.zeros((b, hkv, s), jnp.float32) for _ in range(L))
        vss = tuple(jnp.zeros((b, hkv, s), jnp.float32) for _ in range(L))
    else:
        kcs = tuple(jnp.zeros((b, hkv, s, d), jnp.bfloat16) for _ in range(L))
        vcs = tuple(jnp.zeros((b, hkv, s, d), jnp.bfloat16) for _ in range(L))
        kss = vss = None
    nk = jnp.asarray(rng.standard_normal((L, b, 1, hkv, d)), jnp.bfloat16)
    nv = jnp.asarray(rng.standard_normal((L, b, 1, hkv, d)), jnp.bfloat16)
    past = jnp.asarray([4, 19], jnp.int32) if per_slot else jnp.int32(7)

    ref = commit_kv_cache(kcs, vcs, nk, nv, past, kss, vss, impl="xla")
    got = commit_kv_cache(
        kcs, vcs, nk, nv, past, kss, vss, impl="pallas", interpret=True
    )
    for r_t, g_t in zip(ref, got):
        if r_t is None:
            assert g_t is None
            continue
        for r, g in zip(r_t, g_t):
            np.testing.assert_array_equal(
                np.asarray(r, np.float32), np.asarray(g, np.float32)
            )


def test_update_kv_cache_layout():
    b, hkv, s, d, t = 2, 2, 32, 128, 4
    kc = jnp.zeros((b, hkv, s, d), jnp.bfloat16)
    vc = jnp.zeros((b, hkv, s, d), jnp.bfloat16)
    rng = np.random.default_rng(0)
    nk = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.bfloat16)
    nv = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.bfloat16)
    kc2, vc2, _, _ = update_kv_cache(kc, vc, nk, nv, jnp.int32(5))
    np.testing.assert_array_equal(
        np.asarray(kc2[:, :, 5:9], np.float32),
        np.asarray(jnp.swapaxes(nk, 1, 2), np.float32),
    )
    # per-row cursors
    kc3, vc3, _, _ = update_kv_cache(
        kc, vc, nk, nv, jnp.asarray([2, 9], jnp.int32)
    )
    np.testing.assert_array_equal(
        np.asarray(kc3[0, :, 2:6], np.float32),
        np.asarray(jnp.swapaxes(nk, 1, 2)[0], np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(vc3[1, :, 9:13], np.float32),
        np.asarray(jnp.swapaxes(nv, 1, 2)[1], np.float32),
    )


def test_padded_head_dim_flash_matches_einsum():
    """tuning.pad_head_dim: a D=100 model (OpenLlama-3B class) runs the
    flash kernel over a 128-padded cache and matches the plain einsum path.

    Runs in a SUBPROCESS: XLA:CPU codegen for the odd-width (D=100)
    graphs has been observed to destabilize later compiles in the same
    process on this host (jaxlib AOT machine-feature mismatch); isolation
    keeps the suite deterministic while still covering the path.
    """
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = """
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from exllama_tpu.cache import ExLlamaCache
from exllama_tpu.config import ExLlamaConfig
from exllama_tpu.formats.loader import make_synthetic_params
from exllama_tpu.models.llama import ExLlama

def build(pad, attn_impl):
    cfg = ExLlamaConfig()
    cfg.hidden_size = 400          # 4 heads x 100
    cfg.intermediate_size = 512
    cfg.num_attention_heads = 4
    cfg.num_key_value_heads = 2
    cfg.head_dim = 100
    cfg.num_hidden_layers = 2
    cfg.vocab_size = 256
    cfg.max_seq_len = 64
    cfg.tuning.matmul_impl = "xla"
    cfg.tuning.attn_impl = attn_impl
    cfg.tuning.pad_head_dim = pad
    params = make_synthetic_params(cfg, 16, False, seed=77)
    return ExLlama(cfg, params=params)

ids = (np.arange(10, dtype=np.int32)[None] * 3 + 1) % 256
m_ref = build(False, "xla")
c_ref = ExLlamaCache(m_ref)
assert c_ref.state.k[0].shape[-1] == 100
ref = np.asarray(m_ref.forward(ids, c_ref, last_id_only=False))
m_pad = build(True, "flash_interpret")
c_pad = ExLlamaCache(m_pad)
assert c_pad.state.k[0].shape[-1] == 128        # padded alloc
got = np.asarray(m_pad.forward(ids, c_pad, last_id_only=False))
scale = np.abs(ref).max() + 1e-9
assert np.abs(got - ref).max() / scale < 0.03, "prefill mismatch"
tr = np.asarray(m_ref.forward(np.array([[9]], np.int32), c_ref))
tp = np.asarray(m_pad.forward(np.array([[9]], np.int32), c_pad))
assert np.abs(tp - tr).max() / (np.abs(tr).max() + 1e-9) < 0.03
print("PAD_HEAD_DIM_OK")
"""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=420, cwd=repo, env=env,
    )
    assert r.returncode == 0, (r.stdout[-800:], r.stderr[-800:])
    assert "PAD_HEAD_DIM_OK" in r.stdout


@pytest.mark.parametrize(
    "b,t,h,hkv,past,attend_len,d",
    [
        (1, 703, 4, 4, 0, 703, 128),   # odd T > 512: row padding engages
        (1, 543, 4, 1, 64, 607, 128),  # odd T + GQA g=4 + chunk offset
        (2, 439, 4, 4, 0, 439, 64),    # odd T <= 512 (full-dim tile), D=64
    ],
)
def test_flash_odd_prompt_lengths(b, t, h, hkv, past, attend_len, d):
    """Odd prompt lengths (e.g. benchmark.py's 1919-token prefill) must not
    produce sublane-illegal query tiles: _q_tile_rows pads the row total to
    a tile-legal multiple and the padded rows are sliced off/fully masked."""
    s_max = 1024
    q, kc, vc = make_case(b, t, h, hkv, d, s_max, past)
    pl_ = jnp.int32(past)
    ref = np.asarray(attend_xla(q, kc, vc, pl_, attend_len), np.float32)
    got = np.asarray(
        attend_flash(q, kc, vc, pl_, attend_len, interpret=True), np.float32
    )
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)
