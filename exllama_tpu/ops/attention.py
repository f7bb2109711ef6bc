"""GQA attention over a preallocated KV cache.

TPU-native re-design of the reference's attention paths (model.py:295-502).
The reference picks between flash-attn-2, explicit matmul-softmax-matmul, and
torch SDPA by row-count thresholds; here there are two implementations of one
semantics:

  * ``flash`` — a fused Pallas kernel (the default on TPU): online-softmax
    tiling over the KV sequence, so the [T, S] score matrix never
    materializes in HBM; handles chunked-prefill position offsets
    (query t sits at absolute position past_len + t), per-batch-row
    cursors (continuous-batching slots), left-padding masks, and GQA by
    blocking queries per kv-head (the KV tensor is never expanded to
    query heads — the reference materializes repeat_kv, model.py:310-319).
  * ``xla`` — an einsum formulation with an explicit additive mask; the
    readable oracle the kernel is tested against, and the CPU path.

The KV cache layout is [B, Hkv, S_max, D] (head-major like the reference):
each kv head's sequence strip is contiguous, so the flash kernel's per-head
KV blocks are unit-stride DMAs. ``attend_len`` is a static bound on how much
of the cache is read — the host rounds the live length up to a bucket
(TuningParams.attn_len_bucket) so decode doesn't stream the whole max_seq_len
cache on short contexts; masking handles the remainder exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9  # additive mask value (reference uses fp16 -65504, model.py:1014)
_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def flash_supported_head_dim(d: int) -> bool:
    """Head dims the Pallas flash kernel handles.

    Lane-width multiples (128, 256) are the native case; 64 works because
    every kernel block's minor dim equals the full array dim (Mosaic's
    full-dimension legality rule), at 50% lane utilization — still far
    better than materializing the score matrix on long contexts. Odd dims
    (e.g. OpenLlama-3B's 100) fall back to the einsum path.
    """
    return d in (64,) or d % 128 == 0


# Decode KV-block size candidates, shared with the fused layer kernels
# (ops/attn_block._pick_bk) so the megakernel and its oracle always pick
# the same strip decomposition.
DECODE_BK_CANDS = (2048, 1024, 512, 384, 256, 128)


def quantize_kv_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-(token, head) symmetric int8 quantization of [B, T, Hkv, D] rows.

    Returns (int8 values, f32 scales [B, T, Hkv]). Each head's D-vector gets
    its own scale = amax/127, so attention error stays bounded per row.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)                 # [B, T, Hkv]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_kv_rows4(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-(token, head) symmetric INT4 quantization of [B, T, Hkv, D]
    rows, PACKED two values per byte along D.

    Returns (int8 [B, T, Hkv, D/2] packed bytes, f32 scales [B, T, Hkv]).
    Byte d pairs dims (d, d + D/2): low nibble = q_lo + 8 exactly, high
    nibble = (q_hi + 8) ^ 8 — the same top-bit-flip as the npair weight
    layout, so the SIGNED byte equals 16·q_hi + q_lo + 8 and the kernel
    unpack is one mask + two converts:

        q_hi = (byte & 0xF0) · 1/16        q_lo = (byte & 0x0F) − 8

    with q ∈ [−7, 7] and scale = amax/7. Cache arrays keep dtype int8;
    int4 packing is detected by shape (last dim == head_dim // 2)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)                 # [B, T, Hkv]
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(
        jnp.round(xf / scale[..., None]), -7, 7
    ).astype(jnp.int32) + 8                              # [1, 15]
    d = x.shape[-1]
    lo = q[..., : d // 2]
    hi = q[..., d // 2 :] ^ 8
    return (lo | (hi << 4)).astype(jnp.int8), scale


def unpack_kv4(packed: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """[..., D/2] int4-packed bytes → [..., D] raw values q ∈ [−8, 7]
    (scale NOT applied — callers fold the per-row scale like the int8
    path). Inverse of the packing in :func:`quantize_kv_rows4`."""
    lo = (packed & 0x0F).astype(dtype) - 8.0
    hi = (packed & (-16)).astype(dtype) * 0.0625
    return jnp.concatenate([lo, hi], axis=-1)


def _write_at(cache: jax.Array, new: jax.Array, past_len: jax.Array):
    """dynamic_update_slice of [B, Hkv, T, ...] into [B, Hkv, S, ...] at
    sequence offset past_len (scalar, or [B] for per-slot cursors)."""
    if past_len.ndim == 1:
        def row(c, n, p):
            starts = (jnp.zeros((), jnp.int32), p.astype(jnp.int32)) + (
                jnp.zeros((), jnp.int32),
            ) * (c.ndim - 2)
            return jax.lax.dynamic_update_slice(c, n.astype(c.dtype), starts)

        return jax.vmap(row)(cache, new, past_len)
    z = jnp.zeros((), jnp.int32)
    starts = (z, z, past_len.astype(jnp.int32)) + (z,) * (cache.ndim - 3)
    return jax.lax.dynamic_update_slice(cache, new.astype(cache.dtype), starts)


def update_kv_cache(
    k_cache: jax.Array,   # [B, Hkv, S_max, D] bf16 or int8
    v_cache: jax.Array,
    new_k: jax.Array,     # [B, T, Hkv, D]
    new_v: jax.Array,
    past_len: jax.Array,  # scalar int32, or [B] for per-slot cursors
    k_scale: Optional[jax.Array] = None,   # [B, Hkv, S_max] f32 (int8 cache)
    v_scale: Optional[jax.Array] = None,
):
    """Write T new KV rows at position past_len (functional update).

    Analogue of the reference's cache write (model.py:440-443 and
    update_cache_kernel, q4_attn.cu:19-72). Under jit with donated cache
    buffers XLA performs this in place. A [B]-shaped past_len writes each
    batch row at its own offset (continuous-batching slots). For int8 caches
    the rows are quantized per (token, head) and the scale strips are
    written alongside. Returns (k_cache, v_cache, k_scale, v_scale) with
    None scales for bf16 caches.
    """
    if k_scale is not None:
        quant = (
            quantize_kv_rows4
            if k_cache.shape[-1] != new_k.shape[-1]    # packed int4 cache
            else quantize_kv_rows
        )
        qk, sk = quant(new_k)
        qv, sv = quant(new_v)
        k_cache = _write_at(k_cache, jnp.swapaxes(qk, 1, 2), past_len)
        v_cache = _write_at(v_cache, jnp.swapaxes(qv, 1, 2), past_len)
        k_scale = _write_at(k_scale, jnp.swapaxes(sk, 1, 2), past_len)
        v_scale = _write_at(v_scale, jnp.swapaxes(sv, 1, 2), past_len)
        return k_cache, v_cache, k_scale, v_scale

    k_cache = _write_at(k_cache, jnp.swapaxes(new_k, 1, 2), past_len)
    v_cache = _write_at(v_cache, jnp.swapaxes(new_v, 1, 2), past_len)
    return k_cache, v_cache, None, None


# ---------------------------------------------------------------------------
# Deferred-commit batched KV write
# ---------------------------------------------------------------------------

def _commit_strip_w(cache_dtype, packed4: bool) -> int:
    """Seq-strip width for the RMW commit kernel: the HBM cache's physical
    sublane tile (bf16 packs 2 sublanes/word on an (8,128) tile → 8-row
    strips cover every legal boundary; int8 packs 4 → 32-row strips)."""
    if packed4 or cache_dtype == jnp.int8:
        return 32
    return 8


def _commit_kernel(
    *refs,
    n_layers: int,
    strip_w: int,
    quantized: bool,
):
    """Write every layer's T=1 KV rows into its cache at the step cursor in
    ONE kernel — replacing the 2·L (4·L with int8 scales) XLA
    dynamic-update-slice ops of the per-layer path. TPU counterpart of the
    reference's update_cache_kernel inside q4_attn (q4_attn.cu:19-72),
    batched over all layers.

    Mosaic cannot DMA a single sequence row into the (8,128)-tiled HBM
    cache (slice shapes on tiled dims must be tile-aligned — round-3
    finding), so the commit is a strip read-modify-write: DMA the
    tile-aligned strip_w-row strip containing the cursor into VMEM, replace
    row (past % strip_w) with the new row by a masked select (the new rows
    arrive pre-broadcast along a strip_w axis so no in-kernel relayout is
    needed), and DMA the strip back. All layers' strip loads are issued
    before any compute so the DMAs overlap.

    Ref order: past(SMEM), nk, nv, [nks, nvs], L·n_arr aliased input caches
    (unused), L·n_arr output caches, then scratch: k/v strips [2L, ...],
    [scale strips [2L, ...]], in-sems, out-sems.
    """
    L = n_layers
    W = strip_w
    n_per_layer = 4 if quantized else 2
    n_arr = L * n_per_layer
    past_ref = refs[0]
    nk_ref, nv_ref = refs[1], refs[2]
    nks_ref, nvs_ref = (refs[3], refs[4]) if quantized else (None, None)
    base = 3 + (2 if quantized else 0)
    outs = refs[base + n_arr : base + 2 * n_arr]
    kc = outs[0:L]
    vc = outs[L : 2 * L]
    ksc = outs[2 * L : 3 * L] if quantized else None
    vsc = outs[3 * L : 4 * L] if quantized else None
    if quantized:
        strips, sstrips, in_sems, out_sems = refs[base + 2 * n_arr :]
    else:
        strips, in_sems, out_sems = refs[base + 2 * n_arr :]
        sstrips = None

    past = past_ref[0, 0]
    s0 = pl.multiple_of((past // W) * W, W)
    r = past - s0
    s0s = pl.multiple_of((past // 128) * 128, 128)   # scale strips (lane)
    rs = past - s0s

    def cache_slice(c, i):
        return c[i].at[:, :, pl.ds(s0, W), :]

    def scale_slice(c, i):
        return c[i].at[:, :, pl.ds(s0s, 128)]

    # 1) stream every strip in (2L or 4L concurrent DMAs)
    loads = []
    for li in range(L):
        for j, caches in enumerate((kc, vc)):
            dma = pltpu.make_async_copy(
                cache_slice(caches, li), strips.at[2 * li + j],
                in_sems.at[2 * li + j],
            )
            dma.start()
            loads.append(dma)
        if quantized:
            for j, caches in enumerate((ksc, vsc)):
                dma = pltpu.make_async_copy(
                    scale_slice(caches, li), sstrips.at[2 * li + j],
                    in_sems.at[2 * L + 2 * li + j],
                )
                dma.start()
                loads.append(dma)
    for dma in loads:
        dma.wait()

    # 2) masked row replace + write-back
    row_mask = (
        jax.lax.broadcasted_iota(jnp.int32, strips.shape[1:], 2) == r
    )
    if quantized:
        lane_mask = (
            jax.lax.broadcasted_iota(jnp.int32, sstrips.shape[1:], 2) == rs
        )
    stores = []
    for li in range(L):
        for j, (caches, new) in enumerate(((kc, nk_ref), (vc, nv_ref))):
            i = 2 * li + j
            strips[i] = jnp.where(row_mask, new[li], strips[i])
            dma = pltpu.make_async_copy(
                strips.at[i], cache_slice(caches, li), out_sems.at[i]
            )
            dma.start()
            stores.append(dma)
        if quantized:
            for j, (caches, new) in enumerate(
                ((ksc, nks_ref), (vsc, nvs_ref))
            ):
                i = 2 * li + j
                sstrips[i] = jnp.where(lane_mask, new[li], sstrips[i])
                dma = pltpu.make_async_copy(
                    sstrips.at[i], scale_slice(caches, li),
                    out_sems.at[2 * L + i],
                )
                dma.start()
                stores.append(dma)
    for dma in stores:
        dma.wait()


def commit_kv_cache(
    k_caches: tuple,      # L × [B, Hkv, S_max, D] (bf16 or int8)
    v_caches: tuple,
    new_k: jax.Array,     # [L, B, T=1, Hkv, D] bf16 rows (pre-quantization)
    new_v: jax.Array,
    past_len: jax.Array,  # scalar int32, or [B] per-slot cursors
    k_scales: "tuple | None" = None,   # L × [B, Hkv, S_max] f32
    v_scales: "tuple | None" = None,
    impl: str = "auto",
    interpret: bool = False,
):
    """Batched deferred commit: one kernel writes all layers' rows.

    Returns (k_caches, v_caches, k_scales, v_scales) as new tuples whose
    buffers alias the inputs (in place under jit with donated caches).
    ``impl='xla'`` falls back to per-layer dynamic-update-slices (CPU path,
    and the correctness oracle for the kernel).
    """
    L = len(k_caches)
    quantized = k_scales is not None
    per_slot = past_len.ndim == 1
    packed4 = k_caches[0].shape[-1] != new_k.shape[-1]
    dc = k_caches[0].shape[-1]                 # D, or D/2 for packed int4
    s_max = k_caches[0].shape[2]
    w = _commit_strip_w(k_caches[0].dtype, packed4)
    strip_ok = (
        dc % 128 == 0                          # lane-full VMEM strips
        and s_max % max(w, 128 if quantized else w) == 0
        and not per_slot                       # engine slots keep XLA DUS
    )
    if impl == "auto":
        # Measured on v5e (scripts/ab_decode.py, round 3): XLA's in-place
        # dynamic-update-slices beat the strip-RMW kernel by ~1 tok/s at 7B
        # (XLA masks sub-tile updates without the kernel's 8-row read-back).
        # The kernel stays available via tuning.commit_impl="pallas".
        impl = "xla"
    elif impl == "pallas" and not strip_ok:
        impl = "xla"                           # unsupported shape → oracle

    if impl == "xla":
        ks, vs, kss, vss = [], [], [], []
        for li in range(L):
            kcl, vcl, kscl, vscl = update_kv_cache(
                k_caches[li], v_caches[li], new_k[li], new_v[li], past_len,
                k_scales[li] if quantized else None,
                v_scales[li] if quantized else None,
            )
            ks.append(kcl)
            vs.append(vcl)
            kss.append(kscl)
            vss.append(vscl)
        return (
            tuple(ks), tuple(vs),
            tuple(kss) if quantized else None,
            tuple(vss) if quantized else None,
        )

    assert not per_slot, "pallas commit handles shared cursors only"
    b = new_k.shape[1]
    hkv = k_caches[0].shape[1]

    def bcast_rows(x):
        # [L, B, 1, Hkv, D'] → [L, B, Hkv, W, D']: new rows pre-broadcast
        # along the strip axis so the kernel's masked select needs no
        # in-kernel reshape/relayout (free: W·row bytes ≈ 1 MB)
        x = jnp.swapaxes(x, 2, 3)
        return jnp.broadcast_to(x, (L, b, hkv, w, x.shape[-1]))

    if quantized:
        quant = quantize_kv_rows4 if packed4 else quantize_kv_rows
        qk, sk = quant(new_k)                  # [L,B,1,Hkv,D(/2)], [L,B,1,Hkv]
        qv, sv = quant(new_v)
        nk = bcast_rows(qk)
        nv = bcast_rows(qv)
        # scale strips live along the LANE dim of [B, Hkv, S] → broadcast
        # the new scalar across a 128-lane strip
        nks = jnp.broadcast_to(
            jnp.swapaxes(sk, 2, 3), (L, b, hkv, 128)
        )
        nvs = jnp.broadcast_to(
            jnp.swapaxes(sv, 2, 3), (L, b, hkv, 128)
        )
        news = [nk, nv, nks, nvs]
    else:
        cd = k_caches[0].dtype
        nk = bcast_rows(new_k.astype(cd))
        nv = bcast_rows(new_v.astype(cd))
        news = [nk, nv]
    past_b = past_len.astype(jnp.int32).reshape(1, 1)

    caches = list(k_caches) + list(v_caches)
    if quantized:
        caches += list(k_scales) + list(v_scales)
    n_arr = len(caches)
    n_new = len(news)
    n_sems = 2 * L * (2 if quantized else 1)

    scratch = [pltpu.VMEM((2 * L, b, hkv, w, dc), k_caches[0].dtype)]
    if quantized:
        scratch.append(pltpu.VMEM((2 * L, b, hkv, 128), jnp.float32))
    scratch += [
        pltpu.SemaphoreType.DMA((n_sems,)),
        pltpu.SemaphoreType.DMA((n_sems,)),
    ]

    out = pl.pallas_call(
        functools.partial(
            _commit_kernel,
            n_layers=L,
            strip_w=w,
            quantized=quantized,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_new
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_arr,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_arr)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct(c.shape, c.dtype) for c in caches
        ),
        input_output_aliases={1 + n_new + i: i for i in range(n_arr)},
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(past_b, *news, *caches)

    ks = tuple(out[0:L])
    vs = tuple(out[L : 2 * L])
    kss = tuple(out[2 * L : 3 * L]) if quantized else None
    vss = tuple(out[3 * L : 4 * L]) if quantized else None
    return ks, vs, kss, vss


# ---------------------------------------------------------------------------
# XLA oracle path
# ---------------------------------------------------------------------------

def attend_xla(
    q: jax.Array,          # [B, T, H, D]
    k_cache: jax.Array,    # [B, Hkv, S_max, D]
    v_cache: jax.Array,
    past_len: jax.Array,   # scalar or [B]
    attend_len: int,
    input_mask: Optional[jax.Array] = None,  # [B, S_max] bool, True = valid
    k_scale: Optional[jax.Array] = None,     # [B, Hkv, S_max] f32
    v_scale: Optional[jax.Array] = None,
    new_kv: "Optional[tuple[jax.Array, jax.Array]]" = None,  # [B,1,Hkv,D] ×2
) -> jax.Array:
    b, t, h, d = q.shape
    hkv = k_cache.shape[1]
    g = h // hkv
    deferred = new_kv is not None
    if deferred:
        assert t == 1, "deferred-commit attend is a decode-only path"

    k = k_cache[:, :, :attend_len]
    v = v_cache[:, :, :attend_len]
    if k_cache.shape[-1] != d:                 # packed int4 KV (D/2 bytes)
        k = unpack_kv4(k, jnp.float32)
        v = unpack_kv4(v, jnp.float32)
    if k_scale is not None:
        k = (
            k.astype(jnp.float32) * k_scale[:, :, :attend_len, None]
        ).astype(q.dtype)
        v = (
            v.astype(jnp.float32) * v_scale[:, :, :attend_len, None]
        ).astype(q.dtype)

    qf = q.reshape(b, t, hkv, g, d)
    scale = 1.0 / (d ** 0.5)
    # scores [B, Hkv, G, T, S]
    scores = jnp.einsum(
        "bthgd,bhsd->bhgts", qf, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale

    s_pos = jnp.arange(attend_len, dtype=jnp.int32)    # [S]
    t_off = jnp.arange(t, dtype=jnp.int32)             # [T]
    if past_len.ndim == 1:
        t_pos = past_len[:, None] + t_off[None, :]     # [B, T]
        if deferred:  # position past holds stale data; own row comes below
            causal = s_pos[None, None, :] < t_pos[:, :, None]
        else:
            causal = s_pos[None, None, :] <= t_pos[:, :, None]  # [B, T, S]
        mask = causal[:, None, None, :, :]
    else:
        t_pos = past_len + t_off[:, None]              # [T, 1]
        if deferred:
            causal = s_pos[None, :] < t_pos            # [T, S]
        else:
            causal = s_pos[None, :] <= t_pos           # [T, S]
        mask = causal[None, None, None, :, :]
    if input_mask is not None:
        valid = input_mask[:, :attend_len][:, None, None, None, :]
        mask = jnp.logical_and(mask, valid)
    scores = jnp.where(mask, scores, NEG_INF)

    if deferred:
        # append the in-flight row: the query's own position, always valid
        kn = jnp.swapaxes(new_kv[0], 1, 2).astype(q.dtype)  # [B, Hkv, 1, D]
        vn = jnp.swapaxes(new_kv[1], 1, 2).astype(v.dtype)
        s_new = jnp.einsum(
            "bthgd,bhsd->bhgts", qf, kn, preferred_element_type=jnp.float32
        ) * scale
        scores = jnp.concatenate([scores, s_new], axis=-1)
        v = jnp.concatenate([v, vn], axis=2)

    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgts,bhsd->bthgd", probs, v)
    return out.reshape(b, t, h, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# Flash kernel (Pallas)
# ---------------------------------------------------------------------------

def _flash_kernel(
    past_ref,    # SMEM [B, 1] int32
    q_ref,       # [1, 1, R, D]    R = G * bq query rows for this kv head
    k_ref,       # [1, 1, bk, D]   bf16, or int8 with ks_ref scales
    v_ref,       # [1, 1, bk, D]
    ks_ref,      # [1, 1, 1, bk] f32 per-row K scales (int8 cache) or None
    vs_ref,      # [1, 1, 1, bk] f32 per-row V scales or None
    bias_ref,    # [1, 1, bk] f32 additive padding bias (0 / NEG) or None
    kn_ref,      # [1, 1, 1, D] bf16 in-flight K row (deferred commit) or None
    vn_ref,      # [1, 1, 1, D] bf16 in-flight V row or None
    o_ref,       # [1, 1, R, D]
    m_scr,       # [R, 128] f32
    l_scr,       # [R, 128] f32
    acc_scr,     # [R, D] f32
    *,
    g: int,
    bq: int,
    bk: int,
    t_total: int,
    scale: float,
    have_bias: bool,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    si = pl.program_id(3)
    r = q_ref.shape[2]
    deferred = kn_ref is not None

    @pl.when(si == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _MASK_VALUE)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    past = past_ref[b, 0]
    # query row r ↔ (t, g-slot): t = qi*bq + r // g; rows beyond T mask out
    t_of_row = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (r, bk), 0) // g
    # skip KV blocks fully above the causal diagonal of this q tile
    t_max = qi * bq + (r - 1) // g

    @pl.when(si * bk <= past + t_max - (1 if deferred else 0))
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        if k.shape[-1] != q.shape[-1]:  # packed int4 KV: D/2 bytes
            k = unpack_kv4(k)
        elif k.dtype == jnp.int8:
            k = k.astype(jnp.bfloat16)  # raw ints, exact in bf16 (<=127)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, bk]
        if ks_ref is not None:
            s = s * ks_ref[0, 0]        # [1, bk] f32 per-row K scales
        s = s * scale
        s_pos = si * bk + jax.lax.broadcasted_iota(jnp.int32, (r, bk), 1)
        if deferred:
            # cache position past holds stale data — the query's own row
            # arrives via kn/vn instead (deferred-commit decode)
            ok = (s_pos < past + t_of_row) & (t_of_row < t_total)
        else:
            ok = (s_pos <= past + t_of_row) & (t_of_row < t_total)
        s = jnp.where(ok, s, _MASK_VALUE)
        if have_bias:
            s = s + bias_ref[0, 0][None, :]

        m_prev = m_scr[:, :1]                            # [R, 1]
        m_curr = jnp.max(s, axis=1, keepdims=True)       # [R, 1]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)                 # [R, 1]
        p = jnp.exp(s - m_next)                          # [R, bk]
        l_next = alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[:] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_next, l_scr.shape)
        v = v_ref[0, 0]
        if v.dtype == jnp.int8:
            # fold the per-row V scale into p before the contraction
            p = p * vs_ref[0, 0]
            v = (
                unpack_kv4(v)
                if v.shape[-1] != q_ref.shape[-1]   # packed int4 KV
                else v.astype(jnp.bfloat16)
            )
        o_curr = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )  # [R, D]
        acc_scr[:] = acc_scr[:] * alpha + o_curr

    @pl.when(si == pl.num_programs(3) - 1)
    def _():
        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        acc = acc_scr[:]
        if deferred:
            # fold in the in-flight row (the query's own position); always
            # causally valid for every real query row of a T=1 step. An
            # all-masked main loop leaves m_prev = _MASK_VALUE, whose alpha
            # underflows to exactly 0 — the garbage accumulator drops out.
            q = q_ref[0, 0]
            kn = kn_ref[0, 0]                            # [1, D]
            # N=1 dot lowers as broadcast-mul-reduce on Mosaic; the mixed
            # bf16->f32 broadcast fails verification, so do the f32
            # elementwise form explicitly (same f32 accumulation).
            s_new = jnp.sum(
                q.astype(jnp.float32) * kn.astype(jnp.float32),
                axis=1, keepdims=True,
            ) * scale                                    # [R, 1]
            m_fin = jnp.maximum(m_prev, s_new)
            alpha = jnp.exp(m_prev - m_fin)
            p_new = jnp.exp(s_new - m_fin)               # [R, 1]
            l_prev = alpha * l_prev + p_new
            vn = vn_ref[0, 0].astype(jnp.float32)        # [1, D]
            acc = acc * alpha + p_new * vn
        l = jnp.where(l_prev == 0.0, 1.0, l_prev)
        o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _q_tile_rows(r_total: int, g: int, full_max: int) -> tuple[int, int]:
    """Pick the query-tile row count rt and any row padding needed.

    rt must divide the (padded) row total, be a multiple of g (the
    row→(t, g-slot) mapping must stay tile-local) AND of 8 (Mosaic sublane
    legality — an odd prompt length like benchmark.py's 1919 would
    otherwise force an illegal 101-row block), unless it equals the whole
    row dim (full-dimension legality). Returns (rt, pad_rows); padded rows
    carry zero queries and are sliced off by the caller.
    """
    import math

    if r_total <= full_max:
        return r_total, 0
    unit = math.lcm(8, g)
    tgt = max(unit, (512 // unit) * unit)
    cand = tgt
    while cand >= unit and r_total % cand:
        cand -= unit
    if cand >= unit and r_total % cand == 0:
        return cand, 0
    return tgt, -r_total % tgt


@functools.partial(
    jax.jit,
    static_argnames=("attend_len", "t_total", "g", "interpret"),
)
def _attend_flash_padded(
    qr: jax.Array,        # [B, Hkv, R_total, D] query rows grouped by kv head
    k_cache: jax.Array,   # [B, Hkv, S_max, D]
    v_cache: jax.Array,
    past_b: jax.Array,    # [B, 1] int32
    bias: Optional[jax.Array],  # [B, S_max] f32 or None
    k_scale: Optional[jax.Array],  # [B, Hkv, 1, S_max] f32 or None
    v_scale: Optional[jax.Array],
    k_new: Optional[jax.Array] = None,  # [B, Hkv, 1, D] in-flight row
    v_new: Optional[jax.Array] = None,
    *,
    attend_len: int,
    t_total: int,
    g: int,
    interpret: bool,
):
    b, hkv, r_total, d = qr.shape
    # kv block: lane-legal divisors of attend_len (bk % 128 == 0 unless
    # bk == attend_len). Decode (few query rows) wants the largest block —
    # one grid step per kv head streams its whole strip at HBM speed
    # (measured 688 GB/s at bk=2048 vs 407 at bk=512 on v5e); prefill wants
    # moderate blocks so causal tile-skipping stays effective.
    cands = DECODE_BK_CANDS if r_total <= 32 else (
        1024, 512, 384, 256, 128)
    bk = attend_len
    for cand in cands:
        if attend_len % cand == 0:
            bk = cand
            break
    assert attend_len % bk == 0
    # q rows per tile: all rows at decode; ~512-row tile-legal tiles at
    # prefill (see _q_tile_rows; padded rows are fully masked via t_total)
    rt, pad_rows = _q_tile_rows(r_total, g, full_max=256)
    if pad_rows:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, pad_rows), (0, 0)))
        r_total += pad_rows
    bq = rt // g
    grid = (b, hkv, r_total // rt, attend_len // bk)

    kernel = functools.partial(
        _flash_kernel,
        g=g,
        bq=bq,
        bk=bk,
        t_total=t_total,
        scale=1.0 / (d ** 0.5),
        have_bias=bias is not None,
    )
    dk = k_cache.shape[-1]      # D, or D/2 for packed int4 caches
    in_specs = [
        pl.BlockSpec((1, 1, rt, d), lambda b, h, qi, si, *_: (b, h, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, dk), lambda b, h, qi, si, *_: (b, h, si, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, dk), lambda b, h, qi, si, *_: (b, h, si, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qr, k_cache, v_cache]
    have_scales = k_scale is not None
    if have_scales:
        for sc in (k_scale, v_scale):
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, 1, bk), lambda b, h, qi, si, *_: (b, h, 0, si),
                    memory_space=pltpu.VMEM,
                )
            )
            args.append(sc)
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, h, qi, si, *_: (b, 0, si),
                         memory_space=pltpu.VMEM)
        )
        args.append(bias)
    have_new = k_new is not None
    if have_new:
        assert t_total == 1, "deferred-commit attend is a decode-only path"
        for nr in (k_new, v_new):
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, 1, d), lambda b, h, qi, si, *_: (b, h, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            args.append(nr)

    def kern(past_ref, q_ref, k_ref, v_ref, *rest):
        rest = list(rest)
        ks_ref = vs_ref = bias_ref = kn_ref = vn_ref = None
        if have_scales:
            ks_ref = rest.pop(0)
            vs_ref = rest.pop(0)
        if bias is not None:
            bias_ref = rest.pop(0)
        if have_new:
            kn_ref = rest.pop(0)
            vn_ref = rest.pop(0)
        o_ref, m, l, acc = rest
        return kernel(past_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                      bias_ref, kn_ref, vn_ref, o_ref, m, l, acc)

    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, rt, d), lambda b, h, qi, si, *_: (b, h, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((rt, 128), jnp.float32),
                pltpu.VMEM((rt, 128), jnp.float32),
                pltpu.VMEM((rt, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, r_total, d), qr.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(past_b, *args)


def _flash_prefill_kernel(
    past_ref,    # SMEM [B, 1] int32
    q_ref,       # [1, 1, rt, D]
    k_ref,       # [1, 1, L, D] — the WHOLE attend strip for this kv head
    v_ref,       # [1, 1, L, D]
    ks_ref,      # [1, 1, 1, L] f32 per-row K scales (int8/int4 cache) or None
    vs_ref,      # [1, 1, 1, L] f32 per-row V scales or None
    bias_ref,    # [1, 1, L] f32 additive padding bias or None
    o_ref,       # [1, 1, rt, D]
    *,
    g: int,
    bq: int,
    bk: int,
    scale: float,
    have_bias: bool,
):
    """Prefill-shaped flash attention: one grid step per (batch, kv head,
    query tile); the KV loop runs INSIDE the kernel with (m, l, acc) carried
    as loop values instead of VMEM scratch, split into an unmasked pass over
    fully-visible KV blocks and a masked pass over the causal boundary.

    Vs. the generic ``_flash_kernel`` (grid over KV blocks + scratch): no
    [rt, 128] m/l broadcast stores per block, no iota/compare/where on the
    ~half of blocks strictly below the diagonal, and the K/V strips DMA once
    per head (the block index map ignores the query-tile grid axis, so
    consecutive qi steps reuse the resident strip). Decode, deferred-commit
    and tiny-T paths stay on the generic kernel.
    """
    b = pl.program_id(0)
    qi = pl.program_id(2)
    rt = q_ref.shape[2]
    l_strip = k_ref.shape[2]
    n_blocks = l_strip // bk
    past = past_ref[b, 0]

    q = q_ref[0, 0]
    dk = k_ref.shape[3]
    packed4 = dk != q.shape[-1]
    int8kv = (not packed4) and k_ref.dtype == jnp.int8

    t_min = qi * bq
    t_max = qi * bq + (rt - 1) // g
    # rows' absolute positions (cache index of each query row's own token)
    t_of_row = past + t_min + (
        jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0) // g
    )  # [rt, 1]
    # blocks fully inside every row's visible prefix [0, past + t_min]
    n_full = jnp.maximum(
        jnp.minimum((past + t_min + 1) // bk, n_blocks), 0
    )
    # blocks touching any visible position (the causal boundary fan)
    n_tot = jnp.minimum((past + t_max) // bk + 1, n_blocks)

    m0 = jnp.full((rt, 1), _MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((rt, 1), jnp.float32)
    acc0 = jnp.zeros((rt, q.shape[-1]), jnp.float32)

    def load_kv(i):
        off = pl.multiple_of(i * bk, bk)
        k = k_ref[0, 0, pl.ds(off, bk), :]
        v = v_ref[0, 0, pl.ds(off, bk), :]
        if packed4:
            k = unpack_kv4(k)
            v = unpack_kv4(v)
        elif int8kv:
            k = k.astype(jnp.bfloat16)
            v = v.astype(jnp.bfloat16)
        return off, k, v

    def block(i, carry, masked):
        m_prev, l_prev, acc = carry
        off, k, v = load_kv(i)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rt, bk]
        if ks_ref is not None:
            s = s * ks_ref[0, 0, :, pl.ds(off, bk)]
        s = s * scale
        if have_bias:
            s = s + bias_ref[0, 0, pl.ds(off, bk)][None, :]
        if masked:
            s_pos = off + jax.lax.broadcasted_iota(
                jnp.int32, (rt, bk), 1
            )
            s = jnp.where(s_pos <= t_of_row, s, _MASK_VALUE)
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        if vs_ref is not None:
            p = p * vs_ref[0, 0, :, pl.ds(off, bk)]
        o_curr = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return m_next, l_next, acc * alpha + o_curr

    carry = jax.lax.fori_loop(
        0, n_full, lambda i, c: block(i, c, masked=False),
        (m0, l0, acc0),
    )
    m_fin, l_fin, acc = jax.lax.fori_loop(
        n_full, n_tot, lambda i, c: block(i, c, masked=True), carry
    )
    l_fin = jnp.where(l_fin == 0.0, 1.0, l_fin)
    o_ref[0, 0] = (acc / l_fin).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("attend_len", "g", "interpret"),
)
def _attend_flash_prefill(
    qr: jax.Array,        # [B, Hkv, R_total, D]
    k_cache: jax.Array,   # [B, Hkv, S_max, D]
    v_cache: jax.Array,
    past_b: jax.Array,    # [B, 1] int32
    bias: Optional[jax.Array],     # [B, 1, S_max-sliced] f32 or None
    k_scale: Optional[jax.Array],  # [B, Hkv, 1, S_max] f32 or None
    v_scale: Optional[jax.Array],
    *,
    attend_len: int,
    g: int,
    interpret: bool,
):
    b, hkv, r_total, d = qr.shape
    # KV block size for the in-kernel loop: big enough to amortize loop
    # overhead, small enough that the causal boundary pass stays tight.
    bk = attend_len
    for cand in (512, 384, 256, 128):
        if attend_len % cand == 0:
            bk = cand
            break
    # query tile: ~512 rows, tile-legal (see _q_tile_rows). Padded rows
    # carry zero queries — their outputs are finite garbage the caller
    # slices off (no t_total mask needed in the unmasked pass).
    rt, pad_rows = _q_tile_rows(r_total, g, full_max=512)
    if pad_rows:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, pad_rows), (0, 0)))
        r_total += pad_rows
    bq = rt // g
    grid = (b, hkv, r_total // rt)

    kernel = functools.partial(
        _flash_prefill_kernel,
        g=g,
        bq=bq,
        bk=bk,
        scale=1.0 / (d ** 0.5),
        have_bias=bias is not None,
    )
    dk = k_cache.shape[-1]
    in_specs = [
        pl.BlockSpec((1, 1, rt, d), lambda b, h, qi, *_: (b, h, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, attend_len, dk),
                     lambda b, h, qi, *_: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, attend_len, dk),
                     lambda b, h, qi, *_: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qr, k_cache, v_cache]
    have_scales = k_scale is not None
    if have_scales:
        for sc in (k_scale, v_scale):
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, 1, attend_len),
                    lambda b, h, qi, *_: (b, h, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            args.append(sc)
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, attend_len),
                         lambda b, h, qi, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(bias)

    def kern(past_ref, q_ref, k_ref, v_ref, *rest):
        rest = list(rest)
        ks_ref = vs_ref = bias_ref = None
        if have_scales:
            ks_ref = rest.pop(0)
            vs_ref = rest.pop(0)
        if bias is not None:
            bias_ref = rest.pop(0)
        (o_ref,) = rest
        return kernel(past_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                      bias_ref, o_ref)

    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, rt, d), lambda b, h, qi, *_: (b, h, qi, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, r_total, d), qr.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(past_b, *args)


# query tiles at/above this row count take the prefill-shaped kernel
PREFILL_KERNEL_MIN_ROWS = 256


def attend_flash(
    q: jax.Array,          # [B, T, H, D]
    k_cache: jax.Array,    # [B, Hkv, S_max, D]
    v_cache: jax.Array,
    past_len: jax.Array,
    attend_len: int,
    input_mask: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,   # [B, Hkv, S_max] f32
    v_scale: Optional[jax.Array] = None,
    new_kv: "Optional[tuple[jax.Array, jax.Array]]" = None,  # [B,1,Hkv,D] ×2
    interpret: bool = False,
) -> jax.Array:
    b, t, h, d = q.shape
    hkv = k_cache.shape[1]
    g = h // hkv

    # group query rows by kv head: row index = t*g + g_slot
    qr = q.reshape(b, t, hkv, g, d).transpose(0, 2, 1, 3, 4)
    qr = qr.reshape(b, hkv, t * g, d)
    r_total = t * g
    pad_r = 0
    if r_total < 8:
        pad_r = 8 - r_total
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, pad_r), (0, 0)))
        r_total = 8

    past_b = jnp.broadcast_to(
        past_len.astype(jnp.int32).reshape(-1, 1), (b, 1)
    )
    bias = None
    if input_mask is not None:
        bias = jnp.where(
            input_mask[:, :attend_len], jnp.float32(0), jnp.float32(NEG_INF)
        )[:, None, :]  # [B, 1, S] — sublane-legal blocks for any B

    # [B, Hkv, S] → [B, Hkv, 1, S]: the singleton sublane axis makes the
    # kernel's (1, 1, 1, bk) scale blocks Mosaic-legal (see verify skill).
    ks4 = None if k_scale is None else k_scale[:, :, None, :]
    vs4 = None if v_scale is None else v_scale[:, :, None, :]
    k_new = v_new = None
    if new_kv is not None:
        k_new = jnp.swapaxes(new_kv[0], 1, 2).astype(q.dtype)  # [B,Hkv,1,D]
        v_new = jnp.swapaxes(new_kv[1], 1, 2).astype(q.dtype)
    # the prefill kernel holds the whole K and V strips in VMEM (double
    # buffered): cap the strip length so long-context chunked prefill
    # (32k+) stays on the generic blocked kernel
    strip_ok = attend_len * k_cache.shape[-1] * k_cache.dtype.itemsize \
        <= 4 * 1024 * 1024
    if new_kv is None and pad_r == 0 and strip_ok \
            and t * g >= PREFILL_KERNEL_MIN_ROWS:
        out = _attend_flash_prefill(
            qr, k_cache, v_cache, past_b, bias, ks4, vs4,
            attend_len=attend_len, g=g, interpret=interpret,
        )
    else:
        out = _attend_flash_padded(
            qr, k_cache, v_cache, past_b, bias, ks4, vs4, k_new, v_new,
            attend_len=attend_len, t_total=t, g=g, interpret=interpret,
        )
    out = out[:, :, : t * g, :]
    out = out.reshape(b, hkv, t, g, d).transpose(0, 2, 1, 3, 4)
    return out.reshape(b, t, h, d)


def attend(
    q: jax.Array,          # [B, T, H, D]
    k_cache: jax.Array,    # [B, Hkv, S_max, D]
    v_cache: jax.Array,    # [B, Hkv, S_max, D]
    past_len: jax.Array,   # scalar or [B]: queries are at positions past_len+t
    attend_len: int,       # static: read cache[:, :, :attend_len]
    input_mask: Optional[jax.Array] = None,  # [B, S_max] bool, True = valid
    impl: str = "auto",
    k_scale: Optional[jax.Array] = None,     # [B, Hkv, S_max] f32 (int8 KV)
    v_scale: Optional[jax.Array] = None,
    new_kv: "Optional[tuple[jax.Array, jax.Array]]" = None,  # [B,1,Hkv,D] ×2
) -> jax.Array:
    """Masked causal GQA attention. Returns [B, T, H, D] in q.dtype.

    Causality: query t attends to cache position s iff s <= past_len + t
    (and s < attend_len, and input_mask[b, s] if given — the reference's
    left-padding mask for batched generation, model.py:1014-1033).
    A [B]-shaped past_len gives each row its own cursor (continuous
    batching slots). int8 caches pass per-row scales; both impls dequantize
    on the fly (the kernel inside its KV tiles).

    ``new_kv`` enables deferred-commit decode (T=1): the current token's
    K/V rows are NOT yet in the cache — position past_len is masked out and
    the in-flight rows are folded into the online softmax instead. The
    caller batches all layers' cache writes into one commit per step
    (commit_kv_cache), replacing 2·L dynamic-update-slice ops.
    """
    if impl == "auto":
        # flash kernel needs a lane-legal D; odd head dims (e.g. 100 on
        # OpenLlama-3B) take the einsum path
        flash_ok = flash_supported_head_dim(q.shape[-1])
        impl = (
            "flash"
            if jax.default_backend() == "tpu" and flash_ok
            else "xla"
        )
    if impl == "xla":
        return attend_xla(
            q, k_cache, v_cache, past_len, attend_len, input_mask,
            k_scale, v_scale, new_kv,
        )
    if impl == "flash":
        return attend_flash(
            q, k_cache, v_cache, past_len, attend_len, input_mask,
            k_scale, v_scale, new_kv,
        )
    if impl == "flash_interpret":
        return attend_flash(
            q, k_cache, v_cache, past_len, attend_len, input_mask,
            k_scale, v_scale, new_kv, interpret=True,
        )
    raise ValueError(f"unknown attention impl: {impl}")
