"""Fused decode layer tail: flash attention + o-projection + residual —
optionally continuing straight through the MLP block — in ONE Pallas kernel.

TPU-native analogue of the reference's q4_attn + q4_mlp megakernels
(exllama_ext/cuda_func/q4_attn.cu:74-204, q4_mlp.cu:100-199), which fuse
whole blocks to cut launch count. Decode (T=1, deferred KV commit) runs a
phased 1-D grid:

  phase C (B·Hkv·n_sk steps): per-(batch, kv-head) online-softmax strips
      over the KV cache — same math as ops/attention's flash kernel
      restricted to T=1 deferred decode — each finished strip's normalized
      [G, D] head outputs parked in a VMEM scratch holding the flat
      [B, H·D] attention result.
  phase D (N/bn_o steps): npair q4 GEMV of that scratch against o-proj
      column blocks, residual added. Without MLP fusion this writes the
      kernel output; with it, a VMEM scratch h' instead.
  phase E (N_gu/bn_a steps, MLP only): post-norm of h' (prologue), then
      gate/up GEMV partials into scratch.
  boundary + phase F (N_down/bn_f steps): mid = silu(gate)·up, then the
      down GEMV with the h' residual added in the epilogue → output.

Clamped index maps pin every inactive phase's operands, so each weight
block and KV strip streams exactly once, and the next phase's first block
prefetches while the current phase computes. Numerics match the separate-
kernel path operation-for-operation.

Applies on the deferred-commit decode path; prefill, odd head dims, LoRA,
and act-order keep the separate kernels. Hidden sizes that are not a
multiple of N_ALIGN (33B's 6656) run with the residual stream zero-padded
to the npair width — padded scale columns dequant to exact 0, so padding
stays 0 end-to-end and the wrappers slice it off.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exllama_tpu.formats.gptq import N_ALIGN, PAIR_HALF, QuantTensor
from exllama_tpu.ops.attention import NEG_INF, _MASK_VALUE
from exllama_tpu.ops.mlp import (
    GEMV_MAX_M,
    _npair_gemv_partials,
    _pick_bn,
    _rms_norm_into,
    _silu_boundary,
)


def _select_row(scr, col_off, width, row_idx, batch):
    """``scr[row_idx, col_off:col_off+width]`` as a [1, width] vector.

    Mosaic cannot prove a dynamic sublane offset is tile-aligned, so
    vector loads at ``pl.ds(row_idx, 1)`` fail to compile for traced
    row_idx (round-3 canary). batch == 1 keeps the static fast path; the
    general case reads the whole row block and reduces with a one-hot mask
    (exact: f32 holds bf16 values losslessly and all other rows are 0)."""
    if batch == 1:
        return scr[pl.ds(0, 1), pl.ds(col_off, width)]
    blk = scr[:, pl.ds(col_off, width)]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (blk.shape[0], 1), 0) == row_idx
    )
    return jnp.sum(
        jnp.where(onehot, blk.astype(jnp.float32), 0.0),
        axis=0, keepdims=True,
    ).astype(blk.dtype)


def _store_row(scr, col_off, width, row_idx, value, batch):
    """Store ``value`` [1, width] into scr row ``row_idx`` — the write-side
    companion of :func:`_select_row` (masked read-modify-write for traced
    row indices)."""
    if batch == 1:
        scr[pl.ds(0, 1), pl.ds(col_off, width)] = value.astype(scr.dtype)
        return
    blk = scr[:, pl.ds(col_off, width)]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (blk.shape[0], 1), 0) == row_idx
    )
    scr[:, pl.ds(col_off, width)] = jnp.where(
        onehot, value.astype(scr.dtype), blk
    )


def _layer_tail_kernel(
    past_ref,    # SMEM [B, 1] int32 (scalar-prefetch)
    q_ref,       # [1, 1, R, D] query rows of this (b, kv-head); R = pad(G)
                 # (None with have_qkv — q comes from qkv_scr instead)
    k_ref,       # [1, 1, bk, D] bf16 | int8
    v_ref,       # [1, 1, bk, D]
    ks_ref,      # [1, 1, 1, bk] f32 per-row K scales (int8 KV) or None
    vs_ref,      # [1, 1, 1, bk] f32
    bias_ref,    # [1, 1, bk] f32 left-pad bias or None
    kn_ref,      # [1, 1, 1, D] in-flight K row (deferred commit;
    vn_ref,      # [1, 1, 1, D]  None with have_qkv — read from qkv_scr)
    h_ref,       # [bm, K1] bf16 residual stream (whole)
    oq_ref,      # [K1/4, bn_o/2] int32 npair o-proj block (phase D)
    os_ref,      # [1, K1/gs, bn_o]
    oz_ref,      # [1, K1/gs, bn_o]
    # qkv refs (have_qkv only — phase B):
    iw_ref,      # [1, K1] input (pre-attention) norm weight
    qkvq_ref,    # [K1/4, bn_b/2] int32 npair fused-qkv block
    qkvs_ref,    # [1, K1/gs, bn_b]
    qkvz_ref,
    sin_ref,     # [bm, D] f32 per-row rope tables (position past_b[row])
    cos_ref,
    # MLP refs (have_mlp only):
    nw_ref,      # [1, K1] post-attention norm weight
    guq_ref,     # [K1/4, bn_a/2] gate/up block (phase E)
    gus_ref,     # [1, K1/gs, bn_a]
    guz_ref,
    dq_ref,      # [K2/4, bn_f/2] down block (phase F)
    ds_ref,      # [1, K2/gs, bn_f]
    dz_ref,
    out_ref,     # [bm, bn_o] (attn-only) | [bm, bn_f] (with MLP)
    kn_out,      # [bm, Hkv*D] bf16 post-rope K row (have_qkv only) | None
    vn_out,      # [bm, Hkv*D] bf16 V row                           | None
    m_scr,       # [R, 128] f32
    l_scr,       # [R, 128] f32
    acc_scr,     # [R, D] f32
    attn_scr,    # [bm, K1] bf16 flat attention output (head-major)
    # qkv scratches (have_qkv only):
    xn0_scr,     # [bm, K1] bf16 input-normed h
    qkv_scr,     # [bm, N_qkv] bf16 fused-qkv GEMV output (post-rope q/k)
    # MLP scratches (have_mlp only):
    h_scr,       # [bm, K1] bf16 post-attention residual h'
    xn_scr,      # [bm, K1] bf16 normed h'
    gu_scr,      # [bm, N_gu] f32
    mid_scr,     # [bm, K2] bf16
    *,
    g: int,
    d: int,
    hkv: int,
    n_sk: int,
    steps_b: int,
    steps_c: int,
    steps_d: int,
    steps_e: int,
    bn_a: int,
    inter: int,
    gu_half_cols: int,
    eps: float,
    scale: float,
    groupsize: int,
    have_bias: bool,
    have_mlp: bool,
    heads: int,
    nq_pad: int,
    nkv_pad: int,
    batch: int,
    a8: bool = False,
    a8x2: bool = False,
):
    t = pl.program_id(0)
    have_qkv = qkv_scr is not None
    # phase C decomposition: (t - steps_b) = (b * hkv + h) * n_sk + si.
    # Clamp below at 0: during phase-B steps tc is negative and a negative
    # b_idx would drive an out-of-bounds SMEM read of past_ref (the value
    # is unused there, but Mosaic does not bounds-check dynamic indices).
    tc = jnp.maximum(t - steps_b, 0)
    bh = tc // n_sk
    si = tc % n_sk
    # batch == 1 pins b_idx statically — scratch row reads/stores then use
    # plain aligned offsets instead of the masked _select_row/_store_row
    b_idx = 0 if batch == 1 else bh // hkv
    h_idx = bh % hkv
    bk = k_ref.shape[2]
    off_c = steps_b
    off_d = steps_b + steps_c
    off_e = off_d + steps_d
    off_f = off_e + steps_e

    if have_qkv:
        @pl.when(t == 0)
        def _():
            # phase B prologue: xn0 = rms_norm(h)·input_norm (shared with
            # the fused-MLP kernel — ops/mlp._rms_norm_into)
            _rms_norm_into(h_ref, iw_ref, eps, xn0_scr)

        @pl.when(t < steps_b)
        def _():
            # phase B: fused-qkv GEMV column blocks into qkv_scr
            j = t
            b8 = pltpu.bitcast(qkvq_ref[:], jnp.int8)
            s = qkvs_ref[0].astype(jnp.float32)
            z = qkvz_ref[0].astype(jnp.float32)
            acc_lo, acc_hi = _npair_gemv_partials(
                xn0_scr[:], b8, s, z, groupsize, a8=a8, a8x2=a8x2
            )
            bn_b = qkvq_ref.shape[1] * 2
            base = pl.multiple_of(j * bn_b, bn_b)
            for sub in range(len(acc_lo)):
                qkv_scr[
                    :, pl.ds(base + sub * N_ALIGN, PAIR_HALF)
                ] = acc_lo[sub].astype(qkv_scr.dtype)
                qkv_scr[
                    :, pl.ds(base + sub * N_ALIGN + PAIR_HALF, PAIR_HALF)
                ] = acc_hi[sub].astype(qkv_scr.dtype)

        @pl.when(t == steps_b - 1)
        def _():
            # phase B epilogue: rope on the q and k head blocks (the same
            # f32 math and bf16 cast chain as ops/rope.apply_rope_sliced on
            # the separate-kernel path), then emit the committed K/V rows.
            sin = sin_ref[:]                      # [bm, D] f32
            cos = cos_ref[:]
            half = d // 2

            def rope_head(base):
                x = qkv_scr[:, pl.ds(base, d)].astype(jnp.float32)
                x1 = x[:, :half]
                x2 = x[:, half:]
                rot = jnp.concatenate([-x2, x1], axis=1)
                qkv_scr[:, pl.ds(base, d)] = (
                    x * cos + rot * sin
                ).astype(qkv_scr.dtype)

            for j in range(heads):
                rope_head(j * d)
            for j in range(hkv):
                rope_head(nq_pad + j * d)
            kn_out[:] = qkv_scr[:, pl.ds(nq_pad, hkv * d)]
            vn_out[:] = qkv_scr[:, pl.ds(nq_pad + nkv_pad, hkv * d)]

    def q_tile():
        # [R, D] query rows of (b_idx, kv-head h_idx): g real rows from the
        # qkv scratch (R - g zero rows pad the sublane tile)
        if not have_qkv:
            return q_ref[0, 0]
        r = m_scr.shape[0]
        rows = [
            _select_row(
                qkv_scr, pl.multiple_of((h_idx * g + j) * d, d), d,
                b_idx, batch,
            ).astype(jnp.bfloat16)
            for j in range(g)
        ]
        if r > g:
            rows.append(jnp.zeros((r - g, d), jnp.bfloat16))
        return jnp.concatenate(rows, axis=0)

    def kn_row():
        if not have_qkv:
            return kn_ref[0, 0]
        return _select_row(
            qkv_scr, pl.multiple_of(nq_pad + h_idx * d, d), d, b_idx, batch
        ).astype(jnp.bfloat16)

    def vn_row():
        if not have_qkv:
            return vn_ref[0, 0]
        return _select_row(
            qkv_scr, pl.multiple_of(nq_pad + nkv_pad + h_idx * d, d), d,
            b_idx, batch,
        ).astype(jnp.bfloat16)

    @pl.when((t >= off_c) & (t < off_d) & (si == 0))
    def _():
        m_scr[:] = jnp.full_like(m_scr, _MASK_VALUE)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    past = past_ref[jnp.minimum(b_idx, past_ref.shape[0] - 1), 0]

    @pl.when((t >= off_c) & (t < off_d) & (si * bk < past))
    def _():
        q = q_tile()
        k = k_ref[0, 0]
        if k.shape[-1] != d:        # packed int4 KV (D/2 bytes)
            from exllama_tpu.ops.attention import unpack_kv4

            k = unpack_kv4(k)
        elif k.dtype == jnp.int8:
            k = k.astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, bk]
        if ks_ref is not None:
            s = s * ks_ref[0, 0]
        s = s * scale
        s_pos = si * bk + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        # deferred commit: cache position `past` holds stale data — the
        # query's own row folds in at strip end via kn/vn
        s = jnp.where(s_pos < past, s, _MASK_VALUE)
        if have_bias:
            s = s + bias_ref[0, 0][None, :]
        m_prev = m_scr[:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_scr[:] = jnp.broadcast_to(
            alpha * l_scr[:, :1] + jnp.sum(p, axis=1, keepdims=True),
            l_scr.shape,
        )
        m_scr[:] = jnp.broadcast_to(m_next, m_scr.shape)
        v = v_ref[0, 0]
        if v.dtype == jnp.int8:
            p = p * vs_ref[0, 0]
            if v.shape[-1] != d:    # packed int4 KV
                from exllama_tpu.ops.attention import unpack_kv4

                v = unpack_kv4(v)
            else:
                v = v.astype(jnp.bfloat16)
        acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when((t >= off_c) & (t < off_d) & (si == n_sk - 1))
    def _():
        # fold the in-flight row (always causally valid at T=1), normalize,
        # and park this head's rows in the flat attention scratch
        q = q_tile()
        kn = kn_row()
        # N=1 dot lowers as broadcast-mul-reduce on Mosaic; the mixed
        # bf16->f32 broadcast fails verification, so do the f32
        # elementwise form explicitly (same f32 accumulation).
        s_new = jnp.sum(
            q.astype(jnp.float32) * kn.astype(jnp.float32),
            axis=1, keepdims=True,
        ) * scale                                    # [R, 1]
        m_prev = m_scr[:, :1]
        m_fin = jnp.maximum(m_prev, s_new)
        alpha = jnp.exp(m_prev - m_fin)
        p_new = jnp.exp(s_new - m_fin)
        l_fin = alpha * l_scr[:, :1] + p_new
        vn = vn_row().astype(jnp.float32)
        acc = acc_scr[:] * alpha + p_new * vn
        l = jnp.where(l_fin == 0.0, 1.0, l_fin)
        rows = (acc / l).astype(attn_scr.dtype)      # [R, D]
        base = pl.multiple_of(h_idx * (g * d), d)
        for j in range(g):
            _store_row(
                attn_scr, pl.multiple_of(base + j * d, d), d, b_idx,
                rows[j : j + 1, :], batch,
            )

    @pl.when((t >= off_d) & (t < off_e))
    def _():
        # o-projection + residual: → output (attn-only) or h' scratch (MLP)
        j = t - off_d
        b8 = pltpu.bitcast(oq_ref[:], jnp.int8)
        s = os_ref[0].astype(jnp.float32)
        z = oz_ref[0].astype(jnp.float32)
        acc_lo, acc_hi = _npair_gemv_partials(
            attn_scr[:], b8, s, z, groupsize, a8=a8, a8x2=a8x2
        )
        bn_o = oq_ref.shape[1] * 2
        base = pl.multiple_of(j * bn_o, bn_o)
        for sub in range(len(acc_lo)):
            res_lo = h_ref[:, pl.ds(base + sub * N_ALIGN, PAIR_HALF)]
            res_hi = h_ref[
                :, pl.ds(base + sub * N_ALIGN + PAIR_HALF, PAIR_HALF)
            ]
            row_lo = res_lo + acc_lo[sub].astype(h_ref.dtype)
            row_hi = res_hi + acc_hi[sub].astype(h_ref.dtype)
            if have_mlp:
                h_scr[:, pl.ds(base + sub * N_ALIGN, PAIR_HALF)] = row_lo
                h_scr[
                    :, pl.ds(base + sub * N_ALIGN + PAIR_HALF, PAIR_HALF)
                ] = row_hi
            else:
                lo_c = slice(sub * N_ALIGN, sub * N_ALIGN + PAIR_HALF)
                hi_c = slice(sub * N_ALIGN + PAIR_HALF, (sub + 1) * N_ALIGN)
                out_ref[:, lo_c] = row_lo
                out_ref[:, hi_c] = row_hi

    if not have_mlp:
        return

    @pl.when(t == off_e)
    def _():
        # MLP prologue (shared with ops/mlp._q4_mlp_kernel)
        _rms_norm_into(h_scr, nw_ref, eps, xn_scr)

    @pl.when((t >= off_e) & (t < off_f))
    def _():
        j = t - off_e
        b8 = pltpu.bitcast(guq_ref[:], jnp.int8)
        s = gus_ref[0].astype(jnp.float32)
        z = guz_ref[0].astype(jnp.float32)
        acc_lo, acc_hi = _npair_gemv_partials(
            xn_scr[:], b8, s, z, groupsize, a8=a8, a8x2=a8x2
        )
        base = pl.multiple_of(j * bn_a, bn_a)
        for sub in range(len(acc_lo)):
            gu_scr[:, pl.ds(base + sub * N_ALIGN, PAIR_HALF)] = acc_lo[sub]
            gu_scr[
                :, pl.ds(base + sub * N_ALIGN + PAIR_HALF, PAIR_HALF)
            ] = acc_hi[sub]

    @pl.when(t == off_f)
    def _():
        # mid = silu(gate)·up (shared with ops/mlp._q4_mlp_kernel)
        _silu_boundary(gu_scr, inter, gu_half_cols, mid_scr)

    @pl.when(t >= off_f)
    def _():
        j = t - off_f
        b8 = pltpu.bitcast(dq_ref[:], jnp.int8)
        s = ds_ref[0].astype(jnp.float32)
        z = dz_ref[0].astype(jnp.float32)
        acc_lo, acc_hi = _npair_gemv_partials(
            mid_scr[:], b8, s, z, groupsize, a8=a8, a8x2=a8x2
        )
        bn_f = dq_ref.shape[1] * 2
        base = pl.multiple_of(j * bn_f, bn_f)
        for sub in range(len(acc_lo)):
            lo_c = slice(sub * N_ALIGN, sub * N_ALIGN + PAIR_HALF)
            hi_c = slice(sub * N_ALIGN + PAIR_HALF, (sub + 1) * N_ALIGN)
            res_lo = h_scr[:, pl.ds(base + sub * N_ALIGN, PAIR_HALF)]
            res_hi = h_scr[
                :, pl.ds(base + sub * N_ALIGN + PAIR_HALF, PAIR_HALF)
            ]
            out_ref[:, lo_c] = res_lo + acc_lo[sub].astype(h_scr.dtype)
            out_ref[:, hi_c] = res_hi + acc_hi[sub].astype(h_scr.dtype)


def _pick_bk(attend_len: int) -> int:
    from exllama_tpu.ops.attention import DECODE_BK_CANDS

    for cand in DECODE_BK_CANDS:
        if attend_len % cand == 0:
            return cand
    return attend_len


def attn_o_applicable(
    o: "QuantTensor | None",
    hidden: int,
    heads: int,
    head_dim: int,
    t: int,
    matmul_impl: str,
    deferred: bool,
    has_lora: bool,
    batch: int = 1,
) -> bool:
    """Fused attention-block gate: decode only (T=1, deferred commit), batch
    within the GEMV regime (the kernel pads rows to bm ≤ 32), npair o-proj
    without act-order or LoRA, lane-legal head dim, residual width == o's
    true output (non-N_ALIGN hidden sizes like 33B's 6656 ride the
    zero-padded columns — padded scale columns dequant to exact 0)."""
    if o is None or has_lora or not deferred or t != 1:
        return False
    if batch > GEMV_MAX_M:
        return False
    if matmul_impl not in ("pallas", "pallas_interpret",
                           "pallas_a8", "pallas_a8_interpret",
                           "pallas_a8t", "pallas_a8t_interpret",
                           "pallas_a8x2", "pallas_a8x2_interpret"):
        return False
    if o.layout != "npair" or o.x_map is not None:
        return False
    if o.out_features != hidden or hidden % 128 != 0:
        return False
    if head_dim % 128 != 0:
        return False
    return o.in_features == heads * head_dim


@functools.partial(
    jax.jit,
    static_argnames=(
        "attend_len", "g", "groupsize", "bn_o", "bn_a", "bn_f", "bn_b",
        "inter", "heads", "head_dim", "nq_pad", "nkv_pad", "eps",
        "interpret", "a8", "a8x2",
    ),
)
def _layer_tail_call(
    qr,          # [B, Hkv, R, D] post-rope query rows (R = pad(G))
    k_cache,     # [B, Hkv, S_max, D]
    v_cache,
    past_b,      # [B, 1] int32
    bias,        # [B, 1, S_max] f32 or None
    ks4,         # [B, Hkv, 1, S_max] f32 or None
    vs4,
    k_new,       # [B, Hkv, 1, D]
    v_new,
    h2,          # [bm, K1] bf16 residual (B rows padded to bm)
    oq, os_, oz,
    nw=None,     # [1, K1] post-norm weight (MLP fusion)
    guq=None, gus=None, guz=None,
    dq=None, ds=None, dz=None,
    iw=None,     # [1, K1] input norm weight (qkv fusion — phase B)
    qkvq=None, qkvs=None, qkvz=None,
    sin_op=None,  # [bm, D] f32 per-row rope rows
    cos_op=None,
    *,
    attend_len: int,
    g: int,
    groupsize: int,
    bn_o: int,
    bn_a: int = 0,
    bn_f: int = 0,
    bn_b: int = 0,
    inter: int = 0,
    heads: int = 0,
    head_dim: int = 0,
    nq_pad: int = 0,
    nkv_pad: int = 0,
    eps: float = 0.0,
    interpret: bool,
    a8: bool = False,
    a8x2: bool = False,
):
    if qr is not None:
        b, hkv, r, d = qr.shape
    else:                        # qkv fusion: q is computed in-kernel
        b, hkv = k_cache.shape[:2]
        d = head_dim             # cache may be int4-packed (D/2 wide)
        r = max(8, g)
    bm, k1p = h2.shape           # k1p = residual width (padded_n(hidden))
    ko = oq.shape[0] * 4         # o-proj K = heads·head_dim (attn width)
    k1 = nw.shape[1] if nw is not None else (
        iw.shape[1] if iw is not None else ko)       # true hidden
    n_pad = os_.shape[1]
    gsz = ko // groupsize
    bk = _pick_bk(attend_len)
    n_sk = attend_len // bk
    have_qkv = qkvq is not None
    n_qkv = qkvs.shape[1] if have_qkv else 0
    steps_b = n_qkv // bn_b if have_qkv else 0
    steps_c = b * hkv * n_sk
    steps_d = n_pad // bn_o
    have_mlp = nw is not None
    if have_mlp:
        n_gu = gus.shape[1]
        k2 = inter
        gsz1 = k1 // groupsize
        gsz2 = k2 // groupsize
        n_down = ds.shape[1]
        steps_e = n_gu // bn_a
        steps_f = n_down // bn_f
        gu_half_cols = n_gu // 2
    else:
        n_gu = k2 = gsz2 = n_down = 0
        gsz1 = k1 // groupsize
        steps_e = steps_f = gu_half_cols = 0
    off_d = steps_b + steps_c
    off_e = off_d + steps_d
    off_f = off_e + steps_e
    total = off_f + steps_f if have_mlp else off_e

    def cphase(t):
        # clamped phase-C operand coordinates
        tc = jnp.clip(t - steps_b, 0, steps_c - 1)
        bh = tc // n_sk
        return bh // hkv, bh % hkv, tc % n_sk

    kernel = functools.partial(
        _layer_tail_kernel,
        g=g, d=d, hkv=hkv, n_sk=n_sk, steps_b=steps_b, steps_c=steps_c,
        steps_d=steps_d,
        steps_e=steps_e, bn_a=bn_a, inter=inter, gu_half_cols=gu_half_cols,
        eps=eps, scale=1.0 / (d ** 0.5), groupsize=groupsize,
        have_bias=bias is not None, have_mlp=have_mlp,
        heads=heads, nq_pad=nq_pad, nkv_pad=nkv_pad, batch=b, a8=a8,
        a8x2=a8x2,
    )

    in_specs = []
    args = []
    if not have_qkv:
        in_specs.append(pl.BlockSpec(
            (1, 1, r, d), lambda t, *_: (*cphase(t)[:2], 0, 0),
            memory_space=pltpu.VMEM,
        ))
        args.append(qr)
    dk = k_cache.shape[-1]       # D, or D/2 for packed int4 caches
    in_specs += [
        pl.BlockSpec((1, 1, bk, dk),
                     lambda t, *_: (cphase(t)[0], cphase(t)[1],
                                    cphase(t)[2], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, dk),
                     lambda t, *_: (cphase(t)[0], cphase(t)[1],
                                    cphase(t)[2], 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [k_cache, v_cache]
    have_scales = ks4 is not None
    if have_scales:
        for sc in (ks4, vs4):
            in_specs.append(pl.BlockSpec(
                (1, 1, 1, bk),
                lambda t, *_: (cphase(t)[0], cphase(t)[1], 0, cphase(t)[2]),
                memory_space=pltpu.VMEM,
            ))
            args.append(sc)
    if bias is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, bk), lambda t, *_: (cphase(t)[0], 0, cphase(t)[2]),
            memory_space=pltpu.VMEM,
        ))
        args.append(bias)
    if not have_qkv:
        for nr in (k_new, v_new):
            in_specs.append(pl.BlockSpec(
                (1, 1, 1, d),
                lambda t, *_: (cphase(t)[0], cphase(t)[1], 0, 0),
                memory_space=pltpu.VMEM,
            ))
            args.append(nr)

    def dphase(t):
        return jnp.clip(t - off_d, 0, steps_d - 1)

    in_specs += [
        pl.BlockSpec((bm, k1p), lambda t, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ko // 4, bn_o // 2),
                     lambda t, *_: (0, dphase(t)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, gsz, bn_o),
                     lambda t, *_: (0, 0, dphase(t)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, gsz, bn_o),
                     lambda t, *_: (0, 0, dphase(t)),
                     memory_space=pltpu.VMEM),
    ]
    args += [h2, oq, os_.reshape(1, gsz, n_pad), oz.reshape(1, gsz, n_pad)]

    if have_qkv:
        def bphase(t):
            return jnp.clip(t, 0, steps_b - 1)

        in_specs += [
            pl.BlockSpec((1, k1), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1 // 4, bn_b // 2),
                         lambda t, *_: (0, bphase(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gsz1, bn_b),
                         lambda t, *_: (0, 0, bphase(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gsz1, bn_b),
                         lambda t, *_: (0, 0, bphase(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, d), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, d), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [
            iw, qkvq, qkvs.reshape(1, gsz1, n_qkv),
            qkvz.reshape(1, gsz1, n_qkv), sin_op, cos_op,
        ]

    if have_mlp:
        def ephase(t):
            return jnp.clip(t - off_e, 0, steps_e - 1)

        def fphase(t):
            return jnp.maximum(t - off_f, 0)

        in_specs += [
            pl.BlockSpec((1, k1), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1 // 4, bn_a // 2),
                         lambda t, *_: (0, ephase(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gsz1, bn_a),
                         lambda t, *_: (0, 0, ephase(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gsz1, bn_a),
                         lambda t, *_: (0, 0, ephase(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 // 4, bn_f // 2),
                         lambda t, *_: (0, fphase(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gsz2, bn_f),
                         lambda t, *_: (0, 0, fphase(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gsz2, bn_f),
                         lambda t, *_: (0, 0, fphase(t)),
                         memory_space=pltpu.VMEM),
        ]
        args += [
            nw, guq, gus.reshape(1, gsz1, n_gu), guz.reshape(1, gsz1, n_gu),
            dq, ds.reshape(1, gsz2, n_down), dz.reshape(1, gsz2, n_down),
        ]
        out_bn = bn_f
        out_n = n_down

        def ophase(t):
            return jnp.maximum(t - off_f, 0)
    else:
        out_bn = bn_o
        out_n = n_pad

        def ophase(t):
            return jnp.maximum(t - off_d, 0)

    scratch = [
        pltpu.VMEM((r, 128), jnp.float32),
        pltpu.VMEM((r, 128), jnp.float32),
        pltpu.VMEM((r, d), jnp.float32),
        pltpu.VMEM((bm, ko), h2.dtype),      # attn: heads·head_dim wide
    ]
    if have_qkv:
        scratch += [
            pltpu.VMEM((bm, k1), h2.dtype),   # xn0: input-normed h
            pltpu.VMEM((bm, n_qkv), h2.dtype),
        ]
    if have_mlp:
        scratch += [
            pltpu.VMEM((bm, k1p), h2.dtype),  # h': residual width
            pltpu.VMEM((bm, k1), h2.dtype),   # xn: true-hidden wide
            pltpu.VMEM((bm, n_gu), jnp.float32),
            pltpu.VMEM((bm, k2), jnp.bfloat16),
        ]

    def kern(past_ref, *rest):
        rest = list(rest)
        q_ref = None if have_qkv else rest.pop(0)
        k_ref = rest.pop(0)
        v_ref = rest.pop(0)
        ks_ref = vs_ref = bias_ref = None
        if have_scales:
            ks_ref = rest.pop(0)
            vs_ref = rest.pop(0)
        if bias is not None:
            bias_ref = rest.pop(0)
        kn_ref = vn_ref = None
        if not have_qkv:
            kn_ref = rest.pop(0)
            vn_ref = rest.pop(0)
        h_ref, oq_ref, os_ref, oz_ref = rest[:4]
        rest = rest[4:]
        iw_ref = qkvq_ref = qkvs_ref = qkvz_ref = None
        sin_ref = cos_ref = None
        if have_qkv:
            (iw_ref, qkvq_ref, qkvs_ref, qkvz_ref,
             sin_ref, cos_ref) = rest[:6]
            rest = rest[6:]
        if have_mlp:
            (nw_ref, guq_ref, gus_ref, guz_ref,
             dq_ref, ds_ref, dz_ref) = rest[:7]
            rest = rest[7:]
        else:
            nw_ref = guq_ref = gus_ref = guz_ref = None
            dq_ref = ds_ref = dz_ref = None
        out_ref = rest.pop(0)
        kn_out = vn_out = None
        if have_qkv:
            kn_out = rest.pop(0)
            vn_out = rest.pop(0)
        m, l, acc, attn = rest[:4]
        rest = rest[4:]
        xn0_scr = qkv_scr = None
        if have_qkv:
            xn0_scr = rest.pop(0)
            qkv_scr = rest.pop(0)
        if have_mlp:
            h_scr, xn_scr, gu_scr, mid_scr = rest
        else:
            h_scr = xn_scr = gu_scr = mid_scr = None
        return kernel(past_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                      bias_ref, kn_ref, vn_ref, h_ref, oq_ref, os_ref,
                      oz_ref, iw_ref, qkvq_ref, qkvs_ref, qkvz_ref,
                      sin_ref, cos_ref, nw_ref, guq_ref, gus_ref, guz_ref,
                      dq_ref, ds_ref, dz_ref, out_ref, kn_out, vn_out,
                      m, l, acc, attn, xn0_scr, qkv_scr,
                      h_scr, xn_scr, gu_scr, mid_scr)

    out_specs = pl.BlockSpec(
        (bm, out_bn), lambda t, *_: (0, ophase(t)),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((bm, out_n), h2.dtype)
    if have_qkv:
        row_spec = pl.BlockSpec((bm, hkv * d), lambda t, *_: (0, 0),
                                memory_space=pltpu.VMEM)
        out_specs = (out_specs, row_spec, row_spec)
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((bm, hkv * d), h2.dtype),
            jax.ShapeDtypeStruct((bm, hkv * d), h2.dtype),
        )

    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(total,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(past_b, *args)


def _prep_common(h, past_len, input_mask, k_scale, v_scale, pad_cols: int):
    """Operand prep shared by every fused-layer wrapper: per-row cursors,
    left-pad bias, 4-D KV scales, and the residual padded to (bm, k1p)."""
    b, _, hidden = h.shape
    past_b = jnp.broadcast_to(
        past_len.astype(jnp.int32).reshape(-1, 1), (b, 1)
    )
    bias = None
    if input_mask is not None:
        bias = jnp.where(
            input_mask, jnp.float32(0), jnp.float32(NEG_INF)
        )[:, None, :]
    ks4 = None if k_scale is None else k_scale[:, :, None, :]
    vs4 = None if v_scale is None else v_scale[:, :, None, :]
    h2 = h.reshape(b, hidden)
    bm = 8 if b <= 8 else (16 if b <= 16 else 32)
    k1p = max(pad_cols, hidden)
    if b != bm or k1p != hidden:
        h2 = jnp.pad(h2, ((0, bm - b), (0, k1p - hidden)))
    return past_b, bias, ks4, vs4, h2, b, bm, hidden


def _prep(h, q, k_cache, new_kv, past_len, input_mask, k_scale, v_scale,
          pad_cols: int = 0):
    b, t, hh, d = q.shape
    assert t == 1
    hkv = k_cache.shape[1]
    g = hh // hkv
    qr = q.reshape(b, 1, hkv, g, d).transpose(0, 2, 1, 3, 4)
    qr = qr.reshape(b, hkv, g, d)
    if g < 8:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, 8 - g), (0, 0)))
    past_b, bias, ks4, vs4, h2, _, _, hidden = _prep_common(
        h, past_len, input_mask, k_scale, v_scale, pad_cols
    )
    k_new = jnp.swapaxes(new_kv[0], 1, 2).astype(q.dtype)
    v_new = jnp.swapaxes(new_kv[1], 1, 2).astype(q.dtype)
    return qr, past_b, bias, ks4, vs4, k_new, v_new, h2, g, b, hidden


def attn_block_o(
    h: jax.Array,          # [B, 1, hidden] residual stream (pre-attn-output)
    q: jax.Array,          # [B, 1, H, D] post-rope queries
    k_cache: jax.Array,    # [B, Hkv, S_max, D]
    v_cache: jax.Array,
    past_len: jax.Array,   # scalar or [B]
    attend_len: int,
    o: QuantTensor,
    new_kv: tuple,         # ([B, 1, Hkv, D], [B, 1, Hkv, D]) in-flight rows
    input_mask: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    impl: str = "pallas",
) -> jax.Array:
    """h + o_proj(flash_attend(q, cache ⊕ new_kv)) in one kernel. Caller
    must have checked ``attn_o_applicable``."""
    (qr, past_b, bias, ks4, vs4, k_new, v_new, h2, g, b,
     hidden) = _prep(h, q, k_cache, new_kv, past_len, input_mask,
                     k_scale, v_scale, pad_cols=o.padded_out_features)
    bn_o = _pick_bn(o.padded_out_features, o.in_features)
    out = _layer_tail_call(
        qr, k_cache, v_cache, past_b, bias, ks4, vs4, k_new, v_new,
        h2, o.qweight, o.scales, o.zscale,
        attend_len=attend_len, g=g, groupsize=o.groupsize, bn_o=bn_o,
        interpret=impl.endswith("_interpret"),
        a8=impl.startswith("pallas_a8"),
        a8x2=impl.startswith("pallas_a8x2"),
    )
    return out[:b, :hidden].reshape(b, 1, hidden)


def layer_tail(
    h: jax.Array,          # [B, 1, hidden] residual stream (pre-attn-output)
    q: jax.Array,          # [B, 1, H, D] post-rope queries
    k_cache: jax.Array,
    v_cache: jax.Array,
    past_len: jax.Array,
    attend_len: int,
    o: QuantTensor,
    post_norm: jax.Array,  # [hidden]
    gateup: QuantTensor,
    down: QuantTensor,
    eps: float,
    new_kv: tuple,
    input_mask: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    impl: str = "pallas",
) -> jax.Array:
    """The whole decode layer after rope — attention, o-proj, residual,
    post-norm, MLP, residual — in ONE kernel. Caller must have checked
    ``attn_o_applicable`` AND ``fused_mlp_applicable``."""
    (qr, past_b, bias, ks4, vs4, k_new, v_new, h2, g, b,
     hidden) = _prep(h, q, k_cache, new_kv, past_len, input_mask,
                     k_scale, v_scale, pad_cols=down.padded_out_features)
    bn_o = _pick_bn(o.padded_out_features, o.in_features)
    inter = down.in_features
    bn_a = _pick_bn(gateup.padded_out_features, hidden)
    bn_f = _pick_bn(down.padded_out_features, inter)
    out = _layer_tail_call(
        qr, k_cache, v_cache, past_b, bias, ks4, vs4, k_new, v_new,
        h2, o.qweight, o.scales, o.zscale,
        post_norm.reshape(1, hidden).astype(h.dtype),
        gateup.qweight, gateup.scales, gateup.zscale,
        down.qweight, down.scales, down.zscale,
        attend_len=attend_len, g=g, groupsize=o.groupsize, bn_o=bn_o,
        bn_a=bn_a, bn_f=bn_f, inter=inter, eps=float(eps),
        interpret=impl.endswith("_interpret"),
        a8=impl.startswith("pallas_a8"),
        a8x2=impl.startswith("pallas_a8x2"),
    )
    return out[:b, :hidden].reshape(b, 1, hidden)


def layer_step_applicable(
    qkv: "QuantTensor | None",
    o: "QuantTensor | None",
    hidden: int,
    heads: int,
    head_dim: int,
    matmul_impl: str,
    has_lora: bool,
) -> bool:
    """Whole-layer fusion gate (phase B: in-kernel norm + fused-qkv GEMV +
    rope). Checked IN ADDITION to ``attn_o_applicable`` and
    ``fused_mlp_applicable``; adds the fused-qkv tensor requirements."""
    if qkv is None or o is None or has_lora:
        return False
    if matmul_impl not in ("pallas", "pallas_interpret",
                           "pallas_a8", "pallas_a8_interpret",
                           "pallas_a8t", "pallas_a8t_interpret",
                           "pallas_a8x2", "pallas_a8x2_interpret"):
        return False
    if qkv.layout != "npair" or qkv.x_map is not None:
        return False
    if qkv.in_features != hidden or hidden % 128 != 0:
        return False
    if qkv.groupsize != o.groupsize or hidden % qkv.groupsize != 0:
        return False
    if head_dim != 128:          # rope pairing assumes one 128-lane head
        return False
    return heads * head_dim == o.in_features


def layer_step(
    h: jax.Array,          # [B, 1, hidden] residual BEFORE the input norm
    qkv: QuantTensor,      # fused q|k|v projection (npair)
    input_norm: jax.Array,  # [hidden]
    rope_sin: jax.Array,   # [1|B, 1, 1, D] pre-sliced rope rows
    rope_cos: jax.Array,
    k_cache: jax.Array,    # [B, Hkv, S_max, D]
    v_cache: jax.Array,
    past_len: jax.Array,   # scalar or [B]
    attend_len: int,
    o: QuantTensor,
    post_norm: jax.Array,  # [hidden]
    gateup: QuantTensor,
    down: QuantTensor,
    eps: float,
    heads: int,
    kv_heads: int,
    head_dim: int,
    input_mask: Optional[jax.Array] = None,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    impl: str = "pallas",
):
    """The ENTIRE decode layer in one kernel: input-norm + fused-qkv GEMV +
    rope (phase B), flash attention over cache ⊕ in-flight row (C), o-proj
    + residual (D), post-norm + MLP + residual (E/F). Returns
    (h_out [B,1,hidden], k_row [B,1,Hkv,D], v_row [B,1,Hkv,D]) — the rows
    feed the caller's batched deferred KV commit. Caller must have checked
    ``layer_step_applicable`` + ``attn_o_applicable`` +
    ``fused_mlp_applicable``."""
    from exllama_tpu.formats.gptq import padded_n

    t = h.shape[1]
    assert t == 1
    d = head_dim
    g = heads // kv_heads
    past_b, bias, ks4, vs4, h2, b, bm, hidden = _prep_common(
        h, past_len, input_mask, k_scale, v_scale, down.padded_out_features
    )
    sin_op = jnp.broadcast_to(
        rope_sin.reshape(-1, d), (b, d)
    ).astype(jnp.float32)
    cos_op = jnp.broadcast_to(
        rope_cos.reshape(-1, d), (b, d)
    ).astype(jnp.float32)
    if b != bm:
        sin_op = jnp.pad(sin_op, ((0, bm - b), (0, 0)))
        cos_op = jnp.pad(cos_op, ((0, bm - b), (0, 0)))

    bn_o = _pick_bn(o.padded_out_features, o.in_features)
    bn_b = _pick_bn(qkv.padded_out_features, hidden)
    inter = down.in_features
    bn_a = _pick_bn(gateup.padded_out_features, hidden)
    bn_f = _pick_bn(down.padded_out_features, inter)
    out, kn, vn = _layer_tail_call(
        None, k_cache, v_cache, past_b, bias, ks4, vs4, None, None,
        h2, o.qweight, o.scales, o.zscale,
        post_norm.reshape(1, hidden).astype(h.dtype),
        gateup.qweight, gateup.scales, gateup.zscale,
        down.qweight, down.scales, down.zscale,
        input_norm.reshape(1, hidden).astype(h.dtype),
        qkv.qweight, qkv.scales, qkv.zscale, sin_op, cos_op,
        attend_len=attend_len, g=g, groupsize=o.groupsize, bn_o=bn_o,
        bn_a=bn_a, bn_f=bn_f, bn_b=bn_b, inter=inter, heads=heads,
        head_dim=d,
        nq_pad=padded_n(heads * d), nkv_pad=padded_n(kv_heads * d),
        eps=float(eps),
        interpret=impl.endswith("_interpret"),
        a8=impl.startswith("pallas_a8"),
        a8x2=impl.startswith("pallas_a8x2"),
    )
    return (
        out[:b, :hidden].reshape(b, 1, hidden),
        kn[:b].reshape(b, 1, kv_heads, d),
        vn[:b].reshape(b, 1, kv_heads, d),
    )


_LAYER_VMEM_LIMIT = 100 * 1024 * 1024   # headroom under vmem_limit_bytes


def layer_fusion_budget_ok(
    o: QuantTensor,
    gateup: "QuantTensor | None",
    down: "QuantTensor | None",
    qkv: "QuantTensor | None",
    hidden: int,
    heads: int,
    kv_heads: int,
    head_dim: int,
    attend_len: int,
    batch: int,
    int8_kv: bool,
) -> bool:
    """Combined gate for the multi-phase layer kernels (layer_tail /
    layer_step): all participating tensors must share one groupsize (the
    kernel reshapes every scale strip with it), and the kernel's OWN VMEM
    footprint — weight/scale double-buffers for every phase, KV blocks,
    and the scratches — must fit. attn_o_applicable/fused_mlp_applicable
    check the per-piece constraints; this checks the sum."""
    gs = o.groupsize
    for qt in (gateup, down, qkv):
        if qt is not None and qt.groupsize != gs:
            return False
    d = head_dim
    bm = 8 if batch <= 8 else (16 if batch <= 16 else 32)
    r = max(8, heads // kv_heads)
    k1 = hidden
    ko = o.in_features
    k1p = max(down.padded_out_features if down is not None else 0, hidden)
    bk = _pick_bk(attend_len)
    kv_item = 1 if int8_kv else 2
    total = 0
    # KV strip blocks (k + v, double-buffered) + int8 scales
    total += 2 * 2 * bk * d * kv_item
    if int8_kv:
        total += 2 * 2 * bk * 4
    # residual input + output blocks
    total += 2 * bm * k1p * 2 * 2

    def w_blocks(k, n_pad, bn):
        # qweight block (int32, packed half-width) + 2 scale strips, ×2 bufs
        return 2 * (k * bn // 2 + 2 * (k // gs) * bn * 2)

    bn_o = _pick_bn(o.padded_out_features, ko)
    total += w_blocks(ko, o.padded_out_features, bn_o)
    # scratches: softmax state + flat attention output
    total += r * (128 + 128 + d) * 4 + bm * ko * 2
    if gateup is not None and down is not None:
        k2 = down.in_features
        n_gu = gateup.padded_out_features
        bn_a = _pick_bn(n_gu, k1)
        bn_f = _pick_bn(down.padded_out_features, k2)
        total += w_blocks(k1, n_gu, bn_a) + w_blocks(k2,
                                                     down.padded_out_features,
                                                     bn_f)
        total += bm * (k1p * 2 + k1 * 2 + n_gu * 4 + k2 * 2)  # h'/xn/gu/mid
    if qkv is not None:
        n_qkv = qkv.padded_out_features
        bn_b = _pick_bn(n_qkv, k1)
        total += w_blocks(k1, n_qkv, bn_b)
        total += bm * (k1 * 2 + n_qkv * 2)   # xn0 + qkv scratch
        total += 2 * bm * d * 4 * 2          # sin/cos operands
        total += 2 * 2 * bm * kv_heads * d * 2   # kn/vn outputs
    return total <= _LAYER_VMEM_LIMIT
