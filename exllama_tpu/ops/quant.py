"""Fused 4-bit dequant + matmul — the hot op of the whole framework.

TPU-native re-design of the reference's q4_matmul
(exllama_ext/cuda_func/q4_matmul.cu). The reference splits into two paths by
row count: a hand-written GEMV CUDA kernel for decode (q4_matmul.cu:87-235)
and dequantize-then-cuBLAS for prefill (q4_matmul.cu:301-344). Here both are
one Pallas kernel family over the packed weight layout (formats/gptq.py)
— selected by M exactly like the reference's matmul_recons_thd switch —
plus a pure-XLA fallback (dequantize + jnp.dot) that serves as the
cross-validation oracle, the reference's own validation trick
(test_benchmark_inference.py:239-246).

The kgroup layout makes the in-kernel unpack two int8 mask ops per byte:
``bitcast(int32 → int8)`` yields, per quantization group, a [gs/2, bn] byte
tile whose low nibbles are the group's first-half rows (exact values) and
whose high nibbles are the second-half rows stored top-bit-flipped so that
the *signed* ``byte & 0xF0`` equals ``16·q − 128`` — an affine encoding the
kernel undoes with per-GROUP math on the [M, bn] partial products, never
per weight:

    out = Σ_g [ (x₁·lo_g) + (x₂·hv_g)/16 + 8·Σx₂ ]·s_g − (Σx₁+Σx₂)·zscale_g

(x₁/x₂ = the group's half-slices of the activation). All per-weight VPU
work is the two masks plus the int8→bf16 converts feeding the MXU; measured
~20% faster than shift/concat unpacking of a lane-panel layout on v5e, and
the zero-point term costs one FMA per OUTPUT (the reference's ``no_zero``
accumulate trick, q4_matmul.cu:78-82, done inside the kernel).

Act-order models permute the activation's feature axis by x_map before the
kernel (the reference's column_remap, cuda_func/column_remap.cu) — rows of
the stored weight are already group-sequential.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exllama_tpu.formats.gptq import N_ALIGN, PAIR_HALF, QuantTensor


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# XLA path: on-device dequantize (from the kgroup layout) + jnp.dot.
# Analogue of the reference's reconstruct+cuBLAS path (q4_matmul.cu:301-344)
# and the correctness oracle for the Pallas kernels.
# ---------------------------------------------------------------------------

def dequantize_xla(qt: QuantTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize the stored weight on device → [K, N_pad]."""
    gs = qt.groupsize
    u = jax.lax.bitcast_convert_type(qt.qweight, jnp.uint32)
    if qt.layout == "npair":
        kw, npk = qt.qweight.shape
        k = kw * 4
        n_pad = npk * 2
        bts = jnp.stack(
            [(u >> jnp.uint32(8 * j)) & jnp.uint32(0xFF) for j in range(4)],
            axis=1,
        ).reshape(k, npk)
        from exllama_tpu.formats.gptq import N_ALIGN, PAIR_HALF

        nb = n_pad // N_ALIGN
        lo = (bts & 0xF).astype(jnp.float32).reshape(k, nb, 1, PAIR_HALF)
        hi = (((bts >> 4) & 0xF) ^ 8).astype(jnp.float32).reshape(
            k, nb, 1, PAIR_HALF
        )
        q = jnp.concatenate([lo, hi], axis=2).reshape(k, n_pad)
    else:
        kw, n_pad = qt.qweight.shape
        k = kw * 8
        half = gs // 2
        bts = jnp.stack(
            [(u >> jnp.uint32(8 * j)) & jnp.uint32(0xFF) for j in range(4)],
            axis=1,
        ).reshape(k // 2, n_pad)                  # int8 row r' = 4r + j
        lo = (bts & 0xF).astype(jnp.float32)
        hi = (((bts >> 4) & 0xF) ^ 8).astype(jnp.float32)
        lo = lo.reshape(k // gs, half, n_pad)
        hi = hi.reshape(k // gs, half, n_pad)
        q = jnp.concatenate([lo, hi], axis=1).reshape(k, n_pad)
    s = jnp.repeat(qt.scales.astype(jnp.float32), gs, axis=0)
    zs = jnp.repeat(qt.zscale.astype(jnp.float32), gs, axis=0)
    return (q * s - zs).astype(dtype)


def _q4_matmul_xla(x: jax.Array, qt: QuantTensor) -> jax.Array:
    w = dequantize_xla(qt, dtype=x.dtype)
    out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return out[..., : qt.out_features].astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas kernels (two members of one family, selected by M)
# ---------------------------------------------------------------------------

def _q4_gemv_kernel(
    x_ref,        # [bm, bk]           activation tile (bf16/f32)
    qw_ref,       # [bk/8, bn]         packed words (int32, kgroup)
    s_ref,        # [1, bk/gs, bn]     scales (bf16 storage)
    z_ref,        # [1, bk/gs, bn]     zscale (bf16 storage)
    out_ref,      # [bm, bn]
    acc_ref,      # [bm, bn] f32 scratch
    *,
    groupsize: int,
    block_k: int,
    out_dtype,
):
    """Decode/small-M: raw nibble dots on the MXU, scales and zero-points
    applied to the [M, bn] group partial sums (see module docstring)."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b8 = pltpu.bitcast(qw_ref[:], jnp.int8)       # [bk/2, bn]
    s = s_ref[0].astype(jnp.float32)              # stored bf16, compute f32
    z = z_ref[0].astype(jnp.float32)
    half = groupsize // 2
    for g in range(block_k // groupsize):
        blk = b8[g * half : (g + 1) * half, :]    # [gs/2, bn]
        lo = (blk & 0x0F).astype(jnp.bfloat16)    # first half, exact
        hv = (blk & (-16)).astype(jnp.bfloat16)   # second half, 16q - 128
        x1 = x_ref[:, g * groupsize : g * groupsize + half]
        x2 = x_ref[:, g * groupsize + half : (g + 1) * groupsize]
        p = jnp.dot(x1, lo, preferred_element_type=jnp.float32)
        phv = jnp.dot(x2, hv, preferred_element_type=jnp.float32)
        xs1 = x1.astype(jnp.float32).sum(axis=1, keepdims=True)
        xs2 = x2.astype(jnp.float32).sum(axis=1, keepdims=True)
        p += phv * 0.0625 + xs2 * 8.0
        acc_ref[:] += p * s[g : g + 1, :] - (xs1 + xs2) * z[g : g + 1, :]

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _permute_prologue(x_ref, sb_ref, im_ref, x_scr, k_total: int, bm: int):
    """Fill x_scr with x permuted by a static act-order map, inside the
    kernel (runs once per M block, at grid (j==0, k==0)).

    Mosaic's dynamic_gather shuffles lanes within one 128-lane vreg only,
    so the arbitrary K-permutation decomposes into nblk² masked micro
    gathers: out 128-block o accumulates, over source blocks b, the
    lane-gather of block b masked to entries whose source block is b.
    ~1 µs for K=4096 vs ~30 µs for the XLA gather op this replaces
    (sb = x_map // 128, im = x_map % 128, precomputed outside)."""
    @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
    def _():
        xf = x_ref[:].astype(jnp.float32)
        nblk = k_total // 128
        for o in range(nblk):
            idx_o = jnp.broadcast_to(
                im_ref[:, o * 128 : (o + 1) * 128], (bm, 128)
            )
            sb_o = jnp.broadcast_to(
                sb_ref[:, o * 128 : (o + 1) * 128], (bm, 128)
            )
            acc = jnp.zeros((bm, 128), jnp.float32)
            for b in range(nblk):
                src = xf[:, b * 128 : (b + 1) * 128]
                g = jnp.take_along_axis(src, idx_o, axis=1)
                acc = acc + jnp.where(sb_o == b, g, 0.0)
            x_scr[:, o * 128 : (o + 1) * 128] = acc.astype(x_scr.dtype)


def _q4_gemv_kernel_npair(
    x_ref,        # [bm, bk]           activation tile (bf16/f32)
    qw_ref,       # [bk/4, bn/2]       packed words (int32, npair)
    s_ref,        # [1, bk/gs, bn]     scales (bf16 storage)
    z_ref,        # [1, bk/gs, bn]     zscale (bf16 storage)
    *rest,        # [nw_ref,] [sb_ref, im_ref,] out_ref, acc_ref
                  # [, x_scr | xn_scr]
    groupsize: int,
    block_k: int,
    out_dtype,
    have_xmap: bool = False,
    have_norm: bool = False,
    eps: float = 0.0,
):
    """Decode/small-M kernel over the npair layout (formats/gptq.py): one
    full-byte convert + one masked convert per byte give BOTH paired output
    columns — d1 − d2 recovers the low column exactly, d2/16 + 8Σx the
    high one. Requires bn == N_ALIGN (one pair block per grid column).
    With ``have_xmap`` the act-order activation permutation happens in a
    kernel prologue (see _permute_prologue) instead of an XLA gather.
    With ``have_norm`` (whole-K blocks, exclusive with have_xmap) x is the
    raw residual stream and rms_norm(x)·nw happens in the prologue — the
    input norm of a decoder block rides along with its projection."""
    if have_norm:
        assert not have_xmap
        nw_ref, rest = rest[0], rest[1:]
    if have_xmap:
        sb_ref, im_ref, out_ref, acc_ref, x_scr = rest
    else:
        out_ref, acc_ref = rest[0], rest[1]
        xn_scr = rest[2] if have_norm else None
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if have_norm:
        @pl.when((pl.program_id(1) == 0) & (k_idx == 0))
        def _():
            xf = x_ref[:].astype(jnp.float32)
            ms = jnp.mean(xf * xf, axis=1, keepdims=True)
            xn = xf * jax.lax.rsqrt(ms + eps) * nw_ref[0].astype(jnp.float32)
            xn_scr[:] = xn.astype(xn_scr.dtype)

    if have_xmap:
        _permute_prologue(
            x_ref, sb_ref, im_ref, x_scr, block_k, x_ref.shape[0]
        )
        xsrc = x_scr
    elif have_norm:
        xsrc = xn_scr
    else:
        xsrc = x_ref
    b8 = pltpu.bitcast(qw_ref[:], jnp.int8)       # [bk, bn/2]
    s = s_ref[0].astype(jnp.float32)
    z = z_ref[0].astype(jnp.float32)
    gs = groupsize
    # bn may span several N_ALIGN pair-blocks (fewer, larger grid steps
    # amortize the ~0.6 µs/step fixed cost that capped wide-N GEMVs at
    # ~600 GB/s with single-pair blocks); the lo/hi column pairing lives
    # inside each 1024-column aligned block.
    half = PAIR_HALF
    nsub = b8.shape[1] // half
    if gs < 128 and block_k % 128 == 0:
        # g32/g64 specialization (round 5; the generic loop below measured
        # 0.76 of the HBM roofline at 33B g32 — the per-group work
        # quadruples while the streamed bytes don't). Two changes:
        #   1. One 128-deep BLOCK-DIAGONAL dot replaces 128//gs shallow
        #      dots: lhs rows r·bm..(r+1)·bm hold x masked to sub-group
        #      r's K-slice, so a single MXU pass yields every sub-group's
        #      partials (the zero lanes ride the systolic depth the
        #      shallow dots wasted anyway).
        #   2. The per-group Σx terms (zero-points and the +8 affine
        #      offset) leave the loop entirely: collected into [bm, G]
        #      and contracted against M[g, n] = 8·s·[n is hi] − z in one
        #      MXU dot per K-block, instead of 3 [bm, bn]-wide FMA
        #      streams per group.
        sup = 128 // gs
        bm_ = xsrc.shape[0]
        xs_cols = []
        row = jax.lax.broadcasted_iota(jnp.int32, (sup * bm_, 128), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sup * bm_, 128), 1)
        diag_mask = (col // gs) == (row // bm_)
        for sg in range(block_k // 128):
            xg = xsrc[:, sg * 128 : (sg + 1) * 128]
            blk = b8[sg * 128 : (sg + 1) * 128, :]       # [128, bn/2]
            bval = blk.astype(jnp.bfloat16)
            hv = (blk & (-16)).astype(jnp.bfloat16)
            xt = jnp.where(
                diag_mask,
                jnp.broadcast_to(
                    xg[None].astype(jnp.float32), (sup, bm_, 128)
                ).reshape(sup * bm_, 128),
                0.0,
            ).astype(xg.dtype)
            D1 = jnp.dot(xt, bval, preferred_element_type=jnp.float32)
            D2 = jnp.dot(xt, hv, preferred_element_type=jnp.float32)
            for r in range(sup):
                xs_cols.append(
                    xg[:, r * gs : (r + 1) * gs]
                    .astype(jnp.float32)
                    .sum(axis=1, keepdims=True)
                )
            gsl = slice(sg * sup, (sg + 1) * sup)
            Dd = (D1 - D2).reshape(sup, bm_, D1.shape[1])
            D2r = D2.reshape(sup, bm_, D1.shape[1])
            for sub in range(nsub):
                sl = slice(sub * half, (sub + 1) * half)
                lo_c = slice(sub * N_ALIGN, sub * N_ALIGN + half)
                hi_c = slice(sub * N_ALIGN + half, (sub + 1) * N_ALIGN)
                # all sup sub-groups' scale applications fused into ONE
                # accumulator update each (per-group FMAs quadrupled the
                # [bm, bn] read-modify-write traffic at g32)
                acc_ref[:, lo_c] += (
                    Dd[:, :, sl] * s[gsl, lo_c][:, None, :]
                ).sum(axis=0)
                acc_ref[:, hi_c] += (
                    D2r[:, :, sl] * (s[gsl, hi_c] * 0.0625)[:, None, :]
                ).sum(axis=0)
        xs_mat = jnp.concatenate(xs_cols, axis=1)        # [bm, G]
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (s.shape[0], s.shape[1]), 1
        )
        m_sz = jnp.where((lane % N_ALIGN) >= half, 8.0 * s, 0.0) - z
        # f32 dot: the z-term is a bulk contribution and the old path
        # applied it in f32 FMAs; a bf16 contraction here would cost
        # ~0.4% relative on it. [bm, G] x [G, bn] is tiny either way.
        acc_ref[:] += jnp.dot(
            xs_mat, m_sz, preferred_element_type=jnp.float32
        )
    else:
        for g in range(block_k // gs):
            blk = b8[g * gs : (g + 1) * gs, :]        # [gs, bn/2]
            bval = blk.astype(jnp.bfloat16)           # 16 q_hi - 128 + q_lo
            hv = (blk & (-16)).astype(jnp.bfloat16)   # 16 q_hi - 128
            xg = xsrc[:, g * gs : (g + 1) * gs]
            d1 = jnp.dot(xg, bval, preferred_element_type=jnp.float32)
            d2 = jnp.dot(xg, hv, preferred_element_type=jnp.float32)
            xs = xg.astype(jnp.float32).sum(axis=1, keepdims=True)
            for sub in range(nsub):
                sl = slice(sub * half, (sub + 1) * half)
                lo_c = slice(sub * N_ALIGN, sub * N_ALIGN + half)
                hi_c = slice(sub * N_ALIGN + half, (sub + 1) * N_ALIGN)
                acc_ref[:, lo_c] += (d1[:, sl] - d2[:, sl]) * s[
                    g : g + 1, lo_c
                ] - xs * z[g : g + 1, lo_c]
                acc_ref[:, hi_c] += (d2[:, sl] * 0.0625 + xs * 8.0) * s[
                    g : g + 1, hi_c
                ] - xs * z[g : g + 1, hi_c]

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _q4_gemv_kernel_npair_a8(
    x_ref,        # [bm, bk]           activation tile (bf16/f32)
    qw_ref,       # [bk/4, bn/2]       packed words (int32, npair)
    s_ref,        # [1, bk/gs, bn]     scales (bf16 storage)
    z_ref,        # [1, bk/gs, bn]     zscale (bf16 storage)
    *rest,        # [sb_ref, im_ref,] out_ref, acc_ref [, x_scr]
    groupsize: int,
    block_k: int,
    out_dtype,
    have_xmap: bool = False,
    have_norm: bool = False,
    eps: float = 0.0,
    two_pass: bool = False,
):
    """W4A8 decode kernel (opt-in ``matmul_impl="pallas_a8"``): activations
    quantize to int8 per (row, group) inside the kernel and the nibble dots
    run on the MXU's int8 path — the per-weight int→bf16 converts (the VPU
    floor of the exact kernel) disappear entirely; per byte of weights only
    one ``& 0xF0`` mask remains. The affine recovery happens in exact int32
    (d2 is a multiple of 16), then one f32 rescale per (group, output).
    Activation quantization adds ~0.4% relative noise on top of the 4-bit
    weight error — a turbo mode, not the parity path.

    ``two_pass`` (``matmul_impl="pallas_a8x2"``): a second int8 dot over the
    residual r = x − sx·q1 at scale sx/254 captures ~15 bits of the
    activation — the combined quantization error (~2⁻¹⁴ of the group max)
    sits BELOW the reference's own fp16 dot-accumulation error
    (matrix.cuh:125-129), at the a8 kernel's convert-free streaming rate.
    Costs two extra MXU int8 dots per group (the kernel is DMA-bound, so
    ~free) and the VPU residual math on the [bm, gs] activation tile."""
    if have_norm:
        assert not have_xmap
        nw_ref, rest = rest[0], rest[1:]
    if have_xmap:
        sb_ref, im_ref, out_ref, acc_ref, x_scr = rest
    else:
        out_ref, acc_ref = rest[0], rest[1]
        xn_scr = rest[2] if have_norm else None
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if have_norm:
        @pl.when((pl.program_id(1) == 0) & (k_idx == 0))
        def _():
            xf = x_ref[:].astype(jnp.float32)
            ms = jnp.mean(xf * xf, axis=1, keepdims=True)
            xn = xf * jax.lax.rsqrt(ms + eps) * nw_ref[0].astype(jnp.float32)
            xn_scr[:] = xn.astype(xn_scr.dtype)

    if have_xmap:
        _permute_prologue(
            x_ref, sb_ref, im_ref, x_scr, block_k, x_ref.shape[0]
        )
        xsrc = x_scr
    elif have_norm:
        xsrc = xn_scr
    else:
        xsrc = x_ref
    b8 = pltpu.bitcast(qw_ref[:], jnp.int8)       # [bk, bn/2]
    s = s_ref[0].astype(jnp.float32)
    z = z_ref[0].astype(jnp.float32)
    half = PAIR_HALF
    nsub = b8.shape[1] // half
    gs = groupsize
    for g in range(block_k // gs):
        blk = b8[g * gs : (g + 1) * gs, :]        # [gs, bn/2] int8
        hv8 = blk & (-16)                         # int8: 16 q_hi - 128
        xg = xsrc[:, g * gs : (g + 1) * gs].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xg), axis=1, keepdims=True)   # [bm, 1]
        sx = jnp.maximum(amax, 1e-20) * (1.0 / 127.0)
        xq = jnp.clip(jnp.round(xg / sx), -127, 127).astype(jnp.int8)

        def nibble_dots(q8):
            da = jax.lax.dot_general(
                q8, blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            db = jax.lax.dot_general(
                q8, hv8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            qs = q8.astype(jnp.int32).sum(axis=1, keepdims=True)  # [bm, 1]
            return (
                (da - db).astype(jnp.float32),              # Σ q8·q_lo
                ((db >> 4) + 8 * qs).astype(jnp.float32),   # Σ q8·q_hi
            )

        lo, hi = nibble_dots(xq)
        lo = lo * sx
        hi = hi * sx
        if two_pass:
            # residual pass: r = x − sx·q1, |r| ≤ sx/2; at scale sx/254 the
            # residual spans the full int8 range
            r = xg - xq.astype(jnp.float32) * sx
            sx2 = sx * (1.0 / 254.0)
            xq2 = jnp.clip(jnp.round(r / sx2), -127, 127).astype(jnp.int8)
            lo2, hi2 = nibble_dots(xq2)
            lo = lo + lo2 * sx2
            hi = hi + hi2 * sx2
        # zero-point term is independent of the activation quantization —
        # use the exact Σx (already in f32) rather than sx·Σxq
        xs = xg.sum(axis=1, keepdims=True)
        for sub in range(nsub):
            sl = slice(sub * half, (sub + 1) * half)
            lo_c = slice(sub * N_ALIGN, sub * N_ALIGN + half)
            hi_c = slice(sub * N_ALIGN + half, (sub + 1) * N_ALIGN)
            acc_ref[:, lo_c] += lo[:, sl] * s[g : g + 1, lo_c] - xs * z[
                g : g + 1, lo_c
            ]
            acc_ref[:, hi_c] += hi[:, sl] * s[g : g + 1, hi_c] - xs * z[
                g : g + 1, hi_c
            ]

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _npair_dequant_block(b8, s, z, groupsize, block_k, dtype):
    """[bk, bn/2] bytes + [gsz, bn] scales → [bk, bn] dequantized tile.
    Handles bn spanning several N_ALIGN pair-blocks."""
    half = PAIR_HALF
    nsub = b8.shape[1] // half
    gs = groupsize
    parts = []
    for g in range(block_k // gs):
        row = []
        for sub in range(nsub):
            blk = b8[g * gs : (g + 1) * gs, sub * half : (sub + 1) * half]
            bval = blk.astype(jnp.float32)
            hv = (blk & (-16)).astype(jnp.float32)
            q_lo = bval - hv                      # exact nibble
            lo_c = slice(sub * N_ALIGN, sub * N_ALIGN + half)
            hi_c = slice(sub * N_ALIGN + half, (sub + 1) * N_ALIGN)
            w_lo = q_lo * s[g : g + 1, lo_c] - z[g : g + 1, lo_c]
            w_hi = hv * (s[g : g + 1, hi_c] * 0.0625) + (
                s[g : g + 1, hi_c] * 8.0 - z[g : g + 1, hi_c]
            )
            row.append(w_lo.astype(dtype))
            row.append(w_hi.astype(dtype))
        parts.append(jnp.concatenate(row, axis=1))
    return jnp.concatenate(parts, axis=0)         # [bk, bn]


def _q4_deqw_kernel_npair(
    x_ref,        # [bm, bk]
    qw_ref,       # [bk/4, bn/2]
    s_ref,        # [1, bk/gs, bn]
    z_ref,
    out_ref,      # [bm, bn]
    acc_ref,      # [bm, bn] f32 scratch
    *,
    groupsize: int,
    block_k: int,
    out_dtype,
):
    """Prefill kernel over the npair layout: dequantize the tile, one MXU
    matmul per block."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b8 = pltpu.bitcast(qw_ref[:], jnp.int8)
    w = _npair_dequant_block(
        b8, s_ref[0].astype(jnp.float32), z_ref[0].astype(jnp.float32),
        groupsize, block_k, x_ref.dtype,
    )
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _q4_deqw_kernel(
    x_ref,        # [bm, bk]
    qw_ref,       # [bk/8, bn]
    s_ref,        # [1, bk/gs, bn]
    z_ref,        # [1, bk/gs, bn]
    out_ref,      # [bm, bn]
    acc_ref,      # [bm, bn] f32 scratch
    *,
    groupsize: int,
    block_k: int,
    out_dtype,
):
    """Prefill/large-M: dequantize the weight tile to bf16 once per k-step
    (amortized over M rows) and do one MXU matmul over the block."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b8 = pltpu.bitcast(qw_ref[:], jnp.int8)
    s = s_ref[0].astype(jnp.float32)              # stored bf16, compute f32
    z = z_ref[0].astype(jnp.float32)
    half = groupsize // 2
    parts = []
    for g in range(block_k // groupsize):
        blk = b8[g * half : (g + 1) * half, :]
        sg = s[g : g + 1, :]
        zg = z[g : g + 1, :]
        lo_w = (blk & 0x0F).astype(jnp.float32) * sg - zg
        hv = (blk & (-16)).astype(jnp.float32)
        hi_w = hv * (sg * 0.0625) + (sg * 8.0 - zg)
        parts.append(lo_w.astype(x_ref.dtype))
        parts.append(hi_w.astype(x_ref.dtype))
    w = jnp.concatenate(parts, axis=0)            # [bk, bn]
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _q4_deqw2_kernel(
    x_ref,        # [bm, K]       (whole K)
    qw_ref,       # [K/8, bn]
    s_ref,        # [1, K/gs, bn]
    z_ref,        # [1, K/gs, bn]
    out_ref,      # [bm, bn]
    w_scr,        # [K, bn] bf16 scratch — the dequantized weight tile
    *,
    groupsize: int,
    block_k: int,
    out_dtype,
):
    """Prefill kernel v2: dequantize each [K, bn] weight tile ONCE into VMEM
    scratch (at the first M step of each N column block) and reuse it across
    all M tiles. The v1 kernel re-dequantized per M tile — ~8x redundant VPU
    work at M=2048 — the TPU analogue of the reference reconstructing into
    temp_dq once and looping cuBLAS over it (q4_matmul.cu:301-344).
    Grid is (N, M) with M innermost; requires whole-K blocks."""
    m_idx = pl.program_id(1)
    half = groupsize // 2

    @pl.when(m_idx == 0)
    def _():
        b8 = pltpu.bitcast(qw_ref[:], jnp.int8)
        s = s_ref[0].astype(jnp.float32)
        z = z_ref[0].astype(jnp.float32)
        for g in range(block_k // groupsize):
            blk = b8[g * half : (g + 1) * half, :]
            sg = s[g : g + 1, :]
            zg = z[g : g + 1, :]
            lo_w = (blk & 0x0F).astype(jnp.float32) * sg - zg
            hv = (blk & (-16)).astype(jnp.float32)
            hi_w = hv * (sg * 0.0625) + (sg * 8.0 - zg)
            w_scr[g * groupsize : g * groupsize + half, :] = lo_w.astype(
                jnp.bfloat16
            )
            w_scr[g * groupsize + half : (g + 1) * groupsize, :] = (
                hi_w.astype(jnp.bfloat16)
            )

    out_ref[:] = jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w_scr[:],
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _deqw2_npair_store(qw_ref, s_ref, z_ref, w_scr, groupsize, block_k):
    """Dequantize an npair [K/4, bn/2] qweight block into the [K, bn] bf16
    scratch (shared by the plain and overlapped deqw2 kernels)."""
    b8 = pltpu.bitcast(qw_ref[:], jnp.int8)
    s = s_ref[0].astype(jnp.float32)
    z = z_ref[0].astype(jnp.float32)
    gs = groupsize
    half = N_ALIGN // 2
    for sub in range(b8.shape[1] // half):   # 1024-col output sub-blocks
        qcols = slice(sub * half, (sub + 1) * half)
        lo_c = slice(sub * N_ALIGN, sub * N_ALIGN + half)
        hi_c = slice(sub * N_ALIGN + half, (sub + 1) * N_ALIGN)
        for g in range(block_k // gs):
            blk = b8[g * gs : (g + 1) * gs, qcols]
            bval = blk.astype(jnp.float32)
            hv = (blk & (-16)).astype(jnp.float32)
            s_lo = s[g : g + 1, lo_c]
            s_hi = s[g : g + 1, hi_c]
            z_lo = z[g : g + 1, lo_c]
            z_hi = z[g : g + 1, hi_c]
            w_scr[g * gs : (g + 1) * gs, lo_c] = (
                (bval - hv) * s_lo - z_lo
            ).astype(jnp.bfloat16)
            w_scr[g * gs : (g + 1) * gs, hi_c] = (
                hv * (s_hi * 0.0625) + (s_hi * 8.0 - z_hi)
            ).astype(jnp.bfloat16)


def _q4_deqw2_kernel_npair(
    x_ref,        # [bm, K]
    qw_ref,       # [K/4, bn/2]
    s_ref,        # [1, K/gs, bn]
    z_ref,
    out_ref,      # [bm, bn]
    w_scr,        # [K, bn] bf16 scratch
    *,
    groupsize: int,
    block_k: int,
    out_dtype,
):
    """npair variant of the cached-dequant prefill kernel (see
    _q4_deqw2_kernel)."""
    m_idx = pl.program_id(1)

    @pl.when(m_idx == 0)
    def _():
        _deqw2_npair_store(qw_ref, s_ref, z_ref, w_scr, groupsize, block_k)

    out_ref[:] = jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w_scr[:],
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _q4_deqw2_kernel_npair_glu(
    x_ref,        # [bm, W] — the RAW fused gate||up matmul output
    qw_ref,       # [K/4, bn/2]
    s_ref,        # [1, K/gs, bn]
    z_ref,
    out_ref,      # [bm, bn]
    w_scr,        # [K, bn] bf16 scratch
    *,
    groupsize: int,
    block_k: int,
    out_dtype,
    glu_ni: int,  # true intermediate width (gate cols [0, ni))
    glu_ou: int,  # up offset (up cols [ou, ou+ni)) in the fused output
):
    """deqw2 with the SwiGLU prologue fused in: the down-proj consumes
    silu(gate)·up computed from the raw fused gate/up tile inside the
    kernel, so the [M, inter] activation never materializes in HBM
    (~128 MB/layer of glue traffic at 7B prefill). The silu·mul recomputes
    per N block — a few VPU passes, ~20x cheaper than the HBM round-trip.
    """
    m_idx = pl.program_id(1)

    @pl.when(m_idx == 0)
    def _():
        _deqw2_npair_store(qw_ref, s_ref, z_ref, w_scr, groupsize, block_k)

    g = x_ref[:, :glu_ni].astype(jnp.float32)
    u = x_ref[:, glu_ou : glu_ou + glu_ni]
    a = (g * jax.lax.logistic(g)).astype(jnp.bfloat16) * u
    out_ref[:] = jnp.dot(
        a, w_scr[:], preferred_element_type=jnp.float32
    ).astype(out_dtype)


def _q4_deqw2_kernel_npair_ovl(
    x_ref,        # [bm, K]
    qw_ref,       # [K/4, bn/2] — block j, except block j+1 at the LAST m step
    s_ref,        # [1, K/gs, bn] — shifted in lockstep with qw_ref
    z_ref,
    out_ref,      # [bm, bn]
    w_scr,        # [2, K, bn] bf16 scratch, double-buffered per N block
    *,
    groupsize: int,
    block_k: int,
    out_dtype,
):
    """Overlapped deqw2: the serialized per-N-block dequant (VPU) is the
    whole gap between the measured prefill matmul rate and the bf16 MXU
    peak, so dequantize N block j+1 DURING the last M-step dot of block j.
    The qw/s/z index maps hand this kernel block j+1 at (j, last m) — an
    extra fetch that doubles as prefetch — and the two ops (VPU stores to
    buffer (j+1)%2, MXU dot from buffer j%2) are independent, so Mosaic
    schedules them together. Only N block 0 still pays the serialization.
    Requires >= 2 M steps (the caller falls back to the plain kernel)."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    num_n = pl.num_programs(0)
    num_m = pl.num_programs(1)

    @pl.when((j == 0) & (i == 0))
    def _():
        _deqw2_npair_store(
            qw_ref, s_ref, z_ref, w_scr.at[0], groupsize, block_k
        )

    @pl.when((i == num_m - 1) & (j + 1 < num_n))
    def _():
        _deqw2_npair_store(
            qw_ref, s_ref, z_ref, w_scr.at[(j + 1) % 2], groupsize, block_k
        )

    out_ref[:] = jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w_scr[j % 2],
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _a8_requant_store(qw_ref, s_ref, z_ref, ws_ref, w_scr, groupsize,
                      block_k):
    """Dequantize an npair qweight block and RE-quantize it to per-column
    int8 into ``w_scr``, against the PRECOMPUTED column scales in
    ``ws_ref`` ([1, bn] f32, colmax/127 — static per weight, attached at
    load or computed by a fused XLA reduce in the caller). Shared by the
    plain and overlapped a8 prefill kernels.

    One statically-unrolled store pass, the same shape as the bf16
    _deqw2_npair_store (which Mosaic handles up to 70B's 224 groups). Two
    designs failed before landing here (round 5): the in-kernel amax
    needed a SECOND unrolled pass and crashed the Mosaic compile at 33B's
    down-proj (140 groups), and a fori_loop variant hit Mosaic's
    dynamic-sublane-index limits on the per-group scale loads
    (vector.load of [1, gsz, bn] at a dynamic middle index). Precomputed
    static scales + static slices are both legal and small.
    """
    gs = groupsize
    half = N_ALIGN // 2
    b8 = pltpu.bitcast(qw_ref[:], jnp.int8)
    s = s_ref[0].astype(jnp.float32)
    z = z_ref[0].astype(jnp.float32)
    for sub in range(qw_ref.shape[1] // half):
        qcols = slice(sub * half, (sub + 1) * half)
        lo_c = slice(sub * N_ALIGN, sub * N_ALIGN + half)
        hi_c = slice(sub * N_ALIGN + half, (sub + 1) * N_ALIGN)
        inv_lo = 1.0 / jnp.maximum(ws_ref[0:1, lo_c], 1e-22)
        inv_hi = 1.0 / jnp.maximum(ws_ref[0:1, hi_c], 1e-22)
        for g in range(block_k // gs):
            blk = b8[g * gs : (g + 1) * gs, qcols]
            bval = blk.astype(jnp.float32)
            hv = (blk & (-16)).astype(jnp.float32)
            w_lo = (bval - hv) * s[g : g + 1, lo_c] - z[g : g + 1, lo_c]
            w_hi = hv * (s[g : g + 1, hi_c] * 0.0625) + (
                s[g : g + 1, hi_c] * 8.0 - z[g : g + 1, hi_c]
            )
            rows = slice(g * gs, (g + 1) * gs)
            w_scr[rows, lo_c] = jnp.clip(
                jnp.round(w_lo * inv_lo), -127, 127
            ).astype(jnp.int8)
            w_scr[rows, hi_c] = jnp.clip(
                jnp.round(w_hi * inv_hi), -127, 127
            ).astype(jnp.int8)


def _q4_prefill_kernel_npair_a8(
    x_ref,        # [bm, K]
    qw_ref,       # [K/4, bn/2]
    s_ref,        # [1, K/gs, bn]
    z_ref,
    ws_ref,       # [1, bn] f32 per-column int8 scales (colmax/127, static)
    out_ref,      # [bm, bn]
    w_scr,        # [K, bn] int8 re-quantized weight scratch
    *,
    groupsize: int,
    block_k: int,
    out_dtype,
):
    """W4A8 turbo prefill, 'deqw8' design: once per N-block the dequantized
    weights are RE-quantized to per-column int8 in VMEM against the
    precomputed static column scales (the cached-dequant trick of
    _q4_deqw2_kernel_npair with an int8 target); every M tile then runs
    ONE full-K int8 MXU dot (~2x the bf16 MXU rate on v5e) plus a single
    [bm, bn] rescale by (row activation scale x column weight scale).

    This replaces the first a8t design, which reused the decode a8 GEMV
    math at M=256 — its per-(group, sub-block) f32 rescales scale with
    M x K/gs and measured 0.67x the EXACT prefill (round 3). Error: weight
    re-quant <= colmax/254, activation per-row int8 <= rowmax/254; noisier
    than decode turbo, opt-in (--turbo_prefill)."""
    m_idx = pl.program_id(1)

    @pl.when(m_idx == 0)
    def _():
        _a8_requant_store(
            qw_ref, s_ref, z_ref, ws_ref, w_scr, groupsize, block_k
        )

    xf = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)       # [bm, 1]
    sx = jnp.maximum(amax, 1e-20) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_scr[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (
        acc.astype(jnp.float32) * sx * ws_ref[0:1, :]
    ).astype(out_dtype)


def _q4_prefill_kernel_npair_a8_ovl(
    x_ref,        # [bm, K]
    qw_ref,       # [K/4, bn/2] — block j, except block j+1 at the LAST m step
    s_ref,        # [1, K/gs, bn] — shifted in lockstep with qw_ref
    z_ref,
    ws_ref,       # [1, bn] f32 — shifted in lockstep with qw_ref
    ws_cur_ref,   # [1, bn] f32 — always block j (for the epilogue rescale)
    out_ref,      # [bm, bn]
    w_scr,        # [2, K, bn] int8 scratch, double-buffered per N block
    *,
    groupsize: int,
    block_k: int,
    out_dtype,
):
    """Overlapped deqw8 (OPT-IN, EXL_A8_OVL=1 — measured negative like the
    bf16 variant, see the dispatch comment): re-quantize N block j+1 during
    the last M-step dots of block j. Requires >= 2 M steps."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    num_n = pl.num_programs(0)
    num_m = pl.num_programs(1)

    @pl.when((j == 0) & (i == 0))
    def _():
        _a8_requant_store(
            qw_ref, s_ref, z_ref, ws_ref, w_scr.at[0], groupsize, block_k,
        )

    @pl.when((i == num_m - 1) & (j + 1 < num_n))
    def _():
        _a8_requant_store(
            qw_ref, s_ref, z_ref, ws_ref, w_scr.at[(j + 1) % 2],
            groupsize, block_k,
        )

    xf = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)       # [bm, 1]
    sx = jnp.maximum(amax, 1e-20) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_scr[j % 2], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (
        acc.astype(jnp.float32) * sx * ws_cur_ref[0:1, :]
    ).astype(out_dtype)


DEQW2_VMEM_BUDGET = 100 * 1024 * 1024
# The a8 kernels' Mosaic footprint runs hotter than the estimate below
# (int8 scratch stores pay extra copies): at 33B's down-proj (K=17920,
# bm=256, est ~57 MB) the compile helper aborts under the 110 MB limit.
# A tighter fit budget forces smaller M tiles on big-K shapes.
DEQW2_VMEM_BUDGET_A8 = 55 * 1024 * 1024


def _deqw2_vmem_bytes(
    k: int, bn: int, bm: int, groupsize: int, a8: bool = False,
    ovl: bool = False,
) -> int:
    return (
        # dequantized scratch: bf16, or int8 + col scales for deqw8 (a8);
        # x2 when the overlapped kernels double-buffer it
        ((k * bn + 8 * bn * 4) if a8 else k * bn * 2) * (2 if ovl else 1)
        + (k // 8) * bn * 4 * 2      # qweight blocks, double buffered
        + bm * k * 2 * 2             # x blocks
        + (k // groupsize) * bn * 2 * 4
        + bm * bn * 2 * 2            # out blocks
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "groupsize", "block_n", "out_dtype", "layout", "interpret", "a8",
        "block_m", "overlap", "glu",
    ),
)
def _q4_matmul_deqw2_call(
    x2: jax.Array,       # [M, K] — M padded to a block multiple
    qweight: jax.Array,  # [K/4, N_pad/2] (npair) | [K/8, N_pad] (kgroup)
    scales: jax.Array,   # [K/gs, N_pad]
    zscale: jax.Array,   # [K/gs, N_pad]
    ws: "jax.Array | None" = None,   # [1, N_pad] f32 col scales (a8 only)
    *,
    groupsize: int,
    block_n: int,
    out_dtype,
    layout: str = "kgroup",
    interpret: bool,
    a8: bool = False,
    block_m: "int | None" = None,
    overlap: bool = False,
    glu: "tuple[int, int] | None" = None,   # (ni, ou): x2 is raw gate||up
):
    m, w_in = x2.shape
    k = (
        qweight.shape[0] * (4 if layout == "npair" else 8)
        if glu is not None
        else w_in
    )
    n_pad = scales.shape[1]
    bm = block_m if block_m is not None else _choose_block_m(m)
    assert m % bm == 0, (m, bm)
    gsz = k // groupsize
    num_n = n_pad // block_n
    num_m = m // bm
    grid = (num_n, num_m)   # M innermost: scratch reused
    scales3 = scales.reshape(1, gsz, n_pad)
    zscale3 = zscale.reshape(1, gsz, n_pad)
    overlap = overlap and layout == "npair" \
        and num_m >= 2 and num_n >= 2
    if glu is not None:
        assert layout == "npair" and not a8 and not overlap
        assert glu[1] + glu[0] <= w_in and glu[0] == k, (glu, w_in, k)
        kern_fn = functools.partial(
            _q4_deqw2_kernel_npair_glu, glu_ni=glu[0], glu_ou=glu[1],
        )
    elif a8 and overlap:
        assert ws is not None
        kern_fn = _q4_prefill_kernel_npair_a8_ovl
    elif a8:
        assert layout == "npair" and ws is not None
        kern_fn = _q4_prefill_kernel_npair_a8
    elif overlap:
        kern_fn = _q4_deqw2_kernel_npair_ovl
    else:
        kern_fn = (
            _q4_deqw2_kernel_npair if layout == "npair" else _q4_deqw2_kernel
        )
    kernel = functools.partial(
        kern_fn, groupsize=groupsize, block_k=k, out_dtype=out_dtype,
    )
    if overlap:
        # hand the kernel N block j+1 at the LAST m step of block j, so the
        # next block's dequant overlaps this block's dot (see the kernel)
        def wblock(j, i):
            return jnp.where(
                i == num_m - 1, jnp.minimum(j + 1, num_n - 1), j
            )
    else:
        def wblock(j, i):
            return j
    flops = 2 * m * k * n_pad
    bytes_accessed = (
        k * n_pad // 2
        + m * k * x2.dtype.itemsize * (n_pad // block_n)
        + 2 * gsz * n_pad * scales.dtype.itemsize
        + m * n_pad * jnp.dtype(out_dtype).itemsize
    )
    if a8 and overlap:
        scratch = [pltpu.VMEM((2, k, block_n), jnp.int8)]
    elif a8:
        scratch = [pltpu.VMEM((k, block_n), jnp.int8)]
    elif overlap:
        scratch = [pltpu.VMEM((2, k, block_n), jnp.bfloat16)]
    else:
        scratch = [pltpu.VMEM((k, block_n), jnp.bfloat16)]
    ws_args = ()
    ws_specs = []
    if a8:
        ws_args = (ws,)
        ws_specs = [
            pl.BlockSpec((1, block_n), lambda j, i: (0, wblock(j, i)),
                         memory_space=pltpu.VMEM),
        ]
        if overlap:
            # the epilogue needs block j's scales even at the step where
            # the shifted stream already carries block j+1
            ws_args = (ws, ws)
            ws_specs = ws_specs + [
                pl.BlockSpec((1, block_n), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
            ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, w_in), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (k // 4, block_n // 2)
                if layout == "npair"
                else (k // 8, block_n),
                lambda j, i: (0, wblock(j, i)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, gsz, block_n),
                         lambda j, i: (0, 0, wblock(j, i)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gsz, block_n),
                         lambda j, i: (0, 0, wblock(j, i)),
                         memory_space=pltpu.VMEM),
        ] + ws_specs,
        out_specs=pl.BlockSpec((bm, block_n), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), out_dtype),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, qweight, scales3, zscale3, *ws_args)


# ---------------------------------------------------------------------------
# Block choosers
# ---------------------------------------------------------------------------

GEMV_VMEM_BUDGET = 34 * 1024 * 1024

# Target upper bound on bytes streamed per grid step in the GEMV kernels.
# Steps much smaller than this pay the ~0.6 µs/step fixed cost (measured:
# 774 GB/s at 4 × 2 MB steps vs ~600 GB/s at 11+ steps on wide-N matrices);
# steps need to stay small enough to double-buffer within the VMEM budget.
# Round-3 sweep on the fused-kernel GEMV phases found 2-6 MB optimal
# (12 MB loses ~4 tok/s at 7B, 25 MB halves throughput once the block
# pairs crowd VMEM); the standalone kernels follow the same cap. Env
# override for experiments.
GEMV_STEP_BYTES_MAX = int(
    os.environ.get("EXL_GEMV_STEP_BYTES_MAX", 4 * 1024 * 1024)
)


def _choose_gemv_blocks_npair(
    k: int,
    n_pad: int,
    groupsize: int,
    bm: int = 8,
    require_whole_k: bool = False,
) -> "tuple[int, int | None]":
    """Joint (block_n, block_k) choice for the npair GEMV kernels.

    Minimizes total grid steps subject to: step bytes ≤ GEMV_STEP_BYTES_MAX,
    ≥ 2 steps (so DMA/compute pipeline), VMEM budget. ``require_whole_k``
    restricts to bk == K (the in-kernel act-order permute needs it).
    Returns (bn, bk); bk is None if no candidate fits (caller falls back).
    """
    step = math.lcm(groupsize, 128)
    best = None
    for bn in range(N_ALIGN, n_pad + 1, N_ALIGN):
        if n_pad % bn != 0:
            continue
        bks = [
            bk
            for bk in range(step, k + 1, step)
            if k % bk == 0
            and (not require_whole_k or bk == k)
            and _vmem_bytes(bk, bn, bm, groupsize) <= GEMV_VMEM_BUDGET
        ]
        if not bks:
            continue
        bk = max(bks)
        steps = (n_pad // bn) * (k // bk)
        step_bytes = bk * bn // 2
        ok = step_bytes <= GEMV_STEP_BYTES_MAX and steps >= 2
        key = (ok, -steps, bn)
        if best is None or key > best[0]:
            best = (key, bn, bk)
    if best is None:
        return N_ALIGN, None
    return best[1], best[2]


def _vmem_bytes(bk: int, bn: int, bm: int, groupsize: int) -> int:
    """Scoped-VMEM footprint of one kernel instance (double-buffered
    streams counted twice)."""
    return (
        (bk // 8) * bn * 4 * 2       # qweight block, int32, 2 buffers
        + bm * bk * 2 * 2            # x block, bf16, 2 buffers
        + (bk // groupsize) * bn * 2 * 4   # scales + zscale blocks (bf16)
        + bm * bn * 4                # f32 accumulator
        + bm * bn * 2 * 2            # out block
    )


def _choose_block_n(n_pad: int, preferred: int = 1024) -> int:
    """Output-column block: divisor of N_pad, lane-legal (multiple of 128
    or the whole dim)."""
    cands = [
        bn
        for bn in range(128, n_pad + 1, 128)
        if n_pad % bn == 0
    ]
    if not cands:
        return n_pad
    at_most = [bn for bn in cands if bn <= preferred]
    return max(at_most) if at_most else min(cands)


def _choose_block_k(
    k: int, groupsize: int, bn: int, bm: int = 8
) -> int:
    """K block: must divide K, align to quant groups, keep the x-tile lane
    dim 128-aligned. Bigger is better on v5e (fewer grid steps, larger
    DMAs), bounded by the kernel's scoped-VMEM budget."""
    step = math.lcm(groupsize, 128)
    cands = [
        bk
        for bk in range(step, k + 1, step)
        if k % bk == 0
        and _vmem_bytes(bk, bn, bm, groupsize) <= GEMV_VMEM_BUDGET
    ]
    if not cands:
        raise ValueError(f"no valid block_k for K={k}, gs={groupsize}")
    return max(cands)


def _choose_block_m(m: int) -> int:
    for cap in (8, 16, 32, 64, 128, 256):
        if m <= cap:
            return cap
    return 256


# ---------------------------------------------------------------------------
# pallas_call wrapper (shared by both kernels)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=(
        "groupsize", "block_k", "block_n", "out_dtype", "kernel_kind",
        "layout", "interpret", "norm_eps", "a8_two_pass",
    ),
)
def _q4_matmul_pallas_call(
    x2: jax.Array,       # [M, K] — M already padded to a block multiple
    qweight: jax.Array,  # [K/4, N_pad/2] (npair) | [K/8, N_pad] (kgroup)
    scales: jax.Array,   # [K/gs, N_pad]
    zscale: jax.Array,   # [K/gs, N_pad]
    sb: "jax.Array | None" = None,   # [1, K] int32 x_map // 128 (in-kernel
    im: "jax.Array | None" = None,   # [1, K] int32 x_map % 128   permute)
    nw: "jax.Array | None" = None,   # [1, K] rms-norm weight (fused norm)
    *,
    groupsize: int,
    block_k: int,
    block_n: int,
    out_dtype,
    kernel_kind: str,    # "gemv" | "gemv_a8" | "deqw"
    layout: str = "kgroup",
    interpret: bool,
    norm_eps: float = 1e-6,
    a8_two_pass: bool = False,
):
    m, k = x2.shape
    n_pad = scales.shape[1]
    bm = _choose_block_m(m)
    assert m % bm == 0
    grid = (m // bm, n_pad // block_n, k // block_k)
    gsz = block_k // groupsize
    scales3 = scales.reshape(k // block_k, gsz, n_pad)
    zscale3 = zscale.reshape(k // block_k, gsz, n_pad)
    have_xmap = sb is not None
    have_norm = nw is not None
    if have_xmap:
        assert layout == "npair" and kernel_kind in ("gemv", "gemv_a8")
        assert block_k == k, "in-kernel permute needs whole-K blocks"
    if have_norm:
        assert layout == "npair" and not have_xmap
        assert kernel_kind in ("gemv", "gemv_a8")
        assert block_k == k, "fused norm needs whole-K blocks"
    if layout == "npair":
        kern = {
            "gemv": _q4_gemv_kernel_npair,
            "gemv_a8": _q4_gemv_kernel_npair_a8,
            "deqw": _q4_deqw_kernel_npair,
        }[kernel_kind]
    else:
        assert kernel_kind != "gemv_a8", "a8 requires the npair layout"
        kern = _q4_gemv_kernel if kernel_kind == "gemv" else _q4_deqw_kernel
    if kernel_kind in ("gemv", "gemv_a8") and layout == "npair":
        kernel = functools.partial(
            kern, groupsize=groupsize, block_k=block_k, out_dtype=out_dtype,
            have_xmap=have_xmap,
        )
        kernel = functools.partial(
            kernel, have_norm=have_norm, eps=norm_eps
        )
        if kernel_kind == "gemv_a8":
            kernel = functools.partial(kernel, two_pass=a8_two_pass)
    else:
        kernel = functools.partial(
            kern, groupsize=groupsize, block_k=block_k, out_dtype=out_dtype
        )
    flops = 2 * m * k * n_pad
    bytes_accessed = (
        k * n_pad // 2
        + m * k * x2.dtype.itemsize
        + 2 * (k // groupsize) * n_pad * scales.dtype.itemsize
        + m * n_pad * jnp.dtype(out_dtype).itemsize
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, block_k), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_k // 4, block_n // 2)
                if layout == "npair"
                else (block_k // 8, block_n),
                lambda i, j, kk: (kk, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, gsz, block_n), lambda i, j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gsz, block_n), lambda i, j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
        ] + ([
            pl.BlockSpec((1, k), lambda i, j, kk: (0, 0),
                         memory_space=pltpu.VMEM),
        ] if have_norm else []) + ([
            pl.BlockSpec((1, k), lambda i, j, kk: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j, kk: (0, 0),
                         memory_space=pltpu.VMEM),
        ] if have_xmap else []),
        out_specs=pl.BlockSpec((bm, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, block_n), jnp.float32)] + (
            [pltpu.VMEM((bm, k), x2.dtype)] if (have_xmap or have_norm)
            else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            # Mosaic's actual scoped need for the deqw grid runs ~2.3x the
            # _vmem_bytes estimate (extra window buffering across the 3-D
            # grid); 64 MiB OOMs at 70B shapes (K=28672, measured round 3).
            # GEMV decode kernels stay at 64 MiB — their footprint is small
            # and a larger cap invites the compiler to over-buffer.
            vmem_limit_bytes=(100 if kernel_kind == "deqw" else 64)
            * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, qweight, scales3, zscale3,
      *((nw,) if have_norm else ()),
      *((sb, im) if have_xmap else ()))


# M at or below this runs the gemv kernel; above it the deqw kernel.
# Analogue of the reference's matmul_recons_thd (exllama_ext.cpp:217-239).
GEMV_MAX_M = 32


def _w8_matmul_kernel(
    xq_ref,      # [bm, K] int8 (row-quantized activations)
    sx_ref,      # [bm, 1] f32 per-row activation scales
    w8_ref,      # [K, bn] int8
    ws_ref,      # [1, bn] f32 per-column weight scales
    out_ref,     # [bm, bn]
    *,
    out_dtype,
):
    acc = jax.lax.dot_general(
        xq_ref[:], w8_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (
        acc.astype(jnp.float32) * sx_ref[:] * ws_ref[:]
    ).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "interpret")
)
def _q4_matmul_w8(
    x2: jax.Array,        # [M, K] bf16/f32
    w8: jax.Array,        # [K, N_pad] int8 (load-time re-quantized weight)
    w8_scale: jax.Array,  # [1, N_pad] f32
    out_dtype,
    interpret: bool = False,
) -> jax.Array:
    """Turbo-prefill matmul against the resident int8 weight image.

    Per-row symmetric int8 activation quant (same scheme as the a8 GEMV,
    error <= rowmax/254 per element) happens once in XLA; the dot runs in a
    minimal Pallas kernel — one s8xs8->s32 MXU dot per [bm, bn] tile with
    the (row x column)-scale rescale fused into the epilogue, so the int32
    accumulator never touches HBM. (A plain XLA dot_general leaves the
    rescale unfused: at N=12288 the int32 round-trip erased the entire
    int8-rate win — measured 177 TFLOP/s vs this kernel's target ~2x bf16.)
    """
    m, k = x2.shape
    n_pad = w8.shape[1]
    xf = x2.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)   # [M, 1]
    sx = jnp.maximum(amax, 1e-20) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)

    bn = N_ALIGN if n_pad % N_ALIGN == 0 else n_pad
    # VMEM accounting (ADVICE r4): full-K blocks at bm=2048 overflow the
    # 110 MB cap once K is large (70B down-proj K=28672: the double-
    # buffered int8 x block alone is ~117 MB). Shrink bm until the double-
    # buffered x + w8 blocks and the f32 out tile fit.
    budget = 100 * 1024 * 1024

    def w8_vmem(bm_):
        return (
            bm_ * k * 2          # xq int8, double buffered
            + k * bn * 2         # w8 int8 block, double buffered
            + bm_ * 4 * 2        # sx
            + bn * 4 * 2         # ws
            + bm_ * bn * 4 * 2   # out tile
        )

    bm = min(-(-m // 8) * 8, 2048)
    while bm > 8 and w8_vmem(bm) > budget:
        bm //= 2
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        xq = jnp.pad(xq, ((0, m_pad - m), (0, 0)))
        sx = jnp.pad(sx, ((0, m_pad - m), (0, 0)))
    grid = (n_pad // bn, m_pad // bm)
    out = pl.pallas_call(
        functools.partial(_w8_matmul_kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n_pad,
            bytes_accessed=k * n_pad + m_pad * k * (n_pad // bn)
            + 2 * m_pad * n_pad,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xq, sx, w8, w8_scale)
    return out[:m]


# In-kernel act-order permute applies up to this many 128-lane blocks of K
# (the masked-gather decomposition is O(nblk²) unrolled ops; beyond this the
# XLA gather is competitive and compile time is not).
KERNEL_PERMUTE_MAX_BLOCKS = 112


def _w8_col_scale(qt: QuantTensor) -> jax.Array:
    """Per-column int8 re-quantization scale (colmax/127) of the
    dequantized weight — the same formula as formats.gptq._build_w8, so
    the in-kernel requant path is numerically identical to the resident-w8
    image. [1, N_pad] f32."""
    w = dequantize_xla(qt, dtype=jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    return jnp.maximum(amax, 1e-20) * (1.0 / 127.0)


def _glu_silu_mul(x: jax.Array, ni: int, ou: int) -> jax.Array:
    """XLA fallback for the fused-GLU prologue: silu(gate)·up from the raw
    fused gate||up matmul output (gate cols [0, ni), up cols [ou, ou+ni))."""
    g = x[..., :ni].astype(jnp.float32)
    u = x[..., ou : ou + ni]
    return (jax.nn.silu(g)).astype(u.dtype) * u


def _q4_matmul_pallas(
    x: jax.Array, qt: QuantTensor, interpret: bool, a8: bool = False,
    a8_prefill: bool = False, a8_two_pass: bool = False,
    norm_w: "jax.Array | None" = None, norm_eps: float = 1e-6,
    glu: "tuple[int, int] | None" = None,
) -> jax.Array:
    if glu is not None:
        ni, ou = glu
        *lead_g, w_in = x.shape
        m_g = 1
        for d in lead_g:
            m_g *= d
        fusable = (
            m_g > GEMV_MAX_M
            and qt.layout == "npair"
            and qt.x_map is None
            and norm_w is None
            and not a8_prefill
            and qt.in_features == ni
            and ni % qt.groupsize == 0
            and ni % 128 == 0
            and ou % 128 == 0
            and ou + ni <= w_in
            and qt.padded_out_features % N_ALIGN == 0
        )
        if fusable:
            bm_g = _choose_block_m(m_g)
            m_pad_g = -(-m_g // bm_g) * bm_g
            bm2 = next(
                (
                    c
                    for c in (bm_g, 128, 64, 32)
                    if c <= bm_g
                    and m_pad_g % c == 0
                    and _deqw2_vmem_bytes(ni, N_ALIGN, c, qt.groupsize)
                    + c * (w_in - ni) * 2 * 2 <= DEQW2_VMEM_BUDGET
                ),
                None,
            )
            if bm2 is not None:
                x2g = x.reshape(m_g, w_in)
                if m_pad_g != m_g:
                    x2g = jnp.pad(x2g, ((0, m_pad_g - m_g), (0, 0)))
                out = _q4_matmul_deqw2_call(
                    x2g, qt.qweight, qt.scales, qt.zscale,
                    groupsize=qt.groupsize, block_n=N_ALIGN,
                    out_dtype=jnp.dtype(x.dtype), layout="npair",
                    interpret=interpret, block_m=bm2, glu=(ni, ou),
                )
                out = out[:m_g, : qt.out_features]
                return out.reshape(*lead_g, qt.out_features)
        # fallback: materialize silu(gate)·up and run the normal path
        x = _glu_silu_mul(x, ni, ou)

    *lead, k = x.shape
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)
    bm = _choose_block_m(m)
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    kind = "gemv" if m <= GEMV_MAX_M else "deqw"
    if a8_prefill and kind == "deqw" and qt.w8 is not None:
        # resident-int8 turbo prefill: the weight was re-quantized ONCE at
        # load (formats.gptq.with_w8) — no in-kernel dequant at all, just a
        # full-K s8xs8->s32 MXU dot that XLA tiles itself. Handles act-order
        # via the same pre-gather as the other prefill paths.
        if norm_w is not None:
            from exllama_tpu.ops.norms import rms_norm

            x2 = rms_norm(x2, norm_w, norm_eps)
        if qt.x_map is not None:
            x2 = jnp.take(x2, qt.x_map, axis=1)
        out = _q4_matmul_w8(
            x2, qt.w8, qt.w8_scale, jnp.dtype(x.dtype),
            interpret=interpret or not _is_tpu(),
        )
        out = out[:m, : qt.out_features]
        return out.reshape(*lead, qt.out_features)
    prefill_a8 = False
    if a8 and kind == "gemv" and qt.layout == "npair":
        kind = "gemv_a8"   # W4A8 turbo decode path
    elif a8_prefill and kind == "deqw" and qt.layout == "npair":
        # full-turbo prefill (matmul_impl="pallas_a8t"): int8 MXU dots at
        # ~2x the bf16 rate. A separate opt-in beyond "pallas_a8": unlike
        # turbo decode (one token's path), prefill quantizes every
        # activation of every layer and the noise compounds through the KV
        # cache (~3% of logit scale at depth 2, growing with depth).
        # act-order rides the same activation pre-gather as every other
        # prefill path (applied below, before the deqw2 call).
        prefill_a8 = True
    n_pad = qt.padded_out_features
    deqw2_bn = int(os.environ.get("DEQW2_BN", str(N_ALIGN)))
    bk_pref = None
    if qt.layout == "npair" and kind in ("gemv", "gemv_a8"):
        # in-kernel act-order permute needs whole-K blocks; try that first
        want_whole_k = (
            qt.x_map is not None
            and k % 128 == 0
            and k // 128 <= KERNEL_PERMUTE_MAX_BLOCKS
        )
        bn, bk_pref = _choose_gemv_blocks_npair(
            k, n_pad, qt.groupsize, bm, require_whole_k=want_whole_k
        )
        if bk_pref is None:
            want_whole_k = False
            bn, bk_pref = _choose_gemv_blocks_npair(k, n_pad, qt.groupsize, bm)
    else:
        want_whole_k = False
        bn = _choose_block_n(n_pad)
        if qt.layout == "npair":
            assert bn == N_ALIGN, (bn, n_pad)  # one pair block per step

    nw = None
    if norm_w is not None:
        # fused norm prologue needs whole-K gemv blocks without act-order;
        # otherwise normalize here (before any x_map gather) and proceed
        if kind in ("gemv", "gemv_a8") and qt.layout == "npair" \
                and qt.x_map is None and bk_pref == k:
            nw = norm_w.reshape(1, k).astype(x2.dtype)
        else:
            from exllama_tpu.ops.norms import rms_norm

            x2 = rms_norm(x2, norm_w, norm_eps)

    sb = im = None
    if qt.x_map is not None:
        kernel_perm = want_whole_k and bk_pref == k
        if kernel_perm:
            xm = qt.x_map.astype(jnp.int32)
            sb = (xm // 128)[None, :]
            im = (xm % 128)[None, :]
        else:
            x2 = jnp.take(x2, qt.x_map, axis=1)

    bn2 = deqw2_bn if (qt.layout == "npair" and n_pad % deqw2_bn == 0) else bn
    if kind == "deqw" and k % qt.groupsize == 0:
        # The [K, bn] dequant scratch + qweight stream dominate the deqw2
        # VMEM footprint at large K (70B down-proj: K=28672); shrinking the
        # M tile is the only free knob (bn must stay a multiple of N_ALIGN
        # for the npair sub-block loop). Take the largest fitting M tile.
        # Prefer the overlapped kernel (double scratch) when it fits.
        def fit_bm(ovl):
            budget = (
                DEQW2_VMEM_BUDGET_A8 if prefill_a8 else DEQW2_VMEM_BUDGET
            )
            return next(
                (
                    c
                    for c in (bm, 128, 64, 32)
                    if c <= bm
                    and m_pad % c == 0
                    and (not ovl or m_pad // c >= 2)
                    and _deqw2_vmem_bytes(
                        k, bn2, c, qt.groupsize, a8=prefill_a8, ovl=ovl
                    )
                    <= budget
                ),
                None,
            )

        # Overlap (double-buffered scratch, requant/dequant of N block j+1
        # during block j's dots):
        #   * bf16 deqw2 — MEASURED NEGATIVE (round 4): the doubled
        #     [2, K, bn] bf16 scratch costs more in VMEM/pipelining than
        #     the dequant it hides (K=11008 down 154 -> 96 TFLOP/s).
        #     Kept opt-in (EXL_DEQW2_OVL=1).
        #   * a8 deqw8 — ALSO MEASURED NEGATIVE (round 5, same pathology
        #     despite the half-size int8 scratch): 13B down 1.50 -> 4.47 ms,
        #     33B qkv 2.20 -> 6.20 (micro_prefill13 A/B on hardware). The
        #     requant serialization it was meant to hide is cheaper than
        #     the pipelining the doubled scratch costs. Opt-in EXL_A8_OVL=1.
        if prefill_a8:
            use_ovl = (
                qt.layout == "npair"
                and n_pad // bn2 >= 2
                and os.environ.get("EXL_A8_OVL", "0") == "1"
            )
        else:
            use_ovl = (
                qt.layout == "npair"
                and n_pad // bn2 >= 2
                and os.environ.get("EXL_DEQW2_OVL", "0") == "1"
            )
        bm2 = fit_bm(True) if use_ovl else None
        if bm2 is None:
            use_ovl = False
            bm2 = fit_bm(False)
        if bm2 is not None:
            ws = None
            if prefill_a8:
                # static per-column int8 scales: from the resident image's
                # metadata when attached, else one fused dequant+reduce
                # (XLA fuses it into the reduction — no materialization
                # under the caller's jit)
                ws = (
                    qt.w8_scale
                    if qt.w8_scale is not None
                    else _w8_col_scale(qt)
                )
            out = _q4_matmul_deqw2_call(
                x2,
                qt.qweight,
                qt.scales,
                qt.zscale,
                ws,
                groupsize=qt.groupsize,
                block_n=bn2,
                out_dtype=jnp.dtype(x.dtype),
                layout=qt.layout,
                interpret=interpret,
                a8=prefill_a8,
                block_m=bm2,
                overlap=use_ovl,
            )
            out = out[:m, : qt.out_features]
            return out.reshape(*lead, qt.out_features)
    bk = (
        bk_pref
        if bk_pref is not None
        else _choose_block_k(k, qt.groupsize, bn, bm=bm)
    )
    out = _q4_matmul_pallas_call(
        x2,
        qt.qweight,
        qt.scales,
        qt.zscale,
        sb,
        im,
        nw,
        groupsize=qt.groupsize,
        block_k=bk,
        block_n=bn,
        out_dtype=jnp.dtype(x.dtype),
        kernel_kind=kind,
        layout=qt.layout,
        interpret=interpret,
        norm_eps=float(norm_eps),
        a8_two_pass=a8_two_pass,
    )
    out = out[:m, : qt.out_features]
    return out.reshape(*lead, qt.out_features)


# ---------------------------------------------------------------------------
# Public entry point
# ---------------------------------------------------------------------------

def q4_matmul(
    x: jax.Array,
    qt: QuantTensor,
    impl: str = "auto",
    lora: "tuple[jax.Array, jax.Array] | None" = None,
    norm_w: "jax.Array | None" = None,
    norm_eps: float = 1e-6,
    glu: "tuple[int, int] | None" = None,
) -> jax.Array:
    """``x @ dequant(qt)`` with optional fused LoRA and fused input norm.

    x: [..., in_features]. Returns [..., out_features] in x.dtype.

    ``lora`` is an (A, B) pair of [in_features, r] and [r, out_features]
    matrices (B pre-scaled by alpha/r at load, like reference lora.py:103);
    the low-rank contribution is added to the quantized matmul, mirroring
    q4_matmul_lora (exllama_ext.cpp:245-324).

    ``norm_w``: compute ``rms_norm(x, norm_w, norm_eps) @ dequant(qt)`` —
    on the decode GEMV path the norm rides along in the kernel prologue
    (one fewer dispatch per projection); elsewhere it is applied up front.
    Mutually exclusive with ``lora`` (adapters consume the normed x).
    """
    assert qt.tp_segments == 1, (
        "q4_matmul on a tp-retiled global view: the tensor's stored layout "
        "is per-shard segments (formats/gptq.retile_*_for_tp) and only "
        "valid inside shard_map after localize_for_tp — route this call "
        "through forward_chunk(mesh=...)"
    )
    if glu is None:
        assert x.shape[-1] == qt.in_features, (x.shape, qt.in_features)
    else:
        assert lora is None and norm_w is None, "glu composes with neither"
        assert glu[1] + glu[0] <= x.shape[-1], (glu, x.shape)
    if impl == "auto":
        impl = "pallas" if _is_tpu() else "xla"
    if norm_w is not None:
        assert lora is None, "fused norm + lora unsupported; norm first"
        if not impl.startswith("pallas"):
            from exllama_tpu.ops.norms import rms_norm

            x = rms_norm(x, norm_w, norm_eps)
            norm_w = None

    # pallas paths resolve the act-order permutation themselves (in-kernel
    # when the shape allows, pre-gather otherwise)
    if impl == "xla":
        if glu is not None:
            x = _glu_silu_mul(x, *glu)
        x_q = (
            jnp.take(x, qt.x_map, axis=-1) if qt.x_map is not None else x
        )
        out = _q4_matmul_xla(x_q, qt)
    elif impl.startswith("pallas"):
        base = impl[: -len("_interpret")] if impl.endswith("_interpret") \
            else impl
        if base not in ("pallas", "pallas_a8", "pallas_a8t", "pallas_a8x2"):
            raise ValueError(f"unknown q4_matmul impl: {impl}")
        out = _q4_matmul_pallas(
            x, qt,
            interpret=impl.endswith("_interpret"),
            a8=base != "pallas",
            # 't' suffix = turbo prefill too (int8 MXU dots at prefill M)
            a8_prefill=base.endswith("t"),
            a8_two_pass=base.startswith("pallas_a8x2"),
            norm_w=norm_w, norm_eps=norm_eps, glu=glu,
        )
    else:
        raise ValueError(f"unknown q4_matmul impl: {impl}")

    if lora is not None:
        out = out + lora_delta(x, lora)
    return out


def lora_delta(x: jax.Array, lora) -> jax.Array:
    """Low-rank LoRA contribution ``x @ A @ B``.

    A/B may be [in, r]/[r, out] (one adapter for the whole batch) or
    [B, in, r]/[B, r, out] (per-row adapters — continuous-batching slots
    each carrying their own adapter; zero rows = slot without adapter).
    """
    a, b = lora
    if a.ndim == 2:
        return jnp.dot(
            jnp.dot(x, a.astype(x.dtype), preferred_element_type=jnp.float32)
            .astype(x.dtype),
            b.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    xr = jnp.einsum(
        "bti,bir->btr", x, a.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return jnp.einsum(
        "btr,bro->bto", xr, b.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
