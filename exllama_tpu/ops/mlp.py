"""Fused MLP block: post-norm → gate/up GEMV → SiLU·mul → down GEMV →
residual add, in ONE Pallas kernel call.

TPU-native analogue of the reference's q4_mlp megakernel
(exllama_ext/cuda_func/q4_mlp.cu:100-199), which fuses the whole MLP to cut
kernel-launch overhead. Under XLA the elementwise glue already fuses, but
each Pallas matmul is still its own custom call with ~5-9 µs fixed dispatch
cost on v5e; at decode (M ≤ 32) the MLP is two of the five Pallas calls per
layer plus the norm/silu/residual XLA kernels between them. This kernel
replaces all of it with a single two-phase grid:

  phase A (steps 0..A-1): xn = rms_norm(h)·w  (prologue, step 0), then the
      npair q4 GEMV of xn against gate/up column blocks, partials written to
      a VMEM f32 scratch.
  boundary (step A):      mid = silu(gate)·up  (bf16, matching the unfused
      path's cast order exactly).
  phase B (steps A..A+B): npair q4 GEMV of mid against down column blocks,
      epilogue adds the residual h and writes the output block.

Weight blocks for the inactive phase are pinned by clamped index maps, so
the pipeline fetches each block exactly once; down block 0 prefetches
during phase A. Numerics match the unfused pallas path operation-for-
operation (same group math, same cast points) — the only divergence is
rsqrt provenance in the norm (Mosaic vs XLA, ≤1 ulp f32).

Used for decode shapes only (M ≤ 32); prefill keeps the cached-dequant
matmul kernels where MXU utilization, not launch count, dominates.
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

GEMV_MAX_M = 32
# Per-grid-step weight-block byte cap for the fused kernels' GEMV phases.
# Swept on v5e (round 3): 2-6 MB is a flat optimum (a8x2 ~143 tok/s at
# 7B), 12 MB loses ~4 tok/s, 25 MB halves throughput (block pairs crowd
# VMEM and the pipeline loses its double buffering). Env override for
# experiments only.
_STEP_BYTES_MAX = int(
    os.environ.get("EXL_STEP_BYTES_MAX", 4 * 1024 * 1024)
)
_VMEM_BUDGET = 96 * 1024 * 1024


def _npair_gemv_partials(x, b8, s, z, groupsize, a8=False, a8x2=False):
    """One npair GEMV block: x [bm, bk] · packed [bk, bn/2] → list of
    (lo, hi) f32 [bm, PAIR_HALF] partial pairs, one per N_ALIGN sub-block.
    Same math as ops/quant._q4_gemv_kernel_npair; with ``a8`` the W4A8
    turbo math of _q4_gemv_kernel_npair_a8 (per-(row, group) int8-quantized
    activations feeding int8 MXU dots, exact int32 affine recovery); with
    ``a8x2`` its two-pass residual variant (quantization error ~2⁻¹⁴)."""
    gs = groupsize
    bk = x.shape[1]
    half = PAIR_HALF
    nsub = b8.shape[1] // half
    acc_lo = [jnp.zeros((x.shape[0], half), jnp.float32) for _ in range(nsub)]
    acc_hi = [jnp.zeros((x.shape[0], half), jnp.float32) for _ in range(nsub)]
    for g in range(bk // gs):
        blk = b8[g * gs : (g + 1) * gs, :]
        if a8:
            hv8 = blk & (-16)
            xg = x[:, g * gs : (g + 1) * gs].astype(jnp.float32)
            amax = jnp.max(jnp.abs(xg), axis=1, keepdims=True)
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
                qs = q8.astype(jnp.int32).sum(axis=1, keepdims=True)
                return (
                    (da - db).astype(jnp.float32),             # Σ q8·q_lo
                    ((db >> 4) + 8 * qs).astype(jnp.float32),  # Σ q8·q_hi
                )

            lo, hi = nibble_dots(xq)
            lo = lo * sx
            hi = hi * sx
            if a8x2:
                r = xg - xq.astype(jnp.float32) * sx
                sx2 = sx * (1.0 / 254.0)
                xq2 = jnp.clip(
                    jnp.round(r / sx2), -127, 127
                ).astype(jnp.int8)
                lo2, hi2 = nibble_dots(xq2)
                lo = lo + lo2 * sx2
                hi = hi + hi2 * sx2
            xs = xg.sum(axis=1, keepdims=True)
            for sub in range(nsub):
                sl = slice(sub * half, (sub + 1) * half)
                lo_c = slice(sub * N_ALIGN, sub * N_ALIGN + half)
                hi_c = slice(sub * N_ALIGN + half, (sub + 1) * N_ALIGN)
                acc_lo[sub] += lo[:, sl] * s[g : g + 1, lo_c] \
                    - xs * z[g : g + 1, lo_c]
                acc_hi[sub] += hi[:, sl] * s[g : g + 1, hi_c] \
                    - xs * z[g : g + 1, hi_c]
            continue
        bval = blk.astype(jnp.bfloat16)           # 16 q_hi - 128 + q_lo
        hv = (blk & (-16)).astype(jnp.bfloat16)   # 16 q_hi - 128
        xg = x[:, g * gs : (g + 1) * gs]
        d1 = jnp.dot(xg, bval, preferred_element_type=jnp.float32)
        d2 = jnp.dot(xg, hv, preferred_element_type=jnp.float32)
        xs = xg.astype(jnp.float32).sum(axis=1, keepdims=True)
        for sub in range(nsub):
            sl = slice(sub * half, (sub + 1) * half)
            lo_c = slice(sub * N_ALIGN, sub * N_ALIGN + half)
            hi_c = slice(sub * N_ALIGN + half, (sub + 1) * N_ALIGN)
            acc_lo[sub] += (d1[:, sl] - d2[:, sl]) * s[g : g + 1, lo_c] \
                - xs * z[g : g + 1, lo_c]
            acc_hi[sub] += (d2[:, sl] * 0.0625 + xs * 8.0) * s[
                g : g + 1, hi_c
            ] - xs * z[g : g + 1, hi_c]
    return acc_lo, acc_hi


def _rms_norm_into(src_ref, w_ref, eps, dst_scr):
    """Shared norm prologue: dst = rms_norm(src[:, :true]) · w, reading only
    the TRUE hidden columns (src may carry zero-padded columns when
    hidden %% N_ALIGN != 0). One definition so the fused-MLP kernel and the
    layer megakernel (ops/attn_block) can never drift numerically."""
    k1w = w_ref.shape[1]
    xf = src_ref[:, :k1w].astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=1, keepdims=True)
    xn = xf * jax.lax.rsqrt(ms + eps) * w_ref[0].astype(jnp.float32)
    dst_scr[:] = xn.astype(dst_scr.dtype)


def _silu_boundary(gu_scr, inter, half_cols, mid_scr):
    """Shared boundary: mid = silu(gate)·up with the unfused path's exact
    cast order (bf16 kernel-output casts, f32 silu)."""
    g_b = gu_scr[:, :inter].astype(jnp.bfloat16)
    u_b = gu_scr[:, half_cols : half_cols + inter].astype(jnp.bfloat16)
    sg = jax.nn.silu(g_b.astype(jnp.float32)).astype(jnp.bfloat16)
    mid_scr[:] = sg * u_b


def _q4_mlp_kernel(
    h_ref,       # [bm, K1] bf16 residual input (whole hidden)
    nw_ref,      # [1, K1]  post-attention norm weight
    guq_ref,     # [K1/4, bn_a/2] int32 npair gate/up block (phase A)
    gus_ref,     # [1, K1/gs, bn_a]
    guz_ref,     # [1, K1/gs, bn_a]
    dq_ref,      # [K2/4, bn_b/2] int32 down block (phase B)
    ds_ref,      # [1, K2/gs, bn_b]
    dz_ref,      # [1, K2/gs, bn_b]
    out_ref,     # [bm, bn_b]
    xn_scr,      # [bm, K1] bf16 normed activation
    gu_scr,      # [bm, N_gu_pad] f32 gate/up output
    mid_scr,     # [bm, K2] bf16 silu(gate)·up
    *,
    groupsize: int,
    steps_a: int,
    bn_a: int,
    inter: int,
    gu_half_cols: int,   # padded_n(inter): column offset of `up` in gu_scr
    eps: float,
    a8: bool = False,
    a8x2: bool = False,
):
    t = pl.program_id(1)

    # ---- phase A prologue: rms_norm(h) · w, once per M block
    # (h may carry zero-padded columns beyond the true hidden width when
    # hidden % N_ALIGN != 0 — e.g. 33B's 6656 → 7168; the norm reads only
    # the true columns, whose width is nw's)
    @pl.when(t == 0)
    def _():
        _rms_norm_into(h_ref, nw_ref, eps, xn_scr)

    # ---- phase A: gate/up GEMV into gu_scr columns [t·bn_a, (t+1)·bn_a)
    @pl.when(t < steps_a)
    def _():
        b8 = pltpu.bitcast(guq_ref[:], jnp.int8)
        s = gus_ref[0].astype(jnp.float32)
        z = guz_ref[0].astype(jnp.float32)
        acc_lo, acc_hi = _npair_gemv_partials(
            xn_scr[:], b8, s, z, groupsize, a8=a8, a8x2=a8x2
        )
        base = pl.multiple_of(t * bn_a, bn_a)
        for sub in range(len(acc_lo)):
            gu_scr[:, pl.ds(base + sub * N_ALIGN, PAIR_HALF)] = acc_lo[sub]
            gu_scr[
                :, pl.ds(base + sub * N_ALIGN + PAIR_HALF, PAIR_HALF)
            ] = acc_hi[sub]

    # ---- boundary: mid = silu(gate)·up with the unfused path's exact casts
    @pl.when(t == steps_a)
    def _():
        _silu_boundary(gu_scr, inter, gu_half_cols, mid_scr)

    # ---- phase B: down GEMV + residual
    @pl.when(t >= steps_a)
    def _():
        j = t - steps_a
        b8 = pltpu.bitcast(dq_ref[:], jnp.int8)
        s = ds_ref[0].astype(jnp.float32)
        z = dz_ref[0].astype(jnp.float32)
        acc_lo, acc_hi = _npair_gemv_partials(
            mid_scr[:], b8, s, z, groupsize, a8=a8, a8x2=a8x2
        )
        bn_b = out_ref.shape[1]
        base = pl.multiple_of(j * bn_b, bn_b)
        for sub in range(len(acc_lo)):
            lo_c = slice(sub * N_ALIGN, sub * N_ALIGN + PAIR_HALF)
            hi_c = slice(sub * N_ALIGN + PAIR_HALF, (sub + 1) * N_ALIGN)
            res_lo = h_ref[:, pl.ds(base + sub * N_ALIGN, PAIR_HALF)]
            res_hi = h_ref[
                :, pl.ds(base + sub * N_ALIGN + PAIR_HALF, PAIR_HALF)
            ]
            out_ref[:, lo_c] = res_lo + acc_lo[sub].astype(h_ref.dtype)
            out_ref[:, hi_c] = res_hi + acc_hi[sub].astype(h_ref.dtype)


def _pick_bn(n_pad: int, k: int) -> int:
    """Largest N_ALIGN-multiple divisor of n_pad whose weight-block stream
    stays under the per-step byte cap (ops/quant.GEMV_STEP_BYTES_MAX logic)."""
    best = N_ALIGN
    for bn in range(N_ALIGN, n_pad + 1, N_ALIGN):
        if n_pad % bn == 0 and k * bn // 2 <= _STEP_BYTES_MAX:
            best = bn
    return best


def _fused_mlp_vmem(k1, k2, bn_a, bn_b, n_gu, bm, gs) -> int:
    return (
        k1 * bn_a            # gate/up qweight block ×2 buffers (int32 /4·/2)
        + k2 * bn_b          # down qweight block ×2 buffers
        + (k1 // gs) * bn_a * 2 * 4 + (k2 // gs) * bn_b * 2 * 4
        + bm * (k1 * 2 * 2 + n_gu * 4 + k2 * 2 + bn_b * 2 * 2 + k1 * 2)
    )


def fused_mlp_applicable(
    gateup: "QuantTensor | None",
    down: "QuantTensor | None",
    hidden: int,
    m: int,
    matmul_impl: str,
    has_lora: bool,
) -> bool:
    """Decode-shape MLP fusion gate: npair weights, no act-order, no LoRA on
    the MLP, residual width == down's true output (non-N_ALIGN hidden sizes
    like 33B's 6656 ride the zero-padded columns — padded scale columns
    dequant to exact 0 so the pad stays 0), M small enough for the GEMV
    regime."""
    if gateup is None or down is None or has_lora:
        return False
    if matmul_impl not in ("pallas", "pallas_interpret",
                           "pallas_a8", "pallas_a8_interpret",
                           "pallas_a8t", "pallas_a8t_interpret",
                           "pallas_a8x2", "pallas_a8x2_interpret"):
        return False
    if m > GEMV_MAX_M:
        return False
    if gateup.layout != "npair" or down.layout != "npair":
        return False
    if gateup.x_map is not None or down.x_map is not None:
        return False
    if down.out_features != hidden or hidden % 128 != 0:
        return False
    if down.in_features % 128 != 0 or gateup.groupsize != down.groupsize:
        return False
    n_gu = gateup.padded_out_features
    n_out = down.padded_out_features
    bn_a = _pick_bn(n_gu, hidden)
    bn_b = _pick_bn(n_out, down.in_features)
    bm = 8 if m <= 8 else (16 if m <= 16 else 32)
    return _fused_mlp_vmem(
        n_out, down.in_features, bn_a, bn_b, n_gu, bm, gateup.groupsize
    ) <= _VMEM_BUDGET


@functools.partial(
    jax.jit,
    static_argnames=(
        "groupsize", "bn_a", "bn_b", "inter", "eps", "interpret", "a8", "a8x2"
    ),
)
def _q4_mlp_call(
    h2,          # [m_pad, K1] bf16
    nw,          # [1, K1]
    guq, gus, guz,
    dq, ds, dz,
    *,
    groupsize: int,
    bn_a: int,
    bn_b: int,
    inter: int,
    eps: float,
    interpret: bool,
    a8: bool = False,
    a8x2: bool = False,
):
    m_pad, k1p = h2.shape        # k1p = residual width (padded to n_out)
    k1 = nw.shape[1]             # true hidden = gate/up weight K
    n_gu = gus.shape[1]
    k2 = inter
    n_out = ds.shape[1]
    gsz1 = k1 // groupsize
    gsz2 = k2 // groupsize
    steps_a = n_gu // bn_a
    steps_b = n_out // bn_b
    gu_half_cols = n_gu // 2
    bm = m_pad
    kernel = functools.partial(
        _q4_mlp_kernel,
        groupsize=groupsize,
        steps_a=steps_a,
        bn_a=bn_a,
        inter=inter,
        gu_half_cols=gu_half_cols,
        eps=eps,
        a8=a8,
        a8x2=a8x2,
    )
    last_a = steps_a - 1
    flops = 2 * m_pad * (k1 * n_gu + k2 * n_out)
    bytes_accessed = (
        k1 * n_gu // 2 + k2 * n_out // 2
        + 2 * (gsz1 * n_gu + gsz2 * n_out) * 2
        + m_pad * (k1 + n_out) * 2
    )
    return pl.pallas_call(
        kernel,
        grid=(m_pad // bm, steps_a + steps_b),
        in_specs=[
            pl.BlockSpec((bm, k1p), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k1), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1 // 4, bn_a // 2),
                         lambda i, t: (0, jnp.minimum(t, last_a)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gsz1, bn_a),
                         lambda i, t: (0, 0, jnp.minimum(t, last_a)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gsz1, bn_a),
                         lambda i, t: (0, 0, jnp.minimum(t, last_a)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 // 4, bn_b // 2),
                         lambda i, t: (0, jnp.maximum(t - steps_a, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gsz2, bn_b),
                         lambda i, t: (0, 0, jnp.maximum(t - steps_a, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gsz2, bn_b),
                         lambda i, t: (0, 0, jnp.maximum(t - steps_a, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn_b), lambda i, t: (i, jnp.maximum(t - steps_a, 0)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_out), h2.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, k1), h2.dtype),      # xn: true-hidden wide
            pltpu.VMEM((bm, n_gu), jnp.float32),
            pltpu.VMEM((bm, k2), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(h2, nw, guq, gus.reshape(1, gsz1, n_gu), guz.reshape(1, gsz1, n_gu),
      dq, ds.reshape(1, gsz2, n_out), dz.reshape(1, gsz2, n_out))


def q4_mlp(
    h: jax.Array,          # [..., hidden] bf16 pre-norm residual stream
    norm_w: jax.Array,     # [hidden]
    gateup: QuantTensor,
    down: QuantTensor,
    eps: float,
    impl: str = "pallas",
) -> jax.Array:
    """h + down( silu(gate(xn)) · up(xn) ), xn = rms_norm(h, norm_w) —
    the whole MLP block in one kernel (see module docstring). Caller must
    have checked ``fused_mlp_applicable``."""
    *lead, k1 = h.shape
    m = 1
    for d in lead:
        m *= d
    h2 = h.reshape(m, k1)
    bm = 8 if m <= 8 else (16 if m <= 16 else 32)
    k1p = down.padded_out_features   # residual width inside the kernel
    if m != bm or k1p != k1:
        h2 = jnp.pad(h2, ((0, bm - m), (0, k1p - k1)))
    inter = down.in_features
    bn_a = _pick_bn(gateup.padded_out_features, k1)
    bn_b = _pick_bn(k1p, inter)
    out = _q4_mlp_call(
        h2, norm_w.reshape(1, k1).astype(h.dtype),
        gateup.qweight, gateup.scales, gateup.zscale,
        down.qweight, down.scales, down.zscale,
        groupsize=gateup.groupsize,
        bn_a=bn_a, bn_b=bn_b, inter=inter, eps=float(eps),
        interpret=impl.endswith("_interpret"),
        a8=impl.startswith("pallas_a8"),
        a8x2=impl.startswith("pallas_a8x2"),
    )
    return out[:m, :k1].reshape(*lead, k1)
