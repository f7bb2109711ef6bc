"""Fused 4-bit dequant + matmul — the hot op of the whole framework.

TPU-native re-design of the reference's q4_matmul
(exllama_ext/cuda_func/q4_matmul.cu). The reference splits into two paths by
row count: a hand-written GEMV CUDA kernel for decode (q4_matmul.cu:87-235)
and dequantize-then-cuBLAS for prefill (q4_matmul.cu:301-344). Here both are
one Pallas kernel family — the same fused dequant+MXU-matmul with
M-dependent tile shapes — plus a pure-XLA fallback (dequantize + jnp.dot)
that serves as the cross-validation oracle, exactly the reference's own
validation trick (test_benchmark_inference.py:239-246).

Weight layout: see formats/gptq.py. Per (bk × PANEL) tile the kernel
  1. DMAs the int32 word tile [bk, LANE] (this is the HBM-bandwidth-bound
     stream at decode: 4 bits/weight — speed of light),
  2. unpacks 8 nibbles with shift/mask and concatenates along lanes into the
     [bk, PANEL] quantized tile in true column order (no gathers: the panel
     repack at load time did the shuffling once),
  3. dequantizes per quantization group g: w = q * scales[g] - zscale[g],
  4. feeds the MXU: acc += x_tile @ w_tile, fp32 accumulation.

Act-order models permute the activation's feature axis by x_map before the
kernel (the reference's column_remap, cuda_func/column_remap.cu) — rows of
the stored weight are already group-sequential.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exllama_tpu.formats.gptq import LANE, PANEL, QuantTensor


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# XLA path: on-device dequantize (from the panel layout) + jnp.dot.
# Analogue of the reference's reconstruct+cuBLAS path (q4_matmul.cu:301-344)
# and the correctness oracle for the Pallas kernel.
# ---------------------------------------------------------------------------

def dequantize_xla(qt: QuantTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize the panel-layout weight on device → [K, N_pad]."""
    k, nw = qt.qweight.shape
    p = nw // LANE
    u = jax.lax.bitcast_convert_type(qt.qweight, jnp.uint32)
    u = u.reshape(k, p, LANE)
    nibs = [(u >> jnp.uint32(4 * i)) & jnp.uint32(0xF) for i in range(8)]
    # [K, P, 8, LANE] → [K, P*8*LANE]; true column = p*PANEL + i*LANE + j
    q = jnp.stack(nibs, axis=2).reshape(k, p * PANEL).astype(jnp.float32)
    gs = qt.groupsize
    s = jnp.repeat(qt.scales.astype(jnp.float32), gs, axis=0)
    zs = jnp.repeat(qt.zscale.astype(jnp.float32), gs, axis=0)
    return (q * s - zs).astype(dtype)


def _q4_matmul_xla(x: jax.Array, qt: QuantTensor) -> jax.Array:
    w = dequantize_xla(qt, dtype=x.dtype)
    out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return out[..., : qt.out_features].astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas kernels
#
# Two members of one family, selected by M (the reference switches between a
# custom GEMV kernel and reconstruct+cuBLAS at matmul_recons_thd the same way,
# exllama_ext.cpp:217-239):
#
#   * ``gps`` (group-partial-sums) — the decode/small-M kernel. Per quant
#     group g it computes the *raw* nibble dot p_g = x_g @ q_g on the MXU and
#     applies the scale to the [M, PANEL] partial sum instead of to the
#     [gs, PANEL] weight tile — per-OUTPUT math instead of per-WEIGHT math,
#     which removes the f32 multiply/sub per weight that made the VPU the
#     bottleneck at M=1. The zero-point term is exact:
#         out[m,n] = Σ_g s[g,n]·(x_g·q_g)[m,n] − Σ_g (Σ_{k∈g} x[m,k])·zscale[g,n]
#     and the second term is one tiny [M, G]@[G, PANEL] matmul seeded into the
#     accumulator at k-step 0 (the reference's ``no_zero`` accumulate trick,
#     q4_matmul.cu:78-82, turned inside the kernel). Measured ~900 GB/s
#     effective on a 4096² GEMV on v5e — at the HBM roofline.
#
#   * ``deqw`` (dequantized-weights) — the prefill/large-M kernel: dequantize
#     the [bk, PANEL] weight tile to bf16 once and do one MXU matmul per
#     k-step. At large M the MXU dominates (measured ~130 TFLOP/s at M=2048
#     on v5e); the per-weight dequant amortizes over M rows.
# ---------------------------------------------------------------------------

def _q4_gemv_kernel(
    x_ref,        # [bm, bk]           activation tile (bf16/f32)
    qw_ref,       # [bk, LANE]         packed words (int32)
    s_ref,        # [1, bk/gs, PANEL]  scales (f32)
    zs_ref,       # [1, bk/gs, PANEL]  zscale (f32)
    out_ref,      # [bm, PANEL]
    acc_ref,      # [bm, PANEL] f32 scratch
    *,
    groupsize: int,
    block_k: int,
    out_dtype,
):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = s_ref[0]   # [bk/gs, PANEL]
    zs = zs_ref[0]
    for g in range(block_k // groupsize):
        sl = slice(g * groupsize, (g + 1) * groupsize)
        w32 = qw_ref[sl, :]                               # [gs, LANE] int32
        nibs = [(w32 >> (4 * i)) & 0xF for i in range(8)]
        q = jnp.concatenate(nibs, axis=1).astype(jnp.bfloat16)  # [gs, PANEL]
        xg = x_ref[:, sl]
        p = jnp.dot(xg, q, preferred_element_type=jnp.float32)
        # zero-point term: (Σ_k x) · zscale per group — per-output math
        xsg = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc_ref[:] += p * s[g : g + 1, :] - xsg * zs[g : g + 1, :]

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


GEMV_VMEM_BUDGET = 24 * 1024 * 1024


def _gemv_vmem_bytes(bk: int, bm: int, groupsize: int, g_total: int) -> int:
    """Scoped-VMEM footprint of one gemv kernel instance (double-buffered
    streams counted twice)."""
    return (
        bk * LANE * 4 * 2            # qweight block, int32, 2 buffers
        + bm * bk * 2 * 2            # x block, bf16, 2 buffers
        + (bk // groupsize) * PANEL * 4 * 4   # scales + zscale blocks
        + bm * PANEL * 4             # f32 accumulator
        + bm * PANEL * 2 * 2         # out block
    )


def _choose_block_k_gemv(k: int, groupsize: int, bm: int = 8) -> int:
    """K block for the gemv kernel: must divide K, align to quant groups,
    and keep the x-tile lane dimension 128-aligned. Bigger is better
    (measured on v5e: K=11008 whole-K block is 2x faster than 256-row
    blocks — fewer grid steps, larger DMAs), bounded by the kernel's
    scoped-VMEM budget."""
    import math

    step = math.lcm(groupsize, 128)
    g_total = k // groupsize
    cands = [
        bk
        for bk in range(step, k + 1, step)
        if k % bk == 0
        and _gemv_vmem_bytes(bk, bm, groupsize, g_total) <= GEMV_VMEM_BUDGET
    ]
    if not cands:
        raise ValueError(f"no valid gemv block_k for K={k}, gs={groupsize}")
    return max(cands)


@functools.partial(
    jax.jit,
    static_argnames=("groupsize", "block_k", "out_dtype", "interpret"),
)
def _q4_matmul_pallas_gemv(
    x2: jax.Array,       # [M, K] — M already padded to a block multiple
    qweight: jax.Array,  # [K, N_pad/8]
    scales: jax.Array,   # [K/gs, N_pad]
    zscale: jax.Array,   # [K/gs, N_pad]
    *,
    groupsize: int,
    block_k: int,
    out_dtype,
    interpret: bool,
):
    m, k = x2.shape
    n_pad = qweight.shape[1] * 8
    bm = m  # decode shapes: one m-block
    grid = (1, n_pad // PANEL, k // block_k)
    gsz = block_k // groupsize
    scales3 = scales.reshape(k // block_k, gsz, n_pad)
    zscale3 = zscale.reshape(k // block_k, gsz, n_pad)
    kernel = functools.partial(
        _q4_gemv_kernel,
        groupsize=groupsize,
        block_k=block_k,
        out_dtype=out_dtype,
    )
    flops = 2 * m * k * n_pad
    bytes_accessed = (
        k * n_pad // 2
        + m * k * x2.dtype.itemsize
        + 2 * (k // groupsize) * n_pad * 4
        + m * n_pad * jnp.dtype(out_dtype).itemsize
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, block_k), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, LANE), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gsz, PANEL), lambda i, j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gsz, PANEL), lambda i, j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, PANEL), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, PANEL), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, qweight, scales3, zscale3)


def _q4_matmul_kernel(
    x_ref,        # [bm, bk]           activation tile (bf16/f32)
    qw_ref,       # [bk, LANE]         packed words (int32)
    s_ref,        # [1, bk/gs, PANEL]  scales (f32)
    z_ref,        # [1, bk/gs, PANEL]  zero*scale (f32)
    out_ref,      # [bm, PANEL]
    acc_ref,      # [bm, PANEL] f32 scratch
    *,
    groupsize: int,
    block_k: int,
    out_dtype,
):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Dequantize group by group, concatenating *values* (never a VMEM
    # scratch: a scratch store/reload here serializes Mosaic's pipeline and
    # measured 33x slower), then do one MXU matmul over the block.
    s = s_ref[0]  # [bk/gs, PANEL]
    z = z_ref[0]
    parts = []
    for g in range(block_k // groupsize):
        sl = slice(g * groupsize, (g + 1) * groupsize)
        # Arithmetic shift on int32 is safe here: the &0xF mask kills any
        # sign-extension bits (Mosaic has no uint32→f32 cast).
        w32 = qw_ref[sl, :]                               # [gs, LANE] int32
        nibs = [(w32 >> (4 * i)) & 0xF for i in range(8)]
        q = jnp.concatenate(nibs, axis=1).astype(jnp.float32)  # [gs, PANEL]
        parts.append(
            (q * s[g : g + 1, :] - z[g : g + 1, :]).astype(x_ref.dtype)
        )
    w = jnp.concatenate(parts, axis=0)                    # [bk, PANEL]

    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _choose_block_k(k: int, groupsize: int, preferred: int) -> int:
    for bk in (preferred, 1024, 512, 256, 128, 64, 32, groupsize):
        if bk % groupsize == 0 and bk % 8 == 0 and k % bk == 0 and bk <= k:
            return bk
    raise ValueError(f"no valid block_k for K={k}, groupsize={groupsize}")


def _choose_block_m(m: int) -> int:
    if m <= 8:
        return 8
    if m <= 16:
        return 16
    if m <= 32:
        return 32
    if m <= 64:
        return 64
    if m <= 128:
        return 128
    return 256


@functools.partial(
    jax.jit,
    static_argnames=("groupsize", "block_k", "out_dtype", "interpret"),
)
def _q4_matmul_pallas_2d(
    x2: jax.Array,       # [M, K] — M already padded to a block multiple
    qweight: jax.Array,  # [K, N_pad/8]
    scales: jax.Array,   # [K/gs, N_pad]
    zscale: jax.Array,   # [K/gs, N_pad]
    *,
    groupsize: int,
    block_k: int,
    out_dtype,
    interpret: bool,
):
    m, k = x2.shape
    n_pad = qweight.shape[1] * 8
    bm = _choose_block_m(m)
    assert m % bm == 0
    grid = (m // bm, n_pad // PANEL, k // block_k)

    kernel = functools.partial(
        _q4_matmul_kernel,
        groupsize=groupsize,
        block_k=block_k,
        out_dtype=out_dtype,
    )
    gsz = block_k // groupsize
    # Reshape scales so each k-step's groups are a full middle axis — block
    # shape (1, gsz, PANEL) is then legal for any gsz (the TPU lowering
    # requires sublane-dim blocks divisible by 8 *or* equal to the array
    # dim). Row-major reshape, so it's free.
    scales3 = scales.reshape(k // block_k, gsz, n_pad)
    zscale3 = zscale.reshape(k // block_k, gsz, n_pad)
    flops = 2 * m * k * n_pad
    bytes_accessed = (
        k * n_pad // 2
        + m * k * x2.dtype.itemsize
        + 2 * (k // groupsize) * n_pad * 4
        + m * n_pad * jnp.dtype(out_dtype).itemsize
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, block_k), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, LANE), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gsz, PANEL), lambda i, j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gsz, PANEL), lambda i, j, kk: (kk, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, PANEL), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, PANEL), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x2, qweight, scales3, zscale3)


# M at or below this runs the gps GEMV kernel; above it the deqw kernel.
# Analogue of the reference's matmul_recons_thd (exllama_ext.cpp:217-239),
# except both sides here are fused Pallas kernels.
GEMV_MAX_M = 256


def _q4_matmul_pallas(x: jax.Array, qt: QuantTensor, interpret: bool) -> jax.Array:
    *lead, k = x.shape
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)

    if m <= GEMV_MAX_M:
        bm = _choose_block_m(m)
        m_pad = -(-m // bm) * bm
        if m_pad != m:
            x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
        out = _q4_matmul_pallas_gemv(
            x2,
            qt.qweight,
            qt.scales,
            qt.zscale,
            groupsize=qt.groupsize,
            block_k=_choose_block_k_gemv(k, qt.groupsize, bm=m_pad),
            out_dtype=jnp.dtype(x.dtype),
            interpret=interpret,
        )
        out = out[:m, : qt.out_features]
        return out.reshape(*lead, qt.out_features)

    bm = _choose_block_m(m)
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    block_k = _choose_block_k(k, qt.groupsize, preferred=512)
    out = _q4_matmul_pallas_2d(
        x2,
        qt.qweight,
        qt.scales,
        qt.zscale,
        groupsize=qt.groupsize,
        block_k=block_k,
        out_dtype=jnp.dtype(x.dtype),
        interpret=interpret,
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
) -> jax.Array:
    """``x @ dequant(qt)`` with optional fused LoRA.

    x: [..., in_features]. Returns [..., out_features] in x.dtype.

    ``lora`` is an (A, B) pair of [in_features, r] and [r, out_features]
    matrices (B pre-scaled by alpha/r at load, like reference lora.py:103);
    the low-rank contribution is added to the quantized matmul, mirroring
    q4_matmul_lora (exllama_ext.cpp:245-324).
    """
    assert x.shape[-1] == qt.in_features, (x.shape, qt.in_features)
    if qt.x_map is not None:
        x_q = jnp.take(x, qt.x_map, axis=-1)
    else:
        x_q = x

    if impl == "auto":
        impl = "pallas" if _is_tpu() else "xla"

    if impl == "xla":
        out = _q4_matmul_xla(x_q, qt)
    elif impl == "pallas":
        out = _q4_matmul_pallas(x_q, qt, interpret=False)
    elif impl == "pallas_interpret":
        out = _q4_matmul_pallas(x_q, qt, interpret=True)
    else:
        raise ValueError(f"unknown q4_matmul impl: {impl}")

    if lora is not None:
        a, b = lora
        out = out + jnp.dot(
            jnp.dot(x, a.astype(x.dtype), preferred_element_type=jnp.float32)
            .astype(x.dtype),
            b.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    return out
