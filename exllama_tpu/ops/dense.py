"""Dense bf16 matmul helpers: a Pallas GEMV for the decode lm_head.

The lm_head is the one large UNQUANTIZED matrix on the decode path (kept
bf16 for output parity with the reference's fp16 head, model.py:845-847).
XLA's stock GEMV streams it at ~460 GB/s on v5e; this kernel uses the same
big-block streaming shape as the q4 GEMV (whole-K blocks, 1024+ lane
blocks) and reaches ~700 GB/s. Prefill shapes (M > 32) stay on jnp.dot —
they're MXU-bound and XLA is already optimal there.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GEMV_MAX_M = 32
_VMEM_BUDGET = 48 * 1024 * 1024


def _kernel(x_ref, w_ref, out_ref, acc_ref, *, out_dtype):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _divisor_block(n: int, unit: int, preferred: int) -> int:
    cands = [b for b in range(unit, n + 1, unit) if n % b == 0]
    if not cands:
        return n
    at_most = [b for b in cands if b <= preferred]
    return max(at_most) if at_most else min(cands)


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_k", "out_dtype", "interpret")
)
def _call(x2, w, *, block_n, block_k, out_dtype, interpret):
    m, k = x2.shape
    n = w.shape[1]
    grid = (1, n // block_n, k // block_k)
    return pl.pallas_call(
        functools.partial(_kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, block_k), lambda i, j, kk: (0, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda i, j, kk: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((m, block_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n * w.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, w)


def _head_argmax_kernel(
    x_ref,       # [bm, K] bf16 pre-norm hidden rows
    nw_ref,      # [1, K]  rms-norm weight
    w_ref,       # [K, bn] bf16 lm_head block
    idx_ref,     # [bm, 1] int32 output argmax
    xn_scr,      # [bm, K] bf16 normed activation
    bv_scr,      # [bm, 128] f32 running max
    bi_scr,      # [bm, 128] i32 running argmax
    *,
    bn: int,
    eps: float,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        ms = jnp.mean(xf * xf, axis=1, keepdims=True)
        xn = xf * jax.lax.rsqrt(ms + eps) * nw_ref[0].astype(jnp.float32)
        xn_scr[:] = xn.astype(xn_scr.dtype)
        bv_scr[:] = jnp.full_like(bv_scr, -jnp.inf)
        bi_scr[:] = jnp.zeros_like(bi_scr)

    lg = jnp.dot(
        xn_scr[:], w_ref[:], preferred_element_type=jnp.float32
    )  # [bm, bn]
    bmax = jnp.max(lg, axis=1, keepdims=True)
    barg = jnp.argmax(lg, axis=1).reshape(-1, 1).astype(jnp.int32) + j * bn
    upd = bmax > bv_scr[:, :1]   # strict: earlier block wins ties, like argmax
    bv_scr[:] = jnp.broadcast_to(
        jnp.where(upd, bmax, bv_scr[:, :1]), bv_scr.shape
    )
    bi_scr[:] = jnp.broadcast_to(
        jnp.where(upd, barg, bi_scr[:, :1]), bi_scr.shape
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        idx_ref[:] = bi_scr[:, :1]


@functools.partial(
    jax.jit, static_argnames=("block_n", "eps", "interpret")
)
def _head_argmax_call(x2, nw, w, *, block_n, eps, interpret):
    m, k = x2.shape
    n = w.shape[1]
    grid = (1, n // block_n)
    return pl.pallas_call(
        functools.partial(_head_argmax_kernel, bn=block_n, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((m, k), w.dtype),
            pltpu.VMEM((m, 128), jnp.float32),
            pltpu.VMEM((m, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n * w.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, nw, w)


def head_argmax(
    h: jax.Array,        # [B, 1, hidden] (or [B, hidden]) pre-final-norm
    norm_w: jax.Array,   # [hidden]
    w: jax.Array,        # [hidden, V] bf16 lm_head
    eps: float,
    impl: str = "auto",
) -> jax.Array:
    """Greedy decode head: rms_norm → lm_head GEMV → argmax in ONE kernel.

    Replaces the norm op + logits GEMV + separate argmax of the decode loop
    (the reference computes full fp32 logits and samples on host,
    model.py:1069-1080 + generator.py:91-170; for greedy decode nothing
    downstream needs the logits). Returns int32 token ids [B, 1].
    """
    *lead, k = h.shape
    m = 1
    for d in lead:
        m *= d
    b = lead[0] if lead else 1
    use_pallas = (
        impl.startswith("pallas")
        or (impl == "auto" and jax.default_backend() == "tpu")
    ) and m <= GEMV_MAX_M and k == w.shape[0] and w.shape[1] % 128 == 0
    if not use_pallas:
        from exllama_tpu.ops.norms import rms_norm

        hn = rms_norm(h.reshape(m, k), norm_w, eps)
        logits = jnp.dot(hn, w, preferred_element_type=jnp.float32)
        return jnp.argmax(logits, axis=-1).reshape(b, -1).astype(jnp.int32)

    x2 = h.reshape(m, k)
    m_pad = max(8, 1 << (m - 1).bit_length())
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    bn = _divisor_block(w.shape[1], 128, 2048)
    out = _head_argmax_call(
        x2.astype(w.dtype), norm_w.reshape(1, k).astype(w.dtype), w,
        block_n=bn, eps=float(eps),
        interpret=impl.endswith("_interpret"),
    )
    return out[:m].reshape(b, -1)


def dense_matmul(
    x: jax.Array,        # [..., K]
    w: jax.Array,        # [K, N] bf16
    out_dtype=jnp.float32,
    impl: str = "auto",
) -> jax.Array:
    """x @ w with fp32 output; Pallas GEMV for decode-sized M on TPU."""
    *lead, k = x.shape
    m = 1
    for d in lead:
        m *= d
    # Any impl starting with "pallas" takes the GEMV kernel — including
    # "pallas_a8" (W4A8 turbo mode), whose int8 trick only applies to
    # quantized weights; the bf16 lm_head must still get the fast path.
    use_pallas = impl.startswith("pallas") or (
        impl == "auto" and jax.default_backend() == "tpu"
    )
    if not use_pallas or m > GEMV_MAX_M or k != w.shape[0]:
        return jnp.dot(
            x, w, preferred_element_type=jnp.float32
        ).astype(out_dtype)

    x2 = x.reshape(m, k).astype(w.dtype)
    m_pad = max(8, 1 << (m - 1).bit_length())
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    n = w.shape[1]
    bn = _divisor_block(n, 128, 2048)
    # whole-K blocks when the streamed W tile fits the VMEM budget
    w_bytes_per_bn = bn * w.dtype.itemsize
    bk_budget = _VMEM_BUDGET // (2 * w_bytes_per_bn)
    bk = _divisor_block(k, 128, max(128, bk_budget))
    out = _call(
        x2, w, block_n=bn, block_k=bk, out_dtype=jnp.dtype(out_dtype),
        interpret=impl.endswith("_interpret"),
    )
    return out[:m].reshape(*lead, n)
