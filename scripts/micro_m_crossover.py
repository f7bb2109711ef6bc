"""GEMV-vs-deqw2 crossover in M for the q4 matmul (sets GEMV_MAX_M).

The decode GEMV kernel streams packed weights once at HBM rate with
per-group partial-sum rescales that scale with M; the cached-dequant
prefill kernel (deqw2) pays a full VPU dequant of the weight tile but
amortizes it over all M rows. The engine's speculative step runs
M = slots x (draft+1) rows (e.g. 8 x 7 = 56) — if GEMV_MAX_M is below
that, spec-verify pays a prefill-grade step (round-3 finding: 175.7 ms
vs 52 ms/step at 8 slots). Measures both kernels at M in {8..256} on 7B
shapes. Run: python scripts/micro_m_crossover.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from exllama_tpu.formats.gptq import N_ALIGN, QuantTensor
from exllama_tpu.ops import quant

R1, R2 = 4, 20


def make_qt(k, n, gs=128, seed=0):
    rng = np.random.default_rng(seed)
    n_pad = -(-n // N_ALIGN) * N_ALIGN
    words = np.frombuffer(rng.bytes(k * n_pad // 2), dtype=np.int32).reshape(
        k // 4, n_pad // 2
    )
    s = np.full((k // gs, n_pad), 1e-3, np.float32)
    return QuantTensor(
        qweight=jnp.asarray(words),
        scales=jnp.asarray(s, jnp.bfloat16),
        zscale=jnp.asarray(8e-3 * s, jnp.bfloat16),
        x_map=None,
        in_features=k,
        out_features=n,
        groupsize=gs,
        layout="npair",
    )


@functools.partial(jax.jit, static_argnames=("reps", "kind", "gs"))
def loop(x, qw, s, z, *, reps, kind, gs):
    k = x.shape[1]
    n_pad = s.shape[1]
    bm = quant._choose_block_m(x.shape[0])
    out = None
    acc = x
    for _ in range(reps):
        if kind == "deqw2":
            o = quant._q4_matmul_deqw2_call(
                acc, qw, s, z, groupsize=gs, block_n=N_ALIGN,
                out_dtype=jnp.bfloat16, layout="npair", interpret=False,
            )
        else:
            bn, bk = quant._choose_gemv_blocks_npair(k, n_pad, gs, bm)
            o = quant._q4_matmul_pallas_call(
                acc, qw, s, z, groupsize=gs, block_k=bk, block_n=bn,
                out_dtype=jnp.bfloat16, kernel_kind=kind, layout="npair",
                interpret=False,
            )
        out = o
        acc = acc + 0.0 * o[:, :1]
    return out[0, :1].astype(jnp.float32)


def timed(fn, iters=6):
    fn()
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    gs = int(os.environ.get("GS", "128"))
    for (k, n) in ((4096, 4096), (4096, 11008)):
        qt = make_qt(k, n, gs)
        wb = k * qt.padded_out_features // 2
        for m in (8, 16, 32, 48, 64, 96, 128, 256):
            mp = -(-m // quant._choose_block_m(m)) * quant._choose_block_m(m)
            x = jnp.asarray(
                np.random.default_rng(1).standard_normal((mp, k)) * 0.1,
                jnp.bfloat16,
            )
            row = f"[{m:4d}x{k}]x[{k}x{n}] g{gs}:"
            for kind in ("gemv", "gemv_a8", "deqw2"):
                try:
                    args = (x, qt.qweight, qt.scales, qt.zscale)
                    t1 = timed(lambda: loop(*args, reps=R1, kind=kind, gs=gs))
                    t2 = timed(lambda: loop(*args, reps=R2, kind=kind, gs=gs))
                    dt = (t2 - t1) / (R2 - R1)
                    row += f"  {kind} {dt*1e6:8.1f} us ({wb/dt/1e9:5.0f} GB/s)"
                except Exception as e:
                    row += f"  {kind} FAIL({type(e).__name__})"
            print(row, flush=True)


if __name__ == "__main__":
    main()
