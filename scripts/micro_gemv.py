"""Microbenchmark: q4 GEMV kernel shapes/blockings on the real chip.

Timing method: run the kernel `reps` times back-to-back inside one jit
(serialized via a data dependency), and time (reps=R2) - (reps=R1) to cancel
the axon tunnel's per-dispatch latency (~ms), which otherwise swamps a
10-40us kernel. Usage: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/micro_gemv.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from exllama_tpu.formats.gptq import N_ALIGN, QuantTensor
from exllama_tpu.ops import quant

R1, R2 = 8, 72


def make_qt(k, n, gs=128, seed=0):
    rng = np.random.default_rng(seed)
    n_pad = -(-n // N_ALIGN) * N_ALIGN
    words = np.frombuffer(rng.bytes(k * n_pad // 2), dtype=np.int32).reshape(
        k // 8, n_pad
    )
    s = np.full((k // gs, n_pad), 1e-3, np.float32)
    zs = 8e-3 * np.ones_like(s)
    return QuantTensor(
        qweight=jnp.asarray(words),
        scales=jnp.asarray(s),
        zscale=jnp.asarray(zs),
        x_map=None,
        in_features=k,
        out_features=n,
        groupsize=gs,
    )


@functools.partial(jax.jit, static_argnames=("bn", "bk", "reps", "gs"))
def gemv_loop(x, qw, s, z, *, bn, bk, reps, gs):
    out = None
    acc = x
    for _ in range(reps):
        o = quant._q4_matmul_pallas_call(
            acc, qw, s, z,
            groupsize=gs, block_k=bk, block_n=bn,
            out_dtype=jnp.bfloat16, kernel_kind="gemv", interpret=False,
        )
        out = o
        acc = acc + 0.0 * o[:, :1]  # serialize reps
    return out


def timed(fn, iters=8):
    fn()
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def bench(x, qt, bn, bk, gs=128):
    args = (x, qt.qweight, qt.scales, qt.zscale)
    t1 = timed(lambda: gemv_loop(*args, bn=bn, bk=bk, reps=R1, gs=gs))
    t2 = timed(lambda: gemv_loop(*args, bn=bn, bk=bk, reps=R2, gs=gs))
    return (t2 - t1) / (R2 - R1)


def main():
    k = 4096
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((8, k)), jnp.bfloat16
    )
    for n in (4096, 12288, 22528):
        qt = make_qt(k, n)
        n_pad = qt.qweight.shape[1]
        nbytes = k * n_pad // 2 + 2 * (k // 128) * n_pad * 4
        for bn in (1024, 2048, 4096):
            if n_pad % bn:
                continue
            try:
                dt = bench(x, qt, bn, quant._choose_block_k(k, 128, bn, bm=8))
            except Exception as e:
                print(f"N={n} bn={bn}: FAIL {type(e).__name__}: {e}", flush=True)
                continue
            print(
                f"N={n:6d} bn={bn:5d}: {dt*1e6:7.2f} us, "
                f"{nbytes/dt/1e9:6.1f} GB/s", flush=True
            )


if __name__ == "__main__":
    main()
