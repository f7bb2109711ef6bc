"""g32 GEMV kernel rate at 33B decode shapes (the weak row — VERDICT r4
item 4): effective GB/s of the q4 GEMV at groupsize 32 vs 128, per shape.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_g32.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from exllama_tpu.formats.gptq import N_ALIGN, QuantTensor
from exllama_tpu.ops.quant import q4_matmul

R1, R2 = 8, 72


def make_qt(k, n, gs, seed=0):
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


@functools.partial(jax.jit, static_argnames=("reps",))
def loop(x, qt, *, reps):
    def body(_, acc):
        o = q4_matmul(acc, qt, impl="pallas")
        return acc + 0.0 * o[:, :1].astype(acc.dtype)
    return jax.lax.fori_loop(0, reps, body, x)[0, :1].astype(jnp.float32)


def timed(fn, iters=5):
    fn()
    np.asarray(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    for (k, n, tag) in (
        (6656, 6656, "33b q/o"),
        (6656, 17920, "33b gate"),
        (17920, 6656, "33b down"),
    ):
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, k)) * 0.1,
            jnp.bfloat16,
        )
        for gs in (128, 32):
            qt = make_qt(k, n, gs)
            t1 = timed(lambda: loop(x, qt, reps=R1))
            t2 = timed(lambda: loop(x, qt, reps=R2))
            dt = (t2 - t1) / (R2 - R1)
            n_pad = qt.padded_out_features
            byts = k * n_pad // 2 + 2 * (k // gs) * n_pad * 2
            print(
                f"{tag:9s} gs={gs:>3}: {dt*1e6:7.1f} us, "
                f"{byts/dt/1e9:6.0f} GB/s effective", flush=True,
            )


if __name__ == "__main__":
    main()
