"""Per-shape prefill (deqw2) matmul timing with serialized in-jit reps.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_prefill.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from exllama_tpu.formats.gptq import N_ALIGN, QuantTensor
from exllama_tpu.ops.quant import q4_matmul

R1, R2 = 5, 25


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


@functools.partial(jax.jit, static_argnames=("reps", "impl"))
def loop(x, qt, *, reps, impl="pallas"):
    def body(_, acc):
        o = q4_matmul(acc, qt, impl=impl)
        return acc + 0.0 * o[:, :1].astype(acc.dtype)
    out = jax.lax.fori_loop(0, reps, body, x)
    return out[0, :1].astype(jnp.float32)


def timed(fn, iters=5):
    fn()
    np.asarray(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    m = 2048
    for (k, n, tag) in (
        (4096, 4096, "o-proj"),
        (4096, 12288, "qkv"),
        (4096, 22528, "gateup"),
        (11008, 4096, "down"),
    ):
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((m, k)) * 0.1,
            jnp.bfloat16,
        )
        qt = make_qt(k, n)
        fl = 2 * m * k * qt.padded_out_features
        import os
        variants = [("exact", qt, "pallas")]
        if os.environ.get("EXL_MICRO_W8"):
            from exllama_tpu.formats.gptq import with_w8
            variants.append(("w8", with_w8(qt), "pallas_a8t"))
        for vtag, vqt, impl in variants:
            t1 = timed(lambda: loop(x, vqt, reps=R1, impl=impl))
            t2 = timed(lambda: loop(x, vqt, reps=R2, impl=impl))
            dt = (t2 - t1) / (R2 - R1)
            print(
                f"{tag:8s} {vtag:5s} [{m}x{k}]x[{k}x{n}]: {dt*1e3:7.2f} ms, "
                f"{fl/dt/1e12:6.1f} TFLOP/s", flush=True,
            )


if __name__ == "__main__":
    main()
