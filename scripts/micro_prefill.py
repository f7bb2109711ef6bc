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

R1, R2 = 2, 10


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


@functools.partial(jax.jit, static_argnames=("reps",))
def loop(x, qt, *, reps):
    out = None
    acc = x
    for _ in range(reps):
        o = q4_matmul(acc, qt, impl="pallas")
        out = o
        acc = acc + 0.0 * o[:, :1].astype(acc.dtype)
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
        t1 = timed(lambda: loop(x, qt, reps=R1))
        t2 = timed(lambda: loop(x, qt, reps=R2))
        dt = (t2 - t1) / (R2 - R1)
        fl = 2 * m * k * qt.padded_out_features
        print(
            f"{tag:8s} [{m}x{k}]x[{k}x{n}]: {dt*1e3:7.2f} ms, "
            f"{fl/dt/1e12:6.1f} TFLOP/s", flush=True,
        )


if __name__ == "__main__":
    main()
