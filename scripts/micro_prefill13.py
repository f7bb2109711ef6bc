"""Per-shape prefill matmul rates at 13B/33B widths for each path:
exact (deqw2), deqw8 (in-kernel requant, pallas_a8t without w8), and
resident w8 (pallas_a8t with the load-time int8 image).

Decides VERDICT r4 missing #2 (13B+ prompt gap): how much of the int8-MXU
rate the non-resident path already reaches, and what partial residency buys.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_prefill13.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from exllama_tpu.formats.gptq import (
    N_ALIGN,
    QuantTensor,
    with_w8,
    with_w8_scale,
)
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


SHAPES = {
    "13b": [
        (5120, 15360, "qkv"),
        (5120, 5120, "o"),
        (5120, 27648, "gateup"),
        (13824, 5120, "down"),
    ],
    "33b": [
        (6656, 19968, "qkv"),
        (6656, 6656, "o"),
        (6656, 35840, "gateup"),
        (17920, 6656, "down"),
    ],
}


def main():
    m = 2048
    for model, shapes in SHAPES.items():
        for (k, n, tag) in shapes:
            x = jnp.asarray(
                np.random.default_rng(1).standard_normal((m, k)) * 0.1,
                jnp.bfloat16,
            )
            qt = make_qt(k, n)
            fl = 2 * m * k * qt.padded_out_features
            for vtag, vqt, impl in (
                ("exact", qt, "pallas"),
                # production attaches the static column scales at load
                # (with_w8_scale); an unattached tensor pays a per-call
                # dequant+reduce that XLA may not hoist out of the loop
                ("deqw8", with_w8_scale(qt), "pallas_a8t"),
                ("w8res", with_w8(qt), "pallas_a8t"),
            ):
                try:
                    t1 = timed(lambda: loop(x, vqt, reps=R1, impl=impl))
                    t2 = timed(lambda: loop(x, vqt, reps=R2, impl=impl))
                    dt = (t2 - t1) / (R2 - R1)
                    print(
                        f"{model} {tag:7s} {vtag:6s} [{m}x{k}]x[{k}x{n}]: "
                        f"{dt*1e3:7.2f} ms, {fl/dt/1e12:6.1f} TFLOP/s",
                        flush=True,
                    )
                except Exception as e:
                    print(f"{model} {tag:7s} {vtag:6s} FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
