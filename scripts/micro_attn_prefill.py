"""Prefill flash-attention kernel timing at exact 7B shapes.

A/Bs the generic grid-over-KV-blocks kernel (_attend_flash_padded) against
the prefill-shaped in-kernel-loop kernel (_attend_flash_prefill) at
B=1, T=1920, H=Hkv=32, D=128, past=0 — the per-layer attention cost inside
a 7B prefill. Reps run under lax.fori_loop (one kernel compile) with a
serializing data dependency; two rep counts, slope = per-call time.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_attn_prefill.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from exllama_tpu.ops import attention as A

B, T, H, HKV, D = 1, 1920, 32, 32, 128
S_MAX = 2048
R1, R2 = 4, 20


def call_kernel(q, kc, vc, which):
    past_b = jnp.zeros((B, 1), jnp.int32)
    qr = q.reshape(B, T, HKV, H // HKV, D).transpose(0, 2, 1, 3, 4)
    qr = qr.reshape(B, HKV, T * (H // HKV), D)
    if which == "prefill":
        out = A._attend_flash_prefill(
            qr, kc, vc, past_b, None, None, None,
            attend_len=T, t_total=T, g=1, interpret=False,
        )
    else:
        out = A._attend_flash_padded(
            qr, kc, vc, past_b, None, None, None, None, None,
            attend_len=T, t_total=T, g=1, interpret=False,
        )
    return out.reshape(B, HKV, T, 1, D).transpose(0, 2, 1, 3, 4).reshape(
        B, T, H, D)


@functools.partial(jax.jit, static_argnames=("reps", "which"))
def loop(q, kc, vc, *, reps, which):
    def body(_, acc):
        o = call_kernel(acc, kc, vc, which)
        return acc + 0.0 * o
    out = jax.lax.fori_loop(0, reps, body, q)
    return out[0, 0, 0, :1].astype(jnp.float32)


def timed(fn, iters=6):
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
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.3, jnp.bfloat16)
    kc = jnp.asarray(
        rng.standard_normal((B, HKV, S_MAX, D)) * 0.3, jnp.bfloat16)
    vc = jnp.asarray(
        rng.standard_normal((B, HKV, S_MAX, D)) * 0.3, jnp.bfloat16)
    fl = 2 * 2 * H * (T * (T + 1) // 2) * D
    for which in ("prefill", "generic"):
        t1 = timed(lambda: loop(q, kc, vc, reps=R1, which=which))
        t2 = timed(lambda: loop(q, kc, vc, reps=R2, which=which))
        dt = (t2 - t1) / (R2 - R1)
        print(
            f"{which:8s} attn [T={T} H={H} D={D}]: {dt*1e3:7.3f} ms/layer, "
            f"{fl/dt/1e12:6.1f} TFLOP/s (causal-useful)",
            flush=True,
        )


if __name__ == "__main__":
    main()
