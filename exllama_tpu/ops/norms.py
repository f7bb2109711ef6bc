"""RMSNorm.

TPU-native equivalent of the reference's two-pass CUDA rms_norm
(cuda_func/rms_norm.cu). On TPU this is a single fused VPU expression —
XLA fuses the reduction and the scale into the surrounding computation, so
no hand-written kernel is needed. Variance is accumulated in fp32 like the
reference (rms_norm.cu:40-78); the result is cast back to the input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """x * w / sqrt(mean(x^2) + eps), reduction over the last axis in fp32."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)
