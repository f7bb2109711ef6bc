"""Dense GEMV (lm_head) kernel vs jnp.dot oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from exllama_tpu.ops.dense import dense_matmul


@pytest.mark.parametrize("m", [1, 3, 8])
@pytest.mark.parametrize("n", [256, 1000 * 2])
def test_dense_gemv_matches_dot(m, n):
    rng = np.random.default_rng(0)
    k = 256
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.bfloat16)
    ref = np.asarray(jnp.dot(x, w, preferred_element_type=jnp.float32))
    got = np.asarray(dense_matmul(x, w, impl="pallas_interpret"))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_dense_gemv_batch_shape():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 1, 256)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((256, 512)), jnp.bfloat16)
    out = dense_matmul(x, w, impl="pallas_interpret")
    assert out.shape == (2, 1, 512) and out.dtype == jnp.float32
