"""Pallas kernel tests (interpret mode on CPU) vs the jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsheg_tpu.ops.linear_attention import (
    fused_linear_attention,
    linear_attention_reference,
)


def _qkv(B=2, T=34, D=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (B, T, D)) for k in ks)


class TestFusedLinearAttention:
    @pytest.mark.parametrize("T,D,H", [(34, 64, 4), (88, 128, 8), (7, 32, 2)])
    def test_matches_reference(self, T, D, H):
        q, k, v = _qkv(T=T, D=D)
        ref = linear_attention_reference(q, k, v, H)
        got = fused_linear_attention(q, k, v, H, True)  # interpret=True
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_masked_inputs(self):
        # additive key mask + zeroed values, as the layer prepares them
        q, k, v = _qkv(T=16, D=32)
        mask = jnp.ones((2, 16, 1)).at[:, 12:].set(0.0)
        k = k + (1.0 - mask) * -1e6
        v = v * mask
        ref = linear_attention_reference(q, k, v, 4)
        got = fused_linear_attention(q, k, v, 4, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_gradients_match_reference(self):
        q, k, v = _qkv(B=1, T=8, D=16)

        def loss_fused(q, k, v):
            return jnp.sum(fused_linear_attention(q, k, v, 2, True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(linear_attention_reference(q, k, v, 2) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_layer_dispatcher_cpu_path(self):
        # On CPU the dispatcher must fall back to the reference silently.
        from diffsheg_tpu.ops.linear_attention import linear_attention
        q, k, v = _qkv(T=8, D=16)
        got = linear_attention(q, k, v, 2)
        ref = linear_attention_reference(q, k, v, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
